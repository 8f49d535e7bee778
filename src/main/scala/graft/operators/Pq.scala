package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.r4

/** Product quantization (PQ) for vector search at corpus scale — the third
  * rung of the quantization ladder after float32 and [[Quantize]]'s int8:
  * each vector is split into `m` subvectors, each subvector is replaced by
  * the index of its nearest per-subspace centroid, and the whole vector
  * becomes `m` bytes. A 64-dim float32 corpus (256 B/vector) compresses to
  * 8 B/vector at m=8 — a 32x scan reduction, vs int8's 4x — which is what
  * makes a 10^10-vector embedding column scannable per query at 100 TB
  * corpus scale (Jégou, Douze, Schmid: "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011; the FAISS IVF-PQ default).
  *
  * Search is asymmetric-distance (ADC): the query stays float, and its dot
  * product against any code is `m` table lookups into per-subspace
  * query⋅centroid tables (built once per query, `m × ksub` floats). The
  * ADC scan produces a SHORTLIST that an exact float rerank reduces to
  * top-k — the standard two-stage shape, so emitted cosines on surviving
  * rows are bit-identical to [[Similarity.bruteForceTopK]]'s and recall is
  * governed by the shortlist depth, not by PQ reconstruction error.
  *
  * Scale shape: training collects only `m × ksub × dsub` centroid floats
  * (metadata-scale, same ceiling discipline as [[Similarity.trainKmeans]]);
  * codebooks and query tables ship as `SparkContext.broadcast`; encode and
  * the ADC scan are map-only passes; the rerank joins float vectors for
  * shortlist rows only (queries × shortlist rows, never the corpus).
  * Derived from the reference's embed-cosine metric surface
  * (evaluate_summaries_semantic.py:128-139) the same way as [[Similarity]];
  * the reference has no at-scale index — this is the beyond-reference
  * scale path.
  */
object Pq {

  /** Per-subspace codebooks: result(s)(c) is centroid `c` of subspace `s`.
    * Deterministic Lloyd in each subspace, all `m` subspaces trained in the
    * SAME DataFrame jobs (one slice+explode pass; per round one
    * assignment+mean job grouped by (subspace, cell, dim)): seeding is the
    * first `ksub` vectors by vec_id (a TakeOrdered, no global sort), means
    * are decimal-exact so centroid evolution is partition-order-
    * deterministic, empty cells keep their previous centroid. Training
    * sample: deterministic vec_id modulus with the same absolute ceiling
    * as [[Similarity.trainKmeans]] (`knownCount` avoids a second count
    * when the caller already ran one).
    *
    * Requires every embedding's length to be divisible by `m` (null and
    * ragged rows are filtered out).
    */
  def trainPq(corpus: DataFrame, m: Int = 8, ksub: Int = 16,
      iterations: Int = 2, trainSampleMod: Int = 1,
      knownCount: Option[Long] = None): Array[Array[Array[Float]]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    require(m >= 1 && ksub >= 1 && ksub <= 256 && iterations >= 0 &&
      trainSampleMod >= 1)
    val base = corpus.select(col("vec_id"), col("embedding"))
      .filter(col("embedding").isNotNull && size(col("embedding")) % m === 0)
    val n = knownCount.getOrElse(base.count())
    val expectTrain = n / trainSampleMod
    val mod: Long =
      if (expectTrain <= Similarity.MaxTrainVectors) trainSampleMod.toLong
      else trainSampleMod.toLong *
        ((expectTrain + Similarity.MaxTrainVectors - 1) / Similarity.MaxTrainVectors)
    val train =
      if (mod == 1L) base
      else base.filter(pmod(col("vec_id"), lit(mod)) === 0)

    val mm = m
    val sliceUdf = udf { (v: Seq[Float]) =>
      val dsub = v.length / mm
      Array.tabulate(mm)(s => v.slice(s * dsub, (s + 1) * dsub).toArray)
    }
    val sliced = train
      .select(col("vec_id"), posexplode(sliceUdf(col("embedding"))).as(Seq("s", "subvec")))

    // seed: subvectors of the ksub lowest-id training vectors
    var codebooks: Array[Array[Array[Float]]] = {
      val seeds = train.orderBy(col("vec_id")).limit(ksub)
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().map(_._2)
      require(seeds.nonEmpty, "PQ training needs at least one vector")
      Array.tabulate(m) { s =>
        val dsub = seeds(0).length / m
        seeds.map(v => v.slice(s * dsub, (s + 1) * dsub))
      }
    }

    for (_ <- 0 until iterations) {
      val bc = spark.sparkContext.broadcast(codebooks)
      val assignUdf = udf { (s: Int, sub: Seq[Float]) =>
        nearestSub(bc.value(s), sub.toArray)
      }
      val means = sliced
        .select(col("s"), assignUdf(col("s"), col("subvec")).as("cell"),
          posexplode(col("subvec")).as(Seq("i", "x")))
        .groupBy(col("s"), col("cell"), col("i"))
        .agg((graft.functions.exactSum(col("x")) / count(lit(1))).as("mval"))
        .as[(Int, Int, Int, Double)].collect()
      val next = codebooks.map(_.map(_.clone()))
      means.foreach { case (s, cell, i, v) => next(s)(cell)(i) = v.toFloat }
      codebooks = next
      bc.destroy()
    }
    codebooks
  }

  /** L2-nearest centroid index within one subspace, ties to the lowest
    * index (the PQ-standard encode metric; reconstruction-optimal).
    */
  private def nearestSub(cb: Array[Array[Float]], sub: Array[Float]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val cent = cb(c)
      var d = 0.0
      var i = 0
      while (i < sub.length) {
        val diff = sub(i).toDouble - cent(i).toDouble
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Encode every vector as `m` one-byte codes: (vec_id, codes BINARY).
    * Code `c` is stored as the byte `c - 128` so the full ksub=256 range
    * fits a signed byte; [[codeAt]] reverses it. Map-only; codebooks ride
    * a broadcast. Rows whose length isn't `m × dsub` encode to null.
    */
  def pqEncode(corpus: DataFrame,
      codebooks: Array[Array[Array[Float]]]): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(codebooks)
    val m = codebooks.length
    val dsub = codebooks(0)(0).length
    val encUdf = udf { (v: Seq[Float]) =>
      if (v == null || v.length != m * dsub) null
      else {
        val arr = v.toArray
        Array.tabulate(m) { s =>
          (nearestSub(bc.value(s),
            java.util.Arrays.copyOfRange(arr, s * dsub, (s + 1) * dsub))
            - 128).toByte
        }
      }
    }
    corpus.select(col("vec_id"), encUdf(col("embedding")).as("codes"))
      .filter(col("codes").isNotNull)
  }

  private def codeAt(codes: Array[Byte], s: Int): Int = codes(s).toInt + 128

  /** IVF-PQ (IVFADC) — the two quantizers composed, exactly the FAISS
    * billion-scale default (Jégou et al. 2011 §V): a coarse quantizer
    * ([[Similarity.trainKmeans]]) routes each vector to a cell, and PQ
    * encodes the RESIDUAL (vector − cell centroid) rather than the vector
    * itself. Composing them multiplies the two scan cuts: the query probes
    * `nProbe`/`nCells` of the corpus (IVF pruning) and scans `m` bytes per
    * candidate instead of `4·dim` (PQ compression) — and residual encoding
    * beats plain PQ at equal code budget because residuals concentrate
    * near 0, so the per-subspace codebooks cover a tighter distribution.
    *
    * ADC with residuals: for query q and a row in cell c with codes
    * (b_1..b_m), dot(q, x) ≈ dot(q, centroid_c) + Σ_s dotTable(s)(b_s)
    * where dotTable(s)(j) = dot(q_s, codebook_s(j)) — per query one
    * `m × ksub` table shared across all cells (shared residual codebooks)
    * plus `nProbe` centroid dots. The inverted file keeps each row's EXACT
    * float norm (8 bytes next to m code bytes), so the ADC estimate
    * divides by the true ‖x‖ — only the dot is approximated. As in
    * [[pqTopK]] the ADC scan shortlists and an exact float rerank ranks,
    * so surviving rows carry cosines bit-identical to
    * [[Similarity.bruteForceTopK]] and recall is governed by
    * (nProbe, shortlist), not reconstruction error.
    *
    * Returns (index, model): index = (vec_id, cell, codes, norm_c) — the
    * persistable inverted file; model = (centroids, residual codebooks),
    * metadata-scale. Train scans are sample-bounded like every model here.
    */
  /** `assignGroups > 0` bounds the COARSE cell assignment (training
    * rounds + the index pass) at that many CentroidIndex groups — the
    * [[Similarity.buildIvfIndex]] ANN-assist, which is where the O(n·k)
    * wall lives; the sub-quantizer codebooks stay exact (ksub is small
    * by construction, no wall there).
    */
  def buildIvfPqIndex(corpus: DataFrame, nCells: Int = 16, m: Int = 8,
      ksub: Int = 16, iterations: Int = 2, trainSampleMod: Int = 1,
      assignGroups: Int = 0):
      (DataFrame, Array[Array[Float]], Array[Array[Array[Float]]]) = {
    import graft.functions.vecNormF
    val spark = corpus.sparkSession
    // null and m-indivisible rows can't be residual-coded (trainPq's own
    // filter); dropping them HERE keeps the k-means seeds clean too
    val base = corpus.filter(col("embedding").isNotNull &&
      size(col("embedding")) % m === 0)
    val centroids = Similarity.trainKmeans(base, nCells, iterations,
      trainSampleMod, assignGroups = assignGroups)
    val bcCs = spark.sparkContext.broadcast(centroids)
    val residUdf = udf { (cell: Int, v: Seq[Float]) =>
      if (v == null || cell < 0) null
      else {
        val c = bcCs.value(cell)
        val n = math.min(v.length, c.length)
        Array.tabulate(v.length)(i =>
          if (i < n) (v(i) - c(i)) else v(i))
      }
    }
    // one assignment pass: cell + residual + exact norm per row
    val assigned = base
      .select(col("vec_id"), col("embedding"),
        vecNormF(col("embedding")).as("norm_c"),
        Similarity.bestCellUdf(spark, centroids, assignGroups)(
          col("embedding")).as("cell"))
      .withColumn("residual", residUdf(col("cell"), col("embedding")))
    // PQ trains on residual space (feed residuals through the standard
    // trainer via the embedding column contract)
    val residView = assigned.select(col("vec_id"),
      col("residual").as("embedding"))
    val codebooks = trainPq(residView, m, ksub, iterations, trainSampleMod)
    val index = pqEncode(residView, codebooks)
      .join(assigned.select(col("vec_id"), col("cell"), col("norm_c")),
        Seq("vec_id"))
      .select(col("vec_id"), col("cell"), col("codes"), col("norm_c"))
    (index, centroids, codebooks)
  }

  /** Serve approximate cosine top-k from an IVF-PQ index: probe, ADC-scan
    * the probed cells' codes, shortlist per query, exact float rerank
    * (`corpus` supplies float vectors for shortlist rows only).
    */
  def ivfPqSearch(index: DataFrame, centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]], corpus: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 6,
      shortlist: Int = 50, maxQueries: Int = 100000): DataFrame = {
    import graft.functions.{vecDotF, vecNormF}
    require(k >= 1 && shortlist >= k && nProbe >= 1 &&
      nProbe <= centroids.length && maxQueries >= 1)
    val spark = index.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val dsub = codebooks(0)(0).length

    // per-query metadata: probed cells (same two-level search as
    // assignment), centroid dots for those cells, residual dot tables,
    // query norm — queries × (nProbe + m·ksub) doubles, broadcast once.
    // The broadcast-queries CONTRACT every ANN operator here shares is
    // pinned by `maxQueries` (limit+require, not count-then-collect, so
    // the guard costs no extra job): unlike the others, this path
    // materializes queries as a DRIVER array for the ADC table build,
    // and a silently corpus-sized query set would OOM the driver rather
    // than a task. Chunk the query set at the call site to go wider.
    val qRows = queries.select(col("query_id"), col("embedding"))
      .limit(maxQueries + 1).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    require(qRows.length <= maxQueries,
      s"ivfPqSearch: query set exceeds maxQueries=$maxQueries — the ADC" +
        " tables are built per query on the driver (broadcast-queries" +
        " contract); chunk the query set or raise maxQueries with driver" +
        " memory to match")
    val cidx = CentroidIndex.build(centroids)
    val qMeta: Map[Long, (Map[Int, Double], Array[Array[Double]], Double)] =
      qRows.map { case (qid, qv) =>
        val probed = cidx.search(qv, nProbe)
        val cellDots = probed.map { c =>
          val cent = centroids(c)
          var d = 0.0; var i = 0
          val n = math.min(qv.length, cent.length)
          while (i < n) { d += qv(i).toDouble * cent(i).toDouble; i += 1 }
          c -> d
        }.toMap
        val dots = Array.tabulate(m) { s =>
          codebooks(s).map { cent =>
            var d = 0.0; var i = 0
            while (i < cent.length) {
              d += qv(s * dsub + i).toDouble * cent(i).toDouble; i += 1
            }
            d
          }
        }
        var qn = 0.0; var i = 0
        while (i < qv.length) { qn += qv(i).toDouble * qv(i).toDouble; i += 1 }
        (qid, (cellDots, dots, math.sqrt(qn)))
      }.toMap
    val bcMeta = spark.sparkContext.broadcast(qMeta)

    val adcUdf = udf { (qid: Long, cell: Int, cs: Array[Byte], normC: Double) =>
      val (cellDots, dots, qnorm) = bcMeta.value(qid)
      var dot = cellDots(cell)
      var s = 0
      while (s < cs.length) { dot += dots(s)(codeAt(cs, s)); s += 1 }
      val den = qnorm * normC
      if (den == 0.0) 0.0 else dot / den
    }
    // probe table: (query_id, cell) pairs — queries × nProbe rows; the
    // equi-join on cell is the IVF pruning (non-probed cells never scan)
    val probes = qMeta.toSeq
      .flatMap { case (qid, (cellDots, _, _)) => cellDots.keys.map((qid, _)) }
      .toDF("query_id", "cell")
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id").asc)
    val shortlisted = index.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        adcUdf(col("query_id"), col("cell"), col("codes"), col("norm_c"))
          .as("adc"))
      .withColumn("srank", row_number().over(wAdc))
      .filter(col("srank") <= shortlist)
      .select(col("query_id"), col("vec_id"))

    val denom = col("norm_c") * col("norm_q")
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    // broadcast the (queries x shortlist)-row shortlist — behind the
    // window Catalyst has no size estimate and would sort the corpus
    // side (the qz6b 100x lesson)
    broadcast(shortlisted)
      .join(corpus.select(col("vec_id"), col("embedding").as("emb_c"),
        vecNormF(col("embedding")).as("norm_c")), Seq("vec_id"))
      .join(broadcast(queries.select(col("query_id"),
        col("embedding").as("emb_q"),
        vecNormF(col("embedding")).as("norm_q"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        r4(when(denom === 0.0, 0.0)
          .otherwise(vecDotF(col("emb_q"), col("emb_c")) / denom)).as("cosine"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
  }

  /** Persist an IVF-PQ index: the centroid model, the residual codebooks
    * (m × ksub rows), and the inverted file (vec_id, cell, codes, norm_c)
    * as three parquet tables — the [[Similarity.saveIvfIndex]] lifecycle
    * extended with the codebook table. Floats and code bytes round-trip
    * parquet exactly, so a loaded index serves bit-identical results.
    */
  def saveIvfPqIndex(index: DataFrame, centroids: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]], dir: String): Unit = {
    val spark = index.sparkSession
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    (for (s <- codebooks.indices; c <- codebooks(s).indices)
      yield (s, c, codebooks(s)(c))).toDF("s", "c", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    index.write.mode("overwrite").parquet(s"$dir/cells")
  }

  /** Load a persisted IVF-PQ index: (inverted file, centroids, codebooks). */
  def loadIvfPqIndex(spark: org.apache.spark.sql.SparkSession, dir: String):
      (DataFrame, Array[Array[Float]], Array[Array[Array[Float]]]) = {
    import spark.implicits._
    val cs = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("cell")).as[(Int, Array[Float])].collect().map(_._2)
    val cbRows = spark.read.parquet(s"$dir/codebooks")
      .as[(Int, Int, Array[Float])].collect()
    val m = cbRows.map(_._1).max + 1
    val ksub = cbRows.map(_._2).max + 1
    val cbs = Array.ofDim[Array[Float]](m, ksub)
    cbRows.foreach { case (s, c, v) => cbs(s)(c) = v }
    (spark.read.parquet(s"$dir/cells"), cs, cbs)
  }

  /** One-shot IVF-PQ top-k: build + search. The composed-index operating
    * point next to [[Similarity.ivfTopK]] (IVF, float scan) and [[pqTopK]]
    * (PQ, full scan) — same output shape, so [[Similarity.recallAtK]]
    * applies directly.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 6, m: Int = 8, ksub: Int = 16,
      iterations: Int = 2, trainSampleMod: Int = 1,
      shortlist: Int = 50, maxQueries: Int = 100000): DataFrame = {
    val (index, cs, cbs) = buildIvfPqIndex(corpus, nCells, m, ksub,
      iterations, trainSampleMod)
    ivfPqSearch(index, cs, cbs, corpus, queries, k, nProbe, shortlist,
      maxQueries)
  }

  /** Approximate cosine top-k via the ADC scan + exact float rerank.
    * Stage 1 scans CODES only: per (query, code-row) the approximate
    * cosine is `Σ_s dotTable(q)(s)(code_s) / (|q| · √Σ_s normTable(s)(code_s))`
    * — `2m` table lookups, no vector arithmetic — and a per-query window
    * keeps the `shortlist` best. Stage 2 joins float vectors for shortlist
    * rows only and reranks with the exact split-cosine, so surviving rows
    * carry bit-identical cosines to [[Similarity.bruteForceTopK]].
    * Output: (query_id, vec_id, cosine, rank), rank ≤ k, ties to the
    * lowest vec_id — the [[Similarity]] family shape, so
    * [[Similarity.recallAtK]] applies directly.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int = 8,
      ksub: Int = 16, iterations: Int = 2, trainSampleMod: Int = 1,
      shortlist: Int = 50): DataFrame = {
    import graft.functions.{vecDotF, vecNormF}
    require(k >= 1 && shortlist >= k)
    val spark = corpus.sparkSession
    val codebooks = trainPq(corpus, m, ksub, iterations, trainSampleMod)
    val codes = pqEncode(corpus, codebooks)

    // per-query dot tables + the query-independent centroid-norm table —
    // metadata-scale (queries × m × ksub floats), broadcast once
    val qRows = queries.select(col("query_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val normTable: Array[Array[Double]] = codebooks.map(_.map { cent =>
      var nn = 0.0; var i = 0
      while (i < cent.length) { nn += cent(i).toDouble * cent(i).toDouble; i += 1 }
      nn
    })
    val dsub = codebooks(0)(0).length
    val qTables: Map[Long, (Array[Array[Double]], Double)] = qRows.map {
      case (qid, qv) =>
        val dots = Array.tabulate(m) { s =>
          codebooks(s).map { cent =>
            var d = 0.0; var i = 0
            while (i < cent.length) {
              d += qv(s * dsub + i).toDouble * cent(i).toDouble; i += 1
            }
            d
          }
        }
        var qn = 0.0; var i = 0
        while (i < qv.length) { qn += qv(i).toDouble * qv(i).toDouble; i += 1 }
        (qid, (dots, math.sqrt(qn)))
    }.toMap
    val bcTables = spark.sparkContext.broadcast(qTables)
    val bcNorms = spark.sparkContext.broadcast(normTable)

    val adcUdf = udf { (qid: Long, cs: Array[Byte]) =>
      val (dots, qnorm) = bcTables.value(qid)
      var dot = 0.0
      var cn = 0.0
      var s = 0
      while (s < cs.length) {
        val c = codeAt(cs, s)
        dot += dots(s)(c)
        cn += bcNorms.value(s)(c)
        s += 1
      }
      val den = qnorm * math.sqrt(cn)
      if (den == 0.0) 0.0 else dot / den
    }
    val qIds = queries.select(col("query_id"))
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id").asc)
    val shortlisted = codes.crossJoin(broadcast(qIds))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        adcUdf(col("query_id"), col("codes")).as("adc"))
      .withColumn("srank", row_number().over(wAdc))
      .filter(col("srank") <= shortlist)
      .select(col("query_id"), col("vec_id"))

    // exact rerank on the shortlist only — same split-cosine as ss1; the
    // shortlist is queries x shortlist rows (metadata) but hides behind a
    // window, so without the hint Catalyst sorts the corpus side (the
    // qz6b 100x lesson)
    val denom = col("norm_c") * col("norm_q")
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    broadcast(shortlisted)
      .join(corpus.select(col("vec_id"), col("embedding").as("emb_c"),
        vecNormF(col("embedding")).as("norm_c")), Seq("vec_id"))
      .join(broadcast(queries.select(col("query_id"),
        col("embedding").as("emb_q"),
        vecNormF(col("embedding")).as("norm_q"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        r4(when(denom === 0.0, 0.0)
          .otherwise(vecDotF(col("emb_q"), col("emb_c")) / denom)).as("cosine"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
  }
}
