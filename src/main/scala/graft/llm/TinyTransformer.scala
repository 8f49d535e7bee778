package graft.llm

import graft.core.Text

/** Text -> per-token CONTEXTUAL vectors — the interface a transformer
  * encoder provides and the bag-of-tokens [[Embedder]]s cannot: the same
  * token embeds differently depending on its neighbors and position.
  * BERTScore as published is defined over exactly this (the reference
  * loads a sentence-transformer in-process,
  * evaluate/evaluate_summaries_semantic.py:128-166).
  */
trait ContextualEmbedder extends Serializable {
  def dim: Int

  /** One vector per metric token, in order; empty text => empty array. */
  def encode(text: String): Array[Array[Float]]
}

/** A REAL transformer encoder forward pass — multi-head self-attention,
  * GELU feed-forward, pre-LayerNorm residual blocks, sinusoidal positions
  * (Vaswani et al. 2017) — with deterministic seeded random weights
  * instead of trained ones, so the model ships hermetically inside the
  * library: no weight files, no endpoint, bit-stable across JVMs and
  * executors. Random-weight encoders over fixed word embeddings are a
  * published, surprisingly strong baseline (Wieting & Kiela 2019, "No
  * Training Required: Exploring Random Encoders for Sentence
  * Classification"), which makes this the principled stand-in for the
  * reference's in-process sentence-transformer
  * (evaluate/evaluate_summaries_semantic.py:128-139) in an offline build:
  * the ARCHITECTURE and the execution path are the real thing, and a
  * trained checkpoint IS a constructor away: pass
  * `weightsPath = Some(path)` to load the transformer-block weights from
  * a flat-tensor checkpoint ([[TensorFile]], safetensors container) —
  * no plan, schema, or operator changes (token base vectors stay
  * hash-seeded/vocabulary-free; a vocab-tied embedding table is the one
  * remaining delta to a published sentence-transformer).
  *
  * What the contextual path buys over the hashing embedders, concretely:
  * identical sequences score BERTScore F1 = 1.0 exactly; reordering
  * tokens changes every contextual vector (positions + attention), so
  * word-salad no longer ties fluent text; a one-token edit moves the
  * pooled vector a little while unrelated text lands far away. Those
  * three properties are pinned by the oracled `tx_gate` query and
  * TinyTransformerSpec.
  *
  * Determinism: weights come from a SplitMix64 stream (public constants,
  * Steele et al. 2014) seeded per matrix; token base vectors are drawn
  * from a stream seeded by the token's own 64-bit FNV-1a hash, so the
  * "embedding table" needs no storage and no vocabulary — any token of
  * any language gets a stable vector. All transcendentals go through
  * StrictMath, so outputs are bit-identical across platforms, not just
  * across runs. Weights materialize once per executor JVM
  * (@transient lazy, ~{4·d² + 2·d·f} doubles per layer ≈ 200 KB at the
  * defaults) — broadcast-free model distribution.
  *
  * Scale shape: embedding is a pure map — no shuffle, no driver state,
  * no per-partition setup beyond the lazy weight build. Cost per doc is
  * O(min(n, maxTokens)² · dim · layers) from attention, bounded by the
  * `maxTokens` truncation every production encoder also applies
  * (model max_seq_len); 100 TB of docs is 100 TB of independent rows.
  */
final case class TinyTransformer(
    dim: Int = 64,
    layers: Int = 2,
    heads: Int = 4,
    ffMult: Int = 2,
    maxTokens: Int = 128,
    seed: Long = 0x7a317e5eedL,
    weightsPath: Option[String] = None) extends Embedder
    with ContextualEmbedder {

  require(dim >= 2 && heads >= 1 && dim % heads == 0,
    s"dim ($dim) must be a positive multiple of heads ($heads)")
  require(layers >= 1 && ffMult >= 1 && maxTokens >= 1,
    s"bad hyperparameters: layers=$layers ffMult=$ffMult maxTokens=$maxTokens")

  private val headDim = dim / heads
  private val ffDim = dim * ffMult

  // ---- deterministic pseudo-randomness -----------------------------------

  /** SplitMix64 step (public-domain constants). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Standard-normal stream via Box-Muller over SplitMix64 uniforms. */
  private final class Gauss(seed0: Long) {
    private var state = seed0
    private var spare = Double.NaN
    private def nextUniform(): Double = {
      state += 0x9e3779b97f4a7c15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      // 53-bit mantissa in (0, 1] — strictly positive so log is finite
      ((z >>> 11) + 1).toDouble / (1L << 53).toDouble
    }
    def next(): Double = {
      if (!spare.isNaN) { val s = spare; spare = Double.NaN; return s }
      val u1 = nextUniform()
      val u2 = nextUniform()
      val r = StrictMath.sqrt(-2.0 * StrictMath.log(u1))
      val t = 2.0 * StrictMath.PI * u2
      spare = r * StrictMath.sin(t)
      r * StrictMath.cos(t)
    }
  }

  /** rows x cols matrix of N(0, scale²) entries, seeded by (seed, tag). */
  private def randMat(tag: Long, rows: Int, cols: Int, scale: Double)
      : Array[Double] = {
    val g = new Gauss(mix(seed ^ tag))
    val m = new Array[Double](rows * cols)
    var i = 0
    while (i < m.length) { m(i) = g.next() * scale; i += 1 }
    m
  }

  private[llm] final case class Layer(
      wq: Array[Double], wk: Array[Double], wv: Array[Double],
      wo: Array[Double], w1: Array[Double], w2: Array[Double])

  // Xavier-style 1/sqrt(fan_in) keeps activations O(1) through untrained
  // blocks; residual + pre-LN do the rest. Built once per JVM — or, with
  // `weightsPath`, loaded once per JVM from a flat-tensor checkpoint
  // ([[TensorFile]], the safetensors container): tensors are named
  // `layers.<i>.<wq|wk|wv|wo|w1|w2>` with row-major shapes
  // (dim,dim)/(dim,ffDim)/(ffDim,dim). The seeded-generator -> loader
  // swap changes NO plan, schema, or operator: embedding stays a pure
  // per-row map with per-executor lazy weight materialization (on a
  // cluster, ship the file via --files / shared mount so the local path
  // resolves on every executor).
  @transient private[llm] lazy val weights: Array[Layer] =
    weightsPath.fold(seededWeights)(loadWeights)

  private def seededWeights: Array[Layer] = {
    val sAttn = 1.0 / StrictMath.sqrt(dim.toDouble)
    val sFf1 = 1.0 / StrictMath.sqrt(dim.toDouble)
    val sFf2 = 1.0 / StrictMath.sqrt(ffDim.toDouble)
    Array.tabulate(layers) { l =>
      val t = (l + 1).toLong << 32
      Layer(
        wq = randMat(t | 1L, dim, dim, sAttn),
        wk = randMat(t | 2L, dim, dim, sAttn),
        wv = randMat(t | 3L, dim, dim, sAttn),
        wo = randMat(t | 4L, dim, dim, sAttn),
        w1 = randMat(t | 5L, dim, ffDim, sFf1),
        w2 = randMat(t | 6L, ffDim, dim, sFf2))
    }
  }

  private def loadWeights(path: String): Array[Layer] = {
    val t = TensorFile.load(path)
    // fail-loudly symmetry: a checkpoint carrying tensors this model
    // cannot consume (extra layers, misspelled names) is a config
    // mismatch, not something to silently half-load
    val expected = (0 until layers).flatMap(l =>
      Seq("wq", "wk", "wv", "wo", "w1", "w2").map(m => s"layers.$l.$m")).toSet
    val unconsumed = t.keySet -- expected
    require(unconsumed.isEmpty,
      s"checkpoint $path: unconsumed tensors ${unconsumed.toSeq.sorted
          .mkString(", ")} — the model has layers=$layers; construct " +
        "TinyTransformer with the checkpoint's layer count")
    def mat(name: String, rows: Int, cols: Int): Array[Double] = {
      val tensor = t.getOrElse(name, sys.error(
        s"checkpoint $path: missing tensor $name (have: " +
          s"${t.keys.toSeq.sorted.mkString(", ")})"))
      require(tensor.shape.toSeq == Seq(rows, cols),
        s"checkpoint $path: tensor $name has shape " +
          s"${tensor.shape.mkString("x")}, model needs ${rows}x$cols — " +
          "construct TinyTransformer with the checkpoint's dim/ffMult")
      tensor.data
    }
    Array.tabulate(layers) { l =>
      Layer(
        wq = mat(s"layers.$l.wq", dim, dim),
        wk = mat(s"layers.$l.wk", dim, dim),
        wv = mat(s"layers.$l.wv", dim, dim),
        wo = mat(s"layers.$l.wo", dim, dim),
        w1 = mat(s"layers.$l.w1", dim, ffDim),
        w2 = mat(s"layers.$l.w2", ffDim, dim))
    }
  }

  /** Export the model's CURRENT weights as a flat-tensor checkpoint (the
    * same naming/shape contract [[loadWeights]] reads) — round-trip
    * exact (F64), so `TinyTransformer(weightsPath = Some(p))` after
    * `m.saveWeights(p)` is bit-identical to `m`.
    */
  def saveWeights(path: String): Unit =
    TensorFile.save(path, (0 until layers).flatMap { l =>
      val w = weights(l)
      Seq(
        s"layers.$l.wq" -> TensorFile.Tensor(Array(dim, dim), w.wq),
        s"layers.$l.wk" -> TensorFile.Tensor(Array(dim, dim), w.wk),
        s"layers.$l.wv" -> TensorFile.Tensor(Array(dim, dim), w.wv),
        s"layers.$l.wo" -> TensorFile.Tensor(Array(dim, dim), w.wo),
        s"layers.$l.w1" -> TensorFile.Tensor(Array(dim, ffDim), w.w1),
        s"layers.$l.w2" -> TensorFile.Tensor(Array(ffDim, dim), w.w2))
    })

  // Sinusoidal positional table (Vaswani et al. §3.5), built to maxTokens.
  @transient private[llm] lazy val posEnc: Array[Array[Double]] =
    Array.tabulate(maxTokens) { p =>
      Array.tabulate(dim) { i =>
        val expo = (2 * (i / 2)).toDouble / dim.toDouble
        val angle = p.toDouble / StrictMath.pow(10000.0, expo)
        if (i % 2 == 0) StrictMath.sin(angle) else StrictMath.cos(angle)
      }
    }

  /** FNV-1a 64-bit over UTF-8 bytes — the token-identity hash that seeds
    * the token's base-vector stream (vocabulary-free embedding table).
    */
  private def fnv64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private[llm] def tokenBase(tok: String): Array[Double] = {
    val g = new Gauss(mix(seed ^ fnv64(tok)))
    Array.fill(dim)(g.next())
  }

  // ---- forward-pass pieces ------------------------------------------------

  private def layerNorm(x: Array[Double]): Array[Double] = {
    var mean = 0.0
    var i = 0
    while (i < x.length) { mean += x(i); i += 1 }
    mean /= x.length
    var varSum = 0.0
    i = 0
    while (i < x.length) { val d = x(i) - mean; varSum += d * d; i += 1 }
    val inv = 1.0 / StrictMath.sqrt(varSum / x.length + 1e-5)
    val out = new Array[Double](x.length)
    i = 0
    while (i < x.length) { out(i) = (x(i) - mean) * inv; i += 1 }
    out
  }

  /** y = x · M for row-major M (rows = x.length, cols = out.length). */
  private def matVec(x: Array[Double], m: Array[Double], cols: Int)
      : Array[Double] = {
    val out = new Array[Double](cols)
    var r = 0
    while (r < x.length) {
      val xv = x(r)
      if (xv != 0.0) {
        val off = r * cols
        var c = 0
        while (c < cols) { out(c) += xv * m(off + c); c += 1 }
      }
      r += 1
    }
    out
  }

  private def gelu(x: Double): Double =
    0.5 * x * (1.0 + StrictMath.tanh(
      0.7978845608028654 * (x + 0.044715 * x * x * x)))

  /** Multi-head scaled-dot-product self-attention over the sequence. */
  private def attention(h: Array[Array[Double]], l: Layer)
      : Array[Array[Double]] = {
    val n = h.length
    val q = h.map(matVec(_, l.wq, dim))
    val k = h.map(matVec(_, l.wk, dim))
    val v = h.map(matVec(_, l.wv, dim))
    val mixed = Array.fill(n)(new Array[Double](dim))
    val invSqrt = 1.0 / StrictMath.sqrt(headDim.toDouble)
    var hd = 0
    while (hd < heads) {
      val base = hd * headDim
      var i = 0
      while (i < n) {
        // scores for token i against all j, this head
        val scores = new Array[Double](n)
        var maxS = Double.NegativeInfinity
        var j = 0
        while (j < n) {
          var s = 0.0
          var d = 0
          while (d < headDim) { s += q(i)(base + d) * k(j)(base + d); d += 1 }
          s *= invSqrt
          scores(j) = s
          if (s > maxS) maxS = s
          j += 1
        }
        var z = 0.0
        j = 0
        while (j < n) {
          scores(j) = StrictMath.exp(scores(j) - maxS)
          z += scores(j)
          j += 1
        }
        j = 0
        while (j < n) {
          val w = scores(j) / z
          var d = 0
          while (d < headDim) { mixed(i)(base + d) += w * v(j)(base + d); d += 1 }
          j += 1
        }
        i += 1
      }
      hd += 1
    }
    mixed.map(matVec(_, l.wo, dim))
  }

  /** Full encoder forward pass: per-token contextual vectors. */
  override def encode(text: String): Array[Array[Float]] = {
    if (text == null) return Array.empty
    val toks = Text.metricTokens(text).take(maxTokens)
    if (toks.isEmpty) return Array.empty
    var h: Array[Array[Double]] = toks.zipWithIndex.map { case (t, p) =>
      val e = tokenBase(t)
      val pe = posEnc(p)
      var i = 0
      while (i < dim) { e(i) += pe(i); i += 1 }
      e
    }
    weights.foreach { l =>
      val a = attention(h.map(layerNorm), l)
      h = h.zip(a).map { case (x, y) =>
        val o = new Array[Double](dim)
        var i = 0
        while (i < dim) { o(i) = x(i) + y(i); i += 1 }
        o
      }
      h = h.map { x =>
        val f1 = matVec(layerNorm(x), l.w1, ffDim)
        var i = 0
        while (i < ffDim) { f1(i) = gelu(f1(i)); i += 1 }
        val f2 = matVec(f1, l.w2, dim)
        i = 0
        while (i < dim) { f2(i) += x(i); i += 1 }
        f2
      }
    }
    h.map { x =>
      val ln = layerNorm(x)
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) { out(i) = ln(i).toFloat; i += 1 }
      out
    }
  }

  /** Sentence embedding: mean-pool the contextual vectors, L2-normalize
    * (the sentence-transformers pooling default). Empty text => zero
    * vector (cosine 0 against everything — the family convention).
    */
  override def embed(text: String): Array[Float] = {
    val tok = encode(text)
    val out = new Array[Float](dim)
    if (tok.isEmpty) return out
    val acc = new Array[Double](dim)
    tok.foreach { v =>
      var i = 0
      while (i < dim) { acc(i) += v(i); i += 1 }
    }
    var nsq = 0.0
    var i = 0
    while (i < dim) {
      acc(i) /= tok.length
      nsq += acc(i) * acc(i)
      i += 1
    }
    val inv = if (nsq > 0) 1.0 / StrictMath.sqrt(nsq) else 0.0
    i = 0
    while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
    out
  }
}
