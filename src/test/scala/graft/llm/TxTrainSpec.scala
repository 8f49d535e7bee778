package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The trainer's correctness contract:
  *  - the analytic backward matches a central-difference numerical
  *    gradient on EVERY weight matrix (the only proof that matters for
  *    hand-rolled backprop);
  *  - the trainer's forward matches [[TinyTransformer.embed]] before any
  *    update (same math, double precision);
  *  - training is deterministic (two runs → bit-identical weights);
  *  - a short contrastive run on a synthetic corpus strictly improves the
  *    separation margin the tx_trained_gate pins at registry level;
  *  - the saved checkpoint round-trips through the model's --weights path.
  */
final class TxTrainSpec extends AnyFunSuite {

  private def tinyCfg = TxTrain.Config(
    dim = 8, layers = 1, heads = 2, ffMult = 2, maxTokens = 16,
    batch = 4, steps = 6, lr = 5e-3, threads = 2, viewMin = 2, viewMax = 6)

  /** Loss used by the gradient check: a fixed linear functional of z
    * (sum of z ⊙ probeDir) so dL/dz is constant and the check isolates
    * the network backward from the InfoNCE head (which is plain softmax
    * algebra checked implicitly by the training-improves test).
    */
  private def probeLoss(t: TxTrain.Trainer, toks: Array[String],
      dir: Array[Double]): Double = {
    val z = t.embed(toks)
    z.indices.map(i => z(i) * dir(i)).sum
  }

  test("analytic gradient matches central differences on every matrix") {
    val cfg = tinyCfg
    val t = new TxTrain.Trainer(cfg)
    val toks = Array("alpha", "beta", "gamma", "delta", "alpha")
    val dir = Array.tabulate(cfg.dim)(i => ((i % 3) - 1).toDouble + 0.25)
    // analytic: backward from dz = dir
    val grads = t.w.map(_.map(a => new Array[Double](a.length)))
    val cache = t.forward(toks)
    t.backward(cache, dir, grads)
    val eps = 1e-5
    var checked = 0
    for (l <- t.w.indices; m <- 0 until 6) {
      val wm = t.w(l)(m)
      // probe a deterministic handful of entries per matrix (corners +
      // interior) — full matrices would be slow without adding coverage
      val picks = Seq(0, 1, wm.length / 2, wm.length - 2, wm.length - 1)
        .distinct.filter(i => i >= 0 && i < wm.length)
      for (i <- picks) {
        val orig = wm(i)
        wm(i) = orig + eps
        val up = probeLoss(t, toks, dir)
        wm(i) = orig - eps
        val dn = probeLoss(t, toks, dir)
        wm(i) = orig
        val num = (up - dn) / (2 * eps)
        val ana = grads(l)(m)(i)
        val denom = math.max(1e-8, math.max(math.abs(num), math.abs(ana)))
        assert(math.abs(num - ana) / denom < 1e-4,
          s"layer $l matrix $m idx $i: analytic $ana vs numeric $num")
        checked += 1
      }
    }
    assert(checked >= 30)
  }

  test("trainer forward matches TinyTransformer.embed before any update") {
    val cfg = tinyCfg
    val t = new TxTrain.Trainer(cfg)
    val model = TinyTransformer(cfg.dim, cfg.layers, cfg.heads, cfg.ffMult,
      cfg.maxTokens, cfg.modelSeed)
    for (text <- Seq("one two three four", "alpha beta alpha", "solo")) {
      val toks = graft.core.Text.metricTokens(text)
      val a = t.embed(toks)
      val b = model.embed(text)
      val maxD = a.indices.map(i => math.abs(a(i) - b(i))).max
      // the model casts per-token vectors to Float at the encode boundary;
      // the trainer stays in doubles — agreement to float precision
      assert(maxD < 1e-5, s"'$text': max |Δ| $maxD")
    }
  }

  /** Synthetic corpus: distinct token pools per doc so contrastive
    * training has real structure to learn (same-doc crops share tokens,
    * cross-doc crops mostly do not).
    */
  // no underscores: Text.metricTokens splits on non-alphanumeric, and the
  // round-trip test feeds these through the model's string tokenizer
  private def synthDocs(nDocs: Int, len: Int): Array[Array[String]] =
    Array.tabulate(nDocs) { d =>
      Array.tabulate(len)(i => s"tok${d % 7}x${(d * 31 + i * 17) % 23}")
    }

  test("training is deterministic across runs and thread counts") {
    val cfg = tinyCfg.copy(steps = 8, batch = 8)
    val docs = synthDocs(24, 12)
    def runOnce(threads: Int): Array[Array[Array[Double]]] = {
      val t = new TxTrain.Trainer(cfg.copy(threads = threads))
      t.train(docs)
      t.w.map(_.map(_.clone()))
    }
    val w1 = runOnce(2)
    val w2 = runOnce(5)
    // bit-identical weights (parallel backward, EXAMPLE-ORDER sum)
    for (l <- w1.indices; m <- 0 until 6; i <- w1(l)(m).indices)
      assert(w1(l)(m)(i) == w2(l)(m)(i), s"nondeterministic at $l/$m/$i")
  }

  test("repeated steps on a fixed batch drive the InfoNCE loss to ~0") {
    // the decisive END-TO-END gradient check (loss head + backward +
    // Adam together): a fixed batch must be overfittable
    val cfg = tinyCfg
    val t = new TxTrain.Trainer(cfg)
    val docs = synthDocs(16, 12)
    val rng = new TxTrain.Rng(42L)
    val views = Array.tabulate(8)(i =>
      (t.crop(docs(i * 2), rng), t.crop(docs(i * 2), rng)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val first = t.step(views, pool)
      var last = first
      for (_ <- 1 until 200) last = t.step(views, pool)
      assert(last < first / 10.0,
        f"fixed-batch loss did not collapse: $first%.4f -> $last%.4f")
      assert(last < 0.1, f"fixed-batch loss floor too high: $last%.4f")
    } finally pool.shutdown()
  }

  test("a short run at the production config improves the margin") {
    // the committed checkpoint's config (dim 64, 2 layers) on a small
    // synthetic corpus: the separation margin must move the way the
    // registry-level tx_trained_gate pins it on the real corpus
    val cfg = TxTrain.Config(steps = 60, batch = 16, threads = 8,
      viewMin = 3, viewMax = 10)
    val docs = synthDocs(48, 16)
    val t = new TxTrain.Trainer(cfg)
    val (_, _, margin0) = TxTrain.separation(docs, t.embed)
    t.train(docs)
    val (pos1, _, margin1) = TxTrain.separation(docs, t.embed)
    assert(margin1 > margin0 + 0.05,
      f"training did not improve separation: $margin0%.4f -> $margin1%.4f")
    assert(pos1 > 0.8, f"alignment collapsed: pos=$pos1%.4f")
  }

  test("loadCorpus: collect is capped, deterministic, layout-independent") {
    val spark = graft.SparkSuite.spark
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("txcorpus_").toString
    (0L until 40L).map(i => (i, s"doc number $i words here"))
      .toDF("doc_id", "text")
      .repartition(7).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val a = TxTrain.loadCorpus(spark, dir, maxDocs = 5)
    assert(a.length == 5)
    // lowest doc_ids, in order — layout-independent
    assert(a.map(_.mkString(" ")).toSeq ==
      (0 until 5).map(i => s"doc number $i words here"))
    // cap above corpus size is a no-op; out-of-range caps fail loudly
    assert(TxTrain.loadCorpus(spark, dir, 1000).length == 40)
    val ex = intercept[IllegalArgumentException] {
      TxTrain.loadCorpus(spark, dir, TxTrain.MaxTrainDocs + 1)
    }
    assert(ex.getMessage.contains("maxDocs"), ex.getMessage)
    intercept[IllegalArgumentException](TxTrain.loadCorpus(spark, dir, 0))
  }

  test("saved checkpoint round-trips through the model weightsPath") {
    val cfg = tinyCfg.copy(steps = 4, batch = 4)
    val docs = synthDocs(12, 10)
    val t = new TxTrain.Trainer(cfg)
    t.train(docs)
    val dir = java.nio.file.Files.createTempDirectory("txtrain_")
    val path = s"$dir/trained.safetensors"
    t.save(path)
    val served = TinyTransformer(cfg.dim, cfg.layers, cfg.heads, cfg.ffMult,
      cfg.maxTokens, cfg.modelSeed, weightsPath = Some(path))
    val toks = docs(3)
    val a = served.embed(toks.mkString(" "))
    val b = t.embed(toks)
    val maxD = a.indices.map(i => math.abs(a(i) - b(i))).max
    // F32 checkpoint: agreement to float precision
    assert(maxD < 1e-5, s"served vs trainer max |Δ| $maxD")
    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }
}
