package graft.llm

/** Dev probe: training dynamics of [[TxTrain]] on a synthetic corpus —
  * loss trajectory + separation margins per config, for picking the
  * committed checkpoint's hyperparameters. Run:
  * `sbt "Test/runMain graft.llm.ProbeTxTrain [steps]"`.
  */
object ProbeTxTrain {
  private def synthDocs(nDocs: Int, len: Int): Array[Array[String]] =
    Array.tabulate(nDocs) { d =>
      Array.tabulate(len)(i => s"tok${d % 7}x${(d * 31 + i * 17) % 23}")
    }

  def main(args: Array[String]): Unit = {
    val steps = if (args.nonEmpty) args(0).toInt else 100
    val docs = synthDocs(48, 16)
    // overfit-one-batch: the decisive end-to-end gradient check — a fixed
    // batch's InfoNCE loss must approach 0 under repeated steps
    locally {
      val cfg = TxTrain.Config(dim = 8, layers = 1, heads = 2, ffMult = 2,
        maxTokens = 16, batch = 8, steps = 1, lr = 2e-3, tau = 0.1,
        threads = 4, viewMin = 3, viewMax = 8)
      val t = new TxTrain.Trainer(cfg)
      val rng = new TxTrain.Rng(42L)
      val views = Array.tabulate(8)(i => (t.crop(docs(i * 3), rng), t.crop(docs(i * 3), rng)))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        var s = 0
        while (s < 200) {
          val l = t.step(views, pool)
          if (s % 20 == 0 || s == 199) println(f"   overfit step $s%3d loss=$l%.4f")
          s += 1
        }
      } finally pool.shutdown()
    }
    for (lr <- Seq(5e-4, 2e-3); tau <- Seq(0.1, 0.3)) {
      val cfg = TxTrain.Config(dim = 8, layers = 1, heads = 2, ffMult = 2,
        maxTokens = 16, batch = 8, steps = steps, lr = lr, tau = tau,
        threads = 4, viewMin = 3, viewMax = 8)
      val t = new TxTrain.Trainer(cfg)
      val (p0, n0, m0) = TxTrain.separation(docs, t.embed)
      println(f"== lr=$lr tau=$tau  seeded pos=$p0%.4f neg=$n0%.4f margin=$m0%.4f")
      t.train(docs, (s, l) => {
        val (p, n, m) = TxTrain.separation(docs, t.embed)
        println(f"   step $s%4d loss=$l%.4f pos=$p%.4f neg=$n%.4f margin=$m%.4f")
      })
    }
  }
}
