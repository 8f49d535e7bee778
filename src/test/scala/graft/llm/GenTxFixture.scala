package graft.llm

/** One-shot generator for the committed fixture checkpoint the
  * TinyTransformerSpec loader test pins against
  * (src/test/resources/fixtures/tiny_tx.safetensors): the seed-4242
  * dim-8 model's weights exported through the same saveWeights path the
  * library ships. Rerun only to regenerate the fixture (it also prints
  * the pinned first-3 pooled components for FixturePin).
  *
  * Usage: sbt "Test/runMain graft.llm.GenTxFixture"
  */
object GenTxFixture {
  def main(args: Array[String]): Unit = {
    val m = TinyTransformer(dim = 8, layers = 1, heads = 2, ffMult = 2,
      maxTokens = 16, seed = 4242L)
    val out = args.headOption.getOrElse(
      "src/test/resources/fixtures/tiny_tx.safetensors")
    m.saveWeights(out)
    println(s"[gen-tx-fixture] wrote $out")
    // the pin comes from a DEFAULT-seed model loading the checkpoint:
    // token base vectors ride the model seed (vocabulary-free), so this
    // output is reproducible ONLY by actually loading the 4242-weights —
    // the seeded fallback and the 4242 model both embed differently
    val loaded = TinyTransformer(dim = 8, layers = 1, heads = 2, ffMult = 2,
      maxTokens = 16, weightsPath = Some(out))
    val v = loaded.embed("pinned fixture forward pass")
    println("[gen-tx-fixture] FixturePin.first3 = Seq(" +
      v.take(3).map(x => s"${x}f").mkString(", ") + ")")
  }
}

/** The pinned components (see [[GenTxFixture]]). */
object FixturePin {
  val first3: Seq[Float] = Seq(0.3107471f, -0.12230405f, -0.75889975f)
}
