package graft

/** Dev tool: print the deterministic strategy outputs for the golden-pin
  * fixture in StrategiesSpec (run once, paste the literals).
  */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "Alpha beta gamma delta. Epsilon zeta eta theta iota kappa. " +
        "Lambda mu nu xi omicron pi rho sigma. Tau upsilon phi chi psi omega. " +
        "Alpha again closes the loop with beta and gamma for emphasis."),
      (2L, "One two three. Four five six seven eight nine ten eleven twelve. " +
        "Thirteen fourteen fifteen sixteen. Seventeen eighteen nineteen twenty."))
      .toDF("doc_id", "text")
    val s = Pipelines.strategies()
    for ((name, df) <- Seq(
        "truncated" -> s.truncated(docs),
        "mapReduce" -> s.mapReduce(docs),
        "critique" -> s.mapReduceCritique(docs),
        "iterative" -> s.iterative(docs))) {
      df.orderBy("doc_id").collect().foreach { r =>
        println(s"GOLDEN $name ${r.get(0)} -> ${r.get(1)}")
      }
    }
    spark.stop()
  }
}
