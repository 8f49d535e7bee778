package graft
/** Dev-only: time one registered query (2 runs, prints both). */
object ProbeTime {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSuite.spark
    for (i <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.mode("overwrite")
        .format("noop").save()
      println(f"TIME $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
