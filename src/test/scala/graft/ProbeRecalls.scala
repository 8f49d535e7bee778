package graft

/** Dev-only: print the measured recall of every approximate-path recall
  * query at one or more SF dirs — used to pick safe-but-meaningful floors
  * for the hash-checked recall gates (the cl2_containment pattern applied
  * to the *_recall family). All paths are deterministic (seeded planes /
  * sampled Lloyd / PQ codebooks), so per-SF these values are exact.
  * Usage: runMain graft.ProbeRecalls <sfDir>...
  */
object ProbeRecalls {
  def main(args: Array[String]): Unit = {
    val spark = SparkSuite.spark
    import org.apache.spark.sql.functions._
    val names = Seq("ss2_recall", "ss3_recall", "qz4_recall",
      "dd6b_recall", "cl3_semdedup_recall")
    for (dir <- args; name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val mean = df.agg(avg(col("recall"))).head.getDouble(0)
      println(f"PROBE $dir%-28s $name%-22s mean_recall=$mean%.4f")
    }
    spark.stop()
  }
}
