package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: repeated-run timing of the current bench hotspots, to split
  * first-hit JIT/codegen cost from steady-state cost before optimizing.
  */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("ss3_ivf_topk", "pipe_critique", "dd4_jaccard_pairs",
        "dd6_embedding_pairs", "eval_bertscore", "g1b_collect_salted",
        "ss2_lsh_topk", "ss1_cosine_topk")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile2] $name%-24s " +
        times.map(t => f"$t%6.2f").mkString(" "))
    }
    spark.stop()
  }
}
