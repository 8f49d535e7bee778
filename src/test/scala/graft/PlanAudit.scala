package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for representative queries so
  * scan pruning (ReadSchema), filter pushdown (PushedFilters), broadcast
  * joins and codegen spans can be eyeballed per round.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "j1_join_revenue", "f2_token_counts", "ss1_cosine_topk",
        "dd4_jaccard_pairs", "ev1_event_window", "p5_top_orders")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
