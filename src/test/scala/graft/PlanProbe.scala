package graft

/** Dev-only plan audit for one registered query: flags the scale
  * anti-patterns (cartesian, nested-loop join, single-partition window)
  * and prints the join/exchange/aggregate skeleton.
  * Usage: Test/runMain graft.PlanProbe <name> [sfDir]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("pipe_curation")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSuite.spark
    val df = SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.executedPlan.toString
    println("CARTESIAN: " + plan.contains("CartesianProduct"))
    println("BNLJ: " + plan.contains("BroadcastNestedLoopJoin"))
    println("GLOBAL_WINDOW: " +
      (plan.contains("Window") && plan.contains("SinglePartition")))
    println(plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Aggregate"))
      .take(40).mkString("\n"))
    spark.stop()
  }
}
