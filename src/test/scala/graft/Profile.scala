package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the eval pipeline to localize cost. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val info = sc.stageInfo
          val dur = for {
            s <- info.submissionTime; c <- info.completionTime
          } yield (c - s) / 1000.0
          if (dur.exists(_ > 1.0))
            println(f"[stage] ${dur.get}%.1f s  id=${info.stageId} " +
              f"tasks=${info.numTasks} ${info.name.take(80)}")
        }
      })

    val d = Pipelines.docs(spark, sfDir)
    time("warmup count")(d.count())

    time("warmup eval_pair_metrics sf0.001")(
      force(Pipelines.pairMetrics(spark, "/root/testdata/sf0.001")))
    time("bench-style eval_pair_metrics run 1")(
      force(Pipelines.pairMetrics(spark, sfDir)))
    time("bench-style eval_pair_metrics run 2")(
      force(Pipelines.pairMetrics(spark, sfDir)))
    time("bench-style eval_summary_stats")(
      force(Pipelines.evalStats(spark, sfDir)))

    time("cold build+force mapReduce sf0.001")(
      force(Pipelines.strategies().mapReduce(
        Pipelines.docs(spark, "/root/testdata/sf0.001"))))
    val gen = time("build mapReduce (driver loop)")(
      Pipelines.strategies().mapReduce(d).withColumnRenamed("summary", "gen"))
    time("warm rebuild mapReduce")(
      Pipelines.strategies().mapReduce(d))
    time("force gen")(force(gen))
    time("force gen again")(force(gen))

    val ref = d.select(col("doc_id"),
      udf((t: String) => graft.llm.LeadSummarizer.summarize(t, 12)).apply(col("text")).as("ref"))
    time("force ref")(force(ref))

    val joined = gen.join(ref, "doc_id")
    val planStr = joined.queryExecution.executedPlan.toString
    println("[profile] join plan has InMemoryRelation: " +
      planStr.contains("InMemoryTableScan") + ", nodes: " + planStr.linesIterator.size)
    time("force join")(force(joined))

    val rouge = joined.withColumn("rouge",
      graft.functions.udfs.rougeStruct(col("gen"), col("ref")))
    time("force join+rouge")(force(rouge))

    val full = graft.eval.Metrics.pairMetrics(joined)
    time("force pairMetrics")(force(full))
    time("force pairMetrics again")(force(full))
    spark.stop()
  }
}
