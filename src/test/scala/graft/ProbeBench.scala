package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: forward-order bench with per-query session-state probes
  * (persisted RDD count, storage memory used, cumulative GC seconds) to
  * localize the tail-query slowdown seen in full-registry runs.
  */
object ProbeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def gcSec: Double = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum / 1000.0
    }
    def storageMB: Long = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.getPersistentRDDs.values
        .map(_ => 0L).sum // placeholder; use executor memory status instead
      spark.sparkContext.getExecutorMemoryStatus.values
        .map { case (max, remaining) => max - remaining }.sum / (1024 * 1024)
    }
    val warm = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001").getPath
    Seq("q1_agg", "eval_pair_metrics", "ss3_ivf_topk").foreach { n =>
      try force(SparkEntry.queries(n)(spark, warm)) catch { case e: Throwable => () }
    }
    println(f"[probe] START rdds=${spark.sparkContext.getPersistentRDDs.size} storMB=$storageMB gc=$gcSec%.1f heapMB=${Runtime.getRuntime.totalMemory/1024/1024}")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val g0 = gcSec
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name%-28s ${dt}%7.2f s  gc+=${gcSec - g0}%6.2f  rdds=${spark.sparkContext.getPersistentRDDs.size}%3d  storMB=$storageMB%6d  heapMB=${Runtime.getRuntime.totalMemory/1024/1024}%6d")
    }
    spark.stop()
  }
}
