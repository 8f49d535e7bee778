package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time tableStats exact vs approx (HLL) in isolation across
  * the decade dirs — the gate query runs BOTH twins, so its probe cell
  * can't show the approx path's own slope.
  * Usage: Test/runMain graft.ProbeStatsApprox
  */
object ProbeStatsApprox {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("probe-stats-approx").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
      "l_shipdate")
    for (dir <- Seq("/root/testdata/sf0.1", "/tmp/graft_sf1x",
        "/tmp/graft_sf100x")) {
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      for ((name, f) <- Seq(
          "exact" -> (() => graft.operators.TableQuality
            .tableStats(li, cols)),
          "approx" -> (() => graft.operators.TableQuality
            .tableStatsApprox(li, cols)))) {
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        println(f"[stats] $dir $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
