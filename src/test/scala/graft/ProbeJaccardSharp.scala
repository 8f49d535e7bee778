package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (SCALE.md §scale-probe-100x): measure how banding sharpness
  * controls dd4b's candidate volume on a corpus with high background
  * similarity. Usage:
  *   sbt "Test/runMain graft.ProbeJaccardSharp <docsDir> [bands rows]..."
  * Prints pairs/candidates/seconds for each (bands, rowsPerBand) config.
  */
object ProbeJaccardSharp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10x")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))
      .appName("probe-jaccard-sharp").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    for (cfg <- Seq((4, 2), (4, 4), (6, 4))) {
      val (bands, rows) = cfg
      val cand = graft.operators.Dedup.minhashLshPairs(
        docs, "text", 3, bands, rows).count()
      val t0 = System.nanoTime()
      val pairs = graft.operators.Dedup.jaccardVerifiedPairs(
        docs, "text", 3, bands, rows, 0.5).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe-sharp] bands=$bands rows=$rows candidates=$cand%d " +
        f"pairs=$pairs%d verify_sec=$sec%.1f")
    }
    spark.stop()
  }
}
