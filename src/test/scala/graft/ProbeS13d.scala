package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r12 next-#1): measure the layout family's READ-side
  * data skipping on DECORRELATED keys at decade scale. The replicated
  * decade corpora offset all lineitem keys together, so their points lie
  * on the key-plane diagonal and the curve fills only diagonal buckets
  * (the degeneration SCALEPROBE_r12 recorded) — any skipping measured
  * there understates the independent-keys case a real table presents.
  * This probe synthesizes n rows with INDEPENDENT uniform keys (two
  * xxhash64 streams of the row id), writes the same rows
  * Hilbert-clustered and round-robin, and measures for one middle-quarter
  * two-key box (selectivity 1/16 of the plane):
  *   - files a min/max-pruning planner reads per layout (footer-box
  *     intersection, recomputed from the files — the s13d gate rule);
  *   - wall seconds for the actual filtered aggregate per layout (the
  *     end-to-end read-side payoff: Spark's parquet reader prunes row
  *     groups from the same min/max under the pushed predicate).
  * File count grows with the decade (16/32/64) the way a real table's
  * would. Usage: sbt "Test/runMain graft.ProbeS13d [maxRows]"
  */
object ProbeS13d {
  def main(args: Array[String]): Unit = {
    val maxRows = args.headOption.map(_.toLong).getOrElse(60000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val span = 3000000L
    val (a1, a2) = (span / 4, span / 2)
    for ((n, files) <- Seq((600000L, 16), (6000000L, 32), (60000000L, 64))
        if n <= maxRows) {
      val df = spark.range(n).select(
        pmod(xxhash64(col("id"), lit(1)), lit(span)).as("a"),
        pmod(xxhash64(col("id"), lit(2)), lit(span)).as("b"),
        col("id"))
      val root = java.nio.file.Files.createTempDirectory("graft_ps13d_")
      try {
        var t0 = System.nanoTime()
        graft.operators.ZOrder.writeHilbert(df, "a", "b",
          0L, span - 1, 0L, span - 1, s"$root/clustered", numFiles = files)
        val tWriteH = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        df.repartition(files).write.mode("overwrite").parquet(s"$root/plain")
        val tWriteP = (System.nanoTime() - t0) / 1e9
        def filesRead(p: String): Long =
          spark.read.parquet(p)
            .groupBy(input_file_name().as("f"))
            .agg(min(col("a")).as("mina"), max(col("a")).as("maxa"),
              min(col("b")).as("minb"), max(col("b")).as("maxb"))
            .filter(col("maxa") >= a1 && col("mina") <= a2 &&
              col("maxb") >= a1 && col("minb") <= a2)
            .count()
        def timedScan(p: String): (Double, Long) = {
          val t = System.nanoTime()
          val c = spark.read.parquet(p)
            .filter(col("a").between(a1, a2) && col("b").between(a1, a2))
            .agg(count(lit(1))).head().getLong(0)
          ((System.nanoTime() - t) / 1e9, c)
        }
        val fC = filesRead(s"$root/clustered")
        val fP = filesRead(s"$root/plain")
        val (sC, nC) = timedScan(s"$root/clustered")
        val (sP, nP) = timedScan(s"$root/plain")
        println(f"""[probe-s13d] {"rows":$n,"files":$files,""" +
          f""""files_read_clustered":$fC,"files_read_plain":$fP,""" +
          f""""scan_sec_clustered":$sC%.2f,"scan_sec_plain":$sP%.2f,""" +
          f""""rows_clustered":$nC,"rows_plain":$nP,""" +
          f""""write_sec_hilbert":$tWriteH%.1f,"write_sec_plain":$tWriteP%.1f}""")
      } finally {
        val s = java.nio.file.Files.walk(root)
        try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.deleteIfExists(p))
        finally s.close()
      }
    }
    spark.stop()
  }
}
