package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (SCALE.md §streaming-state): measure the stream-stream
  * attribution join's state store (ev6 inner / ev8 outer) against a real
  * event corpus replayed in EVENT-TIME ORDER — the docs assert that the
  * range-bound-derived state watermark bounds per-side state to
  * rate × (watermark delay + window), constant in stream length; this
  * records the actual StreamingQueryProgress state metrics per micro-batch
  * so the assertion carries numbers across probe decades.
  *
  * Replay shape: the corpus is split into `chunks` contiguous time slices,
  * each written as one parquet file in slice order (the file source
  * processes files oldest-modtime-first, and with maxFilesPerTrigger=1 per
  * side each micro-batch consumes exactly the next slice of both sides) —
  * i.e. a live stream's arrival order, which is what makes the watermark
  * advance and eviction observable. A randomly-ordered replay would pin
  * the watermark near max(ts) after batch one and measure only late-row
  * drops, not steady-state size.
  *
  * Usage: sbt "Test/runMain graft.ProbeStreamState <eventsParquet> [chunks] [inner|outer]"
  */
object ProbeStreamState {
  def main(args: Array[String]): Unit = {
    val eventsDir = args.headOption.getOrElse("/root/testdata/sf0.1/events.parquet")
    val chunks = args.lift(1).map(_.toInt).getOrElse(30)
    val outer = args.lift(2).contains("outer")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("probe-stream-state").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // driver drops write ts as TIMESTAMP_NTZ; normalize (session tz is UTC)
    val ev = spark.read.parquet(eventsDir)
      .withColumn("ts", col("ts").cast("timestamp"))
    val b = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts")))).head()
    val (lo, hi) = (b.getLong(0), b.getLong(1) + 1L)
    val width = (hi - lo + chunks - 1) / chunks
    val root = java.nio.file.Files.createTempDirectory("stream_state").toString
    println(s"[probe-stream-state] replaying $eventsDir in $chunks time slices" +
      s" (outer=$outer) via $root")

    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("ts").as("p_ts"), col("user_id"),
        col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("ts").as("c_ts"), col("user_id").as("c_user"),
        col("event_id").as("click_id"))
    for (i <- 0 until chunks) {
      val (s, e) = (lo + i * width, lo + (i + 1) * width)
      def slice(df: org.apache.spark.sql.DataFrame, tsCol: String) = df
        .filter(unix_micros(col(tsCol)) >= s && unix_micros(col(tsCol)) < e)
        .coalesce(1)
      slice(purchases, "p_ts").write.mode(SaveMode.Append).parquet(s"$root/p")
      slice(clicks, "c_ts").write.mode(SaveMode.Append).parquet(s"$root/c")
    }

    val pS = spark.readStream.schema(purchases.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/p")
    val cS = spark.readStream.schema(clicks.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/c")
    val joined =
      if (outer) graft.streaming.EventStreams.attributionJoinOuter(pS, cS)
      else graft.streaming.EventStreams.attributionJoin(pS, cS)
    val q = joined.writeStream.format("noop")
      .option("checkpointLocation", s"$root/ckpt")
      .outputMode("append").start()
    q.processAllAvailable()
    val progress = q.recentProgress.filter(_.stateOperators.nonEmpty)
    println(f"${"batch"}%6s ${"inRows"}%10s ${"stateRows"}%10s " +
      f"${"stateMB"}%8s ${"removed"}%8s")
    progress.foreach { p =>
      val st = p.stateOperators
      println(f"${p.batchId}%6d ${p.numInputRows}%10d " +
        f"${st.map(_.numRowsTotal).sum}%10d " +
        f"${st.map(_.memoryUsedBytes).sum / 1e6}%8.1f " +
        f"${st.map(_.numRowsRemoved).sum}%8d")
    }
    val totalIn = progress.map(_.numInputRows).sum
    val maxState = progress.map(_.stateOperators.map(_.numRowsTotal).sum).max
    val lastState = progress.last.stateOperators.map(_.numRowsTotal).sum
    val maxMb = progress.map(_.stateOperators.map(_.memoryUsedBytes).sum).max / 1e6
    println(f"PROBE_STREAM_STATE dir=$eventsDir outer=$outer chunks=$chunks " +
      f"total_input_rows=$totalIn max_state_rows=$maxState " +
      f"final_state_rows=$lastState max_state_mb=$maxMb%.1f")
    q.stop()
    spark.stop()
  }
}
