package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the stream_drift_gate's internals with the per-batch drift
  * rows printed (mean/p95 dist, occupancy TV, flags) — for sizing the
  * flag margins. `sbt "Test/runMain graft.ProbeDrift <sfDir>"`.
  */
object ProbeDrift {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (assigned, cs) = operators.Similarity.buildIvfIndex(emb, 16, 2)
    val prof = streaming.IndexDrift.profile(assigned, cs)
    println(s"profile: mean=${prof.meanDist} p95=${prof.p95Dist} " +
      s"cells=${prof.cellShare.toSeq.sortBy(_._1).map{case(c,s)=>f"$c:$s%.3f"}.mkString(" ")}")
    val root = java.nio.file.Files.createTempDirectory("graft_pdg_")
    val inDir = s"$root/in"
    emb.repartition(3).write.mode("overwrite").parquet(inDir)
    val ood = streaming.IndexDrift.uncoveredDirection(cs)
    emb.select((col("vec_id") + 10000000L).as("vec_id"),
        typedLit(ood.toSeq).as("embedding"))
      .coalesce(1).write.mode("append").parquet(inDir)
    val schema = spark.read.parquet(inDir).schema
    val stream = streaming.CorpusStreams
      .readDocStream(spark, inDir, schema, maxFilesPerTrigger = 1,
        glob = "*.parquet")
    val store = s"$root/idx"
    val driftDir = s"$root/drift"
    val appender = new streaming.IndexDrift.DriftingIvfAppender(
      cs, store, driftDir, prof)
    val q = stream.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        appender(b, id) }
      .start()
    q.awaitTermination()
    val drift = streaming.IndexDrift.readDrift(spark, driftDir)
    val planted = spark.read.option("basePath", store).parquet(store)
      .groupBy(col("batch_id"))
      .agg((max(col("vec_id")) >= 10000000L).cast("int").as("planted"),
        count(lit(1)).as("n_idx"))
    drift.join(planted, Seq("batch_id")).orderBy(col("batch_id"))
      .show(50, truncate = false)
    spark.stop()
  }
}
