package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Streaming ANN-index maintenance — the stream twin of the batch index
  * lifecycle ([[graft.operators.Similarity.ivfAppend]] / ss7b): vectors
  * arrive as a stream and the inverted file GROWS per micro-batch, with
  * the exactly-once discipline the summary/fingerprint sinks already
  * established.
  *
  * Contract (what makes the streamed index trustworthy):
  *  - the centroid model is FROZEN (trained once, batch-side) — each
  *    batch's assignment is a pure function of (vector, centroids), so
  *    the grown index is ROW-IDENTICAL to a batch rebuild over the same
  *    corpus with the same model (the ss7b append contract; pinned by
  *    `stream_index_append`'s gate and StreamingSpec). Centroid drift
  *    from skewed arrivals is a REBUILD decision, made offline — the
  *    FAISS add-vs-train split.
  *  - each batch lands under `batch_id=<id>` with OVERWRITE semantics
  *    (the writeSummaryBatch / nearDupDeduper discipline): a replay
  *    after a crash between parquet write and offset commit rewrites
  *    its own partition — no duplicates, no loss.
  *
  * Scale shape: one map-only assignment pass per batch (broadcast
  * two-level centroid index, optionally ANN-assisted via
  * `assignGroups`), an append-only parquet store partitioned by
  * batch_id — no state store, no watermark, nothing driver-side but the
  * metadata-scale model. Serving reads the store as the inverted file
  * ([[graft.operators.Similarity.ivfSearch]] takes it as-is after
  * dropping batch_id).
  */
object IndexStreams {

  /** The foreachBatch body: assign `batch` (vec_id, embedding) against
    * the frozen model and land it under its batch_id partition.
    */
  final class IvfAppender(centroids: Array[Array[Float]], storeDir: String,
      assignGroups: Int = 0) extends Serializable {
    def apply(batch: DataFrame, batchId: Long): Unit =
      Similarity.ivfAssign(
          batch.select(col("vec_id"), col("embedding")), centroids,
          assignGroups)
        .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
  }

  /** The streamed inverted file: every appended batch, batch_id dropped —
    * the exact shape [[graft.operators.Similarity.ivfSearch]] serves from.
    */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame =
    spark.read.option("basePath", storeDir).parquet(storeDir)
      .select(col("vec_id"), col("emb_c"), col("norm_c"), col("cell"))
}
