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
  *    from skewed arrivals is a REBUILD decision — the FAISS
  *    add-vs-train split — measured by [[IndexDrift]] and ACTED ON by
  *    [[IndexRebuild]] (retrain + atomic snapshot-version swap).
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

/** Centroid-DRIFT measurement for the frozen-model streamed index — the
  * measured input the rebuild decision was missing (r10 verdict: the
  * add-vs-train split correctly freezes the model, but "rebuild offline
  * when the data drifts" had no number attached; a production stream
  * would serve a degrading index silently). [[IndexRebuild]] closes the
  * loop: it consumes this signal and performs the retrain + atomic
  * version swap.
  *
  * Two signals per micro-batch, both against a TRAIN-TIME profile:
  *  - assignment distance (1 − cosine of each vector to its assigned
  *    centroid): a batch whose MEAN distance exceeds the profile's p95
  *    is typical-vector-far — new content the frozen cells do not cover;
  *  - cell-occupancy shift: total-variation distance between the batch's
  *    cell-share distribution and the train-time one — content that
  *    still lands near centroids but floods different cells (skews
  *    nProbe search cost and recall).
  *
  * Scale shape: the distance column is a broadcast equi-join against the
  * nCells-row centroid table plus codegen'd column math (no UDF); the
  * per-batch reduction is one aggregate + one ≤nCells-row occupancy
  * collect — O(batch) work, metadata-scale driver state. The profile is
  * the same two passes over the training corpus, computed once when the
  * model is trained. p95 comes from approx_percentile (the 100 TB shape;
  * its rank error is far inside the flag margins this gate needs).
  *
  * Thresholds are EXPLICIT knobs (meanVsP95 margin factor, tvMax) — the
  * defaults flag a batch whose mean assignment distance exceeds the
  * train-time p95, or whose occupancy moves ≥ 0.5 in TV. Both fire long
  * before search quality collapses; `stream_drift_gate` plants a drifted
  * batch and pins that clean batches stay unflagged while the planted
  * one flags.
  */
object IndexDrift {

  import org.apache.spark.sql.SparkSession

  /** Train-time reference: mean/p95 assignment distance + cell shares. */
  final case class Profile(meanDist: Double, p95Dist: Double,
      cellShare: Map[Int, Double]) extends Serializable

  /** One drift record per micro-batch. */
  final case class DriftRow(batch_id: Long, n: Long, mean_dist: Double,
      p95_dist: Double, occ_tv: Double, drifted: Int)

  /** The nCells-row centroid side of the distance join. */
  private def centroidTable(spark: SparkSession,
      centroids: Array[Array[Float]]): DataFrame = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) =>
      var nn = 0.0
      var j = 0
      while (j < c.length) { nn += c(j).toDouble * c(j); j += 1 }
      (i, c, math.sqrt(nn))
    }.toSeq.toDF("cell", "c_emb", "c_norm")
  }

  /** Assigned rows (vec_id, emb_c, norm_c, cell) + `dist` = 1 − cosine to
    * the assigned centroid (zero-norm rows: cosine 0 → dist 1, the family
    * convention). Broadcast join + codegen'd columns — map-only.
    */
  def withAssignDist(assigned: DataFrame,
      centroids: Array[Array[Float]]): DataFrame = {
    import graft.functions.vecDotF
    val denom = col("norm_c") * col("c_norm")
    assigned
      .join(broadcast(centroidTable(assigned.sparkSession, centroids)), "cell")
      .withColumn("dist",
        lit(1.0) - when(denom === 0.0, 0.0)
          .otherwise(vecDotF(col("emb_c"), col("c_emb")) / denom))
      .drop("c_emb", "c_norm")
  }

  /** (n, meanDist, p95Dist, cellShare) over an assigned+dist frame — the
    * shared reduction behind [[profile]] and the per-batch record.
    */
  private def stats(withDist: DataFrame)
      : (Long, Double, Double, Map[Int, Double]) = {
    val agg = withDist.agg(
      count(lit(1)).as("n"),
      avg(col("dist")).as("mean_dist"),
      percentile_approx(col("dist"), lit(0.95), lit(10000)).as("p95_dist"))
      .collect()(0)
    val n = agg.getAs[Long]("n")
    if (n == 0L) return (0L, 0.0, 0.0, Map.empty)
    val occ = withDist.groupBy(col("cell")).count().collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("count").toDouble / n)
      .toMap
    (n, agg.getAs[Double]("mean_dist"), agg.getAs[Double]("p95_dist"), occ)
  }

  /** Train-time profile over the corpus the model was trained on (one
    * aggregate + one ≤nCells occupancy pass — run once, next to
    * [[graft.operators.Similarity.buildIvfIndex]]).
    */
  def profile(assigned: DataFrame,
      centroids: Array[Array[Float]]): Profile = {
    val (_, mean, p95, occ) = stats(withAssignDist(assigned, centroids))
    Profile(mean, p95, occ)
  }

  /** The drift record for one batch vs the profile. `drifted` fires when
    * the batch's MEAN assignment distance exceeds the train-time p95
    * (typical vector farther than the train-time tail) or the occupancy
    * TV distance exceeds `tvMax`. Empty batches report zeros, unflagged.
    */
  def batchDrift(batchAssigned: DataFrame, centroids: Array[Array[Float]],
      prof: Profile, batchId: Long, tvMax: Double = 0.5): DriftRow = {
    val (n, mean, p95, occ) = stats(withAssignDist(batchAssigned, centroids))
    if (n == 0L) return DriftRow(batchId, 0L, 0.0, 0.0, 0.0, 0)
    val cells = (occ.keySet ++ prof.cellShare.keySet).toSeq
    val tv = 0.5 * cells.map(c =>
      math.abs(occ.getOrElse(c, 0.0) - prof.cellShare.getOrElse(c, 0.0))).sum
    val drifted = mean > prof.p95Dist || tv > tvMax
    DriftRow(batchId, n, mean, p95, tv, if (drifted) 1 else 0)
  }

  /** [[IndexStreams.IvfAppender]] + drift accounting: ONE assignment pass
    * per batch (Materialized — consumed by the index write and both
    * drift reductions), the index partition landing exactly as the plain
    * appender's, plus one drift row under `driftDir/batch_id=<id>` with
    * the same overwrite/replay idempotence.
    */
  final class DriftingIvfAppender(centroids: Array[Array[Float]],
      storeDir: String, driftDir: String, prof: Profile,
      assignGroups: Int = 0, tvMax: Double = 0.5) extends Serializable {
    def apply(batch: DataFrame, batchId: Long): Unit = {
      val spark = batch.sparkSession
      import spark.implicits._
      val assigned = graft.operators.Materialize(
        graft.operators.Similarity.ivfAssign(
          batch.select(col("vec_id"), col("embedding")), centroids,
          assignGroups))
      assigned.write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
      Seq(batchDrift(assigned, centroids, prof, batchId, tvMax)).toDF()
        .drop("batch_id")
        .write.mode("overwrite").parquet(s"$driftDir/batch_id=$batchId")
    }
  }

  /** The drift history: one row per appended batch. */
  def readDrift(spark: SparkSession, driftDir: String): DataFrame =
    spark.read.option("basePath", driftDir).parquet(driftDir)
      .select(col("batch_id"), col("n"), col("mean_dist"), col("p95_dist"),
        col("occ_tv"), col("drifted"))

  /** A unit direction ORTHOGONAL to every centroid (Gram–Schmidt residual
    * of the first standard-basis vector with non-negligible residual
    * against the centroid span) — by construction the content the frozen
    * cells maximally do not cover: every such vector assigns with cosine
    * ≈ 0 (distance ≈ 1) and the whole batch collapses into one cell.
    * Driver-side, O(k²·d) flops on the metadata-scale model. Used to
    * PLANT ground-truth drift (stream_drift_gate, specs) and to
    * synthesize out-of-distribution probes; throws if the centroids span
    * the full space (k >= d with full rank — no uncovered direction
    * exists; nCells is far below dim in every registered config).
    */
  def uncoveredDirection(centroids: Array[Array[Float]]): Array[Float] = {
    require(centroids.nonEmpty, "empty centroid set")
    val d = centroids.map(_.length).max
    // orthonormalize the centroid span
    val basis = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    centroids.foreach { c =>
      val v = Array.tabulate(d)(i => if (i < c.length) c(i).toDouble else 0.0)
      basis.foreach { b =>
        var dot = 0.0
        var i = 0
        while (i < d) { dot += v(i) * b(i); i += 1 }
        i = 0
        while (i < d) { v(i) -= dot * b(i); i += 1 }
      }
      val nn = math.sqrt(v.map(x => x * x).sum)
      if (nn > 1e-9) basis += v.map(_ / nn)
    }
    // residual of the first basis vector e_k outside the span
    var k = 0
    while (k < d) {
      val v = new Array[Double](d)
      v(k) = 1.0
      basis.foreach { b =>
        val dot = b(k) // e_k · b
        var i = 0
        while (i < d) { v(i) -= dot * b(i); i += 1 }
      }
      val nn = math.sqrt(v.map(x => x * x).sum)
      if (nn > 1e-3) return v.map(x => (x / nn).toFloat)
      k += 1
    }
    sys.error(s"centroids span the full $d-dim space — no uncovered " +
      "direction exists (nCells >= dim with full rank)")
  }
}
