package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Streaming state-store observability as a QUERYABLE operator — the
  * measurement the ev6/ev8/funnel state-bound arguments were made with
  * (ProbeStreamState), promoted from a dev probe to library surface: per
  * micro-batch, the input-row count and every stateful operator's state
  * rows / bytes / updates / evictions, as a DataFrame any downstream
  * query, sink, or alert can consume.
  *
  * Why it matters at 100 TB: every watermark argument in the streaming
  * family ("state is bounded by rate × (delay + window)") is a CLAIM
  * about these numbers — a mis-set watermark shows up here as
  * monotonically growing `state_rows` long before the job OOMs. This
  * table is the one to chart per trigger in production.
  *
  * Two sources:
  *  - [[stateMetrics]]: the query's own `recentProgress` ring buffer —
  *    zero setup, but Spark keeps only the last
  *    `spark.sql.streaming.numRecentProgressUpdates` (default 100)
  *    entries, so long-running queries lose early batches.
  *  - [[ProgressRecorder]]: a `StreamingQueryListener` that captures
  *    every progress event into a bounded in-memory buffer — attach
  *    before `start()` to keep the full history (cap it; the rows are
  *    tiny). Listener events are driver-side and metadata-scale: nothing
  *    here touches executors or plans.
  */
object StreamObservability {

  /** One row per (micro-batch, query): the state-store health record. */
  final case class StateMetricsRow(
      query_id: String,
      batch_id: Long,
      input_rows: Long,
      state_operators: Int,
      state_rows: Long,
      state_bytes: Long,
      rows_updated: Long,
      rows_removed: Long)

  private def row(p: org.apache.spark.sql.streaming.StreamingQueryProgress)
      : StateMetricsRow = {
    val st = p.stateOperators
    StateMetricsRow(
      query_id = p.id.toString,
      batch_id = p.batchId,
      input_rows = p.numInputRows,
      state_operators = st.length,
      state_rows = st.map(_.numRowsTotal).sum,
      state_bytes = st.map(_.memoryUsedBytes).sum,
      rows_updated = st.map(_.numRowsUpdated).sum,
      rows_removed = st.map(_.numRowsRemoved).sum)
  }

  /** State metrics from the query's `recentProgress` ring buffer (the
    * last ~100 triggers). Call after `processAllAvailable()` /
    * `awaitTermination()` for a complete short replay, or periodically
    * on a live query for a rolling window.
    */
  def stateMetrics(spark: SparkSession, q: StreamingQuery): DataFrame = {
    import spark.implicits._
    q.recentProgress.toSeq.map(row).toDF()
  }

  /** Full-history progress capture: attach BEFORE starting the query,
    * detach (or just discard) after. `maxEvents` bounds driver memory —
    * past it the recorder keeps the newest events and counts the drops
    * (`droppedEvents`), never throws on a hot stream.
    */
  final class ProgressRecorder(maxEvents: Int = 100000)
      extends StreamingQueryListener {
    require(maxEvents >= 1, s"maxEvents must be >= 1: $maxEvents")
    private val buf =
      new scala.collection.mutable.ArrayDeque[StateMetricsRow]()
    @volatile private var dropped = 0L

    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
      buf.append(row(e.progress))
      if (buf.length > maxEvents) { buf.removeHead(); dropped += 1 }
    }

    def droppedEvents: Long = dropped
    def snapshot: Seq[StateMetricsRow] = synchronized { buf.toSeq }

    /** The captured history as a DataFrame (driver-side rows; one per
      * trigger per query observed while attached).
      */
    def stateMetrics(spark: SparkSession): DataFrame = {
      import spark.implicits._
      snapshot.toDF()
    }
  }

  /** Attach a fresh recorder to the session's stream manager. Caller
    * detaches with [[detach]] when done (listeners outlive queries).
    */
  def attach(spark: SparkSession, maxEvents: Int = 100000): ProgressRecorder = {
    val r = new ProgressRecorder(maxEvents)
    spark.streams.addListener(r)
    r
  }

  def detach(spark: SparkSession, r: ProgressRecorder): Unit =
    spark.streams.removeListener(r)
}
