package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch operators that need skew-proof plans (the event
  * tables of SURVEY.md §2.10 under production key distributions — one
  * celebrity/bot key holding a double-digit share of the corpus, the
  * shape the events scale probe plants as user 0).
  */
object EventOps {

  /** EV2b: gap-based sessionization with TIME-BLOCK salting — identical
    * output to the plain per-key window cumsum (ev2: session_id =
    * running count of gap-starts in (ts, id) order), different plan. The
    * plain form partitions the window by key alone, so a hot key sorts
    * its entire history in one task; here the cumsum is a distributed
    * prefix scan:
    *
    *  1. events get a contiguous time block (`ts div blockUs`, map-only);
    *     the local window partitions by (key, block) — a task is bounded
    *     by the hot key's busiest block;
    *  2. within a block, `is_new` for every event AFTER the first is
    *     decided locally (its predecessor is in the same block); the
    *     block's (first_ts, last_ts, local session count) make a
    *     blocks-per-key-sized summary;
    *  3. a per-key window over the summary resolves each block's FIRST
    *     event (new session iff no earlier block or the gap from the
    *     previous non-empty block's last_ts exceeds gapUs) and the
    *     running session offset carried into the block;
    *  4. session_id = carry-in offset + first-event decision + local
    *     cumsum, joined back on (key, block) — the exchange the local
    *     window already established.
    *
    * Equal timestamps share a block (blocks partition time), so the
    * (ts, id) tie order is preserved exactly. Block size trades the
    * summary table (keys x active blocks) against the per-task bound;
    * a day is right for clickstream-shaped data.
    */
  def sessionizeSalted(events: DataFrame, keyCol: String, tsUsCol: String,
      idCol: String, gapUs: Long, blockUs: Long): DataFrame = {
    require(gapUs >= 1 && blockUs >= 1,
      s"gapUs and blockUs must be >= 1: gapUs=$gapUs blockUs=$blockUs")
    val wLocal = Window.partitionBy(col(keyCol), col("__blk"))
      .orderBy(col(tsUsCol), col(idCol))
    val cum = wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rows = events
      .withColumn("__blk",
        expr(s"(`$tsUsCol` - pmod(`$tsUsCol`, ${blockUs}L)) div ${blockUs}L"))
      .withColumn("__prev", lag(col(tsUsCol), 1).over(wLocal))
      // first event of a block scores 0 here; its true decision needs the
      // previous block's last_ts and is resolved on the summary table
      .withColumn("__isNewLocal",
        when(col("__prev").isNotNull &&
          col(tsUsCol) - col("__prev") > gapUs, 1L).otherwise(0L))
      .withColumn("__localCum", sum(col("__isNewLocal")).over(cum))
    val blocks = rows.groupBy(col(keyCol), col("__blk"))
      .agg(min(col(tsUsCol)).as("__first"), max(col(tsUsCol)).as("__last"),
        sum(col("__isNewLocal")).as("__nLocal"))
    val wBlocks = Window.partitionBy(col(keyCol)).orderBy(col("__blk"))
    val offsets = blocks
      .withColumn("__prevLast", lag(col("__last"), 1).over(wBlocks))
      .withColumn("__firstNew",
        when(col("__prevLast").isNull ||
          col("__first") - col("__prevLast") > gapUs, 1L).otherwise(0L))
      .withColumn("__off",
        coalesce(sum(col("__nLocal") + col("__firstNew"))
          .over(wBlocks.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(keyCol), col("__blk"), col("__firstNew"), col("__off"))
    rows.join(offsets, Seq(keyCol, "__blk"))
      .withColumn("session_id",
        col("__off") + col("__firstNew") + col("__localCum"))
      .drop("__blk", "__prev", "__isNewLocal", "__localCum", "__firstNew",
        "__off")
  }
}
