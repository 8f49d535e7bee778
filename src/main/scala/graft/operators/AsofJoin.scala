package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join — for every left row, the single most recent right row of
  * the same key with `right.ts <= left.ts` (the time-series/point-in-time
  * join: "state as of this moment"; feature lookups, attribution,
  * last-signup-before-purchase). Spark has no built-in; the naive
  * formulation is a range join that explodes to |left|×|right| per key
  * before picking one row.
  *
  * This is the scalable union+window form instead: tag sides, align
  * schemas, union, then one window per key ordered by (ts, side, id) with
  * a running `last(state, ignoreNulls)` — right rows deposit their payload
  * as ONE nullable struct (so a right row whose payload fields are all
  * null still deposits, and left rows — whose state slot is a null
  * STRUCT, not a struct of nulls — never do), left rows read it. Cost:
  * ONE shuffle on the key and a running window frame with O(1) state per
  * row — no per-key pair explosion, no range-join planning cliff; skew is
  * bounded by the busiest key like any keyed window.
  *
  * Tie semantics: a right row at exactly left.ts matches (inclusive, the
  * ASOF convention); among right rows sharing (key, ts), the largest
  * `idCol` wins — deterministic on both engines.
  */
object AsofJoin {

  /** Both inputs must carry (keyCol, tsCol, idCol); the left keeps all its
    * columns and gains `prefix`+payload columns from the matched right row
    * (null when the key has no right row at or before left.ts).
    *
    * `strict = true` switches the match to `right.ts < left.ts` — the
    * leakage-free convention for feature lookups, where state recorded at
    * the same instant as the observation must NOT be visible to it. In the
    * union ordering that is just left-before-right at equal ts.
    */
  /** Shared side-tagging for the union+window forms: left rows carry a
    * null state struct, right rows deposit their payload as one nullable
    * struct, and `__side` encodes the tie order at equal ts (inclusive:
    * right first; strict: left first).
    */
  private def tagSides(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      rightPayload: Seq[String], strict: Boolean): (DataFrame, Int) = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val shared = Seq(keyCol, tsCol, idCol)
    val stateType = StructType(rightPayload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    val leftTypes = left.schema.fields.map(f => f.name -> f.dataType).toMap
    // inclusive: right sorts before left at equal ts, so same-instant state
    // is visible; strict: left sorts first, so it is not
    val leftSide = if (strict) 0 else 1
    val lTagged = left
      .withColumn("__state", lit(null).cast(stateType))
      .withColumn("__side", lit(leftSide))
    // right rows: shared keys + payload struct, left-only columns as nulls
    val rCols = left.columns.toSeq.map { c =>
      if (shared.contains(c)) col(c) else lit(null).cast(leftTypes(c)).as(c)
    } :+ struct(rightPayload.map(col): _*).cast(stateType).as("__state")
    val rTagged = right.select(rCols: _*)
      .withColumn("__side", lit(1 - leftSide))
    (lTagged.unionByName(rTagged), leftSide)
  }

  def asofJoinPrior(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      rightPayload: Seq[String], prefix: String = "asof_",
      strict: Boolean = false): DataFrame = {
    val (unioned, leftSide) = tagSides(left, right, keyCol, tsCol, idCol,
      rightPayload, strict)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = unioned
      .withColumn("__state", last(col("__state"), ignoreNulls = true).over(w))
      .filter(col("__side") === leftSide)
    joined.select(left.columns.map(col) ++
      rightPayload.map(c => col("__state").getField(c).as(s"$prefix$c")): _*)
  }

  /** AJ1b: [[asofJoinPrior]] with TIME-BLOCK salting for skewed keys —
    * identical output, different plan. The plain form's window partitions
    * by key alone, so a key holding 20% of a 100 TB corpus sorts 20% of
    * the corpus in ONE task (the hot-user shape the events scale probe
    * measures). Here the running `last(state)` is computed as a
    * distributed prefix scan instead:
    *
    *  1. rows get a contiguous time block (`ts div blockUs` — map-only);
    *     the local window partitions by (key, block), bounding any task by
    *     the hot key's busiest block, not the whole key;
    *  2. each (key, block)'s FINAL deposited state (max_by over the block
    *     order; `max_by` so the payload itself never needs to be
    *     orderable) forms a blocks-per-key-sized summary table;
    *  3. a per-key window over that tiny table computes each block's
    *     carry-in (last non-null final among earlier blocks), joined back
    *     on (key, block) — the same exchange the local window already
    *     established;
    *  4. a row's state = coalesce(local running state, carry-in).
    *
    * Equal timestamps always share a block (blocks partition time), so
    * the (ts, side, id) tie order is preserved exactly; the result is the
    * global running last, row for row. Pick blockUs so a busy key's
    * block holds memory-partition-sized rows (e.g. a day for
    * clickstreams); the summary table costs keys x active-blocks rows.
    */
  def asofJoinPriorSalted(left: DataFrame, right: DataFrame,
      keyCol: String, tsCol: String, idCol: String,
      rightPayload: Seq[String], blockUs: Long, prefix: String = "asof_",
      strict: Boolean = false): DataFrame = {
    require(blockUs >= 1, s"blockUs must be >= 1: $blockUs")
    val (tagged, leftSide) = tagSides(left, right, keyCol, tsCol, idCol,
      rightPayload, strict)
    val unioned = tagged.withColumn("__blk",
      expr(s"(`$tsCol` - pmod(`$tsCol`, ${blockUs}L)) div ${blockUs}L"))
    val wLocal = Window.partitionBy(col(keyCol), col("__blk"))
      .orderBy(col(tsCol), col("__side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = unioned.withColumn("__stateLocal",
      last(col("__state"), ignoreNulls = true).over(wLocal))
    val blockFinal = withLocal.filter(col("__state").isNotNull)
      .groupBy(col(keyCol), col("__blk"))
      .agg(max_by(col("__state"),
        struct(col(tsCol), col("__side"), col(idCol))).as("__final"))
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = unioned.select(col(keyCol), col("__blk")).distinct()
      .join(blockFinal, Seq(keyCol, "__blk"), "left")
      .withColumn("__carry", last(col("__final"), ignoreNulls = true).over(wCarry))
      .select(col(keyCol), col("__blk"), col("__carry"))
    val joined = withLocal.join(carries, Seq(keyCol, "__blk"))
      .withColumn("__state", coalesce(col("__stateLocal"), col("__carry")))
      .filter(col("__side") === leftSide)
    joined.select(left.columns.map(col) ++
      rightPayload.map(c => col("__state").getField(c).as(s"$prefix$c")): _*)
  }

  /** AJ2: interval (point-in-range) join — every left point row matched to
    * the right INTERVAL rows of the same key that contain it
    * (`start <= ts <= end`, inclusive). The naive `ON key AND ts BETWEEN
    * start AND end` plans as a per-key cross product (the range-join
    * cliff). This is the grid-binning form every scale engine uses:
    * intervals explode to the `gridUs` cells they overlap, points map to
    * ONE cell, the join runs as an equi-join on (key, cell), and a final
    * containment filter discards the false candidates at the cell edges.
    * Cost: |right| × (span/grid + 1) expansion (bounded — pick gridUs
    * near the typical span), one hash-partitioned equi-join, no pair
    * explosion. Inner join: unmatched points drop; a point inside k
    * overlapping intervals yields k rows.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
      keyCol: String, tsCol: String, startCol: String, endCol: String,
      gridUs: Long, maxCellsPerInterval: Int = 65536): DataFrame = {
    require(gridUs >= 1, s"gridUs must be >= 1: $gridUs")
    require(maxCellsPerInterval >= 1,
      s"maxCellsPerInterval must be >= 1: $maxCellsPerInterval")
    // exact floor division on longs: (c - pmod(c, g)) div g — pure integer
    // arithmetic, and a true floor for negative timestamps too because
    // pmod is nonnegative. Column `/` is IEEE double division (loses
    // integer precision above 2^53) and decimal division rounds HALF_UP at
    // scale 6 — either can misplace a value within ~5e-7*gridUs of a cell
    // boundary on nanosecond clocks; a consistent monotone binning would
    // still join correctly, but exactness costs nothing here.
    def cellOf(name: String): Column =
      expr(s"(`$name` - pmod(`$name`, ${gridUs}L)) div ${gridUs}L")
    val nCells = cellOf(endCol) - cellOf(startCol) + lit(1L)
    val iCells = intervals
      // inverted intervals (start > end) contain no point; sequence() would
      // happily step BACKWARD through them, silently manufacturing cells
      // for a never-matching interval — drop them before the explode
      .filter(col(startCol) <= col(endCol))
      .withColumn("__cell", explode(sequence(
        cellOf(startCol),
        // tripwire, not a tuning knob: expansion is span/gridUs + 1 rows
        // per interval and the operator is only linear while that is
        // O(1)-ish; a degenerate interval (a year-long span on a seconds
        // grid) would quietly emit millions of rows per input row. Fail
        // loudly with the offending interval instead.
        when(nCells <= lit(maxCellsPerInterval.toLong), cellOf(endCol))
          .otherwise(raise_error(format_string(
            s"intervalJoin: interval [%s, %s] spans %s grid cells at" +
              s" gridUs=$gridUs (cap $maxCellsPerInterval); choose a grid" +
              " near the typical span or raise maxCellsPerInterval",
            col(startCol), col(endCol), nCells)).cast("long")))))
    val pCells = points.withColumn("__cell", cellOf(tsCol))
    pCells.join(iCells, Seq(keyCol, "__cell"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__cell")
  }
}
