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

  /** EV7b: the SKEW-SAFE form of the native `session_window` aggregate —
    * identical output to [[graft.streaming.EventStreams.sessionWindowAgg]]
    * (one row per (key, session): window start = first event, end = last
    * event + gap, count, order-independent exact value sum), different
    * plan. The engine's session_window merges each key's windows in ONE
    * task, so a hot key serializes its whole history (measured 25.9 s at
    * the 100x hot-key probe vs 5.9 s for the salted cumsum — SCALE.md);
    * here session ASSIGNMENT is [[sessionizeSalted]]'s distributed prefix
    * scan (tasks bounded by the hot key's busiest block) and the per-
    * session aggregate is a plain hash agg on (key, session_id) — partial
    * aggregation makes the reduce side skew-proof, and a hot KEY spreads
    * across its many sessions anyway.
    *
    * Boundary semantics match the engine exactly: an event at EXACTLY gap
    * distance MERGES (session_window extends the window end inclusively;
    * sessionizeSalted splits on `> gap`) — pinned by EventOpsSpec's
    * boundary-stitch cases and held to ev7's oracle verbatim.
    */
  def sessionWindowSalted(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, gapUs: Long, blockUs: Long): DataFrame = {
    val withUs = events
      .select(col(keyCol), col(idCol), col(valueCol),
        expr(s"unix_micros(`$tsCol`)").as("__ts_us"))
    sessionizeSalted(withUs, keyCol, "__ts_us", idCol, gapUs, blockUs)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        timestamp_micros(min(col("__ts_us"))).as("session_start"),
        timestamp_micros(max(col("__ts_us")) + gapUs).as("session_end"),
        count(lit(1)).as("n_events"),
        graft.functions.exactSum(col(valueCol)).as("total_value"))
      .drop("session_id")
  }

  /** The session-window ROUTER — the skew rule SCALE.md states, as code:
    * measure the hottest key's share (one partial-aggregated two-column
    * pass, itself skew-proof) and run the native engine merge when keys
    * are balanced, the salted prefix scan when one key crosses
    * `hotKeyShare`. Both branches emit identical rows (EventOpsSpec pins
    * parity on both sides of the threshold), so routing is a plan choice,
    * never a semantics choice. Callers that already know their key
    * distribution pass `knownTopShare` to skip the measurement pass.
    */
  def sessionWindowSkewSafe(events: DataFrame, keyCol: String, tsCol: String,
      idCol: String, valueCol: String, gapUs: Long, blockUs: Long,
      hotKeyShare: Double = 0.05,
      knownTopShare: Option[Double] = None): DataFrame = {
    require(hotKeyShare > 0 && hotKeyShare <= 1,
      s"hotKeyShare must be in (0,1]: $hotKeyShare")
    require(gapUs > 0, s"gapUs must be positive: $gapUs")
    val share = knownTopShare.getOrElse {
      val r = events.groupBy(col(keyCol)).agg(count(lit(1)).as("__n"))
        .agg(max(col("__n")).as("__mx"), sum(col("__n")).as("__tot"))
        .head()
      if (r.isNullAt(1) || r.getLong(1) == 0L) 0.0
      else r.getLong(0).toDouble / r.getLong(1).toDouble
    }
    // the native branch's gap string is whole-minute; a sub-minute gap is
    // a PLAN limitation, so it routes to the salted form (which supports
    // any gap) rather than failing — routing must never be the reason a
    // semantically valid call throws
    if (share > hotKeyShare || gapUs % 60000000L != 0L)
      sessionWindowSalted(events, keyCol, tsCol, idCol, valueCol, gapUs, blockUs)
    else {
      val gapMin = gapUs / 60000000L
      graft.streaming.EventStreams
        .sessionWindowAgg(events
            .select(col(keyCol).as("user_id"), col(tsCol).as("ts"),
              col(valueCol).as("value")),
          gap = s"$gapMin minutes")
        .select(col("user_id").as(keyCol),
          col("win.start").as("session_start"),
          col("win.end").as("session_end"),
          col("n_events"), col("total_value"))
    }
  }

  /** EV9: funnel analysis — for each user who performed `steps.head`, the
    * earliest timestamp of every funnel step, each STRICTLY after the
    * previous step's match and (with `horizonUs`) no later than
    * t1 + horizon; `steps_completed` counts the contiguous prefix
    * reached. The classic product-analytics sequence query (view →
    * click → purchase), absent from Spark's built-ins.
    *
    * Semantics pinned for the oracle: step boundaries are strict (an
    * event sharing its timestamp with the previous match does NOT
    * advance the funnel — simultaneous events cannot prove order) and
    * the horizon is inclusive (an event exactly at t1 + horizon counts).
    * The prefix property holds by construction: a null tᵢ nulls every
    * later step through the cascaded strict comparison.
    *
    * Scale shape: one pre-filtered projection of the event stream,
    * Materialized because all k step passes read it; then per step one
    * user-keyed join + hash-agg — k shuffles on user_id, each linear in
    * that step's events, with partial aggregation on the map side.
    * Nothing collects per-user event lists, so a hot user costs a wide
    * join group, never aggregation-state memory (route through the
    * ev2b/g1b salting pattern if one user dominates a step).
    */
  def funnel(events: DataFrame, steps: Seq[String],
      horizonUs: Option[Long] = None, userCol: String = "user_id",
      typeCol: String = "event_type", tsUsCol: String = "ts_us"): DataFrame = {
    require(steps.nonEmpty && steps.distinct.size == steps.size,
      s"steps must be non-empty and distinct: $steps")
    // null-timestamp events are malformed and carry no order information:
    // dropped HERE so t1 can never be null (a min over nulls would keep
    // the user with a null head timestamp and an ill-defined horizon)
    val ev = Materialize(events
      .filter(col(typeCol).isin(steps: _*) && col(tsUsCol).isNotNull)
      .select(col(userCol), col(typeCol), col(tsUsCol).cast("long").as("__ts")))
    var acc = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col("__ts")).as("t1"))
    steps.tail.zipWithIndex.foreach { case (step, idx) =>
      val i = idx + 2
      val prevT = col(s"t${i - 1}")
      val within = horizonUs.fold(lit(true))(h => col("__s") <= col("t1") + h)
      val si = ev.filter(col(typeCol) === step)
        .select(col(userCol), col("__ts").as("__s"))
      val carried = (1 until i).map(j => col(s"t$j"))
      acc = acc.join(si, Seq(userCol), "left")
        .groupBy(col(userCol) +: carried: _*)
        .agg(min(when(col("__s") > prevT && within, col("__s"))).as(s"t$i"))
    }
    acc.withColumn("steps_completed",
      steps.indices.map(j => when(col(s"t${j + 1}").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** EV10: cohort retention — users are cohorted by the period (integer
    * `div` of the microsecond timestamp, exact past 2^53 like pk1's
    * layout math) of their FIRST activity; retention(cohort, age) =
    * fraction of the cohort active `age` periods later. The other
    * canonical product-analytics aggregate next to [[funnel]].
    *
    * Scale shape: one distinct (user, period) projection — Materialized,
    * it feeds both the first-activity aggregate and the activity join —
    * then two hash-aggs and two user/cohort-keyed joins, all with
    * map-side partials; per-(cohort, age) counts need no distinct
    * because activity rows are already distinct and a user has exactly
    * one cohort. Output is (cohorts × ages) rows — metadata-scale for
    * any real period length.
    */
  def cohortRetention(events: DataFrame, periodUs: Long,
      userCol: String = "user_id", tsUsCol: String = "ts_us"): DataFrame = {
    import graft.functions.r4
    require(periodUs > 0, s"periodUs must be positive: $periodUs")
    val act = Materialize(events
      .filter(col(tsUsCol).isNotNull) // the ev9 malformed-event rule
      .select(col(userCol).as("user_id"),
        expr(s"CAST($tsUsCol AS BIGINT) div $periodUs").as("period"))
      .distinct())
    // Materialized: feeds both the cohort-size aggregate and the join
    val first = Materialize(
      act.groupBy(col("user_id")).agg(min(col("period")).as("cohort")))
    val sizes = first.groupBy(col("cohort")).agg(count(lit(1)).as("n_cohort"))
    act.join(first, Seq("user_id"))
      .groupBy(col("cohort"), (col("period") - col("cohort")).as("age"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort"))
      .select(col("cohort"), col("age"), col("n_active"), col("n_cohort"),
        r4(col("n_active").cast("double") / col("n_cohort")).as("retention"))
  }
}
