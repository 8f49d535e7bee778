package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, EventOps}

/** The time-block-salted prefix-scan forms must equal their plain per-key
  * window forms row for row — the block machinery (local windows, summary
  * carries, join-back) has to be invisible. Fixtures deliberately cross
  * block boundaries: sessions continuing into the next block, multi-block
  * gaps (empty blocks between events), state deposited several blocks
  * before it is read, and equal-timestamp ties.
  */
class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val B = 100L // block size for tests
  private val G = 10L  // session gap / small scale

  test("sessionizeSalted == plain window cumsum across block boundaries") {
    // key 1: session spans blocks (95 -> 101 gap 6 <= G), then a gap
    //   within a block (101 -> 150), then a multi-empty-block gap
    // key 2: everything in one block; key 3: one event only
    // ties: two events at ts 300 ordered by event_id
    val events = Seq(
      (1L, 10L, 95L), (1L, 11L, 101L), (1L, 12L, 150L), (1L, 13L, 460L),
      (1L, 14L, 300L), (1L, 15L, 300L),
      (2L, 20L, 5L), (2L, 21L, 12L), (2L, 22L, 40L),
      (3L, 30L, 999L))
      .toDF("user_id", "event_id", "ts_us")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val cum = w.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val plain = events
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("is_new", when(col("prev").isNull ||
        col("ts_us") - col("prev") > G, 1L).otherwise(0L))
      .select(col("user_id"), col("event_id"),
        sum(col("is_new")).over(cum).as("session_id"))
      .as[(Long, Long, Long)].collect().toSet
    val salted = EventOps.sessionizeSalted(events, "user_id", "ts_us",
        "event_id", gapUs = G, blockUs = B)
      .select(col("user_id"), col("event_id"), col("session_id"))
      .as[(Long, Long, Long)].collect().toSet
    assert(salted == plain, s"salted $salted != plain $plain")
    // sanity on semantics, not just parity: key 1's sessions
    val k1 = salted.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    assert(k1 == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 14L -> 3L,
      15L -> 3L, 13L -> 4L))
  }

  test("asofJoinPriorSalted == asofJoinPrior incl. multi-block carries") {
    // right state deposited in block 0 must reach left rows in block 4
    // (empty blocks between); a later deposit overrides within its block;
    // equal-ts tie: inclusive sees same-instant state, strict does not
    val left = Seq(
      (1L, 100L, 450L), (1L, 101L, 55L), (1L, 102L, 20L),
      (2L, 200L, 120L),
      (3L, 300L, 10L))
      .toDF("user_id", "event_id", "ts_us")
    val right = Seq(
      (1L, 900L, 15L, 1.5), (1L, 901L, 55L, 2.5),
      (2L, 910L, 120L, 3.5))
      .toDF("user_id", "event_id", "ts_us", "value")
    for (strict <- Seq(false, true)) {
      val plain = AsofJoin.asofJoinPrior(left, right,
          "user_id", "ts_us", "event_id", Seq("event_id", "value"),
          strict = strict)
        .select(col("event_id"), col("asof_event_id"), col("asof_value"))
        .as[(Long, Option[Long], Option[Double])].collect().toSet
      val salted = AsofJoin.asofJoinPriorSalted(left, right,
          "user_id", "ts_us", "event_id", Seq("event_id", "value"),
          blockUs = B, strict = strict)
        .select(col("event_id"), col("asof_event_id"), col("asof_value"))
        .as[(Long, Option[Long], Option[Double])].collect().toSet
      assert(salted == plain, s"strict=$strict: salted $salted != $plain")
    }
    // spot-check the carry: left event 100 (ts 450, block 4) reads the
    // block-0 deposit at ts 55 (the latest right row at or before it)
    val got = AsofJoin.asofJoinPriorSalted(left, right,
        "user_id", "ts_us", "event_id", Seq("event_id", "value"), blockUs = B)
      .select(col("event_id"), col("asof_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got(100L).contains(901L))
    assert(got(101L).contains(901L)) // inclusive same-instant
    assert(got(102L).contains(900L))
    assert(got(300L).isEmpty)        // key with no right rows
  }

  // session-window fixtures: 1-minute gap, 2.5-minute blocks, so sessions
  // cross block boundaries and the exactly-gap boundary case is exercised
  private val SwG = 60000000L  // 1 min in us
  private val SwB = 150000000L // 2.5 min blocks
  private def swEvents = {
    val base = 1704067200000000L // whole-minute epoch so ts grid is clean
    Seq(
      // key 1: session spans a block boundary (140s -> 155s, gap 15s);
      // then an event at EXACTLY the 60s gap (must MERGE — inclusive
      // window extension); then a multi-empty-block gap to a new session
      (1L, 10L, base + 140000000L, 1.0),
      (1L, 11L, base + 155000000L, 2.0),
      (1L, 12L, base + 215000000L, 4.0), // exactly 60s after 155s: merges
      (1L, 13L, base + 900000000L, 8.0), // ~11 min later: new session
      // key 2: ties at the same instant, single block
      (2L, 20L, base + 10000000L, 1.5), (2L, 21L, base + 10000000L, 2.5),
      // key 3: one event only
      (3L, 30L, base + 77000000L, 3.0))
      .toDF("user_id", "event_id", "ts_us", "value")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
  }
  private type SwRow = (Long, java.sql.Timestamp, java.sql.Timestamp, Long, Double)
  private def nativeSw = graft.streaming.EventStreams
    .sessionWindowAgg(swEvents, "1 minutes")
    .select(col("user_id"), col("win.start").as("session_start"),
      col("win.end").as("session_end"), col("n_events"), col("total_value"))

  test("sessionWindowSalted == native session_window incl. boundary stitch") {
    val native = nativeSw.as[SwRow].collect().toSet
    val salted = EventOps.sessionWindowSalted(swEvents,
        "user_id", "ts", "event_id", "value", gapUs = SwG, blockUs = SwB)
      .as[SwRow].collect().toSet
    assert(salted == native, s"salted $salted != native $native")
    // semantics, not just parity: key 1 = two sessions (the exactly-gap
    // event merged into the first), key 2 = one 2-event session
    val k1 = salted.filter(_._1 == 1L)
    assert(k1.map(_._4).toVector.sorted == Vector(1L, 3L))
    assert(k1.exists(r => r._4 == 3L && r._5 == 7.0))
    assert(salted.count(_._1 == 2L) == 1 &&
      salted.find(_._1 == 2L).get._4 == 2L)
  }

  test("sessionWindowSkewSafe routes by key share, identical rows each way") {
    val native = nativeSw.as[SwRow].collect().toSet
    // forced routes: both branches must emit the same rows
    for (hint <- Seq(Some(1.0), Some(0.0), None)) {
      val routed = EventOps.sessionWindowSkewSafe(swEvents,
          "user_id", "ts", "event_id", "value", gapUs = SwG, blockUs = SwB,
          hotKeyShare = 0.5, knownTopShare = hint)
      assert(routed.as[SwRow].collect().toSet == native, s"hint=$hint")
    }
    // the routing decision itself: key 1 holds 4/7 > 0.5 of rows, so the
    // measured path must pick the salted plan (no session_window node);
    // a high threshold must pick the native engine merge
    val measured = EventOps.sessionWindowSkewSafe(swEvents,
      "user_id", "ts", "event_id", "value", SwG, SwB, hotKeyShare = 0.5)
    assert(!measured.queryExecution.analyzed.toString.contains("session_window"))
    val nativeRoute = EventOps.sessionWindowSkewSafe(swEvents,
      "user_id", "ts", "event_id", "value", SwG, SwB, hotKeyShare = 0.99)
    assert(nativeRoute.queryExecution.analyzed.toString.contains("session_window"))
  }

  test("sessionWindowSkewSafe: sub-minute gap routes to salted, never throws") {
    // 90s gap: the native branch's whole-minute gap string can't express
    // it — a plan limitation must route, not throw (the failure would
    // otherwise be data-dependent: salted under a hot key, crash without)
    val gap90s = 90L * 1000000L
    val routed = EventOps.sessionWindowSkewSafe(swEvents,
      "user_id", "ts", "event_id", "value", gap90s, SwB, hotKeyShare = 0.99)
    assert(!routed.queryExecution.analyzed.toString.contains("session_window"))
    val direct = EventOps.sessionWindowSalted(swEvents,
      "user_id", "ts", "event_id", "value", gap90s, SwB)
    assert(routed.as[SwRow].collect().toSet == direct.as[SwRow].collect().toSet)
    // degenerate gap is a semantics error on every route
    assertThrows[IllegalArgumentException] {
      EventOps.sessionWindowSkewSafe(swEvents,
        "user_id", "ts", "event_id", "value", 0L, SwB)
    }
  }

  test("EV9 funnel: strict ordering, inclusive horizon, prefix property") {
    val ev = Seq(
      // user 1: full funnel inside the horizon
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: click BEFORE the first view never counts; no later click
      (2L, "click", 50L), (2L, "view", 100L), (2L, "purchase", 200L),
      // user 3: click at EXACTLY t1 does not advance (strict), later one does
      (3L, "view", 100L), (3L, "click", 100L), (3L, "click", 150L),
      // user 4: purchase lands exactly at t1 + horizon — inclusive, counts
      (4L, "view", 0L), (4L, "click", 10L), (4L, "purchase", 1000L),
      // user 5: purchase one past the horizon — out
      (5L, "view", 0L), (5L, "click", 10L), (5L, "purchase", 1001L),
      // user 6: no view at all -> absent from the funnel
      (6L, "click", 5L), (6L, "purchase", 6L),
      // noise types are ignored
      (1L, "error", 150L))
      .toDF("user_id", "event_type", "ts_us")
    val got = EventOps.funnel(ev, Seq("view", "click", "purchase"),
        horizonUs = Some(1000L))
      .select("user_id", "t1", "t2", "t3", "steps_completed")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(!got.contains(6L) && got.size == 5)
    assert(got(1L) == ((1L, Some(100L), Some(200L), Some(300L), 3)))
    assert(got(2L) == ((2L, Some(100L), None, None, 1))) // early click dead
    assert(got(3L) == ((3L, Some(100L), Some(150L), None, 2)))
    assert(got(4L) == ((4L, Some(0L), Some(10L), Some(1000L), 3)))
    assert(got(5L) == ((5L, Some(0L), Some(10L), None, 2)))
    // layout independence + duplicate steps rejected
    val got2 = EventOps.funnel(ev.repartition(5),
        Seq("view", "click", "purchase"), horizonUs = Some(1000L))
      .select("user_id", "t1", "t2", "t3", "steps_completed")
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(got2 == got)
    assertThrows[IllegalArgumentException] {
      EventOps.funnel(ev, Seq("view", "view"))
    }
  }

  test("EV10 cohortRetention: cohorts by first period, exact fractions") {
    // period 10: users 1,2,3 start at p0; user 4 starts at p1.
    // p0 cohort: all 3 active at age 0; 2 at age 1; 1 at age 2.
    val ev = Seq(
      (1L, 0L), (1L, 12L), (1L, 25L), // ages 0,1,2
      (2L, 5L), (2L, 15L), (2L, 5L),  // dup activity same period collapses
      (3L, 9L),
      (4L, 11L), (4L, 21L))
      .toDF("user_id", "ts_us")
    val got = EventOps.cohortRetention(ev, periodUs = 10L)
      .select("cohort", "age", "n_active", "n_cohort", "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == Map(
      (0L, 0L) -> ((3L, 3L, 1.0)),
      (0L, 1L) -> ((2L, 3L, 0.6667)),
      (0L, 2L) -> ((1L, 3L, 0.3333)),
      (1L, 0L) -> ((1L, 1L, 1.0)),
      (1L, 1L) -> ((1L, 1L, 1.0))))
    // layout independence
    val got2 = EventOps.cohortRetention(ev.repartition(5), periodUs = 10L)
      .select("cohort", "age", "n_active", "n_cohort", "retention")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got2 == got)
    assertThrows[IllegalArgumentException] {
      EventOps.cohortRetention(ev, periodUs = 0L)
    }
  }
}
