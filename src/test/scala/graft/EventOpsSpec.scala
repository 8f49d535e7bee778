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
}
