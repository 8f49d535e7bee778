package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Z-order layout invariants: the Morton interleave bit pattern, the
  * clamped affine scaling, the √-bounded per-bucket ranges on BOTH
  * dimensions (vs full span on the unsorted dimension of a one-key
  * layout), and the physical write's per-file footer ranges — the thing
  * a scan planner actually prunes on.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("interleave: known bit patterns") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L), (2L, 3L))
      .toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.interleave(col("a"), col("b"), 2).as("z"))
    val got = df.as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // bit i of a -> position 2i+1, bit i of b -> position 2i
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 2L) // a bit0 -> z bit1
    assert(got((0L, 1L)) == 1L) // b bit0 -> z bit0
    assert(got((3L, 1L)) == 11L) // 1011: a bits at z1,z3; b bit at z0
    assert(got((2L, 3L)) == 13L) // 1101: a bit1->z3, b bits0,1->z0,z2
  }

  test("scaled: endpoints, interior floor, clamping, degenerate range") {
    val df = Seq(10L, 55L, 100L, 5L, 200L).toDF("v")
      .select(col("v"), ZOrder.scaled(col("v"), 10L, 100L, 4).as("s"))
    val got = df.as[(Long, Long)].collect().toMap
    assert(got(10L) == 0L && got(100L) == 15L)
    assert(got(55L) == (45L * 15L) / 90L) // exact floor
    assert(got(5L) == 0L && got(200L) == 15L) // out-of-range clamps
    val deg = Seq(7L).toDF("v")
      .select(ZOrder.scaled(col("v"), 3L, 3L, 4).as("s"))
      .as[Long].head()
    assert(deg == 0L)
  }

  test("scaled: exact floor past the 2^53 double-precision wall") {
    // bits=16 over a 2^40 span: the dividend (v-lo)*65535 reaches ~2^56,
    // where a double-routed quotient can truncate to q-1 (r11 advice).
    // Probe every bucket boundary's both sides around a spread of buckets
    // plus the endpoints, and demand equality with BigInt floor division.
    val bits = 16
    val m = (1L << bits) - 1
    val lo = 0L
    val hi = 1L << 40
    val d = hi - lo
    val probes = (Seq(0L, 1L, hi - 1, hi) ++
      Seq(1L, 7L, 255L, 4096L, 32767L, 65534L, 65535L).flatMap { q =>
        // smallest v with scaled(v) == q, and its predecessor
        val v = (BigInt(q) * d + m - 1) / m
        Seq(v.toLong - 1, v.toLong, v.toLong + 1)
      }).filter(v => v >= lo && v <= hi).distinct
    val got = probes.toDF("v")
      .select(col("v"), ZOrder.scaled(col("v"), lo, hi, bits).as("s"))
      .as[(Long, Long)].collect().toMap
    probes.foreach { v =>
      val want = (BigInt(v - lo) * m / d).toLong
      assert(got(v) == want, s"v=$v: got ${got(v)}, want $want")
    }
  }

  test("guards: oversized span and oversized nBuckets fail loudly") {
    intercept[IllegalArgumentException] {
      ZOrder.scaled(col("v"), 0L, Long.MaxValue / 4, 16)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zBucketStats(Seq((1L, 1L)).toDF("a", "b"), "a", "b",
        0L, 1L, 0L, 1L, bits = 1, nBuckets = 64)
    }
  }

  test("z-bucket stats bound BOTH dimensions near span/sqrt(buckets)") {
    // dense 128x128 grid: every (a, b) combination once
    val grid = (for (a <- 0 until 128; b <- 0 until 128)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val stats = ZOrder.zBucketStats(grid, "a", "b", 0L, 127L, 0L, 127L,
      bits = 16, nBuckets = 64)
      .select(col("max_a") - col("min_a"), col("max_b") - col("min_b"))
      .as[(Long, Long)].collect()
    assert(stats.length == 64)
    // 64 buckets on a 128-span square -> ideal tile 16x16; allow 2x slack
    assert(stats.forall { case (ra, rb) => ra <= 32 && rb <= 32 },
      s"ranges: ${stats.take(8).toSeq}")
    // contrast: sorting by `a` alone leaves b's per-bucket range at FULL
    // span — the single-key layout this operator exists to beat
    val sortedByA = grid.withColumn("bucket", (col("a") / 2).cast("long"))
      .groupBy(col("bucket"))
      .agg((max(col("b")) - min(col("b"))).as("rb"))
      .agg(min(col("rb"))).as[Long].head()
    assert(sortedByA == 127L)
  }

  test("interleave3: known bit patterns and 3-way bucket bounds") {
    val got = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L), (3L, 2L, 1L))
      .toDF("a", "b", "c")
      .select(ZOrder.interleave3(col("a"), col("b"), col("c"), 2).as("z"))
      .as[Long].collect().toSeq
    // a bit0 -> z2, b bit0 -> z1, c bit0 -> z0
    assert(got(0) == 4L && got(1) == 2L && got(2) == 1L)
    // a=11 -> z2,z5; b=10 -> z4; c=01 -> z0: 110101 = 53
    assert(got(3) == 53L)
    // dense 16^3 grid, 64 buckets -> ideal 4x4x4 tile; allow 2x slack
    val grid = (for (a <- 0 until 16; b <- 0 until 16; c <- 0 until 16)
      yield (a.toLong, b.toLong, c.toLong)).toDF("a", "b", "c")
    val stats = ZOrder.zBucketStats3(grid, "a", "b", "c",
      0L, 15L, 0L, 15L, 0L, 15L, bits = 16, nBuckets = 64)
      .select(col("max_a") - col("min_a"), col("max_b") - col("min_b"),
        col("max_c") - col("min_c"))
      .as[(Long, Long, Long)].collect()
    assert(stats.length == 64)
    assert(stats.forall { case (ra, rb, rc) =>
      ra <= 8 && rb <= 8 && rc <= 8 }, s"ranges: ${stats.take(8).toSeq}")
  }

  /** Independent scalar reference for the Hilbert transform (the classic
    * xy2d loop), evaluated on driver ints — a different execution path
    * from the column expressions it checks.
    */
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbert: matches the scalar reference and walks the grid with no jumps") {
    // full 32x32 grid at bits=5: every curve position once, and every
    // consecutive pair of positions is a GRID NEIGHBOR (|dx|+|dy| = 1) —
    // the locality property Morton lacks (quadrant jumps) and the reason
    // this key exists; also pins equality with the independent scalar
    // reference at every point
    val bits = 5
    val grid = (for (a <- 0 until 32; b <- 0 until 32)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val got = ZOrder.withHilbertKey(grid, "a", "b", 0L, 31L, 0L, 31L, bits)
      .select(col("a"), col("b"), col("h"))
      .as[(Long, Long, Long)].collect()
    assert(got.length == 1024)
    got.foreach { case (a, b, h) =>
      assert(h == hilbertRef(bits, a, b), s"($a,$b): $h") }
    val walk = got.sortBy(_._3)
    assert(walk.map(_._3).toSeq == (0L until 1024L)) // a bijection
    walk.sliding(2).foreach { case Array((a1, b1, _), (a2, b2, _)) =>
      assert(math.abs(a1 - a2) + math.abs(b1 - b2) == 1,
        s"jump between ($a1,$b1) and ($a2,$b2)")
    }
    // contrast: the Morton walk DOES jump (this is what Hilbert buys)
    val mortonWalk = grid
      .select(col("a"), col("b"),
        ZOrder.interleave(col("a"), col("b"), bits).as("z"))
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val mortonJumps = mortonWalk.sliding(2).count {
      case Array((a1, b1, _), (a2, b2, _)) =>
        math.abs(a1 - a2) + math.abs(b1 - b2) > 1
    }
    assert(mortonJumps > 0)
  }

  test("hilbert bucket stats bound BOTH dimensions like the z-key") {
    val grid = (for (a <- 0 until 128; b <- 0 until 128)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val stats = ZOrder.hilbertBucketStats(grid, "a", "b", 0L, 127L, 0L, 127L,
      bits = 16, nBuckets = 64)
    val rows = stats
      .select(col("max_a") - col("min_a"), col("max_b") - col("min_b"))
      .as[(Long, Long)].collect()
    assert(rows.length == 64)
    assert(rows.forall { case (ra, rb) => ra <= 32 && rb <= 32 },
      s"ranges: ${rows.take(8).toSeq}")
    // plan shape over a REAL scan (a local Seq constant-folds into the
    // LocalTableScan and proves nothing): the 16 per-bit projection
    // layers must FUSE into whole-stage codegen (no UDFs, no codegen
    // fallback) and the whole query needs exactly the aggregation's one
    // exchange — the per-step layering is a logical-plan discipline
    // (CollapseProject would otherwise inline a ~4^bits expression
    // tree), not a physical cost
    val dir = java.nio.file.Files.createTempDirectory("hilbert_").toString
    grid.write.mode("overwrite").parquet(dir)
    val scanned = ZOrder.hilbertBucketStats(spark.read.parquet(dir),
      "a", "b", 0L, 127L, 0L, 127L, bits = 16, nBuckets = 64)
    scanned.collect()
    // AQE's toString prints the final AND initial plans — audit the final
    val plan = scanned.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // codegen'd spans render as "*(n) Op" in the AQE final plan
    assert("\\*\\(\\d+\\)".r.findFirstIn(plan).isDefined, plan.take(800))
    assert(!plan.contains("BatchEvalPython") && !plan.contains("Scala UDF"),
      plan.take(800))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"$exchanges exchanges:\n${plan.take(1200)}")
  }

  test("physical write: every file's footer range is sub-span on both keys") {
    val grid = (for (a <- 0 until 64; b <- 0 until 64)
      yield (a.toLong, b.toLong)).toDF("a", "b")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.write(grid, "a", "b", 0L, 63L, 0L, 63L, dir, numFiles = 16)
    val perFile = spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg((max(col("a")) - min(col("a"))).as("ra"),
        (max(col("b")) - min(col("b"))).as("rb"))
      .select(col("ra"), col("rb")).as[(Long, Long)].collect()
    assert(perFile.length == 16)
    // 16 files on a 64-span square -> ideal tile 16x16; sampled range
    // boundaries wobble, so allow 2x — the point is NO file spans a full
    // dimension, which is what makes min/max pruning bite on both keys
    assert(perFile.forall { case (ra, rb) => ra <= 32 && rb <= 32 },
      s"file ranges: ${perFile.toSeq}")
    // Hilbert write: same bound holds on the locality-optimal key
    val hdir = java.nio.file.Files.createTempDirectory("hilbertw").toString
    ZOrder.writeHilbert(grid, "a", "b", 0L, 63L, 0L, 63L, hdir, numFiles = 16)
    val perFileH = spark.read.parquet(hdir)
      .groupBy(input_file_name())
      .agg((max(col("a")) - min(col("a"))).as("ra"),
        (max(col("b")) - min(col("b"))).as("rb"))
      .select(col("ra"), col("rb")).as[(Long, Long)].collect()
    assert(perFileH.length == 16)
    assert(perFileH.forall { case (ra, rb) => ra <= 32 && rb <= 32 },
      s"hilbert file ranges: ${perFileH.toSeq}")
  }
}
