package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-column data skipping — the
  * storage-side scale lever the query operators can't supply themselves.
  * At 100 TB a scan's cost is decided before the first task runs, by how
  * many files the planner can PRUNE from parquet min/max footers: a table
  * sorted by one key skips beautifully on that key and not at all on any
  * other, while interleaving the bits of two keys bounds BOTH per-file
  * ranges near span/√files — the property Delta's OPTIMIZE ZORDER and
  * every lakehouse clusterer ship (Morton 1966; the multi-dimensional
  * clustering trade: each dimension's skipping weakens from 1/files to
  * ~1/√files, but every filtered dimension gets it).
  *
  * Everything here is INTEGER arithmetic — affine bucket scaling in long
  * math (no floats to drift), bit interleave as shift/mask/add — so the
  * whole layout key replays bit-identically in oracle SQL, and the layout
  * decision itself (which z-bucket a row lands in) is hash-checkable.
  * The physical write path (`write`) uses the z-key as a range-partition
  * sort key; boundary SAMPLING there is Spark's (layout, not semantics —
  * file contents vary by boundary draw, the skipping bound holds under
  * any draw), which is why the registered oracle checks fixed-width
  * z-BUCKET stats, not file bytes.
  */
object ZOrder {

  /** Affine scaling of `c` into [0, 2^bits): floor((v − lo) · (2^bits − 1)
    * / (hi − lo)), EXACT over the whole enforced domain
    * ((hi − lo) · 2^bits ≤ Long.MaxValue, required below). Spark has no
    * integral-divide Column op and its `/` on longs routes through
    * double, which is only faithful while the dividend stays under 2^53
    * — past that the correctly-rounded double quotient can land one ulp
    * off and the cast-to-long truncation goes to q±1 (r11 advice). So
    * the double quotient is used only as a FIRST GUESS, clamped into
    * [0, 2^bits−1], then corrected by exact long comparisons
    * (q·d ≤ x < (q+1)·d) — the returned bucket never touches floating
    * point. The INPUT clamps to [lo, hi] before the multiply — not the
    * output after — because an extreme out-of-range value times 2^bits
    * overflows a long under ANSI mode (found by the hostile sweep); a
    * stale min/max profile therefore degrades locality, never
    * correctness, and never throws. Degenerate range (hi = lo) maps
    * everything to 0.
    */
  def scaled(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits: $bits")
    require(hi >= lo, s"empty range: [$lo, $hi]")
    val m = (1L << bits) - 1
    if (hi == lo) lit(0L)
    else {
      val d = hi - lo
      // keeps every intermediate — (v−lo)·m and the correction's
      // (q+1)·d — inside a long under ANSI mode
      require(d <= Long.MaxValue / (m + 1),
        s"key span $d too large for bits=$bits: need (hi-lo) <= " +
          s"${Long.MaxValue / (m + 1)} (= Long.MaxValue / 2^bits)")
      val cc = greatest(lit(lo), least(lit(hi), c.cast("long")))
      val x = (cc - lit(lo)) * lit(m)
      // |double quotient − exact| < 1 over the domain (relative error
      // ~2^-52 on a quotient ≤ 2^20), so one ±1 correction is exhaustive
      val q0 = least(lit(m), greatest(lit(0L), (x / lit(d)).cast("long")))
      when(q0 * lit(d) > x, q0 - lit(1L))
        .when((q0 + lit(1L)) * lit(d) <= x, q0 + lit(1L))
        .otherwise(q0)
    }
  }

  /** Morton interleave of two `bits`-bit scaled keys: bit i of `a` lands
    * at position 2i+1, bit i of `b` at 2i. A flat shift/mask/add sum —
    * one codegen'd expression, no UDF, and the same arithmetic replays
    * in SQL.
    */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits: $bits")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
    }.reduce(_ + _)
  }

  /** Morton interleave of THREE `bits`-bit scaled keys: bit i of `a`
    * lands at 3i+2, of `b` at 3i+1, of `c` at 3i — the z-key for a
    * three-predicate layout (e.g. order/part/supplier), where each
    * filtered dimension's per-bucket span tightens to ~1/∛buckets. Same
    * flat shift/mask/add discipline as [[interleave]]; at bits=20 the
    * top term is 2^61, still a long.
    */
  def interleave3(a: Column, b: Column, c: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits: $bits")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (3 * i + 2)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (3 * i + 1)) +
        shiftright(c, i).bitwiseAND(lit(1L)) * lit(1L << (3 * i))
    }.reduce(_ + _)
  }

  /** The composed three-column z-key over known ranges (see [[zKey]]). */
  def zKey3(a: Column, aLo: Long, aHi: Long, b: Column, bLo: Long, bHi: Long,
      c: Column, cLo: Long, cHi: Long, bits: Int = 16): Column =
    interleave3(scaled(a, aLo, aHi, bits), scaled(b, bLo, bHi, bits),
      scaled(c, cLo, cHi, bits), bits)

  /** Fixed-width z-bucket stats over the three-column key — the
    * oracle-checkable form of the 3-way layout (see [[zBucketStats]]):
    * per bucket, each dimension's min/max spans ~1/∛nBuckets of its
    * range instead of one dimension at 1/nBuckets and the others whole.
    */
  def zBucketStats3(df: DataFrame, aCol: String, bCol: String, cCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long, cLo: Long, cHi: Long,
      bits: Int = 16, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two: $nBuckets")
    require(Integer.numberOfTrailingZeros(nBuckets) <= 3 * bits,
      s"nBuckets=$nBuckets exceeds the z-key space 8^bits at bits=$bits")
    val shift = 3 * bits - Integer.numberOfTrailingZeros(nBuckets)
    df.select(col(aCol).as("a"), col(bCol).as("b"), col(cCol).as("c"),
      zKey3(col(aCol), aLo, aHi, col(bCol), bLo, bHi, col(cCol), cLo, cHi,
        bits).as("z"))
      .groupBy(shiftright(col("z"), shift).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"),
        min(col("c")).as("min_c"), max(col("c")).as("max_c"))
  }

  /** The composed z-key for two long columns over known ranges. Ranges
    * come from the caller (one metadata-scale min/max aggregate, or the
    * catalog's column stats at a real lakehouse) so the key expression
    * itself stays a pure projection — usable inside any scan, stream, or
    * write without a hidden extra pass.
    */
  def zKey(a: Column, aLo: Long, aHi: Long, b: Column, bLo: Long, bHi: Long,
      bits: Int = 16): Column =
    interleave(scaled(a, aLo, aHi, bits), scaled(b, bLo, bHi, bits), bits)

  /** Fixed-width z-bucket stats — the ORACLE-CHECKABLE form of the layout
    * decision: bucket = top `log2(nBuckets)` bits of the z-key, and per
    * bucket the row count and each dimension's min/max (exactly the
    * parquet footer ranges a z-ordered file would carry). The skipping
    * claim is readable off the output: every bucket's (max − min) spans
    * ~1/√nBuckets of each dimension, not 1/nBuckets of one and all of the
    * other.
    */
  def zBucketStats(df: DataFrame, aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      bits: Int = 16, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two: $nBuckets")
    require(Integer.numberOfTrailingZeros(nBuckets) <= 2 * bits,
      s"nBuckets=$nBuckets exceeds the z-key space 4^bits=${1L << (2 * bits)}" +
        s" at bits=$bits (a negative shift would bucket silently wrong)")
    val shift = 2 * bits - Integer.numberOfTrailingZeros(nBuckets)
    df.select(col(aCol).as("a"), col(bCol).as("b"),
      zKey(col(aCol), aLo, aHi, col(bCol), bLo, bHi, bits).as("z"))
      .groupBy(shiftright(col("z"), shift).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
  }

  /** Hilbert-curve key for two columns — the locality-optimal cousin of
    * the Morton key: consecutive curve positions are always GRID
    * NEIGHBORS (no Morton quadrant jumps), which tightens every bucket's
    * worst-case dimension span and is why Databricks ships liquid
    * clustering on Hilbert. The classic bit-at-a-time xy2d transform
    * (quadrant digit + conditional reflect/swap per bit, high→low) in
    * pure integer column math.
    *
    * SHAPE: one chained projection per bit (withColumn layers), NOT one
    * nested expression — each step's (x, y) are CaseWhens referenced
    * several times by the next step, so Catalyst's CollapseProject
    * correctly keeps the layers (non-cheap, multi-referenced) and
    * whole-stage codegen evaluates each step once; a single composed
    * Column would inline into a ~4^bits-node tree. The same 16 steps
    * replay as chained CTEs in the oracle (generated, like the
    * interleave sums). The quadrant digit (3·rx)⊕ry is spelled as a
    * when-chain (0/1/3/2) so both engines share one arithmetic form.
    *
    * Appends `outCol` (the curve position, < 4^bits) and preserves all
    * input columns; inputs scale through [[scaled]] (exact floor).
    */
  def withHilbertKey(df: DataFrame, aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      bits: Int = 16, outCol: String = "h"): DataFrame = {
    require(bits >= 1 && bits <= 20, s"bits: $bits")
    val n = 1L << bits
    val passthrough = df.columns.map(col).toSeq
    var cur = df.select(passthrough ++ Seq(
      scaled(col(aCol), aLo, aHi, bits).as("__hx"),
      scaled(col(bCol), bLo, bHi, bits).as("__hy"),
      lit(0L).as(outCol)): _*)
    // one SELECT per bit step, not five withColumns: each withColumn
    // re-analyzes the whole accumulated plan, so the per-step quintet
    // cost the driver O(bits² · cols) analysis passes (measured: seconds
    // of pure planning per Hilbert write at bits=16, paid TWICE by a
    // range-partitioned write — boundary sampling plans the child again).
    // The physical plan is unchanged: the same 16 chained Projects whose
    // multi-referenced CaseWhens CollapseProject correctly keeps layered.
    for (i <- (bits - 1) to 0 by -1) {
      val s = 1L << i
      val rx = col("__hx").bitwiseAND(lit(s)) > 0
      val ry = col("__hy").bitwiseAND(lit(s)) > 0
      val quad = when(rx && ry, 2L).when(rx, 3L).when(ry, 1L).otherwise(0L)
      cur = cur.select(passthrough ++ Seq(
        when(!ry, when(rx, lit(n - 1) - col("__hy")).otherwise(col("__hy")))
          .otherwise(col("__hx")).as("__hx"),
        when(!ry, when(rx, lit(n - 1) - col("__hx")).otherwise(col("__hx")))
          .otherwise(col("__hy")).as("__hy"),
        (col(outCol) + lit(s * s) * quad).as(outCol)): _*)
    }
    cur.select(passthrough :+ col(outCol): _*)
  }

  /** Fixed-width HILBERT-bucket stats — the oracle-checkable form of the
    * Hilbert layout, shaped like [[zBucketStats]]: bucket = top bits of
    * the curve position; per bucket, row count and both dimensions'
    * min/max. Same √-tile bound as Morton on aligned tiles, with the
    * no-jump adjacency pinned separately by the spec.
    */
  def hilbertBucketStats(df: DataFrame, aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long,
      bits: Int = 16, nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 2 && (nBuckets & (nBuckets - 1)) == 0,
      s"nBuckets must be a power of two: $nBuckets")
    require(Integer.numberOfTrailingZeros(nBuckets) <= 2 * bits,
      s"nBuckets=$nBuckets exceeds the key space 4^bits at bits=$bits")
    val shift = 2 * bits - Integer.numberOfTrailingZeros(nBuckets)
    withHilbertKey(
      df.select(col(aCol).as("a"), col(bCol).as("b")),
      "a", "b", aLo, aHi, bLo, bHi, bits)
      .groupBy(shiftright(col("h"), shift).as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("a")).as("min_a"), max(col("a")).as("max_a"),
        min(col("b")).as("min_b"), max(col("b")).as("max_b"))
  }

  /** Physical z-ordered write: range-partition by the z-key into
    * `numFiles` sorted parquet files. Each file's min/max footer then
    * carries the √-bounded ranges of BOTH dimensions, which is what the
    * scan planner prunes on. Range boundaries are Spark's sampled ones —
    * layout, not semantics (see class doc).
    */
  def write(df: DataFrame, aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long, dir: String,
      numFiles: Int = 16, bits: Int = 16): Unit =
    df.withColumn("__z",
      zKey(col(aCol), aLo, aHi, col(bCol), bLo, bHi, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)

  /** Physical HILBERT-ordered write — [[write]] on the locality-optimal
    * key: because consecutive curve positions are always grid neighbors,
    * a range-partition boundary can never land mid-jump, so per-file
    * footer ranges are at least as tight as the Morton write's under any
    * sampled boundary draw.
    */
  def writeHilbert(df: DataFrame, aCol: String, bCol: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long, dir: String,
      numFiles: Int = 16, bits: Int = 16): Unit =
    withHilbertKey(df, aCol, bCol, aLo, aHi, bLo, bHi, bits, "__h")
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(dir)
}
