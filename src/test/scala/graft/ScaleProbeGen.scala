package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (SCALE.md §scale-probe): generate a ~10x sibling of the sf0.1
  * corpus so the "would survive 100x" argument carries measured slopes,
  * not just design review. The driver's testdata is read-only and tops out
  * at sf0.1, so this synthesizes the NEXT decade locally with the same
  * statistical shape:
  *
  *  - `documents` (50k): the sf0.1 generator's observed shape — 31-word
  *    vocabulary, token count uniform in [10, 100], langs weighted
  *    (en 41%, de/es/fr/zh ~15% each), and ~4.8% planted near-dup pairs
  *    (upper-half doc copies a lower-half doc's text with one token
  *    mutated, Jaccard ~0.98 — matching the 241 pairs / 5000 docs
  *    measured at sf0.1). Texts are a pure function of doc_id (seeded
  *    splitmix-style RNG), so twins regenerate their source exactly.
  *  - `embeddings` (20k): unit-normalized 64-d Gaussians, 10 labels —
  *    sf0.1's embeddings are random unit vectors (measured same-label
  *    mean cosine 0.001); near-dup twins are planted in-query by
  *    nearDupEmbeddings, so the base table needs no pair structure.
  *  - `lineitem`/`orders` (6M/1.5M): 10 replicas of sf0.1 with disjoint
  *    key spaces (orderkey/custkey/suppkey/partkey offset per replica),
  *    i.e. 10 disjoint copies of the relational instance — exactly how a
  *    10x TPC-H-ish corpus grows for the probed query set (per-key work
  *    unchanged, key count 10x; the trade graph becomes 10 disjoint
  *    subgraphs of the sf0.1 shape).
  *
  * Usage: sbt "Test/runMain graft.ScaleProbeGen [outDir] [mult]"
  * then   SPARK_GRAFT_SF_DIR=<outDir> SPARK_GRAFT_ONLY=... runMain graft.Bench
  */
object ScaleProbeGen {
  private val Vocab = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")
  private val Langs = Array("en", "de", "es", "fr", "zh")

  private def rngFor(id: Long, salt: Long): java.util.Random =
    new java.util.Random(id * 6364136223846793005L + salt)

  /** Text is a pure function of doc_id so a twin can regenerate its
    * source without a join.
    */
  private def baseText(id: Long): String = {
    val rnd = rngFor(id, 0x9E3779B97F4A7C15L)
    val n = 10 + rnd.nextInt(91)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Vocab(rnd.nextInt(Vocab.length)))
      i += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_sf1x")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("scale-probe-gen").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nDocs = 5000L * mult
    val half = nDocs / 2
    val docText = udf { (id: Long) =>
      val twinRnd = rngFor(id, 0x5DEECE66DL)
      if (id >= half && twinRnd.nextDouble() < 0.0964) {
        // near-dup twin: copy a lower-half doc, mutate one token
        val srcId = id - half
        val toks = baseText(srcId).split(' ')
        toks(twinRnd.nextInt(toks.length)) = Vocab(twinRnd.nextInt(Vocab.length))
        toks.mkString(" ")
      } else baseText(id)
    }
    val langOf = udf { (id: Long) =>
      val r = rngFor(id, 0xB5297A4DL).nextDouble()
      if (r < 0.41) "en" else Langs(1 + ((r - 0.41) / 0.1475).toInt.min(3))
    }
    spark.range(nDocs)
      .select(col("id").as("doc_id"), docText(col("id")).as("text"),
        langOf(col("id")).as("lang"),
        concat(lit("src"), pmod(col("id"), lit(20)).cast("string")).as("source"))
      .withColumn("n_chars", length(col("text")).cast("int"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

    val nVecs = 2000L * mult
    val vecOf = udf { (id: Long) =>
      val rnd = rngFor(id, 0x27D4EB2FL)
      val v = Array.fill(64)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / norm).toFloat)
    }
    spark.range(nVecs)
      .select(col("id").as("vec_id"), vecOf(col("id")).as("embedding"),
        pmod(hash(col("id")), lit(10)).as("label"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")

    // events: the driver table's shape (5 uniform event types, ~1500*mult
    // users, microsecond timestamps over a 30-day window, double value)
    // PLUS a planted HOT KEY — user 0 receives ~20% of ALL events (the
    // g1c pattern), so the as-of union-window, the interval join's
    // (key, cell) buckets, and sessionization are probed under real key
    // skew, not just row count. All columns are pure functions of
    // event_id (seeded), so reruns are bit-identical.
    val nEvents = 100000L * mult
    val nUsers = 1500L * mult
    val evTypes = Array("signup", "click", "error", "view", "purchase")
    val evType = udf { (id: Long) =>
      evTypes(rngFor(id, 0x1B873593L).nextInt(evTypes.length)) }
    val evUser = udf { (id: Long) =>
      val r = rngFor(id, 0x85EBCA6BL)
      if (r.nextDouble() < 0.2) 0L
      else 1L + (r.nextLong() & Long.MaxValue) % (nUsers - 1)
    }
    val evTsUs = udf { (id: Long) =>
      1704067200000000L +
        (rngFor(id, 0xC2B2AE35L).nextDouble() * 30L * 86400L * 1000000L).toLong }
    val evValue = udf { (id: Long) =>
      rngFor(id, 0x27220A95L).nextDouble() * 100.0 }
    spark.range(nEvents)
      .select(col("id").as("event_id"),
        timestamp_micros(evTsUs(col("id"))).as("ts"),
        evUser(col("id")).as("user_id"),
        evType(col("id")).as("event_type"),
        evValue(col("id")).as("value"),
        lit("{}").as("props"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")

    // relational tables: `mult` disjoint replicas (offsets keep every key
    // space separate so the instance is mult independent copies of sf0.1)
    val reps = spark.range(mult).select(col("id").as("rep"))
    spark.read.parquet(s"$src/lineitem.parquet").crossJoin(broadcast(reps))
      .select(
        (col("l_orderkey") + col("rep") * 10000000L).as("l_orderkey"),
        (col("l_partkey") + col("rep") * 1000000L).as("l_partkey"),
        (col("l_suppkey") + col("rep") * 100000L).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/lineitem.parquet")
    spark.read.parquet(s"$src/orders.parquet").crossJoin(broadcast(reps))
      .select(
        (col("o_orderkey") + col("rep") * 10000000L).as("o_orderkey"),
        (col("o_custkey") + col("rep") * 100000L).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/orders.parquet")

    println(s"[scale-probe-gen] wrote ${mult}x corpus to $outDir")
    spark.stop()
  }
}
