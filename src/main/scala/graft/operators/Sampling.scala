package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting / mixture operators for training-data
  * pipelines: train/val/test assignment, weighted up/down-sampling for
  * corpus mixing, and stratified fractions.
  *
  * Everything here keys on a seeded md5 of the document id — NOT on
  * `rand()` — so results are independent of partition layout and task
  * retries (a rand()-based split re-rolls under speculative execution and
  * AQE re-partitioning), reproducible across runs and engines (md5 is
  * bit-identical in DuckDB, so every operator has an exact SQL oracle),
  * and stable under incremental appends: a doc keeps its split/copies
  * forever, no matter what else lands in the corpus.
  *
  * Scale shape: all pure Column expressions (whole-stage codegen, no UDF,
  * no shuffle) — a 100 TB corpus splits in one map-only pass.
  */
object Sampling {

  /** Uniform [0,1) draw keyed on (seed, id): first 60 bits of
    * md5("<seed>:<id>") over 2^60 — the same md5-prefix-long derivation as
    * the MinHash/fingerprint family (SURVEY §7.4).
    */
  def unitHash(idCol: Column, seed: String): Column =
    conv(substring(md5(concat(lit(s"$seed:"), idCol.cast("string"))), 1, 15),
      16, 10).cast("double") / lit(1.152921504606846976e18)

  /** Assign each row to one named split with the given weights (need not
    * sum to 1 — they are normalized). Adds a `split` column; rows keep all
    * input columns. Deterministic in (seed, id) only.
    */
  def assignSplits(docs: DataFrame,
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05),
      seed: String = "split", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0) &&
      weights.map(_._2).sum > 0, s"bad split weights: $weights")
    val total = weights.map(_._2).sum
    val u = unitHash(col(idCol), seed)
    // fold cumulative thresholds into one chained CASE; the last split is
    // the unconditional otherwise so float edge-dust cannot drop a row
    val cum = weights.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val expr = weights.init.zip(cum).foldLeft(None: Option[Column]) {
      case (acc, ((name, _), hi)) =>
        val c = u < lit(hi)
        Some(acc.fold(when(c, lit(name)))(_.when(c, lit(name))))
    }.fold(lit(weights.head._1))(_.otherwise(lit(weights.last._1)))
    docs.withColumn("split", expr)
  }

  /** SP4: leakage-safe split assignment — near-duplicate GROUPS, not
    * documents, are the split unit. Per-doc hashing ([[assignSplits]])
    * puts two near-identical documents in train and test with probability
    * 2·p·(1−p) each — exactly the train/test contamination corpus-level
    * dedup papers warn about (Lee et al. 2021 §6: near-dups across the
    * split boundary inflate eval). Here every doc keys its split on its
    * near-dup component representative (min doc_id, from
    * [[Dedup.connectedComponents]] over caller-supplied pairs), so a
    * whole duplicate cluster lands on one side of every boundary;
    * singleton docs key on their own id, making the assignment identical
    * to [[assignSplits]] wherever no near-dup exists (and append-stable
    * the same way, as long as a doc's component representative is
    * stable). One closure over the pair graph (metadata next to the
    * corpus — pairs are near-dups, not documents) + a left join + the
    * same map-only CASE.
    */
  def componentSplits(docs: DataFrame, pairs: DataFrame,
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125),
      seed: String = "split", idCol: String = "doc_id"): DataFrame = {
    val comp = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as(idCol), col("component"))
    val keyed = docs.select(col(idCol))
      .join(comp, Seq(idCol), "left")
      .withColumn("split_key", coalesce(col("component"), col(idCol)))
    assignSplits(keyed, weights, seed, "split_key")
      .select(col(idCol), col("split_key"), col("split"))
  }

  /** Weighted deterministic resampling — the corpus-mixing primitive: each
    * row is emitted `floor(weight)` times plus one more with probability
    * `frac(weight)` (keyed on (seed, id), not rand()). weight < 1
    * downsamples, weight > 1 upsamples, 0 drops. Output adds a `copy`
    * column (1-based) so downstream shuffles can spread the replicas.
    * Domain-reweighting a 100 TB mixture is one map-only pass; no row is
    * ever shuffled to decide its own fate.
    */
  def weightedResample(docs: DataFrame, weight: Column,
      seed: String = "mix", idCol: String = "doc_id"): DataFrame = {
    val u = unitHash(col(idCol), seed)
    val copies = (floor(weight) +
      when(u < weight - floor(weight), 1).otherwise(0)).cast("int")
    // sequence(1, 0) steps BACKWARD in Spark — zero-copy rows must map to
    // an empty array (explode then drops them), not reach sequence()
    docs.withColumn("copy",
      explode(when(copies >= 1, sequence(lit(1), copies))
        .otherwise(array().cast("array<int>"))))
  }

  /** Deterministic global shuffle — the training-order pass: every row
    * gets a dense position 0..n-1 in md5(seed‖id) order. Change `seed` per
    * epoch for a fresh order; same seed always reproduces the same order,
    * on any cluster size or partition layout.
    *
    * Scale shape: a global ORDER BY + row_number would funnel the corpus
    * through one task. Instead: range-partition on the shuffle key, rank
    * locally per partition, then shift by per-partition counts collected
    * to the driver (numPartitions rows — metadata) — the same two-pass
    * distributed-prefix pattern as [[Packing.packSequences]], with counts
    * for sums. Ties between hash values (~n²/2^60 birthday rate) break on
    * the id, keeping the order total.
    */
  def deterministicShuffle(docs: DataFrame, seed: String = "epoch0",
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val key = md5(concat(lit(s"$seed:"), col(idCol).cast("string")))
    val ranged = docs.withColumn("__k", key)
      .repartitionByRange(col("__k"), col(idCol))
      .withColumn("__pid", spark_partition_id())
    val local = Materialize(ranged.withColumn("__rn",
      row_number().over(
        Window.partitionBy(col("__pid")).orderBy(col("__k"), col(idCol)))))
    val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).init)
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    local.join(broadcast(offDf), Seq("__pid"))
      .withColumn("shuffle_pos", col("__off") + col("__rn") - 1)
      .drop("__k", "__pid", "__rn", "__off")
  }

  /** Temperature-flattened mixture sampling — the multilingual/domain
    * rebalancing standard (exponential smoothing, XLM/mT5 style): domain d
    * with n_d docs gets target share q_d ∝ n_d^alpha (alpha < 1 flattens
    * the head, boosting tail domains), and the corpus is downsampled to
    * ~`targetFraction` of its rows with those shares. Per-domain keep rate
    * rate_d = min(1, q_d·T / n_d) with T = targetFraction·n_total — capped
    * at keeping every doc of a small domain (no upsampling here; compose
    * with [[weightedResample]] for weights > 1). The keep decision is the
    * same keyed unit hash as every sampler in this file: deterministic in
    * (seed, id), layout/retry-independent.
    *
    * Scale shape: one hash-aggregate over the domain column (|domains|
    * rows — metadata), rates derived on that tiny side and broadcast back;
    * the corpus itself is touched by exactly one map-only filter pass.
    * Float caveat: each n_d^alpha is snapped to a 9dp grid and Z summed as
    * DECIMAL — order-independent, so the SQL oracle reproduces the rates
    * bit-exactly (the PageRank decimal-grid convention).
    */
  def temperatureMixture(docs: DataFrame, domainCol: Column,
      alpha: Double = 0.5, targetFraction: Double = 0.5,
      seed: String = "temp", idCol: String = "doc_id"): DataFrame = {
    require(alpha > 0 && targetFraction > 0 && targetFraction <= 1,
      s"bad mixture params: alpha=$alpha targetFraction=$targetFraction")
    val counts = docs.groupBy(domainCol.as("__dom"))
      .agg(count(lit(1)).as("__nd"))
    val powG = round(pow(col("__nd").cast("double"), alpha), 9)
    val totals = counts.agg(
      sum(col("__nd")).as("__ntot"),
      sum(powG.cast("decimal(38,10)")).cast("double").as("__z"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("__dom"),
        least(lit(1.0),
          powG / col("__z") *
            (lit(targetFraction) * col("__ntot").cast("double")) /
            col("__nd").cast("double")).as("__rate"))
    val u = unitHash(col(idCol), seed)
    // null-safe join: a null domain is a real stratum (crawl rows without
    // a source tag) — a plain equi-join would silently DROP those rows
    docs.join(broadcast(rates), domainCol <=> col("__dom"))
      .filter(u < col("__rate"))
      .withColumn("keep_rate", col("__rate"))
      .drop("__dom", "__rate")
  }

  /** MX3: UniMax mixture sampling (Chung et al. 2023) — the OTHER standard
    * answer to corpus mixing, complementary to [[temperatureMixture]]:
    * instead of smoothing shares by n^alpha, distribute a total example
    * `budget` as UNIFORMLY as possible across domains subject to a
    * per-domain repetition cap of `maxEpochs` epochs (cap_d = maxEpochs ×
    * n_d). Small domains hit their epoch cap and take cap_d; the leftover
    * budget spreads evenly over the rest — the classic water-filling
    * allocation. UniMax's published win over temperature sampling is
    * exactly this cap: tail languages are boosted to the uniform share but
    * never repeated past `maxEpochs`, so they can't overfit-dominate.
    *
    * Closed form (provably the greedy loop's fixpoint): sort domains by
    * cap ascending; at index i the candidate uniform share is
    * s_i = (budget − Σ_{j<i} cap_j) / (D − i + 1); while cap_i < s_i the
    * domain is capped (shares only grow as capped domains drop out —
    * s_{i+1} − s_i ∝ s_i − cap_i > 0), and the water level s* is the
    * share at the FIRST uncapped index (NOT the min over candidates:
    * later candidates recompute with full-cap prefixes and undershoot).
    * Then alloc_d = min(cap_d, s*), and Σ alloc = budget exactly whenever
    * budget ≤ Σ cap (else every domain caps and the result is maxEpochs
    * epochs of everything). Each doc is emitted with expectation
    * alloc_d / n_d copies via [[weightedResample]]'s keyed-hash
    * floor+fraction — epochs > 1 genuinely repeat docs, epochs < 1
    * downsample.
    *
    * Scale shape: the waterfall runs on the |domains|-row aggregate
    * (metadata — its global window sorts D rows, the sp3 discipline), the
    * rate table broadcasts back, and the corpus is touched by exactly one
    * map-only explode pass. Decimal prefix sums + one IEEE division per
    * row keep every rate bit-reproducible in the SQL oracle.
    */
  def unimaxMixture(docs: DataFrame, domainCol: Column, budget: Double,
      maxEpochs: Double = 4.0, seed: String = "unimax",
      idCol: String = "doc_id"): DataFrame = {
    require(budget > 0 && maxEpochs > 0,
      s"bad unimax params: budget=$budget maxEpochs=$maxEpochs")
    import org.apache.spark.sql.expressions.Window
    val counts = docs.groupBy(domainCol.as("__dom"))
      .agg(count(lit(1)).as("__nd"))
      .withColumn("__cap", round(col("__nd").cast("double") * maxEpochs, 9))
    // waterfall over the domain table: D rows, metadata-scale
    val w = Window.orderBy(col("__cap"), col("__dom").asc_nulls_first)
    val ranked = counts
      .withColumn("__i", row_number().over(w))
      .withColumn("__cumprev",
        coalesce(sum(col("__cap").cast("decimal(38,10)"))
            .over(w.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0).cast("decimal(38,10)")))
      .crossJoin(broadcast(counts.agg(count(lit(1)).as("__ndom"))))
      .withColumn("__share",
        (lit(budget) - col("__cumprev").cast("double")) /
          (col("__ndom") - col("__i") + 1).cast("double"))
    val sStar = ranked.agg(
      min(when(col("__cap") >= col("__share"),
        struct(col("__i"), col("__share")))).getField("__share").as("__sstar"))
    val rates = ranked.crossJoin(broadcast(sStar))
      .select(col("__dom"),
        (least(col("__cap"), coalesce(col("__sstar"), col("__cap"))) /
          col("__nd").cast("double")).as("__w"))
    // null-safe join (the mx2 rule): a null domain is a real stratum
    val joined = docs.join(broadcast(rates), domainCol <=> col("__dom"))
    weightedResample(joined, col("__w"), seed, idCol)
      .withColumn("target_epochs", round(col("__w"), 6))
      .drop("__dom", "__w")
  }

  /** SP3: deterministic fixed-SIZE uniform sample — the "carve an exact
    * n-doc eval/audit set out of the corpus" primitive. Fraction samplers
    * ([[stratifiedSample]]) give a binomial size; here the n rows with the
    * smallest md5(seed‖id) keys are kept, with a dense 1-based
    * `sample_rank` in key order, so the result has EXACTLY min(n, |corpus|)
    * rows and is a uniform random subset (md5 order is independent of any
    * data order).
    *
    * Scale shape: `orderBy(key).limit(n)` plans as TakeOrderedAndProject —
    * every partition keeps its local top-n and the driver merges
    * n·partitions rows, which is metadata-scale for eval-set n; the corpus
    * is never globally sorted. The rank window afterwards runs over the n
    * surviving rows only. Deterministic in (seed, id) and
    * partition-layout/retry-independent like every sampler here; the
    * trade vs [[assignSplits]] is append-stability — a fixed-size sample
    * necessarily re-ranks when smaller keys arrive (expected O(n/N)
    * membership churn per append), where a fraction split never does.
    */
  def fixedSample(docs: DataFrame, n: Int, seed: String = "sample",
      idCol: String = "doc_id"): DataFrame = {
    require(n >= 1, s"sample size must be >= 1: $n")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit(s"$seed:"), col(idCol).cast("string")))
    docs.withColumn("__k", key)
      .orderBy(col("__k"), col(idCol))
      .limit(n)
      // n rows at this point — the unpartitioned window is metadata-scale
      .withColumn("sample_rank",
        row_number().over(Window.orderBy(col("__k"), col(idCol))))
      .drop("__k")
  }

  /** Per-stratum exact-fraction sample: keep each row iff its unit hash
    * falls under its stratum's fraction. `fractions` maps stratum value →
    * keep fraction; strata absent from the map keep `defaultFraction`.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: Column,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: String = "strat", idCol: String = "doc_id"): DataFrame = {
    val u = unitHash(col(idCol), seed)
    val frac = fractions.foldLeft(None: Option[Column]) {
      case (acc, (k, f)) =>
        val c = stratumCol === lit(k)
        Some(acc.fold(when(c, lit(f)))(_.when(c, lit(f))))
    }.fold(lit(defaultFraction))(_.otherwise(lit(defaultFraction)))
    docs.filter(u < frac)
  }
}
