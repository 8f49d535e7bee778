package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed training-data pass a 100 TB
  * pretraining pipeline actually runs, built entirely from the registered
  * operator families so the whole chain stays one Catalyst plan plus the
  * bounded component loop:
  *
  *   language gate (TA2) -> quality gate (TA1) -> exact prefix dedup (DD1b
  *   keeper semantics) -> n-gram-Jaccard near-dup components (DD4 + DD7)
  *   -> keeper selection (DD8 semantics) -> curated per-doc stats.
  *
  * Scale shape: the gates are projections on one scan (no shuffle); exact
  * dedup is one hash-agg on a 16-byte fingerprint plus a semi join; the
  * near-dup stage reuses the bucketed candidate generator (never
  * all-pairs) and the Pregel-style min-label loop, both bounded; keeper
  * filtering is anti/semi joins that AQE converts to broadcasts when the
  * loser sets are small. No windows over the whole corpus, nothing
  * collected to the driver.
  *
  * Keeper invariant: `connectedComponents` labels every vertex with the
  * MINIMUM doc_id reachable from it, so a row is a near-dup loser exactly
  * when its label differs from its own id — keeper selection needs no
  * extra aggregate.
  */
object Curation {

  /** Stateless gate stage: language + quality predicates as projections on
    * one pass over (doc_id, text) — shared verbatim by the batch pass and
    * [[graft.streaming.CorpusStreams.curateStream]] (a projection-only
    * stage streams unchanged).
    */
  def gate(docs: DataFrame,
      keepLangs: Seq[String] = Seq("en"),
      minStopwordRatio: Double = 0.01,
      minTokens: Long = 5,
      maxPunctRatio: Double = 0.30): DataFrame =
    TextAnalysis.withLangPred(TextAnalysis.withQuality(docs))
      .filter(col("lang_pred").isin(keepLangs: _*) &&
        col("stopword_ratio") >= minStopwordRatio &&
        col("n_tokens") >= minTokens &&
        col("punct_ratio") <= maxPunctRatio)

  /** Curate (doc_id, text) into the kept-docs stats table
    * (doc_id, lang_pred, n_tokens, n_chars, stopword_ratio).
    */
  /** Near-dup pair stage shared by [[curate]] and [[curateWithFunnel]]:
    * `lshPrefilter = false` is the exact inverted-index form (oracle-
    * checked; candidate volume grows with shingle document frequency);
    * `true` is the MinHash-LSH→verify composition
    * ([[Dedup.jaccardVerifiedPairs]]) — the 100 TB operating point, where
    * the 10x probe measured the exact form going candidate-quadratic
    * (SCALE.md §scale-probe) while the LSH form stays linear. Identical
    * results whenever banding recall is 1.0 on the corpus's near-dup
    * pairs (CurationSpec pins this on the fixture).
    */
  private def nearDupPairs(exact: DataFrame, shingleN: Int,
      jaccardThreshold: Double, lshPrefilter: Boolean): DataFrame =
    if (lshPrefilter)
      Dedup.jaccardVerifiedPairs(exact, "text", shingleN, 4, 2, jaccardThreshold)
    else Dedup.ngramJaccardPairs(exact, "text", shingleN, jaccardThreshold)

  def curate(docs: DataFrame,
      keepLangs: Seq[String] = Seq("en"),
      minStopwordRatio: Double = 0.01,
      minTokens: Long = 5,
      maxPunctRatio: Double = 0.30,
      prefixLen: Int = 100,
      shingleN: Int = 3,
      jaccardThreshold: Double = 0.5,
      lshPrefilter: Boolean = false): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val gated = gate(docs.select(col("doc_id"), col("text")),
      keepLangs, minStopwordRatio, minTokens, maxPunctRatio)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // exact dedup on the prefix fingerprint: keeper = min doc_id per hash
    val keepers = gated
      .groupBy(md5(substring(col("text"), 1, prefixLen)).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    // Persist the survivors: this subtree feeds BOTH the near-dup edge
    // computation and the final anti-join. Un-persisted, each consumer
    // re-evaluates the whole gate + hash-agg + semi-join chain — at corpus
    // scale that is a second (and third: the semi-join's two branches) full
    // scan. `gated` is persisted too so its single materialization computes
    // the gate projections once for both semi-join branches.
    val exact = gated.join(keepers, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // near-dup components over the survivors; losers carry a foreign label.
    // connectedComponents runs its label fixed-point eagerly (driver loop),
    // so `exact` is materialized into the cache here.
    val losers = Dedup.connectedComponents(
        nearDupPairs(exact, shingleN, jaccardThreshold, lshPrefilter))
      .filter(col("component") =!= col("doc_id"))
      .select(col("doc_id"))
    // Materialize the (small: stats columns only) curated table while the
    // caches are live, then release them — the caller gets a plan with no
    // second corpus scan behind it. The pipeline is already eager via the
    // component loop, so the extra job changes shape, not laziness.
    val curated = Materialize(exact.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        col("n_chars"), col("stopword_ratio")))
    exact.unpersist()
    gated.unpersist()
    curated
  }

  /** Curation funnel report — per-stage survivor counts for the full pass
    * (total → language gate → quality gate → exact dedup → near-dup
    * keepers): the observability row every production curation job emits,
    * so a param change or a data regression shows WHERE the corpus went.
    * Stage semantics are exactly [[curate]]'s (same predicates, same keeper
    * rules); the driver collects five scalars, nothing else.
    */
  def funnelReport(docs: DataFrame,
      keepLangs: Seq[String] = Seq("en"),
      minStopwordRatio: Double = 0.01,
      minTokens: Long = 5,
      maxPunctRatio: Double = 0.30,
      prefixLen: Int = 100,
      shingleN: Int = 3,
      jaccardThreshold: Double = 0.5): DataFrame =
    curateWithFunnel(docs, keepLangs, minStopwordRatio, minTokens,
      maxPunctRatio, prefixLen, shingleN, jaccardThreshold)._2

  /** One-pass curate + funnel: the curated stats table AND the per-stage
    * counts off the same persisted intermediates — the production shape
    * (running [[curate]] then [[funnelReport]] separately would scan and
    * dedup the corpus twice for one job's output + observability row).
    */
  def curateWithFunnel(docs: DataFrame,
      keepLangs: Seq[String] = Seq("en"),
      minStopwordRatio: Double = 0.01,
      minTokens: Long = 5,
      maxPunctRatio: Double = 0.30,
      prefixLen: Int = 100,
      shingleN: Int = 3,
      jaccardThreshold: Double = 0.5,
      lshPrefilter: Boolean = false): (DataFrame, DataFrame) = {
    import org.apache.spark.storage.StorageLevel
    val spark = docs.sparkSession
    import spark.implicits._
    val enriched = TextAnalysis.withLangPred(
      TextAnalysis.withQuality(docs.select(col("doc_id"), col("text"))))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val langOk = col("lang_pred").isin(keepLangs: _*)
    val gateOk = langOk && col("stopword_ratio") >= minStopwordRatio &&
      col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio
    // coalesce: sum() over an EMPTY corpus is null, and an empty daily
    // partition is a legitimate funnel input, not an error
    val gateRow = enriched.agg(
      count(lit(1)).as("n_total"),
      coalesce(sum(when(langOk, 1L).otherwise(0L)), lit(0L)).as("n_lang"),
      coalesce(sum(when(gateOk, 1L).otherwise(0L)), lit(0L)).as("n_gate")).head()
    val gated = enriched.filter(gateOk)
    val keepers = gated
      .groupBy(md5(substring(col("text"), 1, prefixLen)).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val exact = gated.join(keepers, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nExact = exact.count()
    val losers = Dedup.connectedComponents(
        nearDupPairs(exact, shingleN, jaccardThreshold, lshPrefilter))
      .filter(col("component") =!= col("doc_id"))
      .select(col("doc_id"))
    val curated = Materialize(exact.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        col("n_chars"), col("stopword_ratio")))
    val nCurated = curated.count()
    exact.unpersist()
    enriched.unpersist()
    val funnel = Seq((gateRow.getLong(0), gateRow.getLong(1), gateRow.getLong(2),
      nExact, nCurated))
      .toDF("n_total", "n_lang_pass", "n_gate_pass", "n_exact_keep", "n_curated")
    (curated, funnel)
  }

  /** Incremental curation — the daily-increment form of [[curate]]: curate
    * only `newDocs` against an `existing` already-curated corpus (the S6
    * skip-if-exists discipline applied to the whole curation pass). A new
    * doc survives iff it
    *  (1) passes the gates,
    *  (2) carries a prefix fingerprint seen neither in `existing` nor
    *      earlier (min doc_id) in the new batch, and
    *  (3) is not a near-duplicate of existing content (its component in
    *      the UNION near-dup graph contains no existing doc) and is the
    *      minimum-id member of its purely-new component.
    * Ids must be disjoint across the two inputs (they are distinct
    * corpora by construction).
    *
    * Scale shape: gates are projections over the NEW batch only; the
    * exact-dedup check against existing is one anti-join on 16-byte
    * fingerprints (broadcast when the daily batch is small); the near-dup
    * stage shingle-joins new survivors against new ∪ existing — at
    * production scale the existing side's shingle buckets are precomputed
    * once and reused across increments, so each increment costs
    * O(new batch), not O(corpus).
    */
  def curateIncremental(newDocs: DataFrame, existing: DataFrame,
      keepLangs: Seq[String] = Seq("en"),
      minStopwordRatio: Double = 0.01,
      minTokens: Long = 5,
      maxPunctRatio: Double = 0.30,
      prefixLen: Int = 100,
      shingleN: Int = 3,
      jaccardThreshold: Double = 0.5,
      existingShingles: Option[DataFrame] = None,
      lshPrefilter: Boolean = false): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val fp = md5(substring(col("text"), 1, prefixLen))
    val gated = gate(newDocs.select(col("doc_id"), col("text")),
      keepLangs, minStopwordRatio, minTokens, maxPunctRatio)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // (2): first-in-batch per fingerprint, minus fingerprints existing holds
    val batchKeepers = gated
      .groupBy(fp.as("fp")).agg(min(col("doc_id")).as("doc_id"))
      .join(existing.select(fp.as("fp")).distinct(), Seq("fp"), "left_anti")
      .select(col("doc_id"))
    val exact = gated.join(batchKeepers, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // (3): near-dup components over new survivors UNION existing. When the
    // caller supplies the existing corpus's persisted shingle table
    // (Dedup.shingleTable written at the previous increment), only the new
    // batch is re-tokenized — the per-increment cost the SCALE note
    // promises; otherwise both sides' shingles are derived here.
    val uniShingles = Dedup.shingleTable(
        exact.select(col("doc_id"), col("text")), "text", shingleN)
      .unionByName(existingShingles.getOrElse(Dedup.shingleTable(
        existing.select(col("doc_id"), col("text")), "text", shingleN)))
      // the LSH path evaluates this union three times (signature agg +
      // both verify branches); connectedComponents is eager (driver
      // fixed-point), so the cache is live exactly while it runs
      .persist(StorageLevel.MEMORY_AND_DISK)
    // near-dup pair stage: the exact inverted-index form is the oracle
    // anchor; lshPrefilter = true swaps in the shingle-hash MinHash-LSH →
    // verify composition (Dedup.jaccardVerifiedPairsFromShingles) — the
    // 100 TB operating point, where the exact form's candidate volume
    // goes quadratic on saturated shingle vocabularies (SCALE.md
    // §scale-probe) while banding keeps candidates linear. Identical
    // output whenever banding recall is 1.0 on the corpus's near-dup
    // pairs (CurationSpec pins this on the fixture; 8x2 banding puts the
    // per-pair miss probability at ≤ 3e-6 for j ≥ 0.8).
    val pairs =
      if (lshPrefilter)
        Dedup.jaccardVerifiedPairsFromShingles(uniShingles,
          minJaccard = jaccardThreshold)
      else Dedup.ngramJaccardPairsFromShingles(uniShingles, jaccardThreshold)
    val labels = Dedup.connectedComponents(pairs)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val contaminated = labels
      .join(existing.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .select(col("component")).distinct()
    val losers = labels
      .join(contaminated, Seq("component"), "left_semi")
      .select(col("doc_id"))
      .unionByName(labels.filter(col("component") =!= col("doc_id"))
        .select(col("doc_id")))
      .distinct()
    val curated = Materialize(exact.join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang_pred"), col("n_tokens"),
        col("n_chars"), col("stopword_ratio")))
    labels.unpersist()
    uniShingles.unpersist()
    exact.unpersist()
    gated.unpersist()
    curated
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
    * NeurIPS): score every raw document by how much more likely its
    * hashed-n-gram profile is under a TARGET domain's bag-of-features
    * model than under the raw pool's own, then resample the top-k by
    * Gumbel-perturbed weight (= sampling without replacement proportional
    * to the importance weights — Gumbel-top-k, Vieira 2014).
    *
    * Features (the paper's §3.2): unigrams AND bigrams of the ta11 token
    * convention, hashed into `buckets` via the corpus-wide md5-60-bit
    * convention — so feature extraction is pure Column expressions and
    * bit-identical in DuckDB. Both feature models are Laplace-smoothed
    * multinomials over buckets; per-bucket log-ratios ln(p̂_t/q̂_r) snap
    * to the 6dp grid and become integer micro-nats BEFORE the per-doc
    * sum (the ta16/ta18 discipline), so log-weights are exact integers.
    * The Gumbel key g = -ln(-ln(u)) draws u from the keyed-hash uniform
    * md5("<seed>:" ++ doc_id) (the sp1/o4 layout-independence
    * convention), snaps to 6dp, and joins the weight in micro-nat units;
    * selection is the top-k over (key desc, doc_id asc) — a total order,
    * so the whole report carries a full hash oracle.
    *
    * Scale shape: two bucket-count hash-aggs (≤ `buckets` rows each,
    * partial-aggregated), one broadcast of the ≤`buckets`-row log-ratio
    * table, one map-side per-doc sum, and ONE top-k (TakeOrdered — k rows
    * per partition merge, never a global sort). The corpus is scanned
    * twice (once to fit q̂, once to score) and shuffled only by its own
    * bucket counts; the target fits in one agg of its own. Nothing grows
    * with corpus size except the two count aggregates.
    */
  /** CUR3: excess-loss data selection (the RHO-loss shape, Mindermann et
    * al. 2022, "Prioritized training on points that are learnable, worth
    * learning, and not yet learnt"): score each document by its loss
    * under the CURRENT weak model minus its loss under a stronger
    * REFERENCE model, and keep the top k. High excess = the stronger
    * model explains the text far better than the weak one — there is
    * learnable structure the weak model has not captured. Near-zero
    * excess = either noise (both models equally bad — irreducible loss,
    * not worth training on) or trivially repetitive text (both equally
    * good — already learnt). The published form trains a NN pair; this
    * uses the library's self-trained LM ladder as the proxy pair — the
    * ta11 corpus unigram as the current model and the ta16 interpolated
    * bigram as the reference — so the operator ships no weights and
    * every score is SQL-replayable. Losses are negated logprobs, so
    * excess = avg_lp_bigram - avg_lp_unigram.
    *
    * Selection is the cur2 discipline: TakeOrdered finds the k-th
    * (excess desc, doc_id asc) tuple — k rows per partition merge — and
    * selection is a broadcast threshold compare, never a global sort.
    * Both avg logprobs are exact integer half-up means on the 4dp grid
    * (the lmMicro convention), so excess is the same double on every
    * engine and partitioning. Docs with fewer than two tokens have no
    * bigram score and do not compete (a sub-2-token doc is not training
    * data). Scale shape: two self-trained LM passes (each a token
    * explode + hash-aggs + a vocab-keyed shuffle join — the ta11/ta16
    * shapes, linear in tokens), one doc-keyed join, one metadata-scale
    * threshold.
    */
  def excessLossSelect(docs: DataFrame, k: Int,
      textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // one corpus scan feeds both LM trainings (the double-branch rule)
    val base = Materialize(
      docs.select(col("doc_id"), col(textCol).as("text")))
    val uni = TextAnalysis.unigramLogProb(base)
      .select(col("doc_id"), col("avg_logprob").as("lp_uni"))
    val bi = TextAnalysis.bigramLogProb(base)
      .select(col("doc_id"), col("avg_logprob").as("lp_bi"))
    val keyed = Materialize(uni.join(bi, Seq("doc_id"))
      .withColumn("excess", col("lp_bi") - col("lp_uni")))
    val kth = keyed.orderBy(col("excess").desc, col("doc_id").asc).limit(k)
      .agg(min(struct(col("excess"), (-col("doc_id")).as("nid"))).as("th"))
    keyed.crossJoin(broadcast(kth))
      .select(col("doc_id"), col("lp_uni"), col("lp_bi"), col("excess"),
        (struct(col("excess"), (-col("doc_id")).as("nid")) >= col("th"))
          .cast("int").as("selected"))
  }

  def dsirSelect(raw: DataFrame, target: DataFrame, k: Int,
      buckets: Int = 4096, textCol: String = "text",
      seed: String = "dsir"): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val toks = regexp_extract_all(lower(col(textCol)),
      lit("[\\p{L}\\p{N}]+"), lit(0))
    // unigrams ++ bigrams -> md5 60-bit -> bucket id
    val feats = (df: DataFrame) => df.select(col("doc_id"),
      explode(concat(
        col("__t"),
        filter(
          zip_with(col("__t"), slice(col("__t"), lit(2), size(col("__t"))),
            (a, b) => when(b.isNotNull, concat(a, lit(" "), b))),
          g => g.isNotNull))).as("gram"))
      .select(col("doc_id"),
        pmod(conv(substring(md5(concat(lit("b:"), col("gram"))), 1, 15),
          16, 10).cast("long"), lit(buckets.toLong)).as("bucket"))
    val rawFeats = Materialize(
      feats(raw.select(col("doc_id"), toks.as("__t"))))
    val tgtFeats = feats(target.select(col("doc_id"), toks.as("__t")))
    def bucketLp(f: DataFrame): DataFrame = {
      val counts = f.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("tot"))
      counts.crossJoin(broadcast(tot)).select(col("bucket"),
        round(round(log((col("n") + 1).cast("double") /
          (col("tot") + buckets).cast("double")), 6) * 1e6)
          .cast("long").as("lpm"),
        col("tot"))
    }
    // smoothing gives unseen buckets ln(1/(tot+B)) — fold that default in
    // via a full outer join + per-side coalesce; the totals ride in as
    // broadcast scalar joins (metadata-scale, no driver math)
    val pT = bucketLp(tgtFeats).select(col("bucket"), col("lpm").as("lp_t"))
    val qR = bucketLp(rawFeats).select(col("bucket"), col("lpm").as("lp_r"))
    val totTgt = tgtFeats.agg(count(lit(1)).as("tt"))
    val totRaw = rawFeats.agg(count(lit(1)).as("tr"))
    val ratioFull = pT.join(qR, Seq("bucket"), "full")
      .crossJoin(broadcast(totTgt)).crossJoin(broadcast(totRaw))
      .select(col("bucket"),
        (coalesce(col("lp_t"),
          round(round(log(lit(1.0) / (col("tt") + buckets)), 6) * 1e6)
            .cast("long")) -
         coalesce(col("lp_r"),
           round(round(log(lit(1.0) / (col("tr") + buckets)), 6) * 1e6)
             .cast("long"))).as("lrm"))
    val docW = rawFeats.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(ratioFull), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c") * col("lrm")).as("wm"))
    // Gumbel-top-k key: micro-nat weight + 6dp-snapped Gumbel noise from
    // the keyed-hash uniform in (0, 1]
    // +0.5 centers the 60-bit lattice in (0, 1) — u can hit neither 0
    // nor 1, so -ln(-ln(u)) is always finite
    val u = (conv(substring(md5(concat(lit(s"$seed:"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("double") + 0.5) /
      lit(1152921504606846976.0) // 2^60
    // A doc with NO features (empty/token-less text) carries no evidence
    // of target-likeness; filling its weight with 0 would rank it ABOVE
    // every doc with a negative log-ratio (most of any real corpus), so
    // feature-less docs are excluded from selection outright
    // (selected = 0) and never compete for the k slots.
    val keyed = Materialize(raw.select(col("doc_id"))
      .join(docW, Seq("doc_id"), "left")
      .withColumn("__hasf", col("wm").isNotNull)
      .na.fill(0L, Seq("wm"))
      .withColumn("gm",
        round(round(-log(-log(u)), 6) * 1e6).cast("long"))
      .withColumn("key", col("wm") + col("gm")))
    // top-k WITHOUT a global sort: TakeOrdered finds the k-th (key desc,
    // doc_id asc) tuple — k rows per partition merge — and the selection
    // is a broadcast threshold compare. (key, -doc_id) descending lex
    // order == the rank order, so `selected` = tuple >= k-th tuple; with
    // fewer than k docs the threshold is the global min and all pass.
    val kth = keyed.filter(col("__hasf"))
      .orderBy(col("key").desc, col("doc_id").asc).limit(k)
      .agg(min(struct(col("key"), (-col("doc_id")).as("nid"))).as("th"))
    // false && null = false (SQL 3VL), so a corpus with ZERO feature-ful
    // docs (null threshold) still yields selected = 0 rows, never nulls
    keyed.crossJoin(broadcast(kth))
      .select(col("doc_id"), (col("wm") / 1e6).as("log_weight"),
        (col("gm") / 1e6).as("gumbel"),
        (col("__hasf") &&
          (struct(col("key"), (-col("doc_id")).as("nid")) >= col("th")))
          .cast("int").as("selected"))
  }
}
