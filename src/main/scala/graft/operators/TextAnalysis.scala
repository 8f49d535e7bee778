package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{charCount, r4, tokenCount}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All built from
  * codegen'd built-ins (no UDFs) so they run at scan speed and push down.
  */
object TextAnalysis {

  /** Stopword markers per language for the n-gram/stopword-vote language
    * heuristic. Tiny, high-precision function-word lists.
    */
  val StopwordMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "la", "los", "las", "es", "un", "una", "que"),
    "vi" -> Seq("và", "là", "của", "các", "một", "trong", "được", "có"))

  private def markerHits(textArr: Column, lang: String): Column =
    size(filter(textArr, t => StopwordMarkers(lang).map(m => t === lit(m))
      .reduce(_ || _))).cast("long")

  /** Language-ID heuristic: count stopword-marker hits per language over
    * the token array; predict the language with the most hits
    * (deterministic tie-break by language code), 'und' when nothing hits.
    */
  def languageId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val arr = split(lower(trim(col(textCol))), "\\s+")
    val langs = StopwordMarkers.keys.toSeq.sorted
    val withHits = docs.withColumn("__toks", arr)
      .select((col("doc_id") +: langs.map(l =>
        markerHits(col("__toks"), l).as(s"hits_$l"))): _*)
    // argmax with deterministic tie-break: languages are scanned in
    // ascending code order and the first one matching the max hit count
    // wins (filter preserves array order)
    val pairs = array(langs.map(l => struct(col(s"hits_$l").as("hits"), lit(l).as("lang"))): _*)
    val maxHits = greatest(langs.map(l => col(s"hits_$l")): _*)
    // guard INVERTED (maxHits > 0, not <= 0): on NULL text the hit counts
    // and their max are null, `null <= 0` is null, and the old otherwise
    // branch called element_at on an empty filter result — a runtime
    // crash. `null > 0` is falsy, so null text lands on 'und' like any
    // other no-hits row and the gate drops it.
    val winner = when(maxHits > 0,
      element_at(filter(pairs, p => p.getField("hits") === maxHits), 1)
        .getField("lang")).otherwise(lit("und"))
    withHits.withColumn("lang_pred", winner)
      .select((col("doc_id") +: col("lang_pred") +: langs.map(l => col(s"hits_$l"))): _*)
  }

  /** Projection form of [[languageId]]: appends `lang_pred`, keeps every
    * input column, joins nothing — so it composes into streaming plans
    * (a self-join of a stream is a stream-stream join; a projection is
    * free). Same expressions, same results.
    */
  def withLangPred(df: DataFrame, textCol: String = "text"): DataFrame = {
    val arr = split(lower(trim(col(textCol))), "\\s+")
    val langs = StopwordMarkers.keys.toSeq.sorted
    val pairs = array(langs.map(l =>
      struct(markerHits(arr, l).as("hits"), lit(l).as("lang"))): _*)
    val maxHits = greatest(langs.map(l => markerHits(arr, l)): _*)
    // null-safe guard — see the note in [[languageId]]
    val winner = when(maxHits > 0,
      element_at(filter(pairs, p => p.getField("hits") === maxHits), 1)
        .getField("lang")).otherwise(lit("und"))
    df.withColumn("lang_pred", winner)
  }

  /** Projection form of the [[qualityScore]] gate columns (token/char
    * counts, punctuation and stopword ratios), keeping input columns —
    * the streamable variant. Same expressions, same results.
    */
  def withQuality(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val nChar = charCount(t)
    val stopArr = StopwordMarkers("en")
    val toks = split(lower(trim(t)), "\\s+")
    val nStop = size(filter(toks, x => stopArr.map(m => x === lit(m)).reduce(_ || _)))
    val nPunct = nChar - charCount(regexp_replace(t, "[\\p{Punct}]", ""))
    df.withColumn("n_tokens", nTok)
      .withColumn("n_chars", nChar)
      .withColumn("punct_ratio",
        r4(when(nChar === 0, 0.0).otherwise(nPunct.cast("double") / nChar)))
      .withColumn("stopword_ratio",
        r4(when(nTok === 0, 0.0).otherwise(nStop.cast("double") / nTok)))
  }

  /** Quality-scoring columns: token/char counts, mean word length,
    * punctuation ratio, stopword ratio, uppercase ratio — the standard
    * cheap quality gates of a pretraining data pipeline.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val nChar = charCount(t)
    val stopArr = StopwordMarkers("en")
    val toks = split(lower(trim(t)), "\\s+")
    val nStop = size(filter(toks, x => stopArr.map(m => x === lit(m)).reduce(_ || _)))
    val nPunct = nChar - charCount(regexp_replace(t, "[\\p{Punct}]", ""))
    val nUpper = nChar - charCount(regexp_replace(t, "[A-Z]", ""))
    docs.select(
      col("doc_id"),
      nTok.as("n_tokens"),
      nChar.as("n_chars"),
      r4(when(nTok === 0, 0.0).otherwise(
        charCount(regexp_replace(t, "\\s", "")).cast("double") / nTok))
        .as("avg_word_len"),
      r4(when(nChar === 0, 0.0).otherwise(nPunct.cast("double") / nChar)).as("punct_ratio"),
      r4(when(nTok === 0, 0.0).otherwise(nStop.cast("double") / nTok)).as("stopword_ratio"),
      r4(when(nChar === 0, 0.0).otherwise(nUpper.cast("double") / nChar)).as("upper_ratio"))
  }

  /** BPE-ish subword token estimate: count alpha runs, digit runs and
    * punctuation marks separately (a cheap regex proxy for subword
    * tokenizer counts), plus the whitespace word count.
    */
  def tokenStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    def countMatches(pattern: String): Column =
      size(regexp_extract_all(t, lit(pattern), lit(0))).cast("long")
    docs.select(
      col("doc_id"),
      tokenCount(t).as("ws_tokens"),
      countMatches("[\\p{L}]+").as("alpha_runs"),
      countMatches("[0-9]+").as("digit_runs"),
      countMatches("[\\p{Punct}]").as("punct_marks"),
      (countMatches("[\\p{L}]+") + countMatches("[0-9]+") +
        countMatches("[\\p{Punct}]")).as("bpe_estimate"))
  }

  /** Corpus vocabulary statistics: distinct-token count, total token
    * occurrences, and type/token ratio over the whole corpus — the
    * training-data "vocab size" pass. One explode + one hash-aggregate
    * (map-side partial agg collapses per-partition duplicates before the
    * shuffle); the 100 TB variant swaps the exact count for
    * approx_count_distinct (HLL) without touching the plan shape.
    */
  def vocabStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      explode(regexp_extract_all(lower(col(textCol)), lit("[\\p{L}\\p{N}]+"), lit(0)))
        .as("tok"))
    toks.agg(
      countDistinct(col("tok")).as("vocab_size"),
      count(lit(1)).as("n_tokens"),
      r4(countDistinct(col("tok")).cast("double") / count(lit(1))).as("type_token_ratio"))
  }

  /** TA5b — the 100 TB form of [[vocabStats]]: HLL approximate distinct
    * next to the exact pass. At scale the exact form shuffles every
    * distinct token to its reducer; the HLL sketch merges fixed-size
    * partials instead, so the aggregate is O(sketch) per partition
    * regardless of vocabulary size. The HLL estimate is a deterministic
    * function of the token SET (hash-based, merge-commutative, so
    * partitioning cannot change it) — the within-tolerance flag is
    * therefore stable and the query carries a full hash oracle rather
    * than a rows-only check.
    */
  def vocabStatsApprox(docs: DataFrame, textCol: String = "text",
      rsd: Double = 0.02, tolerance: Double = 0.05): DataFrame = {
    val toks = docs.select(
      explode(regexp_extract_all(lower(col(textCol)), lit("[\\p{L}\\p{N}]+"), lit(0)))
        .as("tok"))
    toks.agg(
      countDistinct(col("tok")).as("vocab_size"),
      count(lit(1)).as("n_tokens"),
      approx_count_distinct(col("tok"), rsd).as("hll"))
      .select(col("vocab_size"), col("n_tokens"),
        (abs(col("hll") - col("vocab_size"))
          <= col("vocab_size").cast("double") * tolerance).as("hll_ok"))
  }

  /** TA15: exact corpus heavy hitters via a sketch-pruned two-pass scan —
    * every token whose frequency STRICTLY exceeds n/k, with its exact
    * count. The 100 TB shape is the point: a single groupBy over all
    * tokens shuffles the entire vocabulary to find a handful of hot rows,
    * so pass 1 runs Spark's Misra-Gries sketch (`stat.freqItems` —
    * fixed-size per-partition counter maps, merge-pruned; GUARANTEED to
    * contain every item with count > n·support) to get a ≤1/support
    * candidate set, and pass 2 aggregates the corpus into at most
    * |candidates|+1 groups (candidate tokens + one "rest" bucket, which
    * also yields the exact n) — map-side partials collapse each partition
    * to that bounded row count before the shuffle.
    *
    * The MG containment guarantee is what makes the operator fully
    * oracle-able despite the sketch: if the sketch ever dropped a true
    * heavy hitter, the output would MISS a row the exact SQL replay has —
    * the hash check IS the sketch's correctness gate. Candidate false
    * positives are harmless (the exact pass-2 counts filter them).
    */
  def heavyHitters(docs: DataFrame, k: Int = 50,
      textCol: String = "text"): DataFrame = {
    require(k >= 2, s"heavy-hitter k must be >= 2: $k")
    val toks = docs.select(
      explode(regexp_extract_all(lower(col(textCol)), lit("[\\p{L}\\p{N}]+"), lit(0)))
        .as("tok"))
    val cand = toks.stat.freqItems(Seq("tok"), 1.0 / k)
      .first().getSeq[String](0)
    val bucketed = toks
      .groupBy(when(col("tok").isInCollection(cand), col("tok")).as("tok"))
      .agg(count(lit(1)).as("cnt"))
    // |candidates|+1 rows here — the window over them is metadata-scale
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    bucketed.withColumn("n_total", sum(col("cnt")).over(w))
      .filter(col("tok").isNotNull && col("cnt") * k > col("n_total"))
      .select(col("tok").as("token"), col("cnt"),
        r4(col("cnt").cast("double") / col("n_total")).as("freq"))
  }

  /** TA7: PII tagging + redaction — the scrub pass every training-data
    * pipeline runs before release. Patterns (emails, phone-like digit
    * runs, IPv4) are deliberately RE2-compatible (no lookaround, no
    * backrefs) so the exact same regexes run under Java (Spark) and RE2
    * (DuckDB oracle) engines; replacement order is fixed
    * (email → phone → ip) and counts are taken on the ORIGINAL text.
    * Pure Column expressions — codegen, no UDF.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"
  val Ipv4Re = "\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b"

  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("n_emails", regexp_count(t, lit(EmailRe)))
      .withColumn("n_phones", regexp_count(t, lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(t, lit(Ipv4Re)))
      .withColumn("text_redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>"))
  }

  /** TA19: HTML-to-text extraction — the ingestion step every web-scale
    * training pipeline starts with (CCNet/RefinedWeb/Dolma read WET/WARC
    * pages, not prose). Deliberately regex-structural, not a DOM parse:
    * one map-only Column pass (codegen, no UDF) whose patterns are
    * RE2-compatible (no lookaround, no backrefs — script/style/title need
    * three patterns instead of one backreferenced alternation) so the
    * exact same strings run under Java (Spark) and RE2 (DuckDB oracle).
    *
    * Transform order (each step's output feeds the next):
    * comments → script/style/title blocks removed wholesale → block-level
    * closing tags (+<br>) become newlines → every remaining tag strips →
    * the five structural entities decode (&amp; LAST, so "&amp;lt;"
    * decodes to the literal text "&lt;", not to "<") → whitespace
    * normalization (space runs collapse, spaces around newlines drop,
    * ≥3 newlines become a paragraph break, outer whitespace trims).
    * Explicit character classes ([ \t\r\n]) everywhere instead of \s —
    * Java's \s includes \x0B, RE2's does not.
    *
    * Signals ride along, computed on the ORIGINAL html (the ta7
    * count-on-original convention): `n_tags`, `n_links` (anchor density —
    * the classic nav/boilerplate discriminator), and `text_ratio`
    * (extracted/raw length — near-zero pages are markup shells). Entity
    * coverage is the five structural ones; numeric/exotic entities pass
    * through as text (a full HTML5 table is a data file, not a regex).
    */
  val HtmlCommentRe = "(?s)<!--.*?-->"
  val HtmlScriptRe = "(?is)<script\\b[^>]*>.*?</script>"
  val HtmlStyleRe = "(?is)<style\\b[^>]*>.*?</style>"
  val HtmlTitleRe = "(?is)<title\\b[^>]*>.*?</title>"
  val HtmlBlockCloseRe =
    "(?i)</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote)>|<br[ /]*>"
  val HtmlTagRe = "(?s)<[^>]*>"
  val HtmlLinkRe = "(?i)<a\\b"
  val HtmlSpaceRunRe = "[ \\t\\r]+"
  val HtmlNlSpaceRe = " *\\n *"
  val HtmlNlRunRe = "\\n{3,}"
  val HtmlOuterWsRe = "^[ \\n]+|[ \\n]+$"
  /** Decode order is load-bearing: `&amp;` must be last (see scaladoc). */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&quot;" -> "\"", "&lt;" -> "<", "&gt;" -> ">",
    "&amp;" -> "&")

  def extractHtml(docs: DataFrame, htmlCol: String = "text"): DataFrame = {
    val h = coalesce(col(htmlCol), lit(""))
    val noHidden = Seq(HtmlCommentRe, HtmlScriptRe, HtmlStyleRe, HtmlTitleRe)
      .foldLeft(h)((c, re) => regexp_replace(c, re, ""))
    val stripped = regexp_replace(
      regexp_replace(noHidden, HtmlBlockCloseRe, "\n"), HtmlTagRe, "")
    val decoded = HtmlEntities.foldLeft(stripped) { case (c, (from, to)) =>
      replace(c, lit(from), lit(to)) }
    val clean = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(decoded, HtmlSpaceRunRe, " "),
          HtmlNlSpaceRe, "\n"),
        HtmlNlRunRe, "\n\n"),
      HtmlOuterWsRe, "")
    docs
      .withColumn("clean_text", clean)
      .withColumn("n_tags", regexp_count(h, lit(HtmlTagRe)))
      .withColumn("n_links", regexp_count(h, lit(HtmlLinkRe)))
      .withColumn("text_ratio",
        when(length(h) === 0, lit(0.0)).otherwise(
          r4(length(col("clean_text")).cast("double") /
            length(h).cast("double"))))
  }

  /** TA8: repetition signals — the Gopher/RefinedWeb-style quality gates
    * for machine-generated / boilerplate text: the fraction of duplicate
    * (trimmed, non-empty) lines, and the fraction of all word bigrams
    * taken by the single most frequent bigram. Line dedup is per-row
    * array algebra (no shuffle); the bigram mode is an explode + two
    * hash-aggregates — the scale shape (a per-row O(distinct²) array
    * scan would blow up on 50k-token documents). Docs with no lines /
    * fewer than two tokens score 0.0.
    */
  /** TA9: Unicode text normalization — NFC (native codegen expression; a
    * combining-sequence "café" and its precomposed spelling must hash,
    * fingerprint, and n-gram identically or dedup silently misses), then
    * strip control characters (keeping \t \n \r) and zero-width/BOM code
    * points. One map-only codegen pass; `changed` flags touched rows so a
    * pipeline can count normalization impact without a second diff scan.
    */
  def normalizeText(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val nfc = graft.functions.nfcNormalizeF(col(textCol))
    val noCtrl = regexp_replace(nfc, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    // ZWSP, ZWNJ, ZWJ, BOM — written as escapes; literal zero-width chars
    // in source are themselves the bug this operator removes
    val clean = regexp_replace(noCtrl, "[\\u200B\\u200C\\u200D\\uFEFF]", "")
    docs.withColumn("norm_text", clean)
      // null text -> null norm_text, and `changed` must be FALSE, not null:
      // a null flag silently drops from both branches of a changed-filter
      .withColumn("changed",
        coalesce(col("norm_text") =!= col(textCol), lit(false)))
  }

  /** TA12: corpus length-distribution report — doc-count, mean, exact
    * p50/p90/p99 and max of per-doc token counts, one row. The report that
    * sizes every downstream knob (chunk budget, packing budget, skew
    * salting thresholds). Exact `percentile` (not approx): its sort-based
    * aggregation is deterministic, so the row is oracle-checkable; at
    * 100 TB swap in `percentile_approx`, whose sketch-merge order makes
    * the last decimals run-dependent — the same exact/approx split as
    * TA5/TA5b, just with determinism rather than shuffle width as the
    * boundary.
    */
  def lengthStats(docs: DataFrame, textCol: String = "text"): DataFrame = {
    import graft.functions.exactSum
    val n = tokenCount(col(textCol))
    docs.select(n.as("n"))
      .agg(count(lit(1)).as("n_docs"),
        r4(exactSum(col("n").cast("double")) / count(lit(1))).as("mean_tokens"),
        r4(percentile(col("n"), lit(0.5))).as("p50"),
        r4(percentile(col("n"), lit(0.9))).as("p90"),
        r4(percentile(col("n"), lit(0.99))).as("p99"),
        max(col("n")).as("max_tokens"))
  }

  /** TA12b: the 100 TB percentile swap, driver-gated. [[lengthStats]]'s
    * exact `percentile` is deterministic but buffers every value per
    * group; at scale the sketch form (`percentile_approx` — Greenwald-
    * Khanna, fixed-size mergeable summaries) is the only shape that
    * survives, and its merge order makes the ESTIMATE itself
    * run-dependent — so the estimate can't be hash-checked. What CAN be:
    * GK's guarantee. For target rank φ and accuracy a, the returned value
    * sits within rank error n/a of φ·n, under ANY merge order. This gate
    * computes each approx percentile, then its exact rank interval
    * [count(<v), count(<=v)] in one second aggregate, and passes iff the
    * target rank is within `slack`·n of that interval — a
    * layout-independent boolean per percentile, oracled to literal 1s
    * (the ta5b/qz3 pattern: the approximation's CONTRACT is the checked
    * row, not its noise).
    */
  def lengthStatsApproxGate(docs: DataFrame, textCol: String = "text",
      accuracy: Int = 1000, slack: Double = 0.005): DataFrame = {
    val n = tokenCount(col(textCol))
    val nt = docs.select(n.as("n"))
    val appx = nt.agg(
      percentile_approx(col("n"), array(lit(0.5), lit(0.9), lit(0.99)),
        lit(accuracy)).as("ap"),
      count(lit(1)).as("n_rows"))
    val ranks = nt.crossJoin(broadcast(appx))
    def ok(i: Int, phi: Double): Column = {
      val v = col("ap").getItem(i)
      val below = sum(when(col("n") < v, 1L).otherwise(0L))
      val atOrBelow = sum(when(col("n") <= v, 1L).otherwise(0L))
      val target = lit(phi) * first(col("n_rows")).cast("double")
      val tol = lit(slack) * first(col("n_rows")).cast("double")
      (below.cast("double") - tol <= target &&
        atOrBelow.cast("double") + tol >= target).cast("int")
    }
    ranks.agg(ok(0, 0.5).as("p50_ok"), ok(1, 0.9).as("p90_ok"),
      ok(2, 0.99).as("p99_ok"))
  }

  /** TA11: unigram log-probability quality score — the CCNet/KenLM-style
    * "LM perplexity" gate with the simplest self-trained model: corpus ML
    * unigram probabilities p(w) = count(w)/total, per-doc mean ln p(w).
    * Rare-token-heavy noise scores far below typical prose; unlike an
    * external LM it needs no shipped model and retrains in one aggregate.
    *
    * Scale shape: token frequencies are one hash-agg (map-side partials);
    * the per-token probability lookup is a shuffle join on the token (the
    * vocab at 100 TB is too big to broadcast); the corpus total is one
    * scalar broadcast. Per-doc mean uses round-then-decimal-sum so the
    * result is independent of aggregation order (exactSum discipline).
    */
  def unigramLogProb(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col(textCol)), lit("[\\p{L}\\p{N}]+"), lit(0)))
        .as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val totalDf = freq.agg(sum(col("c")).cast("double").as("total"))
    toks.join(freq, Seq("tok"))
      .crossJoin(broadcast(totalDf))
      .select(col("doc_id"),
        round(log(col("c").cast("double") / col("total")), 6).as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        // same exact-integer 4dp mean as [[bigramLogProb]] — see the
        // cross-engine round(double) note there
        sum(round(col("lp") * 1e6).cast("long")).as("__sum_micro"))
      .select(col("doc_id"), col("n_tokens"),
        (halfUpDiv(col("__sum_micro"), col("n_tokens") * 100) / 10000.0)
          .as("avg_logprob"))
  }

  /** TA16: interpolated bigram LM quality score — one Markov order up from
    * [[unigramLogProb]], the next step toward the CCNet/KenLM perplexity
    * gate: per-doc mean ln of p(w2|w1) = λ·c(w1w2)/c(w1·) +
    * (1−λ)·c(w2)/N, with all counts self-trained on the corpus in two
    * hash-aggs (bigram and unigram tables). Interpolation (λ < 1) keeps
    * unseen-context mass nonzero, so every observed bigram scores finite;
    * word-salad text pairs frequent words in unseen orders and drops to
    * the unigram backoff term, which is exactly the signal the gate keys
    * on. Docs with fewer than two tokens carry no bigram and are absent
    * from the output (they are the length gate's business, not the LM's).
    *
    * Scale shape: the probability lookup is a shuffle join on the bigram
    * (a 100 TB bigram table won't broadcast), then on w1, then on w2;
    * the corpus total is one scalar broadcast. Exactness: λ must be
    * binary-exact (default 0.75); ln snapped to the 6dp grid before the
    * order-independent decimal sum — the ta11 discipline, so the operator
    * carries a full hash oracle.
    */
  def bigramLogProb(docs: DataFrame, textCol: String = "text",
      lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1): $lambda")
    val arr = regexp_extract_all(lower(col(textCol)), lit("[\\p{L}\\p{N}]+"), lit(0))
    val toks = docs.select(col("doc_id"), explode(arr).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    val totalDf = uni.agg(sum(col("cu")).cast("double").as("total"))
    val bg = docs.select(col("doc_id"), arr.as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))"))
        .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bg.join(c12, Seq("w1", "w2")).join(c1, Seq("w1"))
      .join(uni.withColumnRenamed("tok", "w2"), Seq("w2"))
      .crossJoin(broadcast(totalDf))
      .select(col("doc_id"),
        round(log(
          lit(lambda) * (col("c12").cast("double") / col("c1").cast("double")) +
            lit(1 - lambda) * (col("cu").cast("double") / col("total"))), 6)
          .as("lp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        // lp sits on the 6dp grid, so the per-doc sum is an EXACT integer
        // of micro-units; the 4dp mean is then computed by integer
        // HALF-UP division, never by round(double) — round-of-double
        // diverges between engines when the true mean lands on a 4dp
        // half (Spark rounds the exact binary value, DuckDB's float
        // multiply can land on the half; found by pipe_ccnet at sf0.001,
        // doc 180: mean exactly -3.36275)
        sum(round(col("lp") * 1e6).cast("long")).as("__sum_micro"))
      .select(col("doc_id"), col("n_bigrams"),
        (halfUpDiv(col("__sum_micro"), col("n_bigrams") * 100) / 10000.0)
          .as("avg_logprob"))
  }

  /** Exact HALF-UP integer division t/d (d > 0): the sign-aware
    * (2|t| + d) div (2d) identity — both engines' integer division agrees
    * on non-negative operands, so the result is bit-reproducible where
    * round(double) is not.
    */
  private def halfUpDiv(t: Column, d: Column): Column = {
    val mag = (abs(t) * 2 + d).cast("long")
    val den = (d * 2).cast("long")
    // floor division via subtract-remainder: mag - pmod is an exact
    // multiple of den and both fit far under 2^53, so the final double
    // division is exact
    val q = ((mag - pmod(mag, den)) / den).cast("long")
    signum(t).cast("long") * q
  }

  /** TA17: CCNet-style perplexity bucketing (Wenzek et al. 2020 §4.3) —
    * rank each document by its LM score WITHIN its domain/language and cut
    * the ranking into head / middle / tail terciles: head = the
    * best-scoring (lowest-perplexity) third, the slice CCNet keeps or
    * upweights for training. The LM is the self-trained interpolated
    * bigram of [[bigramLogProb]] (higher avg_logprob = lower perplexity);
    * per-domain ranking is the point — an absolute threshold would judge
    * every domain by the head domain's register, CCNet buckets each
    * language against itself.
    *
    * Determinism: avg_logprob is on the 4dp grid and ties break on doc_id,
    * so the tercile assignment is total-order exact and oracle-replayable
    * (`NTILE(3)` is SQL-standard: first `n mod 3` buckets take the extra
    * rows in both engines). Docs with <2 tokens carry no LM evidence and
    * are absent, as in ta16.
    *
    * Scale shape: the LM passes are ta16's hash-aggs + shuffle joins; the
    * bucketing adds ONE window partitioned by domain — a sort per domain,
    * never global. A pathologically hot domain makes that one sorted
    * partition large; at corpus scale swap the exact tercile for CCNet's
    * actual production design — learn the two per-domain cut scores on a
    * [[Sampling.fixedSample]] slice, broadcast the (|domains| × 2) cut
    * table, and bucket in a map-only pass (exact tercile SIZES traded for
    * O(1) memory; bucket boundaries converge as the sample grows).
    */
  def perplexityBuckets(docs: DataFrame, domainCol: Column,
      textCol: String = "text", lambda: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lm = bigramLogProb(docs, textCol, lambda)
    val t = ntile(3).over(Window.partitionBy(col("__dom"))
      .orderBy(col("avg_logprob").desc, col("doc_id")))
    docs.select(col("doc_id"), domainCol.as("__dom"))
      .join(lm, Seq("doc_id"))
      .withColumn("tercile", t)
      .select(col("doc_id"), col("__dom").as("domain"), col("n_bigrams"),
        col("avg_logprob"), col("tercile"),
        when(col("tercile") === 1, "head")
          .when(col("tercile") === 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** TA17b: the SAMPLED-CUT form of [[perplexityBuckets]] — CCNet's
    * actual production design (Wenzek et al. 2020 §4.3 train the cuts on
    * a sample, then stream the corpus through them). The exact form pays
    * one sort per domain; a pathologically hot domain makes that one
    * sorted partition corpus-sized. Here the two per-domain cut scores
    * are learned on a deterministic keyed-hash sample (`md5(seed:id)`
    * unit draw — layout/retry-independent, so the oracle replays the
    * SELECTION too), the (|domains| x 2) cut table broadcasts, and the
    * full corpus buckets in a MAP-ONLY pass: exact tercile SIZES traded
    * for O(sample) sort memory; boundaries converge as the sample grows
    * (ta17b_gate measures the agreement against exact ta17).
    *
    * Cut semantics: within the sample, NTILE(3) over (score DESC,
    * doc_id); cut_head = the lowest score in the sample's head tercile,
    * cut_mid = the lowest in its middle. A doc buckets head iff
    * score >= cut_head, middle iff >= cut_mid, else tail. A domain
    * absent from the sample has no cut evidence — its docs land in tail
    * (size the sample so every domain appears; CCNet learns per-language
    * cuts on substantial slices). Fully deterministic, so unlike most
    * sampled paths this one carries a FULL oracle.
    */
  def perplexityBucketsSampled(docs: DataFrame, domainCol: Column,
      sampleFraction: Double, seed: String = "cuts",
      textCol: String = "text", lambda: Double = 0.75,
      idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(sampleFraction > 0 && sampleFraction <= 1,
      s"sampleFraction must be in (0,1]: $sampleFraction")
    val lm = bigramLogProb(docs, textCol, lambda)
    // scored feeds BOTH the cut learner and the bucket pass; without
    // truncation Catalyst plans the full bigram-LM subtree (explode +
    // three shuffle joins — the linear floor) under each branch, doubling
    // the dominant cost. Materialize once (the pipe_ccnet discipline).
    val scored = Materialize(
      docs.select(col(idCol).as("doc_id"), domainCol.as("__dom"))
        .join(lm, Seq("doc_id")))
    val t = ntile(3).over(Window.partitionBy(col("__dom"))
      .orderBy(col("avg_logprob").desc, col("doc_id")))
    val cuts = scored
      .filter(Sampling.unitHash(col("doc_id"), seed) < lit(sampleFraction))
      .withColumn("__t", t)
      .groupBy(col("__dom"))
      .agg(min(when(col("__t") === 1, col("avg_logprob"))).as("__cut_head"),
        min(when(col("__t") === 2, col("avg_logprob"))).as("__cut_mid"))
    scored.join(broadcast(cuts), Seq("__dom"), "left")
      .select(col("doc_id"), col("__dom").as("domain"), col("n_bigrams"),
        col("avg_logprob"),
        when(col("__cut_head").isNotNull &&
          col("avg_logprob") >= col("__cut_head"), "head")
          .when(col("__cut_mid").isNotNull &&
            col("avg_logprob") >= col("__cut_mid"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** TA10: compression-ratio quality signal — deflate(text).length /
    * utf8(text).length (level 6, the zlib default). Highly repetitive or
    * templated documents compress far below natural prose (~0.3-0.6 for
    * English text; boilerplate and keyword-stuffed spam go much lower),
    * making this the classic cheap "is it real text" discriminator next
    * to the token/stopword gates. Deterministic for a given input (fixed
    * level, no dictionary), so specs pin exact values; there is no SQL
    * deflate, so the driver check is rows-only — the UDF is justified:
    * no Column-native deflate exists.
    */
  def compressionRatio(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val ratioUdf = udf { (text: String) =>
      if (text == null || text.isEmpty) 0.0
      else {
        val bytes = text.getBytes("UTF-8")
        val d = new java.util.zip.Deflater(6)
        d.setInput(bytes); d.finish()
        // only the SIZE matters: drain into a reused chunk so incompressible
        // input (deflate can exceed input length) never overruns a buffer
        val chunk = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(chunk)
        d.end()
        math.rint(n.toDouble / bytes.length * 10000) / 10000
      }
    }
    docs.withColumn("compress_ratio", ratioUdf(col(textCol)))
  }

  def repetitionSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // Materialize lines/tokens as their own projections FIRST: the lambdas
    // below reference the arrays many times, and subexpression elimination
    // does not reach inside higher-order-function lambdas — inline, every
    // element_at re-splits the document (O(n^2) per doc; same pitfall and
    // ~10x measured cost as documented at topNgrams).
    val base = docs.select(col("doc_id"),
      filter(transform(split(t, "\n"), l => trim(l)), l => l =!= lit(""))
        .as("__lines"),
      split(trim(t), "\\s+").as("__toks"))
    val linesArr = col("__lines")
    val dup = base.select(col("doc_id"),
      r4(when(size(linesArr) > 0,
        lit(1.0) - size(array_distinct(linesArr)).cast("double") / size(linesArr))
        .otherwise(0.0)).as("dup_line_frac"))
    val toks = col("__toks")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array())
    val top = base.select(col("doc_id"), explode(bigrams).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(r4(max(col("c")).cast("double") / sum(col("c"))).as("top2gram_frac"))
    dup.join(top, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_line_frac"),
        coalesce(col("top2gram_frac"), lit(0.0)).as("top2gram_frac"))
  }

  /** Top-k word n-grams by corpus frequency with a deterministic tie-break
    * (count desc, gram asc) — the frequent-n-gram/contamination-scan pass
    * of a training-data pipeline. Explode -> hash-aggregate (partial aggs
    * collapse repeats map-side) -> global top-k. The final ORDER BY + LIMIT
    * on the aggregated (already small) gram table is a TakeOrdered, not a
    * full sort of the corpus.
    */
  def topNgrams(docs: DataFrame, n: Int, k: Int,
      textCol: String = "text"): DataFrame = {
    // Tokenize into its OWN projection first: the gram lambda below refers
    // to the array many times (size + n element_ats per element), and
    // subexpression elimination does not reach inside higher-order-function
    // lambdas — with the regex inline, every reference re-tokenized the
    // document per gram element (measured ~10x wall time on the bench
    // corpus). As a materialized attribute it is computed once per row.
    val withToks = docs.select(
      regexp_extract_all(lower(col(textCol)), lit("[\\p{L}\\p{N}]+"), lit(0))
        .as("toks"))
    val toks = col("toks")
    // n-grams via transform over a sliding index range (pure Column, no
    // UDF). The when-guard matters: sequence(1, 0) steps BACKWARD in Spark,
    // so short docs must map to an empty gram array explicitly.
    val grams = when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
    withToks.select(explode(grams).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)
  }

  /** Document fingerprint: 60-bit content hash of the normalized token
    * stream (metricTokens re-joined on single spaces, md5'd, first 15 hex
    * nibbles as a positive long) — stable content identity that ignores
    * whitespace/punctuation differences. Pure Column expression: stays in
    * whole-stage codegen, and md5 makes it bit-identical in DuckDB for an
    * exact SQL oracle (same derivation as the MinHash/SimHash family).
    */
  def fingerprint(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      conv(substring(md5(array_join(
        regexp_extract_all(lower(col(textCol)), lit("[\\p{L}\\p{N}]+"), lit(0)),
        " ")), 1, 15), 16, 10).cast("long").as("fingerprint"))

  /** The Gopher "required words" — function words whose total absence marks
    * non-prose (Rae et al. 2021, appendix A1.1).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule battery (Rae et al. 2021, §A1.1 — the public
    * MassiveText filter set, since reused by RefinedWeb/Dolma/FineWeb):
    * per-document signals plus one boolean per rule and an all-rules
    * `gopher_pass`. Thresholds are the paper's:
    * 50 ≤ words ≤ 100k; 3 ≤ mean word length ≤ 10; symbol-to-word ratio
    * ('#' chars + ellipses in both '…' and ASCII '...' forms) ≤ 0.1;
    * ≤ 30% of lines ending in ellipsis; ≤ 90% of lines
    * starting with a bullet; ≥ 80% of words contain a letter; ≥ 2 of the
    * eight required function words present.
    *
    * Scale shape: pure Column expressions over one scan — whole-stage
    * codegen, no shuffle, filters push down; a 100 TB corpus gates in one
    * map-only pass. Every signal is exactly reproducible in SQL (DuckDB
    * string/list functions), so the whole battery carries a hard oracle.
    */
  def gopherRules(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(trim(t), "\\s+")
    val nWords = tokenCount(t)
    val nonSpace = charCount(regexp_replace(t, "\\s", ""))
    val meanWordLen = when(nWords === 0, 0.0)
      .otherwise(nonSpace.cast("double") / nWords)
    // symbols = '#' chars + ellipses in BOTH forms ('…' and ASCII '...',
    // each three-dot run counted once — the form the paper's rule and its
    // reimplementations actually gate on)
    val nHash = charCount(t) - charCount(regexp_replace(t, "#", ""))
    val nUniEllipsis = charCount(t) - charCount(regexp_replace(t, "…", ""))
    val nAsciiEllipsis =
      ((charCount(t) - charCount(regexp_replace(t, "\\.\\.\\.", ""))) / 3)
        .cast("long")
    val nSymbols = nHash + nUniEllipsis + nAsciiEllipsis
    val symbolRatio = when(nWords === 0, 0.0)
      .otherwise(nSymbols.cast("double") / nWords)
    val lines = split(t, "\n")
    val nLines = size(lines)
    val ellipsisLines = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
    val bulletLines = size(filter(lines, l =>
      Seq("-", "*", "•", "‣", "▪").map(b => ltrim(l).startsWith(b))
        .reduce(_ || _)))
    val ellipsisRatio = when(nLines === 0, 0.0)
      .otherwise(ellipsisLines.cast("double") / nLines)
    val bulletRatio = when(nLines === 0, 0.0)
      .otherwise(bulletLines.cast("double") / nLines)
    val alphaWords = size(filter(toks, w => w.rlike("\\p{L}")))
    val alphaRatio = when(nWords === 0, 0.0)
      .otherwise(alphaWords.cast("double") / nWords)
    val lowerToks = split(lower(trim(t)), "\\s+")
    val stopHits = GopherStopwords
      .map(w => when(array_contains(lowerToks, w), 1).otherwise(0))
      .reduce(_ + _)
    val passWords = nWords >= 50 && nWords <= 100000
    val passWordLen = meanWordLen >= 3.0 && meanWordLen <= 10.0
    val passSymbol = symbolRatio <= 0.1
    val passEllipsis = ellipsisRatio <= 0.3
    val passBullet = bulletRatio <= 0.9
    val passAlpha = alphaRatio >= 0.8
    val passStop = stopHits >= 2
    docs.select(
      col("doc_id"),
      nWords.as("n_words"),
      r4(meanWordLen).as("mean_word_len"),
      r4(symbolRatio).as("symbol_ratio"),
      r4(ellipsisRatio).as("ellipsis_line_ratio"),
      r4(bulletRatio).as("bullet_line_ratio"),
      r4(alphaRatio).as("alpha_word_ratio"),
      stopHits.as("stop_hits"),
      passWords.cast("int").as("pass_words"),
      passWordLen.cast("int").as("pass_word_len"),
      passSymbol.cast("int").as("pass_symbol"),
      passEllipsis.cast("int").as("pass_ellipsis"),
      passBullet.cast("int").as("pass_bullet"),
      passAlpha.cast("int").as("pass_alpha"),
      passStop.cast("int").as("pass_stopwords"),
      (passWords && passWordLen && passSymbol && passEllipsis && passBullet &&
        passAlpha && passStop).cast("int").as("gopher_pass"))
  }

  /** URL extraction: all `http(s)://` URLs in the text plus their distinct
    * registrable hosts, sorted for deterministic output. Pure Column
    * (regexp_extract_all) — scan-speed, exact SQL oracle (RE2 and Java
    * agree on this conservative pattern).
    */
  private val UrlPattern = "https?://[a-z0-9.-]+[a-z0-9](/[^\\s]*)?"
  private val HostPattern = "https?://([a-z0-9.-]+[a-z0-9])"

  def urlSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val urls = regexp_extract_all(lower(col(textCol)), lit(UrlPattern), lit(0))
    val hosts = array_sort(array_distinct(
      transform(urls, u => regexp_extract(u, HostPattern, 1))))
    docs.withColumn("urls", urls)
      .withColumn("hosts", hosts)
      .withColumn("n_urls", size(urls).cast("long"))
  }

  /** Domain-blocklist gate over [[urlSignals]]: a doc is blocked when any
    * of its hosts equals a blocked domain or sits under one
    * (`host = d OR host LIKE '%.d'`). The blocklist rides the Column
    * expression (real-world lists are ~100k entries — at that size swap
    * the expression for a broadcast join against a blocklist table; same
    * semantics, still no corpus shuffle).
    */
  def domainBlocked(hosts: Column, blocked: Seq[String]): Column =
    if (blocked.isEmpty) lit(false)
    else exists(hosts, h =>
      blocked.map(d => h === lit(d) || h.endsWith(s".$d")).reduce(_ || _))

  /** TA18: multinomial Naive Bayes domain classifier, self-trained on the
    * corpus — the fastText-style linear classifier every large pipeline
    * runs for domain tagging / quality filtering (CCNet §4.2 trains
    * exactly this family against a curated seed; DSIR-style mixing needs
    * the same per-doc domain posterior), in its one-pass aggregable
    * parameterization: log-count ratios instead of SGD, so training is
    * two hash-aggs and scoring is a broadcast join.
    *
    * Model: classes from `classCol`; features are the ta11/ta16 token
    * convention (`[\p{L}\p{N}]+` on lowercased text) restricted to the
    * top-`vocabSize` corpus tokens (count desc, token asc — a total
    * order, so the vocabulary is layout-independent). Laplace-smoothed:
    * lp(t|c) = ln((n_tc + 1) / (n_c + V)), prior ln(d_c / N). Per-doc
    * class score = prior + Σ n_t·lp(t|c); predicted class = argmax,
    * ties to the lexicographically first class.
    *
    * Exactness: every log is snapped to the 6dp grid and converted to
    * integer micro-units BEFORE the per-doc sum (the ta11/ta16
    * discipline), so scores are exact integers — summation order cannot
    * flip an argmax and the operator carries a full hash oracle.
    *
    * Scale shape: the vocabulary is a TakeOrdered top-V (V rows per
    * partition merge, never a global sort); token-class counts
    * partial-aggregate to ≤ V·C rows; the model (V·C) and priors (C)
    * broadcast; scoring joins the per-doc token counts to the broadcast
    * model and hash-aggs per (doc, class) — the corpus is never shuffled
    * by anything wider than its own token stream, and nothing grows with
    * corpus size except the two count aggregates.
    */
  def nbDomainClassifier(docs: DataFrame, classCol: Column,
      textCol: String = "text", vocabSize: Int = 512): DataFrame = {
    val (model, priors) = nbModelTables(docs, classCol, textCol, vocabSize)
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col(textCol)),
        lit("[\\p{L}\\p{N}]+"), lit(0))).as("tok"))
    val dtok = toks.join(broadcast(model.select("tok").distinct()), Seq("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("dn"))
    val contrib = dtok.join(broadcast(model), Seq("tok"))
      .groupBy(col("doc_id"), col("cls"))
      .agg(sum(col("dn") * col("lpm")).as("s"))
    docs.select(col("doc_id"), classCol.as("source"))
      .crossJoin(broadcast(priors))
      .join(contrib, Seq("doc_id", "cls"), "left").na.fill(0L, Seq("s"))
      .select(col("doc_id"), col("source"), col("cls"),
        (col("pm") + col("s")).as("sm"))
      // argmax with class-ascending tie-break: lexicographic min over
      // (-score, class) — exact integers, so no float tie ambiguity
      .groupBy(col("doc_id"), col("source"))
      .agg(min(struct((-col("sm")).as("ns"), col("cls"))).as("b"))
      .select(col("doc_id"), col("source"),
        col("b.cls").as("pred_source"),
        (-col("b.ns") / 1e6).as("score"))
  }

  /** The NB model as two tables — (cls, tok, lpm) smoothed log-prob
    * micro-nats over the C×V grid and (cls, pm) priors — shared by the
    * batch classifier and the collected serving-side model so the two
    * paths cannot drift.
    */
  private def nbModelTables(docs: DataFrame, classCol: Column,
      textCol: String, vocabSize: Int): (DataFrame, DataFrame) = {
    require(vocabSize >= 1, s"vocabSize must be >= 1: $vocabSize")
    val toks = docs.select(col("doc_id"), classCol.as("cls"),
      explode(regexp_extract_all(lower(col(textCol)),
        lit("[\\p{L}\\p{N}]+"), lit(0))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .select("tok")
    val vtoks = toks.join(broadcast(vocab), Seq("tok"))
    val classes = docs.groupBy(classCol.as("cls"))
      .agg(count(lit(1)).as("dc"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("nd"))
    val vSize = vocab.agg(count(lit(1)).as("v"))
    val ctok = vtoks.groupBy(col("cls"), col("tok")).agg(count(lit(1)).as("n"))
    val tc = ctok.groupBy(col("cls")).agg(sum(col("n")).as("tc"))
    // smoothing demands a logp for every (class, vocab token) pair, seen
    // or not — build the C×V grid and left-join the observed counts
    val model = classes.select("cls").crossJoin(broadcast(vocab))
      .join(ctok, Seq("cls", "tok"), "left").na.fill(0L, Seq("n"))
      .join(tc, Seq("cls"))
      .crossJoin(broadcast(vSize))
      .select(col("cls"), col("tok"),
        round(round(log((col("n") + 1).cast("double") /
          (col("tc") + col("v")).cast("double")), 6) * 1e6)
          .cast("long").as("lpm"))
    val priors = classes.crossJoin(broadcast(nDocs))
      .select(col("cls"),
        round(round(log(col("dc").cast("double") / col("nd")), 6) * 1e6)
          .cast("long").as("pm"))
    (model, priors)
  }

  /** Collected NB model for row-at-a-time scoring — the serving/stream
    * shape: the model IS metadata (≤ C×V ≈ 10k rows), so it collects to
    * the driver once and ships to executors inside the scoring UDF's
    * closure; scoring is then a stateless projection that runs unchanged
    * on a Structured Streaming DataFrame. Trained by the same
    * [[nbModelTables]] as the batch classifier, so per-row scores are
    * INTEGER-IDENTICAL to [[nbDomainClassifier]]'s aggregate form (the
    * stream_classify query holds this to ta18's oracle verbatim).
    *
    * `maxModelRows` pins the collect contract (the ivfPqSearch
    * discipline).
    */
  final case class NbModel(lpm: Map[String, Map[String, Long]],
      priors: Map[String, Long]) extends Serializable {
    /** (predicted class, score micro-nats); ties to the lexicographically
      * first class — the batch argmax's total order.
      *
      * Tokenization is Locale.ROOT lowercase + the batch regex: the batch
      * path lowercases with Spark's `lower()` (Unicode simple mapping),
      * and a default-locale `toLowerCase` would diverge on a tr/az/lt JVM
      * ("TITLE" -> "tıtle"), silently breaking the verbatim-oracle parity
      * stream_classify promises.
      */
    def score(text: String): (String, Long) = {
      val counts = scala.collection.mutable.HashMap.empty[String, Int]
      (if (text == null) "" else text).toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty)
        .foreach(t => counts.update(t, counts.getOrElse(t, 0) + 1))
      var bestCls: String = null
      var bestSm = Long.MinValue
      priors.toSeq.sortBy(_._1).foreach { case (cls, pm) =>
        // empty-vocabulary model (no tokens anywhere in the training
        // corpus): every class scores prior-only, like the batch path
        val m = lpm.getOrElse(cls, Map.empty[String, Long])
        var s = 0L
        counts.foreach { case (tok, dn) =>
          m.get(tok).foreach(l => s += dn.toLong * l)
        }
        val sm = pm + s
        if (sm > bestSm) { bestSm = sm; bestCls = cls }
      }
      (bestCls, bestSm)
    }
  }

  /** TA15b — count-min-sketch heavy hitters, the BOUNDED-STATE form of
    * [[heavyHitters]] (Cormode & Muthukrishnan 2005): `depth` hash rows ×
    * `width` counters is the ENTIRE aggregation state (depth·width cells,
    * partial-aggregated map-side), regardless of vocabulary — the
    * difference between a frequency pass that fits executor memory at
    * 100 TB and one that shuffles every distinct token. Estimates carry
    * the classic one-sided guarantee: est ≥ exact always (counters only
    * ever over-count on collisions), est ≤ exact + e·N/width w.h.p. — and
    * the report emits BOTH next to each other, so the guarantee is
    * hash-checked, not asserted.
    *
    * Hashes are the md5-60-bit convention with per-row salts ("cms0:" …),
    * so sketch build AND probe replay in SQL. The probe set here is the
    * corpus's candidate tokens with exact count ≥ `minExact` (a report
    * over the heavy tail); a production monitor probes its fixed keyword
    * list the same way — the sketch answers any key without having kept
    * per-key state.
    */
  def heavyHittersCms(docs: DataFrame, depth: Int = 4, width: Int = 256,
      minExact: Long = 100, textCol: String = "text"): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 16, s"cms $depth x $width")
    val toks = docs.select(
      explode(regexp_extract_all(lower(col(textCol)),
        lit("[\\p{L}\\p{N}]+"), lit(0))).as("tok"))
    def cell(r: Int, c: Column): Column =
      pmod(conv(substring(md5(concat(lit(s"cms$r:"), c)), 1, 15), 16, 10)
        .cast("long"), lit(width.toLong))
    // sketch: depth × width counters — one explode to (row, cell) pairs,
    // one hash-agg; THE state bound is this table's size
    val sketch = toks.select(posexplode(array(
        (0 until depth).map(r => cell(r, col("tok"))): _*))
        .as(Seq("r", "cell")))
      .groupBy(col("r"), col("cell")).agg(count(lit(1)).as("c"))
    // probe: exact counts define the report's candidate set; each token
    // joins its depth counters and takes the min
    val exact = toks.groupBy(col("tok")).agg(count(lit(1)).as("exact"))
      .filter(col("exact") >= minExact)
    val probes = exact.select(col("tok"), col("exact"),
      posexplode(array((0 until depth).map(r => cell(r, col("tok"))): _*))
        .as(Seq("r", "cell")))
    probes.join(sketch, Seq("r", "cell"))
      .groupBy(col("tok"), col("exact"))
      .agg(min(col("c")).as("est"))
      .select(col("tok").as("token"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overcount"))
  }

  /** TA20: per-shard token-distribution drift against the whole corpus —
    * the batch-ingest twin of the streamed index's centroid-drift monitor
    * (streaming/IndexDrift): a corrupted, truncated, or quality-shifted
    * shard shows up as a diverging unigram profile long before any
    * downstream model does, and a 100 TB ingest wants that check as one
    * aggregation pass, not a manual eyeball.
    *
    * Per shard: Jensen–Shannon divergence between the shard's hashed-
    * unigram distribution P and the corpus-wide distribution Q (both over
    * `buckets` md5 buckets — BOUNDED model state regardless of vocabulary,
    * the cur2/ta16 hashing convention), plus the total-variation distance
    * (the IndexDrift occupancy metric), plus a threshold flag. Logs snap
    * to the 6dp micro-nat grid before any multiplication (the ta16/ta18
    * discipline) and every distributed sum is decimal-exact, so the whole
    * report carries a full hash oracle; the snapped JS differs from the
    * textbook value by < 1e-6 — far under any useful drift threshold.
    *
    * Scale shape: one token scan → one (shard × bucket) hash-agg (≤
    * shards·buckets rows, partial-aggregated map-side), the corpus profile
    * derived FROM that agg (no second scan), and a broadcast of the
    * ≤buckets-row profile onto the shards×buckets grid. Nothing grows
    * with corpus size except the one count aggregate.
    */
  def shardDrift(docs: DataFrame, shardCol: String = "source",
      textCol: String = "text", buckets: Int = 64,
      jsThreshold: Double = 0.01): DataFrame = {
    require(buckets >= 2 && jsThreshold > 0)
    import graft.functions.exactSum
    val feat = docs.select(col(shardCol).as("shard"),
      explode(regexp_extract_all(lower(col(textCol)),
        lit("[\\p{L}\\p{N}]+"), lit(0))).as("tok"))
      .select(col("shard"),
        pmod(conv(substring(md5(concat(lit("b:"), col("tok"))), 1, 15),
          16, 10).cast("long"), lit(buckets.toLong)).as("bucket"))
    val sc = feat.groupBy(col("shard"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    val nDocs = docs.groupBy(col(shardCol).as("shard"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = sc.groupBy(col("shard")).agg(sum(col("c")).as("n_s"))
    val cb = sc.groupBy(col("bucket")).agg(sum(col("c")).as("cq"))
    val nTot = cb.agg(sum(col("cq")).as("n_t"))
    // shards × buckets grid: every corpus-present bucket for every shard,
    // shard-absent cells at c = 0 (they still carry Q-side JS mass)
    val grid = tot.crossJoin(broadcast(cb)).crossJoin(broadcast(nTot))
      .join(sc, Seq("shard", "bucket"), "left").na.fill(0L, Seq("c"))
    val p = col("c").cast("double") / col("n_s").cast("double")
    val q = col("cq").cast("double") / col("n_t").cast("double")
    val m = (p + q) / 2.0
    def snap6(x: Column): Column = round(round(x, 6) * 1e6).cast("long")
    val lnP = when(col("c") > 0, snap6(log(p / m))).otherwise(0L)
    val lnQ = snap6(log(q / m)) // grid rows have cq > 0 by construction
    val contrib =
      (p * (lnP.cast("double") / 1e6)) * 0.5 +
        (q * (lnQ.cast("double") / 1e6)) * 0.5
    val tv = abs(p - q) * 0.5
    val metrics = grid.groupBy(col("shard"))
      .agg(first(col("n_s")).as("n_tokens"),
        round(exactSum(contrib), 6).as("js"),
        round(exactSum(tv), 6).as("tv"))
    // base the report on nDocs, not the token counts: a shard whose docs
    // are ALL token-less has no distribution rows at all, and an inner
    // join would silently drop it from the report — the most-degraded
    // ingest state (an empty/corrupt shard) must surface, not vanish.
    // Such a shard reports null js/tv, zero tokens, and drifted = 1.
    nDocs.join(metrics, Seq("shard"), "left")
      .na.fill(0L, Seq("n_tokens"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("js"), col("tv"),
        (col("n_tokens") === 0L || col("js") > jsThreshold)
          .cast("int").as("drifted"))
  }

  def nbTrainCollect(docs: DataFrame, classCol: Column,
      textCol: String = "text", vocabSize: Int = 512,
      maxModelRows: Long = 1000000L): NbModel = {
    val (model, priors) = nbModelTables(docs, classCol, textCol, vocabSize)
    val mRows = model.limit(maxModelRows.toInt + 1)
      .select("cls", "tok", "lpm")
      .collect()
    require(mRows.length <= maxModelRows,
      s"NB model exceeds $maxModelRows rows — raise vocabSize discipline " +
        "or maxModelRows; the collected-model path is for metadata-scale models")
    val lpm = mRows.groupBy(_.getString(0)).map { case (cls, rows) =>
      cls -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
    }
    val ps = priors.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    NbModel(lpm, ps)
  }
}
