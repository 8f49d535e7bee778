package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE tokenizer TRAINING — vocabulary induction over a corpus
  * as a Spark job (the 100 TB counterpart of [[graft.core.Bpe.train]],
  * which is the single-node reference implementation; both follow Sennrich
  * et al. 2016).
  *
  * Reference context: the reference pipeline loads a pretrained HF
  * tokenizer (utils/calculate_tokens.py:7-19) — training one is the
  * upstream step a data-pipeline engine needs when no published tokenizer
  * fits the corpus.
  *
  * Scale shape:
  *  - ONE corpus-sized shuffle total: the initial pretoken word-count
  *    (classic wordcount — hash partial aggregation on both sides).
  *    Everything after operates on the VOCABULARY table (|distinct words|
  *    rows — orders of magnitude smaller than the corpus, independent of
  *    corpus row count).
  *  - Merge rounds are BATCHED: each round ranks the current pair table
  *    once and accepts the longest prefix of the ranking that provably
  *    equals running the argmax one merge at a time (see
  *    [[disjointPrefix]] for the exact commutation argument), then applies
  *    the whole batch in a single map-only pass over the vocab table. A
  *    realistic vocab (32k-50k merges) therefore costs
  *    ceil(V / batch) driver-synchronized rounds instead of V — with the
  *    default cap of 256 accepted merges per round that is hundreds of
  *    rounds, not tens of thousands, and each round is a constant number
  *    of jobs over the vocab-sized table. `maxMergesPerRound = 1` recovers
  *    the strictly sequential loop (the parity baseline BpeTrainSpec
  *    pins the batched path against).
  *  - The vocab table is Materialized each round (the PageRank/dd7
  *    lineage rule) so R rounds never replan an R-deep lambda stack.
  *  - Single-merge application is a pure-Column aggregate() fold (no
  *    UDF); BATCH application fuses all accepted merges into one
  *    left-to-right pass (symbol-disjointness makes the fused pass
  *    bit-identical to composing the per-merge passes — a k-deep chain of
  *    interpreted aggregate() lambdas would cost k passes per row, the
  *    fused scan costs one). Output is bit-identical to
  *    [[graft.core.Bpe.train]] (BpeTrainSpec pins the equivalence, and
  *    the bt1/bt2/bt3 DuckDB oracles re-learn the table sequentially).
  */
object BpeTrain {

  /** One greedy left-to-right merge pass over a symbol array: adjacent
    * (a, b) occurrences collapse to a+b, scanning resumes AFTER the merged
    * token (so "a a a" with pair (a,a) yields ["aa","a"], not ["aa","aa"]).
    * Pure Column fold — no UDF.
    */
  def applyMerge(toks: Column, a: String, b: String): Column = {
    val init = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    aggregate(toks, init,
      (acc, s) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend.isNull, struct(out.as("out"), s.as("pend")))
          .when(pend === lit(a) && s === lit(b),
            struct(concat(out, array(lit(a + b))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"), s.as("pend")))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))
  }

  /** The fused form of composing [[applyMerge]] once per batch member:
    * ONE greedy left-to-right pass matching every pair in the batch.
    * Valid only for a symbol-disjoint batch (no lhs/rhs/product string
    * shared between members — [[disjointPrefix]] guarantees it), where a
    * merge of one pair can neither create nor consume an adjacency of
    * another, so pass composition and the fused pass produce the same
    * array. Disjointness also means each lhs maps to exactly one (rhs,
    * product). Scala UDF deliberately: aggregate() lambdas evaluate
    * interpreted, and a batch of k merges as chained folds is k passes
    * per row plus a k-deep analyzed plan; the fused scan is one pass.
    */
  private def applyMergeBatch(merges: Seq[(String, String)]): UserDefinedFunction = {
    val byLhs: Map[String, (String, String)] =
      merges.map { case (a, b) => a -> (b, a + b) }.toMap
    udf { (toks: Seq[String]) =>
      if (toks == null) null
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var pend: String = null
        toks.foreach { s =>
          if (pend == null) pend = s
          else byLhs.get(pend) match {
            case Some((rhs, prod)) if s == rhs =>
              out += prod
              pend = null
            case _ =>
              out += pend
              pend = s
          }
        }
        if (pend != null) out += pend
        out.toSeq
      }
    }
  }

  /** The weighted word-state table the merge loop iterates on:
    * (w, c, toks) — distinct pretokens with corpus counts, split into
    * base (character) symbols.
    */
  def wordStates(docs: DataFrame, pretokenRegex: String,
      textCol: String): DataFrame =
    docs.select(explode(
        regexp_extract_all(col(textCol), lit(pretokenRegex), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .withColumn("toks",
        expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))"))

  /** Learn `numMerges` BPE merges from the corpus. Returns the merge table
    * as a DataFrame (rank, lhs, rhs, pair_count) in learn order — rank is
    * 1-based; ties in pair count break on the lexicographically smallest
    * (lhs, rhs), making training fully deterministic. Stops early when the
    * best pair's count falls under `minPairCount` (or no pairs remain).
    * `maxMergesPerRound` caps how many merges one batched round may learn
    * (1 = strictly sequential; the output is identical at any value — the
    * cap only trades driver round-trips against per-round work).
    */
  def trainMerges(docs: DataFrame, numMerges: Int,
      pretokenRegex: String = "[\\p{L}\\p{N}]+", textCol: String = "text",
      minPairCount: Long = 2L, maxMergesPerRound: Int = 256): DataFrame =
    trainMergesWithRounds(docs, numMerges, pretokenRegex, textCol,
      minPairCount, maxMergesPerRound)._1

  /** [[trainMerges]] plus the number of driver-synchronized rounds the
    * batched loop actually ran — the scale-probe observable (rounds, not
    * merges, are what a 100 TB run pays driver latency for).
    */
  private[graft] def trainMergesWithRounds(docs: DataFrame, numMerges: Int,
      pretokenRegex: String = "[\\p{L}\\p{N}]+", textCol: String = "text",
      minPairCount: Long = 2L,
      maxMergesPerRound: Int = 256): (DataFrame, Int) =
    mergesFromStates(docs.sparkSession,
      Materialize(wordStates(docs, pretokenRegex, textCol)),
      numMerges, minPairCount, maxMergesPerRound)

  /** BT1b: the SAMPLED-corpus trainer — the 100 TB operating point for a
    * real vocab. The batched distributed loop ([[trainMerges]]) still pays
    * ~ceil(V / batch) driver-synchronized rounds (a 50k vocab ≈ 12k
    * sequential rounds at the measured ~4x natural-text batch factor —
    * SCALE.md); production tokenizers avoid that by training on a SAMPLE:
    * one deterministic keyed-hash filter (`md5(seed:id)`-unit draw, the
    * sp2/mx1 primitive — layout- and retry-independent), ONE distributed
    * wordcount ([[wordStates]] — the only corpus-sized pass BPE training
    * needs), then the sequential loop runs on the DRIVER over the
    * collected word-frequency table (vocab-sized: distinct pretokens, not
    * corpus rows — GPT-2's byte-level BPE trained this way on a sampled
    * 40 GB corpus whose distinct-word table fits in memory). Zero
    * distributed rounds; V no longer multiplies driver latency.
    *
    * `maxDistinctWords` is the collect tripwire (the aj2 cell-cap
    * discipline): the driver-side table is bounded by construction, and
    * the job fails loudly — naming the knobs — rather than letting a
    * degenerate pretoken regex (e.g. one matching whole lines) grow it
    * corpus-sized. Merge semantics are [[graft.core.Bpe]]'s sequential
    * loop verbatim, so `sampleFraction >= 1` is bit-identical to
    * [[trainMerges]] (BpeTrainSpec pins it) and the bt1b oracle re-learns
    * from the same sampled subset in SQL.
    */
  def trainMergesSampled(docs: DataFrame, numMerges: Int,
      sampleFraction: Double, seed: String = "bpe",
      pretokenRegex: String = "[\\p{L}\\p{N}]+", textCol: String = "text",
      idCol: String = "doc_id", minPairCount: Long = 2L,
      maxDistinctWords: Int = 10000000): DataFrame = {
    require(sampleFraction > 0,
      s"sampleFraction must be > 0: $sampleFraction")
    val spark = docs.sparkSession
    val sampled =
      if (sampleFraction >= 1.0) docs
      else docs.filter(
        Sampling.unitHash(col(idCol), seed) < lit(sampleFraction))
    val rows = wordStates(sampled, pretokenRegex, textCol)
      .select(col("toks"), col("c"))
      .limit(maxDistinctWords + 1).collect()
    require(rows.length <= maxDistinctWords,
      s"trainMergesSampled: > $maxDistinctWords distinct pretokens in the " +
        s"sample — lower sampleFraction or check pretokenRegex " +
        s"('$pretokenRegex'); raise maxDistinctWords only with driver " +
        "memory to match")
    val words = rows.iterator
      .map(r => (r.getSeq[String](0).toVector, r.getLong(1))).toVector
    val learned = graft.core.Bpe
      .learnMergesWeighted(words, numMerges, minPairCount)
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.zipWithIndex.map { case ((a, b, c), i) =>
          Row(i + 1, a, b, c) }, 1),
      schema)
  }

  /** The longest prefix of the round's pair ranking that is provably
    * identical to learning the merges one argmax at a time. A candidate
    * (a, b, cnt) after already-accepted merges is safe when:
    *
    *  1. DISJOINT — a, b, and the product a+b collide with no accepted
    *     lhs/rhs/product (string identity). Then no accepted merge can
    *     create or consume an (a, b) adjacency, so cnt is still the pair's
    *     exact count when the sequential loop would reach it, and applying
    *     the batch in one fused pass equals applying it merge by merge.
    *  2. STILL THE ARGMAX — every pair an accepted merge (ai, bi) CREATES
    *     has the shape (x, ai+bi) / (ai+bi, x) / (ai+bi, ai+bi), and each
    *     of its occurrences was an (x, ai) / (bi, x) / (bi, ai) adjacency
    *     in the round-start state — so its count is bounded by
    *     B_i = max(max_x cnt(x, ai), max_x cnt(bi, x)), computed EXACTLY
    *     from the materialized pair table. If cnt > max accepted B_i
    *     (strictly — ties could lose on the lexicographic tiebreak to a
    *     created pair we cannot rank without materializing it), no created
    *     pair can outrank the candidate; pre-existing pairs only keep or
    *     lose count, and ranked-after pairs that keep their count still
    *     lose the original tiebreak. Hence the sequential argmax at that
    *     step is exactly this candidate.
    *
    * The first candidate is the sequential argmax by construction, so a
    * round always learns at least one merge and the batched loop can never
    * diverge from — only catch up to — the sequential one. In the long
    * tail (many pairs tied at low counts) the strict bound collapses the
    * batch toward 1; that serialization is the exact price of
    * bit-equality, and it happens where rounds are cheapest.
    */
  private def disjointPrefix(pairs: DataFrame,
      ranked: Array[(String, String, Long)], limit: Int,
      minPairCount: Long): Vector[(String, String, Long)] = {
    val cands = ranked.take(limit)
    val aSyms = cands.map(_._1).distinct.toSeq
    val bSyms = cands.map(_._2).distinct.toSeq
    // exact per-symbol interference maxima over the FULL pair table (two
    // filtered aggs on the already-materialized pairs — symbol-count-sized
    // results, metadata-scale collects)
    val rightMax: Map[String, Long] = pairs
      .filter(col("b").isin(aSyms: _*))
      .groupBy(col("b")).agg(max(col("cnt")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val leftMax: Map[String, Long] = pairs
      .filter(col("a").isin(bSyms: _*))
      .groupBy(col("a")).agg(max(col("cnt")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val acc = Vector.newBuilder[(String, String, Long)]
    var used = Set.empty[String]
    var maxBound = -1L
    var n = 0
    var stop = false
    cands.foreach { case (a, b, cnt) =>
      if (!stop) {
        val ok = n == 0 ||
          (cnt >= minPairCount && cnt > maxBound &&
            !used(a) && !used(b) && !used(a + b))
        if (ok) {
          acc += ((a, b, cnt))
          used = used + a + b + (a + b)
          maxBound = math.max(maxBound,
            math.max(rightMax.getOrElse(a, 0L), leftMax.getOrElse(b, 0L)))
          n += 1
        } else stop = true
      }
    }
    acc.result()
  }

  /** The batched merge loop over an already-materialized word-state table
    * (shared by [[trainMerges]] and [[vocabTable]] so the corpus-sized
    * wordcount scan happens once). Per round: one pair-count aggregate
    * (materialized), a top-M collect plus two symbol-max collects (all
    * metadata-scale), then one fused map-only pass applying the accepted
    * batch. Consumes (and unpersists) `states`.
    */
  private def mergesFromStates(spark: SparkSession, states: DataFrame,
      numMerges: Int, minPairCount: Long,
      maxMergesPerRound: Int): (DataFrame, Int) = {
    require(numMerges >= 1 && minPairCount >= 1 && maxMergesPerRound >= 1,
      s"bad params: numMerges=$numMerges minPairCount=$minPairCount" +
        s" maxMergesPerRound=$maxMergesPerRound")
    var words = states
    val learned = Vector.newBuilder[(Int, String, String, Long)]
    var k = 0
    var rounds = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      rounds += 1
      val pairs = Materialize(words
        .select(col("c"), explode(when(size(col("toks")) >= 2,
          expr("transform(sequence(0, size(toks)-2)," +
            " i -> struct(toks[i] as a, toks[i+1] as b))"))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("c")).as("cnt")))
      val roundCap = math.min(maxMergesPerRound, numMerges - k)
      val ranked = pairs
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(roundCap).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (ranked.isEmpty || ranked.head._3 < minPairCount) exhausted = true
      else {
        val batch = disjointPrefix(pairs, ranked, roundCap, minPairCount)
        batch.foreach { case (a, b, cnt) =>
          k += 1
          learned += ((k, a, b, cnt))
        }
        val next =
          if (batch.size == 1)
            words.withColumn("toks",
              applyMerge(col("toks"), batch.head._1, batch.head._2))
          else
            words.withColumn("toks",
              applyMergeBatch(batch.map(m => (m._1, m._2)))(col("toks")))
        val prev = words
        words = Materialize(next)
        prev.unpersist()
      }
      pairs.unpersist()
    }
    words.unpersist()
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    (spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.result().map { case (r, a, b, c) => Row(r, a, b, c) }, 1),
      schema), rounds)
  }

  /** Code-point string order (== UTF-8 byte order, == DuckDB's default
    * collation) — Java's natural String order is UTF-16 CODE-UNIT order,
    * which ranks supplementary-plane letters (surrogate pairs, 0xD800+)
    * BEFORE U+E000..U+FFFF; code-point order ranks them after. Base-symbol
    * ids must match the bt3 oracle's ROW_NUMBER() OVER (ORDER BY token) on
    * any corpus, not just ASCII.
    */
  private def codePointLt(x: String, y: String): Boolean = {
    val xs = x.codePoints().toArray
    val ys = y.codePoints().toArray
    var i = 0
    while (i < xs.length && i < ys.length) {
      if (xs(i) != ys(i)) return xs(i) < ys(i)
      i += 1
    }
    xs.length < ys.length
  }

  /** The learned tokenizer's VOCABULARY table: corpus base symbols
    * (sorted by code point) get ids 0..B-1, then each merge product gets
    * the next id in learn order — the (id, token) map a trained tokenizer
    * ships with (HF tokenizer.json `model.vocab` shape). `kind`
    * distinguishes base symbols from merge products. One distinct-aggregate
    * over the corpus chars plus the (tiny) merge table.
    */
  def vocabTable(docs: DataFrame, numMerges: Int,
      pretokenRegex: String = "[\\p{L}\\p{N}]+", textCol: String = "text",
      minPairCount: Long = 2L, maxMergesPerRound: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    val states = Materialize(wordStates(docs, pretokenRegex, textCol))
    // base symbols from the SAME materialized states the loop consumes —
    // alphabet-sized, so collect + driver id assignment, no second corpus
    // scan and no window
    val baseTokens = states.select(explode(col("toks")).as("token"))
      .distinct().collect().map(_.getString(0)).sortWith(codePointLt)
    val merges = mergesFromStates(spark, states, numMerges, minPairCount,
      maxMergesPerRound)._1
    val nBase = baseTokens.length.toLong
    import spark.implicits._
    val baseIds = baseTokens.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "base") }.toSeq
      .toDF("token_id", "token", "kind")
    val mergeIds = merges.select(
      (col("rank").cast("long") - 1 + nBase).as("token_id"),
      concat(col("lhs"), col("rhs")).as("token"),
      lit("merge").as("kind"))
    baseIds.unionByName(mergeIds)
  }
}
