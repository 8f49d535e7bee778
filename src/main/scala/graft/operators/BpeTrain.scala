package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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
  *  - Per merge round: one hash-aggregate over the vocab table for pair
  *    counts, a 1-row argmax collect (driver sees metadata only — the
  *    winning pair), and a map-only fold that applies the merge. The vocab
  *    table is Materialized each round (the PageRank/dd7 lineage rule) so
  *    R rounds never replan an R-deep lambda stack.
  *  - The merge application is a pure-Column aggregate() fold (no UDF):
  *    a single left-to-right pass with a pending-symbol accumulator —
  *    exactly the skip-after-merge greedy semantics of the sequential
  *    algorithm, so distributed output is bit-identical to
  *    [[graft.core.Bpe.train]] (BpeTrainSpec pins the equivalence).
  */
object BpeTrain {

  /** One greedy left-to-right merge pass over a symbol array: adjacent
    * (a, b) occurrences collapse to a+b, scanning resumes AFTER the merged
    * token (so "a a a" with pair (a,a) yields ["aa","a"], not ["aa","aa"]).
    * Pure Column fold — whole-stage codegen, no UDF.
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
    */
  def trainMerges(docs: DataFrame, numMerges: Int,
      pretokenRegex: String = "[\\p{L}\\p{N}]+", textCol: String = "text",
      minPairCount: Long = 2L): DataFrame =
    mergesFromStates(docs.sparkSession,
      Materialize(wordStates(docs, pretokenRegex, textCol)),
      numMerges, minPairCount)

  /** The merge loop over an already-materialized word-state table (shared
    * by [[trainMerges]] and [[vocabTable]] so the corpus-sized wordcount
    * scan happens once). Consumes (and unpersists) `states`.
    */
  private def mergesFromStates(spark: SparkSession, states: DataFrame,
      numMerges: Int, minPairCount: Long): DataFrame = {
    require(numMerges >= 1 && minPairCount >= 1,
      s"bad params: numMerges=$numMerges minPairCount=$minPairCount")
    var words = states
    val learned = Vector.newBuilder[(Int, String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val best = words
        .select(col("c"), explode(when(size(col("toks")) >= 2,
          expr("transform(sequence(0, size(toks)-2)," +
            " i -> struct(toks[i] as a, toks[i+1] as b))"))
          .otherwise(array().cast("array<struct<a:string,b:string>>")))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      best match {
        case Array(row) if row.getLong(2) >= minPairCount =>
          val (a, b, cnt) = (row.getString(0), row.getString(1), row.getLong(2))
          learned += ((k + 1, a, b, cnt))
          val next = words.withColumn("toks", applyMerge(col("toks"), a, b))
          val prev = words
          words = Materialize(next)
          prev.unpersist()
          k += 1
        case _ => exhausted = true
      }
    }
    words.unpersist()
    val schema = StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        learned.result().map { case (r, a, b, c) => Row(r, a, b, c) }, 1),
      schema)
  }

  /** The learned tokenizer's VOCABULARY table: corpus base symbols
    * (sorted) get ids 0..B-1, then each merge product gets the next id in
    * learn order — the (id, token) map a trained tokenizer ships with
    * (HF tokenizer.json `model.vocab` shape). `kind` distinguishes base
    * symbols from merge products. One distinct-aggregate over the corpus
    * chars plus the (tiny) merge table.
    */
  def vocabTable(docs: DataFrame, numMerges: Int,
      pretokenRegex: String = "[\\p{L}\\p{N}]+", textCol: String = "text",
      minPairCount: Long = 2L): DataFrame = {
    val spark = docs.sparkSession
    val states = Materialize(wordStates(docs, pretokenRegex, textCol))
    // base symbols from the SAME materialized states the loop consumes —
    // alphabet-sized, so collect + driver id assignment, no second corpus
    // scan and no window
    val baseTokens = states.select(explode(col("toks")).as("token"))
      .distinct().collect().map(_.getString(0)).sorted
    val merges = mergesFromStates(spark, states, numMerges, minPairCount)
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
