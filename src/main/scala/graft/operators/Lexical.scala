package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{exactSum, r4}

/** Lexical (term-based) similarity and retrieval — the non-embedding
  * counterpart to [[Similarity]]'s vector stack: TF-IDF cosine all-pairs
  * (sparse-vector near-dup detection that needs no embedding model) and
  * BM25 top-k retrieval (the classic keyword-search ranking). Both are
  * pure-Column plans over one shared tokenization, and both are held to
  * exact DuckDB oracles: every floating step either is a single IEEE
  * operation on deterministic inputs or goes through the round-then-
  * decimal-sum discipline (`exactSum` on a 6dp grid), so aggregation
  * order can never move a result.
  *
  * Scale shape: term frequencies and document frequencies are hash-aggs
  * with map-side partials; the vocabulary at 100 TB does NOT broadcast,
  * so per-term lookups are shuffle joins on the token (the ta11 rule).
  * Pair generation / retrieval joins are keyed on the token; their cost is
  * sum over terms of df² (pairs) or qf·df (retrieval), which the
  * document-frequency cap bounds — pruning ubiquitous terms is both the
  * standard relevance move (stopwords carry no signal; their idf ≈ 0
  * anyway) and the thing that keeps the join linear-ish at corpus scale.
  *
  * Reference seed: the reference's similarity stack is embedding-only
  * (semantic_similarity, SURVEY §2.9 M3); this adds the lexical layer a
  * corpus-scale curation/retrieval pipeline needs when no encoder is in
  * the loop.
  */
object Lexical {

  /** Shared tokenization: the ta11/unigram convention — lowercase,
    * letter/digit runs (`[\p{L}\p{N}]+`), one row per occurrence.
    */
  private def toks(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol),
      explode(regexp_extract_all(lower(col(textCol)), lit("[\\p{L}\\p{N}]+"), lit(0)))
        .as("tok"))

  /** TF-IDF term weights in the df-pruned term space: (doc_id, tok, w)
    * with w = tf · round(ln(n_docs/df), 6). Terms appearing in more than
    * `maxDfFraction` of documents (or more than `maxDf` documents, when
    * set — the absolute knob for 100 TB, where even 1% of the corpus is
    * too hot a join key) are pruned; n_docs counts documents with at
    * least one token, making the weights self-contained in the token
    * stream. The idf is rounded to a 6dp grid so 1-ulp `ln` differences
    * between engines cannot reach the weights (the ta11 rule).
    */
  def tfidfWeights(docs: DataFrame, textCol: String = "text",
      maxDfFraction: Double = 0.5, maxDf: Option[Long] = None): DataFrame = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0)
    val t = toks(docs, textCol, "doc_id")
    val tf = t.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val nDocs = tf.agg(countDistinct(col("doc_id")).cast("double").as("n_docs"))
    val capped = tf.join(dfT, Seq("tok"))
      .crossJoin(broadcast(nDocs)) // one row — scalar broadcast
      .filter(col("df") <= lit(maxDfFraction) * col("n_docs"))
      .filter(maxDf.fold(lit(true))(m => col("df") <= lit(m)))
    capped.select(col("doc_id"), col("tok"),
      (col("tf") * round(log(col("n_docs") / col("df")), 6)).as("w"))
  }

  /** All document pairs with TF-IDF cosine ≥ `minCosine`, scored in the
    * df-pruned term space (norms and dot products both over surviving
    * terms, so the geometry is consistent): (id_a, id_b, cosine), id_a <
    * id_b. The lexical near-dup detector for corpora without embeddings —
    * catches rewordings exact/MinHash dedup miss while needing no model.
    *
    * Plan: one self-join of the weight table on the token (partial-agg on
    * the pair key, so hot pairs combine map-side), norms joined back at
    * pair granularity. Per-term pair expansion is df², which the df cap
    * bounds — the same hot-key guard as DD4's shared-shingle buckets, in
    * join form. Dot products go through round-then-decimal-sum, so the
    * result is aggregation-order-independent and oracle-exact.
    */
  def tfidfCosinePairs(docs: DataFrame, minCosine: Double,
      textCol: String = "text", maxDfFraction: Double = 0.5,
      maxDf: Option[Long] = None): DataFrame = {
    val w = tfidfWeights(docs, textCol, maxDfFraction, maxDf)
    val nrm = w.groupBy(col("doc_id"))
      .agg(sqrt(exactSum(round(col("w") * col("w"), 6))).as("nrm"))
    val a = w.select(col("tok"), col("doc_id").as("id_a"), col("w").as("wa"))
    val b = w.select(col("tok"), col("doc_id").as("id_b"), col("w").as("wb"))
    val dot = a.join(b, Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(exactSum(round(col("wa") * col("wb"), 6)).as("dot"))
    val den = col("na") * col("nb")
    dot
      .join(nrm.select(col("doc_id").as("id_a"), col("nrm").as("na")), Seq("id_a"))
      .join(nrm.select(col("doc_id").as("id_b"), col("nrm").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        r4(when(den === 0.0, 0.0).otherwise(col("dot") / den)).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** BM25 top-`k` retrieval (Robertson–Sparck Jones, the k1/b form): for
    * each query, the `k` highest-scoring documents with
    * score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen)),
    * idf(t) = ln((n − df + 0.5)/(df + 0.5) + 1) on the 6dp grid.
    * `queries` is (query_id, `textCol`); query terms count once each
    * (standard BM25 — query-side tf is folded into repeats, which one
    * `distinct()` removes). Output: (query_id, doc_id, score, rank),
    * deterministic tie-break by doc_id.
    *
    * Plan: corpus statistics are two hash-aggs and a one-row scalar
    * broadcast; the query→document candidate join is keyed on the token
    * with per-term cost qf·df, bounded by the same df cap as
    * [[tfidfCosinePairs]] (a term in half the corpus scores ≈ 0 anyway —
    * BM25's idf vanishes as df → n). Per-pair scores combine through
    * round-then-decimal-sum; the final top-k is a per-query window, never
    * global.
    */
  def bm25TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      textCol: String = "text", k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 0.5, maxDf: Option[Long] = None): DataFrame = {
    require(k > 0 && k1 > 0.0 && b >= 0.0 && b <= 1.0)
    val ct = toks(corpus, textCol, "doc_id")
    val tf = ct.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val len = ct.groupBy(col("doc_id")).agg(count(lit(1)).cast("double").as("len"))
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val stats = ct.agg(count(lit(1)).cast("double").as("total_toks"),
      countDistinct(col("doc_id")).cast("double").as("n_docs"))
    val qt = toks(queries, textCol, "query_id").distinct()
    val idf = round(log(
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)), 6)
    // parenthesization mirrored verbatim in the oracle SQL: every floating
    // step is one IEEE op on grid-deterministic inputs
    val termScore = round(
      idf * (col("tf") * lit(k1 + 1)) /
        (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
          lit(b) * col("len") / (col("total_toks") / col("n_docs")))), 6)
    val scored = qt.join(tf, Seq("tok"))
      .join(dfT, Seq("tok"))
      .join(len, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .filter(col("df") <= lit(maxDfFraction) * col("n_docs"))
      .filter(maxDf.fold(lit(true))(m => col("df") <= lit(m)))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(r4(exactSum(termScore)).as("score"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("score"), col("rank"))
  }
}
