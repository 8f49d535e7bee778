package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.PipelineConfig
import graft.eval.Metrics
import graft.llm.{ExtractiveSummarizer, LeadSummarizer}
import graft.operators.{CorpusOps, TreeOps}
import graft.strategy.{Hierarchical, Strategies}

/** End-to-end summarization pipelines over the testdata documents table,
  * wired with the deterministic extractive summarizer (SURVEY.md §7.2).
  *
  * The config is scaled to the synthetic corpus (docs are ~50 tokens, vs
  * the reference's 54k-token documents): chunk=16 tokens / overlap=2,
  * collapse budget 24, summary budget 8 — proportionally the same shape
  * (multi-chunk docs, >=1 collapse round) at testdata size.
  */
object Pipelines {

  val TestCfg: PipelineConfig = PipelineConfig(
    chunkSize = 16, chunkOverlap = 2, tokenMax = 24,
    maxSummaryTokens = 8, maxCollapseRounds = 10,
    maxCritiqueIterations = 2, byTokens = true)

  def strategies(cfg: PipelineConfig = TestCfg): Strategies =
    new Strategies(ExtractiveSummarizer, cfg = cfg)

  def docs(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.documents(spark, dir)

  def truncated(spark: SparkSession, dir: String): DataFrame =
    strategies().truncated(docs(spark, dir))

  def mapReduce(spark: SparkSession, dir: String): DataFrame =
    strategies().mapReduce(docs(spark, dir))

  def critique(spark: SparkSession, dir: String): DataFrame =
    strategies().mapReduceCritique(docs(spark, dir))

  def iterative(spark: SparkSession, dir: String): DataFrame =
    strategies().iterative(docs(spark, dir))

  def hierarchical(spark: SparkSession, dir: String): DataFrame =
    new Hierarchical(ExtractiveSummarizer, TestCfg)
      .summarize(TreeOps.synthesize(docs(spark, dir)))

  /** Generated-vs-reference pair metrics: generated = map-reduce pipeline,
    * reference = lead-summarizer baseline (the corpus has no gold
    * summaries; the pairing/metric machinery is what's under test —
    * reference shape: evaluate/evaluate_summaries_semantic.py:561-575).
    */
  def pairMetrics(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val gen = strategies().mapReduce(d).withColumnRenamed("summary", "gen")
    val ref = d.select(col("doc_id"),
      udf((t: String) => LeadSummarizer.summarize(t, 12)).apply(col("text")).as("ref"))
    Metrics.pairMetrics(gen.join(ref, "doc_id"))
  }

  def evalStats(spark: SparkSession, dir: String): DataFrame =
    Metrics.summaryStats(pairMetrics(spark, dir),
      Seq("semantic_similarity", "rouge1_f", "rouge2_f", "rougeL_f"))

  /** M4 judge pass over the same gen/ref pairing as [[pairMetrics]]. */
  def judgeScores(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val gen = strategies().mapReduce(d).withColumnRenamed("summary", "gen")
    val ref = d.select(col("doc_id"),
      udf((t: String) => LeadSummarizer.summarize(t, 12)).apply(col("text")).as("ref"))
    Metrics.judgeMetrics(gen.join(ref, "doc_id")).orderBy(col("doc_id"))
  }

  /** M4+G6 aggregate: pass rate, failure isolation count and the rubric
    * distribution blocks over the [[judgeScores]] rows.
    */
  def judgeStats(spark: SparkSession, dir: String): DataFrame =
    Metrics.judgeStats(judgeScores(spark, dir))

  /** M2: BERTScore-shaped greedy-match scores over SQL-free pairs (the
    * same overlapping-token-slice pairing as eval_rouge_ngram, so the
    * score is non-degenerate without running a strategy first).
    */
  def bertScores(spark: SparkSession, dir: String): DataFrame = {
    val toks = split(trim(col("text")), "\\s+")
    val pairs = docs(spark, dir).select(col("doc_id"),
      array_join(slice(toks, 1, 20), " ").as("gen"),
      array_join(slice(toks, 11, 30), " ").as("ref"))
    Metrics.bertScore(pairs).orderBy(col("doc_id"))
  }
}
