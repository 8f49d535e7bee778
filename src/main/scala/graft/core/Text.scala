package graft.core

/** Pure-Scala text primitives (zero Spark deps).
  *
  * Re-expresses the reference's scalar string layer
  * (SURVEY.md §2.8; reference: runners/run_summarization_ollama_iterative.py:19-47,
  * utils/calculate_tokens.py:7-19, runners/run_summarization_ollama.py:9-13).
  */
object Text {

  /** Thinking-block tags the reference strips (reference:
    * run_full_evaluation_pipeline.py:34-63 — `<think>`, `<thinking>`,
    * `<thought>`, `<reasoning>`, `<analysis>`, case-insensitive, DOTALL).
    */
  private val thinkTagRe =
    "(?is)<\\s*(think|thinking|thought|reasoning|analysis)\\s*>.*?<\\s*/\\s*\\1\\s*>".r

  /** Unclosed opening tag at end of text is also dropped (reference cleans
    * dangling open tags by removing everything after them).
    */
  private val danglingOpenRe =
    "(?is)<\\s*(think|thinking|thought|reasoning|analysis)\\s*>.*\\z".r

  private val tripleNewlineRe = "\\n{3,}".r
  private val wsRunRe = "\\s+".r

  /** F1: remove thinking blocks, squeeze >=3 newlines to 2, trim. */
  def cleanThinking(s: String): String = {
    val noTags = danglingOpenRe.replaceAllIn(thinkTagRe.replaceAllIn(s, ""), "")
    tripleNewlineRe.replaceAllIn(noTags, "\n\n").trim
  }

  /** F1 hierarchical variant: additionally squeeze ALL whitespace runs to a
    * single space (reference: runners/..._hierarchical.py:20-40).
    */
  def cleanThinkingFlat(s: String): String =
    wsRunRe.replaceAllIn(cleanThinking(s), " ").trim

  /** F2/F4: whitespace tokens. Empty/blank input => zero tokens. */
  def wsTokens(s: String): Array[String] = {
    val t = s.trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  /** F2: approximate token count = whitespace word count (reference:
    * runners/run_summarization_ollama_mapreduce.py:58-60). The reference
    * mixes HF-tokenizer counts and whitespace counts; we standardize on the
    * whitespace proxy (documented deviation, SURVEY.md §7.4.7) and keep the
    * length function pluggable in the splitter.
    */
  def tokenCount(s: String): Int = wsTokens(s).length

  def charCount(s: String): Int = s.length
  def wordCount(s: String): Int = wsTokens(s).length

  /** C3: token truncation — keep first k whitespace tokens (reference:
    * runners/run_summarization_ollama.py:9-13 uses tokenizer encode/decode;
    * whitespace proxy here).
    */
  def truncateTokens(s: String, k: Int): String = {
    val toks = wsTokens(s)
    if (toks.length <= k) s.trim else toks.take(k).mkString(" ")
  }

  /** Sentence segmentation used by the deterministic extractive summarizer:
    * split after `.`, `!`, `?`, `;`, or newline runs; keeps delimiters with
    * the preceding sentence.
    */
  def sentences(s: String): Vector[String] =
    s.split("(?<=[.!?;])\\s+|\\n+").iterator.map(_.trim).filter(_.nonEmpty).toVector

  /** Word tokenizer for ROUGE / lexical metrics: lowercase, split on
    * non-alphanumeric. Unicode-aware (the reference uses rouge_score's
    * ASCII-only tokenizer even on Vietnamese — documented deviation:
    * we keep all unicode letters/digits).
    */
  def metricTokens(s: String): Array[String] =
    // Locale.ROOT: default-locale toLowerCase diverges from Spark lower()
    // and the DuckDB oracle on tr/az/lt JVMs ('TITLE' -> 'tıtle') — the
    // NbModel.score convention, applied at the shared tokenizer
    s.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}\\p{N}]+")
      .filter(_.nonEmpty)

  /** F8: filename stem. */
  def stem(fname: String): String = {
    val base = fname.substring(fname.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot > 0) base.substring(0, dot) else base
  }

  /** F7: model-name safe-encode (reference: run_full_evaluation_pipeline.py:170). */
  def safeName(s: String): String = s.replace(':', '_').replace('.', '_')

  /** F9: extract payload between ```json fences (reference:
    * evaluate/evaluate_summaries_semantic.py:87-91).
    */
  def stripCodeFence(s: String): String = {
    val fenceRe = "(?s)```(?:json)?\\s*(.*?)```".r
    fenceRe.findFirstMatchIn(s).map(_.group(1).trim).getOrElse(s.trim)
  }
}
