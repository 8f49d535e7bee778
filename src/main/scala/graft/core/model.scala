package graft.core

/** Core row types (SURVEY.md §7.1.1 — compile-time versions of the
  * reference's TypedDict pipeline states).
  */
final case class Doc(doc_id: Long, text: String)

final case class Chunk(doc_id: Long, chunk_idx: Int, text: String, n_tokens: Long)

final case class BinnedChunk(doc_id: Long, bin: Int, chunk_idx: Int, text: String, n_tokens: Long)

final case class Summary(doc_id: Long, summary: String)

/** Flattened document-structure tree node (SURVEY.md §1.1 "Document tree";
  * reference: runners/run_summarization_ollama_mapreduce_hierarchical.py:202-239
  * — recursive {type,text,children} JSON becomes an adjacency list because
  * Spark has no recursive types).
  */
final case class TreeNode(
    doc_id: Long,
    node_id: Long,
    parent_id: Long, // -1 for root
    depth: Int,
    node_type: String, // Document | Header | Paragraph
    text: String,
    ord: Int)

/** Pipeline configuration (mirror of the reference's merged config dict,
  * run_full_evaluation_pipeline.py:974-1027).
  */
final case class PipelineConfig(
    chunkSize: Int = 400,
    chunkOverlap: Int = 40,
    tokenMax: Int = 600,
    maxSummaryTokens: Int = 120,
    maxCollapseRounds: Int = 10, // reference recursion_limit=10
    maxCritiqueIterations: Int = 2,
    byTokens: Boolean = true)
