package graft.llm

import graft.core.Text

/** Text -> fixed-dim vector, pluggable (SURVEY.md §2.9 M3; the reference
  * uses a sentence-transformer — evaluate/evaluate_summaries_semantic.py:128-139).
  * The default is a deterministic hashing-TF embedder so semantic-similarity
  * metrics are byte-stable offline; a model-backed implementation can slot
  * in per-partition without touching the plan.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
}

/** Hashing term-frequency embedding, L2-normalized. Deterministic: token ->
  * bucket via murmur-style string hash, weight = sqrt(tf) (sublinear TF).
  */
final case class HashingTfEmbedder(dim: Int = 64) extends Embedder {
  override def embed(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    val counts = scala.collection.mutable.HashMap.empty[String, Int]
    Text.metricTokens(text).foreach(t => counts.update(t, counts.getOrElse(t, 0) + 1))
    counts.foreach { case (tok, tf) =>
      val h = scala.util.hashing.MurmurHash3.stringHash(tok, 42)
      val idx = math.floorMod(h, dim)
      val sign = if (((h >>> 31) & 1) == 0) 1f else -1f
      v(idx) += sign * math.sqrt(tf.toDouble).toFloat
    }
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    if (norm > 0) v.map(x => (x / norm).toFloat) else v
  }
}
