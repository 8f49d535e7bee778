package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding quantization for vector search at corpus scale: symmetric
  * per-vector int8 — the standard 4x memory/IO reduction that makes a
  * 100 TB embedding column scannable (a float32 768-dim corpus at 10^10
  * vectors is ~30 TB; int8 brings the scan to ~7.5 TB and quadruples the
  * vectors per executor page).
  *
  * Everything is deterministic Column arithmetic over doubles (no UDF), so
  * quantization, reconstruction error, and even the quantized top-k search
  * all carry exact DuckDB oracles — including the search, because per-pair
  * scale factors cancel out of the cosine and the score reduces to
  * integer dot / sqrt(integer norms).
  */
object Quantize {

  /** Per-vector symmetric int8 quantization: scale = max|x| / 127,
    * q_i = clamp(round(x_i / scale), ±127). Output: (idCol, scale, qvec,
    * max_abs_err) — the error column is the per-vector worst-case
    * |dequant − original|, carried along as quality telemetry (bounded by
    * scale/2 by construction; a violated bound means a broken quantizer).
    * Zero vectors quantize to all-zero with scale 0.
    */
  def quantizeInt8(emb: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val v = col(vecCol)
    val withScale = emb.select(col(idCol), v,
      (array_max(transform(v, x => abs(x.cast("double")))) / 127.0).as("scale"))
    // clamp: scale rounds, so max|x|/scale can land epsilon above 127
    val qElem: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      x => greatest(least(round(x.cast("double") / col("scale")), lit(127.0)),
        lit(-127.0)).cast("byte")
    withScale
      .select(col(idCol), v, col("scale"),
        when(col("scale") > 0, transform(v, qElem))
          .otherwise(transform(v, _ => lit(0).cast("byte"))).as("qvec"))
      .select(col(idCol), col("scale"), col("qvec"),
        array_max(zip_with(col("qvec"), v,
          (a, b) => abs(a.cast("double") * col("scale") - b.cast("double"))))
          .as("max_abs_err"))
  }

  /** Approximate cosine top-k over int8-quantized vectors — the memory-
    * lean scan path. Per-vector scales cancel out of the cosine, so the
    * score is integer dot / sqrt(integer norm product): exact integer
    * shuffles, one double division at the end. Same broadcast-queries ×
    * linear-scan shape and deterministic tie-break as
    * [[Similarity.bruteForceTopK]]; zero-norm rows are excluded (their
    * cosine is undefined in the exact baseline too).
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      vecCol: String = "embedding"): DataFrame = {
    def intNorm(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0L), (acc, x) => acc + x.cast("long") * x.cast("long"))
    val qc = quantizeInt8(corpus, vecCol)
      .select(col("vec_id"), col("qvec").as("q_c"))
      .withColumn("in_c", intNorm(col("q_c")))
      .filter(col("in_c") > 0)
    val qq = quantizeInt8(queries, vecCol, idCol = "query_id")
      .select(col("query_id"), col("qvec").as("q_q"))
      .withColumn("in_q", intNorm(col("q_q")))
      .filter(col("in_q") > 0)
    val dot = aggregate(zip_with(col("q_q"), col("q_c"),
      (a, b) => a.cast("long") * b.cast("long")), lit(0L), (acc, x) => acc + x)
    val scored = qc.crossJoin(broadcast(qq))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(dot / sqrt(col("in_q").cast("double") * col("in_c").cast("double")), 4)
          .as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** QZ5: matryoshka truncation — keep the first `dims` coordinates of
    * the embedding (Kusupati et al. 2022: MRL-trained models front-load
    * information, so the prefix is itself a usable lower-dim embedding).
    * The third scan-cut axis next to int8 ([[quantizeInt8]]) and PQ
    * codes: halving dims halves scan bytes AND dot-product cost with no
    * codebook to train. Cosine over the truncated vectors is plain
    * [[Similarity.bruteForceTopK]] on the sliced column — deterministic
    * arithmetic, so both the truncated search and its recall against the
    * full-dim baseline carry exact SQL oracles (the quantize-family
    * property). On non-MRL (structureless) embeddings truncation recall
    * is the measured floor, not a guarantee — which is exactly what the
    * oracled qz5_recall row reports.
    */
  def matryoshkaTruncate(emb: DataFrame, dims: Int,
      vecCol: String = "embedding"): DataFrame = {
    require(dims >= 1, s"dims must be >= 1: $dims")
    emb.withColumn(vecCol, slice(col(vecCol), 1, dims))
  }

  /** QZ6: binary (sign) quantization — one bit per dimension, packed 32
    * bits per long word: a 64-dim float32 vector (256 B) becomes 8 B, the
    * deepest rung of the scan-cut ladder (int8 4x → matryoshka ~2x → PQ
    * 32x → sign 32x with NO codebook and integer-only search). Search
    * ranks by Hamming distance (popcount of XOR — for sign bits, Hamming
    * is monotone in angular distance, the charikar-LSH identity), all
    * integer ops on deterministic packings, so BOTH the search and its
    * recall carry exact SQL oracles like the rest of this family.
    *
    * Packing: bit (i mod 32) of word (i div 32) is set iff v(i) >= 0.
    * 32-bit words (not 64) so every partial sum stays far from long
    * overflow and the SQL replay can use exact POWER(2, j) arithmetic.
    */
  def signBits(vecCol: Column, dim: Int): Column = {
    require(dim >= 1, s"dim must be >= 1: $dim")
    val words = (dim + 31) / 32
    array((0 until words).map { w =>
      val lo = w * 32
      val hi = math.min(dim, lo + 32) - 1
      // try_element_at: a vector shorter than `dim` contributes 0 bits
      // past its end instead of an ANSI out-of-bounds error (hostile
      // sweep); missing dims read as negative sign
      aggregate(sequence(lit(lo), lit(hi)), lit(0L),
        (acc, i) => acc + when(try_element_at(vecCol, i + 1) >= 0f,
          pow(lit(2.0), i - lit(lo)).cast("long")).otherwise(lit(0L)))
    }: _*)
  }

  /** Hamming distance between two packed signatures ([[signBits]]). */
  def hammingDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), _ + _)

  /** Sign-quantized top-k: rank corpus rows per query by Hamming distance
    * between packed sign signatures (ties to the lowest vec_id). The scan
    * touches 8 B/vector at dim 64; one XOR + popcount per word replaces
    * the dim-length float dot product. Output (query_id, vec_id, hamming,
    * rank) — integers end to end, exact oracle.
    */
  def signTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1)
    val sig = signBits(col("embedding"), dim)
    // null vectors can't carry a signature: signBits would pack null to
    // all-zero words (indistinguishable from an all-negative vector) and
    // the row would compete as a ranked candidate — filter like the
    // k-means/IVF-PQ paths do
    val c = corpus.filter(col("embedding").isNotNull)
      .select(col("vec_id"), sig.as("sig_c"))
    val q = queries.filter(col("embedding").isNotNull)
      .select(col("query_id"), sig.as("sig_q"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        hammingDist(col("sig_c"), col("sig_q")).as("hamming"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** QZ6b: the production two-stage form — Hamming shortlist over the
    * 8 B/vector sign scan, then the exact split-cosine rerank on
    * shortlist rows only (the [[Pq.pqTopK]] staging with sign bits as
    * the compressed stage). UNLIKE the model-backed shortlists (PQ, IVF)
    * this whole chain is deterministic arithmetic — integer shortlist,
    * IEEE rerank — so the two-stage search carries a FULL oracle, not
    * just a recall gate. Recall is governed by `shortlist` depth; emitted
    * cosines are bit-identical to [[Similarity.bruteForceTopK]]'s.
    */
  def signTopKReranked(corpus: DataFrame, queries: DataFrame, k: Int,
      dim: Int, shortlist: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{r4, vecDotF, vecNormF}
    require(k >= 1 && shortlist >= k)
    val shortlisted = signTopK(corpus, queries, shortlist, dim)
      .select(col("query_id"), col("vec_id"))
    val denom = col("norm_c") * col("norm_q")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    // broadcast the shortlist: it is queries x shortlist rows (metadata)
    // by construction, but sits behind a window so Catalyst has no size
    // estimate and plans a SortMergeJoin that SORTS THE CORPUS (measured
    // 10.9 s -> the scan floor at the 100x probe)
    broadcast(shortlisted)
      .join(corpus.select(col("vec_id"), col("embedding").as("emb_c"),
        vecNormF(col("embedding")).as("norm_c")), Seq("vec_id"))
      .join(broadcast(queries.select(col("query_id"),
        col("embedding").as("emb_q"),
        vecNormF(col("embedding")).as("norm_q"))), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        r4(when(denom === 0.0, 0.0)
          .otherwise(vecDotF(col("emb_q"), col("emb_c")) / denom)).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
