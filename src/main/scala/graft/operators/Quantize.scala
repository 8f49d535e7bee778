package graft.operators

import org.apache.spark.sql.DataFrame
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
}
