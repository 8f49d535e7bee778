package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.wordNgrams

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: none of these is a cross join. Exact dedup is one
  * hash-aggregate; MinHash-LSH and SimHash pair candidates through
  * band/bucket equi-joins (shuffle on small band keys, then verify within
  * buckets); n-gram Jaccard joins on shared shingles so only documents
  * sharing at least one shingle ever meet.
  *
  * Hash choice: shingle hashes are derived from md5 (available and
  * bit-identical in both Spark and DuckDB) so every operator here has an
  * exact SQL oracle.
  */
object Dedup {

  /** md5-hex prefix as a positive long (15 hex chars = 60 bits, fits). */
  private def md5Long(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"s$seed:"), c)), 1, 15), 16, 10).cast("long")

  /** Exact duplicate groups by full-text hash: returns one row per
    * duplicated text with the canonical (min) doc_id, the duplicate count
    * and the member ids. One hash-aggregate; at 100 TB this is the cheapest
    * possible dedup (map-side partial agg on md5(text)).
    */
  def exactDuplicates(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(
        min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("dup_count"),
        array_join(array_sort(collect_list(col("doc_id"))), ",").as("member_ids"))
      .filter(col("dup_count") > 1)

  /** MinHash signature as `numHashes` columns derived from word
    * `shingleSize`-grams: h_i = min over shingles of md5(seed_i || shingle).
    * Empty docs get null signatures.
    */
  def minhashSignature(docs: DataFrame, textCol: String, shingleSize: Int,
      numHashes: Int): DataFrame = {
    val shingles = array_distinct(wordNgrams(lower(col(textCol)), shingleSize))
    val sig = (0 until numHashes).map { i =>
      array_min(transform(col("shingles"), s => md5Long(s, i))).as(s"mh_$i")
    }
    docs.withColumn("shingles", shingles)
      .select(col("doc_id") +: sig: _*)
  }

  /** MinHash + LSH near-duplicate candidate pairs: band the signature
    * (`bands` x `rowsPerBand` = numHashes), bucket-join on (band, band
    * hash), emit distinct candidate pairs (a < b). The join key space is
    * tiny (band id + hash), so this scales as a plain shuffle join — never
    * quadratic in corpus size, only in per-bucket collisions.
    */
  def minhashLshPairs(docs: DataFrame, textCol: String = "text",
      shingleSize: Int = 3, bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = minhashSignature(docs, textCol, shingleSize, numHashes)
    // long format: (doc_id, band, band_key)
    val bandRows = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand).map(r => col(s"mh_${b * rowsPerBand + r}"))
      sigs.select(col("doc_id"), lit(b).as("band"),
        md5(concat_ws("_", parts: _*)).as("band_key"))
    }.reduce(_ unionByName _)
    val a = bandRows.select(col("band"), col("band_key"), col("doc_id").as("doc_a"))
    val b = bandRows.select(col("band"), col("band_key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** SimHash (64-bit) per document: weighted sign-sum of token-hash bits,
    * weight = token frequency. Near-dups have small Hamming distance.
    */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val sim = udf { (text: String) =>
      if (text == null) 0L
      else {
        val acc = new Array[Int](64)
        graft.core.Text.metricTokens(text)
          .groupBy(identity).foreach { case (tok, occ) =>
            val w = occ.length
            // two 32-bit murmur hashes -> 64 bits
            val h1 = scala.util.hashing.MurmurHash3.stringHash(tok, 0xcafe)
            val h2 = scala.util.hashing.MurmurHash3.stringHash(tok, 0xbeef)
            val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
            var b = 0
            while (b < 64) {
              if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
              b += 1
            }
          }
        var out = 0L
        var b = 0
        while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
        out
      }
    }
    docs.select(col("doc_id"), sim(col(textCol)).as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` distance, blocked by
    * 16-bit sub-keys: two 64-bit hashes within Hamming distance k<=3 must
    * agree on at least one of 4 16-bit blocks (pigeonhole), so candidates
    * come from 4 equi-joins on block values, then exact Hamming verify.
    */
  def simhashPairs(docs: DataFrame, textCol: String = "text", maxHamming: Int = 3)
      : DataFrame = {
    require(maxHamming <= 3, "blocking with 4 blocks guarantees k<=3 only")
    val hashes = simhash(docs, textCol)
    val blocks = (0 until 4).map { blk =>
      hashes.select(col("doc_id"), lit(blk).as("blk"),
        shiftrightunsigned(col("simhash"), blk * 16).bitwiseAND(lit(0xffffL)).as("blk_key"),
        col("simhash"))
    }.reduce(_ unionByName _)
    val a = blocks.select(col("blk"), col("blk_key"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = blocks.select(col("blk"), col("blk_key"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("blk", "blk_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** N-gram Jaccard near-dup pairs above `minJaccard`: explode distinct
    * shingles, self-join on the shingle (only docs sharing a shingle meet),
    * count intersections, compute |A ∩ B| / (|A| + |B| - |A ∩ B|).
    * Fully expressible in ANSI SQL — this is the oracle-checked dedup path.
    */
  def ngramJaccardPairs(docs: DataFrame, textCol: String = "text",
      shingleSize: Int = 3, minJaccard: Double = 0.8): DataFrame = {
    val sh = docs
      .select(col("doc_id"),
        explode(array_distinct(wordNgrams(lower(col(textCol)), shingleSize)))
          .as("shingle"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val inter = sh.as("x").join(sh.as("y"), Seq("shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    // sizes is O(corpus) rows — NOT broadcastable at scale; shuffle join on
    // doc id (AQE will broadcast on small inputs by itself)
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_shingles", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_shingles", "n_b"), "doc_b")
      .withColumn("jaccard",
        round(col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }
}
