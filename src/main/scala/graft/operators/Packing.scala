package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: lay a tokenized corpus out into fixed
  * token-budget sequences, the step between a curated corpus and a
  * pre-training data loader. Two forms, mirroring the two G3 bin-packing
  * semantics (SURVEY §7.4.2) at corpus scale:
  *
  *  - [[packSequences]] — concat-and-cut (GPT-style): documents are laid
  *    end-to-end in doc_id order and cut every `budget` tokens; a doc may
  *    straddle a sequence boundary. Every token position is a pure
  *    function of the global prefix sum, so the layout is exact,
  *    deterministic, and independent of partitioning.
  *  - [[packGreedyShards]] — no-split first-fit: whole docs pack greedily
  *    into sequences that never exceed `budget` (oversized docs get a
  *    sequence of their own), within hash shards so the sequential fold
  *    distributes.
  */
object Packing {

  /** Concat-and-cut layout: for each doc, its global `start_offset` in the
    * token stream (docs concatenated in `idCol` order), the sequence its
    * first token lands in (`seq_id` = start/budget), the sequence its last
    * token lands in (`seq_last`), and whether it straddles a cut.
    *
    * Scale shape: a global running sum CANNOT be one unpartitioned window
    * (Spark funnels that through a single task). This is the classic
    * two-pass distributed prefix sum instead: range-partition by id, local
    * window cumsum per partition, then one metadata-scale aggregate
    * (numPartitions rows) collected to the driver, scanned into per-
    * partition prefix offsets, and broadcast back. The corpus shuffles
    * once (the range partitioning); the result is invariant to where the
    * partition boundaries fall, so range-sampling nondeterminism cannot
    * leak into the output.
    */
  def packSequences(docs: DataFrame, budget: Long,
      tokenCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val spark = docs.sparkSession
    val ranged = docs.select(col(idCol), col(tokenCol).cast("long").as(tokenCol))
      .repartitionByRange(col(idCol))
      .withColumn("__pid", spark_partition_id())
    // local pass: cumsum within each range partition — windows partitioned
    // by __pid never funnel globally. Materialized (lineage-truncated and
    // reused) because both the totals aggregate and the final join read it.
    val local = Materialize(ranged.withColumn("__cum",
      sum(col(tokenCol)).over(
        Window.partitionBy(col("__pid")).orderBy(col(idCol)))))
    // driver pass: per-partition totals are numPartitions rows — metadata,
    // like IVF centroids — scanned into exclusive prefix offsets
    val totals = local.groupBy(col("__pid"))
      .agg(sum(col(tokenCol)).as("__t"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).init)
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val start = col("__off") + col("__cum") - col(tokenCol)
    local.join(broadcast(offDf), Seq("__pid"))
      .withColumn("start_offset", start)
      // integer `div`, not floor(a/b): Column `/` is double division, and
      // doubles lose exactness past 2^53 — a 100 TB token stream is within
      // range today but the layout math should never be approximate
      .withColumn("seq_id", expr(s"start_offset div $budget"))
      // a zero-token doc spans no tokens: clamp so seq_last == seq_id
      .withColumn("__end",
        col("start_offset") + greatest(col(tokenCol), lit(1L)) - 1)
      .withColumn("seq_last", expr(s"__end div $budget"))
      .withColumn("crosses_boundary", col("seq_last") > col("seq_id"))
      .select(col(idCol), col(tokenCol), col("start_offset"), col("seq_id"),
        col("seq_last"), col("crosses_boundary"))
  }

  /** PK1b: per-sequence document-span manifest over [[packSequences]]'s
    * layout — the boundary metadata a training loader needs to mask
    * cross-document attention and reset per-document loss inside packed
    * sequences (concat-and-cut without boundary masks lets documents
    * attend into their packing neighbors; every modern pretrain stack
    * carries exactly this manifest next to the token stream). For each
    * (sequence, document) intersection: the span's within-sequence start
    * position, its token length, and whether the document's first/last
    * token lives in this sequence (`is_doc_start`/`is_doc_end` — the
    * loss-reset edge flags a loader keys on).
    *
    * Pure layout arithmetic off packSequences' prefix sum: each doc
    * explodes over the sequences it spans, so output rows ≤ n_docs +
    * total_tokens/budget (each doc contributes one span plus one per cut
    * it straddles) — linear in the corpus, no shuffle beyond
    * packSequences' own range partition, and within a sequence the spans
    * tile [0, budget) contiguously by construction. Zero-token docs
    * occupy no positions and emit no span.
    */
  def packedSpans(docs: DataFrame, budget: Long,
      tokenCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame = {
    val packed = packSequences(docs, budget, tokenCol, idCol)
      .filter(col(tokenCol) > 0)
    val base = col("seq_id") * budget
    packed
      .select(col(idCol), col(tokenCol), col("start_offset"),
        explode(sequence(col("seq_id"), col("seq_last"))).as("seq_id"))
      .select(col("seq_id"), col(idCol),
        (greatest(col("start_offset"), base) - base).as("span_start"),
        (least(col("start_offset") + col(tokenCol), base + budget)
          - greatest(col("start_offset"), base)).as("span_len"),
        (col("start_offset") >= base).as("is_doc_start"),
        (col("start_offset") + col(tokenCol) <= base + budget)
          .as("is_doc_end"))
  }

  /** No-split first-fit packing within hash shards: docs (in id order) fold
    * greedily into sequences capped at `budget`; a doc larger than the
    * budget gets a sequence of its own (same reset rule as
    * [[graft.core.BinPack]], which this reuses). Sequences never cross
    * shards, so each shard folds independently — pick `shards` so one
    * shard's (id, n_tokens) pairs fit a task (at 100 TB that is ~10^5
    * shards, the salting discipline; the fold state itself is O(1)).
    * Output: (idCol, tokenCol, shard, seq) with seq numbered per shard.
    */
  def packGreedyShards(docs: DataFrame, budget: Long, shards: Int = 32,
      tokenCol: String = "n_tokens", idCol: String = "doc_id"): DataFrame = {
    require(budget > 0 && shards > 0, s"bad budget/shards: $budget/$shards")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(tokenCol).cast("long"))
      .as[(Long, Long)]
      .groupByKey { case (id, _) => math.floorMod(id, shards.toLong) }
      .flatMapGroups { (shard: Long, it: Iterator[(Long, Long)]) =>
        val sorted = it.toVector.sortBy(_._1)
        graft.core.BinPack.pack[(Long, Long)](sorted, _._2, budget)
          .iterator.map { case ((id, w), bin) => (id, w, shard, bin) }
      }
      .toDF(idCol, tokenCol, "shard", "seq")
  }
}
