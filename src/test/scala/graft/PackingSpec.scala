package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.BinPack
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark
  import spark.implicits._

  test("PK1 packSequences: exact concat-and-cut layout on a known stream") {
    // tokens: 3, 5, 4, 10, 2 → starts 0, 3, 8, 12, 22; budget 10
    val docs = Seq((1L, 3L), (2L, 5L), (3L, 4L), (4L, 10L), (5L, 2L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(docs, budget = 10)
      .select("doc_id", "start_offset", "seq_id", "seq_last", "crosses_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L, false),   // tokens 0-2
      (2L, 3L, 0L, 0L, false),   // tokens 3-7
      (3L, 8L, 0L, 1L, true),    // tokens 8-11: straddles the cut at 10
      (4L, 12L, 1L, 2L, true),   // tokens 12-21
      (5L, 22L, 2L, 2L, false))) // tokens 22-23
  }

  test("PK1 packSequences: invariant to input partition layout; zero-token clamp") {
    val docs = (1L to 500L).map(i => (i, i % 7)).toDF("doc_id", "n_tokens")
    val a = Packing.packSequences(docs, 64)
      .select("doc_id", "start_offset", "seq_id").as[(Long, Long, Long)]
      .collect().toSet
    val b = Packing.packSequences(docs.repartition(13), 64)
      .select("doc_id", "start_offset", "seq_id").as[(Long, Long, Long)]
      .collect().toSet
    assert(a == b)
    // zero-token docs (i % 7 == 0) never "cross" and occupy no offset space
    val z = Packing.packSequences(docs, 64)
      .filter(col("n_tokens") === 0)
      .select("seq_id", "seq_last", "crosses_boundary")
      .as[(Long, Long, Boolean)].collect()
    assert(z.nonEmpty && z.forall(r => r._1 == r._2 && !r._3))
    // layout is gapless: total stream length == sum of tokens
    val last = Packing.packSequences(docs, 64)
      .agg(max(col("start_offset") + col("n_tokens"))).as[Long].head()
    assert(last == (1L to 500L).map(_ % 7).sum)
  }

  test("PK1b packedSpans: exact span manifest, tiling, edge flags") {
    // tokens: 4, 10, 3, 25, 0 → starts 0, 4, 14, 17, 42; budget 10
    val docs = Seq((1L, 4L), (2L, 10L), (3L, 3L), (4L, 25L), (5L, 0L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packedSpans(docs, budget = 10)
      .select("seq_id", "doc_id", "span_start", "span_len",
        "is_doc_start", "is_doc_end")
      .as[(Long, Long, Long, Long, Boolean, Boolean)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq(
      (0L, 1L, 0L, 4L, true, true),    // whole doc inside seq 0
      (0L, 2L, 4L, 6L, true, false),   // head of the straddler
      (1L, 2L, 0L, 4L, false, true),   // its tail
      (1L, 3L, 4L, 3L, true, true),
      (1L, 4L, 7L, 3L, true, false),   // 25-token doc: 3 + 10 + 10 + 2
      (2L, 4L, 0L, 10L, false, false), // full middle sequences
      (3L, 4L, 0L, 10L, false, false),
      (4L, 4L, 0L, 2L, false, true)))
    // zero-token doc 5 emits nothing; spans tile each sequence gaplessly
    assert(!got.exists(_._2 == 5L))
    assert(got.map(_._4).sum == 42L)
    got.groupBy(_._1).foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._4 == b._3)
        case _ =>
      }
    }
  }

  test("PK2 packGreedyShards: budget respected, oversize isolated, matches BinPack") {
    val docs = Seq((0L, 4L), (8L, 9L), (16L, 3L), (24L, 15L), (32L, 1L),
      (1L, 5L), (9L, 5L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packGreedyShards(docs, budget = 10, shards = 8)
      .select("doc_id", "shard", "seq").as[(Long, Long, Int)].collect()
      .sortBy(_._1)
    // shard 0 docs in id order: 4, 9, 3, 15, 1 → greedy at 10:
    // [4], [9], [3], [15], [1] → bins via BinPack
    val expect0 = BinPack.pack[(Long, Long)](
      Seq((0L, 4L), (8L, 9L), (16L, 3L), (24L, 15L), (32L, 1L)), _._2, 10)
      .map { case ((id, _), bin) => (id, 0L, bin) }
    val expect1 = BinPack.pack[(Long, Long)](
      Seq((1L, 5L), (9L, 5L)), _._2, 10)
      .map { case ((id, _), bin) => (id, 1L, bin) }
    assert(got.toSeq.sortBy(_._1) == (expect0 ++ expect1).sortBy(_._1))
    // no sequence exceeds budget unless it is a single oversize doc
    val bySeq = Packing.packGreedyShards(docs, 10, 8)
      .groupBy("shard", "seq")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("n"))
      .as[(Long, Int, Long, Long)].collect()
    assert(bySeq.forall(r => r._3 <= 10 || r._4 == 1))
  }

  test("PK2 packGreedyShards: negative ids shard via floorMod, not %") {
    val docs = Seq((-3L, 2L), (-11L, 2L), (5L, 2L)).toDF("doc_id", "n_tokens")
    val shards = Packing.packGreedyShards(docs, 10, 8)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    assert(shards(-3L) == 5L && shards(-11L) == 5L && shards(5L) == 5L)
  }
}
