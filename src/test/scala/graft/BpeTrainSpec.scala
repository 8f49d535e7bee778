package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("applyMerge: greedy left-to-right, scan resumes after a merge") {
    val df = Seq(
      (1L, Seq("a", "a", "a")),        // only the FIRST pair merges
      (2L, Seq("a", "a", "a", "a")),   // (0,1) and (2,3)
      (3L, Seq("x", "a", "a", "y")),   // interior pair
      (4L, Seq("b", "a")),             // wrong order: untouched
      (5L, Seq("a")),                  // too short: untouched
      (6L, Seq.empty[String]))         // empty: stays empty
      .toDF("id", "toks")
    val got = df.select(col("id"),
        BpeTrain.applyMerge(col("toks"), "a", "a").as("m"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq("aa", "a"))
    assert(got(2L) == Seq("aa", "aa"))
    assert(got(3L) == Seq("x", "aa", "y"))
    assert(got(4L) == Seq("b", "a"))
    assert(got(5L) == Seq("a"))
    assert(got(6L) == Seq.empty)
    // distinct pair: non-adjacent occurrences all merge
    val ab = df.filter(col("id") === 2L)
      .select(BpeTrain.applyMerge(
        typedLit(Seq("a", "b", "c", "a", "b")), "a", "b"))
      .as[Seq[String]].head()
    assert(ab == Seq("ab", "c", "ab"))
  }

  test("distributed trainMerges == single-node Bpe.train, rank for rank") {
    val texts = Seq(
      "low lower lowest low low newest",
      "new newer newest new lowest wide",
      "wide wider widest lowest low newer",
      "he she the then there hen")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dist = BpeTrain.trainMerges(docs, 12, minPairCount = 2L)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toVector
    val local = graft.core.Bpe.train(texts, 12,
      pretokenRegex = "[\\p{L}\\p{N}]+", byteLevel = false,
      minPairCount = 2).merges
    assert(dist == local,
      s"distributed merges $dist must equal the sequential reference $local")
    assert(dist.nonEmpty && dist.size <= 12)
    // ranks are 1..n and pair counts are the winning counts, descending-ish
    val full = BpeTrain.trainMerges(docs, 12, minPairCount = 2L)
      .orderBy("rank").collect()
    assert(full.map(_.getAs[Int]("rank")).toSeq == (1 to full.length))
    assert(full.forall(_.getAs[Long]("pair_count") >= 2L))
  }

  test("trainMergesSampled: keep-all == distributed, rank/count for rank") {
    val texts = Seq(
      "low lower lowest low low newest",
      "new newer newest new lowest wide",
      "wide wider widest lowest low newer",
      "he she the then there hen")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dist = BpeTrain.trainMerges(docs, 10, minPairCount = 2L)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("pair_count"))).toVector
    val sampled = BpeTrain.trainMergesSampled(docs, 10, sampleFraction = 1.0,
        minPairCount = 2L)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"),
        r.getAs[Long]("pair_count"))).toVector
    assert(sampled == dist,
      s"keep-all sampled trainer $sampled must equal distributed $dist")
  }

  test("trainMergesSampled: half-sample agrees with full on head merges") {
    // Zipf-shaped corpus: every doc carries the same dominant words (the
    // x4, lowest x2, newest x1) plus two doc-varying tail words, so the
    // head of the pair-count ranking is separated by large margins while
    // the tail is noisy — the regime the sampled path targets (the HEAD of
    // the merge order converges first as the sample grows; tail merges are
    // where a half-sample may legitimately differ). Deterministic: the
    // sample is a pure function of (seed, id).
    val tail = Vector("wider", "widest", "she", "hen", "abide", "crow",
      "fjord", "glyph", "mix", "quiz")
    val docs = (0 until 40).map { i =>
      (i.toLong, ("the the the the lowest lowest newest " +
        tail(i % tail.size) + " " + tail((i * 3 + 1) % tail.size)))
    }.toDF("doc_id", "text")
    def merges(df: org.apache.spark.sql.DataFrame) = df.orderBy("rank")
      .collect().map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
      .toVector
    val full = merges(BpeTrain.trainMerges(docs, 8, minPairCount = 2L))
    val half = merges(BpeTrain.trainMergesSampled(docs, 8,
      sampleFraction = 0.5, minPairCount = 2L))
    assert(full.size == 8 && half.size == 8)
    // head agreement: the first 4 merges must coincide exactly, and the
    // 8-merge SETS must overlap in at least 6 entries
    assert(half.take(4) == full.take(4),
      s"half-sample head ${half.take(4)} diverged from full ${full.take(4)}")
    val overlap = half.toSet.intersect(full.toSet).size
    assert(overlap >= 6, s"merge-set overlap $overlap < 6: $half vs $full")
  }

  test("trainMergesSampled: distinct-word tripwire fails loudly") {
    val docs = Seq((1L, "aa bb cc dd ee ff gg hh"), (2L, "aa bb cc ii jj"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      BpeTrain.trainMergesSampled(docs, 4, sampleFraction = 1.0,
        maxDistinctWords = 5)
    }
    assert(e.getMessage.contains("distinct pretokens"))
  }

  test("batched rounds == strictly sequential rounds, rank for rank") {
    // the fixture has shared symbols between top pairs (lo/ow/we/es/st all
    // chain through common letters) so disjointPrefix must serialize some
    // candidates AND batch others — both paths are exercised
    val texts = Seq(
      "low lower lowest low low newest",
      "new newer newest new lowest wide",
      "wide wider widest lowest low newer",
      "he she the then there hen")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val seq = BpeTrain.trainMerges(docs, 12, minPairCount = 2L,
        maxMergesPerRound = 1)
      .orderBy("rank").collect().map(_.toSeq).toVector
    val batched = BpeTrain.trainMerges(docs, 12, minPairCount = 2L,
        maxMergesPerRound = 256)
      .orderBy("rank").collect().map(_.toSeq).toVector
    assert(batched == seq,
      s"batched $batched must equal sequential $seq (ranks, pairs, counts)")
  }

  test("batched rounds survive adversarial ties and self-pairs") {
    // ties at equal count, a self-pair (a,a) whose product chains (aa,a),
    // and a product string ("ab") colliding with a pre-existing symbol
    // sequence — the cases where naive top-N-disjoint batching diverges
    // from the sequential argmax; the exact-bound prefix must not
    val texts = Seq(
      "aaa aaa aaa aaa",          // (a,a) then (aa,a) chains
      "zq zq zq zq",              // disjoint pair tied with others
      "ab ab ab cab cab",         // 'ab' product collides with literal ab
      "xy xy yx yx xy")           // (x,y) and (y,x) share both symbols
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val seqRows = BpeTrain.trainMerges(docs, 10, minPairCount = 2L,
        maxMergesPerRound = 1)
      .orderBy("rank").collect().map(_.toSeq).toVector
    val batched = BpeTrain.trainMerges(docs, 10, minPairCount = 2L,
        maxMergesPerRound = 256)
      .orderBy("rank").collect().map(_.toSeq).toVector
    assert(batched == seqRows)
    // and both equal the single-node reference
    val local = graft.core.Bpe.train(texts, 10,
      pretokenRegex = "[\\p{L}\\p{N}]+", byteLevel = false,
      minPairCount = 2).merges
    val got = batched.map(r => (r(1), r(2)))
    assert(got == local,
      s"batched merges $got must equal the sequential reference $local")
  }

  test("non-BMP tie-break: distributed == local, in code-point order") {
    // U+FF21 (fullwidth A, BMP letter) vs U+1D400 (math bold A,
    // supplementary): UTF-16 code-unit order ranks the surrogate pair
    // (\uD835...) FIRST, code-point / UTF-8 order (Spark's binary sort,
    // DuckDB's collation) ranks it LAST. A count tie between the two must
    // break the same way on every engine.
    val w = "Ａ"                                    // U+FF21
    val s = new String(Character.toChars(0x1D400))      // U+1D400
    val texts = Seq(s"${w}a ${w}a ${s}a ${s}a")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val dist = BpeTrain.trainMerges(docs, 2, minPairCount = 2L)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs"))).toVector
    val local = graft.core.Bpe.train(texts, 2,
      pretokenRegex = "[\\p{L}\\p{N}]+", byteLevel = false,
      minPairCount = 2).merges
    assert(dist == local, s"distributed $dist != local $local")
    assert(dist == Vector((w, "a"), (s, "a")),
      s"code-point order must rank U+FF21 before U+1D400, got $dist")
  }

  test("trainMerges: early stop when no pair reaches minPairCount") {
    val docs = Seq((1L, "ab cd ef")).toDF("doc_id", "text")
    // every adjacent pair occurs exactly once -> nothing to learn at min 2
    val merges = BpeTrain.trainMerges(docs, 5, minPairCount = 2L).collect()
    assert(merges.isEmpty)
  }
}
