package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lexical

class LexicalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  // 6 docs: 1 and 2 identical, 3 overlaps them on two mid-df terms, 4-6
  // disjoint fillers. n=6, df cap 0.5 -> terms with df <= 3 survive, so
  // "kiwi"/"shared" (df=3) stay while anything in >3 docs would drop.
  private def docs = Seq(
    (1L, "apple banana kiwi shared"),
    (2L, "apple banana kiwi shared"),
    (3L, "kiwi shared cherry date"),
    (4L, "elder fig grape"),
    (5L, "solo5a solo5b"),
    (6L, "solo6a solo6b"))
    .toDF("doc_id", "text")

  test("tfidfWeights prunes by document frequency and weights tf*idf") {
    val w = Lexical.tfidfWeights(docs)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    // apple: df=2, idf = round(ln(6/2),6); tf=1
    assert(w((1L, "apple")) == 1.098612)
    // kiwi: df=3 = 0.5*6 -> survives, idf = round(ln 2, 6)
    assert(w((1L, "kiwi")) == 0.693147)
    // cherry: df=1, idf = round(ln 6, 6)
    assert(w((3L, "cherry")) == 1.791759)
    // absolute cap: maxDf=2 prunes the df=3 terms the fraction cap kept
    val capped = Lexical.tfidfWeights(docs, maxDf = Some(2L))
      .select("tok").as[String].collect().toSet
    assert(!capped("kiwi") && !capped("shared") && capped("apple"))
  }

  test("tfidfCosinePairs: identical docs score 1.0, partial overlap in between, disjoint absent") {
    val pairs = Lexical.tfidfCosinePairs(docs, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((1L, 2L)) == 1.0, "identical docs must score exactly 1.0 after r4")
    // 1-3 and 2-3 share {kiwi, shared} and are symmetric by construction
    assert(pairs((1L, 3L)) == pairs((2L, 3L)))
    assert(pairs((1L, 3L)) > 0.0 && pairs((1L, 3L)) < 1.0)
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      "disjoint docs must produce no pair at all")
    // threshold filters
    val strict = Lexical.tfidfCosinePairs(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((1L, 2L)))
  }

  test("bm25TopK ranks higher-tf docs first with deterministic tie-break") {
    val corpus = Seq(
      (10L, "spark engine spark cluster"), // tf(spark)=2
      (11L, "spark notebook local"),       // tf(spark)=1, same length? no: 3 toks
      (12L, "flink stream job graph"))
      .toDF("doc_id", "text")
    val queries = Seq((1L, "spark spark")).toDF("query_id", "text")
    val got = Lexical.bm25TopK(corpus, queries, 5, maxDfFraction = 1.0)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    // query terms count once (distinct); doc 10 has higher tf -> rank 1
    assert(got.map(_._1).toSeq == Seq(10L, 11L) && got.map(_._2).toSeq == Seq(1, 2))
    // k truncates
    val top1 = Lexical.bm25TopK(corpus, queries, 1, maxDfFraction = 1.0).collect()
    assert(top1.length == 1 && top1.head.getLong(1) == 10L)
    // ties (two identical docs) break by doc_id ascending
    val dup = Seq((20L, "alpha beta"), (21L, "alpha beta"), (22L, "gamma d"))
      .toDF("doc_id", "text")
    val q2 = Seq((1L, "alpha")).toDF("query_id", "text")
    val tied = Lexical.bm25TopK(dup, q2, 2, maxDfFraction = 1.0)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(tied == Seq(20L, 21L))
  }

  test("rrfFuse: both-list items outrank single-list items, provenance zero-filled") {
    import graft.operators.Similarity
    val dense = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "doc_id", "rank")
    val lex = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "doc_id", "rank")
    val got = Similarity.rrfFuse(dense, lex, 3).orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(5)))
    // doc 20 appears in both lists (1/62 + 1/61) and must win over doc 10
    // (1/61 alone); doc 30 (1/62) last; absent ranks surface as 0
    assert(got.toSeq == Seq((20L, 2, 1, 1), (10L, 1, 0, 2), (30L, 0, 2, 3)))
    // k truncates the fused list
    assert(Similarity.rrfFuse(dense, lex, 1).count() == 1)
  }

  test("bm25 favors matches in shorter documents (length normalization)") {
    val corpus = Seq(
      (1L, "needle in a haystack of many many extra words words words"),
      (2L, "needle found"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "needle")).toDF("query_id", "text")
    val got = Lexical.bm25TopK(corpus, q, 2, maxDfFraction = 1.0)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == Seq(2L, 1L), "same tf, shorter doc must win under b=0.75")
  }
}
