package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def media = Multimodal.withPayload(
    Seq((1L, "payload one"), (2L, "payload two"), (3L, "payload one"))
      .toDF("doc_id", "text"))

  test("decodeMeta: typed metadata per payload, deterministic, bounded dims") {
    val a = Multimodal.decodeMeta(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val b = Multimodal.decodeMeta(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(a.keySet == Set(1L, 2L, 3L))
    a.foreach { case (id, r) =>
      assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 1920)
      assert(r.getAs[Int]("height") >= 16 && r.getAs[Int]("height") < 1080)
      assert(r.getAs[Int]("n_frames") >= 1)
      assert(r.getAs[Long]("n_bytes") > 0)
      // determinism across runs
      assert(r.getAs[Int]("width") == b(id).getAs[Int]("width"))
    }
    // identical payloads decode identically
    assert(a(1L).getAs[Int]("width") == a(3L).getAs[Int]("width"))
    assert(a(1L).getAs[String]("format") == a(3L).getAs[String]("format"))
  }

  test("extractFeatures: fixed dim, [0,1) range, identical payloads agree") {
    val got = Multimodal.extractFeatures(media, 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Float]]("features").toVector).toMap
    assert(got.values.forall(_.length == 8))
    assert(got.values.forall(_.forall(f => f >= 0f && f < 1f)))
    assert(got(1L) == got(3L)) // same payload -> same features
    assert(got(1L) != got(2L))
    // features flow straight into the similarity ops
    val emb = Multimodal.extractFeatures(media, 8)
      .select(col("doc_id").as("vec_id"), col("features").as("embedding"))
    val pairs = graft.operators.Dedup.embeddingCosinePairs(emb, 0.999)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L))) // identical payloads are near-dups
  }

  test("resizePayloads: deterministic re-encode keyed by target dims") {
    val a = Multimodal.resizePayloads(media, 640, 480).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("resized").toSeq).toMap
    val b = Multimodal.resizePayloads(media, 320, 240).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("resized").toSeq).toMap
    assert(a.keySet == Set(1L, 2L, 3L))
    assert(a.values.forall(_.nonEmpty))
    assert(a(1L) == a(3L))      // same payload + dims -> same bytes
    assert(a(1L) != b(1L))      // different target dims -> different bytes
  }

  test("sampleFrames: one row per sampled frame, stride respected") {
    val meta = Multimodal.decodeMeta(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n_frames")).toMap
    val frames = Multimodal.sampleFrames(media, 7).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx")))
    val byDoc = frames.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    meta.foreach { case (id, n) =>
      assert(byDoc(id) == (0 until n by 7).toSeq)
    }
    // frame payloads are non-empty
    val sizes = Multimodal.sampleFrames(media, 7)
      .select(length(col("frame"))).as[Int].collect()
    assert(sizes.forall(_ > 0))
  }
}
