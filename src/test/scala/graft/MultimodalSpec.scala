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

  // ---- REAL JDK codec (JdkMedia.scala): actual container parse, not stub

  import graft.operators.JdkMedia
  import graft.operators.JdkMedia.JdkMediaDecoder

  test("JdkMediaDecoder: decodes real PNG/JPEG/BMP/WAV containers; bin fallback") {
    val png = JdkMedia.renderPng(seed = 7L, width = 33, height = 21)
    val m = JdkMediaDecoder.decode(png)
    assert((m.format, m.width, m.height, m.n_frames) == ("png", 33, 21, 1))
    assert(m.n_bytes == png.length.toLong)

    // JPEG + BMP via ImageIO re-encode of the same image
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    for ((fmt, name) <- Seq("jpg" -> "jpeg", "bmp" -> "bmp")) {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, baos))
      val mm = JdkMediaDecoder.decode(baos.toByteArray)
      assert((mm.format, mm.width, mm.height) == (name, 33, 21))
    }

    val wav = JdkMedia.renderWav(seed = 7L, nFrames = 480, sampleRate = 8000, channels = 2)
    val w = JdkMediaDecoder.decode(wav)
    assert((w.format, w.width, w.height, w.n_frames) == ("wav", 8000, 2, 480))

    val bin = JdkMediaDecoder.decode(Array[Byte](1, 2, 3, 4))
    assert((bin.format, bin.width, bin.n_frames, bin.n_bytes) == ("bin", 0, 0, 4L))
  }

  test("JdkMediaDecoder: resize re-encodes a parseable image at target dims") {
    val png = JdkMedia.renderPng(11L, 40, 30)
    val out = JdkMediaDecoder.resize(png, 13, 9)
    val m = JdkMediaDecoder.decode(out)
    assert((m.format, m.width, m.height) == ("png", 13, 9))
    // non-image payloads pass through unchanged
    val raw = Array[Byte](9, 9, 9)
    assert(JdkMediaDecoder.resize(raw, 4, 4).toSeq == raw.toSeq)
  }

  test("JdkMediaDecoder: features are strip luminance (image) / RMS (audio)") {
    // constant-color image -> every strip has the same known luminance
    val img = new java.awt.image.BufferedImage(32, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(255, 255, 255)); g.fillRect(0, 0, 32, 8); g.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val f = JdkMediaDecoder.extractFeatures(baos.toByteArray, 4)
    assert(f.length == 4 && f.forall(v => math.abs(v - 1.0f) < 1e-3))

    // silent WAV -> zero RMS everywhere
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val silence = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](1600)), fmt, 800L)
    val wb = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(silence,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wb)
    val a = JdkMediaDecoder.extractFeatures(wb.toByteArray, 4)
    assert(a.length == 4 && a.forall(_ == 0f))
    // noise WAV -> nonzero RMS
    val n = JdkMediaDecoder.extractFeatures(JdkMedia.renderWav(3L, 800, 8000, 1), 4)
    assert(n.forall(_ > 0f))
  }

  test("JdkMediaDecoder: extractFrame yields a parseable PNG / one PCM frame") {
    val png = JdkMedia.renderPng(5L, 20, 10)
    val frame = JdkMediaDecoder.extractFrame(png, 0)
    val m = JdkMediaDecoder.decode(frame)
    assert((m.format, m.width, m.height) == ("png", 20, 10))

    val wav = JdkMedia.renderWav(5L, 100, 8000, 2)
    // 16-bit stereo -> 4 bytes per frame
    assert(JdkMediaDecoder.extractFrame(wav, 10).length == 4)
    assert(JdkMediaDecoder.extractFrame(Array[Byte](1), 0).isEmpty)
  }

  test("JdkMedia: end-to-end Spark round-trip through the public operators") {
    val dims = Seq((1L, 17, 9), (2L, 24, 12)).toDF("doc_id", "w", "h")
    val media = JdkMedia.withRenderedPng(dims, "w", "h")
    val meta = Multimodal.decodeMeta(media, JdkMediaDecoder).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("format"), r.getAs[Int]("width"), r.getAs[Int]("height"))).toMap
    assert(meta(1L) == ("png", 17, 9) && meta(2L) == ("png", 24, 12))

    // rendered payloads are byte-stable across jobs (java.util.Random LCG)
    val h1 = media.select(md5(col("payload"))).as[String].collect().sorted.toSeq
    val h2 = JdkMedia.withRenderedPng(dims, "w", "h")
      .select(md5(col("payload"))).as[String].collect().sorted.toSeq
    assert(h1 == h2)

    val wavs = Seq((1L, 300, 1), (2L, 301, 2)).toDF("doc_id", "nf", "ch")
    val wmeta = Multimodal.decodeMeta(
        JdkMedia.withRenderedWav(wavs, "nf", "ch", 8000), JdkMediaDecoder).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[Int]("n_frames"))).toMap
    assert(wmeta(1L) == (8000, 1, 300) && wmeta(2L) == (8000, 2, 301))
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
