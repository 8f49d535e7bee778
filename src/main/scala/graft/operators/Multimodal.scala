package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata (builder-prompt requirement beyond the reference).
  *
  * The Spark side — schema, partition-wise decoder lifecycle, batch shape,
  * frame-sample explode — is real and tested; the actual codec is STUBBED
  * behind [[MediaDecoder]] (no image/audio libraries in this container).
  * A real decoder (JavaCV, TwelveMonkeys, ffmpeg-over-pipe) implements the
  * same trait and is constructed once per partition in [[decodeMeta]] /
  * [[sampleFrames]] — the `mapPartitions` boundary is exactly where a
  * native handle (codec context, subprocess) would live.
  */
object Multimodal {

  /** Typed metadata a decoder yields for one payload. */
  final case class MediaMeta(
      format: String, width: Int, height: Int, n_frames: Int, n_bytes: Long)

  final case class DecodedRow(
      doc_id: Long, format: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Long)

  final case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Per-partition decoder. `open()` is called once per partition before
    * the first payload and may allocate native resources; implementations
    * must be Serializable (shipped to executors) and deterministic.
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    def close(): Unit = ()
    def decode(payload: Array[Byte]): MediaMeta
    def extractFrame(payload: Array[Byte], frameIdx: Int): Array[Byte]
    /** Fixed-dim feature vector for a payload (a real impl runs a vision/
      * audio encoder here) — bridges media into the similarity operators.
      */
    def extractFeatures(payload: Array[Byte], dim: Int): Array[Float]
    /** Re-encoded payload at the target dimensions. */
    def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte]
  }

  /** STUB decoder — deterministic pseudo-metadata derived from an md5 of
    * the payload (`???`-equivalent that still lets every downstream stage
    * run and be tested byte-stably). Replace with a codec-backed
    * implementation for real media; nothing else changes.
    */
  object StubDecoder extends MediaDecoder {
    private def digest(payload: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(payload)
    override def decode(payload: Array[Byte]): MediaMeta = {
      val d = digest(payload)
      def u(i: Int): Int = d(i) & 0xff
      val formats = Array("jpeg", "png", "wav", "mp4")
      MediaMeta(
        format = formats(u(0) % formats.length),
        width = 16 + ((u(1) << 8 | u(2)) % 1904),
        height = 16 + ((u(3) << 8 | u(4)) % 1064),
        n_frames = 1 + u(5) % 120,
        n_bytes = payload.length.toLong)
    }
    override def extractFrame(payload: Array[Byte], frameIdx: Int): Array[Byte] =
      digest(payload ++ BigInt(frameIdx).toByteArray) // stand-in frame bytes
    override def extractFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val d = digest(payload)
      // /256: u * 2^-8 is exactly representable in binary floating point,
      // so the SQL oracle's double arithmetic matches bit-for-bit
      Array.tabulate(dim)(i => (d(i % d.length) & 0xff) / 256f)
    }
    override def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
      digest(payload ++ BigInt(width).toByteArray ++ BigInt(height).toByteArray)
  }

  /** Attach a BINARY payload column derived from a string column — the
    * testdata has no true media files, so text bytes stand in; with real
    * data this is `spark.read.format("binaryFile")`'s `content` column.
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** The per-partition decoder lifecycle every media stage shares: select
    * (doc_id, payload), open the decoder once per partition, stream rows
    * through `f`, close on exhaustion — no per-row codec setup, no
    * partition-sized materialization. Fixing the lifecycle here fixes it
    * for every stage at once (it was previously five hand-rolled copies
    * that had already drifted on open/close coverage).
    */
  private def mapWithDecoder[T <: Product
      : scala.reflect.runtime.universe.TypeTag](
      media: DataFrame, decoder: MediaDecoder)(
      f: (MediaDecoder, Long, Array[Byte]) => IterableOnce[T]): DataFrame = {
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])](Encoders.product[(Long, Array[Byte])])
      .mapPartitions { it =>
        decoder.open()
        val out = it.flatMap { case (id, p) => f(decoder, id, p) }
        new Iterator[T] {
          override def hasNext: Boolean = {
            val h = out.hasNext
            if (!h) decoder.close()
            h
          }
          override def next(): T = out.next()
        }
      }(Encoders.product[T])
      .toDF()
  }

  /** Decode typed metadata per payload. */
  def decodeMeta(media: DataFrame, decoder: MediaDecoder = StubDecoder): DataFrame =
    mapWithDecoder(media, decoder) { (d, id, payload) =>
      val m = d.decode(payload)
      Iterator.single(
        DecodedRow(id, m.format, m.width, m.height, m.n_frames, m.n_bytes))
    }

  final case class FeatureRow(doc_id: Long, features: Array[Float])

  final case class ResizedRow(doc_id: Long, resized: Array[Byte], n_bytes: Long)

  /** Feature extraction per payload: one `dim`-dimensional Array[Float]
    * per media row, decoder constructed once per partition — the output
    * column plugs directly into [[Similarity]] / [[Dedup]] embedding ops
    * (media ANN search / near-dup with zero extra plumbing).
    */
  def extractFeatures(media: DataFrame, dim: Int = 8,
      decoder: MediaDecoder = StubDecoder): DataFrame =
    mapWithDecoder(media, decoder) { (d, id, p) =>
      Iterator.single(FeatureRow(id, d.extractFeatures(p, dim)))
    }

  /** Resize every payload to the target dims (STUB codec re-encode; the
    * mapPartitions shape is where a real scaler lives).
    */
  def resizePayloads(media: DataFrame, width: Int, height: Int,
      decoder: MediaDecoder = StubDecoder): DataFrame =
    mapWithDecoder(media, decoder) { (d, id, p) =>
      val out = d.resize(p, width, height)
      Iterator.single(ResizedRow(id, out, out.length.toLong))
    }

  final case class RoundtripRow(doc_id: Long, format: String, width: Int,
    height: Int, n_frames: Int, r_width: Int, r_height: Int)

  /** MM6b: the fused single-pass form of the mm6 codec round-trip —
    * decode, resize, re-decode inside ONE mapPartitions pass with one
    * decoder instance, instead of two branches over a materialized media
    * table joined back on doc_id. Identical output to the branch form
    * (mm6's oracle verbatim); only the plan changes: no second scan of
    * the rendered payloads, no exchange, no join — the shape SCALE.md's
    * mm6 probe note says a real pipeline would use. At 100 TB this is
    * the difference between the codec work (irreducible) and the codec
    * work plus a payload-wide shuffle of the heaviest column in the
    * corpus.
    */
  def codecRoundtripFused(media: DataFrame, width: Int, height: Int,
      decoder: MediaDecoder = StubDecoder): DataFrame =
    mapWithDecoder(media, decoder) { (d, id, p) =>
      val m = d.decode(p)
      val rm = d.decode(d.resize(p, width, height))
      Iterator.single(RoundtripRow(id, m.format, m.width, m.height,
        m.n_frames, rm.width, rm.height))
    }

  /** Sample every `stride`-th frame of each payload (video frame-sampling
    * shape): metadata decides the frame count, frames extract lazily per
    * row. Output explodes to one row per sampled frame — partition
    * parallelism scales with total frames, not documents.
    */
  def sampleFrames(media: DataFrame, stride: Int,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(stride > 0)
    mapWithDecoder(media, decoder) { (d, id, payload) =>
      val m = d.decode(payload)
      (0 until m.n_frames by stride).iterator
        .map(f => FrameRow(id, f, d.extractFrame(payload, f)))
    }
  }
}
