package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal.{MediaDecoder, MediaMeta}

/** REAL media codec behind [[Multimodal.MediaDecoder]], built entirely on
  * JDK-shipped codecs (zero added dependencies): `javax.imageio.ImageIO`
  * for PNG / JPEG / GIF / BMP and `javax.sound.sampled.AudioSystem` for
  * RIFF/WAVE PCM. This closes the "codec is stubbed" gap: the decoder
  * parses actual container bytes, so the `mm6`/`mm7` round-trip queries
  * exercise render -> real parse -> real re-encode end-to-end under a SQL
  * oracle (the oracle predicts the decoded dimensions from `doc_id`, which
  * only match if the codec genuinely parsed the payload it was handed).
  *
  * Scale shape: identical to the stub path — the decoder is constructed
  * once per partition inside `mapPartitions` (Multimodal.scala:88), each
  * row decodes independently, nothing shuffles. A JavaCV/ffmpeg decoder
  * for video containers would implement the same trait; the JDK cannot
  * decode mp4, so video stays out of scope here (documented, not hidden).
  *
  * Reference: the builder-prompt multimodal requirement; the reference
  * repo itself is text-only (SURVEY.md §2 has no media operators).
  */
object JdkMedia {

  // ImageIO defaults to DISK-backed stream caches (useCache=true): every
  // decode and encode writes a temp file, so a wide codec stage turns
  // into temp-file churn the moment task parallelism rises — measured on
  // the fused mm6b at the 100x corpus: 180 s with the file cache vs the
  // branch form's 80 s at lower stage parallelism, purely an I/O
  // artifact. All payloads here are in-memory byte arrays; cache them in
  // memory. Object-init runs once per JVM, before any codec call.
  ImageIO.setUseCache(false)

  /** Media semantics for [[MediaMeta]] fields per container family:
    *  - images: width/height in pixels, n_frames = image count (GIF may
    *    exceed 1), format = "png"|"jpeg"|"gif"|"bmp".
    *  - WAV audio: width = sample rate (Hz), height = channel count,
    *    n_frames = PCM frame count, format = "wav".
    *  - anything else: format = "bin", zeros elsewhere (honest fallback,
    *    never a guess).
    */
  object JdkMediaDecoder extends MediaDecoder {

    // A decode-only stage deserializes this nested object WITHOUT
    // initializing the outer JdkMedia object, so the in-memory-cache
    // setting must live here too: open() runs once per task before any
    // codec call (see the outer initializer's note on why disk-backed
    // ImageIO stream caches are a measured regression).
    ImageIO.setUseCache(false)

    override def open(): Unit = ImageIO.setUseCache(false)

    private def isPng(p: Array[Byte]) =
      p.length > 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'
    private def isJpeg(p: Array[Byte]) =
      p.length > 3 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8
    private def isGif(p: Array[Byte]) =
      p.length > 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8'
    private def isBmp(p: Array[Byte]) =
      p.length > 2 && p(0) == 'B' && p(1) == 'M'
    private def isWav(p: Array[Byte]) =
      p.length > 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

    private def imageFormat(p: Array[Byte]): Option[String] =
      if (isPng(p)) Some("png") else if (isJpeg(p)) Some("jpeg")
      else if (isGif(p)) Some("gif") else if (isBmp(p)) Some("bmp") else None

    /** ImageReader for a payload; caller must dispose. GIF is the one JDK
      * format where n_frames can exceed 1, so metadata comes from the
      * reader (which can count frames) rather than `ImageIO.read` (which
      * silently takes frame 0).
      */
    private def withReader[A](p: Array[Byte])(f: javax.imageio.ImageReader => A): A = {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(p))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no JDK ImageReader for payload")
        val r = readers.next()
        r.setInput(iis)
        try f(r) finally r.dispose()
      } finally iis.close()
    }

    /** A magic-bytes match is a HINT, not a guarantee — a text file
      * starting "BM…" sniffs as BMP, a truncated PNG carries a valid
      * signature. Decode failure after a sniff match lands on the same
      * honest "bin" fallback as a sniff miss: a corrupt payload in a
      * 100 TB corpus must yield a classifiable row, never a dead task.
      */
    private def binFallback[A](fallback: => A)(body: => A): A =
      try body catch { case scala.util.control.NonFatal(_) => fallback }

    override def decode(payload: Array[Byte]): MediaMeta = {
      val bin = MediaMeta("bin", 0, 0, 0, payload.length.toLong)
      imageFormat(payload) match {
        case Some(fmt) =>
          binFallback(bin) {
            withReader(payload) { r =>
              MediaMeta(fmt, r.getWidth(0), r.getHeight(0),
                n_frames = r.getNumImages(true), n_bytes = payload.length.toLong)
            }
          }
        case None if isWav(payload) =>
          binFallback(bin) {
            val aff: AudioFileFormat =
              AudioSystem.getAudioFileFormat(new ByteArrayInputStream(payload))
            MediaMeta("wav",
              width = aff.getFormat.getSampleRate.toInt,
              height = aff.getFormat.getChannels,
              n_frames = aff.getFrameLength,
              n_bytes = payload.length.toLong)
          }
        case None => bin
      }
    }

    /** Images: PNG-encode frame `frameIdx` (GIF animation frames are real
      * frames; static formats only have frame 0). WAV: the raw PCM bytes
      * of that frame. Fallback: empty.
      */
    override def extractFrame(payload: Array[Byte], frameIdx: Int): Array[Byte] =
      if (imageFormat(payload).isDefined) {
        binFallback(Array.emptyByteArray) {
          encodePng(withReader(payload)(_.read(frameIdx)))
        }
      } else if (isWav(payload)) {
        binFallback(Array.emptyByteArray) {
          val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
          try {
            // compressed-codec WAVs report NOT_SPECIFIED (-1) frame size;
            // only fixed-size PCM frames are extractable
            val frameSize = ais.getFormat.getFrameSize
            if (frameSize <= 0) Array.emptyByteArray
            else {
              ais.skipNBytes(frameIdx.toLong * frameSize)
              val buf = ais.readNBytes(frameSize)
              if (buf.length == frameSize) buf else Array.emptyByteArray
            }
          } finally ais.close()
        }
      } else Array.emptyByteArray

    /** Images: mean luminance (Rec.601) over `dim` equal-width vertical
      * strips, scaled to [0,1] — the classic "tiny image" descriptor
      * family (Torralba et al. 2008), enough to feed the similarity /
      * near-dup operators. WAV: RMS amplitude over `dim` equal time
      * windows. One pass over pixels/samples either way.
      */
    override def extractFeatures(payload: Array[Byte], dim: Int): Array[Float] =
      if (imageFormat(payload).isDefined) binFallback(new Array[Float](dim)) {
        // ImageIO.read returns null (not an exception) for undecodable
        // bytes; route null to the same zero-vector fallback
        val img = ImageIO.read(new ByteArrayInputStream(payload))
        if (img == null) new Array[Float](dim)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val sum = new Array[Double](dim)
          val cnt = new Array[Long](dim)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
                0.114 * (rgb & 0xff)
              val b = math.min(dim - 1, x * dim / w)
              sum(b) += lum / 255.0
              cnt(b) += 1
              x += 1
            }
            y += 1
          }
          Array.tabulate(dim)(i => if (cnt(i) == 0) 0f else (sum(i) / cnt(i)).toFloat)
        }
      } else if (isWav(payload)) binFallback(new Array[Float](dim)) {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        try {
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16, "16-bit PCM expected")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val sumSq = new Array[Double](dim)
          val cnt = new Array[Long](dim)
          var i = 0
          while (i < n) {
            val lo = bytes(2 * i) & 0xff
            val hi = bytes(2 * i + 1).toInt
            val s = ((hi << 8) | lo).toShort / 32768.0
            val b = math.min(dim - 1, (i.toLong * dim / math.max(n, 1)).toInt)
            sumSq(b) += s * s
            cnt(b) += 1
            i += 1
          }
          Array.tabulate(dim)(i =>
            if (cnt(i) == 0) 0f else math.sqrt(sumSq(i) / cnt(i)).toFloat)
        } finally ais.close()
      } else new Array[Float](dim)

    /** Images: rescale with Graphics2D and re-encode as PNG (the decoded
      * output of the resized payload reports exactly (width, height) —
      * that is what mm6's oracle checks). Non-images pass through
      * unchanged: inventing a "resize" for audio would be a lie.
      */
    override def resize(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
      if (imageFormat(payload).isDefined) binFallback(payload) {
        val src = ImageIO.read(new ByteArrayInputStream(payload))
        if (src == null) payload
        else {
          val dst = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try g.drawImage(src, 0, 0, width, height, null) finally g.dispose()
          encodePng(dst)
        }
      } else payload
  }

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic test-pattern PNG: pixels from `java.util.Random(seed)`
    * (its LCG is pinned by the Java spec, so payloads are byte-identical
    * across JVMs/partitions/retries). Real media enters production via
    * `spark.read.format("binaryFile")`; this renderer exists so the
    * round-trip queries can manufacture genuine PNG containers from
    * nothing but a doc_id.
    */
  def renderPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, rnd.nextInt() & 0xffffff)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Perceptual difference hash (dHash — the standard 64-bit image
    * near-dup fingerprint): decode, rescale to a 9x8 luminance grid, one
    * bit per horizontal gradient sign. Rescale-invariant by construction
    * (the hash sees only the 9x8 downscale, so any rendition of the same
    * image content at any size maps to nearly the same bits) — Hamming
    * distance over these is the image analog of the dd5 SimHash text
    * near-dup. Undecodable payloads hash to 0L (the bin-fallback rule).
    */
  def dHash(payload: Array[Byte]): Long = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) 0L
    else {
      // the 9x8 grid is POINT-SAMPLED with integer arithmetic (cell
      // center by flooring), not Graphics2D-rescaled: AWT scaling
      // behavior is unspecified across JDKs/backends (and its hinted
      // general path is slow), while 72 direct getRGB samples are
      // deterministic by construction and cheaper than a full rescale
      val (w, h) = (img.getWidth, img.getHeight)
      def lumAt(gx: Int, gy: Int): Double = {
        val px = img.getRGB(gx * w / 9 + w / 18, gy * h / 8 + h / 16)
        0.299 * ((px >> 16) & 0xff) + 0.587 * ((px >> 8) & 0xff) +
          0.114 * (px & 0xff)
      }
      var bits = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          if (lumAt(x + 1, y) > lumAt(x, y)) bits |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      bits
    }
  }

  /** Deterministic coarse-block test pattern: a seeded 9x8 luminance grid
    * rendered as solid blocks at (width, height). The pattern's intrinsic
    * resolution equals [[dHash]]'s grid, so any RESCALE of the same seed
    * reproduces nearly the same hash while independent seeds land ~32
    * bits apart — the controlled fixture for the perceptual near-dup
    * invariants (random-noise pixels would not survive double rescale).
    */
  def renderBlockPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    val cells = Array.fill(8, 9)(rnd.nextInt(256))
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = cells(y * 8 / height)(x * 9 / width)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic 16-bit PCM WAV with `nFrames` frames. */
  def renderWav(seed: Long, nFrames: Int, sampleRate: Int, channels: Int): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](nFrames * channels * 2)
    rnd.nextBytes(pcm)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos) finally ais.close()
    baos.toByteArray
  }

  // public (not private): Janino-generated encoder code needs the ctor
  final case class RenderedRow(doc_id: Long, payload: Array[Byte])

  /** Render one real PNG per row at (`wCol`, `hCol`) pixels, seeded by
    * doc_id. Map-only; no shuffle; image bytes never leave the partition
    * that will decode them in the same pipeline stage.
    */
  def withRenderedPng(docs: DataFrame, wCol: String, hCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(wCol).cast("int"), col(hCol).cast("int"))
      .as[(Long, Int, Int)]
      .map { case (id, w, h) => RenderedRow(id, renderPng(id, w, h)) }(
        Encoders.product[RenderedRow])
      .toDF()
  }

  /** Render a real mono 16-bit WAV whose PCM is a ±12000 square wave with
    * `period` samples per half-cycle — sample i = +12000 when
    * (i div period) is even, −12000 otherwise. Unlike [[renderWav]]'s
    * seeded-random PCM, every sample is a pure integer function of its
    * index, so RMS/ZCR computed from the DECODED bytes replay exactly in
    * SQL (the mm9 oracle) while the WAV container and codec path stay
    * fully real.
    */
  def renderWavSquare(nFrames: Int, period: Int, sampleRate: Int): Array[Byte] = {
    require(nFrames > 0 && period > 0, s"bad wav dims: $nFrames/$period")
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = if ((i / period) % 2 == 0) 12000 else -12000
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val baos = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos) finally ais.close()
    baos.toByteArray
  }

  /** REAL decode of a 16-bit signed little-endian WAV payload into its
    * interleaved integer samples (all channels), via the JDK sound stack
    * — the parse half mm9's features ride on.
    */
  def wavSamples(payload: Array[Byte]): Array[Int] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val f = ais.getFormat
      require(f.getSampleSizeInBits == 16 && !f.isBigEndian &&
        f.getEncoding == AudioFormat.Encoding.PCM_SIGNED,
        s"mm9 expects 16-bit LE signed PCM, got $f")
      val bytes = ais.readAllBytes()
      Array.tabulate(bytes.length / 2) { i =>
        ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF))
      }
    } finally ais.close()
  }

  final case class AudioFeatRow(doc_id: Long, n_samples: Long,
    rms: Double, zcr: Double)

  /** MM9: audio signal features over REAL decoded WAV — RMS energy and
    * zero-crossing rate, the two classic cheap audio descriptors
    * (silence/clipping gates, crude voiced/unvoiced and tonality
    * signals for audio corpus curation). One map pass; per row the
    * payload decodes through the real JDK codec and the features are
    * integer-exact until the final sqrt/ratio: RMS =
    * sqrt(Σ s² / n), ZCR = |{i : sᵢ·sᵢ₋₁ < 0}| / (n−1) (strict sign
    * product — a zero sample crosses nothing, matching the SQL replay's
    * `v * lag(v) < 0`), both 4dp-snapped.
    */
  def audioSignalFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    media.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])](Encoders.product[(Long, Array[Byte])])
      .map { case (id, p) =>
        val s = wavSamples(p)
        val n = s.length
        var ss = 0L
        var ch = 0L
        var i = 0
        while (i < n) {
          ss += s(i).toLong * s(i)
          if (i > 0 && s(i).toLong * s(i - 1) < 0) ch += 1
          i += 1
        }
        def r4d(x: Double): Double = java.math.BigDecimal.valueOf(x)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        AudioFeatRow(id, n.toLong,
          if (n == 0) 0.0 else r4d(math.sqrt(ss.toDouble / n)),
          if (n <= 1) 0.0 else r4d(ch.toDouble / (n - 1)))
      }(Encoders.product[AudioFeatRow])
      .toDF()
  }

  /** Render one real square-wave WAV per row ((`framesCol`, `periodCol`)
    * per doc) — the mm9 corpus builder.
    */
  def withRenderedWavSquare(docs: DataFrame, framesCol: String,
      periodCol: String, sampleRate: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(framesCol).cast("int"),
        col(periodCol).cast("int"))
      .as[(Long, Int, Int)]
      .map { case (id, nf, p) =>
        RenderedRow(id, renderWavSquare(nf, p, sampleRate)) }(
        Encoders.product[RenderedRow])
      .toDF()
  }

  /** Render one real WAV per row with `framesCol` frames, `chCol` channels. */
  def withRenderedWav(docs: DataFrame, framesCol: String, chCol: String,
      sampleRate: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col(framesCol).cast("int"), col(chCol).cast("int"))
      .as[(Long, Int, Int)]
      .map { case (id, nf, ch) => RenderedRow(id, renderWav(id, nf, sampleRate, ch)) }(
        Encoders.product[RenderedRow])
      .toDF()
  }
}
