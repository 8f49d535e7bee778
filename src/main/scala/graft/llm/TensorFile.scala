package graft.llm

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Minimal flat-tensor checkpoint I/O in the SAFETENSORS container format
  * (the public Hugging Face weight-file layout: an 8-byte little-endian
  * header length, a JSON header mapping tensor name -> {dtype, shape,
  * data_offsets}, then the raw little-endian tensor data) — the loader
  * half of [[TinyTransformer]]'s "a trained checkpoint is a constructor
  * away" contract. Supports exactly what a dense-weight checkpoint needs:
  * F32/F64 dtypes, row-major data, named lookup.
  *
  * Deliberately dependency-free: the header grammar used by weight files
  * is a flat object of objects with string/number-array values, so a
  * ~60-line recursive-descent parser covers it without a JSON library —
  * the same budget the `Sinks` manifest reader spends. Unknown dtypes and
  * malformed headers fail loudly with the tensor/file named.
  *
  * Scale shape: checkpoints are METADATA (the TinyTransformer defaults are
  * ~200 KB; even a production MiniLM is ~90 MB) — the file is read once
  * per executor JVM by the model's lazy weight build and never enters a
  * plan. On a real cluster ship the file with `--files` / a shared mount;
  * the loader only needs a local path.
  */
object TensorFile {

  final case class Tensor(shape: Array[Int], data: Array[Double]) {
    require(shape.forall(_ >= 0) && shape.product == data.length,
      s"shape ${shape.mkString("x")} != data length ${data.length}")
  }

  // ------------------------------------------------------------------ read

  /** Load every tensor in the file (F32/F64 widened to Double).
    *
    * Resolution order: filesystem path first, then CLASSPATH resource of
    * the same name. The fallback is what lets a committed checkpoint ship
    * INSIDE the library jar and resolve on every executor with no
    * `--files` plumbing — the deployment shape of a small bundled model
    * (checkpoints are metadata-scale; see the object scaladoc).
    */
  def load(path: String): Map[String, Tensor] = {
    val bytes =
      if (Files.exists(Paths.get(path))) Files.readAllBytes(Paths.get(path))
      else {
        val in = Thread.currentThread().getContextClassLoader
          .getResourceAsStream(path.stripPrefix("/"))
        if (in == null) sys.error(
          s"$path: neither a file nor a classpath resource")
        try in.readAllBytes() finally in.close()
      }
    require(bytes.length >= 8, s"$path: not a tensor file (${bytes.length} B)")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val headerLen = bb.getLong(0)
    require(headerLen > 0 && headerLen <= bytes.length - 8,
      s"$path: bad header length $headerLen for ${bytes.length} B file")
    val header = new String(bytes, 8, headerLen.toInt, StandardCharsets.UTF_8)
    val entries = Json.parseObject(header, path)
    val dataBase = 8 + headerLen.toInt
    // every non-__metadata__ entry MUST be a tensor descriptor object — a
    // collect-with-partial-function here would silently DROP a corrupted
    // or hand-edited entry (the "malformed headers fail loudly" contract
    // would only surface later, and only for consumers that look the
    // tensor up by name)
    entries.filter(_._1 != "__metadata__").map { case (name, rawFields) =>
      val fields = rawFields match {
        case m: Map[String @unchecked, _] => m
        case other => sys.error(
          s"$path: header entry $name is not a tensor object (got " +
            s"${if (other == null) "null" else other.getClass.getSimpleName})")
      }
      def field(k: String): Any = fields.getOrElse(k,
        sys.error(s"$path: tensor $name missing $k"))
      val dtype = field("dtype").asInstanceOf[String]
      val shape = field("shape").asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Double].toInt).toArray
      val Seq(start, end) = field("data_offsets").asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Double].toLong)
      val n = shape.product
      val width = dtype match {
        case "F32" => 4
        case "F64" => 8
        case other => sys.error(
          s"$path: tensor $name has unsupported dtype $other (need F32/F64)")
      }
      require(start >= 0 && start <= end &&
        end - start == n.toLong * width &&
        dataBase + end <= bytes.length,
        s"$path: tensor $name offsets [$start,$end) inconsistent with " +
          s"shape ${shape.mkString("x")}")
      val out = new Array[Double](n)
      val tb = ByteBuffer.wrap(bytes, dataBase + start.toInt, (end - start).toInt)
        .order(ByteOrder.LITTLE_ENDIAN)
      var i = 0
      if (width == 4) while (i < n) { out(i) = tb.getFloat().toDouble; i += 1 }
      else while (i < n) { out(i) = tb.getDouble(); i += 1 }
      name -> Tensor(shape, out)
    }
  }

  // ----------------------------------------------------------------- write

  /** Write tensors in the container format (F64 — exact round-trip of the
    * in-memory doubles; pass dtype = "F32" for interchange with float
    * checkpoints at the cost of a float round).
    */
  def save(path: String, tensors: Seq[(String, Tensor)],
      dtype: String = "F64"): Unit = {
    val width = dtype match {
      case "F32" => 4
      case "F64" => 8
      case other => sys.error(s"unsupported dtype $other")
    }
    // names interpolate into the JSON header unescaped — restrict to the
    // character set real checkpoint tensor names use and fail loudly on
    // anything that would corrupt (or forge entries in) the header
    tensors.foreach { case (name, _) =>
      require(name.nonEmpty && name.forall(c =>
        c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
        s"tensor name not header-safe (need [A-Za-z0-9._-]+): '$name'")
    }
    var off = 0L
    val fields = tensors.map { case (name, t) =>
      val start = off
      off += t.data.length.toLong * width
      s""""${name}":{"dtype":"$dtype","shape":[${t.shape.mkString(",")}],""" +
        s""""data_offsets":[$start,$off]}"""
    }
    val header = fields.mkString("{", ",", "}")
      .getBytes(StandardCharsets.UTF_8)
    // single-buffer write (and load()'s whole-file read) caps a checkpoint
    // at the JVM array limit — name the ceiling instead of letting
    // ByteBuffer.allocate throw on the Int-truncated size
    require(off + header.length + 8 <= Int.MaxValue,
      s"checkpoint too large for the single-buffer writer: " +
        s"${off + header.length + 8} B data+header exceeds 2 GiB " +
        s"(shard the tensors across files)")
    val bb = ByteBuffer.allocate(8 + header.length + off.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(header.length.toLong)
    bb.put(header)
    tensors.foreach { case (_, t) =>
      var i = 0
      if (width == 4)
        while (i < t.data.length) { bb.putFloat(t.data(i).toFloat); i += 1 }
      else
        while (i < t.data.length) { bb.putDouble(t.data(i)); i += 1 }
    }
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, bb.array())
  }

  // ------------------------------------------- minimal JSON (header subset)

  /** Recursive-descent parser for the header grammar: objects, arrays,
    * strings (with \-escapes), numbers, true/false/null. Numbers surface
    * as Double (shapes/offsets in real checkpoints fit exactly — the
    * 2^53 mantissa covers every plausible tensor size).
    */
  private object Json {
    def parseObject(s: String, ctx: String): Map[String, Any] = {
      val p = new P(s, ctx)
      val v = p.value()
      p.ws()
      require(p.eof, s"$ctx: trailing bytes after JSON header")
      v.asInstanceOf[Map[String, Any]]
    }

    private final class P(s: String, ctx: String) {
      private var i = 0
      def eof: Boolean = i >= s.length
      def ws(): Unit = while (!eof && s.charAt(i).isWhitespace) i += 1
      private def fail(msg: String): Nothing =
        sys.error(s"$ctx: bad JSON header at offset $i: $msg")
      private def expect(c: Char): Unit = {
        if (eof || s.charAt(i) != c) fail(s"expected '$c'")
        i += 1
      }
      def value(): Any = {
        ws()
        if (eof) fail("eof")
        s.charAt(i) match {
          case '{' => obj()
          case '[' => arr()
          case '"' => str()
          case 't' => lit("true", true)
          case 'f' => lit("false", false)
          case 'n' => lit("null", null)
          case _ => num()
        }
      }
      private def lit(word: String, v: Any): Any = {
        if (!s.startsWith(word, i)) fail(s"expected $word")
        i += word.length; v
      }
      private def obj(): Map[String, Any] = {
        expect('{'); ws()
        val b = Map.newBuilder[String, Any]
        if (!eof && s.charAt(i) == '}') { i += 1; return b.result() }
        var more = true
        while (more) {
          ws()
          val k = str()
          ws(); expect(':')
          b += k -> value()
          ws()
          if (!eof && s.charAt(i) == ',') i += 1
          else { expect('}'); more = false }
        }
        b.result()
      }
      private def arr(): Seq[Any] = {
        expect('['); ws()
        val b = Seq.newBuilder[Any]
        if (!eof && s.charAt(i) == ']') { i += 1; return b.result() }
        var more = true
        while (more) {
          b += value()
          ws()
          if (!eof && s.charAt(i) == ',') i += 1
          else { expect(']'); more = false }
        }
        b.result()
      }
      private def str(): String = {
        expect('"')
        val sb = new StringBuilder
        while (!eof && s.charAt(i) != '"') {
          val c = s.charAt(i)
          if (c == '\\') {
            i += 1
            if (eof) fail("eof in escape")
            s.charAt(i) match {
              case '"' => sb += '"'
              case '\\' => sb += '\\'
              case '/' => sb += '/'
              case 'b' => sb += '\b'
              case 'f' => sb += '\f'
              case 'n' => sb += '\n'
              case 'r' => sb += '\r'
              case 't' => sb += '\t'
              case 'u' =>
                if (i + 4 >= s.length) fail("eof in \\u escape")
                sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
                i += 4
              case e => fail(s"bad escape \\$e")
            }
          } else sb += c
          i += 1
        }
        expect('"')
        sb.toString
      }
      private def num(): Double = {
        val start = i
        while (!eof && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
        if (i == start) fail("expected a value")
        s.substring(start, i).toDouble
      }
    }
  }
}
