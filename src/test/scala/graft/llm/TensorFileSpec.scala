package graft.llm

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** TensorFile's fail-loud contract (r11 verdict wrong #3): malformed
  * headers must name the problem, never silently drop entries; the
  * single-buffer writer must reject >2 GiB checkpoints with the ceiling
  * named, not die in ByteBuffer.allocate on an Int-truncated size.
  */
class TensorFileSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    Files.createTempDirectory("tensorfile_").resolve(name).toString

  test("F64 and F32 round-trip through the container format") {
    val t = TensorFile.Tensor(Array(2, 3),
      Array(1.0, -2.5, 3.25, 0.0, 1e-7, 42.0))
    val p64 = tmp("a.safetensors")
    TensorFile.save(p64, Seq("w" -> t))
    val got64 = TensorFile.load(p64)("w")
    assert(got64.shape.toSeq == Seq(2, 3))
    assert(got64.data.toSeq == t.data.toSeq) // F64 is exact
    val p32 = tmp("b.safetensors")
    TensorFile.save(p32, Seq("w" -> t), dtype = "F32")
    val got32 = TensorFile.load(p32)("w")
    assert(got32.data.toSeq == t.data.map(_.toFloat.toDouble).toSeq)
  }

  test("non-object header entry fails loudly with the entry named") {
    // hand-build a container whose header maps a tensor name to a bare
    // number — the partial-function version silently dropped it
    val header = """{"bogus":7}""".getBytes(StandardCharsets.UTF_8)
    val bb = ByteBuffer.allocate(8 + header.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(header.length.toLong)
    bb.put(header)
    val p = tmp("bad.safetensors")
    Files.write(Paths.get(p), bb.array())
    val ex = intercept[RuntimeException](TensorFile.load(p))
    assert(ex.getMessage.contains("bogus") &&
      ex.getMessage.contains("not a tensor object"), ex.getMessage)
  }

  test("unsupported dtype and missing fields fail loudly") {
    val header =
      """{"t":{"dtype":"I8","shape":[1],"data_offsets":[0,1]}}"""
        .getBytes(StandardCharsets.UTF_8)
    val bb = ByteBuffer.allocate(8 + header.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(header.length.toLong)
    bb.put(header)
    val p = tmp("i8.safetensors")
    Files.write(Paths.get(p), bb.array())
    val ex = intercept[RuntimeException](TensorFile.load(p))
    assert(ex.getMessage.contains("unsupported dtype"), ex.getMessage)
  }

  test("save rejects a >2 GiB checkpoint with the ceiling named") {
    // nine logical tensors sharing ONE 30M-double backing array: the
    // declared payload is ~2.16 GiB while the test allocates 240 MB
    val big = TensorFile.Tensor(Array(30000000), new Array[Double](30000000))
    val tensors = (0 until 9).map(i => s"t$i" -> big)
    val ex = intercept[IllegalArgumentException] {
      TensorFile.save(tmp("huge.safetensors"), tensors)
    }
    assert(ex.getMessage.contains("2 GiB"), ex.getMessage)
  }

  test("header-unsafe tensor names are rejected before writing") {
    val t = TensorFile.Tensor(Array(1), Array(1.0))
    val ex = intercept[IllegalArgumentException] {
      TensorFile.save(tmp("inj.safetensors"),
        Seq("""w","forged":{}""" -> t))
    }
    assert(ex.getMessage.contains("header-safe"), ex.getMessage)
  }
}
