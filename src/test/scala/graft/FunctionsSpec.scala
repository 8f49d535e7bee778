package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Text

/** Column functions agree with their pure-Scala counterparts. */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private val samples = Seq(
    "one two  three", "", "   ", "a\nb\tc", "solo",
    "a<think>x</think>b", "Hello, Việt-Nam!")

  test("tokenCount column matches Text.tokenCount") {
    val got = samples.toDF("text")
      .select(functions.tokenCount(col("text"))).as[Long].collect()
    assert(got.toSeq == samples.map(Text.tokenCount(_).toLong))
  }

  test("truncateTokens column matches Text.truncateTokens") {
    val got = Seq("a b c d e").toDF("text")
      .select(functions.truncateTokens(col("text"), 3)).as[String].head()
    assert(got == "a b c")
  }

  test("cleanThinking column matches Text.cleanThinking") {
    val texts = Seq("a<think>x</think>b", "pre<reasoning>dangling", "x\n\n\n\ny")
    val got = texts.toDF("text")
      .select(functions.cleanThinking(col("text"))).as[String].collect()
    assert(got.toSeq == texts.map(Text.cleanThinking))
  }

  test("wordNgrams: n-grams of token array; short text collapses to one") {
    val got = Seq("a b c d").toDF("text")
      .select(functions.wordNgrams(col("text"), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("text")
      .select(functions.wordNgrams(col("text"), 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
    val empty = Seq("").toDF("text")
      .select(functions.wordNgrams(col("text"), 3)).as[Seq[String]].head()
    assert(empty.isEmpty)
  }

  test("cosineSimilarity: orthogonal 0, identical 1, zero-vector guarded") {
    val df = Seq(
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(1f, 2f), Array(1f, 2f)),
      (Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
    val got = df.select(functions.cosineSimilarity(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0)) < 1e-9)
    assert(math.abs(got(1) - 1.0) < 1e-9)
    assert(got(2) == 0.0)
  }

  test("exactSum matches BigDecimal summation") {
    val vals = Seq(0.1, 0.2, 0.3, 1e9, -1e9, 0.4)
    val got = vals.toDF("v").select(functions.exactSum(col("v"))).as[Double].head()
    val want = vals.map(BigDecimal(_)).sum.toDouble
    assert(math.abs(got - want) < 1e-9)
  }

  test("fileStem extracts the filename stem") {
    val got = Seq("/data/docs/report.txt", "bare", "a/b/c.tar.gz").toDF("p")
      .select(functions.fileStem(col("p"))).as[String].collect()
    assert(got.toSeq == Seq("report", "bare", "c.tar"))
  }
}
