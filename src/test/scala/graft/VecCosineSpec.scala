package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VecCosineSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def df = Seq(
    (Array(1f, 0f, 0f), Array(0f, 1f, 0f)), // orthogonal
    (Array(1f, 2f, 3f), Array(1f, 2f, 3f)), // identical
    (Array(0f, 0f, 0f), Array(1f, 1f, 1f)), // zero vector
    (Array(0.3f, -0.7f, 0.2f), Array(-0.5f, 0.1f, 0.9f))).toDF("a", "b")

  test("native expression matches the higher-order-function formulation exactly") {
    val rows = df.select(
      functions.cosineSimilarityF(col("a"), col("b")).as("native"),
      functions.cosineSimilarity(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n == h, s"native=$n hof=$h") }
  }

  test("null array input yields null") {
    val withNull = Seq((Some(Array(1f)), Option.empty[Array[Float]])).toDF("a", "b")
    val got = withNull.select(functions.cosineSimilarityF(col("a"), col("b")))
      .collect().head
    assert(got.isNullAt(0))
  }

  test("vec_cosine is callable from SQL after extension registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT vec_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
      .as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("vec_dot and vec_norm are callable from SQL") {
    GraftExtensions.register(spark)
    val arr3_4 = "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))"
    assert(spark.sql(s"SELECT vec_norm($arr3_4)").as[Double].head() == 5.0)
    assert(spark.sql(s"SELECT vec_dot($arr3_4, $arr3_4)").as[Double].head() == 25.0)
  }

  test("nfc_normalize is callable from SQL") {
    GraftExtensions.register(spark)
    // decomposed e + combining acute (U+0065 U+0301) -> precomposed U+00E9
    assert(spark.sql("SELECT nfc_normalize('e\u0301')").as[String].head() ==
      "\u00e9")
  }

  test("split cosine (vec_dot / norms) is bit-identical to vec_cosine") {
    val denom = col("na") * col("nb")
    val rows = df
      .withColumn("na", functions.vecNormF(col("a")))
      .withColumn("nb", functions.vecNormF(col("b")))
      .select(
        functions.cosineSimilarityF(col("a"), col("b")).as("fused"),
        when(denom === 0.0, 0.0)
          .otherwise(functions.vecDotF(col("a"), col("b")) / denom).as("split"))
      .as[(Double, Double)].collect()
    rows.foreach { case (f, s) => assert(f == s, s"fused=$f split=$s") }
  }

  test("codegen and interpreted paths agree") {
    // force interpreted by evaluating via the expression directly
    val e = graft.functions.VecCosine(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.3f, -0.7f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(-0.5f, 0.1f), org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interpreted = e.eval(null).asInstanceOf[Double]
    val viaPlan = Seq((Array(0.3f, -0.7f), Array(-0.5f, 0.1f))).toDF("a", "b")
      .select(functions.cosineSimilarityF(col("a"), col("b"))).as[Double].head()
    assert(interpreted == viaPlan)
  }
}
