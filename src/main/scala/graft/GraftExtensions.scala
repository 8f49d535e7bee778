package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{NfcNormalize, VecCosine, VecDot, VecNorm}

/** SparkSessionExtensions entry point: registers graft's native SQL
  * functions so `spark.sql("SELECT vec_cosine(a, b) ...")` works.
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`, or call
  * [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private[graft] val functions
      : Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "vec_cosine" -> (
      new ExpressionInfo(classOf[VecCosine].getCanonicalName, "vec_cosine"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_cosine expects 2 arguments, got ${args.length}")
        VecCosine(args(0), args(1))
      }),
    "vec_dot" -> (
      new ExpressionInfo(classOf[VecDot].getCanonicalName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"vec_dot expects 2 arguments, got ${args.length}")
        VecDot(args(0), args(1))
      }),
    "vec_norm" -> (
      new ExpressionInfo(classOf[VecNorm].getCanonicalName, "vec_norm"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"vec_norm expects 1 argument, got ${args.length}")
        VecNorm(args(0))
      }),
    "nfc_normalize" -> (
      new ExpressionInfo(classOf[NfcNormalize].getCanonicalName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          s"nfc_normalize expects 1 argument, got ${args.length}")
        NfcNormalize(args(0))
      }))

  /** Idempotently register graft functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (name, (info, builder)) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
