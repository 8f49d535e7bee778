package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a STRING
  * column. Spark ships no NFC builtin, and text curation at corpus scale
  * normalizes every document (combining-sequence vs precomposed spellings
  * of the same word otherwise defeat exact dedup, fingerprinting, and
  * n-gram matching — "café" can be 4 or 5 code points).
  *
  * A native expression rather than a UDF for the same reason as
  * [[VecCosine]]: it stays inside whole-stage codegen (no Scala-function
  * dispatch, no InternalRow conversion per value). The already-normalized
  * fast path (`Normalizer.isNormalized`, the overwhelmingly common case
  * for ASCII/web text) avoids the re-encode allocation entirely.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${other.catalogString}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val fn = ctx.freshName("nfcNormalizeFn")
      val helper = ctx.addNewFunction(fn,
        s"""
           |private org.apache.spark.unsafe.types.UTF8String $fn(
           |    org.apache.spark.unsafe.types.UTF8String s) {
           |  final String str = s.toString();
           |  if (java.text.Normalizer.isNormalized(str,
           |      java.text.Normalizer.Form.NFC)) {
           |    return s;
           |  }
           |  return org.apache.spark.unsafe.types.UTF8String.fromString(
           |    java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC));
           |}
         """.stripMargin)
      s"$helper($c)"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
