package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two ARRAY<FLOAT>
  * columns (SURVEY.md §7.3 "optional Catalyst extensions" — the one place
  * a custom expression is genuinely warranted: this is the innermost loop
  * of brute-force ANN, executed |corpus| x |queries| times).
  *
  * Versus the higher-order-function formulation
  * (aggregate(zip_with(a,b,*),...)): identical values — double-precision
  * ordered left-to-right accumulation, zero-vector guard to 0.0 — but no
  * per-element lambda dispatch and no intermediate zipped array; codegen
  * emits three tight scalar loops over the unsafe array data.
  *
  * Contract: element type FLOAT, elements non-null (null slots read as 0);
  * a null array input yields null (standard null-intolerant semantics).
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    var nx = 0.0
    i = 0
    while (i < x.numElements()) { val v = x.getFloat(i).toDouble; nx += v * v; i += 1 }
    var ny = 0.0
    i = 0
    while (i < y.numElements()) { val v = y.getFloat(i).toDouble; ny += v * v; i += 1 }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val v = ctx.freshName("v")
      val den = ctx.freshName("den")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |double $nx = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final double $v = (double) $a.getFloat($i); $nx += $v * $v;
         |}
         |double $ny = 0.0;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  final double $v = (double) $b.getFloat($i); $ny += $v * $v;
         |}
         |final double $den = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |${ev.value} = ($den == 0.0) ? 0.0 : ($dot / $den);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two ARRAY<FLOAT> columns — the pair-wise kernel of
  * all-pairs similarity when norms are precomputed per row. Splitting
  * cosine into (per-row norm) x (per-pair dot) cuts the quadratic stage's
  * flops to a third while staying bit-identical to [[VecCosine]]:
  * dot / (sqrt(nx) * sqrt(ny)) runs the same double ops in the same order
  * whether the norms are computed per pair or once per side.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an ARRAY<FLOAT> column (the per-row half of the split
  * cosine; see [[VecDot]]). Same accumulation order as [[VecCosine]]'s
  * norm loops.
  */
case class VecNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an ARRAY<FLOAT> argument, got ${other.catalogString}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    while (i < x.numElements()) { val v = x.getFloat(i).toDouble; acc += v * v; i += 1 }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => {
      val fn = ctx.freshName("vecNormFn")
      val helper = ctx.addNewFunction(fn,
        s"""
           |private double $fn(org.apache.spark.sql.catalyst.util.ArrayData arr) {
           |  double acc = 0.0;
           |  for (int i = 0; i < arr.numElements(); i++) {
           |    final double v = (double) arr.getFloat(i); acc += v * v;
           |  }
           |  return java.lang.Math.sqrt(acc);
           |}
         """.stripMargin)
      s"$helper($a)"
    })

  override protected def withNewChildInternal(newChild: Expression): VecNorm =
    copy(child = newChild)
}
