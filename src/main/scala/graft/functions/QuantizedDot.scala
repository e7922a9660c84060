package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: the floor-quantized dot product —
  * `sum_i floor(x_i · y_i · 1e14) / 1e14` — that every similarity,
  * k-means and PQ operator builds its distances from
  * ([[graft.operators.Similarity.sparkDot]] documents the numerics; the
  * quantization exists so Spark and the DuckDB oracle agree bit-for-bit
  * with no decimal-halfway ambiguity).
  *
  * This replaces the `zip_with`+`aggregate` HOF formulation in the hot
  * path: higher-order functions don't participate in whole-stage
  * codegen and evaluate their lambda per element through the
  * interpreted path, where this compiles to a fused primitive loop.
  * Accepts float or double arrays on either side independently (points
  * are `array<float>`, fitted centroids `array<double>`); the
  * float→double widening is exact, so the result is identical to the
  * HOF's `CAST(p AS DOUBLE)` path. Null inputs or length-mismatched
  * arrays yield null (the HOF's zip_with pads with null, which
  * nullifies its sum the same way).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quantized_dot expects float/double arrays, got ($l, $r)")
    }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "quantized_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)

  private def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // A null ELEMENT nullifies the whole result, matching the HOF twin
  // ([[graft.operators.Similarity.sparkDotHof]]): `floor(null * q)` is a
  // null zip element and `acc + null` poisons the aggregate — reading
  // ArrayData.getDouble past isNullAt would silently yield 0.0 instead.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val (xf, yf) = (leftIsFloat, rightIsFloat)
      var d = 0L
      var i = 0
      val n = x.numElements()
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
        d += math.floor(xv * yv * 1.0e14).toLong
        i += 1
      }
      d / 1.0e14
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val hasNull = ctx.freshName("hasNull")
      def get(arr: String, isFloat: Boolean, idx: String) =
        if (isFloat) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
      s"""
         |if ($x.numElements() != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $d = 0L;
         |  int $n = $x.numElements();
         |  boolean $hasNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $hasNull = true; break; }
         |    $d += (long) Math.floor(${get(x, leftIsFloat, i)} * ${get(y, rightIsFloat, i)} * 1.0E14);
         |  }
         |  if ($hasNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $d / 1.0E14;
         |  }
         |}
       """.stripMargin
    })
}
