package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over two numeric array columns (the hot inner loop of
  * every similarity/ANN operator).
  *
  * The composable formulation — `aggregate(zip_with(a, b, _*_), 0, _+_)` —
  * allocates an intermediate array per row-pair and evaluates two lambdas
  * per element through Catalyst's higher-order-function machinery. This
  * expression generates a primitive `double` accumulation loop straight
  * over the two `ArrayData` buffers: no allocation, no boxing, whole-stage
  * codegen-able. Summation order is left-to-right, identical to the fold
  * formulation, so scores are bit-for-bit unchanged.
  *
  * Semantics: null if either input is null, if lengths differ, or if any
  * element is null. Accepts float, double and tinyint element types in any
  * combination (each element is widened to double — exact for all three,
  * so int8-quantized dot products are bit-reproducible integer math).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // Can produce NULL on length mismatch or a null element even when both
  // inputs are non-nullable — without this override the inherited
  // child-nullability would make codegen emit `false = true;` (a Janino
  // compile error with silent interpreted fallback) and the interpreted
  // NULL would violate the declared non-nullability downstream.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType | ByteType, _) => true
      case _                                               => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot expects array<float|double|tinyint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    def get(arr: ArrayData, t: DataType, i: Int): Double = t match {
      case FloatType => arr.getFloat(i).toDouble
      case ByteType  => arr.getByte(i).toDouble
      case _         => arr.getDouble(i)
    }
    val (ta, tb) = (elemType(left), elemType(right))
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      sum += get(a, ta, i) * get(b, tb, i)
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      def getter(arr: String, e: Expression) = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case ByteType  => s"(double) $arr.getByte($i)"
        case _         => s"$arr.getDouble($i)"
      }
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += ${getter(a, left)} * ${getter(b, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vector_dot"
}

object VectorDot {
  /** Column-level entry point. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      VectorDot(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
