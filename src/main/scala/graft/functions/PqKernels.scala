package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels ([[graft.ops.Similarity.pqTrain]] et al.)
  * — the memory-compression tier of ANN at 100 TB: a dim-dimensional
  * float vector (dim·4 bytes) stores as `m` small codes (m bytes at
  * k ≤ 256), a 32–64× shrink that is what makes billion-vector indexes
  * fit a cluster's memory at all (the public FAISS IVF-PQ design).
  *
  * The codebook matrix (m subspaces × k sub-centroids × dim/m doubles)
  * rides as ONE codegen reference object — the [[CentroidKernels]] /
  * Hyperplane pattern, zero plan literals at any m·k·dim.
  *
  *  - [[PqEncodeExpr]]: vector → array<int> of m sub-centroid indices,
  *    each the L2-nearest sub-centroid of that subspace's slice
  *    (deterministic lowest-index tie-break). Null vector / length
  *    mismatch → null (damage degrades).
  *  - [[PqDecodeExpr]]: codes → the reconstructed array<double> vector
  *    (sub-centroids concatenated). Scoring composes with the existing
  *    dot/cosine columns — asymmetric-distance lookup tables are an
  *    equivalent formulation; reconstruction keeps the surface
  *    composable and the equality `adc == cosine(q, reconstruct)`
  *    definitional. Null / out-of-range / wrong-arity codes → null.
  */
object PqOps {

  /** codes(j) = argmin_c ‖vec[j·sub..) − cb[j][c]‖² (ties → lowest c). */
  def encode(v: ArrayData, flat: Array[Double], m: Int, k: Int, sub: Int,
      tag: Int): ArrayData = {
    if (v == null || v.numElements() != m * sub) return null
    val x = new Array[Double](m * sub)
    var d = 0
    while (d < x.length) {
      if (v.isNullAt(d)) return null
      x(d) = tag match {
        case 1 => v.getFloat(d).toDouble
        case 2 => v.getByte(d).toDouble
        case _ => v.getDouble(d)
      }
      d += 1
    }
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val base = j * k * sub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var acc = 0.0
        val co = base + c * sub
        var e = 0
        while (e < sub) {
          val diff = x(j * sub + e) - flat(co + e)
          acc += diff * diff
          e += 1
        }
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  def decode(codes: ArrayData, flat: Array[Double], m: Int, k: Int,
      sub: Int): ArrayData = {
    if (codes == null || codes.numElements() != m) return null
    val out = new Array[Double](m * sub)
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codes.getInt(j)
      if (c < 0 || c >= k) return null
      val co = (j * k + c) * sub
      var e = 0
      while (e < sub) { out(j * sub + e) = flat(co + e); e += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait PqGeometry { self: UnaryExpression =>
  def codebooks: Seq[Seq[Seq[Double]]]
  @transient protected lazy val m: Int = codebooks.length
  @transient protected lazy val k: Int = codebooks.head.length
  @transient protected lazy val sub: Int = codebooks.head.head.length
  @transient protected lazy val flat: Array[Double] = {
    val a = new Array[Double](m * k * sub)
    var i = 0
    codebooks.foreach(_.foreach(_.foreach { v => a(i) = v; i += 1 }))
    a
  }
  protected def validateBooks(): Unit = {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty &&
      codebooks.head.head.nonEmpty, "pq: empty codebooks")
    require(codebooks.forall(b => b.length == k && b.forall(_.length == sub)),
      "pq: ragged codebooks — every subspace needs k centroids of dim/m values")
  }
}

case class PqEncodeExpr(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqGeometry {
  validateBooks()

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double|tinyint>, got ${t.simpleString}")
  }

  private def tag: Int = child.dataType.asInstanceOf[ArrayType].elementType match {
    case FloatType => 1
    case ByteType  => 2
    case _         => 0
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    PqOps.encode(if (v == null) null else v.asInstanceOf[ArrayData],
      flat, m, k, sub, tag)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("pqbooks", flat, "double[]")
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.PqOps.encode(
            ${childGen.isNull} ? null : ${childGen.value},
            $flatRef, $m, $k, $sub, $tag);
        boolean ${ev.isNull} = ${ev.value} == null;
      """
    ev.copy(code = resultCode)
  }

  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_encode"
}

case class PqDecodeExpr(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqGeometry {
  validateBooks()

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_decode expects array<int>, got ${t.simpleString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    PqOps.decode(if (v == null) null else v.asInstanceOf[ArrayData],
      flat, m, k, sub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("pqbooks", flat, "double[]")
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.PqOps.decode(
            ${childGen.isNull} ? null : ${childGen.value},
            $flatRef, $m, $k, $sub);
        boolean ${ev.isNull} = ${ev.value} == null;
      """
    ev.copy(code = resultCode)
  }

  override def nullable: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): PqDecodeExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_decode"
}

object PqKernels {
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(
      PqEncodeExpr(GraftColumnBridge.expression(vec), codebooks))

  def pqDecode(codes: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    GraftColumnBridge.column(
      PqDecodeExpr(GraftColumnBridge.expression(codes), codebooks))
}
