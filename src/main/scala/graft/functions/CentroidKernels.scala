package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Nearest-centroid assignment kernel for IVF ANN
  * ([[graft.ops.Similarity.ivfTopK]]).
  *
  * The composed formulation built `array(struct(-dot(vec, typedLit(c)),
  * lit(i)), ...)` — one array LITERAL per centroid plus an nlist-branch
  * expression tree, then array_sort + slice + transform. At production
  * parameters (nlist=4096 · dim=768) that is ~25 MB of plan constants
  * per assignment pass: codegen constant-pool pressure and a
  * plan-serialization payload shipped with every task. This kernel holds
  * the centroid matrix as ONE codegen reference object (the
  * HyperplaneSig pattern — zero plan literals at any nlist/dim) and does
  * the scoring in a primitive loop: read the vector once, nlist dot
  * products, pick the `nprobe` best.
  *
  * Semantics are bit-for-bit the composed form's (asserted in OpsSpec):
  *
  *  - score_i = −(vec · c_i), elements summed in dimension order;
  *  - order: null score first (a null vec element or a length mismatch
  *    against THAT centroid made the composed dot null, and null sorts
  *    smallest ascending), then score ascending with
  *    `java.lang.Double.compare` (NaN last, −0.0 < 0.0 — Spark's double
  *    ordering), then centroid index ascending;
  *  - returns the first min(nprobe, nlist) centroid indices; a null
  *    vector yields indices 0..min(nprobe,nlist)-1 (every dot null →
  *    index order), matching the composed form. Output is never null.
  */
object CentroidOps {

  /** `flat` is the ragged concatenation of centroids; `offs(i)`/`lens(i)`
    * locate centroid i. `tag`: 0=double, 1=float, 2=byte elements. */
  def compute(v: ArrayData, flat: Array[Double], offs: Array[Int],
      lens: Array[Int], nprobe: Int, tag: Int): ArrayData = {
    val nlist = lens.length
    val m = math.min(nprobe, nlist)
    val idx = new Array[Integer](nlist)
    var i = 0
    while (i < nlist) { idx(i) = Integer.valueOf(i); i += 1 }

    // one primitive read of the vector; a null element nulls EVERY dot
    var x: Array[Double] = null
    if (v != null) {
      val n = v.numElements()
      val buf = new Array[Double](n)
      var ok = true
      var d = 0
      while (ok && d < n) {
        if (v.isNullAt(d)) ok = false
        else {
          buf(d) = tag match {
            case 1 => v.getFloat(d).toDouble
            case 2 => v.getByte(d).toDouble
            case _ => v.getDouble(d)
          }
          d += 1
        }
      }
      if (ok) x = buf
    }

    val neg = new Array[Double](nlist)
    val isNull = new Array[Boolean](nlist)
    i = 0
    while (i < nlist) {
      if (x == null || x.length != lens(i)) isNull(i) = true
      else {
        var acc = 0.0
        val off = offs(i)
        var e = 0
        while (e < lens(i)) { acc += x(e) * flat(off + e); e += 1 }
        neg(i) = -acc
      }
      i += 1
    }

    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val (ai, bi) = (a.intValue(), b.intValue())
        if (isNull(ai) != isNull(bi)) { if (isNull(ai)) -1 else 1 }
        else {
          val c = if (isNull(ai)) 0 else java.lang.Double.compare(neg(ai), neg(bi))
          if (c != 0) c else Integer.compare(ai, bi)
        }
      }
    })
    val out = new Array[Int](m)
    i = 0
    while (i < m) { out(i) = idx(i).intValue(); i += 1 }
    new GenericArrayData(out)
  }
}

case class NearestCentroids(child: Expression, centroids: Seq[Seq[Double]],
    nprobe: Int) extends UnaryExpression {
  require(centroids.nonEmpty, "nearest_centroids: empty centroid list")
  require(nprobe >= 1, s"nearest_centroids: nprobe must be >= 1, got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids expects array<float|double|tinyint>, got ${t.simpleString}")
  }

  @transient private lazy val lens: Array[Int] = centroids.map(_.length).toArray
  @transient private lazy val offs: Array[Int] = lens.scanLeft(0)(_ + _).init
  @transient private lazy val flat: Array[Double] = {
    val m = new Array[Double](lens.sum)
    var i = 0
    centroids.foreach { c => c.foreach { v => m(i) = v; i += 1 } }
    m
  }

  private def tag: Int = child.dataType.asInstanceOf[ArrayType].elementType match {
    case FloatType => 1
    case ByteType  => 2
    case _         => 0
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    CentroidOps.compute(
      if (v == null) null else v.asInstanceOf[ArrayData],
      flat, offs, lens, nprobe, tag)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("centroids", flat, "double[]")
    val offsRef = ctx.addReferenceObj("offs", offs, "int[]")
    val lensRef = ctx.addReferenceObj("lens", lens, "int[]")
    val resultCode =
      code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.CentroidOps.compute(
            ${childGen.isNull} ? null : ${childGen.value},
            $flatRef, $offsRef, $lensRef, $nprobe, $tag);
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroids"
}

/** Max cosine of the input vector against a REFERENCE vector set — the
  * scan-stage semantic-probe kernel ([[graft.ops.Similarity.annProbeIndex]]):
  * the watchlist/benchmark vectors ride as ONE codegen reference object
  * (the NearestCentroids pattern), each row pays refs·dim multiplies and
  * never joins or shuffles. Per-pair semantics mirror
  * [[graft.ops.Similarity.cosine]] exactly: round(dot/(|a|·|b|), 9),
  * 0.0 when either norm is zero or the lengths mismatch; a null vector
  * or null element yields NULL (coalesce downstream). */
object MaxCosineOps {
  def compute(v: ArrayData, flat: Array[Double], norms: Array[Double],
      dim: Int, tag: Int): Any = {
    if (v == null) return null
    val n = v.numElements()
    val x = new Array[Double](n)
    var d = 0
    while (d < n) {
      if (v.isNullAt(d)) return null
      x(d) = tag match {
        case 1 => v.getFloat(d).toDouble
        case 2 => v.getByte(d).toDouble
        case _ => v.getDouble(d)
      }
      d += 1
    }
    var na = 0.0
    d = 0
    while (d < n) { na += x(d) * x(d); d += 1 }
    na = math.sqrt(na)
    val nRefs = norms.length
    var best = Double.NegativeInfinity
    var i = 0
    while (i < nRefs) {
      val c =
        if (n != dim || na <= 0.0 || norms(i) <= 0.0) 0.0
        else {
          var acc = 0.0
          val off = i * dim
          var e = 0
          while (e < dim) { acc += x(e) * flat(off + e); e += 1 }
          java.math.BigDecimal.valueOf(acc / (na * norms(i)))
            .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
        }
      if (c > best) best = c
      i += 1
    }
    if (nRefs == 0) null else java.lang.Double.valueOf(best)
  }
}

case class MaxCosine(child: Expression, refs: Seq[Seq[Double]])
    extends UnaryExpression {
  require(refs.nonEmpty, "max_cosine: empty reference vector set")
  require(refs.map(_.length).distinct.size == 1,
    "max_cosine: reference vectors must share one dimension")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"max_cosine expects array<float|double|tinyint>, got ${t.simpleString}")
  }

  @transient private lazy val dim: Int = refs.head.length
  @transient private lazy val flat: Array[Double] = {
    val m = new Array[Double](refs.size * dim)
    var i = 0
    refs.foreach(_.foreach { v => m(i) = v; i += 1 })
    m
  }
  @transient private lazy val norms: Array[Double] =
    refs.map(c => math.sqrt(c.map(x => x * x).sum)).toArray

  private def tag: Int = child.dataType.asInstanceOf[ArrayType].elementType match {
    case FloatType => 1
    case ByteType  => 2
    case _         => 0
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    MaxCosineOps.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], flat, norms, dim, tag)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val flatRef = ctx.addReferenceObj("refVecs", flat, "double[]")
    val normsRef = ctx.addReferenceObj("refNorms", norms, "double[]")
    val tmp = ctx.freshName("maxCos")
    val resultCode =
      code"""
        ${childGen.code}
        Object $tmp = graft.functions.MaxCosineOps.compute(
          ${childGen.isNull} ? null : ${childGen.value},
          $flatRef, $normsRef, $dim, $tag);
        boolean ${ev.isNull} = $tmp == null;
        double ${ev.value} = ${ev.isNull} ? 0.0 : ((Double) $tmp).doubleValue();
      """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildInternal(newChild: Expression): MaxCosine =
    copy(child = newChild)

  override def prettyName: String = "max_cosine"
}

object CentroidKernels {
  def nearestCentroids(vec: Column, centroids: Seq[Seq[Double]], nprobe: Int): Column =
    GraftColumnBridge.column(
      NearestCentroids(GraftColumnBridge.expression(vec), centroids, nprobe))

  def maxCosine(vec: Column, refs: Seq[Seq[Double]]): Column =
    GraftColumnBridge.column(
      MaxCosine(GraftColumnBridge.expression(vec), refs))
}
