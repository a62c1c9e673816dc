package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH signature kernel.
  *
  * The composable formulation (`Similarity.hyperplaneSignatureComposed`)
  * evaluates numBits separate VectorDot calls against numBits plane
  * LITERALS plus a 2·numBits-node CASE/OR tree — numBits ArrayData
  * traversals with per-call null checks, and 32 KB+ of literals in the
  * plan at production parameters (numBits=64). This kernel does ONE pass:
  * the vector is read into a primitive buffer once, all numBits
  * projections accumulate against a plane matrix held as a single
  * reference object (derived from the same splitmix mixing — zero plan
  * literals at any dim), and the sign bits pack into one long.
  * Summation order per projection is identical (d ascending), so
  * signatures are bit-for-bit those of the composed form (asserted in
  * OpsSpec).
  *
  * Semantics mirror the composed form exactly: a null vector, a length
  * mismatch, or any null element yields signature 0L (there, each CASE
  * sees a null projection and falls to the 0 branch) — the output is
  * never null.
  */
case class HyperplaneSig(child: Expression, dim: Int, numBits: Int)
    extends UnaryExpression {
  require(dim >= 1, s"bad dim $dim")
  require(numBits >= 1 && numBits <= 64, s"numBits must be in [1,64], got $numBits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType | ByteType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig expects array<float|double|tinyint>, got ${t.simpleString}")
  }

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val planes: Array[Double] =
    Hyperplane.planeMatrix(dim, numBits)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    var sig = 0L
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() == dim) {
        val x = new Array[Double](dim)
        var ok = true
        var d = 0
        while (ok && d < dim) {
          if (a.isNullAt(d)) ok = false
          else {
            x(d) = elemType match {
              case FloatType => a.getFloat(d).toDouble
              case ByteType  => a.getByte(d).toDouble
              case _         => a.getDouble(d)
            }
            d += 1
          }
        }
        if (ok) {
          var i = 0
          while (i < numBits) {
            var acc = 0.0
            val off = i * dim
            var e = 0
            while (e < dim) { acc += x(e) * planes(off + e); e += 1 }
            if (acc > 0) sig |= (1L << i)
            i += 1
          }
        }
      }
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    val a = ctx.freshName("a")
    val x = ctx.freshName("x")
    val ok = ctx.freshName("ok")
    val d = ctx.freshName("d")
    val e = ctx.freshName("e")
    val i = ctx.freshName("i")
    val off = ctx.freshName("off")
    val acc = ctx.freshName("acc")
    val getter = elemType match {
      case FloatType => s"(double) $a.getFloat($d)"
      case ByteType  => s"(double) $a.getByte($d)"
      case _         => s"$a.getDouble($d)"
    }
    val resultCode =
      code"""
        ${childGen.code}
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          org.apache.spark.sql.catalyst.util.ArrayData $a = ${childGen.value};
          if ($a.numElements() == $dim) {
            boolean $ok = true;
            double[] $x = new double[$dim];
            for (int $d = 0; $d < $dim; $d++) {
              if ($a.isNullAt($d)) { $ok = false; break; }
              $x[$d] = $getter;
            }
            if ($ok) {
              for (int $i = 0; $i < $numBits; $i++) {
                double $acc = 0.0;
                final int $off = $i * $dim;
                for (int $e = 0; $e < $dim; $e++) {
                  $acc += $x[$e] * $planesRef[$off + $e];
                }
                if ($acc > 0) ${ev.value} |= (1L << $i);
              }
            }
          }
        }
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sig"
}

object Hyperplane {
  /** Deterministic pseudo-random plane component in [-1,1) from
    * (bit index, dimension index), splitmix-style mixing — the single
    * source of truth shared by the kernel and the composed formulation. */
  def component(i: Int, d: Int): Double = {
    var z = i.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    (z ^ (z >>> 31)).toDouble / 9.223372036854776e18
  }

  /** Flattened numBits × dim plane matrix (row i = hyperplane for bit i). */
  def planeMatrix(dim: Int, numBits: Int): Array[Double] = {
    val m = new Array[Double](numBits * dim)
    var i = 0
    while (i < numBits) {
      var d = 0
      while (d < dim) { m(i * dim + d) = component(i, d); d += 1 }
      i += 1
    }
    m
  }

  /** Column-level entry point. */
  def signature(vec: Column, dim: Int, numBits: Int): Column =
    GraftColumnBridge.column(
      HyperplaneSig(GraftColumnBridge.expression(vec), dim, numBits))
}
