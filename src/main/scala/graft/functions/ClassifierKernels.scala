package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-n-gram linear text classification kernels — the fastText-style
  * curation tier between the heuristic scorers (qualityScore, langId)
  * and the corpus-LM perplexity pass: train a logistic model over
  * hashed token buckets on labeled examples (graft.ops.Corpus
  * .trainTextClassifier — deterministic full-batch aggregates), then
  * score every document at scan-stage cost with these kernels.
  *
  * `hashed_buckets(text, dim)` maps each whitespace token to a bucket by
  * the PORTABLE Horner hash (h = fold(7, h*131 + codepoint) mod 1e9+7 —
  * the window_fingerprints/fingerprint_portable token hash, so the
  * feature space is mirrorable in oracle SQL) taken mod `dim`, in
  * document order. `LinearBucketScore` folds the bucket array against a
  * plan-time weight vector: margin = intercept + Σ_j w[b_j] — term-
  * frequency features, the hashing-trick linear-model standard — and
  * emits sigmoid(margin). The sum runs in document order so an oracle
  * restating it as an in-order fold reproduces the double bit-for-bit;
  * exp() is the only libm call (the lmPerplexity rounding posture: round
  * the score to 6 dp before hash-comparing).
  *
  * Weights ride the expression as a plan-time constant (codegen
  * reference object, the HyperplaneSig pattern) — inference is one
  * scan-stage kernel call per row, zero shuffles, the only shape worth
  * running over every document of a 100 TB corpus. NULL text → NULL.
  */
object HashedBucketOps {
  private final val M = 1000000007L

  def compute(u: UTF8String, dim: Int): ArrayData = {
    val s = u.toString
    val out = new scala.collection.mutable.ArrayBuffer[Int](32)
    var i = 0
    val len = s.length
    while (i < len) {
      if (TextKernelOps.isWs(s.charAt(i))) i += 1
      else {
        var h = 7L
        while (i < len && !TextKernelOps.isWs(s.charAt(i))) {
          val cp = s.codePointAt(i)
          h = (h * 131L + cp) % M
          i += Character.charCount(cp)
        }
        out += (h % dim).toInt
      }
    }
    new GenericArrayData(out.toArray)
  }
}

case class HashedTokenBuckets(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if dim >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"hashed_buckets dim must be >= 1, got $dim")
    case t => TypeCheckResult.TypeCheckFailure(
      s"hashed_buckets expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashedBucketOps.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashedBucketOps.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedTokenBuckets =
    copy(child = newChild)

  override def prettyName: String = "hashed_buckets"
}

object LinearScoreOps {
  /** margin = intercept + Σ_j w[b_j], summed in ARRAY ORDER (the
    * oracle's in-order fold reproduces the double exactly); an empty
    * array leaves the intercept alone. Out-of-range buckets contribute 0
    * (a dim mismatch between bucketing and training degrades, never
    * throws). */
  def compute(buckets: ArrayData, w: Array[Double], intercept: Double): Double = {
    val n = buckets.numElements()
    var acc = intercept
    var j = 0
    while (j < n) {
      val b = buckets.getInt(j)
      if (b >= 0 && b < w.length) acc += w(b)
      j += 1
    }
    1.0 / (1.0 + math.exp(-acc))
  }
}

/** Sigmoid linear score over a bucket array with plan-time weights —
  * see the file doc. `weights` is a Seq for structural expression
  * equality; the array view is cached for the hot path. */
case class LinearBucketScore(
    child: Expression,
    weights: Seq[Double],
    intercept: Double) extends UnaryExpression {

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"linear_bucket_score expects array<int> (hashed_buckets output), got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    LinearScoreOps.compute(input.asInstanceOf[ArrayData], wArr, intercept)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", wArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LinearScoreOps.compute($c, $wRef, $intercept)")
  }

  override protected def withNewChildInternal(newChild: Expression): LinearBucketScore =
    copy(child = newChild)

  override def prettyName: String = "linear_bucket_score"
}

/** Per-bucket weight lookup with plan-time weights — the TRAINING-side
  * sibling of [[LinearBucketScore]]: each epoch's margin aggregate needs
  * w[bucket] per exploded feature row. A `typedLit(w)` array literal
  * spelled the same thing but as dim doubles of codegen CONSTANT-POOL
  * text per epoch (megabytes of plan constants at production dim); here
  * the snapshot rides as a codegen reference object — zero plan literals
  * at any dim. Out-of-range buckets contribute 0.0 (dim-mismatch
  * degrades, never throws); NULL bucket → NULL (callers fold it to 0). */
case class BucketWeight(child: Expression, weights: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bucket_weight expects int (a hashed bucket), got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[Int]
    if (b >= 0 && b < wArr.length) wArr(b) else 0.0
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", wArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"(($c >= 0 && $c < $wRef.length) ? $wRef[$c] : 0.0D)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketWeight =
    copy(child = newChild)

  override def prettyName: String = "bucket_weight"
}

/** Unigram + bigram hashed buckets — the DSIR feature space (Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling"):
  * every whitespace token hashes by the portable Horner (the
  * hashed_buckets arithmetic), every ADJACENT PAIR by one more Horner
  * step over the two token hashes ((h₁·31 + h₂) mod 1e9+7 — the
  * fingerprint_portable combiner), both taken mod `dim`. Output order is
  * all unigram buckets in token order, then all bigram buckets in token
  * order — a DEFINED order, so a margin folded over it reproduces
  * bit-for-bit in an oracle's in-order list_reduce. Pure integer
  * arithmetic end to end: DuckDB respells it exactly. */
object NgramBucketOps {
  private final val M = 1000000007L

  def compute(u: UTF8String, dim: Int): ArrayData = {
    val s = u.toString
    val hs = new scala.collection.mutable.ArrayBuffer[Long](32)
    var i = 0
    val len = s.length
    while (i < len) {
      if (TextKernelOps.isWs(s.charAt(i))) i += 1
      else {
        var h = 7L
        while (i < len && !TextKernelOps.isWs(s.charAt(i))) {
          val cp = s.codePointAt(i)
          h = (h * 131L + cp) % M
          i += Character.charCount(cp)
        }
        hs += h
      }
    }
    val k = hs.length
    val out = new Array[Int](if (k >= 2) 2 * k - 1 else k)
    var j = 0
    while (j < k) { out(j) = (hs(j) % dim).toInt; j += 1 }
    j = 0
    while (j < k - 1) {
      out(k + j) = (((hs(j) * 31L + hs(j + 1)) % M) % dim).toInt
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class HashedNgramBuckets(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if dim >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"ngram_buckets dim must be >= 1, got $dim")
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_buckets expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramBucketOps.compute(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramBucketOps.compute($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): HashedNgramBuckets =
    copy(child = newChild)

  override def prettyName: String = "ngram_buckets"
}

object BucketMarginOps {
  /** margin = Σ_j w[b_j], summed in ARRAY ORDER (oracle in-order fold
    * reproduces the double exactly); empty array → 0.0; out-of-range
    * buckets contribute 0 (dim mismatch degrades, never throws). */
  def compute(buckets: ArrayData, w: Array[Double]): Double = {
    val n = buckets.numElements()
    var acc = 0.0
    var j = 0
    while (j < n) {
      val b = buckets.getInt(j)
      if (b >= 0 && b < w.length) acc += w(b)
      j += 1
    }
    acc
  }
}

/** Raw linear margin (no link function) over a bucket array with
  * plan-time weights as a codegen reference object — the DSIR
  * log-importance-weight scorer: logw(doc) = Σ_features lr[bucket].
  * Sibling of [[LinearBucketScore]] minus the sigmoid. */
case class BucketWeightSum(child: Expression, weights: Seq[Double])
    extends UnaryExpression {

  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bucket_weight_sum expects array<int> (ngram_buckets output), got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BucketMarginOps.compute(input.asInstanceOf[ArrayData], wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", wArr, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BucketMarginOps.compute($c, $wRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketWeightSum =
    copy(child = newChild)

  override def prettyName: String = "bucket_weight_sum"
}

object ClassifierKernels {
  def hashedNgramBuckets(text: Column, dim: Int): Column =
    GraftColumnBridge.column(
      HashedNgramBuckets(GraftColumnBridge.expression(text), dim))

  def bucketWeightSum(buckets: Column, weights: Array[Double]): Column =
    GraftColumnBridge.column(BucketWeightSum(
      GraftColumnBridge.expression(buckets), weights.toSeq))

  def hashedTokenBuckets(text: Column, dim: Int): Column =
    GraftColumnBridge.column(
      HashedTokenBuckets(GraftColumnBridge.expression(text), dim))

  def bucketWeight(bucket: Column, weights: Array[Double]): Column =
    GraftColumnBridge.column(
      BucketWeight(GraftColumnBridge.expression(bucket), weights.toSeq))

  def linearBucketScore(buckets: Column, weights: Array[Double],
      intercept: Double): Column =
    GraftColumnBridge.column(LinearBucketScore(
      GraftColumnBridge.expression(buckets), weights.toSeq, intercept))

  /** One-call inference: sigmoid linear score of a text column. */
  def textScore(text: Column, weights: Array[Double], intercept: Double): Column =
    linearBucketScore(hashedTokenBuckets(text, weights.length), weights, intercept)
}
