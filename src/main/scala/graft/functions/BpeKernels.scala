package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding kernels — the tokenizer-construction tier behind
  * `graft.ops.Bpe`: corpus-trained subword vocabularies are how a
  * training pipeline counts/packs by REAL tokenizer tokens instead of
  * the whitespace or regex approximations (`bpeishTokenCount`).
  *
  * Contract (chosen to be restatable in oracle SQL, and shared by the
  * trainer's pair counts):
  *
  *  - Words are whitespace tokens (the tokenizer kernels' separator
  *    class); BPE runs WITHIN words — no cross-word merges, no
  *    end-of-word marker symbol.
  *  - A word starts as its sequence of Unicode code points (each a
  *    1-codepoint string symbol).
  *  - Applying ONE merge (l, r) is a single greedy LEFT-TO-RIGHT pass:
  *    scan the symbols; at the first/next position where s[i]=l and
  *    s[i+1]=r, replace the two by l+r and continue scanning AFTER the
  *    merged symbol (overlap-exclusive — "a a a" under (a,a) gives
  *    [aa, a]).
  *  - Applying a MERGE LIST applies each merge once, in rank order (the
  *    unrolled formulation — exactly what a chain of non-overlapping
  *    string replaces computes, which is what makes the DuckDB mirror
  *    possible). This differs from reapply-lowest-rank-until-fixpoint
  *    BPE only in the pathological case where a later merge recreates
  *    an earlier pair's adjacency out of freshly-built symbols.
  *
  * `merge_pair` rewrites a symbol array under one merge (the trainer's
  * per-round step, distributed over the vocabulary table);
  * `bpe_tokenize` takes raw text to the final subword array under a
  * plan-time merge list (codegen reference object — scan-stage, zero
  * shuffles, the 100 TB inference path). NULL in → NULL out.
  */
object BpeOps {

  /** One greedy left-to-right pass of merge (l, r) over a symbol array. */
  def mergePair(arr: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return arr
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (i + 1 < n && s.equals(l) && arr.getUTF8String(i + 1).equals(r)) {
        out += UTF8String.concat(l, r)
        i += 2
      } else {
        out += s
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Full tokenize: whitespace words → code-point symbols → the merge
    * list applied in rank order (one greedy pass each). */
  def tokenize(u: UTF8String, merges: Array[(String, String)]): ArrayData = {
    val s = u.toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String](32)
    var i = 0
    val len = s.length
    while (i < len) {
      if (TextKernelOps.isWs(s.charAt(i))) i += 1
      else {
        val start = i
        while (i < len && !TextKernelOps.isWs(s.charAt(i))) i += 1
        val word = s.substring(start, i)
        // code-point symbolization
        var syms = {
          val b = new scala.collection.mutable.ArrayBuffer[String](word.length)
          var j = 0
          while (j < word.length) {
            val cp = word.codePointAt(j)
            val k = Character.charCount(cp)
            b += word.substring(j, j + k)
            j += k
          }
          b
        }
        var m = 0
        while (m < merges.length) {
          val (l, r) = merges(m)
          if (syms.length >= 2) {
            val nb = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            var j = 0
            while (j < syms.length) {
              if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
                nb += l + r
                j += 2
              } else {
                nb += syms(j)
                j += 1
              }
            }
            syms = nb
          }
          m += 1
        }
        syms.foreach(t => out += UTF8String.fromString(t))
      }
    }
    new GenericArrayData(out.toArray[Any])
  }
}

/** `merge_pair(symbols, l, r)` — one greedy pass (see BpeOps). l and r
  * are plan-time literals: the trainer stamps each round's winning pair
  * into the plan it builds for that round. */
case class BpeMergePair(child: Expression, l: String, r: String)
    extends UnaryExpression {

  @transient private lazy val lU = UTF8String.fromString(l)
  @transient private lazy val rU = UTF8String.fromString(r)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"merge_pair expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeOps.mergePair(input.asInstanceOf[ArrayData], lU, rU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lRef = ctx.addReferenceObj("l", lU, "org.apache.spark.unsafe.types.UTF8String")
    val rRef = ctx.addReferenceObj("r", rU, "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOps.mergePair($c, $lRef, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergePair =
    copy(child = newChild)

  override def prettyName: String = "merge_pair"
}

/** `bpe_tokenize(text)` under a plan-time merge list — see BpeOps. */
case class BpeTokenize(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val mArr: Array[(String, String)] = merges.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokenize expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeOps.tokenize(input.asInstanceOf[UTF8String], mArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("merges", mArr, "scala.Tuple2[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeOps.tokenize($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)

  override def prettyName: String = "bpe_tokenize"
}

object BpeEncodeOps {
  /** Map each subword symbol to a STABLE integer id — what training
    * shards actually ship. Scheme (deterministic, artifact-derivable,
    * no corpus pass): a single-code-point symbol's id IS its code point
    * (0..0x10FFFF — the fixed base vocabulary every codepoint-level
    * tokenizer shares); merge k's output symbol gets 0x110000 + (k−1)
    * (rank order = id order, so growing the merge list only APPENDS
    * ids — old shards stay valid). If two merges produce the same
    * string, the earliest rank wins (matching CASE-order oracles). */
  def encode(u: UTF8String, merges: Array[(String, String)],
      ids: java.util.HashMap[String, Integer]): ArrayData = {
    val toks = BpeOps.tokenize(u, merges)
    val n = toks.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i).toString
      out(i) =
        if (t.codePointCount(0, t.length) == 1) t.codePointAt(0)
        else {
          val m = ids.get(t)
          if (m != null) m.intValue() else -1 // unreachable by construction
        }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `bpe_encode(text)` — tokenize under the plan-time merge list, then
  * map symbols to stable integer ids (see [[BpeEncodeOps]]). Scan-stage
  * reference-object kernel, streaming-admissible — the id sequences a
  * WebDataset training shard carries. */
case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val mArr: Array[(String, String)] = merges.toArray
  @transient private lazy val idMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    var k = 0
    while (k < mArr.length) {
      val sym = mArr(k)._1 + mArr(k)._2
      if (!m.containsKey(sym)) m.put(sym, Integer.valueOf(0x110000 + k))
      k += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeEncodeOps.encode(input.asInstanceOf[UTF8String], mArr, idMap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("merges", mArr, "scala.Tuple2[]")
    val iRef = ctx.addReferenceObj("ids", idMap, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeEncodeOps.encode($c, $mRef, $iRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeDecodeOps {
  /** Inverse of [[BpeEncodeOps]] at the SYMBOL level: each stable id maps
    * back to its subword string — a code point id (≤ 0x10FFFF) to that
    * code point, merge id 0x110000+k to merge k's concatenated symbol.
    * Returns the TOKEN ARRAY, not text: the tokenizer drops whitespace,
    * so word boundaries are not in the ids (concat the tokens to get the
    * whitespace-stripped character stream — the round-trip invariant
    * q233 gates). Total over every id [[BpeEncodeOps]] can emit,
    * including the never-emitted duplicate-symbol ranks; ids outside the
    * scheme (negative, surrogate, beyond the merge list) raise by name —
    * a corrupted shard should fail loudly, not decode to garbage. */
  def decode(arr: ArrayData, merges: Array[(String, String)]): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) throw new IllegalArgumentException(
        "bpe_decode: NULL id in the sequence — filter or impute first")
      val id = arr.getInt(i)
      out(i) =
        if (id >= 0x110000) {
          val k = id - 0x110000
          if (k >= merges.length) throw new IllegalArgumentException(
            s"bpe_decode: id $id is beyond the merge list " +
              s"(${merges.length} merges) — decode with the vocabulary " +
              "the shard was encoded under (merge lists only grow)")
          UTF8String.fromString(merges(k)._1 + merges(k)._2)
        } else if (id >= 0 && !(id >= 0xD800 && id <= 0xDFFF)) {
          UTF8String.fromString(new String(Character.toChars(id)))
        } else throw new IllegalArgumentException(
          s"bpe_decode: $id is not a valid code point or merge id")
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `bpe_decode(ids)` — map stable integer ids back to their subword
  * strings under the plan-time merge list (see [[BpeDecodeOps]]).
  * Scan-stage reference-object kernel, streaming-admissible — the
  * shard-inspection path (tar → binary_ints → bpe_decode). */
case class BpeDecode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  @transient private lazy val mArr: Array[(String, String)] = merges.toArray

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_decode expects array<int>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeDecodeOps.decode(input.asInstanceOf[ArrayData], mArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("merges", mArr, "scala.Tuple2[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeDecodeOps.decode($c, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecode =
    copy(child = newChild)

  override def prettyName: String = "bpe_decode"
}

object BpeKernels {
  def mergePair(symbols: Column, l: String, r: String): Column =
    GraftColumnBridge.column(
      BpeMergePair(GraftColumnBridge.expression(symbols), l, r))

  def bpeTokenize(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeTokenize(GraftColumnBridge.expression(text), merges))

  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeEncode(GraftColumnBridge.expression(text), merges))

  def bpeDecode(ids: Column, merges: Seq[(String, String)]): Column =
    GraftColumnBridge.column(
      BpeDecode(GraftColumnBridge.expression(ids), merges))
}
