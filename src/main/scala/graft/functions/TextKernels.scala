package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text kernels as native expressions.
  *
  * [[PortableFingerprint]] computes TextAnalysis.fingerprintPortable's
  * cross-engine document fingerprint — Horner over each token's Unicode
  * code points (base 131, seed 7), then Horner over the token hashes
  * (base 31), everything mod 1e9+7 — in ONE pass over the string. The
  * composable formulation pays a higher-order function PER CHARACTER
  * (substr + ascii inside a transform inside an aggregate, all
  * interpreted); this loop is plain JVM bytecode. Bit-equality with the
  * fold formulation is asserted in OpsSpec.
  */
object TextKernelOps {
  private final val M = 1000000007L

  // Java regex \s — the exact separator class of tokens()'s split("\\s+")
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Static entry point shared by interpreted eval and codegen. */
  def compute(u: UTF8String): Long = {
    val s = u.toString
    var fp = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      if (isWs(s.charAt(i))) i += 1
      else {
        var h = 7L
        while (i < n && !isWs(s.charAt(i))) {
          val cp = s.codePointAt(i) // ascii()/DuckDB semantics: code point
          h = (h * 131L + cp) % M
          i += Character.charCount(cp)
        }
        fp = (fp * 31L + h) % M
      }
    }
    fp
  }
}

case class PortableFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"portable_fingerprint expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(TextKernelOps.compute(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableFingerprint =
    copy(child = newChild)

  override def prettyName: String = "portable_fingerprint"
}

/** Canonical text normalization shared by interpreted eval and codegen:
  * Unicode NFC (composes e+◌́ → é so visually-identical strings hash
  * identically — the step every dedup/fingerprint pipeline needs first),
  * ROOT-locale lowercase, C0/DEL control characters → space, space runs
  * collapsed, ends trimmed. Exactly mirrorable in DuckDB as
  * `trim(regexp_replace(regexp_replace(lower(nfc_normalize(x)),
  * '[\x00-\x1f\x7f]', ' ', 'g'), ' +', ' ', 'g'), ' ')` — both engines
  * implement UAX #15 NFC. One pass after the normalize; plain JVM loop
  * inside whole-stage codegen. */
object NormalizeTextOps {
  def compute(u: UTF8String): UTF8String = {
    val lower = java.text.Normalizer
      .normalize(u.toString, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val n = lower.length
    val sb = new java.lang.StringBuilder(n)
    var prevSpace = true // swallows leading spaces
    var i = 0
    while (i < n) {
      val c0 = lower.charAt(i)
      val c = if (c0 < ' ' || c0 == '\u007f') ' ' else c0
      if (c == ' ') {
        if (!prevSpace) { sb.append(' '); prevSpace = true }
      } else {
        sb.append(c); prevSpace = false
      }
      i += 1
    }
    var end = sb.length
    if (end > 0 && sb.charAt(end - 1) == ' ') end -= 1 // trailing collapse run
    UTF8String.fromString(sb.substring(0, end))
  }
}

case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"normalize_text expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    NormalizeTextOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeTextOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object TextKernels {
  def portableFingerprint(text: Column): Column =
    GraftColumnBridge.column(
      PortableFingerprint(GraftColumnBridge.expression(text)))

  def normalizeText(text: Column): Column =
    GraftColumnBridge.column(
      NormalizeText(GraftColumnBridge.expression(text)))
}
