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
  @inline private[functions] def isWs(c: Char): Boolean =
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

/** Whitespace tokenization kernel — the byte-exact twin of
  * `filter(split(trim(text), "\\s+"), t => length(t) > 0)` (the engine's
  * canonical tokenizer): emit every maximal run of characters outside
  * Java regex `\s` = { space, \t, \n, \x0B, \f, \r }. Equivalence
  * argument: `trim` strips only 0x20 at the ends, `split(_, "\\s+")`
  * with its implicit limit −1 keeps leading/trailing empty fields, and
  * the length filter drops exactly those — so the composition reduces
  * to "maximal non-\s runs of the raw string" (PropertySpec pins
  * equality against the regex path on adversarial inputs). One byte
  * pass, zero regex: the separator class is pure ASCII, and UTF-8
  * continuation bytes are ≥ 0x80, so a byte scan can never split
  * inside a multi-byte character. Token values are zero-copy slices of
  * the input's byte array (`UTF8String.fromBytes(base, off, len)`).
  * The regex formulation measured 6.6 µs/op on a ~500-char doc — the
  * single hottest scan-stage expression in the bench (bm25 tokenize,
  * LM, quality tiers, token-count stats all start here); this kernel
  * measures ~0.5 µs/op.
  *
  * `dataType` mirrors the regex path's `ArrayType(StringType)` with
  * containsNull = true — not because a token can be null (it cannot),
  * but so every downstream schema stays bit-identical to the
  * expression tree it replaces. */
object WhitespaceTokensOps {
  @inline private def isWsByte(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0D)

  private val EMPTY =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(new Array[AnyRef](0))

  def compute(u: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val b = u.getBytes
    val n = b.length
    // pass 1: count tokens (exact-size output array, no growable buffer)
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) {
      if (isWsByte(b(i))) inTok = false
      else if (!inTok) { count += 1; inTok = true }
      i += 1
    }
    if (count == 0) return EMPTY
    val out = new Array[AnyRef](count)
    var o = 0
    i = 0
    while (i < n) {
      if (isWsByte(b(i))) i += 1
      else {
        val start = i
        while (i < n && !isWsByte(b(i))) i += 1
        out(o) = UTF8String.fromBytes(b, start, i - start)
        o += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Token COUNT without materializing the array — `size(tokens(x))`
    * callers (token budgets, dl, stats) only need the number. */
  def count(u: UTF8String): Int = {
    val b = u.getBytes
    val n = b.length
    var count = 0
    var i = 0
    var inTok = false
    while (i < n) {
      if (isWsByte(b(i))) inTok = false
      else if (!inTok) { count += 1; inTok = true }
      i += 1
    }
    count
  }
}

case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"whitespace_tokens expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WhitespaceTokensOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WhitespaceTokensOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)

  override def prettyName: String = "whitespace_tokens"
}

case class WhitespaceTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"whitespace_token_count expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(
      WhitespaceTokensOps.count(input.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WhitespaceTokensOps.count($c)")

  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokenCount =
    copy(child = newChild)

  override def prettyName: String = "whitespace_token_count"
}

/** Sliding-window passage fingerprints — the kernel behind exact
  * substring-level dedup ("drop repeated 50-token passages", the pass
  * every serious LLM corpus pipeline runs; cf. the dedup literature in
  * PAPERS.md). One pass over the string: tokenize with [[TextKernelOps]]'
  * separator class, Horner-hash each token (base 131, seed 7, mod 1e9+7 —
  * bit-identical to [[PortableFingerprint]]'s per-token stage), then a
  * ROLLING Horner (base 31, seed 0, same modulus) over each n-token
  * window: O(1) per window via modular removal of the outgoing token,
  * not O(n) — at 50-token windows the naive slice-fold formulation pays
  * 50× per token. Window p covers tokens [p, p+n); a doc with fewer than
  * n tokens yields an empty array. The window hash of a whole nTok-token
  * doc equals portable_fingerprint(text) — asserted in OpsSpec, and the
  * identity the DuckDB oracle mirror builds on. */
object WindowFingerprintOps {
  private final val M = 1000000007L

  def compute(u: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val s = u.toString
    val th = new scala.collection.mutable.ArrayBuffer[Long](64)
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
        th += h
      }
    }
    val m = th.length - n + 1
    if (m <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    // pow = 31^(n-1) mod M — the outgoing token's weight
    var pow = 1L
    var k = 1
    while (k < n) { pow = pow * 31L % M; k += 1 }
    val out = new Array[Long](m)
    var hw = 0L
    k = 0
    while (k < n) { hw = (hw * 31L + th(k)) % M; k += 1 }
    out(0) = hw
    var p = 1
    while (p < m) {
      hw = ((hw - th(p - 1) * pow % M + M) % M * 31L + th(p + n - 1)) % M
      out(p) = hw
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class WindowFingerprints(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"window_fingerprints window size must be >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"window_fingerprints expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WindowFingerprintOps.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowFingerprintOps.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WindowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "window_fingerprints"
}

/** Winnowing fingerprint SELECTION (Schleimer, Wilkerson & Aiken 2003 —
  * the MOSS algorithm): over the [[WindowFingerprintOps]] rolling-hash
  * stream, keep only the RIGHTMOST minimum of each window of `w`
  * consecutive hashes. The selected set is ~2/(w+1) of the full stream
  * yet GUARANTEES that any substring match of ≥ w+k−1 tokens still
  * shares a selected fingerprint — the index-compaction tier of
  * substring dedup: a 100 TB corpus' passage index shrinks ~w/2× with a
  * provable detection floor instead of an accidental one.
  *
  * A doc with fewer than `w` window hashes forms one short window (its
  * rightmost minimum is still selected — every doc with ≥ k tokens
  * contributes ≥ 1 fingerprint). Consecutive windows that select the
  * same position emit it once. Output: array<struct<pos, fp>> in
  * position order; pure integer arithmetic, exactly mirrorable. */
object WinnowOps {
  def compute(u: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val fpsArr = WindowFingerprintOps.compute(u, k)
    val m = fpsArr.numElements()
    if (m == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[AnyRef])
    val fps = new Array[Long](m)
    var i = 0
    while (i < m) { fps(i) = fpsArr.getLong(i); i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var lastPos = -1
    // Monotonic-deque sliding minimum — O(m) total instead of O(m·w):
    // the deque holds positions with strictly increasing hash values;
    // pushing position j pops every back entry with fps >= fps(j), so
    // the FRONT is always the window minimum AND the rightmost position
    // attaining it (an equal value further right evicts its elders —
    // exactly the `<=` rightmost-min tie rule of the linear rescan this
    // replaces, kept verbatim so selected fingerprints are unchanged).
    val wEff = math.min(w, m) // short docs form one window of all m hashes
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0 // live entries: dq[head, tail)
    var j = 0
    while (j < m) {
      while (tail > head && fps(dq(tail - 1)) >= fps(j)) tail -= 1
      dq(tail) = j
      tail += 1
      if (j >= wEff - 1) {
        val start = j - wEff + 1
        while (dq(head) < start) head += 1
        val best = dq(head)
        if (best != lastPos) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](best, fps(best)))
          lastPos = best
        }
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs k >= 1 and w >= 1, got k=$k w=$w")
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowOps.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowOps.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprints"
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
    // ASCII fast path (r21 opt): NFC is the identity on ASCII (every
    // ASCII char is NFC_QC=Yes with ccc=0) and ROOT lowercase over a
    // pure-ASCII string maps exactly A-Z → a-z, so the whole normalize
    // collapses to one byte pass — no String round-trip, no Normalizer.
    // Byte-identical to the general path below (PropertySpec pins
    // equality on mixed inputs).
    val bytes = u.getBytes
    val nb = bytes.length
    var a = 0
    while (a < nb && (bytes(a) & 0x80) == 0) a += 1
    if (a == nb) {
      val out = new Array[Byte](nb)
      var o = 0
      var prevSpace = true // swallows leading spaces
      var i = 0
      while (i < nb) {
        var b = bytes(i)
        if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
        if (b < 0x20 || b == 0x7f) b = ' '
        if (b == ' ') {
          if (!prevSpace) { out(o) = ' '; o += 1; prevSpace = true }
        } else {
          out(o) = b; o += 1; prevSpace = false
        }
        i += 1
      }
      if (o > 0 && out(o - 1) == ' ') o -= 1 // trailing collapse run
      return UTF8String.fromBytes(out, 0, o)
    }
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

/** Compression-ratio quality signal — deflate(bytes).length / bytes.length
  * over the UTF-8 text. The classic corpus-filtering heuristic the
  * word/line-tier rules (gopher_quality, line_stats) cannot see:
  * machine-generated boilerplate, keyword stuffing and long-range
  * repetition compress far better than natural prose (ratios ~0.1-0.3 vs
  * ~0.4-0.7), while high-entropy noise (base64 blobs, minified bundles,
  * DNA-like strings) compresses WORSE (~1.0+). Filter both tails.
  *
  * Raw DEFLATE at the fixed default level, no gzip/zlib framing — the
  * 18-byte gzip header would dominate the signal on short docs. Empty
  * or all-NULL input → NULL (no signal, not 0). Rounded to 6 dp.
  *
  * Determinism: a pure function of the bytes for a given zlib build (the
  * JDK bundles zlib); values can drift ~1% across zlib VERSIONS, so
  * oracle gates state INVARIANTS (bounds; repetition compresses better),
  * never absolute ratios — same posture as the media checksums. */
object CompressionRatioOps {
  // ONE native zlib state per executor thread, reset() between rows — a
  // per-row Deflater would pay deflateInit/deflateEnd (zlib allocates
  // its ~256 KB window/hash state) per document, rivaling the actual
  // deflate cost of short docs on a corpus-scale scan. The retained
  // native memory is bounded by the executor's thread count.
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
  }

  def compute(u: UTF8String): Any = {
    val bytes = u.getBytes
    if (bytes.length == 0) return null
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    java.lang.Double.valueOf(
      math.rint(total.toDouble / bytes.length * 1e6) / 1e6)
  }
}

case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  // empty strings yield NULL even when the child is non-nullable
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"compression_ratio expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CompressionRatioOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      Object ${ev.value}_r = graft.functions.CompressionRatioOps.compute($c);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ((java.lang.Double) ${ev.value}_r).doubleValue();
      }""")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)

  override def prettyName: String = "compression_ratio"
}

/** URL canonicalization — the pre-dedup step for WEB corpora (the same
  * page is crawled as http://Example.com/a/?utm_source=feed&b=1 and
  * https://example.com/a?b=1; dedup-by-URL must see one key). The rules
  * are OPERATIONAL so both engines reproduce them byte-for-byte:
  *
  *   1. no "://" → returned unchanged (not a URL);
  *   2. scheme and host:port lowercase (path/query case is significant);
  *   3. fragment dropped;
  *   4. default port stripped (:80 for http, :443 for https);
  *   5. trailing slashes stripped from the path ("/a/b/" == "/a/b";
  *      bare "/" collapses away);
  *   6. tracking params dropped — name ∈ utm_* | fbclid | gclid |
  *      msclkid | ref (lowercased name match);
  *   7. remaining params sorted by their full "k=v" text (binary order —
  *      ASCII-identical in Java and DuckDB), "?" dropped if none remain.
  *
  * Percent-encoding is preserved as-is (decoding can change identity).
  * Idempotent by construction. One pass of plain JVM string ops inside
  * whole-stage codegen; DuckDB mirror in the q128 oracle. */
object CanonicalizeUrlOps {
  private val tracking =
    java.util.regex.Pattern.compile("^(utm_.*|fbclid|gclid|msclkid|ref)$")

  def compute(u: UTF8String): UTF8String = {
    val s = u.toString
    val sep = s.indexOf("://")
    if (sep < 0) return u
    val scheme = s.substring(0, sep).toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(sep + 3)
    var aEnd = 0
    while (aEnd < rest.length && "/?#".indexOf(rest.charAt(aEnd)) < 0) aEnd += 1
    var hostPort = rest.substring(0, aEnd).toLowerCase(java.util.Locale.ROOT)
    if (scheme == "http" && hostPort.endsWith(":80"))
      hostPort = hostPort.substring(0, hostPort.length - 3)
    else if (scheme == "https" && hostPort.endsWith(":443"))
      hostPort = hostPort.substring(0, hostPort.length - 4)
    var tail = rest.substring(aEnd)
    val hash = tail.indexOf('#')
    if (hash >= 0) tail = tail.substring(0, hash)
    val q = tail.indexOf('?')
    var path = if (q >= 0) tail.substring(0, q) else tail
    val query = if (q >= 0) tail.substring(q + 1) else ""
    while (path.endsWith("/")) path = path.substring(0, path.length - 1)
    val kept = query.split("&", -1).toSeq
      .filter(_.nonEmpty)
      .filterNot { p =>
        val eq = p.indexOf('=')
        val name = (if (eq >= 0) p.substring(0, eq) else p)
          .toLowerCase(java.util.Locale.ROOT)
        tracking.matcher(name).matches()
      }
      // BINARY (UTF-8 byte) order, as the contract and the DuckDB oracle
      // state — java.lang.String.compareTo is UTF-16 code-unit order,
      // which disagrees above the BMP (surrogates sort below U+E000).
      .sorted(Ordering.comparatorToOrdering(
        java.util.Comparator.comparing((s: String) => UTF8String.fromString(s))))
    val qs = if (kept.isEmpty) "" else "?" + kept.mkString("&")
    UTF8String.fromString(scheme + "://" + hostPort + path + qs)
  }
}

case class CanonicalizeUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"canonical_url expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    CanonicalizeUrlOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CanonicalizeUrlOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)

  override def prettyName: String = "canonical_url"
}

object TextKernels {
  def portableFingerprint(text: Column): Column =
    GraftColumnBridge.column(
      PortableFingerprint(GraftColumnBridge.expression(text)))

  def normalizeText(text: Column): Column =
    GraftColumnBridge.column(
      NormalizeText(GraftColumnBridge.expression(text)))

  def canonicalizeUrl(url: Column): Column =
    GraftColumnBridge.column(
      CanonicalizeUrl(GraftColumnBridge.expression(url)))

  def windowFingerprints(text: Column, n: Int): Column =
    GraftColumnBridge.column(
      WindowFingerprints(GraftColumnBridge.expression(text), n))

  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(
      WinnowFingerprints(GraftColumnBridge.expression(text), k, w))
}
