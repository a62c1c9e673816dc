package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → text extraction kernel — the front-of-pipeline step for a web
  * corpus, where the raw crawl is markup and every downstream operator
  * (dedup, language-ID, quality, fingerprints) wants visible text.
  *
  * One pass, one state machine, no DOM: the things a 100 TB extraction
  * pass actually needs from a page are its visible text, its title, and
  * its outgoing links — not a render tree. Contract (deliberately simple
  * enough to restate in oracle SQL):
  *
  *  - `<!-- comments -->`, `<script>`/`<style>` element CONTENT, and
  *    every tag are invisible. Each removed construct contributes one
  *    space, so markup never glues adjacent words ("a<br>b" → "a b" —
  *    an extraction-tool choice, favoring token safety over faithful
  *    inline rendering).
  *  - `<title>` is RCDATA: its raw content (first element wins) becomes
  *    the `title` field — entity-decoded, whitespace-normalized, never
  *    part of the body.
  *  - `href` attributes of `<a>` tags land in `links` in document
  *    order, entity-decoded, verbatim otherwise.
  *  - Character entities decode in text, titles, and attribute values:
  *    the five XML named entities + `&nbsp;` (→ plain space; the
  *    normalizer collapses it anyway) + decimal/hex numeric references.
  *    Unknown or malformed entities stay literal.
  *  - Body text is whitespace-normalized at the end (runs → one space,
  *    ends trimmed) under the same `\s` class as the tokenizer kernels.
  *  - LENIENT like a browser, never a named error: a bare `<` that
  *    starts no tag is literal text; an unterminated tag, comment, or
  *    raw-text element silently consumes to end-of-input; `>` inside a
  *    quoted attribute value does not end its tag. Malformed HTML is the
  *    norm on the web — a parse that throws would name half the crawl a
  *    data error.
  *
  * NULL html → NULL struct (the standard null-propagating unary kernel).
  * Plain JVM loop inside whole-stage codegen via [[HtmlExtract]].
  */
object HtmlExtractOps {

  private def isWs(c: Char): Boolean = TextKernelOps.isWs(c)

  private def isTagStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '/' || c == '!' || c == '?'

  private def indexOfIgnoreCase(s: String, target: String, from: Int): Int = {
    val n = s.length - target.length
    var i = math.max(from, 0)
    while (i <= n) {
      if (s.regionMatches(true, i, target, 0, target.length)) return i
      i += 1
    }
    -1
  }

  /** Decode character entities; unknown/malformed stay literal. */
  private[functions] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      var emitted = false
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i + 1 && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val rep: String = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ if ent.charAt(0) == '#' && ent.length > 1 =>
              try {
                val cp =
                  if (ent.charAt(1) == 'x' || ent.charAt(1) == 'X')
                    Integer.parseInt(ent.substring(2), 16)
                  else Integer.parseInt(ent.substring(1))
                if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp))
                else null
              } catch { case _: NumberFormatException => null }
            case _ => null
          }
          if (rep != null) {
            out.append(rep)
            i = semi + 1
            emitted = true
          }
        }
      }
      if (!emitted) {
        out.append(c)
        i += 1
      }
    }
    out.toString
  }

  /** Runs of `\s` → one space, ends trimmed — the tokenizer kernels'
    * separator class, so extracted text tokenizes identically to text
    * that was never marked up. */
  private[functions] def normalizeWs(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (isWs(c)) pendingSpace = out.length() > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  /** href-style attribute lookup over a tag's attribute region: name
    * matched case-insensitively at a whitespace boundary (so `data-href`
    * never matches), value single-/double-quoted or bare-to-whitespace. */
  private def findAttr(attrs: String, attr: String): String = {
    val n = attrs.length
    var i = 0
    while (i < n) {
      if (attrs.regionMatches(true, i, attr, 0, attr.length) &&
        (i == 0 || isWs(attrs.charAt(i - 1)))) {
        var j = i + attr.length
        while (j < n && isWs(attrs.charAt(j))) j += 1
        if (j < n && attrs.charAt(j) == '=') {
          j += 1
          while (j < n && isWs(attrs.charAt(j))) j += 1
          if (j < n && (attrs.charAt(j) == '"' || attrs.charAt(j) == '\'')) {
            val q = attrs.charAt(j)
            val e = attrs.indexOf(q, j + 1)
            return if (e < 0) attrs.substring(j + 1) else attrs.substring(j + 1, e)
          } else {
            var e = j
            while (e < n && !isWs(attrs.charAt(e))) e += 1
            return attrs.substring(j, e)
          }
        }
      }
      i += 1
    }
    null
  }

  def compute(u: UTF8String): InternalRow = {
    val s = u.toString
    val n = s.length
    val body = new java.lang.StringBuilder(n)
    var title: String = null
    val links = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<' && s.startsWith("<!--", i)) {
        val end = s.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
        body.append(' ')
      } else if (c == '<' && i + 1 < n && isTagStart(s.charAt(i + 1))) {
        // tag: name, then attrs scanned quote-aware ('>' in quotes is data)
        var j = i + 1
        val closing = s.charAt(j) == '/'
        if (closing) j += 1
        val nameStart = j
        while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
        val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        var quote = 0.toChar
        var k = j
        while (k < n && (quote != 0 || s.charAt(k) != '>')) {
          val ck = s.charAt(k)
          if (quote != 0) { if (ck == quote) quote = 0 }
          else if (ck == '"' || ck == '\'') quote = ck
          k += 1
        }
        val attrs = s.substring(math.min(j, n), math.min(k, n))
        val selfClosed = attrs.endsWith("/")
        i = if (k < n) k + 1 else n
        body.append(' ')
        if (!closing && !selfClosed && (name == "script" || name == "style")) {
          val close = indexOfIgnoreCase(s, "</" + name, i)
          if (close < 0) i = n
          else {
            val gt = s.indexOf('>', close)
            i = if (gt < 0) n else gt + 1
          }
        } else if (!closing && name == "title") {
          val close = indexOfIgnoreCase(s, "</title", i)
          val raw = if (close < 0) s.substring(i) else s.substring(i, close)
          if (title == null) title = normalizeWs(decodeEntities(raw))
          if (close < 0) i = n
          else {
            val gt = s.indexOf('>', close)
            i = if (gt < 0) n else gt + 1
          }
        } else if (!closing && name == "a") {
          val href = findAttr(attrs, "href")
          if (href != null) links += decodeEntities(href)
        }
      } else {
        body.append(c)
        i += 1
      }
    }
    val bodyOut = normalizeWs(decodeEntities(body.toString))
    new GenericInternalRow(Array[Any](
      if (title == null) null else UTF8String.fromString(title),
      UTF8String.fromString(bodyOut),
      new GenericArrayData(links.map(l => UTF8String.fromString(l): Any).toArray)))
  }
}

case class HtmlExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HtmlExtract.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"html_extract expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlExtractOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlExtractOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)

  override def prettyName: String = "html_extract"
}

object HtmlExtract {
  val schema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("body_text", StringType, nullable = false),
    StructField("links", ArrayType(StringType, containsNull = false),
      nullable = false)))
}

object HtmlKernels {
  def htmlExtract(html: Column): Column =
    GraftColumnBridge.column(HtmlExtract(GraftColumnBridge.expression(html)))
}
