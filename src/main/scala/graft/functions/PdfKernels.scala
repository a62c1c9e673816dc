package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PDF → text extraction kernel — the `application/pdf` sibling of
  * [[HtmlExtractOps]]: `sniff_mime` labels a real fraction of any crawl
  * as PDF, and downstream curation (dedup, language-ID, quality) wants
  * the text, not the container. Reference: the reference engine has no
  * document parsing at all (`Optimus/optimus.py:1-85` is config glue);
  * this is north-star §2.2 depth, same posture as html_extract.
  *
  * Scope — the subset that covers machine-written text PDFs (reports,
  * papers, invoices), deliberately restated-in-oracle-SQL simple:
  *
  *  - Indirect objects are found by a SEQUENTIAL scan for `N G obj`,
  *    never through the xref table: real-world PDFs routinely ship
  *    broken or rebuilt xrefs, and linear scan is the lenient posture
  *    (it is also what `pdftotext -raw`-class tools fall back to).
  *    Stream payloads are delimited by a valid direct `/Length` when it
  *    checks out against a following `endstream`, else leniently by the
  *    next `endstream` keyword.
  *  - `/Filter /FlateDecode` streams inflate via the JDK zlib; any
  *    other filter (DCT, LZW, ...) or a corrupt deflate stream makes
  *    that stream invisible rather than an error. Output per stream is
  *    capped (decompression-bomb guard) — a trillion-to-one blowup
  *    truncates instead of taking the executor down.
  *  - `/Type /ObjStm` object streams (PDF 1.5+) are expanded first:
  *    modern writers pack the catalog and page-tree dicts into
  *    compressed streams, invisible to a plain sequential scan.
  *  - Pages come from a genuine Catalog → /Pages → /Kids tree walk
  *    (cycle-guarded, /Contents as single ref or array). When the tree
  *    does not resolve — damaged file, exotic structure — the fallback
  *    is every decodable stream containing a `BT` text block, in
  *    document order. `n_pages` is the resolved page count (fallback:
  *    `/Type /Page` dict count, else content-stream count).
  *  - Inside `BT`/`ET`: `Tj` and `'`/`"` show their string operand,
  *    `TJ` shows its array's strings (kerning numbers are invisible),
  *    and any of `Td` `TD` `T*` `'` `"` starts a new line. Literal
  *    strings decode the standard escapes (`\n \r \t \b \f \( \) \\`,
  *    octal, line continuation) and balanced nested parens; `<hex>`
  *    strings decode ignoring whitespace with odd-length zero-pad.
  *    String bytes map to text as Latin-1 — fonts and /ToUnicode CMaps
  *    are out of scope (the corpus fixtures are ASCII; a wrong-encoding
  *    byte degrades to a wrong char, never an error).
  *  - Page texts join with `\n`; pages with no text contribute nothing.
  *
  * NULL bytes → NULL struct; anything else — truncated, not a PDF,
  * garbage — degrades to `(version=NULL, n_pages=0, text="")`, never a
  * throw: like html_extract, a parse that throws would name half the
  * crawl a data error. Plain JVM loop inside whole-stage codegen via
  * [[PdfExtract]]; scan-stage, zero shuffles.
  */
object PdfOps {

  private val Latin = java.nio.charset.StandardCharsets.ISO_8859_1

  /** Decompression-bomb guard: max inflated bytes per stream. */
  private val MaxInflate = 1 << 26

  private[functions] final case class PObj(
      num: Int, dict: String, data: Array[Byte])

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f' || c == 0.toChar

  private def isDelim(c: Char): Boolean =
    c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
      c == '{' || c == '}' || c == '/' || c == '%'

  // ---------------------------------------------------------------- scan

  /** Sequential `N G obj` scan (see class doc for why not xref). */
  private[functions] def parseObjects(bytes: Array[Byte]): Vector[PObj] = {
    val s = new String(bytes, Latin)
    val out = Vector.newBuilder[PObj]
    var pos = 0
    val n = s.length
    while (pos < n) {
      val oi = s.indexOf("obj", pos)
      if (oi < 0) { pos = n }
      else {
        // token check: "obj" bounded, preceded by `num ws gen ws`
        val bounded = (oi + 3 >= n || isWs(s.charAt(oi + 3)) ||
          isDelim(s.charAt(oi + 3)))
        var k = oi - 1
        var ok = bounded && k >= 0 && isWs(s.charAt(k))
        while (ok && k >= 0 && isWs(s.charAt(k))) k -= 1
        val genEnd = k
        while (ok && k >= 0 && s.charAt(k).isDigit) k -= 1
        ok = ok && k < genEnd && k >= 0 && isWs(s.charAt(k))
        while (ok && k >= 0 && isWs(s.charAt(k))) k -= 1
        val numEnd = k
        while (ok && k >= 0 && s.charAt(k).isDigit) k -= 1
        ok = ok && k < numEnd
        if (!ok) pos = oi + 3
        else {
          val num = s.substring(k + 1, numEnd + 1).toInt
          val bodyStart = oi + 3
          val streamTok = findStreamKeyword(s, bodyStart)
          val endobjNaive = s.indexOf("endobj", bodyStart)
          if (streamTok >= 0 && (endobjNaive < 0 || streamTok < endobjNaive)) {
            val dict = s.substring(bodyStart, streamTok)
            var ds = streamTok + 6
            if (ds < n && s.charAt(ds) == '\r') ds += 1
            if (ds < n && s.charAt(ds) == '\n') ds += 1
            val de = streamDataEnd(s, dict, ds)
            out += PObj(num, dict, java.util.Arrays.copyOfRange(bytes, ds, de))
            val eo = s.indexOf("endobj", de)
            pos = if (eo < 0) n else eo + 6
          } else {
            val end = if (endobjNaive < 0) n else endobjNaive
            out += PObj(num, s.substring(bodyStart, end), null)
            pos = if (endobjNaive < 0) n else endobjNaive + 6
          }
        }
      }
    }
    out.result()
  }

  /** `stream` keyword: bounded on the left, followed by EOL (so a
    * `/Subtype /stream`-ish name or `endstream` never matches). */
  private def findStreamKeyword(s: String, from: Int): Int = {
    var i = from
    while (i >= 0) {
      i = s.indexOf("stream", i)
      if (i < 0) return -1
      val leftOk = i == 0 || isWs(s.charAt(i - 1)) || s.charAt(i - 1) == '>'
      val j = i + 6
      val rightOk = j < s.length && (s.charAt(j) == '\r' || s.charAt(j) == '\n')
      if (leftOk && rightOk && !s.regionMatches(i - 3, "end", 0, 3)) return i
      i = i + 6
    }
    -1
  }

  /** End of stream payload: trust a direct /Length that lands on an
    * `endstream`, else scan leniently for the keyword. */
  private def streamDataEnd(s: String, dict: String, dataStart: Int): Int = {
    dictInt(dict, "Length") match {
      case Some(len) if len >= 0 && dataStart + len <= s.length =>
        val probe = s.indexOf("endstream", dataStart + len)
        if (probe >= 0 && probe - (dataStart + len) <= 2) return dataStart + len
      case _ => ()
    }
    val e = s.indexOf("endstream", dataStart)
    var de = if (e < 0) s.length else e
    if (de > dataStart && s.charAt(de - 1) == '\n') de -= 1
    if (de > dataStart && s.charAt(de - 1) == '\r') de -= 1
    de
  }

  // ---------------------------------------------------------- dict utils

  /** Position after `/Key` (delimiter-bounded), or -1. */
  private def keyPos(dict: String, key: String): Int = {
    var i = 0
    val t = "/" + key
    while (i >= 0) {
      i = dict.indexOf(t, i)
      if (i < 0) return -1
      val j = i + t.length
      if (j >= dict.length || isWs(dict.charAt(j)) || isDelim(dict.charAt(j)))
        return j
      i = j
    }
    -1
  }

  private[functions] def dictInt(dict: String, key: String): Option[Int] = {
    var j = keyPos(dict, key)
    if (j < 0) return None
    while (j < dict.length && isWs(dict.charAt(j))) j += 1
    val st = j
    while (j < dict.length && dict.charAt(j).isDigit) j += 1
    // a following `R` means this was an indirect reference, not a count
    var k = j
    while (k < dict.length && isWs(dict.charAt(k))) k += 1
    val kk = k
    while (k < dict.length && dict.charAt(k).isDigit) k += 1
    var r = k
    while (r < dict.length && isWs(dict.charAt(r))) r += 1
    val indirect = k > kk && r < dict.length && dict.charAt(r) == 'R'
    if (j == st || indirect) None else Some(dict.substring(st, j).toInt)
  }

  /** `/Key N G R` single reference target. */
  private[functions] def dictRef(dict: String, key: String): Option[Int] = {
    var j = keyPos(dict, key)
    if (j < 0) return None
    while (j < dict.length && isWs(dict.charAt(j))) j += 1
    val st = j
    while (j < dict.length && dict.charAt(j).isDigit) j += 1
    if (j == st) return None
    Some(dict.substring(st, j).toInt)
  }

  /** `/Key N G R` or `/Key [N G R M G R ...]` reference list. */
  private[functions] def dictRefs(dict: String, key: String): Seq[Int] = {
    var j = keyPos(dict, key)
    if (j < 0) return Nil
    while (j < dict.length && isWs(dict.charAt(j))) j += 1
    if (j < dict.length && dict.charAt(j) == '[') {
      val e = dict.indexOf(']', j)
      val body = dict.substring(j + 1, if (e < 0) dict.length else e)
      // every `N G R` triple contributes N
      val toks = body.trim.split("\\s+").filter(_.nonEmpty)
      val refs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i < toks.length) {
        if (i + 2 < toks.length && toks(i + 2) == "R" &&
          toks(i).nonEmpty && toks(i).forall(_.isDigit) &&
          toks(i + 1).nonEmpty && toks(i + 1).forall(_.isDigit)) {
          refs += toks(i).toInt
          i += 3
        } else i += 1
      }
      refs.toSeq
    } else dictRef(dict, key).toSeq
  }

  /** `/Key /Value` name check, value delimiter-bounded (`/Type /Page`
    * must not match a `/Type /Pages` dict). */
  private[functions] def hasName(dict: String, key: String, value: String): Boolean = {
    var j = keyPos(dict, key)
    if (j < 0) return false
    while (j < dict.length && isWs(dict.charAt(j))) j += 1
    if (j >= dict.length || dict.charAt(j) != '/') return false
    val t = value
    if (!dict.regionMatches(j + 1, t, 0, t.length)) return false
    val e = j + 1 + t.length
    e >= dict.length || isWs(dict.charAt(e)) || isDelim(dict.charAt(e))
  }

  // ------------------------------------------------------------- decode

  /** Stream payload → content-stream text, or null when invisible
    * (no stream, unsupported filter, corrupt deflate). */
  private[functions] def decodeStream(o: PObj): String = {
    if (o.data == null) return null
    if (keyPos(o.dict, "Filter") < 0) return new String(o.data, Latin)
    if (!hasName(o.dict, "Filter", "FlateDecode")) return null
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(o.data)
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream(math.min(o.data.length * 4, 1 << 16))
      while (!inf.finished() && out.size < MaxInflate) {
        val k = inf.inflate(buf)
        // no-progress exits: truncated input (needsInput) or an FDICT
        // preset-dictionary stream (needsDictionary) — inflate() would
        // return 0 forever, so both degrade to whatever inflated so far
        if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
          return new String(out.toByteArray, Latin)
        out.write(buf, 0, math.min(k, MaxInflate - out.size))
      }
      new String(out.toByteArray, Latin)
    } catch { case _: java.util.zip.DataFormatException => null }
    finally inf.end()
  }

  // ----------------------------------------------------- content stream

  /** BT/ET text-operator walk (see class doc for the visibility and
    * line-break contract). */
  private[functions] def extractText(cs: String): String = {
    val out = new java.lang.StringBuilder
    var needBreak = false
    var inBT = false
    // string operands seen since the last operator (TJ shows them all)
    val strs = scala.collection.mutable.ArrayBuffer.empty[String]

    def show(ss: Seq[String]): Unit = {
      if (needBreak && out.length() > 0) out.append('\n')
      needBreak = false
      ss.foreach(out.append)
    }

    var i = 0
    val n = cs.length
    while (i < n) {
      val c = cs.charAt(i)
      if (isWs(c)) i += 1
      else if (c == '%') { // comment to EOL
        while (i < n && cs.charAt(i) != '\r' && cs.charAt(i) != '\n') i += 1
      } else if (c == '(') {
        val (str, ni) = parseLiteralString(cs, i)
        strs += str; i = ni
      } else if (c == '<' && i + 1 < n && cs.charAt(i + 1) == '<') {
        i = skipDict(cs, i) // inline dict (BDC property list etc.) is invisible
      } else if (c == '<') {
        val (str, ni) = parseHexString(cs, i)
        strs += str; i = ni
      } else if (c == '[' || c == ']' || c == '{' || c == '}') {
        i += 1 // array brackets transparent: TJ shows the strings inside
      } else if (c == '/') {
        i += 1
        while (i < n && !isWs(cs.charAt(i)) && !isDelim(cs.charAt(i))) i += 1
      } else if (c.isDigit || c == '+' || c == '-' || c == '.') {
        i += 1
        while (i < n && (cs.charAt(i).isDigit || cs.charAt(i) == '.')) i += 1
      } else {
        val st = i
        while (i < n && !isWs(cs.charAt(i)) && !isDelim(cs.charAt(i))) i += 1
        cs.substring(st, i) match {
          case "BT" => inBT = true; strs.clear()
          case "ET" => inBT = false
            if (out.length() > 0) needBreak = true // next BT starts a new line
            strs.clear()
          case "Td" | "TD" | "T*" => if (inBT) needBreak = true; strs.clear()
          case "Tj" => if (inBT && strs.nonEmpty) show(Seq(strs.last)); strs.clear()
          case "TJ" => if (inBT) show(strs.toSeq); strs.clear()
          case "'" | "\"" =>
            if (inBT) { needBreak = true; if (strs.nonEmpty) show(Seq(strs.last)) }
            strs.clear()
          case _ => strs.clear() // any other operator consumes its operands
        }
      }
    }
    out.toString
  }

  /** Literal string at `(`: standard escapes, balanced nested parens. */
  private def parseLiteralString(cs: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var depth = 1
    var i = start + 1
    val n = cs.length
    while (i < n && depth > 0) {
      val c = cs.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val d = cs.charAt(i + 1)
        d match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' | ')' | '\\' => sb.append(d); i += 2
          case '\r' => i += (if (i + 2 < n && cs.charAt(i + 2) == '\n') 3 else 2)
          case '\n' => i += 2 // line continuation: no char
          case o if o >= '0' && o <= '7' =>
            var v = 0; var k = i + 1; var cnt = 0
            while (k < n && cnt < 3 && cs.charAt(k) >= '0' && cs.charAt(k) <= '7') {
              v = v * 8 + (cs.charAt(k) - '0'); k += 1; cnt += 1
            }
            sb.append((v & 0xff).toChar); i = k
          case o => sb.append(o); i += 2 // unknown escape: char is literal
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  /** Hex string at `<`: whitespace ignored, odd length zero-padded. */
  private def parseHexString(cs: String, start: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder
    var i = start + 1
    val n = cs.length
    var hi = -1
    while (i < n && cs.charAt(i) != '>') {
      val c = cs.charAt(i)
      val v = Character.digit(c, 16)
      if (v >= 0) {
        if (hi < 0) hi = v
        else { sb.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) sb.append((hi << 4).toChar)
    (sb.toString, if (i < n) i + 1 else n)
  }

  private def skipDict(cs: String, start: Int): Int = {
    var depth = 0
    var i = start
    val n = cs.length
    while (i < n) {
      if (cs.startsWith("<<", i)) { depth += 1; i += 2 }
      else if (cs.startsWith(">>", i)) {
        depth -= 1; i += 2
        if (depth == 0) return i
      } else i += 1
    }
    n
  }

  // ------------------------------------------------------- object streams

  /** Expand `/Type /ObjStm` object streams (PDF 1.5+): modern writers
    * pack the catalog/page-tree DICTS into compressed streams, which a
    * sequential scan alone never sees — without this, a 1.5+ file falls
    * back to BT-stream order and loses its declared page structure. The
    * stream's header is `/N` pairs of `objnum offset` ints; offsets are
    * relative to `/First`. Lenient like everything else here: a header
    * that doesn't parse, offsets out of range, or a corrupt stream just
    * contribute nothing. (Streams cannot nest inside an ObjStm per
    * spec, so content streams are always top-level — only dicts ride
    * along.) */
  private[functions] def expandObjectStreams(objs: Vector[PObj]): Vector[PObj] =
    objs.flatMap { o =>
      if (o.data == null || !hasName(o.dict, "Type", "ObjStm")) Vector(o)
      else {
        val dec = decodeStream(o)
        val first = dictInt(o.dict, "First").getOrElse(-1)
        val n = dictInt(o.dict, "N").getOrElse(0)
        if (dec == null || first <= 0 || first > dec.length || n <= 0) Vector(o)
        else {
          val header = dec.substring(0, first)
          val toks = header.trim.split("\\s+").filter(_.nonEmpty)
          val pairs = toks.grouped(2).collect {
            case Array(num, off) if num.forall(_.isDigit) && off.forall(_.isDigit) =>
              (num.toInt, off.toInt)
          }.take(n).toVector
          val inner = pairs.zipWithIndex.flatMap { case ((num, off), i) =>
            val start = first + off
            val end =
              if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, dec.length)
              else dec.length
            if (start >= 0 && start <= end && end <= dec.length)
              Some(PObj(num, dec.substring(start, end), null))
            else None
          }
          o +: inner
        }
      }
    }

  // ------------------------------------------------------------ assembly

  def compute(bytes: Array[Byte]): InternalRow = {
    val s8 = new String(bytes, 0, math.min(bytes.length, 16), Latin)
    val version =
      if (s8.startsWith("%PDF-")) {
        var e = 5
        while (e < s8.length && !isWs(s8.charAt(e)) && s8.charAt(e) != '%') e += 1
        s8.substring(5, e)
      } else null

    val objs = expandObjectStreams(parseObjects(bytes))
    val byNum = objs.groupBy(_.num).map { case (k, v) => k -> v.last }

    // shared (not path-scoped) visited set: a /Kids array repeating a
    // ref or a crafted page-tree DAG must neither duplicate pages nor
    // re-traverse subtrees exponentially; the cap bounds total visits
    val visited = scala.collection.mutable.HashSet.empty[Int]
    def collectPages(num: Int): Seq[PObj] =
      if (!visited.add(num) || visited.size > 4096) Nil
      else byNum.get(num) match {
        case Some(o) if hasName(o.dict, "Type", "Page") => Seq(o)
        case Some(o) if hasName(o.dict, "Type", "Pages") =>
          dictRefs(o.dict, "Kids").flatMap(collectPages)
        case _ => Nil
      }

    val pageObjs: Seq[PObj] = objs
      .find(o => o.data == null && hasName(o.dict, "Type", "Catalog"))
      .flatMap(cat => dictRef(cat.dict, "Pages"))
      .map(collectPages)
      .getOrElse(Nil)

    val (nPages, pageTexts) =
      if (pageObjs.nonEmpty) {
        val texts = pageObjs.map { p =>
          val contents = dictRefs(p.dict, "Contents")
            .flatMap(byNum.get).flatMap(o => Option(decodeStream(o)))
          // multiple /Contents streams concatenate into one (PDF 32000
          // §7.8.2 requires a token break between them)
          if (contents.isEmpty) "" else extractText(contents.mkString("\n"))
        }
        (pageObjs.size, texts)
      } else {
        // damaged/exotic structure: every decodable BT stream, in order
        val streams = objs.filter(_.data != null)
          .flatMap(o => Option(decodeStream(o)))
          .filter(_.contains("BT"))
        val declared = objs.count(o => o.data == null && hasName(o.dict, "Type", "Page"))
        (if (declared > 0) declared else streams.size,
          streams.map(extractText))
      }

    val text = pageTexts.filter(_.nonEmpty).mkString("\n")
    new GenericInternalRow(Array[Any](
      if (version == null) null else UTF8String.fromString(version),
      nPages,
      UTF8String.fromString(text)))
  }
}

case class PdfExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PdfExtract.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pdf_extract expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PdfOps.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PdfOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PdfExtract =
    copy(child = newChild)

  override def prettyName: String = "pdf_extract"
}

object PdfExtract {
  val schema: StructType = StructType(Seq(
    StructField("version", StringType, nullable = true),
    StructField("n_pages", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))
}

object PdfKernels {
  def pdfExtract(pdf: Column): Column =
    GraftColumnBridge.column(PdfExtract(GraftColumnBridge.expression(pdf)))
}
