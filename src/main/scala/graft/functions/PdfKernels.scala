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
  *  - Stream filters: `/FlateDecode` (JDK zlib), `/LZWDecode`
  *    (MSB-first early-change variant — the GIF codec's sibling),
  *    `/ASCII85Decode`, `/ASCIIHexDecode`, `/RunLengthDecode`, and
  *    `/Filter [...]` chains
  *    applied in order. Any other filter (DCT, JBIG2, Crypt, ...) or
  *    corrupt data makes that stream invisible rather than an error;
  *    truncated Flate/LZW input degrades to the decoded prefix. Output
  *    per stream is capped (decompression-bomb guard) — a
  *    trillion-to-one blowup truncates instead of taking the executor
  *    down.
  *  - Encrypted documents (standard security handler) decrypt when the
  *    EMPTY user password authenticates — the owner-locked crawl shape
  *    pdftotext-class tools open by default. V1/V2: Algorithm-2 RC4 key
  *    from /O, /P and the trailer /ID, Algorithm 5/4 /U verification,
  *    per-object RC4 (gen 0 — the only generation the lenient scan
  *    emits). V4 /AESV2: same key, sAlT'ed per-object AES-128-CBC.
  *    V5 R5/R6 /AESV3: SHA-256 (R5) or ISO 32000-2 Algorithm-2.B
  *    iterated-hash (R6) validation, one AES-256 file key from /UE.
  *    Unknown V/CFM, a real user password, or a missing /ID (where
  *    required) degrade to invisible streams, never an error.
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
  *  - String bytes map to text through the font SELECTED BY `Tf`:
  *    a font's embedded `/ToUnicode` CMap (bfchar + bfrange, the
  *    mechanism subset-font PDFs — most modern writers — need for any
  *    real text recovery) wins; unmapped single-byte codes fall back to
  *    the declared base encoding (`/WinAnsiEncoding`, `/MacRomanEncoding`,
  *    else Latin-1); unmapped TWO-byte codes (Type0/CID fonts without a
  *    usable CMap entry) are glyph ids with no recoverable meaning and
  *    stay invisible. Code width comes from the CMap's codespace range
  *    (clamped to 1–2 bytes), else 2 for `/Subtype /Type0`, else 1.
  *    `/Resources` resolve on the page or inherit from the nearest
  *    `/Pages` ancestor; a missing font, dict, or CMap degrades to the
  *    Latin-1 byte map, never an error. `/Encoding` dicts contribute
  *    their `/BaseEncoding` and `/Differences` (code → glyph name)
  *    reassignments, resolved through a compact Adobe-glyph-list subset
  *    (letters, digits, ASCII punctuation names, common typographic
  *    extras, and the systematic uniXXXX/uXXXX forms) at precedence
  *    CMap > Differences > base map; unsupported names fall through to
  *    the base map rather than guessing.
  *  - Page texts join with `\n`; pages with no text contribute nothing.
  *  - `n_images` / `image_bytes` inventory the `/Subtype /Image`
  *    XObject streams (count + raw payload bytes) — the multimodal
  *    signal without decoding samples; dims/encodings stay in the dict
  *    and DCTDecode payloads stay opaque.
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

  /** The `/Filter` chain of a stream dict: a single name or an array of
    * names (applied in order), with the standard abbreviations. */
  private def filterNames(dict: String): Seq[String] = {
    var j = keyPos(dict, "Filter")
    if (j < 0) return Nil
    while (j < dict.length && isWs(dict.charAt(j))) j += 1
    def nameAt(k0: Int): (String, Int) = {
      var k = k0 + 1
      val st = k
      while (k < dict.length && !isWs(dict.charAt(k)) && !isDelim(dict.charAt(k))) k += 1
      (dict.substring(st, k), k)
    }
    if (j < dict.length && dict.charAt(j) == '/') Seq(nameAt(j)._1)
    else if (j < dict.length && dict.charAt(j) == '[') {
      val out = Seq.newBuilder[String]
      var k = j + 1
      while (k < dict.length && dict.charAt(k) != ']') {
        if (dict.charAt(k) == '/') { val (n, nk) = nameAt(k); out += n; k = nk }
        else k += 1
      }
      out.result()
    } else Seq("?") // a ref or junk where a name belongs: unsupported
  }

  /** zlib inflate: partial output on truncation or an FDICT
    * preset-dictionary stream (inflate() makes no progress on either),
    * null on corrupt data. */
  private def inflateBytes(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val buf = new Array[Byte](8192)
      val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 16))
      while (!inf.finished() && out.size < MaxInflate) {
        val k = inf.inflate(buf)
        if (k == 0 && (inf.needsInput() || inf.needsDictionary()))
          return out.toByteArray
        out.write(buf, 0, math.min(k, MaxInflate - out.size))
      }
      out.toByteArray
    } catch { case _: java.util.zip.DataFormatException => null }
    finally inf.end()
  }

  /** PDF LZWDecode — MSB-first 9→12-bit codes, Clear=256, EOD=257,
    * `/EarlyChange` (default 1: the width grows one code early — the
    * xpdf/pdf.js rule: after assigning entry `next−1`, grow when
    * `next + earlyChange ≥ 2^width`). The GIF codec in ops/Gif.scala is
    * the LSB-first sibling; PDF's variant differs in bit order, fixed
    * 8-bit roots, and the early-change schedule. Truncated input →
    * partial output (the inflate posture); a corrupt code → null. */
  private[graft] def lzwDecodeBytes(data: Array[Byte], earlyChange: Int): Array[Byte] = {
    val Clear = 256
    val Eod = 257
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    val out = new java.io.ByteArrayOutputStream(math.min(data.length * 4, 1 << 16))
    var codeSize = 9
    var next = 258
    var prev = -1
    var oldFirst: Byte = 0
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    while (out.size < MaxInflate) {
      while (bitCnt < codeSize && pos < data.length) {
        bitBuf = (bitBuf << 8) | (data(pos) & 0xff); bitCnt += 8; pos += 1
      }
      if (bitCnt < codeSize) return out.toByteArray // truncated: lenient
      val code = ((bitBuf >>> (bitCnt - codeSize)) & ((1L << codeSize) - 1)).toInt
      bitCnt -= codeSize
      if (code == Clear) { codeSize = 9; next = 258; prev = -1 }
      else if (code == Eod) return out.toByteArray
      else {
        if (code > next || code == Eod || (code == next && prev < 0)) return null
        var sp = 0
        var c = code
        if (code == next) { stack(sp) = oldFirst; sp += 1; c = prev } // KwKwK
        while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        if (c >= 256) return null // a chain can only root in a literal byte
        val first = c.toByte
        oldFirst = first
        out.write(first)
        while (sp > 0) { sp -= 1; out.write(stack(sp)) }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next + earlyChange >= (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out.toByteArray
  }

  /** ASCII85Decode (Adobe base-85): whitespace ignored, `z` = four zero
    * bytes, optional `<~` leader, `~` ends data, a final group of n
    * chars yields n−1 bytes. Invalid chars → null. */
  private[functions] def ascii85DecodeBytes(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 8)
    def flush(tuple: Long, cnt: Int): Boolean = {
      if (cnt == 0) return true
      if (cnt == 1) return false // 1-char final group is invalid
      var t = tuple
      var k = cnt
      while (k < 5) { t = t * 85 + 84; k += 1 } // pad with 'u'
      var shift = 24
      var w = 0
      while (w < cnt - 1) { out.write(((t >>> shift) & 0xff).toInt); shift -= 8; w += 1 }
      true
    }
    var tuple = 0L
    var cnt = 0
    var i = if (data.length >= 2 && data(0) == '<' && data(1) == '~') 2 else 0
    while (i < data.length) {
      val c = (data(i) & 0xff).toChar
      if (c == '~') return if (flush(tuple, cnt)) out.toByteArray else null
      else if (isWs(c)) ()
      else if (c == 'z' && cnt == 0) { out.write(0); out.write(0); out.write(0); out.write(0) }
      else if (c >= '!' && c <= 'u') {
        tuple = tuple * 85 + (c - '!')
        cnt += 1
        if (cnt == 5) {
          out.write(((tuple >>> 24) & 0xff).toInt); out.write(((tuple >>> 16) & 0xff).toInt)
          out.write(((tuple >>> 8) & 0xff).toInt); out.write((tuple & 0xff).toInt)
          tuple = 0; cnt = 0
        }
      } else return null
      if (out.size > MaxInflate) return out.toByteArray
      i += 1
    }
    if (flush(tuple, cnt)) out.toByteArray else null // missing ~>: lenient
  }

  /** ASCIIHexDecode: hex pairs, whitespace ignored, `>` ends, odd length
    * zero-padded. Invalid chars → null. */
  private[functions] def asciiHexDecodeBytes(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 4)
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = (data(i) & 0xff).toChar
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4)
        return out.toByteArray
      } else if (!isWs(c)) {
        val v = Character.digit(c, 16)
        if (v < 0) return null
        if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    out.toByteArray
  }

  /** RunLengthDecode (PDF 32000 §7.4.5): length byte n < 128 copies the
    * next n+1 bytes literally; n > 128 repeats the next byte 257−n
    * times; n == 128 is EOD. A run truncated mid-stream decodes what it
    * has (damage degrades); output capped like the inflater. */
  private[graft] def runLengthDecodeBytes(data: Array[Byte]): Array[Byte] = {
    val cap = 1 << 24
    val out = new java.io.ByteArrayOutputStream(data.length * 2 + 16)
    var i = 0
    while (i < data.length && out.size < cap) {
      val n = data(i) & 0xff
      i += 1
      if (n == 128) return out.toByteArray // EOD
      else if (n < 128) {
        val len = math.min(n + 1, data.length - i)
        if (len > 0) out.write(data, i, len)
        i += n + 1
      } else if (i < data.length) {
        val b = data(i)
        var k = 257 - n
        while (k > 0 && out.size < cap) { out.write(b); k -= 1 }
        i += 1
      }
    }
    out.toByteArray
  }

  /** Stream payload → content-stream text, or null when invisible (no
    * stream, an unsupported filter in the chain, corrupt data). Filters
    * apply in declared order (`/Filter [/ASCII85Decode /FlateDecode]`
    * un-85s, then inflates). */
  private[functions] def decodeStream(o: PObj): String = {
    if (o.data == null) return null
    val filters = filterNames(o.dict)
    var data = o.data
    filters.foreach { f =>
      val next = f match {
        case "FlateDecode" | "Fl" => inflateBytes(data)
        case "LZWDecode" | "LZW" =>
          lzwDecodeBytes(data, dictInt(o.dict, "EarlyChange").getOrElse(1))
        case "ASCII85Decode" | "A85" => ascii85DecodeBytes(data)
        case "ASCIIHexDecode" | "AHx" => asciiHexDecodeBytes(data)
        case "RunLengthDecode" | "RL" => runLengthDecodeBytes(data)
        case _ => null // DCT, JBIG2, Crypt, ... — invisible, not an error
      }
      if (next == null) return null
      data = next
    }
    new String(data, Latin)
  }

  // ------------------------------------------------------- fonts / CMaps

  /** Per-font decode recipe: `toUnicode` (code → text, null when the
    * font has no usable CMap), code width in bytes (1 or 2), and the
    * base single-byte encoding (0 = Latin-1, 1 = WinAnsi, 2 = MacRoman)
    * for codes the CMap does not cover. */
  private[functions] final case class FontInfo(
      toUnicode: java.util.HashMap[Integer, String],
      codeBytes: Int,
      baseEnc: Int,
      diffs: java.util.HashMap[Integer, String] = null)

  private[functions] val LatinFont = FontInfo(null, 1, 0)

  /** Windows-1252 0x80–0x9F (everywhere else it IS Latin-1; code
    * points with no Windows-1252 assignment keep their C1 value). */
  private val WinAnsiHigh: Array[Char] =
    ("\u20AC\u0081\u201A\u0192\u201E\u2026\u2020\u2021" +
      "\u02C6\u2030\u0160\u2039\u0152\u008D\u017D\u008F" +
      "\u0090\u2018\u2019\u201C\u201D\u2022\u2013\u2014" +
      "\u02DC\u2122\u0161\u203A\u0153\u009D\u017E\u0178").toCharArray

  /** MacRoman 0x80–0xFF (the Unicode.org MACINTOSH mapping; 0xF0 is
    * the Apple private-use logo U+F8FF). */
  private val MacRomanHigh: Array[Char] =
    ("\u00C4\u00C5\u00C7\u00C9\u00D1\u00D6\u00DC\u00E1" +
      "\u00E0\u00E2\u00E4\u00E3\u00E5\u00E7\u00E9\u00E8" +
      "\u00EA\u00EB\u00ED\u00EC\u00EE\u00EF\u00F1\u00F3" +
      "\u00F2\u00F4\u00F6\u00F5\u00FA\u00F9\u00FB\u00FC" +
      "\u2020\u00B0\u00A2\u00A3\u00A7\u2022\u00B6\u00DF" +
      "\u00AE\u00A9\u2122\u00B4\u00A8\u2260\u00C6\u00D8" +
      "\u221E\u00B1\u2264\u2265\u00A5\u00B5\u2202\u2211" +
      "\u220F\u03C0\u222B\u00AA\u00BA\u03A9\u00E6\u00F8" +
      "\u00BF\u00A1\u00AC\u221A\u0192\u2248\u2206\u00AB" +
      "\u00BB\u2026\u00A0\u00C0\u00C3\u00D5\u0152\u0153" +
      "\u2013\u2014\u201C\u201D\u2018\u2019\u00F7\u25CA" +
      "\u00FF\u0178\u2044\u20AC\u2039\u203A\uFB01\uFB02" +
      "\u2021\u00B7\u201A\u201E\u2030\u00C2\u00CA\u00C1" +
      "\u00CB\u00C8\u00CD\u00CE\u00CF\u00CC\u00D3\u00D4" +
      "\uF8FF\u00D2\u00DA\u00DB\u00D9\u0131\u02C6\u02DC" +
      "\u00AF\u02D8\u02D9\u02DA\u00B8\u02DD\u02DB\u02C7").toCharArray

  private def baseChar(code: Int, enc: Int): Char = enc match {
    case 1 if code >= 0x80 && code <= 0x9F => WinAnsiHigh(code - 0x80)
    case 2 if code >= 0x80 && code <= 0xFF => MacRomanHigh(code - 0x80)
    case _ => code.toChar
  }

  /** CMap-entry bomb guard: max (code → text) mappings per font. */
  private val MaxCMapEntries = 1 << 16

  /** Parse a /ToUnicode CMap stream: bfchar + bfrange sections → the
    * (code → UTF-16 text) map, plus the code width in bytes from the
    * first codespace lo bound (0 when the stream declares none). CMap
    * streams are PostScript-flavored but the mapping subset is fully
    * covered by hex strings, `[`/`]`, and the begin/end keywords —
    * everything else (names, numbers, literal strings, the
    * /CIDSystemInfo dict) is skipped. Lenient throughout: a malformed
    * section contributes nothing. */
  private[functions] def parseCMap(cm: String): (java.util.HashMap[Integer, String], Int) = {
    val map = new java.util.HashMap[Integer, String]()
    var codeBytes = 0
    var srcLen = 0 // inferred from the first bfchar/bfrange lo when no codespace
    var section = 0 // 0 none, 1 codespace, 2 bfchar, 3 bfrange
    // pending hex operands of the current section entry
    val pend = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var inArray = false
    val arr = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def codeOf(b: Array[Byte]): Int = {
      var v = 0
      var i = math.max(0, b.length - 4)
      while (i < b.length) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      v
    }
    def utf16(b: Array[Byte]): String = {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + 1 < b.length) {
        sb.append((((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)).toChar); i += 2
      }
      if (i < b.length) sb.append((b(i) & 0xff).toChar) // odd tail: lenient
      sb.toString
    }
    def incLast(s: String, k: Int): String =
      if (s.isEmpty) s
      else s.substring(0, s.length - 1) + ((s.charAt(s.length - 1) + k).toChar)
    def put(code: Int, txt: String): Unit =
      if (map.size < MaxCMapEntries) map.put(code, txt)

    def emitRange(): Unit = {
      // lo hi dst — dst either one hex (sequential, last UTF-16 unit
      // increments per spec) or an array of per-code hex strings
      if (pend.size == 2 && arr.nonEmpty) {
        val lo = codeOf(pend(0))
        arr.zipWithIndex.foreach { case (d, k) => put(lo + k, utf16(d)) }
      } else if (pend.size == 3) {
        val lo = codeOf(pend(0)); val hi = codeOf(pend(1))
        val base = utf16(pend(2))
        var k = 0
        val n = math.min(hi - lo, MaxCMapEntries)
        while (k <= n) { put(lo + k, incLast(base, k)); k += 1 }
      }
      pend.clear(); arr.clear()
    }

    var i = 0
    val n = cm.length
    while (i < n) {
      val c = cm.charAt(i)
      if (isWs(c)) i += 1
      else if (c == '%') { while (i < n && cm.charAt(i) != '\r' && cm.charAt(i) != '\n') i += 1 }
      else if (c == '<' && i + 1 < n && cm.charAt(i + 1) == '<') i = skipDict(cm, i)
      else if (c == '<') {
        val st = i + 1
        var j = st
        val bb = new java.io.ByteArrayOutputStream()
        var hi = -1
        while (j < n && cm.charAt(j) != '>') {
          val v = Character.digit(cm.charAt(j), 16)
          if (v >= 0) { if (hi < 0) hi = v else { bb.write((hi << 4) | v); hi = -1 } }
          j += 1
        }
        if (hi >= 0) bb.write(hi << 4)
        i = if (j < n) j + 1 else n
        val bytes = bb.toByteArray
        section match {
          case 1 => // codespace: first lo bound fixes the width
            if (codeBytes == 0 && bytes.nonEmpty) codeBytes = bytes.length
          case 2 =>
            if (srcLen == 0 && bytes.nonEmpty) srcLen = bytes.length
            pend += bytes
            if (pend.size == 2) { put(codeOf(pend(0)), utf16(pend(1))); pend.clear() }
          case 3 =>
            if (inArray) arr += bytes
            else {
              if (srcLen == 0 && bytes.nonEmpty) srcLen = bytes.length
              pend += bytes
              if (pend.size == 3) emitRange()
            }
          case _ => ()
        }
      } else if (c == '(') { i = parseLiteralString(cm, i)._2 }
      else if (c == '[') { inArray = true; arr.clear(); i += 1 }
      else if (c == ']') { inArray = false; if (pend.size == 2) emitRange(); i += 1 }
      else if (c == '/') {
        i += 1
        while (i < n && !isWs(cm.charAt(i)) && !isDelim(cm.charAt(i))) i += 1
      } else {
        val st = i
        while (i < n && !isWs(cm.charAt(i)) && !isDelim(cm.charAt(i))) i += 1
        cm.substring(st, i) match {
          case "begincodespacerange" => section = 1
          case "beginbfchar" => section = 2; pend.clear()
          case "beginbfrange" => section = 3; pend.clear(); arr.clear(); inArray = false
          case "endcodespacerange" | "endbfchar" | "endbfrange" =>
            section = 0; pend.clear(); arr.clear(); inArray = false
          case _ => () // numbers, cmap name ops, usecmap — not mapping data
        }
      }
    }
    (if (map.isEmpty) null else map,
      if (codeBytes > 0) codeBytes else srcLen)
  }

  /** Balanced `<<...>>` substring starting at `start` (pointing at the
    * first `<`), or null when unbalanced. */
  private def balancedDictAt(s: String, start: Int): String = {
    val e = skipDict(s, start)
    if (e > start) s.substring(start, e) else null
  }

  /** `/Key <<inline>>` or `/Key N G R` → the dict string. */
  private def inlineOrRefDict(dict: String, key: String,
      byNum: Map[Int, PObj]): Option[String] = {
    var j = keyPos(dict, key)
    if (j < 0) return None
    while (j < dict.length && isWs(dict.charAt(j))) j += 1
    if (dict.startsWith("<<", j)) Option(balancedDictAt(dict, j))
    else dictRef(dict, key).flatMap(byNum.get).map(_.dict)
  }

  /** Entries of a font-map dict body (`<< /F1 7 0 R /F2 <<...>> >>`):
    * name → font dict string. */
  private def fontDictEntries(body: String,
      byNum: Map[Int, PObj]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    val n = body.length
    while (i < n) {
      if (body.charAt(i) == '/') {
        val st = i + 1
        var j = st
        while (j < n && !isWs(body.charAt(j)) && !isDelim(body.charAt(j))) j += 1
        val name = body.substring(st, j)
        while (j < n && isWs(body.charAt(j))) j += 1
        if (body.startsWith("<<", j)) {
          val d = balancedDictAt(body, j)
          if (d != null) { out += name -> d; i = j + d.length }
          else i = j
        } else if (j < n && body.charAt(j).isDigit) {
          var k = j
          while (k < n && body.charAt(k).isDigit) k += 1
          val num = body.substring(j, k).toInt
          var r = k
          while (r < n && isWs(body.charAt(r))) r += 1
          while (r < n && body.charAt(r).isDigit) r += 1
          while (r < n && isWs(body.charAt(r))) r += 1
          if (r < n && body.charAt(r) == 'R') {
            byNum.get(num).foreach(o => out += name -> o.dict)
            i = r + 1
          } else i = j
        } else i = j
      } else i += 1
    }
    out.result()
  }

  /** Font dict → decode recipe; `cache` de-dups CMap parses across pages
    * sharing a font. */
  private def fontInfoOf(fontDict: String, byNum: Map[Int, PObj],
      cache: scala.collection.mutable.HashMap[String, FontInfo]): FontInfo =
    cache.getOrElseUpdate(fontDict, {
      val (tu, cmapWidth) = dictRef(fontDict, "ToUnicode")
        .flatMap(byNum.get)
        .flatMap(o => Option(decodeStream(o)))
        .map(parseCMap)
        .getOrElse((null, 0))
      val width0 =
        if (cmapWidth > 0) cmapWidth
        else if (hasName(fontDict, "Subtype", "Type0")) 2
        else 1
      // /Encoding: a bare name, or a dict (inline or ref) carrying
      // /BaseEncoding and a /Differences array of code-to-glyph-name
      // reassignments (the pre-ToUnicode subset-font mechanism)
      val encDict = inlineOrRefDict(fontDict, "Encoding", byNum)
      val enc =
        if (hasName(fontDict, "Encoding", "WinAnsiEncoding") ||
          encDict.exists(hasName(_, "BaseEncoding", "WinAnsiEncoding"))) 1
        else if (hasName(fontDict, "Encoding", "MacRomanEncoding") ||
          encDict.exists(hasName(_, "BaseEncoding", "MacRomanEncoding"))) 2
        else 0
      val diffs = encDict.map(parseDifferences).filter(!_.isEmpty).orNull
      FontInfo(tu, math.max(1, math.min(2, width0)), enc, diffs)
    })

  /** Parse an /Encoding dict's `/Differences [ code /name ... ]` array:
    * an integer sets the current code, each following glyph name assigns
    * it (and increments). Names resolve through [[glyphText]] — a name
    * outside the supported set leaves that code on the base encoding
    * (lenient: wrong text is worse than the base map's guess). */
  private[graft] def parseDifferences(encDict: String): java.util.HashMap[Integer, String] = {
    val out = new java.util.HashMap[Integer, String]
    var i = keyPos(encDict, "Differences")
    if (i < 0) return out
    while (i < encDict.length && encDict.charAt(i) != '[') i += 1
    if (i >= encDict.length) return out
    i += 1
    var code = -1
    while (i < encDict.length && encDict.charAt(i) != ']' && out.size < 512) {
      val c = encDict.charAt(i)
      if (c >= '0' && c <= '9') {
        var j = i
        while (j < encDict.length && encDict.charAt(j).isDigit) j += 1
        code = encDict.substring(i, j).toInt
        i = j
      } else if (c == '/') {
        val st = i + 1
        var j = st
        while (j < encDict.length && !isWs(encDict.charAt(j)) &&
          !isDelim(encDict.charAt(j))) j += 1
        if (code >= 0 && code <= 255) {
          val t = glyphText(encDict.substring(st, j))
          if (t != null) out.put(code, t)
          code += 1
        }
        i = j
      } else i += 1
    }
    out
  }

  /** Compact Adobe-glyph-list subset: single letters/digits, ASCII
    * punctuation names, the common typographic extras, and the uniXXXX /
    * uXXXX[XX] systematic forms. Unknown names → null (fall through to
    * the base encoding). */
  private[graft] def glyphText(name: String): String = {
    if (name.length == 1 && name.charAt(0).isLetter) return name
    if (name.startsWith("uni") && name.length >= 7) {
      try return new String(Character.toChars(
        Integer.parseInt(name.substring(3, 7), 16)))
      catch { case _: NumberFormatException => return null }
    }
    if (name.length >= 5 && name.length <= 7 && name.charAt(0) == 'u' &&
      name.drop(1).forall(ch => Character.digit(ch, 16) >= 0)) {
      try return new String(Character.toChars(
        Integer.parseInt(name.substring(1), 16)))
      catch { case _: Exception => return null }
    }
    GlyphNames.get(name)
  }

  private val GlyphNames: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]
    val pairs = Seq(
      "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3",
      "four" -> "4", "five" -> "5", "six" -> "6", "seven" -> "7",
      "eight" -> "8", "nine" -> "9",
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"",
      "numbersign" -> "#", "dollar" -> "$", "percent" -> "%",
      "ampersand" -> "&", "quotesingle" -> "'", "parenleft" -> "(",
      "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@",
      "bracketleft" -> "[", "backslash" -> "\\", "bracketright" -> "]",
      "asciicircum" -> "^", "underscore" -> "_", "grave" -> "`",
      "braceleft" -> "{", "bar" -> "|", "braceright" -> "}",
      "asciitilde" -> "~",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
      "ellipsis" -> "…", "dagger" -> "†", "daggerdbl" -> "‡",
      "Euro" -> "€", "trademark" -> "™", "copyright" -> "©",
      "registered" -> "®", "degree" -> "°",
      "plusminus" -> "±", "section" -> "§",
      "paragraph" -> "¶", "sterling" -> "£", "yen" -> "¥",
      "cent" -> "¢", "florin" -> "ƒ",
      "fi" -> "ﬁ", "fl" -> "ﬂ",
      "AE" -> "Æ", "ae" -> "æ", "OE" -> "Œ",
      "oe" -> "œ", "germandbls" -> "ß",
      "adieresis" -> "ä", "odieresis" -> "ö",
      "udieresis" -> "ü", "Adieresis" -> "Ä",
      "Odieresis" -> "Ö", "Udieresis" -> "Ü",
      "aring" -> "å", "Aring" -> "Å",
      "eacute" -> "é", "egrave" -> "è", "agrave" -> "à",
      "ccedilla" -> "ç", "ntilde" -> "ñ")
    pairs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** The `/Font` map visible to a page: its own `/Resources` or the
    * inherited one. */
  private[functions] def pageFonts(pageDict: String, inherited: Option[String],
      byNum: Map[Int, PObj],
      cache: scala.collection.mutable.HashMap[String, FontInfo]): Map[String, FontInfo] =
    inlineOrRefDict(pageDict, "Resources", byNum).orElse(inherited)
      .flatMap(res => inlineOrRefDict(res, "Font", byNum))
      .map(fontDictEntries(_, byNum).map { case (k, d) =>
        k -> fontInfoOf(d, byNum, cache) })
      .getOrElse(Map.empty)

  /** Shown-string bytes → text under the `Tf`-selected font (see class
    * doc; `f == null` — no font selected or unknown name — is the
    * Latin-1 identity, the pre-font behavior). */
  private def decodeShown(s: String, f: FontInfo): String = {
    if (f == null || (f.toUnicode == null && f.codeBytes == 1 &&
      f.baseEnc == 0 && f.diffs == null))
      return s
    val sb = new java.lang.StringBuilder
    if (f.codeBytes == 2) {
      var i = 0
      while (i < s.length) {
        val code =
          if (i + 1 < s.length) ((s.charAt(i) << 8) | s.charAt(i + 1))
          else s.charAt(i).toInt // truncated final code: lenient
        val m = if (f.toUnicode == null) null else f.toUnicode.get(code)
        if (m != null) sb.append(m)
        // unmapped 2-byte codes are glyph ids — invisible, like an
        // unsupported stream filter
        i += 2
      }
    } else {
      var i = 0
      while (i < s.length) {
        val code = s.charAt(i).toInt
        // precedence: ToUnicode CMap > /Differences glyph name > base map
        val m = if (f.toUnicode == null) null else f.toUnicode.get(code)
        val d = if (m != null || f.diffs == null) null else f.diffs.get(code)
        if (m != null) sb.append(m)
        else if (d != null) sb.append(d)
        else sb.append(baseChar(code, f.baseEnc))
        i += 1
      }
    }
    sb.toString
  }

  // ----------------------------------------------------- content stream

  /** BT/ET text-operator walk (see class doc for the visibility,
    * line-break, and font-decode contract). */
  private[functions] def extractText(cs: String,
      fonts: Map[String, FontInfo] = Map.empty): String = {
    val out = new java.lang.StringBuilder
    var needBreak = false
    var inBT = false
    // font state: set by `/Name size Tf`, persists across BT blocks and
    // concatenated /Contents streams (PDF graphics state); null = the
    // Latin-1 identity (no font selected, or a name the page's
    // resources don't declare)
    var curFont: FontInfo = null
    var lastName: String = null
    // string operands seen since the last operator (TJ shows them all)
    val strs = scala.collection.mutable.ArrayBuffer.empty[String]

    def show(ss: Seq[String]): Unit = {
      if (needBreak && out.length() > 0) out.append('\n')
      needBreak = false
      ss.foreach(s => out.append(decodeShown(s, curFont)))
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
        val st = i
        while (i < n && !isWs(cs.charAt(i)) && !isDelim(cs.charAt(i))) i += 1
        lastName = cs.substring(st, i)
      } else if (c.isDigit || c == '+' || c == '-' || c == '.') {
        i += 1
        while (i < n && (cs.charAt(i).isDigit || cs.charAt(i) == '.')) i += 1
      } else {
        val st = i
        while (i < n && !isWs(cs.charAt(i)) && !isDelim(cs.charAt(i))) i += 1
        cs.substring(st, i) match {
          case "Tf" =>
            if (lastName != null) curFont = fonts.getOrElse(lastName, null)
            strs.clear()
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

  // -------------------------------------------------- encryption (RC4)
  //
  // Standard security handler, V1/V2 (RC4 40–128 bit), EMPTY user
  // password — the crawler posture: most "encrypted" PDFs in a crawl are
  // owner-locked (print/copy restrictions) but open with the empty user
  // password, which is exactly what pdftotext-class tools decrypt by
  // default. PDF 32000-1 §7.6.3 algorithms 1/2/5/6. AESV2/V3 (V ≥ 4) and
  // non-empty user passwords degrade to invisible streams, never an
  // error. All arithmetic is JDK MessageDigest MD5 plus a hand-rolled
  // RC4 (15 lines, symmetric) — no new dependencies.

  private[graft] def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0; var n = 0
    while (n < data.length) {
      a = (a + 1) & 0xff
      b = (b + s(a)) & 0xff
      val t = s(a); s(a) = s(b); s(b) = t
      out(n) = (data(n) ^ s((s(a) + s(b)) & 0xff)).toByte
      n += 1
    }
    out
  }

  /** The standard 32-byte password pad (§7.6.3.3); the padded EMPTY user
    * password is the pad itself. */
  private[graft] val PasswordPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  /** Signed integer dict entry (P is negative in virtually every
    * real /Encrypt dict). */
  private def dictSignedInt(dict: String, key: String): Option[Long] = {
    var j = keyPos(dict, key)
    if (j < 0) return None
    while (j < dict.length && isWs(dict.charAt(j))) j += 1
    val neg = j < dict.length && dict.charAt(j) == '-'
    if (neg) j += 1
    val st = j
    while (j < dict.length && dict.charAt(j).isDigit) j += 1
    if (j == st) None
    else Some(dict.substring(st, j).toLong * (if (neg) -1 else 1))
  }

  /** A PDF string value (literal or hex form) after /Key, as raw bytes. */
  private def dictStringBytes(dict: String, key: String): Option[Array[Byte]] = {
    var j = keyPos(dict, key)
    if (j < 0) return None
    while (j < dict.length && isWs(dict.charAt(j))) j += 1
    if (j >= dict.length) return None
    dict.charAt(j) match {
      case '(' => Some(parseLiteralString(dict, j)._1.toCharArray.map(_.toByte))
      case '<' => Some(parseHexString(dict, j)._1.toCharArray.map(_.toByte))
      case _   => None
    }
  }

  /** First element of the trailer /ID array (a hex string), scanned
    * leniently over the whole file — the lenient object scan never reads
    * the trailer otherwise. */
  private def firstFileId(s: String): Option[Array[Byte]] = {
    var i = 0
    while (true) {
      i = s.indexOf("/ID", i)
      if (i < 0) return None
      var j = i + 3
      while (j < s.length && (isWs(s.charAt(j)) || s.charAt(j) == '[')) j += 1
      if (j < s.length && s.charAt(j) == '<')
        return Some(parseHexString(s, j)._1.toCharArray.map(_.toByte))
      i = i + 3
    }
    None
  }

  /** Algorithm 2 key from the EMPTY user password. */
  private[graft] def deriveKey(o: Array[Byte], p: Long, id0: Array[Byte],
      r: Int, lengthBits: Int, encryptMetadata: Boolean): Array[Byte] = {
    val n = if (r == 2) 5 else math.max(5, math.min(16, lengthBits / 8))
    val pLe = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
    val extra =
      if (r >= 4 && !encryptMetadata)
        Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
      else Array.emptyByteArray
    var key = md5(PasswordPad, o, pLe, id0, extra)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key.take(n)); i += 1 }
    }
    key.take(n)
  }

  /** Algorithm 4/5 expected /U value (first 16 bytes significant for
    * R ≥ 3). */
  private[graft] def expectedU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, PasswordPad)
    else {
      var u = rc4(key, md5(PasswordPad, id0))
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u
    }

  /** Algorithm 1 per-object key. */
  private[graft] def objectKey(key: Array[Byte], num: Int, gen: Int): Array[Byte] = {
    val ext = Array[Byte](
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    md5(key, ext).take(math.min(key.length + 5, 16))
  }

  /** AES-CBC decrypt with the PDF layout: first 16 ciphertext bytes are
    * the IV, PKCS#5 padding stripped. Bad padding / short input → null
    * (treated as undecryptable → degrade). */
  private[graft] def aesCbcDecrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] =
    if (data.length < 32 || (data.length % 16) != 0) null
    else
      try {
        val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(key, "AES"),
          new javax.crypto.spec.IvParameterSpec(data.take(16)))
        c.doFinal(data, 16, data.length - 16)
      } catch { case _: java.security.GeneralSecurityException => null }

  private def sha256(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    parts.foreach(d.update)
    d.digest()
  }

  /** ISO 32000-2 Algorithm 2.B (R=6): the iterated SHA-256/384/512 hash
    * over password + salt. `udata` is empty for the user-password case. */
  private[graft] def hash2B(pw: Array[Byte], salt: Array[Byte]): Array[Byte] = {
    var k = sha256(pw, salt)
    var round = 0
    var last = 0
    var done = false
    while (!done) {
      val k1 = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < 64) { k1.write(pw); k1.write(k); i += 1 }
      val k1b = k1.toByteArray
      val e =
        try {
          val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          c.init(javax.crypto.Cipher.ENCRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
            new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
          c.doFinal(k1b)
        } catch { case _: java.security.GeneralSecurityException => return null }
      val mod = e.take(16).map(_ & 0xff).sum % 3
      val alg = mod match { case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512" }
      val d = java.security.MessageDigest.getInstance(alg)
      k = d.digest(e)
      round += 1
      last = e(e.length - 1) & 0xff
      done = round >= 64 && last <= round - 32
    }
    k.take(32)
  }

  /** Detect a standard-handler /Encrypt dict and, when the EMPTY user
    * password authenticates, return every stream payload decrypted —
    * V1/V2 per-object RC4, V4 /AESV2 (AES-128-CBC, sAlT'ed object
    * keys), V5 R5/R6 /AESV3 (AES-256-CBC, one file key from /UE). The
    * /Encrypt holder, /Type /XRef and /Type /Metadata streams stay
    * untouched per spec. Anything unsupported — unknown V/CFM, missing
    * /ID where required, a real user password — returns the objects
    * unchanged: their streams stay invisible, the documented degrade. */
  private[functions] def decryptIfNeeded(bytes: Array[Byte], objs: Vector[PObj]): Vector[PObj] = {
    val enc = objs.find(o => o.data == null && hasName(o.dict, "Filter", "Standard") &&
      keyPos(o.dict, "O") >= 0 && keyPos(o.dict, "U") >= 0)
    if (enc.isEmpty) return objs
    val d = enc.get.dict
    val v = dictInt(d, "V").getOrElse(0)
    val r = dictInt(d, "R").getOrElse(if (v == 1) 2 else 3)

    def decryptAll(decrypt: PObj => Array[Byte]): Vector[PObj] =
      objs.map { ob =>
        if (ob.data == null || (ob eq enc.get) ||
          hasName(ob.dict, "Type", "XRef") || hasName(ob.dict, "Type", "Metadata")) ob
        else {
          val dec = decrypt(ob)
          if (dec == null) ob else ob.copy(data = dec)
        }
      }

    if (v >= 1 && v <= 2) {
      val lengthBits = dictInt(d, "Length").getOrElse(40)
      (for {
        o <- dictStringBytes(d, "O")
        u <- dictStringBytes(d, "U")
        p <- dictSignedInt(d, "P")
        id0 <- firstFileId(new String(bytes, Latin))
      } yield {
        val key = deriveKey(o, p, id0, r, lengthBits, encryptMetadata = true)
        val expU = expectedU(key, id0, r)
        val ok =
          if (r == 2) java.util.Arrays.equals(expU, u)
          else u.length >= 16 && java.util.Arrays.equals(expU.take(16), u.take(16))
        if (!ok) objs // non-empty user password: locked, degrade
        else decryptAll(ob => rc4(objectKey(key, ob.num, 0), ob.data))
      }).getOrElse(objs)
    } else if (v == 4 && d.contains("/AESV2")) {
      val lengthBits = dictInt(d, "Length").getOrElse(128)
      (for {
        o <- dictStringBytes(d, "O")
        u <- dictStringBytes(d, "U")
        p <- dictSignedInt(d, "P")
        id0 <- firstFileId(new String(bytes, Latin))
      } yield {
        val meta = !d.contains("/EncryptMetadata false")
        val key = deriveKey(o, p, id0, r, lengthBits, encryptMetadata = meta)
        val expU = expectedU(key, id0, r)
        if (!(u.length >= 16 && java.util.Arrays.equals(expU.take(16), u.take(16)))) objs
        else {
          val salt = Array[Byte](0x73, 0x41, 0x6c, 0x54) // "sAlT"
          def objAesKey(num: Int): Array[Byte] = {
            val ext = Array[Byte](
              (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
              ((num >> 16) & 0xff).toByte, 0, 0)
            md5(key, ext, salt).take(math.min(key.length + 5, 16))
          }
          decryptAll(ob => aesCbcDecrypt(objAesKey(ob.num), ob.data))
        }
      }).getOrElse(objs)
    } else if (v == 5 && (r == 5 || r == 6) && d.contains("/AESV3")) {
      (for {
        u <- dictStringBytes(d, "U").filter(_.length >= 48)
        ue <- dictStringBytes(d, "UE").filter(_.length >= 32)
      } yield {
        val hash = u.take(32)
        val vSalt = u.slice(32, 40)
        val kSalt = u.slice(40, 48)
        val pw = Array.emptyByteArray
        val expHash = if (r == 5) sha256(pw, vSalt) else hash2B(pw, vSalt)
        if (expHash == null || !java.util.Arrays.equals(expHash, hash)) objs
        else {
          val ik = if (r == 5) sha256(pw, kSalt) else hash2B(pw, kSalt)
          // file key = AES-256-CBC-decrypt(/UE, intermediate, IV 0, no pad)
          val fileKey =
            try {
              val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
              c.init(javax.crypto.Cipher.DECRYPT_MODE,
                new javax.crypto.spec.SecretKeySpec(ik, "AES"),
                new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
              c.doFinal(ue.take(32))
            } catch { case _: java.security.GeneralSecurityException => null }
          if (fileKey == null) objs
          else decryptAll(ob => aesCbcDecrypt(fileKey, ob.data)) // one key, no per-object mix (V5)
        }
      }).getOrElse(objs)
    } else objs // unknown V / CFM: unsupported, degrade
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

    val objs = expandObjectStreams(decryptIfNeeded(bytes, parseObjects(bytes)))
    val byNum = objs.groupBy(_.num).map { case (k, v) => k -> v.last }

    // shared (not path-scoped) visited set: a /Kids array repeating a
    // ref or a crafted page-tree DAG must neither duplicate pages nor
    // re-traverse subtrees exponentially; the cap bounds total visits
    val visited = scala.collection.mutable.HashSet.empty[Int]
    // each page also carries the /Resources visible to it — its own or
    // the nearest /Pages ancestor's (PDF inheritable attribute)
    def collectPages(num: Int, inhRes: Option[String]): Seq[(PObj, Option[String])] =
      if (!visited.add(num) || visited.size > 4096) Nil
      else byNum.get(num) match {
        case Some(o) if hasName(o.dict, "Type", "Page") => Seq((o, inhRes))
        case Some(o) if hasName(o.dict, "Type", "Pages") =>
          val res = inlineOrRefDict(o.dict, "Resources", byNum).orElse(inhRes)
          dictRefs(o.dict, "Kids").flatMap(collectPages(_, res))
        case _ => Nil
      }

    val pageObjs: Seq[(PObj, Option[String])] = objs
      .find(o => o.data == null && hasName(o.dict, "Type", "Catalog"))
      .flatMap(cat => dictRef(cat.dict, "Pages"))
      .map(collectPages(_, None))
      .getOrElse(Nil)

    val (nPages, pageTexts) =
      if (pageObjs.nonEmpty) {
        val fontCache = scala.collection.mutable.HashMap.empty[String, FontInfo]
        val texts = pageObjs.map { case (p, inhRes) =>
          val contents = dictRefs(p.dict, "Contents")
            .flatMap(byNum.get).flatMap(o => Option(decodeStream(o)))
          // multiple /Contents streams concatenate into one (PDF 32000
          // §7.8.2 requires a token break between them)
          if (contents.isEmpty) ""
          else extractText(contents.mkString("\n"),
            pageFonts(p.dict, inhRes, byNum, fontCache))
        }
        (pageObjs.size, texts)
      } else {
        // damaged/exotic structure: every decodable BT stream, in order
        val streams = objs.filter(_.data != null)
          .flatMap(o => Option(decodeStream(o)))
          .filter(_.contains("BT"))
        val declared = objs.count(o => o.data == null && hasName(o.dict, "Type", "Page"))
        (if (declared > 0) declared else streams.size,
          streams.map(s => extractText(s)))
      }

    val text = pageTexts.filter(_.nonEmpty).mkString("\n")
    // image inventory: /Subtype /Image XObject streams — the multimodal
    // signal a curation pipeline wants from a PDF without decoding
    // samples (dims/encodings live in the dict; DCTDecode payloads stay
    // opaque here). Counted over the parsed objects, so damaged pages
    // still report their images.
    var nImages = 0
    var imageBytes = 0L
    objs.foreach { o =>
      if (o.data != null && hasName(o.dict, "Subtype", "Image")) {
        nImages += 1
        imageBytes += o.data.length
      }
    }
    new GenericInternalRow(Array[Any](
      if (version == null) null else UTF8String.fromString(version),
      nPages,
      UTF8String.fromString(text),
      nImages,
      imageBytes))
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
    StructField("text", StringType, nullable = false),
    StructField("n_images", IntegerType, nullable = false),
    StructField("image_bytes", LongType, nullable = false)))
}

object PdfKernels {
  def pdfExtract(pdf: Column): Column =
    GraftColumnBridge.column(PdfExtract(GraftColumnBridge.expression(pdf)))
}
