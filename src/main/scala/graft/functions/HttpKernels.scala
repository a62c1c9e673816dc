package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTTP response parsing — the step between a WARC response record and
  * every content operator: real crawls (the Common Crawl layout) store
  * the RAW captured response, so the payload `warc_records` hands back
  * is `HTTP/1.1 200 OK\r\nheaders...\r\n\r\nbody`, possibly with a
  * chunked transfer coding — not bare HTML. `http_response(bytes)` →
  * struct:
  *   - `status`:        the status-line code (null when the payload is
  *                      not an HTTP response — then `body` is the whole
  *                      input, so non-HTTP payloads flow through),
  *   - `content_type`:  the Content-Type header's media type, trimmed
  *                      and lowercased, parameters stripped (null when
  *                      absent) — route on it or on `sniff_mime(body)`,
  *   - `charset`:       the charset parameter, lowercased (null when
  *                      absent),
  *   - `content_encoding`: the Content-Encoding header value, lowercased
  *                      (null when absent) — compose `gunzip_auto(body)`
  *                      for the gzip case,
  *   - `body`:          the message body as BINARY, with a chunked
  *                      transfer coding already decoded (hex sizes +
  *                      trailers per RFC 9112; a malformed chunk stream
  *                      degrades to the raw remainder).
  * Header folding (obs-fold), LF-only line breaks, and missing final
  * CRLF all parse leniently — crawls contain every violation. One JVM
  * pass inside whole-stage codegen; scan-stage, zero shuffles. */
object HttpOps {

  def compute(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    if (bytes == null) return null
    val n = bytes.length
    def asciiAt(i: Int): Char = (bytes(i) & 0xff).toChar
    // status line: HTTP/x.y SP 3DIGIT
    var status: Integer = null
    var headerEnd = -1
    var ok = n >= 12 && asciiAt(0) == 'H' && asciiAt(1) == 'T' &&
      asciiAt(2) == 'T' && asciiAt(3) == 'P' && asciiAt(4) == '/'
    if (ok) {
      var i = 5
      while (i < n && asciiAt(i) != ' ' && asciiAt(i) != '\r' && asciiAt(i) != '\n') i += 1
      if (i < n && asciiAt(i) == ' ') {
        i += 1
        var code = 0
        var digits = 0
        while (i < n && asciiAt(i).isDigit && digits < 3) {
          code = code * 10 + (asciiAt(i) - '0'); i += 1; digits += 1
        }
        if (digits == 3) status = Integer.valueOf(code)
      }
    }
    if (status == null) {
      // not an HTTP response: body = whole input, everything else null
      return new GenericInternalRow(Array[Any](null, null, null, null, bytes))
    }
    // find end of headers: CRLFCRLF or LFLF (lenient)
    var i = 0
    while (headerEnd < 0 && i < n - 1) {
      if (asciiAt(i) == '\n') {
        if (asciiAt(i + 1) == '\n') headerEnd = i + 2
        else if (i + 2 < n && asciiAt(i + 1) == '\r' && asciiAt(i + 2) == '\n')
          headerEnd = i + 3
      }
      i += 1
    }
    if (headerEnd < 0) headerEnd = n // headers only, no body
    val headerText = new String(bytes, 0, headerEnd,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // unfold obs-fold (CRLF + SP/TAB) then split lines
    val lines = headerText.replace("\r\n ", " ").replace("\r\n\t", " ")
      .split("\r?\n")
    def header(name: String): String = {
      val p = name + ":"
      lines.drop(1).collectFirst {
        case l if l.length > p.length &&
          l.substring(0, p.length).equalsIgnoreCase(p) =>
          l.substring(p.length).trim
      }.orNull
    }
    val ctRaw = header("Content-Type")
    val (ct, charset) =
      if (ctRaw == null) (null, null)
      else {
        val parts = ctRaw.split(";").map(_.trim)
        val cs = parts.drop(1).collectFirst {
          case p if p.toLowerCase.startsWith("charset=") =>
            p.substring(8).trim.stripPrefix("\"").stripSuffix("\"").toLowerCase
        }.orNull
        (parts(0).toLowerCase, cs)
      }
    val ce = Option(header("Content-Encoding")).map(_.toLowerCase).orNull
    val te = Option(header("Transfer-Encoding")).map(_.toLowerCase).orNull
    var body = java.util.Arrays.copyOfRange(bytes, headerEnd, n)
    if (te != null && te.contains("chunked")) body = dechunk(body)
    new GenericInternalRow(Array[Any](
      status.intValue(),
      if (ct == null) null else UTF8String.fromString(ct),
      if (charset == null) null else UTF8String.fromString(charset),
      if (ce == null) null else UTF8String.fromString(ce),
      body))
  }

  /** RFC 9112 chunked decoding: `hex-size[;ext]CRLF data CRLF` until a
    * zero chunk; trailers ignored. A malformed size line degrades to
    * returning the UNDECODED remainder appended to what was decoded so
    * far — damage degrades, never throws. */
  private[graft] def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    val n = b.length
    while (i < n) {
      // one size line: hex digits, optional ;extension, CRLF
      var size = 0L
      var any = false
      var bad = false
      var lineEnd = -1
      var j = i
      while (lineEnd < 0 && j < n && !bad) {
        val c = (b(j) & 0xff).toChar
        if (c == '\n') lineEnd = j + 1
        else if (c == '\r') j += 1
        else if (c == ';') { while (j < n && (b(j) & 0xff) != '\n') j += 1 }
        else {
          val d = Character.digit(c, 16)
          if (d >= 0 && size < (1L << 40)) { size = size * 16 + d; any = true; j += 1 }
          else bad = true
        }
      }
      if (bad || lineEnd < 0 || !any) {
        out.write(b, i, n - i) // malformed: raw remainder, degrade
        return out.toByteArray
      }
      if (size == 0) return out.toByteArray // final chunk; trailers ignored
      val end = math.min(n.toLong, lineEnd + size).toInt
      out.write(b, lineEnd, end - lineEnd)
      i = end
      if (i < n && (b(i) & 0xff) == '\r') i += 1 // chunk-terminating CRLF
      if (i < n && (b(i) & 0xff) == '\n') i += 1
    }
    out.toByteArray
  }

  val schema: StructType = StructType(Seq(
    StructField("status", IntegerType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("charset", StringType, nullable = true),
    StructField("content_encoding", StringType, nullable = true),
    StructField("body", BinaryType, nullable = false)))
}

case class HttpResponse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = HttpOps.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"http_response expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HttpOps.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HttpOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HttpResponse =
    copy(child = newChild)

  override def prettyName: String = "http_response"
}

object HttpKernels {
  def httpResponse(bytes: Column): Column =
    GraftColumnBridge.column(HttpResponse(GraftColumnBridge.expression(bytes)))
}
