package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (Web ARChive, ISO 28500) record parsing — the container format
  * web crawls actually ship in (Common Crawl, Heritrix, wget --warc).
  * One kernel call turns a WARC file's bytes into its records:
  * `array<struct<url, warc_type, warc_date, content_length, payload>>`.
  *
  * Format walked byte-exactly from the public spec: each record is a
  * `WARC/1.x` version line, CRLF-terminated `Name: value` header lines
  * (names case-insensitive; RFC-822 continuation lines folded) up to a
  * blank line, then exactly `Content-Length` payload OCTETS, then the
  * CRLF CRLF record separator. `url` is WARC-Target-URI (NULL where the
  * record type carries none, e.g. warcinfo), `payload` is the raw bytes
  * — binary-safe, so a response record holding a JPEG survives for the
  * media kernels downstream.
  *
  * This is a CONTAINER parser in the MP3/MP4 tradition: structure is
  * read, payload bytes are never interpreted, and structural damage is
  * a NAMED data error, never a silent zero-fill — bad magic, a missing
  * or non-numeric Content-Length, a truncated payload, a missing
  * blank-line terminator, and trailing garbage after the last record
  * each fail with a message saying what broke and where. (HTML inside
  * the payload stays lenient — see HtmlExtractOps; the container/content
  * split is deliberate: crawler-written framing is trustworthy-or-
  * corrupt, page content is arbitrary.)
  *
  * Scale: the standard crawl layout is many ~1 GB WARC files, so
  * parallelism comes from the file dimension (one task per file via the
  * binaryFile source — see the `warc` config source); per-record gzip
  * members (the .warc.gz layout) are the documented decompression seam.
  */
object WarcOps {

  private def err(msg: String, at: Int): Nothing =
    throw new IllegalArgumentException(s"WARC parse error at byte $at: $msg")

  /** Index of CRLF starting at-or-after `from`, or -1. */
  private def findCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      i += 1
    }
    -1
  }

  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, until - from, java.nio.charset.StandardCharsets.ISO_8859_1)

  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < n) {
      // version line
      val vEnd = findCrlf(bytes, i)
      if (vEnd < 0) err("record has no CRLF-terminated version line", i)
      val version = ascii(bytes, i, vEnd)
      if (!version.startsWith("WARC/"))
        err(s"expected a WARC/1.x version line, got '${version.take(20)}'", i)
      var p = vEnd + 2
      // headers until blank line; RFC-822 continuations fold into the
      // previous value
      var url: String = null
      var wtype: String = null
      var wdate: String = null
      var clen: Long = -1L
      var lastName: String = null
      var done = false
      while (!done) {
        val hEnd = findCrlf(bytes, p)
        if (hEnd < 0) err("headers not terminated by a blank line", p)
        if (hEnd == p) { done = true; p = hEnd + 2 }
        else {
          val line = ascii(bytes, p, hEnd)
          if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
            if (lastName == null) err("continuation line before any header", p)
            // folded continuation: only Content-Length ever matters here
            // numerically, and folding a number is malformed anyway
          } else {
            val colon = line.indexOf(':')
            if (colon < 0) err(s"header line without ':': '${line.take(30)}'", p)
            val name = line.substring(0, colon).trim
              .toLowerCase(java.util.Locale.ROOT)
            val value = line.substring(colon + 1).trim
            lastName = name
            name match {
              case "warc-target-uri" => url = value
              case "warc-type" => wtype = value
              case "warc-date" => wdate = value
              case "content-length" =>
                try clen = java.lang.Long.parseLong(value)
                catch {
                  case _: NumberFormatException =>
                    err(s"non-numeric Content-Length '$value'", p)
                }
              case _ => ()
            }
          }
          p = hEnd + 2
        }
      }
      if (clen < 0) err("record without a Content-Length header", i)
      // overflow-proof for absurd declared lengths: compare against the
      // remaining byte count, never against p + clen
      if (clen > (n - p).toLong)
        err(s"payload truncated: Content-Length $clen but only ${n - p} " +
          "bytes remain", p)
      val payload = java.util.Arrays.copyOfRange(bytes, p, p + clen.toInt)
      p += clen.toInt
      // record separator: CRLF CRLF
      if (p + 4 > n || bytes(p) != '\r' || bytes(p + 1) != '\n' ||
        bytes(p + 2) != '\r' || bytes(p + 3) != '\n')
        err("payload not followed by the CRLFCRLF record separator", p)
      p += 4
      out += new GenericInternalRow(Array[Any](
        if (url == null) null else UTF8String.fromString(url),
        if (wtype == null) null else UTF8String.fromString(wtype),
        if (wdate == null) null else UTF8String.fromString(wdate),
        clen,
        payload))
      i = p
    }
    new GenericArrayData(out.toArray[AnyRef])
  }
}

case class WarcRecords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(WarcRecords.recordSchema,
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"warc_records expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WarcOps.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WarcOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)

  override def prettyName: String = "warc_records"
}

object WarcRecords {
  val recordSchema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))
}

object WarcKernels {
  def warcRecords(content: Column): Column =
    GraftColumnBridge.column(WarcRecords(GraftColumnBridge.expression(content)))
}
