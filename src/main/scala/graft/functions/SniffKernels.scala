package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-type sniffing — the routing step right after a crawl source:
  * a WARC payload column carries HTML next to images next to PDFs next
  * to gzip blobs, and every downstream operator (html_extract, the
  * media codecs, the text stack) wants only its own rows.
  * `sniff_mime(bytes)` returns a MIME label from magic bytes so the
  * routing is one scan-stage filter per branch.
  *
  * Dispatch contract (first match wins, most-specific magic first):
  * gzip (1f 8b) → the media formats via THEIR OWN codec readiness
  * predicates (png/jpeg/gif/bmp/wav/avi/mp4 — the same checks the
  * parsers use, so a label guarantees the corresponding decoder accepts
  * the header) → `%PDF-` → raw HTTP responses (`HTTP/` →
  * `message/http`, the WARC payload shape — route to `http_response`)
  * → HTML (`<!doctype`/`<html` after optional
  * ASCII whitespace, case-insensitive) → `<?xml` → MP3 (frame-sync
  * heuristic, deliberately AFTER the exact-magic formats) → text/plain
  * (first min(512, n) bytes all in {TAB, LF, CR, 0x20..0x7E}) →
  * application/octet-stream. Empty and NULL-safe inputs are
  * octet-stream. Sniffing never throws — unlike the parsers behind it,
  * a router has no business failing on unknown bytes.
  */
object SniffOps {

  private def startsWithAscii(b: Array[Byte], s: String): Boolean =
    b.length >= s.length && s.indices.forall(i => b(i) == s.charAt(i).toByte)

  private def matchesAt(b: Array[Byte], from: Int, s: String): Boolean =
    b.length - from >= s.length && s.indices.forall { i =>
      val c = b(from + i) & 0xff
      val lower = if (c >= 'A' && c <= 'Z') c + 32 else c
      lower == s.charAt(i).toInt
    }

  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return "application/octet-stream"
    if (GzipOps.isGzip(b)) return "application/gzip"
    if (graft.ops.Codecs.isPng(b)) return "image/png"
    if (graft.ops.Jpeg.isJpeg(b)) return "image/jpeg"
    if (graft.ops.Gif.isGif(b)) return "image/gif"
    if (graft.ops.Codecs.isBmp(b)) return "image/bmp"
    if (graft.ops.Codecs.isWav(b)) return "audio/wav"
    if (graft.ops.Codecs.isAvi(b)) return "video/x-msvideo"
    if (graft.ops.Mp4.isMp4(b)) return "video/mp4"
    if (startsWithAscii(b, "%PDF-")) return "application/pdf"
    // a raw captured HTTP response (the Common-Crawl WARC payload
    // shape) — route to http_response before any content sniffing
    if (startsWithAscii(b, "HTTP/")) return "message/http"
    var i = 0
    while (i < b.length && (b(i) == ' ' || b(i) == '\t' || b(i) == '\r' ||
      b(i) == '\n')) i += 1
    if (matchesAt(b, i, "<!doctype") || matchesAt(b, i, "<html"))
      return "text/html"
    if (matchesAt(b, i, "<?xml")) return "application/xml"
    if (graft.ops.Mp3.isMp3(b)) return "audio/mpeg"
    val n = math.min(512, b.length)
    var j = 0
    var texty = true
    while (j < n && texty) {
      val c = b(j) & 0xff
      texty = c == 9 || c == 10 || c == 13 || (c >= 0x20 && c <= 0x7e)
      j += 1
    }
    if (texty) "text/plain" else "application/octet-stream"
  }

  def compute(b: Array[Byte]): UTF8String = UTF8String.fromString(sniff(b))
}

case class SniffMime(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sniff_mime expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SniffOps.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SniffOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SniffMime =
    copy(child = newChild)

  override def prettyName: String = "sniff_mime"
}

object SniffKernels {
  def sniffMime(c: Column): Column =
    GraftColumnBridge.column(SniffMime(GraftColumnBridge.expression(c)))
}
