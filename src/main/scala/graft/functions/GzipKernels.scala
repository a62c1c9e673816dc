package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Multi-member gzip (RFC 1952) decompression — the layer that makes
  * `.warc.gz` crawls readable: the standard crawl layout compresses each
  * WARC record as its OWN gzip member and concatenates them, so a
  * correct reader must walk members until the bytes run out.
  *
  * Implemented as a manual member walk over the JDK Inflater rather than
  * `GZIPInputStream`, for one reason: posture. `GZIPInputStream` stops
  * SILENTLY at the first byte sequence that is not another member header
  * — trailing garbage in a crawl file would simply vanish, which is
  * exactly the silent-truncation behavior the container parsers here
  * forbid. This walk names every failure: bad magic, an unsupported
  * compression method, a truncated header/payload/trailer, a CRC-32
  * mismatch, an ISIZE mismatch, and non-gzip trailing bytes after the
  * last member. Header FLG bits (FEXTRA/FNAME/FCOMMENT/FHCRC) are
  * skipped per the RFC.
  *
  * [[GunzipAuto]] sniffs the 1f 8b magic and passes non-gzip bytes
  * through untouched — the shape the `warc` source needs to read .warc
  * and .warc.gz files from one directory with one plan.
  */
object GzipOps {

  private def err(msg: String, at: Int): Nothing =
    throw new IllegalArgumentException(s"gzip stream damaged at byte $at: $msg")

  def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 0x1f.toByte && b(1) == 0x8b.toByte

  def gunzip(bytes: Array[Byte]): Array[Byte] = {
    val n = bytes.length
    if (n == 0) return bytes
    val out = new java.io.ByteArrayOutputStream(math.max(64, n * 3))
    var i = 0
    while (i < n) {
      if (n - i < 10) err("truncated member header", i)
      if (!(bytes(i) == 0x1f.toByte && bytes(i + 1) == 0x8b.toByte))
        err("expected a gzip member header (1f 8b)", i)
      if (bytes(i + 2) != 8) err(s"unsupported compression method ${bytes(i + 2)}", i)
      val flg = bytes(i + 3) & 0xff
      var p = i + 10
      if ((flg & 0x04) != 0) { // FEXTRA
        if (n - p < 2) err("truncated FEXTRA length", p)
        val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
        p += 2 + xlen
        if (p > n) err("truncated FEXTRA field", p)
      }
      if ((flg & 0x08) != 0) { // FNAME: zero-terminated
        while (p < n && bytes(p) != 0) p += 1
        if (p >= n) err("unterminated FNAME", p)
        p += 1
      }
      if ((flg & 0x10) != 0) { // FCOMMENT
        while (p < n && bytes(p) != 0) p += 1
        if (p >= n) err("unterminated FCOMMENT", p)
        p += 1
      }
      if ((flg & 0x02) != 0) { // FHCRC
        p += 2
        if (p > n) err("truncated FHCRC", p)
      }
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(bytes, p, n - p)
      val crc = new java.util.zip.CRC32
      val buf = new Array[Byte](65536)
      var memberLen = 0L
      try {
        while (!inf.finished()) {
          val got =
            try inf.inflate(buf)
            catch {
              case e: java.util.zip.DataFormatException =>
                err(s"deflate data corrupt: ${e.getMessage}", p)
            }
          if (got == 0 && inf.needsInput() && !inf.finished())
            err("truncated deflate payload", p)
          out.write(buf, 0, got)
          crc.update(buf, 0, got)
          memberLen += got
        }
        val used = inf.getBytesRead.toInt
        var t = p + used
        if (n - t < 8) err("truncated member trailer", t)
        def le32(o: Int): Long =
          (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
            ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
        if (le32(t) != crc.getValue)
          err(f"CRC-32 mismatch: stored ${le32(t)}%08x, computed ${crc.getValue}%08x", t)
        if (le32(t + 4) != (memberLen & 0xffffffffL))
          err(s"ISIZE mismatch: stored ${le32(t + 4)}, inflated $memberLen", t + 4)
        t += 8
        i = t
      } finally inf.end()
    }
    out.toByteArray
  }

  /** RFC 1952 single-member compression (the writer side of the
    * round-trip; one member per record is the caller's concat). */
  def gzip(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(math.max(64, bytes.length / 2))
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes)
    gz.close()
    bos.toByteArray
  }

  def gunzipAuto(bytes: Array[Byte]): Array[Byte] =
    if (isGzip(bytes)) gunzip(bytes) else bytes
}

abstract class GzipUnary extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary, got ${t.simpleString}")
  }
}

case class Gunzip(child: Expression) extends GzipUnary {
  override def nullSafeEval(input: Any): Any =
    GzipOps.gunzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipOps.gunzip($c)")
  override protected def withNewChildInternal(newChild: Expression): Gunzip =
    copy(child = newChild)
  override def prettyName: String = "gunzip"
}

case class GunzipAuto(child: Expression) extends GzipUnary {
  override def nullSafeEval(input: Any): Any =
    GzipOps.gunzipAuto(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipOps.gunzipAuto($c)")
  override protected def withNewChildInternal(newChild: Expression): GunzipAuto =
    copy(child = newChild)
  override def prettyName: String = "gunzip_auto"
}

case class GzipCompress(child: Expression) extends GzipUnary {
  override def nullSafeEval(input: Any): Any =
    GzipOps.gzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GzipOps.gzip($c)")
  override protected def withNewChildInternal(newChild: Expression): GzipCompress =
    copy(child = newChild)
  override def prettyName: String = "gzip_compress"
}

object GzipKernels {
  def gunzip(c: Column): Column =
    GraftColumnBridge.column(Gunzip(GraftColumnBridge.expression(c)))
  def gunzipAuto(c: Column): Column =
    GraftColumnBridge.column(GunzipAuto(GraftColumnBridge.expression(c)))
  def gzipCompress(c: Column): Column =
    GraftColumnBridge.column(GzipCompress(GraftColumnBridge.expression(c)))
}
