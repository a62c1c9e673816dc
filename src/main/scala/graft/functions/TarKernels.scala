package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** POSIX ustar container kernels — the WebDataset layer.
  *
  * Multimodal training corpora ship as tar shards (the WebDataset
  * convention: one tar per shard, members named `{key}.{ext}`, a
  * sample = all members sharing a key), because sequential tar reads
  * are the only I/O pattern object stores and dataloaders both like.
  * These kernels give the engine that layer natively: `tar_members`
  * explodes an archive into (name, size, data) rows; `tar_pack` builds
  * a DETERMINISTIC archive (fixed mode/uid/mtime, zero padding, two
  * zero-block terminator) from (name, data) structs, so packing the
  * same members always yields byte-identical shards (retry-stable
  * output, content-addressable shard hashes).
  *
  * Parse posture (the WARC/MP3/MP4 container tradition): structural
  * damage is a NAMED data error, never a silent partial decode —
  * truncated headers/data, bad octal, checksum mismatches, trailing
  * garbage all throw with byte offsets for the OnError policies to
  * route. Headers are verified against their checksum (sum of header
  * bytes with the checksum field read as spaces — the ustar rule).
  * GNU 'L' long-name members are resolved; pax metadata ('x'/'g'),
  * directories, and link entries are structural (no row emitted);
  * `prefix` composes per POSIX. Member names decode as UTF-8.
  */
object TarOps {
  private def err(msg: String, at: Int): Nothing =
    throw new IllegalArgumentException(s"tar parse error at byte $at: $msg")

  private def parseOctal(
      bytes: Array[Byte], off: Int, len: Int, at: Int, what: String): Long = {
    var i = off
    val end = off + len
    while (i < end && bytes(i) == ' ') i += 1
    var v = 0L
    var any = false
    while (i < end && bytes(i) >= '0' && bytes(i) <= '7') {
      v = v * 8 + (bytes(i) - '0'); any = true; i += 1
    }
    if (!any) err(s"bad octal in $what field", at)
    if (i < end && bytes(i) != 0 && bytes(i) != ' ')
      err(s"bad octal in $what field", at)
    v
  }

  private def allZero(bytes: Array[Byte], off: Int, len: Int): Boolean = {
    var i = off
    while (i < off + len) { if (bytes(i) != 0) return false; i += 1 }
    true
  }

  private def cstr(bytes: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val lim = off + len
    while (end < lim && bytes(end) != 0) end += 1
    new String(bytes, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  def compute(bytes: Array[Byte]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    val n = bytes.length
    var i = 0
    var longName: String = null
    var done = false
    while (!done && i + 512 <= n) {
      if (allZero(bytes, i, 512)) {
        // end-of-archive marker; anything non-zero after it is damage
        var j = i + 512
        while (j < n) {
          if (bytes(j) != 0) err("non-zero bytes after the end-of-archive marker", j)
          j += 1
        }
        done = true
      } else {
        if (!(bytes(i + 257) == 'u' && bytes(i + 258) == 's' &&
            bytes(i + 259) == 't' && bytes(i + 260) == 'a' &&
            bytes(i + 261) == 'r'))
          err("missing ustar magic", i + 257)
        val stored = parseOctal(bytes, i + 148, 8, i, "checksum")
        var sum = 0L
        var k = 0
        while (k < 512) {
          sum += (if (k >= 148 && k < 156) 32 else bytes(i + k) & 0xFF)
          k += 1
        }
        if (sum != stored)
          err(s"header checksum mismatch (stored $stored, computed $sum)", i)
        val size = parseOctal(bytes, i + 124, 12, i, "size")
        val dataStart = i + 512
        if (size > (n - dataStart).toLong)
          err(s"member data truncated: size $size but only ${n - dataStart} " +
            "bytes remain", dataStart)
        val typeflag = bytes(i + 156)
        val sz = size.toInt
        typeflag match {
          case 'L' => // GNU long name: data is the next member's name
            longName = {
              var end = dataStart + sz
              while (end > dataStart && bytes(end - 1) == 0) end -= 1
              new String(bytes, dataStart, end - dataStart,
                java.nio.charset.StandardCharsets.UTF_8)
            }
          case '0' | 0 =>
            val name =
              if (longName != null) { val nm = longName; longName = null; nm }
              else {
                val prefix = cstr(bytes, i + 345, 155)
                val base = cstr(bytes, i, 100)
                if (prefix.nonEmpty) prefix + "/" + base else base
              }
            out += new GenericInternalRow(Array[Any](
              UTF8String.fromString(name), size,
              java.util.Arrays.copyOfRange(bytes, dataStart, dataStart + sz)))
          case _ =>
            // pax metadata, directories, links: structural. A pending
            // GNU 'L' long name binds to THIS member (tar emits 'L'
            // before long-named directories too) — consume it so it
            // can't leak onto the next regular file.
            longName = null
        }
        i = dataStart + ((sz + 511) / 512) * 512
      }
    }
    // POSIX requires the two-zero-block terminator; an archive that just
    // stops (mid-header, mid-padding, or right after a member) is
    // truncated — named damage, not a silent partial parse
    if (!done) err("archive truncated before the end-of-archive marker",
      math.min(i, n))
    new GenericArrayData(out.toArray)
  }

  private def putOctal(h: Array[Byte], off: Int, len: Int, v: Long): Unit = {
    // len-1 octal digits, zero-padded, NUL terminator — the ustar shape
    var x = v
    var i = off + len - 2
    h(off + len - 1) = 0
    while (i >= off) { h(i) = ('0' + (x & 7)).toByte; x >>= 3; i -= 1 }
  }

  private def header(name: String, size: Long, typeflag: Byte): Array[Byte] = {
    val h = new Array[Byte](512)
    val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
    putOctal(h, 100, 8, 0x1a4) // mode 0644
    putOctal(h, 108, 8, 0) // uid
    putOctal(h, 116, 8, 0) // gid
    putOctal(h, 124, 12, size)
    putOctal(h, 136, 12, 0) // mtime 0: deterministic archives
    h(156) = typeflag
    h(257) = 'u'; h(258) = 's'; h(259) = 't'; h(260) = 'a'; h(261) = 'r'
    h(263) = '0'; h(264) = '0' // version "00" (magic keeps its NUL at 262)
    var sum = 0L
    var k = 0
    while (k < 512) { sum += (if (k >= 148 && k < 156) 32 else h(k) & 0xFF); k += 1 }
    // checksum: 6 octal digits, NUL, space
    var x = sum
    var i = 153
    while (i >= 148) { h(i) = ('0' + (x & 7)).toByte; x >>= 3; i -= 1 }
    h(154) = 0
    h(155) = ' '
    h
  }

  /** Deterministic ustar build from (name, data) members, in array
    * order. Names longer than 100 UTF-8 bytes emit a GNU 'L' long-name
    * member first (what tar itself does). NULL payloads pack as empty. */
  def build(members: ArrayData): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4096)
    val nm = members.numElements()
    var j = 0
    while (j < nm) {
      if (members.isNullAt(j))
        throw new IllegalArgumentException(
          s"tar_pack: member $j is null — members must be (name, data) structs")
      val m = members.getStruct(j, 2)
      if (m.isNullAt(0))
        throw new IllegalArgumentException(
          s"tar_pack: member $j has a null name")
      val name = m.getUTF8String(0).toString
      val data = if (m.isNullAt(1)) Array.emptyByteArray else m.getBinary(1)
      val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      if (nb.length > 100) {
        out.write(header("././@LongLink", nb.length + 1L, 'L'))
        out.write(nb); out.write(0)
        val pad = 512 - ((nb.length + 1) % 512)
        if (pad != 512) out.write(new Array[Byte](pad))
      }
      out.write(header(name, data.length.toLong, '0'))
      out.write(data)
      val pad = 512 - (data.length % 512)
      if (pad != 512) out.write(new Array[Byte](pad))
      j += 1
    }
    out.write(new Array[Byte](1024)) // two zero end blocks
    // pad to the standard 10240-byte record size (tar's default blocking
    // factor — what GNU tar and python tarfile both emit), so archives
    // from this builder are byte-identical to the ecosystem's
    val rem = out.size() % 10240
    if (rem != 0) out.write(new Array[Byte](10240 - rem))
    out.toByteArray
  }
}

case class TarMembers(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(TarMembers.memberSchema,
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tar_members expects binary, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TarOps.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TarOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TarMembers =
    copy(child = newChild)

  override def prettyName: String = "tar_members"
}

object TarMembers {
  val memberSchema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("data", BinaryType, nullable = false)))
}

case class TarPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, StringType, _, _), StructField(_, BinaryType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tar_pack expects array<struct<name: string, data: binary>>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TarOps.build(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TarOps.build($c)")

  override protected def withNewChildInternal(newChild: Expression): TarPack =
    copy(child = newChild)

  override def prettyName: String = "tar_pack"
}

/** Shard-payload serialization: int sequences ↔ bytes. A tokenized
  * training shard carries PACKED ids, not text — `ints_binary` writes
  * each int32 big-endian (4·n bytes, endian-pinned so shards read
  * identically everywhere); `binary_ints` inverts it (length not a
  * multiple of 4 is a named data error — a truncated payload must not
  * silently drop trailing tokens). */
object IntBytesOps {
  def toBytes(arr: ArrayData): Array[Byte] = {
    val n = arr.numElements()
    val out = new Array[Byte](n * 4)
    var i = 0
    while (i < n) {
      val v = arr.getInt(i)
      out(i * 4) = (v >>> 24).toByte
      out(i * 4 + 1) = (v >>> 16).toByte
      out(i * 4 + 2) = (v >>> 8).toByte
      out(i * 4 + 3) = v.toByte
      i += 1
    }
    out
  }

  def fromBytes(b: Array[Byte]): ArrayData = {
    if (b.length % 4 != 0)
      throw new IllegalArgumentException(
        s"binary_ints: payload length ${b.length} is not a multiple of 4 — " +
          "truncated id payload")
    val n = b.length / 4
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((b(i * 4) & 0xFF) << 24) | ((b(i * 4 + 1) & 0xFF) << 16) |
        ((b(i * 4 + 2) & 0xFF) << 8) | (b(i * 4 + 3) & 0xFF)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class IntsToBinary(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ints_binary expects array<int>, got ${t.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    IntBytesOps.toBytes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IntBytesOps.toBytes($c)")
  override protected def withNewChildInternal(newChild: Expression): IntsToBinary =
    copy(child = newChild)
  override def prettyName: String = "ints_binary"
}

case class BinaryToInts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"binary_ints expects binary, got ${t.simpleString}")
  }
  override def nullSafeEval(input: Any): Any =
    IntBytesOps.fromBytes(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IntBytesOps.fromBytes($c)")
  override protected def withNewChildInternal(newChild: Expression): BinaryToInts =
    copy(child = newChild)
  override def prettyName: String = "binary_ints"
}

object TarKernels {
  def tarMembers(content: Column): Column =
    GraftColumnBridge.column(TarMembers(GraftColumnBridge.expression(content)))

  def tarPack(members: Column): Column =
    GraftColumnBridge.column(TarPack(GraftColumnBridge.expression(members)))

  def intsBinary(ids: Column): Column =
    GraftColumnBridge.column(IntsToBinary(GraftColumnBridge.expression(ids)))

  def binaryInts(bytes: Column): Column =
    GraftColumnBridge.column(BinaryToInts(GraftColumnBridge.expression(bytes)))
}
