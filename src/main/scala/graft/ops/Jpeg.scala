package graft.ops

/** Dependency-free pure-JVM baseline JPEG codec (north-star: multimodal
  * columns) — the dominant real-corpus image format through the same
  * decode seam as BMP/PNG, with zero native libraries:
  *
  *   - decoder: baseline DCT (SOF0) AND progressive DCT (SOF2 — spectral
  *     selection + successive approximation, DC/AC first + refinement
  *     scans, EOB-run coding, per-scan DHT redefinition), 8-bit, Huffman,
  *     grayscale and YCbCr with any sampling factors up to 2×2 (4:4:4,
  *     4:2:2, 4:2:0), restart markers honored. Arithmetic coding /
  *     hierarchical / 12-bit throw with a clear message.
  *   - encoder: 4:4:4 / grayscale, standard Annex-K quantization +
  *     Huffman tables scaled by `quality` — used by fixtures and the
  *     resize path; output opens in any viewer.
  *
  * Decode arithmetic is EXACT by construction against the independent
  * python reference (`tools/jpeg_ref.py`): both share one hex-exact
  * IDCT cosine basis, the same accumulation order, the same
  * floor(x+0.5) rounding and the same color-convert literals — so the
  * golden test asserts byte equality of decoded pixels, not a tolerance.
  * (The JPEG spec allows IDCT implementations to differ by ±1/sample;
  * pinning the arithmetic removes that slack from the test.)
  */
object Jpeg {

  /** The shared IDCT basis B(u)(x) = 0.5·C(u)·cos((2x+1)uπ/16) as
    * hex-exact doubles — generated once, embedded identically here and in
    * tools/jpeg_ref.py so the two implementations cannot drift. */
  private val basis: Array[Double] = Array(
    "0x1.6a09e667f3bccp-2", "0x1.6a09e667f3bccp-2", "0x1.6a09e667f3bccp-2", "0x1.6a09e667f3bccp-2",
    "0x1.6a09e667f3bccp-2", "0x1.6a09e667f3bccp-2", "0x1.6a09e667f3bccp-2", "0x1.6a09e667f3bccp-2",
    "0x1.f6297cff75cb0p-2", "0x1.a9b66290ea1a3p-2", "0x1.1c73b39ae68c9p-2", "0x1.8f8b83c69a60dp-4",
    "-0x1.8f8b83c69a608p-4", "-0x1.1c73b39ae68c6p-2", "-0x1.a9b66290ea1a4p-2", "-0x1.f6297cff75cb0p-2",
    "0x1.d906bcf328d46p-2", "0x1.87de2a6aea964p-3", "-0x1.87de2a6aea962p-3", "-0x1.d906bcf328d46p-2",
    "-0x1.d906bcf328d47p-2", "-0x1.87de2a6aea96dp-3", "0x1.87de2a6aea967p-3", "0x1.d906bcf328d44p-2",
    "0x1.a9b66290ea1a3p-2", "-0x1.8f8b83c69a608p-4", "-0x1.f6297cff75cb0p-2", "-0x1.1c73b39ae68c8p-2",
    "0x1.1c73b39ae68c5p-2", "0x1.f6297cff75cb0p-2", "0x1.8f8b83c69a61dp-4", "-0x1.a9b66290ea1a2p-2",
    "0x1.6a09e667f3bcdp-2", "-0x1.6a09e667f3bccp-2", "-0x1.6a09e667f3bcep-2", "0x1.6a09e667f3bcbp-2",
    "0x1.6a09e667f3bcep-2", "-0x1.6a09e667f3bc5p-2", "-0x1.6a09e667f3bc9p-2", "0x1.6a09e667f3bc4p-2",
    "0x1.1c73b39ae68c9p-2", "-0x1.f6297cff75cb0p-2", "0x1.8f8b83c69a60cp-4", "0x1.a9b66290ea1a5p-2",
    "-0x1.a9b66290ea1a2p-2", "-0x1.8f8b83c69a602p-4", "0x1.f6297cff75cb2p-2", "-0x1.1c73b39ae68c2p-2",
    "0x1.87de2a6aea964p-3", "-0x1.d906bcf328d47p-2", "0x1.d906bcf328d44p-2", "-0x1.87de2a6aea965p-3",
    "-0x1.87de2a6aea971p-3", "0x1.d906bcf328d46p-2", "-0x1.d906bcf328d43p-2", "0x1.87de2a6aea95fp-3",
    "0x1.8f8b83c69a60dp-4", "-0x1.1c73b39ae68c8p-2", "0x1.a9b66290ea1a5p-2", "-0x1.f6297cff75cb2p-2",
    "0x1.f6297cff75cb0p-2", "-0x1.a9b66290ea1a1p-2", "0x1.1c73b39ae68c2p-2", "-0x1.8f8b83c69a616p-4"
  ).map(java.lang.Double.parseDouble)

  private val zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K quantization tables (natural order)
  private val stdQLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val stdQChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  // Annex K huffman specs: (bits per code length 1..16, values)
  private val dcLuma = (Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    (0 until 12).toArray)
  private val dcChroma = (Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    (0 until 12).toArray)
  private val acLuma = (Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d),
    Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
      0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
      0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
      0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
      0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
      0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
      0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))
  private val acChroma = (Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    Array(
      0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
      0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
      0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
      0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
      0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
      0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
      0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
      0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
      0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
      0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
      0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
      0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
      0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
      0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa))

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  /** Header-only (format, width, height) from the SOF segment. */
  def quickDims(bytes: Array[Byte]): (Int, Int) = {
    var pos = 2
    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return (0, 0)
      val marker = bytes(pos + 1) & 0xff
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        val h = ((bytes(pos + 5) & 0xff) << 8) | (bytes(pos + 6) & 0xff)
        val w = ((bytes(pos + 7) & 0xff) << 8) | (bytes(pos + 8) & 0xff)
        return (w, h)
      }
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) pos += 2
      else pos += 2 + (((bytes(pos + 2) & 0xff) << 8) | (bytes(pos + 3) & 0xff))
    }
    (0, 0)
  }

  private def clamp255(p: Int): Int = if (p < 0) 0 else if (p > 255) 255 else p

  /** floor(x + 0.5) — the rounding shared with the python reference
    * (python round() is banker's; this form is identical in both). */
  private def r05(x: Double): Int = Math.floor(x + 0.5).toInt

  // ---- decoder -----------------------------------------------------------

  private final class BitReader(d: Array[Byte], var pos: Int) {
    private var acc = 0
    private var n = 0
    /** Skip to the next byte boundary and consume an expected RSTn. */
    def restart(): Unit = {
      n = 0
      require((d(pos) & 0xff) == 0xff && (d(pos + 1) & 0xf8) == 0xd0,
        "expected restart marker")
      pos += 2
    }
    def bit(): Int = {
      if (n == 0) {
        val b = d(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require((d(pos) & 0xff) == 0x00, "marker inside entropy data")
          pos += 1
        }
        acc = b
        n = 8
      }
      n -= 1
      (acc >> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** Canonical huffman decode table in the standard flat-array form
    * (JPEG spec F.2.2.3): for code length l, codes occupy
    * [mincode(l), maxcode(l)] and map to
    * `values(valptr(l) + code - mincode(l))`. Allocation-free lookups —
    * the tuple-keyed Map this replaced boxed a (length, code) pair per
    * probe, which dominated decode time on small images. */
  private final class HuffDec(bits: Array[Int], val values: Array[Int]) {
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1) // -1 → no codes of this length
    val valptr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var ln = 1
      while (ln <= 16) {
        if (bits(ln - 1) > 0) {
          valptr(ln) = k
          mincode(ln) = code
          code += bits(ln - 1); k += bits(ln - 1)
          maxcode(ln) = code - 1
        }
        code <<= 1
        ln += 1
      }
    }
  }

  private def buildDecode(bits: Array[Int], values: Array[Int]): HuffDec =
    new HuffDec(bits, values)

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0, var w: Int = 0, var hh: Int = 0)

  /** Canonical huffman lookup F.2.2.3 (shared by the baseline and
    * progressive entropy decoders). */
  private def huffDecode(br: BitReader, t: HuffDec): Int = {
    var ln = 0
    var code = 0
    while (ln < 16) {
      code = (code << 1) | br.bit()
      ln += 1
      // canonical ranges are disjoint per length; maxcode = -1 ⇒ skip
      if (code <= t.maxcode(ln) && code >= t.mincode(ln))
        return t.values(t.valptr(ln) + code - t.mincode(ln))
    }
    throw new IllegalArgumentException("bad huffman code in entropy data")
  }

  private def extendV(v: Int, cat: Int): Int =
    if (v >= (1 << (cat - 1))) v else v - (1 << cat) + 1

  /** IDCT one dequantized block (natural order) into a plane at (ox,oy) —
    * identical loop structure + rounding as tools/jpeg_ref.py idct. */
  private def idctToPlane(coef: Array[Double], plane: Array[Byte], pw: Int,
      ox: Int, oy: Int): Unit = {
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var r = 0.0
          var u = 0
          while (u < 8) { r += coef(v * 8 + u) * basis(u * 8 + x); u += 1 }
          s += r * basis(v * 8 + y)
          v += 1
        }
        plane((oy + y) * pw + ox + x) =
          clamp255(Math.floor(s + 128.5).toInt).toByte
        x += 1
      }
      y += 1
    }
  }

  /** Upsample + color-convert decoded component planes to top-down RGB
    * (grayscale replicated) — shared by baseline and progressive paths. */
  private def assembleRgb(comps: Array[Comp], planes: Array[Array[Byte]],
      width: Int, height: Int, hmax: Int, vmax: Int): Codecs.Image = {
    val rgb = new Array[Byte](width * height * 3)
    if (comps.length == 1) {
      val c = comps(0)
      var i = 0
      while (i < height) {
        var j = 0
        while (j < width) {
          val v = planes(0)(i * c.w + j)
          val o = 3 * (i * width + j)
          rgb(o) = v; rgb(o + 1) = v; rgb(o + 2) = v
          j += 1
        }
        i += 1
      }
    } else {
      val (c0, c1, c2) = (comps(0), comps(1), comps(2))
      var i = 0
      while (i < height) {
        var j = 0
        while (j < width) {
          val yv = planes(0)((i * c0.v / vmax) * c0.w + (j * c0.h / hmax)) & 0xff
          val cb = planes(1)((i * c1.v / vmax) * c1.w + (j * c1.h / hmax)) & 0xff
          val cr = planes(2)((i * c2.v / vmax) * c2.w + (j * c2.h / hmax)) & 0xff
          val o = 3 * (i * width + j)
          rgb(o) = clamp255(r05(yv + 1.402 * (cr - 128))).toByte
          rgb(o + 1) = clamp255(r05(yv - 0.344136286 * (cb - 128) - 0.714136286 * (cr - 128))).toByte
          rgb(o + 2) = clamp255(r05(yv + 1.772 * (cb - 128))).toByte
          j += 1
        }
        i += 1
      }
    }
    Codecs.Image(width, height, rgb)
  }

  /** Decode a baseline JPEG into top-down RGB (grayscale replicated). */
  def decode(bytes: Array[Byte]): Codecs.Image = {
    require(isJpeg(bytes), "not a JPEG payload")
    var pos = 2
    val qtabs = new Array[Array[Int]](4)
    val htabs = new Array[HuffDec](8) // index = class·4 + table id
    var comps: Array[Comp] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var scanStart = -1
    while (scanStart < 0) {
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      marker match {
        case 0xd9 => throw new IllegalArgumentException("EOI before scan data")
        case 0xc2 => return decodeProgressive(bytes)
        case m if m == 0xc1 || m == 0xc3 || (m >= 0xc5 && m <= 0xc7) ||
            (m >= 0xc9 && m <= 0xcb) || (m >= 0xcd && m <= 0xcf) =>
          throw new IllegalArgumentException(
            f"unsupported JPEG coding (marker 0xff$m%02x) — baseline (SOF0) only")
        case _ =>
          val ln = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
          val seg = pos + 2
          marker match {
            case 0xdb => // DQT
              var p = seg
              while (p < pos + ln) {
                require((bytes(p) >> 4) == 0, "only 8-bit quant tables supported")
                val tid = bytes(p) & 0x0f
                val tab = new Array[Int](64)
                var i = 0
                while (i < 64) { tab(zigzag(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
                qtabs(tid) = tab
                p += 65
              }
            case 0xc4 => // DHT
              var p = seg
              while (p < pos + ln) {
                val tc = (bytes(p) & 0xff) >> 4
                val th = bytes(p) & 0x0f
                require(tc <= 1 && th <= 3, s"bad DHT class/id $tc/$th")
                val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
                val nv = bits.sum
                val values = Array.tabulate(nv)(i => bytes(p + 17 + i) & 0xff)
                htabs(tc * 4 + th) = buildDecode(bits, values)
                p += 17 + nv
              }
            case 0xc0 => // SOF0 baseline
              require((bytes(seg) & 0xff) == 8, "only 8-bit precision supported")
              height = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
              width = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
              val nc = bytes(seg + 5) & 0xff
              require(nc == 1 || nc == 3, s"unsupported component count $nc")
              comps = Array.tabulate(nc) { c =>
                val samp = bytes(seg + 7 + 3 * c) & 0xff
                val comp = Comp(bytes(seg + 6 + 3 * c) & 0xff,
                  samp >> 4, samp & 0x0f, bytes(seg + 8 + 3 * c) & 0xff)
                require(comp.h >= 1 && comp.h <= 2 && comp.v >= 1 && comp.v <= 2,
                  s"unsupported sampling ${comp.h}x${comp.v} (1-2 only)")
                comp
              }
              if (nc == 1) {
                // a single-component scan is NON-interleaved (JPEG spec
                // B.2.3): one data unit per MCU in raster order, whatever
                // the declared sampling factors — treating samp 2x2 as a
                // 4-block MCU would scramble the block order
                comps(0) = comps(0).copy(h = 1, v = 1)
              }
            case 0xdd => // DRI
              restartInterval = ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
            case 0xda => // SOS
              val ns = bytes(seg) & 0xff
              var c = 0
              while (c < ns) {
                val cid = bytes(seg + 1 + 2 * c) & 0xff
                val tabs = bytes(seg + 2 + 2 * c) & 0xff
                comps.find(_.id == cid).foreach { comp =>
                  comp.td = tabs >> 4
                  comp.ta = tabs & 0x0f
                }
                c += 1
              }
              scanStart = pos + ln
            case _ => () // APPn / COM / others skipped
          }
          pos += ln
      }
    }
    require(comps != null && width > 0 && height > 0, "missing SOF before SOS")

    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcux = (width + 8 * hmax - 1) / (8 * hmax)
    val mcuy = (height + 8 * vmax - 1) / (8 * vmax)
    val planes = comps.map { c =>
      c.w = mcux * 8 * c.h
      c.hh = mcuy * 8 * c.v
      new Array[Byte](c.w * c.hh)
    }
    val br = new BitReader(bytes, scanStart)

    def huff(t: HuffDec): Int = huffDecode(br, t)
    def extend(v: Int, cat: Int): Int = extendV(v, cat)

    val preds = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    val zz = new Array[Int](64)
    // per-component table resolution, once per scan (not per block)
    val dcTabs = comps.map { c =>
      val t = htabs(c.td)
      require(t != null, s"missing DC table ${c.td}"); t
    }
    val acTabs = comps.map { c =>
      val t = htabs(4 + c.ta)
      require(t != null, s"missing AC table ${c.ta}"); t
    }
    var mcu = 0
    var my = 0
    while (my < mcuy) {
      var mx = 0
      while (mx < mcux) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var bv = 0
          while (bv < c.v) {
            var bh = 0
            while (bh < c.h) {
              val dcTab = dcTabs(ci)
              val acTab = acTabs(ci)
              val cat = huff(dcTab)
              val diff = if (cat == 0) 0 else extend(br.bits(cat), cat)
              preds(ci) += diff
              java.util.Arrays.fill(zz, 0)
              zz(0) = preds(ci)
              var i = 1
              var eob = false
              while (i < 64 && !eob) {
                val rs = huff(acTab)
                val run = rs >> 4
                val size = rs & 0x0f
                if (size == 0) {
                  if (run == 15) i += 16 else eob = true
                } else {
                  i += run
                  zz(i) = extend(br.bits(size), size)
                  i += 1
                }
              }
              val q = qtabs(c.tq)
              require(q != null, s"missing quant table ${c.tq}")
              var k = 0
              while (k < 64) { coef(zigzag(k)) = (zz(k) * q(zigzag(k))).toDouble; k += 1 }
              idctToPlane(coef, planes(ci), c.w, (mx * c.h + bh) * 8, (my * c.v + bv) * 8)
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }

    assembleRgb(comps, planes, width, height, hmax, vmax)
  }

  /** Decode a progressive JPEG (SOF2, spec Annex G): coefficients
    * accumulate across spectral-selection / successive-approximation
    * scans — DC first + bit-refinement, AC first + refinement with
    * EOB-run coding — then one shared dequantize + IDCT + upsample pass
    * produces pixels. DHT/DQT segments between scans are honored (table
    * redefinition is routine in progressive streams); restart markers
    * reset DC predictors and the pending EOB run. */
  private def decodeProgressive(bytes: Array[Byte]): Codecs.Image = {
    var pos = 2
    val qtabs = new Array[Array[Int]](4)
    val htabs = new Array[HuffDec](8)
    var comps: Array[Comp] = null
    var width = 0
    var height = 0
    var restartInterval = 0
    var hmax = 1
    var vmax = 1
    var mcux = 0
    var mcuy = 0
    // per component: (mcux·h)·(mcuy·v) blocks × 64 coefficients, natural order
    var coefs: Array[Array[Int]] = null
    var sawScan = false
    var done = false
    while (!done) {
      require((bytes(pos) & 0xff) == 0xff, f"expected marker at $pos")
      val marker = bytes(pos + 1) & 0xff
      pos += 2
      if (marker == 0xd9) done = true
      else if (marker >= 0xd0 && marker <= 0xd7) () // stray RST between scans
      else {
        val ln = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff)
        val seg = pos + 2
        marker match {
          case 0xdb =>
            var p = seg
            while (p < pos + ln) {
              require((bytes(p) >> 4) == 0, "only 8-bit quant tables supported")
              val tid = bytes(p) & 0x0f
              val tab = new Array[Int](64)
              var i = 0
              while (i < 64) { tab(zigzag(i)) = bytes(p + 1 + i) & 0xff; i += 1 }
              qtabs(tid) = tab
              p += 65
            }
          case 0xc4 =>
            var p = seg
            while (p < pos + ln) {
              val tc = (bytes(p) & 0xff) >> 4
              val th = bytes(p) & 0x0f
              require(tc <= 1 && th <= 3, s"bad DHT class/id $tc/$th")
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val nv = bits.sum
              val values = Array.tabulate(nv)(i => bytes(p + 17 + i) & 0xff)
              htabs(tc * 4 + th) = buildDecode(bits, values)
              p += 17 + nv
            }
          case 0xc2 =>
            require(comps == null, "multiple SOF segments")
            require((bytes(seg) & 0xff) == 8, "only 8-bit precision supported")
            height = ((bytes(seg + 1) & 0xff) << 8) | (bytes(seg + 2) & 0xff)
            width = ((bytes(seg + 3) & 0xff) << 8) | (bytes(seg + 4) & 0xff)
            val nc = bytes(seg + 5) & 0xff
            require(nc == 1 || nc == 3, s"unsupported component count $nc")
            comps = Array.tabulate(nc) { c =>
              val samp = bytes(seg + 7 + 3 * c) & 0xff
              val comp = Comp(bytes(seg + 6 + 3 * c) & 0xff,
                samp >> 4, samp & 0x0f, bytes(seg + 8 + 3 * c) & 0xff)
              require(comp.h >= 1 && comp.h <= 2 && comp.v >= 1 && comp.v <= 2,
                s"unsupported sampling ${comp.h}x${comp.v} (1-2 only)")
              comp
            }
            hmax = comps.map(_.h).max
            vmax = comps.map(_.v).max
            mcux = (width + 8 * hmax - 1) / (8 * hmax)
            mcuy = (height + 8 * vmax - 1) / (8 * vmax)
            coefs = comps.map(c => new Array[Int](mcux * c.h * mcuy * c.v * 64))
          case 0xdd =>
            restartInterval = ((bytes(seg) & 0xff) << 8) | (bytes(seg + 1) & 0xff)
          case 0xda =>
            require(comps != null, "SOS before SOF2")
            val ns = bytes(seg) & 0xff
            val scanComps = Array.tabulate(ns) { c =>
              val cid = bytes(seg + 1 + 2 * c) & 0xff
              val tabs = bytes(seg + 2 + 2 * c) & 0xff
              val idx = comps.indexWhere(_.id == cid)
              require(idx >= 0, s"scan references unknown component $cid")
              comps(idx).td = tabs >> 4
              comps(idx).ta = tabs & 0x0f
              idx
            }
            val ss = bytes(seg + 1 + 2 * ns) & 0xff
            val se = bytes(seg + 2 + 2 * ns) & 0xff
            val ahal = bytes(seg + 3 + 2 * ns) & 0xff
            pos = decodeProgScan(bytes, pos + ln, comps, scanComps, coefs,
              htabs, mcux, mcuy, hmax, vmax, width, height, restartInterval,
              ss, se, ahal >> 4, ahal & 0x0f)
            sawScan = true
          case m if m == 0xc0 || m == 0xc1 || m == 0xc3 ||
              (m >= 0xc5 && m <= 0xc7) || (m >= 0xc9 && m <= 0xcb) ||
              (m >= 0xcd && m <= 0xcf) =>
            throw new IllegalArgumentException(
              f"unexpected second frame marker 0xff$m%02x in progressive stream")
          case _ => () // APPn / COM skipped
        }
        if (marker != 0xda) pos += ln
      }
    }
    require(comps != null && sawScan, "missing SOF2/scan data")

    val planes = comps.map { c =>
      c.w = mcux * 8 * c.h
      c.hh = mcuy * 8 * c.v
      new Array[Byte](c.w * c.hh)
    }
    val coefD = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val c = comps(ci)
      val q = qtabs(c.tq)
      require(q != null, s"missing quant table ${c.tq}")
      val bw = mcux * c.h
      val bh = mcuy * c.v
      val cc = coefs(ci)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val off = (by * bw + bx) * 64
          var k = 0
          while (k < 64) { coefD(k) = (cc(off + k) * q(k)).toDouble; k += 1 }
          idctToPlane(coefD, planes(ci), c.w, bx * 8, by * 8)
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    assembleRgb(comps, planes, width, height, hmax, vmax)
  }

  /** Decode one progressive scan's entropy data; returns the position of
    * the marker following the scan. Algorithms per spec G.1.2: DC uses
    * two's-complement accumulate + bit-OR refinement; AC uses
    * sign-magnitude point transform with EOB-run coding. */
  private def decodeProgScan(bytes: Array[Byte], start: Int,
      comps: Array[Comp], scanComps: Array[Int], coefs: Array[Array[Int]],
      htabs: Array[HuffDec], mcux: Int, mcuy: Int, hmax: Int, vmax: Int,
      width: Int, height: Int, restartInterval: Int,
      ss: Int, se: Int, ah: Int, al: Int): Int = {
    require(ss <= 63 && se <= 63 && ss <= se, s"bad spectral band $ss..$se")
    if (ss == 0) require(se == 0, "progressive DC scan must have Se=0 (G.1.1.1.1)")
    else require(scanComps.length == 1, "progressive AC scans are single-component")
    val br = new BitReader(bytes, start)
    var eobrun = 0
    val preds = new Array[Int](comps.length)

    def refine(coef: Array[Int], idx: Int, p1: Int, m1: Int): Unit =
      if (br.bit() == 1 && (coef(idx) & p1) == 0)
        coef(idx) += (if (coef(idx) >= 0) p1 else m1)

    def acFirst(coef: Array[Int], off: Int, t: HuffDec): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = huffDecode(br, t)
        val r = rs >> 4
        val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else {
            // EOBn: count EXCLUDES the current block (it ends here)
            eobrun = (1 << r) - 1 + (if (r > 0) br.bits(r) else 0)
            k = 64
          }
        } else {
          k += r
          require(k <= se, "AC coefficient run past band end")
          coef(off + zigzag(k)) = extendV(br.bits(s), s) << al
          k += 1
        }
      }
    }

    def acRefine(coef: Array[Int], off: Int, t: HuffDec): Unit = {
      val p1 = 1 << al
      val m1 = -(1 << al)
      var k = ss
      if (eobrun == 0) {
        var atEob = false
        while (k <= se && !atEob) {
          val rs = huffDecode(br, t)
          var r = rs >> 4
          val s = rs & 0x0f
          var newval = 0
          if (s == 0) {
            if (r != 15) {
              // EOBn in refinement: count INCLUDES the current block —
              // its tail correction bits are read in the eobrun block below
              eobrun = (1 << r) + (if (r > 0) br.bits(r) else 0)
              atEob = true
            }
            // r == 15 → ZRL: skip 16 zero-history positions below
          } else {
            require(s == 1, "AC refinement magnitude must be 1 (G.1.2.3)")
            newval = if (br.bit() == 1) p1 else m1
          }
          if (!atEob) {
            // walk forward: nonzero-history coefficients read a correction
            // bit (and don't count against r); the (r+1)th zero-history
            // position receives the newly-nonzero value (ZRL: 16 skips)
            var placed = false
            while (k <= se && !placed) {
              val idx = off + zigzag(k)
              if (coef(idx) != 0) refine(coef, idx, p1, m1)
              else if (r == 0) {
                if (s != 0) coef(idx) = newval
                placed = true
              } else r -= 1
              k += 1
            }
          }
        }
      }
      if (eobrun > 0) {
        // rest of the band: correction bits for nonzero-history coefficients
        while (k <= se) {
          val idx = off + zigzag(k)
          if (coef(idx) != 0) refine(coef, idx, p1, m1)
          k += 1
        }
        eobrun -= 1
      }
    }

    // decode one 8x8 data unit of component ci at block coords (bx, by)
    def unit(ci: Int, bx: Int, by: Int): Unit = {
      val c = comps(ci)
      val off = (by * (mcux * c.h) + bx) * 64
      val coef = coefs(ci)
      if (ss == 0) {
        if (ah == 0) {
          val t = htabs(c.td)
          require(t != null, s"missing DC table ${c.td}")
          val cat = huffDecode(br, t)
          val diff = if (cat == 0) 0 else extendV(br.bits(cat), cat)
          preds(ci) += diff
          coef(off) = preds(ci) << al
        } else if (br.bit() == 1) coef(off) = coef(off) | (1 << al)
      } else {
        val t = htabs(4 + c.ta)
        require(t != null, s"missing AC table ${c.ta}")
        if (ah == 0) acFirst(coef, off, t) else acRefine(coef, off, t)
      }
    }

    var unitsDone = 0
    def maybeRestart(): Unit =
      if (restartInterval > 0 && unitsDone > 0 && unitsDone % restartInterval == 0) {
        br.restart()
        java.util.Arrays.fill(preds, 0)
        eobrun = 0
      }

    if (scanComps.length > 1) {
      // interleaved (DC scans only): h×v data units per component per MCU
      var my = 0
      while (my < mcuy) {
        var mx = 0
        while (mx < mcux) {
          maybeRestart()
          var sc = 0
          while (sc < scanComps.length) {
            val ci = scanComps(sc)
            val c = comps(ci)
            var bv = 0
            while (bv < c.v) {
              var bh = 0
              while (bh < c.h) {
                unit(ci, mx * c.h + bh, my * c.v + bv)
                bh += 1
              }
              bv += 1
            }
            sc += 1
          }
          unitsDone += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved: blocks of this component's OWN scaled dims in
      // raster order (spec A.2.2) — can be fewer than the MCU-grid blocks
      val ci = scanComps(0)
      val c = comps(ci)
      val cw = (width * c.h + hmax - 1) / hmax
      val ch = (height * c.v + vmax - 1) / vmax
      val nbw = (cw + 7) / 8
      val nbh = (ch + 7) / 8
      var by = 0
      while (by < nbh) {
        var bx = 0
        while (bx < nbw) {
          maybeRestart()
          unit(ci, bx, by)
          unitsDone += 1
          bx += 1
        }
        by += 1
      }
    }

    // skip pad bits / stuffing to the next true marker
    var p = br.pos
    while (p + 1 < bytes.length &&
        !((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) != 0x00))
      p += 1
    p
  }

  // ---- encoder (4:4:4 / grayscale, fixture + resize path) ----------------

  private def scaleQ(table: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val s = if (q < 50) 5000 / q else 200 - q * 2
    table.map(t => math.max(1, math.min(255, (t * s + 50) / 100)))
  }

  /** Canonical huffman encode table: value → (length, code). */
  private def buildEncode(bits: Array[Int], values: Array[Int]): Array[(Int, Int)] = {
    val m = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var ln = 1
    while (ln <= 16) {
      var i = 0
      while (i < bits(ln - 1)) {
        m(values(k)) = (ln, code)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      ln += 1
    }
    m
  }

  // The encoder always writes the four standard tables — build them once.
  private lazy val encDcLumaT = buildEncode(dcLuma._1, dcLuma._2)
  private lazy val encAcLumaT = buildEncode(acLuma._1, acLuma._2)
  private lazy val encDcChromaT = buildEncode(dcChroma._1, dcChroma._2)
  private lazy val encAcChromaT = buildEncode(acChroma._1, acChroma._2)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(value: Int, ln: Int): Unit = {
      var i = ln - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0
          n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = while (n != 0) put(1, 1)
  }

  private def category(v: Int): Int = {
    var a = math.abs(v)
    var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** Encode top-down pixels as baseline JPEG. Pixel layout picks the
    * color structure: w·h·3 → YCbCr 4:4:4; w·h → grayscale. */
  def encode(width: Int, height: Int, pixels: Array[Byte], quality: Int = 90): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val gray = pixels.length == width * height
    require(gray || pixels.length == width * height * 3,
      s"pixel array length ${pixels.length} matches neither RGB nor gray for ${width}x$height")
    val ql = scaleQ(stdQLuma, quality)
    val qc = scaleQ(stdQChroma, quality)
    val nc = if (gray) 1 else 3
    // color convert whole planes once
    val planes = if (gray) Array(pixels.map(b => (b & 0xff).toFloat))
    else {
      val n = width * height
      val y = new Array[Float](n)
      val cb = new Array[Float](n)
      val cr = new Array[Float](n)
      var i = 0
      while (i < n) {
        val r = pixels(3 * i) & 0xff
        val g = pixels(3 * i + 1) & 0xff
        val b = pixels(3 * i + 2) & 0xff
        y(i) = clamp255(r05(0.299 * r + 0.587 * g + 0.114 * b)).toFloat
        cb(i) = clamp255(r05(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b)).toFloat
        cr(i) = clamp255(r05(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b)).toFloat
        i += 1
      }
      Array(y, cb, cr)
    }

    val out = new java.io.ByteArrayOutputStream(1024)
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, data: Array[Int]): Unit = {
      marker(m)
      val ln = data.length + 2
      out.write(ln >> 8); out.write(ln & 0xff)
      data.foreach(out.write)
    }
    marker(0xd8)
    seg(0xdb, 0 +: zigzag.map(ql))
    if (!gray) seg(0xdb, 1 +: zigzag.map(qc))
    seg(0xc0, Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff, nc) ++
      (0 until nc).flatMap(c => Seq(c + 1, 0x11, if (c == 0) 0 else 1)))
    def dht(cls: Int, tid: Int, spec: (Array[Int], Array[Int])): Unit =
      seg(0xc4, Array(cls << 4 | tid) ++ spec._1 ++ spec._2)
    dht(0, 0, dcLuma)
    dht(1, 0, acLuma)
    if (!gray) { dht(0, 1, dcChroma); dht(1, 1, acChroma) }
    seg(0xda, Array(nc) ++ (0 until nc).flatMap(c =>
      Seq(c + 1, if (c == 0) 0x00 else 0x11)) ++ Seq(0, 63, 0))

    val bw = new BitWriter(out)
    val encDcL = encDcLumaT
    val encAcL = encAcLumaT
    val encDcC = if (gray) null else encDcChromaT
    val encAcC = if (gray) null else encAcChromaT
    val preds = new Array[Int](nc)
    val block = new Array[Double](64)
    val fdctOut = new Array[Double](64)
    val q = new Array[Int](64)
    var by = 0
    while (by < (height + 7) / 8) {
      var bx = 0
      while (bx < (width + 7) / 8) {
        var c = 0
        while (c < nc) {
          var yy = 0
          while (yy < 8) {
            val sy = math.min(by * 8 + yy, height - 1)
            var xx = 0
            while (xx < 8) {
              val sx = math.min(bx * 8 + xx, width - 1)
              block(yy * 8 + xx) = planes(c)(sy * width + sx) - 128.0
              xx += 1
            }
            yy += 1
          }
          // FDCT with the same orthonormal basis
          var v = 0
          while (v < 8) {
            var u = 0
            while (u < 8) {
              var s = 0.0
              var y2 = 0
              while (y2 < 8) {
                var r = 0.0
                var x2 = 0
                while (x2 < 8) { r += block(y2 * 8 + x2) * basis(u * 8 + x2); x2 += 1 }
                s += r * basis(v * 8 + y2)
                y2 += 1
              }
              fdctOut(v * 8 + u) = s
              u += 1
            }
            v += 1
          }
          val qt = if (c == 0) ql else qc
          var i = 0
          while (i < 64) {
            val x = fdctOut(i) / qt(i)
            q(i) = (if (x >= 0) Math.floor(x + 0.5) else -Math.floor(-x + 0.5)).toInt
            i += 1
          }
          val encDc = if (c == 0) encDcL else encDcC
          val encAc = if (c == 0) encAcL else encAcC
          val dc = q(0) - preds(c)
          preds(c) = q(0)
          val cat = category(dc)
          val (dl, dcode) = encDc(cat)
          bw.put(dcode, dl)
          if (cat > 0) bw.put(if (dc >= 0) dc else dc + (1 << cat) - 1, cat)
          var run = 0
          i = 1
          while (i < 64) {
            val zv = q(zigzag(i))
            if (zv == 0) run += 1
            else {
              while (run > 15) {
                val (zl, zc) = encAc(0xf0)
                bw.put(zc, zl)
                run -= 16
              }
              val acat = category(zv)
              val (al, acode) = encAc((run << 4) | acat)
              bw.put(acode, al)
              bw.put(if (zv >= 0) zv else zv + (1 << acat) - 1, acat)
              run = 0
            }
            i += 1
          }
          if (run > 0) {
            val (el, ec) = encAc(0x00)
            bw.put(ec, el)
          }
          c += 1
        }
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9)
    out.toByteArray
  }
}
