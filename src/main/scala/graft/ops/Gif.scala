package graft.ops

/** Minimal pure-JVM GIF87a/89a codec — the palette+LZW member of the real
  * decode seam (BMP = uncompressed, PNG = lossless DEFLATE, JPEG = lossy
  * DCT, GIF = indexed-color LZW; between them every mainstream still-image
  * compression family runs for real in this engine, no native libs).
  *
  * Decoder: global/local color tables, LSB-first variable-width LZW with
  * deferred clear codes (truncated entropy data is a named data error —
  * zero padding never decodes as pixels), interlaced images (the
  * four-pass row order), multi-frame animations composited left/top onto
  * the canvas, GCE transparency (transparent pixels show the previous
  * canvas content), and the full GIF89a disposal semantics applied AFTER
  * a frame's display: 0/1 keep, 2 clears the frame's rect to background
  * before the next frame, 3 restores the canvas to its pre-frame state.
  * Unknown extensions (comment/app/plain-text) are skipped by sub-block
  * walking, as the spec intends.
  *
  * Encoder (fixture + transform path): builds one global palette from the
  * distinct colors across all frames (≤ 256 required — synthesized
  * fixtures and re-encodes of decoded GIFs satisfy this by construction),
  * real LZW compression with code-width growth and table reset at 4096,
  * non-interlaced, one GCE per frame carrying the delay.
  *
  * Golden decode bytes come from the INDEPENDENT python reference
  * (`tools/gif_ref.py` — separate LZW/palette implementation), so the two
  * codecs cross-check each other; round-trips pin the encoder.
  */
object Gif {

  def isGif(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 13 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  /** (width, height) from the logical screen descriptor — header-only. */
  def quickDims(bytes: Array[Byte]): (Int, Int) =
    (((bytes(7) & 0xff) << 8) | (bytes(6) & 0xff),
      ((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff))

  // ---- decoder -----------------------------------------------------------

  /** LSB-first bit reader over the concatenated LZW sub-block payload. */
  private final class BitReader(d: Array[Byte]) {
    private var pos = 0
    private var acc = 0
    private var n = 0
    /** true once any delivered bit came from past the end of the input —
      * zero padding must never decode as pixel data (a truncated payload
      * inside an intact container is a DATA error for the OnError policy,
      * same posture as the PNG/JPEG paths), so [[lzwDecode]] checks this
      * after every code read. */
    var exhausted = false
    def bits(k: Int): Int = {
      while (n < k) {
        if (pos < d.length) acc |= (d(pos) & 0xff) << n
        else exhausted = true
        pos += 1
        n += 8
      }
      val v = acc & ((1 << k) - 1)
      acc >>>= k
      n -= k
      v
    }
  }

  /** GIF-LZW decode of `data` with initial code size `mcs` into exactly
    * `expected` color indices. */
  private def lzwDecode(data: Array[Byte], mcs: Int, expected: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    val stack = new Array[Byte](4096)
    val br = new BitReader(data)
    var codeSize = mcs + 1
    var next = eoi + 1
    var prev = -1
    var oldFirst: Byte = 0 // first byte of the previously emitted string
    var outPos = 0
    while (outPos < expected) {
      val code = br.bits(codeSize)
      require(!br.exhausted,
        s"truncated LZW data: input exhausted at $outPos/$expected pixels")
      if (code == clear) {
        codeSize = mcs + 1
        next = eoi + 1
        prev = -1
      } else if (code == eoi) {
        require(outPos == expected, s"early EOI at $outPos/$expected pixels")
      } else {
        require(code < next || (code == next && prev >= 0), s"bad LZW code $code (next=$next)")
        var sp = 0
        var c = code
        if (code == next) {
          // KwKwK: string(prev) + first(prev) — the extra byte goes to the
          // stack BOTTOM (popped last), then the chain unwinds from prev
          stack(sp) = oldFirst; sp += 1
          c = prev
        }
        // unwind the byte chain; roots (< clear) are literal indices
        while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        require(c < clear, s"corrupt LZW chain root $c")
        val first = c.toByte
        oldFirst = first
        out(outPos) = first; outPos += 1
        while (sp > 0 && outPos < expected) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        require(sp == 0, "LZW output overran the frame size")
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    out
  }

  private val interlacePasses = Array((0, 8), (4, 8), (2, 4), (1, 2))

  /** Decode a GIF into top-down RGB frames. `fps` derives from the first
    * frame's GCE delay (centiseconds; 0 → 10 fps by convention). */
  def decode(bytes: Array[Byte]): Codecs.Video = {
    require(isGif(bytes), "not a GIF payload")
    val (width, height) = quickDims(bytes)
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    var pos = 10
    val packed = bytes(pos) & 0xff
    val bg = bytes(pos + 1) & 0xff
    pos += 3
    val gct: Array[Byte] =
      if ((packed & 0x80) != 0) {
        val sz = 3 * (2 << (packed & 0x07))
        val t = java.util.Arrays.copyOfRange(bytes, pos, pos + sz)
        pos += sz
        t
      } else null

    // canvas starts as the background color (black without a GCT)
    val canvas = new Array[Byte](width * height * 3)
    if (gct != null && 3 * bg + 2 < gct.length) {
      var i = 0
      while (i < canvas.length) {
        canvas(i) = gct(3 * bg); canvas(i + 1) = gct(3 * bg + 1); canvas(i + 2) = gct(3 * bg + 2)
        i += 3
      }
    }

    val frames = Seq.newBuilder[Array[Byte]]
    var nFrames = 0
    var fps = 10
    var transparent = -1
    var disposal = 0
    // GIF89a §23: a frame's disposal takes effect AFTER it is displayed —
    // i.e. before the NEXT frame composites. Carried across iterations:
    var prevDisposal = 0
    var prevRect = (0, 0, 0, 0) // (left, top, w, h) of the previous frame
    var snapshot: Array[Byte] = null // pre-draw canvas, kept iff disposal=3
    // background triple: the GCT bg entry, or black without a GCT
    val (bgR, bgG, bgB) =
      if (gct != null && 3 * bg + 2 < gct.length)
        (gct(3 * bg), gct(3 * bg + 1), gct(3 * bg + 2))
      else (0.toByte, 0.toByte, 0.toByte)
    var done = false
    while (!done) {
      (bytes(pos) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks
          val label = bytes(pos + 1) & 0xff
          pos += 2
          if (label == 0xf9) { // graphic control
            val p = bytes(pos + 1) & 0xff
            disposal = (p >> 2) & 0x7
            val delay = ((bytes(pos + 3) & 0xff) << 8) | (bytes(pos + 2) & 0xff)
            if (nFrames == 0 && delay > 0) fps = math.max(100 / delay, 1)
            transparent = if ((p & 1) != 0) bytes(pos + 4) & 0xff else -1
          }
          while ((bytes(pos) & 0xff) != 0) pos += 1 + (bytes(pos) & 0xff)
          pos += 1
        case 0x2c => // image descriptor
          def u16(o: Int) = ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
          val (left, top, fw, fh) = (u16(pos + 1), u16(pos + 3), u16(pos + 5), u16(pos + 7))
          val ip = bytes(pos + 9) & 0xff
          pos += 10
          val pal =
            if ((ip & 0x80) != 0) {
              val sz = 3 * (2 << (ip & 0x07))
              val t = java.util.Arrays.copyOfRange(bytes, pos, pos + sz)
              pos += sz
              t
            } else {
              require(gct != null, "image has neither local nor global color table")
              gct
            }
          val interlaced = (ip & 0x40) != 0
          val mcs = bytes(pos) & 0xff
          pos += 1
          val data = new java.io.ByteArrayOutputStream()
          while ((bytes(pos) & 0xff) != 0) {
            val n = bytes(pos) & 0xff
            data.write(bytes, pos + 1, n)
            pos += 1 + n
          }
          pos += 1
          val idx = lzwDecode(data.toByteArray, mcs, fw * fh)
          // row order: sequential, or the four interlace passes
          val rowOf = new Array[Int](fh)
          if (interlaced) {
            var r = 0
            interlacePasses.foreach { case (start, step) =>
              var y = start
              while (y < fh) { rowOf(r) = y; r += 1; y += step }
            }
          } else {
            var y = 0
            while (y < fh) { rowOf(y) = y; y += 1 }
          }
          // dispose of the PREVIOUS frame first (its disposal acts after
          // its display): 2 = clear its rect to background, 3 = restore
          // the canvas to the state before it was drawn
          if (prevDisposal == 2) {
            val (pl, pt, pw, ph) = prevRect
            var y = 0
            while (y < ph) {
              var x = 0
              while (x < pw) {
                val o = 3 * ((pt + y) * width + pl + x)
                canvas(o) = bgR; canvas(o + 1) = bgG; canvas(o + 2) = bgB
                x += 1
              }
              y += 1
            }
          } else if (prevDisposal == 3 && snapshot != null) {
            System.arraycopy(snapshot, 0, canvas, 0, canvas.length)
          }
          // only a restore-to-previous frame needs the pre-draw canvas kept
          snapshot = if (disposal == 3) canvas.clone() else null
          var r = 0
          while (r < fh) {
            val y = rowOf(r)
            var x = 0
            while (x < fw) {
              val ci = idx(r * fw + x) & 0xff
              if (ci != transparent) {
                require(3 * ci + 2 < pal.length, s"palette index $ci out of range")
                val o = 3 * ((top + y) * width + left + x)
                canvas(o) = pal(3 * ci); canvas(o + 1) = pal(3 * ci + 1); canvas(o + 2) = pal(3 * ci + 2)
              }
              x += 1
            }
            r += 1
          }
          frames += canvas.clone()
          nFrames += 1
          prevDisposal = disposal
          prevRect = (left, top, fw, fh)
          // a GCE applies only to the single rendering block that follows
          // it (GIF89a §23) — both fields reset, not just transparency,
          // or one disposal=2 frame would background-clear every later
          // GCE-less frame
          transparent = -1
          disposal = 0
        case other =>
          throw new IllegalArgumentException(f"unknown GIF block 0x$other%02x at $pos")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "GIF contains no image data")
    Codecs.Video(width, height, fps, fs)
  }

  // ---- encoder -----------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(v: Int, k: Int): Unit = {
      acc |= v << n
      n += k
      while (n >= 8) { out.write(acc & 0xff); acc >>>= 8; n -= 8 }
    }
    def flush(): Unit = if (n > 0) { out.write(acc & 0xff); acc = 0; n = 0 }
  }

  private def lzwEncode(idx: Array[Byte], mcs: Int): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(idx.length / 2 + 16)
    val bw = new BitWriter(out)
    // dictionary: (prefix code, next byte) → code, as a flat hash map
    var dict = new java.util.HashMap[Integer, Integer]()
    var codeSize = mcs + 1
    var next = eoi + 1
    bw.put(clear, codeSize)
    var cur = idx(0) & 0xff
    var i = 1
    while (i < idx.length) {
      val c = idx(i) & 0xff
      val key = Integer.valueOf((cur << 8) | c)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        bw.put(cur, codeSize)
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next))
          // the decoder widens when its NEXT slot reaches the width limit;
          // the encoder mirrors that one step ahead of emission
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          next += 1
        } else {
          bw.put(clear, codeSize)
          dict = new java.util.HashMap[Integer, Integer]()
          codeSize = mcs + 1
          next = eoi + 1
        }
        cur = c
      }
      i += 1
    }
    bw.put(cur, codeSize)
    bw.put(eoi, codeSize)
    bw.flush()
    out.toByteArray
  }

  /** Encode top-down RGB frames as an animated (or single-frame) GIF89a
    * with one global palette built from the distinct colors across all
    * frames (≤ 256 — indexed color is the format's contract). */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]], delayCs: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(frames.nonEmpty, "need at least one frame")
    require(frames.forall(_.length == width * height * 3),
      s"every frame needs ${width * height * 3} RGB bytes")
    val palette = new java.util.LinkedHashMap[Integer, Integer]()
    frames.foreach { rgb =>
      var i = 0
      while (i < rgb.length) {
        val c = ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff)
        if (!palette.containsKey(c)) palette.put(c, palette.size())
        i += 3
      }
    }
    require(palette.size() <= 256,
      s"GIF is indexed color: ${palette.size()} distinct colors > 256 — quantize first")
    var exp = 0 // GCT size exponent: table holds 2^(exp+1) entries
    while ((2 << exp) < palette.size()) exp += 1
    val mcs = math.max(exp + 1, 2) // LZW min code size ≥ 2 per spec
    val out = new java.io.ByteArrayOutputStream(1024)
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0x80 | ((mcs - 1) << 4) | exp) // GCT present, color resolution, size
    out.write(0); out.write(0)               // bg index, aspect
    val it = palette.keySet().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    var pad = palette.size()
    while (pad < (2 << exp)) { out.write(0); out.write(0); out.write(0); pad += 1 }
    frames.foreach { rgb =>
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(0)                                   // no transparency, disposal 0
      u16(delayCs); out.write(0); out.write(0)
      out.write(0x2c); u16(0); u16(0); u16(width); u16(height); out.write(0)
      val idx = new Array[Byte](width * height)
      var i = 0
      while (i < idx.length) {
        val c = ((rgb(3 * i) & 0xff) << 16) | ((rgb(3 * i + 1) & 0xff) << 8) | (rgb(3 * i + 2) & 0xff)
        idx(i) = palette.get(c).intValue().toByte
        i += 1
      }
      out.write(mcs)
      val lzw = lzwEncode(idx, mcs)
      var p = 0
      while (p < lzw.length) {
        val n = math.min(255, lzw.length - p)
        out.write(n); out.write(lzw, p, n)
        p += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Frame sampler through the media-transform seam: keep every
    * `stride`-th frame (first always kept), halving/quartering animation
    * payloads the way [[Codecs.frameSampleAvi]] does for AVI. */
  def frameSample(stride: Int)(payload: Array[Byte]): Array[Byte] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val v = decode(payload)
    val kept = v.frames.zipWithIndex.collect { case (f, i) if i % stride == 0 => f }
    encode(v.width, v.height, kept, delayCs = math.max(100 / math.max(v.fps, 1), 1) * stride)
  }
}
