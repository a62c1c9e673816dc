package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Dependency-free pure-JVM media codecs (north-star: multimodal columns).
  *
  * The environment ships no image/audio libraries, but the formats below
  * are byte arithmetic plus JDK-resident DEFLATE, so the multimodal
  * pipeline gets an honest end-to-end decode path instead of a stub
  * behind a seam (reference scope: media handling in
  * skybluecycology/meta_frame is absent entirely — this is north-star
  * depth):
  *
  *   - BMP, 24-bit uncompressed BI_RGB (bottom-up or top-down rows,
  *     4-byte row padding) — the standard interchange baseline every
  *     real codec stack can emit.
  *   - PNG, 8-bit gray/RGB/RGBA, non-interlaced — the first COMPRESSED
  *     real-world format through the seam (java.util.zip Inflater/
  *     Deflater + full row-filter reconstruction, CRC-checked chunks).
  *   - JPEG, baseline DCT (see [[Jpeg]]) — the dominant real-corpus
  *     image format, decode pinned bit-exact against an independent
  *     reference implementation.
  *   - WAV, PCM 16-bit little-endian (RIFF chunk walk) — ditto for audio.
  *   - AVI, RIFF container of uncompressed 24-bit DIB frames — video.
  *
  * Encoders exist so tests and fixtures can synthesize payloads
  * deterministically; decoders are the production seam fillers for
  * [[Multimodal.featurize]]. All feature math runs in double and is
  * truncated to float once, so outputs are bit-reproducible.
  */
object Codecs {

  /** Decoded image: RGB interleaved, row-major, top-down. */
  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Decoded audio: interleaved PCM16 frames. */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ---- BMP ---------------------------------------------------------------

  /** 24-bit BI_RGB BMP bytes from top-down RGB pixels (the canonical
    * [[Image]] layout). Rows are written bottom-up with 4-byte padding —
    * the classic on-disk form, so output opens in any viewer. */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} RGB bytes, got ${rgb.length}")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)         // signature
    buf.putInt(54 + dataSize).putInt(0).putInt(54) // file size, reserved, pixel offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER, positive = bottom-up
    buf.putShort(1).putShort(24)                // planes, bits per pixel
    buf.putInt(0).putInt(dataSize)              // BI_RGB (uncompressed), image size
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette unused
    var y = height - 1
    while (y >= 0) {                            // bottom-up rows, BGR order
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        buf.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i))
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  def isBmp(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M'

  /** Parse 24-bit uncompressed BMP into top-down RGB. Handles both row
    * orders (positive height = bottom-up, negative = top-down) and row
    * padding. Anything fancier (palettes, RLE, BITMAPV5) throws — a
    * production stack swaps a real codec into the same seam. */
  def decodeBmp(bytes: Array[Byte]): Image = {
    require(isBmp(bytes), "not a BMP payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0,
      s"only 24-bit uncompressed BI_RGB supported (bpp=$bpp, compression=$compression)")
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dims ${width}x$rawHeight")
    Image(width, height, readDib(bytes, dataOffset, width, height, bottomUp))
  }

  /** Nearest-neighbor resize core (center-of-cell sampling) shared by the
    * BMP and PNG payload resizers. */
  private[ops] def resizeImage(img: Image, outW: Int, outH: Int): Image = {
    require(outW > 0 && outH > 0, s"resize target must be positive, got ${outW}x$outH")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = ((y + 0.5) * img.height / outH).toInt.min(img.height - 1)
      var x = 0
      while (x < outW) {
        val sx = ((x + 0.5) * img.width / outW).toInt.min(img.width - 1)
        System.arraycopy(img.rgb, (sy * img.width + sx) * 3, out, (y * outW + x) * 3, 3)
        x += 1
      }
      y += 1
    }
    Image(outW, outH, out)
  }

  /** Nearest-neighbor BMP resize: decode → sample the source pixel at the
    * center of each destination cell → re-encode. The standard cheap
    * resize for thumbnailing/normalizing image payloads before feature
    * extraction; pass through `Multimodal.transformPayload` so the
    * metadata struct is re-stamped from the resized bytes. Pure byte
    * arithmetic — no codec libraries. */
  def resizeBmp(outW: Int, outH: Int)(payload: Array[Byte]): Array[Byte] = {
    val r = resizeImage(decodeBmp(payload), outW, outH)
    encodeBmp(r.width, r.height, r.rgb)
  }

  // ---- PNG (the first COMPRESSED real-world format through the seam) -----
  //
  // Pure JVM: DEFLATE via java.util.zip.{Deflater, Inflater} (ships with
  // the JDK — no new dependencies), PNG row filters (None/Sub/Up/Average/
  // Paeth) reconstructed per the spec, chunk CRCs verified with
  // java.util.zip.CRC32. 8-bit depth; color types 0 (grayscale),
  // 2 (truecolor RGB) and 6 (RGBA, alpha dropped on decode) — the shapes
  // real corpora carry; palette/16-bit/interlaced throw with a clear
  // message (same posture as the BMP decoder's unsupported variants).

  private val pngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 33 &&
      (0 until 8).forall(i => bytes(i) == pngSig(i))

  /** Bytes per pixel for the supported color types. */
  private def pngBpp(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 6 => 4 // truecolor + alpha
    case t => throw new IllegalArgumentException(
      s"unsupported PNG color type $t (supported: 0 gray, 2 RGB, 6 RGBA)")
  }

  /** Paeth predictor (PNG spec §4.5.4): nearest of a/b/c to a+b-c. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** PNG bytes from top-down pixels. The color type is inferred from the
    * array length: w·h → grayscale, w·h·3 → RGB, w·h·4 → RGBA.
    * `filterMode` selects the per-row filter: 0–4 fixed, −1 cycles
    * row % 5 (the default — fixtures then exercise every reconstruction
    * path in the decoder, and a spec-conformant reader must handle any
    * per-row mix). Chunk CRCs are real; output opens in any viewer. */
  def encodePng(width: Int, height: Int, pixels: Array[Byte], filterMode: Int = -1): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(filterMode >= -1 && filterMode <= 4, s"bad filter mode $filterMode")
    val colorType = pixels.length match {
      case l if l == width * height     => 0
      case l if l == width * height * 3 => 2
      case l if l == width * height * 4 => 6
      case l => throw new IllegalArgumentException(
        s"pixel array length $l matches no supported layout for ${width}x$height")
    }
    val bpp = pngBpp(colorType)
    val stride = width * bpp
    // filter each scanline against the UNFILTERED previous row, then deflate
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val f = if (filterMode == -1) y % 5 else filterMode
      raw((stride + 1) * y) = f.toByte
      var i = 0
      while (i < stride) {
        val x = pixels(y * stride + i) & 0xff
        val a = if (i >= bpp) pixels(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) pixels((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) pixels((y - 1) * stride + i - bpp) & 0xff else 0
        val filtered = f match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case 4 => x - paeth(a, b, c)
        }
        raw((stride + 1) * y + 1 + i) = filtered.toByte
        i += 1
      }
      y += 1
    }
    // BEST_SPEED: any level emits a spec-valid stream every decoder
    // accepts (round-trips are the pinned contract, not encoded bytes);
    // the default level-6 dictionary search dominated the encode path
    // for thumbnail-sized images
    val deflater = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    val idat = zbuf.toByteArray
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte) // bit depth, color type
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive filters, no interlace
      .array()
    val out = new java.io.ByteArrayOutputStream(33 + idat.length + 24)
    out.write(pngSig)
    def chunk(tag: String, data: Array[Byte]): Unit = {
      val t = tag.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(data)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(data.length).array())
      out.write(t); out.write(data)
      out.write(ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", ihdr)
    chunk("IDAT", idat)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode an 8-bit non-interlaced PNG (color types 0/2/6) into top-down
    * RGB: chunk-walk with CRC verification, concatenate IDATs, inflate,
    * reconstruct every row filter, expand gray → RGB / drop alpha. */
  def decodePng(bytes: Array[Byte]): Image = {
    require(isPng(bytes), "not a PNG payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    var pos = 8
    var width = 0; var height = 0; var colorType = -1
    val zdata = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && pos + 12 <= bytes.length) {
      val len = buf.getInt(pos)
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      require(len >= 0 && pos + 12 + len <= bytes.length, s"truncated chunk $tag")
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == buf.getInt(pos + 8 + len), s"bad CRC on chunk $tag")
      tag match {
        case "IHDR" =>
          width = buf.getInt(pos + 8)
          height = buf.getInt(pos + 12)
          val depth = bytes(pos + 16) & 0xff
          colorType = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(depth == 8, s"only 8-bit PNG supported, got depth $depth")
          require(interlace == 0, "interlaced (Adam7) PNG not supported")
          pngBpp(colorType) // rejects palette/other types
          require(width > 0 && height > 0, s"bad dims ${width}x$height")
        case "IDAT" => zdata.write(bytes, pos + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunks (tEXt, pHYs, ...) skipped
      }
      pos += 12 + len
    }
    require(colorType >= 0, "missing IHDR chunk")
    require(zdata.size > 0, "missing IDAT data")
    val bpp = pngBpp(colorType)
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(zdata.toByteArray)
    var off = 0
    while (off < raw.length && !inflater.finished()) {
      val n = inflater.inflate(raw, off, raw.length - off)
      // any zero-progress state is corrupt input: needsInput = truncated
      // stream (all input consumed), needsDictionary = FDICT-flagged zlib
      // header (PNG forbids preset dictionaries) — both would otherwise
      // spin this loop forever, hanging the executor where the OnError
      // policies can only catch exceptions
      require(n > 0 || inflater.finished(),
        if (inflater.needsDictionary) "IDAT demands a preset dictionary (forbidden in PNG)"
        else "truncated or corrupt IDAT stream")
      off += n
    }
    inflater.end()
    require(off == raw.length, s"IDAT inflated to $off bytes, expected ${raw.length}")
    // reconstruct filters in place: recon(x) = filt(x) + predictor
    val px = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      val f = raw((stride + 1) * y) & 0xff
      require(f <= 4, s"bad filter type $f on row $y")
      var i = 0
      while (i < stride) {
        val v = raw((stride + 1) * y + 1 + i) & 0xff
        val a = if (i >= bpp) px(y * stride + i - bpp) & 0xff else 0
        val b = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val c = if (y > 0 && i >= bpp) px((y - 1) * stride + i - bpp) & 0xff else 0
        val recon = f match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + (a + b) / 2
          case 4 => v + paeth(a, b, c)
        }
        px(y * stride + i) = recon.toByte
        i += 1
      }
      y += 1
    }
    // normalize to the canonical 3-byte RGB layout
    val rgb = colorType match {
      case 2 => px
      case 0 =>
        val out = new Array[Byte](width * height * 3)
        var i = 0
        while (i < width * height) {
          out(3 * i) = px(i); out(3 * i + 1) = px(i); out(3 * i + 2) = px(i)
          i += 1
        }
        out
      case 6 =>
        val out = new Array[Byte](width * height * 3)
        var i = 0
        while (i < width * height) {
          out(3 * i) = px(4 * i); out(3 * i + 1) = px(4 * i + 1); out(3 * i + 2) = px(4 * i + 2)
          i += 1
        }
        out
    }
    Image(width, height, rgb)
  }

  /** Nearest-neighbor PNG resize (decode → sample → re-encode) — the PNG
    * twin of [[resizeBmp]] for `Multimodal.transformPayload`. Output is
    * RGB with cycling row filters. */
  def resizePng(outW: Int, outH: Int)(payload: Array[Byte]): Array[Byte] = {
    val r = resizeImage(decodePng(payload), outW, outH)
    encodePng(r.width, r.height, r.rgb)
  }

  // ---- WAV ---------------------------------------------------------------

  /** RIFF/WAVE PCM16 bytes from interleaved samples. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0, s"bad wav params $sampleRate/$channels")
    require(samples.length % channels == 0, "samples must be whole frames")
    val dataSize = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)                              // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2)        // byte rate
    buf.putShort((channels * 2).toShort)         // block align
    buf.putShort(16)                             // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  def isWav(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 44 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  /** Parse RIFF/WAVE by walking chunks (fmt may precede extensions; data
    * need not be the first chunk after fmt). PCM 16-bit only. */
  def decodeWav(bytes: Array[Byte]): Audio = {
    require(isWav(bytes), "not a WAV payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var samples: Array[Short] = null
    while (pos + 8 <= bytes.length && (samples == null || sampleRate == 0)) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val sz = buf.getInt(pos + 4)
      require(sz >= 0 && pos + 8 + sz <= bytes.length, s"truncated chunk $tag")
      tag match {
        case "fmt " =>
          require(buf.getShort(pos + 8) == 1, "only PCM (format 1) supported")
          channels = buf.getShort(pos + 10)
          sampleRate = buf.getInt(pos + 12)
          bits = buf.getShort(pos + 22)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
        case "data" =>
          samples = new Array[Short](sz / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(pos + 8 + i * 2); i += 1 }
        case _ => () // skip LIST/fact/other chunks
      }
      pos += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    require(sampleRate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    Audio(sampleRate, channels, samples)
  }

  // ---- AVI (video: RIFF container, uncompressed 24-bit DIB frames) -------

  /** Decoded video: fixed-size RGB frames (each in [[Image]] layout) at a
    * nominal frame rate. */
  final case class Video(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]])

  /** Minimal canonical AVI writer: RIFF('AVI ') → LIST hdrl (avih + one
    * 'vids'/'DIB ' stream with a BITMAPINFOHEADER strf) → LIST movi with
    * one '00db' chunk per uncompressed frame (bottom-up padded BGR — the
    * same DIB layout as BMP pixel data). Enough structure that standard
    * players open it; no index chunk (players rebuild it). */
  def encodeAvi(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0, s"bad video params ${width}x$height@$fps")
    require(frames.nonEmpty, "need at least one frame")
    require(frames.forall(_.length == width * height * 3),
      s"every frame needs ${width * height * 3} RGB bytes")
    val stride = (width * 3 + 3) / 4 * 4
    val dibSize = stride * height
    val moviSize = 4 + frames.size * (8 + dibSize)
    val hdrlSize = 4 + (8 + 56) + (8 + 4 + (8 + 56) + (8 + 40))
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(s: String): Unit = buf.put(s.getBytes("US-ASCII"))
    fourcc("RIFF"); buf.putInt(riffSize); fourcc("AVI ")
    fourcc("LIST"); buf.putInt(hdrlSize); fourcc("hdrl")
    fourcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps)                       // µs per frame
    buf.putInt(dibSize * fps).putInt(0).putInt(0)   // max bytes/sec, padding, flags
    buf.putInt(frames.size).putInt(0).putInt(1)     // total frames, initial, streams
    buf.putInt(dibSize).putInt(width).putInt(height)
    (0 until 4).foreach(_ => buf.putInt(0))         // reserved
    fourcc("LIST"); buf.putInt(4 + (8 + 56) + (8 + 40)); fourcc("strl")
    fourcc("strh"); buf.putInt(56)
    fourcc("vids"); fourcc("DIB ")
    buf.putInt(0).putInt(0).putInt(0)               // flags, prio+lang, initial
    buf.putInt(1).putInt(fps)                       // scale, rate → fps
    buf.putInt(0).putInt(frames.size)               // start, length
    buf.putInt(dibSize).putInt(-1).putInt(0)        // bufsize, quality, sample size
    buf.putShort(0).putShort(0)
    buf.putShort(width.toShort).putShort(height.toShort) // rcFrame
    fourcc("strf"); buf.putInt(40)
    buf.putInt(40).putInt(width).putInt(height)     // BITMAPINFOHEADER
    buf.putShort(1).putShort(24)
    buf.putInt(0).putInt(dibSize)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    fourcc("LIST"); buf.putInt(moviSize); fourcc("movi")
    frames.foreach { rgb =>
      fourcc("00db"); buf.putInt(dibSize)
      writeDib(buf, rgb, width, height)
    }
    buf.array()
  }

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  /** Parse the canonical AVI layout: find the stream format
    * (BITMAPINFOHEADER inside hdrl, 24-bit uncompressed only) and the
    * frame rate, then collect every '00db'/'00dc' chunk under LIST movi
    * as a top-down RGB frame. Chunk-walks recursively, so padding/extra
    * chunks (idx1, JUNK) are skipped. */
  def decodeAvi(bytes: Array[Byte]): Video = {
    require(isAvi(bytes), "not an AVI payload")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var width = 0; var height = 0; var fps = 0
    val frames = Seq.newBuilder[Array[Byte]]
    def walk(from: Int, to: Int): Unit = {
      var pos = from
      while (pos + 8 <= to) {
        val tag = new String(bytes, pos, 4, "US-ASCII")
        val sz = buf.getInt(pos + 4)
        require(sz >= 0 && pos + 8 + sz <= to, s"truncated chunk $tag")
        tag match {
          case "LIST" => walk(pos + 12, pos + 8 + sz) // skip the list type fourcc
          case "strh" =>
            val scale = buf.getInt(pos + 8 + 20)
            val rate = buf.getInt(pos + 8 + 24)
            if (scale > 0) fps = rate / scale
          case "strf" =>
            require(buf.getShort(pos + 8 + 14) == 24 && buf.getInt(pos + 8 + 16) == 0,
              "only 24-bit uncompressed DIB video supported")
            width = buf.getInt(pos + 8 + 4)
            height = math.abs(buf.getInt(pos + 8 + 8))
          case "00db" | "00dc" =>
            require(width > 0 && height > 0, "frame chunk before stream format")
            frames += readDib(bytes, pos + 8, width, height, bottomUp = true)
          case _ => () // avih consumed via width/height in strf; idx1/JUNK skipped
        }
        pos += 8 + sz + (sz & 1)
      }
    }
    walk(12, bytes.length)
    val fs = frames.result()
    require(fs.nonEmpty, "no frame chunks found")
    Video(width, height, math.max(fps, 1), fs)
  }

  /** Keep every `stride`-th frame of an AVI (real decode → re-encode);
    * fps divides so playback duration is preserved. */
  def frameSampleAvi(stride: Int)(payload: Array[Byte]): Array[Byte] = {
    require(stride >= 1, s"bad stride $stride")
    val v = decodeAvi(payload)
    val kept = v.frames.zipWithIndex.collect { case (f, i) if i % stride == 0 => f }
    encodeAvi(v.width, v.height, math.max(v.fps / stride, 1), kept)
  }

  /** Bottom-up padded BGR rows from top-down RGB (shared by BMP + AVI). */
  private def writeDib(buf: ByteBuffer, rgb: Array[Byte], width: Int, height: Int): Unit = {
    val pad = (4 - (width * 3) % 4) % 4
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        buf.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i))
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
  }

  /** Top-down RGB from padded DIB rows (shared by BMP + AVI). */
  private def readDib(bytes: Array[Byte], offset: Int, width: Int, height: Int,
      bottomUp: Boolean): Array[Byte] = {
    val stride = (width * 3 + 3) / 4 * 4
    require(bytes.length >= offset + stride.toLong * height, "truncated pixel data")
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = offset + (if (bottomUp) height - 1 - y else y) * stride
      var x = 0
      while (x < width) {
        val s = srcRow + x * 3
        val d = (y * width + x) * 3
        rgb(d) = bytes(s + 2); rgb(d + 1) = bytes(s + 1); rgb(d + 2) = bytes(s)
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** 8-dim video features: [width, height, nFrames, fps, meanLuma,
    * minFrameLuma, maxFrameLuma, temporalDelta] — luma stats per frame
    * (Rec.601, exact integer sums) and the mean absolute luma change
    * between consecutive frames (the cheap motion/staticness signal). */
  def aviFeatures(payload: Array[Byte]): Array[Float] =
    videoFeatures(decodeAvi(payload))

  /** [[aviFeatures]] for GIF payloads (animated or single-frame) — same
    * stats over the composited frames, so mixed AVI/GIF corpora yield
    * comparable features. */
  def gifFeatures(payload: Array[Byte]): Array[Float] =
    videoFeatures(Gif.decode(payload))

  private def videoFeatures(v: Video): Array[Float] = {
    val n = v.width.toLong * v.height
    val lumas = v.frames.map { rgb =>
      var sl = 0L
      var i = 0
      while (i < rgb.length) {
        sl += 299L * (rgb(i) & 0xff) + 587L * (rgb(i + 1) & 0xff) + 114L * (rgb(i + 2) & 0xff)
        i += 3
      }
      sl / (n * 255000.0)
    }
    val delta =
      if (lumas.size < 2) 0.0
      else lumas.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.sum / (lumas.size - 1)
    Array(
      v.width.toFloat, v.height.toFloat, v.frames.size.toFloat, v.fps.toFloat,
      (lumas.sum / lumas.size).toFloat, lumas.min.toFloat, lumas.max.toFloat,
      delta.toFloat)
  }

  // ---- feature extraction (the real `decoder` seam fillers) --------------

  /** 8-dim image features: [width, height, meanR, meanG, meanB, meanLuma,
    * minLuma, maxLuma] — channel stats normalized to [0,1], Rec.601 luma.
    * Double accumulation from integer sums, one float truncation:
    * bit-reproducible. */
  def bmpFeatures(payload: Array[Byte]): Array[Float] =
    imageFeatures(decodeBmp(payload))

  /** [[bmpFeatures]] for PNG payloads — identical stats over the decoded
    * pixels, so a mixed BMP/PNG corpus yields comparable features. */
  def pngFeatures(payload: Array[Byte]): Array[Float] =
    imageFeatures(decodePng(payload))

  /** [[bmpFeatures]] for baseline JPEG payloads (see [[Jpeg]]). */
  def jpegFeatures(payload: Array[Byte]): Array[Float] =
    imageFeatures(Jpeg.decode(payload))

  /** Nearest-neighbor JPEG resize (decode → sample → re-encode at
    * `quality`) — the JPEG twin of [[resizeBmp]]/[[resizePng]]. */
  def resizeJpeg(outW: Int, outH: Int, quality: Int = 90)(payload: Array[Byte]): Array[Byte] = {
    val r = resizeImage(Jpeg.decode(payload), outW, outH)
    Jpeg.encode(r.width, r.height, r.rgb, quality)
  }

  private def imageFeatures(img: Image): Array[Float] = {
    val n = img.width.toLong * img.height
    var sr = 0L; var sg = 0L; var sb = 0L
    var minL = Long.MaxValue; var maxL = Long.MinValue
    var sl = 0L
    var i = 0
    while (i < img.rgb.length) {
      val r = img.rgb(i) & 0xff; val g = img.rgb(i + 1) & 0xff; val b = img.rgb(i + 2) & 0xff
      sr += r; sg += g; sb += b
      val luma = 299L * r + 587L * g + 114L * b // Rec.601 ×1000, exact ints
      sl += luma
      if (luma < minL) minL = luma
      if (luma > maxL) maxL = luma
      i += 3
    }
    val d = 255.0 * n
    Array(
      img.width.toFloat, img.height.toFloat,
      (sr / d).toFloat, (sg / d).toFloat, (sb / d).toFloat,
      (sl / (d * 1000.0)).toFloat,
      (minL / 255000.0).toFloat, (maxL / 255000.0).toFloat)
  }

  /** 8-dim audio features: [sampleRate, channels, frames, meanAbs, rms,
    * zeroCrossingRate, min, max] — amplitudes normalized by 2¹⁵. */
  def wavFeatures(payload: Array[Byte]): Array[Float] = {
    val a = decodeWav(payload)
    val n = a.samples.length
    if (n == 0)
      return Array(a.sampleRate.toFloat, a.channels.toFloat, 0f, 0f, 0f, 0f, 0f, 0f)
    var sumAbs = 0L; var sumSq = 0.0; var crossings = 0L
    var mn = Int.MaxValue; var mx = Int.MinValue
    var i = 0
    while (i < n) {
      val s = a.samples(i).toInt
      sumAbs += math.abs(s)
      sumSq += s.toDouble * s
      if (s < mn) mn = s
      if (s > mx) mx = s
      if (i >= a.channels && (s < 0) != (a.samples(i - a.channels) < 0)) crossings += 1
      i += 1
    }
    val scale = 32768.0
    Array(
      a.sampleRate.toFloat, a.channels.toFloat, (n / a.channels).toFloat,
      (sumAbs / (n * scale)).toFloat,
      (math.sqrt(sumSq / n) / scale).toFloat,
      (crossings.toDouble / n).toFloat,
      (mn / scale).toFloat, (mx / scale).toFloat)
  }

  /** REAL audio frame-sampler for [[Multimodal.transformPayload]]: decode
    * PCM16, keep every `stride`-th frame (all channels of it), re-encode
    * with the sample rate divided accordingly — an honest decode→
    * transform→encode media op (the byte-stride `frameSampleStub` remains
    * only for opaque formats). */
  def downsampleWav(stride: Int)(payload: Array[Byte]): Array[Byte] = {
    require(stride >= 1, s"bad stride $stride")
    val a = decodeWav(payload)
    val frames = a.samples.length / a.channels
    val kept = (frames + stride - 1) / stride
    val out = new Array[Short](kept * a.channels)
    var f = 0
    while (f < kept) {
      var c = 0
      while (c < a.channels) {
        out(f * a.channels + c) = a.samples(f * stride * a.channels + c)
        c += 1
      }
      f += 1
    }
    encodeWav(math.max(a.sampleRate / stride, 1), a.channels, out)
  }

  /** Sniffing still-image decode to RGB pixels: BMP/PNG/JPEG, or an
    * animated GIF/AVI's FIRST (composited) frame — the thumbnail
    * convention, which also gives video payloads a perceptual-dedup key.
    * Non-image payloads are a named data error — the perceptual-hash
    * tier must never hash container bytes as pixels. */
  def decodeImage(payload: Array[Byte]): Image =
    if (isBmp(payload)) decodeBmp(payload)
    else if (isPng(payload)) decodePng(payload)
    else if (Jpeg.isJpeg(payload)) Jpeg.decode(payload)
    else if (Gif.isGif(payload)) {
      val v = Gif.decode(payload)
      Image(v.width, v.height, v.frames.head)
    } else if (isAvi(payload)) {
      val v = decodeAvi(payload)
      Image(v.width, v.height, v.frames.head)
    } else throw new IllegalArgumentException(
      "not a decodable image payload (BMP/PNG/JPEG/GIF/AVI first frame)")

  /** 64-bit difference hash (dHash) — the standard cheap perceptual
    * image fingerprint: resize to 9×8 (nearest, the codec-agnostic
    * normalization), integer Rec.601 luma per cell, bit y·8+x set iff
    * luma(y,x) < luma(y,x+1). Horizontal-gradient signs survive exactly
    * the transforms that matter for dedup — uniform brightness shift
    * (luma is monotone, so every comparison is unchanged), re-encoding
    * across lossless codecs (same pixels → same hash), and approximately
    * survive rescaling (the 9×8 grid re-samples; OpsSpec bounds the
    * drift). Two unrelated images land ~32 bits apart, so a small
    * Hamming radius separates near-dups from noise. Pure integer
    * arithmetic — deterministic across engines and retries. */
  def dHash64(img: Image): Long = {
    val r = resizeImage(img, 9, 8)
    val gray = new Array[Int](9 * 8)
    var i = 0
    while (i < 72) {
      gray(i) = (299 * (r.rgb(3 * i) & 0xff) + 587 * (r.rgb(3 * i + 1) & 0xff) +
        114 * (r.rgb(3 * i + 2) & 0xff)) / 1000
      i += 1
    }
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (gray(y * 9 + x) < gray(y * 9 + x + 1)) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** 64-bit perceptual AUDIO hash — the dHash idea on the amplitude
    * envelope: the |PCM| stream is split into 65 equal-length buckets and
    * bit k is set iff bucket k's mean |amplitude| is below bucket k+1's.
    * The comparison is cross-multiplied integer sums (sumₖ·lenₖ₊₁ <
    * sumₖ₊₁·lenₖ) — no division, exact, retry-deterministic. Envelope
    * GRADIENT SIGNS survive exactly the transforms that matter for audio
    * dedup: uniform gain (every |s| scales by the same factor — both
    * sides of every comparison scale together) and lossless re-encoding;
    * unrelated clips land ~32 bits apart. Multi-channel audio hashes the
    * interleaved stream (channel balance is part of identity). Needs ≥ 65
    * samples — shorter clips are a named data error (a 64-gradient
    * envelope of 3 samples means nothing). */
  def audioHash64(a: Audio): Long = {
    val n = a.samples.length
    require(n >= 65, s"audioHash64 needs >= 65 samples, got $n")
    val sums = new Array[Long](65)
    val lens = new Array[Long](65)
    var k = 0
    while (k < 65) {
      val from = (k.toLong * n / 65).toInt
      val until = ((k + 1).toLong * n / 65).toInt
      var i = from
      var s = 0L
      while (i < until) { s += math.abs(a.samples(i).toInt); i += 1 }
      sums(k) = s
      lens(k) = until - from
      k += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) * lens(b + 1) < sums(b + 1) * lens(b)) h |= 1L << b
      b += 1
    }
    h
  }

  /** Format-sniffing feature decoder for mixed media columns — the
    * production default for [[Multimodal.featurize]]: BMP/PNG/JPEG/GIF/
    * WAV/AVI decode for real; MP4 and MP3 get real CONTAINER/STREAM-layer
    * features (box walk / frame-header chain — dims, duration, sample and
    * keyframe structure) while their compressed SAMPLE payloads stay
    * behind the codec seam; anything else falls back to the deterministic
    * [[Multimodal.decodeStub]] (the seam where a JNI/codec-library stack
    * plugs in). */
  def mediaFeatures(payload: Array[Byte]): Array[Float] =
    if (isBmp(payload)) bmpFeatures(payload)
    else if (isPng(payload)) pngFeatures(payload)
    else if (Jpeg.isJpeg(payload)) jpegFeatures(payload)
    else if (isWav(payload)) wavFeatures(payload)
    else if (isAvi(payload)) aviFeatures(payload)
    else if (Gif.isGif(payload)) gifFeatures(payload)
    else if (Mp4.isMp4(payload)) Mp4.features(payload)
    else if (Mp3.isMp3(payload)) Mp3.features(payload)
    else Multimodal.decodeStub(payload)

  /** Header-only metadata parse: (format, width, height). BMP: pixel
    * dimensions; WAV: (frames, channels) — both without touching the
    * payload body, so meta extraction stays O(header) per row. Unknown
    * bytes → ("bin", 0, 0). */
  def parseMeta(bytes: Array[Byte]): (String, Int, Int) =
    if (isBmp(bytes)) {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      ("bmp", buf.getInt(18), math.abs(buf.getInt(22)))
    } else if (isPng(bytes)) {
      // IHDR is mandatory-first: width/height are big-endian at 16/20
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
      ("png", buf.getInt(16), buf.getInt(20))
    } else if (Jpeg.isJpeg(bytes)) {
      val (w, h) = Jpeg.quickDims(bytes)
      ("jpeg", w, h)
    } else if (isWav(bytes)) {
      val a = quickWavDims(bytes)
      ("wav", a._1, a._2)
    } else if (isAvi(bytes)) {
      // avih carries width/height at fixed offsets in the canonical layout
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      ("avi", buf.getInt(64), buf.getInt(68))
    } else if (Gif.isGif(bytes)) {
      val (w, h) = Gif.quickDims(bytes)
      ("gif", w, h)
    } else if (Mp4.isMp4(bytes)) {
      // box walk touches headers only (mdat skipped by its declared size)
      val m = Mp4.parse(bytes)
      val v = m.videoTrack.orElse(m.tracks.headOption)
      ("mp4", v.fold(0)(_.width), v.fold(0)(_.height))
    } else if (Mp3.isMp3(bytes)) {
      // (PCM frames, channels) — the WAV convention; the walk reads 4
      // header bytes per frame, payload entropy data is never touched.
      // The metadata slot is 32-bit: fail by name past 2^31 samples
      // (~13.5 h at 44.1 kHz) instead of silently wrapping negative.
      val m = Mp3.parse(bytes)
      require(m.totalSamples <= Int.MaxValue,
        s"mp3 stream has ${m.totalSamples} samples — overflows the 32-bit metadata width")
      ("mp3", m.totalSamples.toInt, m.channels)
    } else ("bin", 0, 0)

  /** (frames, channels) from the chunk walk without copying samples. */
  private def quickWavDims(bytes: Array[Byte]): (Int, Int) = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var channels = 0
    var dataBytes = 0
    while (pos + 8 <= bytes.length) {
      val tag = new String(bytes, pos, 4, "US-ASCII")
      val sz = buf.getInt(pos + 4)
      if (sz < 0 || pos + 8 + sz > bytes.length) return (0, channels)
      if (tag == "fmt ") channels = buf.getShort(pos + 10)
      if (tag == "data") dataBytes = sz
      pos += 8 + sz + (sz & 1)
    }
    if (channels > 0) (dataBytes / 2 / channels, channels) else (0, 0)
  }
}
