package graft.ops

/** MPEG audio (MP3) STREAM layer — real frame-header walking, the same
  * "container is real, sample decode is the seam" tier as [[Mp4]]: every
  * field a production metadata pass needs (frame count, PCM sample count,
  * duration, CBR/VBR, bitrate stats, channel mode) comes from parsing the
  * actual frame-header chain, the way stream tools compute it without
  * decoding audio. Decoding Layer-III frames to PCM (Huffman +
  * requantization + IMDCT + synthesis filterbank) stays behind the
  * clearly-marked codec seam (`Multimodal.decodeStub` / a JNI lib in
  * production) — parseMeta/features here never touch frame payloads.
  *
  * Scope: MPEG-1 and MPEG-2/2.5 Layer III (the shapes called "mp3");
  * Layer I/II and free-format bitrate reject by name. An ID3v2 tag at the
  * start is skipped by its syncsafe length (real corpora always carry
  * one); trailing ID3v1 (128-byte "TAG") is tolerated. A sync loss mid
  * stream is a named data error for the OnError policy — bytes are never
  * skipped to re-sync, so a truncated upload cannot silently pass as a
  * shorter file.
  *
  * Reference: frame layout per the public MPEG-1/2 audio framing
  * (ISO/IEC 11172-3 / 13818-3 header tables, as documented in every
  * public mp3 frame-walker).
  */
object Mp3 {

  /** kbps by bitrate index (1..14) for Layer III: MPEG-1 row, MPEG-2/2.5
    * row. Index 0 = free format (rejected), 15 = invalid. */
  private val kbpsV1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val kbpsV2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  /** Sample rate by 2-bit index, per version (MPEG-1 / MPEG-2 / MPEG-2.5). */
  private val srV1 = Array(44100, 48000, 32000)
  private val srV2 = Array(22050, 24000, 16000)
  private val srV25 = Array(11025, 12000, 8000)

  /** One parsed frame header. */
  private final case class Header(
      mpeg1: Boolean, sampleRate: Int, kbps: Int, channels: Int, frameBytes: Int,
      samplesPerFrame: Int)

  /** Stream-level metadata from the frame-header chain. */
  final case class Mp3Meta(
      sampleRate: Int,
      channels: Int,
      nFrames: Int,
      totalSamples: Long,
      minKbps: Int,
      maxKbps: Int,
      sumKbps: Long, // exact; mean = sumKbps / nFrames in caller-chosen arithmetic
      vbr: Boolean,
      streamBytes: Long // frame bytes, excluding ID3 tags
  )

  /** Sniff: valid Layer-III sync (optionally past an ID3v2 tag). Never
    * throws — a Layer-I/II or free-format sync is "not mp3" to the
    * format dispatcher (it falls through to the opaque-binary stub),
    * while [[parse]] names the reason when called directly. */
  def isMp3(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 && {
      val p = id3v2End(bytes)
      p + 4 <= bytes.length &&
        (try parseHeader(bytes, p).isDefined
        catch { case _: IllegalArgumentException => false })
    }

  /** Byte offset just past an ID3v2 tag, or 0 if none. */
  private def id3v2End(b: Array[Byte]): Int =
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      // syncsafe 28-bit length, excludes the 10-byte tag header
      val len = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      10 + len
    } else 0

  /** Parse the 4-byte header at `p`; None if not a valid Layer-III sync. */
  private def parseHeader(b: Array[Byte], p: Int): Option[Header] = {
    if (p + 4 > b.length) return None
    val h = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) |
      ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
    if ((h >>> 21) != 0x7ff) return None
    val versionBits = (h >>> 19) & 3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    val layerBits = (h >>> 17) & 3   // 1=Layer III
    if (versionBits == 1) return None
    if (layerBits != 1)
      throw new IllegalArgumentException(
        s"MPEG audio layer ${4 - layerBits} unsupported (Layer III only)")
    val brIdx = (h >>> 12) & 0xf
    val srIdx = (h >>> 10) & 3
    if (srIdx == 3 || brIdx == 15) return None
    if (brIdx == 0)
      throw new IllegalArgumentException("free-format MP3 bitrate unsupported")
    val mpeg1 = versionBits == 3
    val sr = (versionBits match {
      case 3 => srV1
      case 2 => srV2
      case _ => srV25
    })(srIdx)
    val kbps = (if (mpeg1) kbpsV1 else kbpsV2)(brIdx)
    val padding = (h >>> 9) & 1
    val channels = if (((h >>> 6) & 3) == 3) 1 else 2 // mode 3 = single channel
    val spf = if (mpeg1) 1152 else 576
    // Layer III frame length: floor(spf/8 * bitrate / samplerate) + padding
    val frameBytes = (spf / 8) * (kbps * 1000) / sr + padding
    Some(Header(mpeg1, sr, kbps, channels, frameBytes, spf))
  }

  /** Walk the full frame chain. Mixed sample rates / channel modes and a
    * broken sync mid-stream are named data errors. */
  def parse(bytes: Array[Byte]): Mp3Meta = {
    require(bytes != null && bytes.length >= 4, "not an MP3 payload")
    var p = id3v2End(bytes)
    val first = parseHeader(bytes, p).getOrElse(
      throw new IllegalArgumentException("no MPEG audio sync at stream start"))
    var nFrames = 0
    var minK = Int.MaxValue
    var maxK = 0
    var sumK = 0L
    var streamBytes = 0L
    var done = false
    while (!done) {
      parseHeader(bytes, p) match {
        case Some(hd) =>
          require(hd.sampleRate == first.sampleRate && hd.channels == first.channels,
            s"sample-rate/channel change mid-stream at byte $p")
          require(p + hd.frameBytes <= bytes.length,
            s"truncated MP3 frame at byte $p (needs ${hd.frameBytes})")
          nFrames += 1
          minK = math.min(minK, hd.kbps)
          maxK = math.max(maxK, hd.kbps)
          sumK += hd.kbps
          streamBytes += hd.frameBytes
          p += hd.frameBytes
        case None =>
          // legal stream tails: EOF or an ID3v1 "TAG" block
          val tail = bytes.length - p
          if (tail == 0 ||
            (tail == 128 && bytes(p) == 'T' && bytes(p + 1) == 'A' && bytes(p + 2) == 'G'))
            done = true
          else throw new IllegalArgumentException(
            s"lost MPEG audio sync at byte $p ($tail bytes remain)")
      }
    }
    Mp3Meta(first.sampleRate, first.channels, nFrames,
      nFrames.toLong * first.samplesPerFrame, minK, maxK, sumK,
      vbr = minK != maxK, streamBytes)
  }

  /** Fixture/transform-path encoder: a structurally valid Layer-III
    * stream — real headers with the requested bitrate schedule, payloads
    * filled deterministically (the payload bytes are opaque entropy data
    * to every consumer on this side of the codec seam). MPEG-1 only. */
  def encode(
      sampleRate: Int,
      channels: Int,
      frameKbps: Seq[Int],
      id3v2Bytes: Int = 0
  ): Array[Byte] = {
    val srIdx = srV1.indexOf(sampleRate)
    require(srIdx >= 0, s"MPEG-1 sample rate required (one of ${srV1.mkString("/")}), got $sampleRate")
    require(channels == 1 || channels == 2, s"bad channels $channels")
    require(frameKbps.nonEmpty, "need at least one frame")
    val out = new java.io.ByteArrayOutputStream(1024)
    if (id3v2Bytes > 0) { // optional ID3v2 tag so the skip path runs on fixtures
      out.write('I'); out.write('D'); out.write('3'); out.write(3); out.write(0); out.write(0)
      out.write((id3v2Bytes >> 21) & 0x7f); out.write((id3v2Bytes >> 14) & 0x7f)
      out.write((id3v2Bytes >> 7) & 0x7f); out.write(id3v2Bytes & 0x7f)
      var i = 0
      while (i < id3v2Bytes) { out.write((i * 17 + 3) % 251); i += 1 }
    }
    frameKbps.zipWithIndex.foreach { case (kbps, f) =>
      val brIdx = kbpsV1.indexOf(kbps)
      require(brIdx > 0, s"not an MPEG-1 Layer-III bitrate: $kbps kbps")
      val frameBytes = 144 * (kbps * 1000) / sampleRate // padding bit 0
      val mode = if (channels == 1) 3 else 0
      val h = (0x7ff << 21) | (3 << 19) | (1 << 17) | (1 << 16) | // sync, MPEG1, L3, no CRC
        (brIdx << 12) | (srIdx << 10) | (mode << 6)
      out.write((h >>> 24) & 0xff); out.write((h >>> 16) & 0xff)
      out.write((h >>> 8) & 0xff); out.write(h & 0xff)
      var i = 4
      while (i < frameBytes) { out.write((i * 31 + f * 7) % 253); i += 1 }
    }
    out.toByteArray
  }

  /** 8-dim stream features: [sampleRate, channels, nFrames, totalSamples,
    * durationSec, meanKbps (floor), vbr 0/1, streamBytes] — everything
    * integer-derived except duration (samples / rate, one double divide).
    * Payload entropy data is never read. */
  def features(payload: Array[Byte]): Array[Float] = {
    val m = parse(payload)
    Array(
      m.sampleRate.toFloat, m.channels.toFloat, m.nFrames.toFloat,
      m.totalSamples.toFloat,
      (m.totalSamples / m.sampleRate.toDouble).toFloat,
      (m.sumKbps / m.nFrames).toFloat, // floor division, exact in both engines
      if (m.vbr) 1f else 0f,
      m.streamBytes.toFloat)
  }
}
