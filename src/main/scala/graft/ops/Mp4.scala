package graft.ops

import java.nio.ByteBuffer

/** MP4 / ISO Base Media File Format (ISO/IEC 14496-12) CONTAINER layer —
  * a real box parser: ftyp brand, movie header (timescale/duration),
  * track headers (presentation dims), media headers, handler types,
  * sample descriptions (codec fourcc) and the sample tables (stts sample
  * counts, stsz sizes, stss sync samples). That is every field a corpus
  * metadata/stats pass reads — dimensions, duration, codec, sample and
  * keyframe structure — obtained the way stream tools obtain them,
  * WITHOUT decoding codec payloads. Decoding mdat sample data (H.264,
  * AAC…) stays behind the clearly-marked codec seam
  * ([[Multimodal.decodeStub]] / a JNI lib in production).
  *
  * Parser posture matches the other codecs: structural damage (box sizes
  * overrunning the payload, missing moov/trak) is a NAMED data error for
  * the OnError policy; unknown boxes are skipped by their declared size,
  * as the spec intends (forward compatibility is the design center of
  * BMFF). 64-bit largesize boxes are handled; version-1 (64-bit)
  * mvhd/mdhd/tkhd variants too.
  */
object Mp4 {

  def isMp4(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 12 &&
      bytes(4) == 'f' && bytes(5) == 't' && bytes(6) == 'y' && bytes(7) == 'p'

  /** One track's structural summary. */
  final case class TrackMeta(
      handler: String, // "vide" / "soun" / other fourcc
      codec: String,   // stsd entry fourcc, e.g. "avc1", "mp4a"
      width: Int,      // tkhd presentation dims (16.16 fixed → int), 0 for audio
      height: Int,
      timescale: Long,
      duration: Long,  // in track timescale units
      nSamples: Long,  // from stts
      sampleBytes: Long, // from stsz (sum)
      nSync: Long      // from stss; 0 when absent (every sample is sync per spec)
  )

  final case class Mp4Meta(
      brand: String,
      timescale: Long,
      duration: Long, // movie duration in movie timescale units
      tracks: Seq[TrackMeta],
      mdatBytes: Long
  ) {
    def durationMs: Long =
      if (timescale == 0) 0L else duration * 1000L / timescale
    def videoTrack: Option[TrackMeta] = tracks.find(_.handler == "vide")
  }

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def u64(b: Array[Byte], p: Int): Long = (u32(b, p) << 32) | u32(b, p + 4)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** Walk the boxes in [from, to); call `f(type, payloadStart, payloadEnd)`.
    * Box sizes that overrun `to` are a named data error. */
  private def walk(b: Array[Byte], from: Int, to: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var p = from
    while (p < to) {
      require(p + 8 <= to, s"truncated box header at byte $p")
      var size = u32(b, p)
      val typ = fourcc(b, p + 4)
      var hdr = 8
      if (size == 1) { // 64-bit largesize
        require(p + 16 <= to, s"truncated largesize box at byte $p")
        size = u64(b, p + 8)
        hdr = 16
      } else if (size == 0) size = (to - p).toLong // box extends to end
      require(size >= hdr && p + size <= to,
        s"box '$typ' at byte $p overruns its container (size $size)")
      f(typ, p + hdr, p + size.toInt)
      p += size.toInt
    }
  }

  def parse(bytes: Array[Byte]): Mp4Meta = {
    require(isMp4(bytes), "not an MP4/BMFF payload")
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var mdatBytes = 0L
    val tracks = Seq.newBuilder[TrackMeta]

    walk(bytes, 0, bytes.length) { (typ, s, e) =>
      typ match {
        case "ftyp" => brand = fourcc(bytes, s)
        case "mdat" => mdatBytes += (e - s).toLong
        case "moov" =>
          walk(bytes, s, e) { (t2, s2, e2) =>
            t2 match {
              case "mvhd" =>
                val v = bytes(s2) & 0xff
                if (v == 1) { timescale = u32(bytes, s2 + 20); duration = u64(bytes, s2 + 24) }
                else { timescale = u32(bytes, s2 + 12); duration = u32(bytes, s2 + 16) }
              case "trak" => tracks += parseTrak(bytes, s2, e2)
              case _ => // udta, iods, … skipped by size
            }
          }
        case _ => // free, skip, uuid, … skipped by size
      }
    }
    require(timescale > 0, "MP4 has no movie header (mvhd)")
    Mp4Meta(brand, timescale, duration, tracks.result(), mdatBytes)
  }

  private def parseTrak(b: Array[Byte], from: Int, to: Int): TrackMeta = {
    var handler = ""
    var codec = ""
    var width = 0
    var height = 0
    var timescale = 0L
    var duration = 0L
    var nSamples = 0L
    var sampleBytes = 0L
    var nSync = 0L
    walk(b, from, to) { (t, s, e) =>
      t match {
        case "tkhd" =>
          val v = b(s) & 0xff
          // width/height are the LAST 8 bytes of tkhd, 16.16 fixed point
          width = (u32(b, e - 8) >> 16).toInt
          height = (u32(b, e - 4) >> 16).toInt
          val _ = v
        case "mdia" =>
          walk(b, s, e) { (t2, s2, e2) =>
            t2 match {
              case "mdhd" =>
                val v = b(s2) & 0xff
                if (v == 1) { timescale = u32(b, s2 + 20); duration = u64(b, s2 + 24) }
                else { timescale = u32(b, s2 + 12); duration = u32(b, s2 + 16) }
              case "hdlr" => handler = fourcc(b, s2 + 8)
              case "minf" =>
                walk(b, s2, e2) { (t3, s3, e3) =>
                  if (t3 == "stbl") walk(b, s3, e3) { (t4, s4, e4) =>
                    // Entry counts come from the FILE — bound every table
                    // walk against the box end so a corrupt/lying count is
                    // a NAMED data error, never a silent read of sibling-
                    // box bytes as sample entries (or an index overrun).
                    t4 match {
                      case "stsd" =>
                        if (u32(b, s4 + 4) > 0) {
                          require(s4 + 16 <= e4, "stsd entry overruns its box")
                          codec = fourcc(b, s4 + 12)
                        }
                      case "stts" =>
                        val entries = u32(b, s4 + 4)
                        require(s4 + 8 + 8L * entries <= e4,
                          s"stts claims $entries entries but the box holds ${e4 - s4 - 8} bytes")
                        var i = 0
                        while (i < entries) {
                          nSamples += u32(b, s4 + 8 + 8 * i)
                          i += 1
                        }
                      case "stsz" =>
                        val uniform = u32(b, s4 + 4)
                        val count = u32(b, s4 + 8)
                        if (uniform != 0) sampleBytes = uniform * count
                        else {
                          require(s4 + 12 + 4L * count <= e4,
                            s"stsz claims $count sizes but the box holds ${e4 - s4 - 12} bytes")
                          var i = 0
                          while (i < count) {
                            sampleBytes += u32(b, s4 + 12 + 4 * i)
                            i += 1
                          }
                        }
                      case "stss" => nSync = u32(b, s4 + 4)
                      case _ => // stsc/stco/co64 — layout tables the stats don't need
                    }
                  }
                }
              case _ =>
            }
          }
        case _ =>
      }
    }
    require(handler.nonEmpty, "trak has no handler (hdlr)")
    TrackMeta(handler, codec, width, height, timescale, duration,
      nSamples, sampleBytes, nSync)
  }

  /** Fixture/transform-path encoder: a structurally valid single-video-
    * track MP4 — real ftyp/moov/mvhd/trak/tkhd/mdia/mdhd/hdlr/minf/stbl
    * (stsd with the given fourcc, stts/stsz/stss sample tables) + an mdat
    * whose bytes are deterministic filler (opaque entropy data on this
    * side of the codec seam). `sampleSizes` drives stsz; every
    * `keyEvery`-th sample is a sync sample in stss. */
  def encode(
      width: Int,
      height: Int,
      timescale: Int,
      sampleDurations: Int, // uniform per-sample duration (one stts entry)
      sampleSizes: Seq[Int],
      codec: String = "avc1",
      keyEvery: Int = 3
  ): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(sampleSizes.nonEmpty, "need at least one sample")
    require(codec.length == 4, s"codec must be a fourcc, got '$codec'")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(8 + payload.length)
      buf.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      buf.array()
    }
    def concat(parts: Array[Byte]*): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      parts.foreach(out.write)
      out.toByteArray
    }
    val n = sampleSizes.length
    val duration = n.toLong * sampleDurations

    val ftyp = box("ftyp", concat("isom".getBytes, Array[Byte](0, 0, 2, 0), "isom".getBytes, "mp41".getBytes))
    val mvhd = {
      val b = ByteBuffer.allocate(100)
      b.putInt(0)              // version+flags
      b.putInt(0).putInt(0)    // creation/modification
      b.putInt(timescale).putInt(duration.toInt)
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume, reserved
      b.putInt(0).putInt(0)
      // identity matrix
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      (1 to 6).foreach(_ => b.putInt(0)) // pre_defined
      b.putInt(2)                        // next track id
      box("mvhd", b.array())
    }
    val tkhd = {
      val b = ByteBuffer.allocate(84)
      b.putInt(7)              // version 0, flags: enabled+in-movie+in-preview
      b.putInt(0).putInt(0)    // creation/modification
      b.putInt(1).putInt(0)    // track id, reserved
      b.putInt(duration.toInt)
      b.putInt(0).putInt(0)    // reserved
      b.putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
      b.putInt(0x00010000).putInt(0).putInt(0)
      b.putInt(0).putInt(0x00010000).putInt(0)
      b.putInt(0).putInt(0).putInt(0x40000000)
      b.putInt(width << 16).putInt(height << 16) // 16.16 fixed
      box("tkhd", b.array())
    }
    val mdhd = {
      val b = ByteBuffer.allocate(24)
      b.putInt(0).putInt(0).putInt(0)
      b.putInt(timescale).putInt(duration.toInt)
      b.putShort(0x55c4.toShort).putShort(0) // language "und"
      box("mdhd", b.array())
    }
    val hdlr = {
      val b = ByteBuffer.allocate(25)
      b.putInt(0).putInt(0).put("vide".getBytes("US-ASCII"))
      b.putInt(0).putInt(0).putInt(0).put(0.toByte) // reserved + empty name
      box("hdlr", b.array())
    }
    val stsd = {
      // one minimal visual sample entry (86 bytes, per 14496-12 §12.1.3)
      val se = ByteBuffer.allocate(86)
      se.putInt(86).put(codec.getBytes("US-ASCII"))
      se.putInt(0).putShort(0).putShort(1) // reserved, data_reference_index
      (1 to 4).foreach(_ => se.putInt(0))  // pre_defined/reserved
      se.putShort(width.toShort).putShort(height.toShort)
      se.putInt(0x00480000).putInt(0x00480000) // 72 dpi
      se.putInt(0).putShort(1)             // reserved, frame_count
      se.put(new Array[Byte](32))          // compressorname
      se.putShort(0x0018.toShort).putShort(-1.toShort) // depth, pre_defined
      val b = ByteBuffer.allocate(8 + 86)
      b.putInt(0).putInt(1).put(se.array())
      box("stsd", b.array())
    }
    val stts = {
      val b = ByteBuffer.allocate(16)
      b.putInt(0).putInt(1).putInt(n).putInt(sampleDurations)
      box("stts", b.array())
    }
    val stsz = {
      val b = ByteBuffer.allocate(12 + 4 * n)
      b.putInt(0).putInt(0).putInt(n)
      sampleSizes.foreach(b.putInt)
      box("stsz", b.array())
    }
    val syncs = (1 to n).filter(i => (i - 1) % keyEvery == 0)
    val stss = {
      val b = ByteBuffer.allocate(8 + 4 * syncs.length)
      b.putInt(0).putInt(syncs.length)
      syncs.foreach(b.putInt)
      box("stss", b.array())
    }
    val stco = {
      val b = ByteBuffer.allocate(12)
      b.putInt(0).putInt(1).putInt(0) // one chunk; offset patched by nobody (stats don't read it)
      box("stco", b.array())
    }
    val stsc = {
      val b = ByteBuffer.allocate(20)
      b.putInt(0).putInt(1).putInt(1).putInt(n).putInt(1)
      box("stsc", b.array())
    }
    val stbl = box("stbl", concat(stsd, stts, stsc, stsz, stss, stco))
    val vmhd = {
      val b = ByteBuffer.allocate(12)
      b.putInt(1).putShort(0).putShort(0).putShort(0).putShort(0)
      box("vmhd", b.array())
    }
    val dinf = box("dinf", box("dref", {
      val b = ByteBuffer.allocate(8 + 12)
      b.putInt(0).putInt(1).putInt(12).put("url ".getBytes("US-ASCII")).putInt(1)
      b.array()
    }))
    val minf = box("minf", concat(vmhd, dinf, stbl))
    val mdia = box("mdia", concat(mdhd, hdlr, minf))
    val trak = box("trak", concat(tkhd, mdia))
    val moov = box("moov", concat(mvhd, trak))
    val mdat = {
      val total = sampleSizes.map(_.toLong).sum
      require(total <= Int.MaxValue - 8, "fixture mdat too large")
      val b = new Array[Byte](total.toInt)
      var i = 0
      while (i < b.length) { b(i) = ((i * 37 + 11) % 249).toByte; i += 1 }
      box("mdat", b)
    }
    concat(ftyp, moov, mdat)
  }

  /** 8-dim container features: [width, height, durationSec, nSamples,
    * meanSampleBytes (floor), keyframeRatio, nTracks, mdatBytes]. Sample
    * payloads are never decoded. */
  def features(payload: Array[Byte]): Array[Float] = {
    val m = parse(payload)
    val v = m.videoTrack.getOrElse(
      m.tracks.headOption.getOrElse(
        throw new IllegalArgumentException("MP4 has no tracks")))
    val dur =
      if (m.timescale == 0) 0.0 else m.duration / m.timescale.toDouble
    Array(
      v.width.toFloat, v.height.toFloat, dur.toFloat,
      v.nSamples.toFloat,
      (if (v.nSamples == 0) 0L else v.sampleBytes / v.nSamples).toFloat,
      (if (v.nSamples == 0) 0.0 else v.nSync.toDouble / v.nSamples).toFloat,
      m.tracks.size.toFloat, m.mdatBytes.toFloat)
  }
}
