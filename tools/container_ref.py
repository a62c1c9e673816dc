#!/usr/bin/env python3
"""Independent MP3-stream / MP4-container reference (NOT part of the library).

Builds structurally valid MPEG-audio frame chains and ISO-BMFF boxes with
plain struct packing — a SEPARATE implementation from graft.ops.{Mp3,Mp4}'s
encoders — and prints base64 payloads + the expected parsed metadata, so
the Scala parsers are pinned against spec-built bytes they share nothing
with (the jpeg_ref/gif_ref arrangement).

Usage: python3 tools/container_ref.py  → prints Scala fixtures.
"""
import base64
import struct

KBPS_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
SR_V1 = [44100, 48000, 32000]


def mp3_frame(kbps, sample_rate, channels, fill):
    br = KBPS_V1.index(kbps)
    sr = SR_V1.index(sample_rate)
    mode = 3 if channels == 1 else 0
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) | (br << 12) | (sr << 10) | (mode << 6)
    size = 144 * kbps * 1000 // sample_rate
    body = bytes((fill(i)) & 0xFF for i in range(4, size))
    return struct.pack(">I", h) + body


def mp3_stream(schedule, sample_rate=44100, channels=2, id3=0):
    out = bytearray()
    if id3:
        out += b"ID3" + bytes((3, 0, 0))
        out += bytes(((id3 >> 21) & 0x7F, (id3 >> 14) & 0x7F, (id3 >> 7) & 0x7F, id3 & 0x7F))
        out += bytes((i * 5 + 1) % 200 for i in range(id3))
    for f, kbps in enumerate(schedule):
        out += mp3_frame(kbps, sample_rate, channels, lambda i: i * 13 + f)
    return bytes(out)


def box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ.encode() + payload


def mp4_file(width, height, timescale, sample_dur, sizes, codec="avc1", key_every=3):
    n = len(sizes)
    dur = n * sample_dur
    ftyp = box("ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mvhd = box("mvhd", struct.pack(">IIIII", 0, 0, 0, timescale, dur)
               + struct.pack(">IHH", 0x00010000, 0x0100, 0)
               + b"\x00" * 8
               + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
               + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = box("tkhd", struct.pack(">IIIIII", 7, 0, 0, 1, 0, dur)
               + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
               + struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
               + struct.pack(">II", width << 16, height << 16))
    mdhd = box("mdhd", struct.pack(">IIIIIHH", 0, 0, 0, timescale, dur, 0x55C4, 0))
    hdlr = box("hdlr", struct.pack(">II", 0, 0) + b"vide" + b"\x00" * 13)
    se = (struct.pack(">I", 86) + codec.encode() + b"\x00" * 6 + struct.pack(">H", 1)
          + b"\x00" * 16 + struct.pack(">HH", width, height)
          + struct.pack(">II", 0x00480000, 0x00480000) + struct.pack(">IH", 0, 1)
          + b"\x00" * 32 + struct.pack(">Hh", 0x0018, -1))
    stsd = box("stsd", struct.pack(">II", 0, 1) + se)
    stts = box("stts", struct.pack(">IIII", 0, 1, n, sample_dur))
    stsc = box("stsc", struct.pack(">IIIII", 0, 1, 1, n, 1))
    stsz = box("stsz", struct.pack(">III", 0, 0, n) + b"".join(struct.pack(">I", s) for s in sizes))
    syncs = [i + 1 for i in range(n) if i % key_every == 0]
    stss = box("stss", struct.pack(">II", 0, len(syncs)) + b"".join(struct.pack(">I", s) for s in syncs))
    stco = box("stco", struct.pack(">III", 0, 1, 0))
    stbl = box("stbl", stsd + stts + stsc + stsz + stss + stco)
    vmhd = box("vmhd", struct.pack(">IHHHH", 1, 0, 0, 0, 0))
    dref = box("dref", struct.pack(">II", 0, 1) + box("url ", struct.pack(">I", 1))[0:0]
               + struct.pack(">I", 12) + b"url " + struct.pack(">I", 1))
    dinf = box("dinf", dref)
    minf = box("minf", vmhd + dinf + stbl)
    mdia = box("mdia", mdhd + hdlr + minf)
    trak = box("trak", tkhd + mdia)
    moov = box("moov", mvhd + trak)
    mdat = box("mdat", bytes((i * 7 + 5) % 251 for i in range(sum(sizes))))
    return ftyp + moov + mdat


def show(name, payload):
    print(f"    val {name} = java.util.Base64.getDecoder.decode(")
    b64 = base64.b64encode(payload).decode()
    for i in range(0, len(b64), 72):
        sep = " +" if i + 72 < len(b64) else ")"
        print(f'      "{b64[i:i+72]}"{sep}')


def main():
    # MP3: VBR schedule, stereo 44100, with a 33-byte ID3v2 tag to skip
    sched = [128, 160, 128, 192, 128]
    mp3 = mp3_stream(sched, 44100, 2, id3=33)
    show("goldenMp3", mp3)
    print(f"    // frames={len(sched)}, samples={len(sched)*1152}, "
          f"minK=128 maxK=192 sumK={sum(sched)}, vbr=true, "
          f"streamBytes={sum(144*k*1000//44100 for k in sched)}")
    # CBR mono 32000, no tag
    mp3c = mp3_stream([96, 96, 96], 32000, 1)
    show("goldenMp3Cbr", mp3c)
    print(f"    // frames=3, samples={3*1152}, kbps=96 const, vbr=false, "
          f"streamBytes={3*(144*96*1000//32000)}")
    # MP4: 320x180, timescale 1000, 7 samples x 40ms, keyframe every 3rd
    sizes = [900, 120, 130, 880, 110, 140, 860]
    mp4 = mp4_file(320, 180, 1000, 40, sizes)
    show("goldenMp4", mp4)
    print(f"    // 320x180 ts=1000 dur={7*40} nSamples=7 "
          f"sampleBytes={sum(sizes)} nSync=3 codec=avc1 mdat={sum(sizes)}")


if __name__ == "__main__":
    main()
