#!/usr/bin/env python3
"""Independent reference for the media driver-hash gates (q115-q117).

Computes the pinned oracle literals for the PNG/JPEG/GIF feature-checksum
queries WITHOUT running the Scala pipeline — pixels derive from the gate
fixture's text bytes (PNG and GIF are lossless on the fixture, so no codec
is needed at all on this side); the lossy JPEG path goes through
tools/jpeg_ref.py's exact-arithmetic codec (the same independent reference
the byte-equality goldens use).

Mirrored arithmetic, kept in lock-step with graft.ops.Codecs:
  - imageFeatures / videoFeatures: integer channel/luma sums, double
    division, one float32 truncation per feature;
  - resizeImage: nearest neighbor, source index floor((dst+0.5)*src/out);
  - checksum: per-row round(double, 9) HALF_UP via the value's shortest
    decimal repr (Spark's round goes through Double.toString — python's
    repr is the same shortest-round-trip digits), exact Decimal sum,
    round 6 HALF_UP, to double.

Usage: python3 tools/media_gate_ref.py  → prints the oracle SQL literals.
"""
import math
import struct
import sys
from decimal import Decimal, ROUND_HALF_UP

sys.path.insert(0, __file__.rsplit("/", 1)[0])
import jpeg_ref


def f32(x):
    return struct.unpack("f", struct.pack("f", x))[0]


def r9(x):
    return Decimal(repr(x)).quantize(Decimal("1E-9"), ROUND_HALF_UP)


def chk(vals):
    s = sum((r9(v) for v in vals), Decimal(0))
    return float(s.quantize(Decimal("1E-6"), ROUND_HALF_UP))


def fixture_texts():
    # the "!" tail de-correlates byte length from the base-string multiple,
    # so len%4 (GIF frame count), len%9 (width) and len%7 (height) all sweep
    return [("graft media gate %02d " % i) * (1 + i % 5) + "!" * (i % 7)
            for i in range(1, 61)]


def image_pixels(text):
    """textToBmp/Png/Jpeg derivation: dims from byte length, bytes cycled."""
    b = text.encode("utf-8")
    w = 4 + len(b) % 9
    h = 3 + len(b) % 7
    px = bytes(b[i % len(b)] for i in range(w * h * 3))
    return w, h, px


def image_features(w, h, px):
    """graft.ops.Codecs.imageFeatures mirror (the 8-dim image stats)."""
    n = w * h
    sr = sg = sb = sl = 0
    min_l, max_l = 1 << 62, -(1 << 62)
    for p in range(n):
        r, g, b = px[3 * p], px[3 * p + 1], px[3 * p + 2]
        sr += r
        sg += g
        sb += b
        luma = 299 * r + 587 * g + 114 * b
        sl += luma
        min_l = min(min_l, luma)
        max_l = max(max_l, luma)
    d = 255.0 * n
    return [f32(w), f32(h), f32(sr / d), f32(sg / d), f32(sb / d),
            f32(sl / (d * 1000.0)), f32(min_l / 255000.0), f32(max_l / 255000.0)]


def resize(w, h, px, out_w, out_h):
    """graft.ops.Codecs.resizeImage mirror: center-sample nearest neighbor."""
    out = bytearray(out_w * out_h * 3)
    for y in range(out_h):
        sy = min(int((y + 0.5) * h / out_h), h - 1)
        for x in range(out_w):
            sx = min(int((x + 0.5) * w / out_w), w - 1)
            src = (sy * w + sx) * 3
            dst = (y * out_w + x) * 3
            out[dst:dst + 3] = px[src:src + 3]
    return bytes(out)


def video_features(w, h, frames, fps):
    """graft.ops.Codecs.videoFeatures mirror (8-dim video stats)."""
    n = w * h
    lumas = []
    for rgb in frames:
        sl = 0
        for p in range(n):
            sl += 299 * rgb[3 * p] + 587 * rgb[3 * p + 1] + 114 * rgb[3 * p + 2]
        lumas.append(sl / (n * 255000.0))
    if len(lumas) < 2:
        delta = 0.0
    else:
        delta = sum(abs(lumas[i + 1] - lumas[i])
                    for i in range(len(lumas) - 1)) / (len(lumas) - 1)
    return [f32(w), f32(h), f32(len(frames)), f32(fps),
            f32(sum(lumas) / len(lumas)), f32(min(lumas)), f32(max(lumas)),
            f32(delta)]


def gif_frames(text):
    """textToGif derivation: 8x6, 2-5 frames, 16-color channel map."""
    b = text.encode("utf-8")
    w, h = 8, 6
    nf = 2 + len(b) % 4
    frames = []
    for f in range(nf):
        rgb = bytearray(w * h * 3)
        for i in range(w * h * 3):
            p = i // 3
            c = b[(p + f * 7) % len(b)] & 0x0F
            rgb[i] = (c * 16, 255 - c * 16, (c * c) % 256)[i % 3]
        frames.append(bytes(rgb))
    return w, h, frames


def wav_fixture(text):
    """textToWav derivation: PCM16 from consecutive byte pairs, mono."""
    b = text.encode("utf-8")
    n = max(len(b) // 2, 1)
    samples = []
    for i in range(n):
        if not b:
            samples.append(0)
        else:
            v = ((b[(2 * i) % len(b)] & 0xFF) << 8) | (b[(2 * i + 1) % len(b)] & 0xFF)
            samples.append(v - 65536 if v >= 32768 else v)  # toShort
    rate = 8000 + (len(b) % 5) * 1000
    return rate, samples


def wav_features(rate, channels, samples):
    """graft.ops.Codecs.wavFeatures mirror (8-dim audio stats)."""
    n = len(samples)
    if n == 0:
        return [f32(rate), f32(channels), 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    sum_abs = sum(abs(s) for s in samples)
    sum_sq = 0.0
    for s in samples:
        sum_sq += float(s) * s
    crossings = sum(1 for i in range(channels, n)
                    if (samples[i] < 0) != (samples[i - channels] < 0))
    scale = 32768.0
    return [f32(rate), f32(channels), f32(n // channels),
            f32(sum_abs / (n * scale)), f32(math.sqrt(sum_sq / n) / scale),
            f32(crossings / n), f32(min(samples) / scale), f32(max(samples) / scale)]


def avi_frames(text):
    """textToAvi derivation: 4-8 frames of 8x6, bytes cycled with a
    per-frame shift."""
    b = text.encode("utf-8")
    w, h = 8, 6
    nf = 4 + len(b) % 5
    frames = [bytes(b[(i + f * 7) % len(b)] for i in range(w * h * 3))
              for f in range(nf)]
    return w, h, frames


def sql(name, cols):
    parts = []
    for col, val in cols:
        if isinstance(val, int):
            parts.append("CAST(%d AS BIGINT) AS %s" % (val, col))
        else:
            parts.append("CAST(%r AS DOUBLE) AS %s" % (val, col))
    print("  %s:\n    SELECT %s\n" % (name, ",\n           ".join(parts)))


def main():
    texts = fixture_texts()

    # -- q115 PNG: lossless, expected stats straight from the text bytes --
    origs, rzs = [], []
    for t in texts:
        w, h, px = image_pixels(t)
        origs.append((w, h, image_features(w, h, px)))
        rzs.append(image_features(16, 12, resize(w, h, px, 16, 12)))
    sql("q115_png_feature_gate", [
        ("n_media", len(texts)),
        ("sum_w", sum(o[0] for o in origs)),
        ("sum_h", sum(o[1] for o in origs)),
        ("mean_r_chk", chk([o[2][2] for o in origs])),
        ("mean_luma_chk", chk([o[2][5] for o in origs])),
        ("rz_luma_chk", chk([f[5] for f in rzs])),
    ])

    # -- q116 JPEG: through jpeg_ref's exact codec, double compression --
    origs, rzs = [], []
    for t in texts:
        w, h, px = image_pixels(t)
        w1, h1, dec1 = jpeg_ref.decode(jpeg_ref.encode(w, h, px, 90))
        assert (w1, h1) == (w, h)
        origs.append((w1, h1, image_features(w1, h1, dec1)))
        w2, h2, dec2 = jpeg_ref.decode(
            jpeg_ref.encode(16, 12, resize(w1, h1, dec1, 16, 12), 90))
        assert (w2, h2) == (16, 12)
        rzs.append(image_features(w2, h2, dec2))
    sql("q116_jpeg_feature_gate", [
        ("n_media", len(texts)),
        ("sum_w", sum(o[0] for o in origs)),
        ("sum_h", sum(o[1] for o in origs)),
        ("mean_r_chk", chk([o[2][2] for o in origs])),
        ("mean_luma_chk", chk([o[2][5] for o in origs])),
        ("rz_luma_chk", chk([f[5] for f in rzs])),
    ])

    # -- q117 GIF: lossless on the 16-color fixture; sample keeps every 2nd,
    #    re-encoded at delay 20 cs -> decoded fps 5 (original: 10) --
    origs, samples = [], []
    for t in texts:
        w, h, frames = gif_frames(t)
        origs.append(video_features(w, h, frames, 10))
        samples.append(video_features(w, h, frames[::2], 5))
    sql("q117_gif_feature_gate", [
        ("n_media", len(texts)),
        ("sum_frames", sum(int(f[2]) for f in origs)),
        ("luma_chk", chk([f[4] for f in origs])),
        ("delta_chk", chk([f[7] for f in origs])),
        ("s_sum_frames", sum(int(f[2]) for f in samples)),
        ("s_luma_chk", chk([f[4] for f in samples])),
    ])

    # -- q124 WAV: PCM16 is lossless; downsample keeps every 4th frame,
    #    sample rate floors to rate//4 --
    origs, ds = [], []
    for t in texts:
        rate, samples = wav_fixture(t)
        origs.append(wav_features(rate, 1, samples))
        ds.append(wav_features(max(rate // 4, 1), 1, samples[::4]))
    sql("q124_wav_feature_gate", [
        ("n_media", len(texts)),
        ("sum_frames", sum(int(f[2]) for f in origs)),
        ("mean_abs_chk", chk([f[3] for f in origs])),
        ("rms_chk", chk([f[4] for f in origs])),
        ("ds_sum_frames", sum(int(f[2]) for f in ds)),
        ("ds_mean_abs_chk", chk([f[3] for f in ds])),
    ])

    # -- q125 AVI: uncompressed DIB frames are lossless; sample keeps
    #    every 2nd frame at fps 10 -> 5 --
    origs, samples = [], []
    for t in texts:
        w, h, frames = avi_frames(t)
        origs.append(video_features(w, h, frames, 10))
        samples.append(video_features(w, h, frames[::2], 5))
    sql("q125_avi_feature_gate", [
        ("n_media", len(texts)),
        ("sum_frames", sum(int(f[2]) for f in origs)),
        ("luma_chk", chk([f[4] for f in origs])),
        ("delta_chk", chk([f[7] for f in origs])),
        ("s_sum_frames", sum(int(f[2]) for f in samples)),
        ("s_luma_chk", chk([f[4] for f in samples])),
    ])


if __name__ == "__main__":
    main()
