#!/usr/bin/env python3
"""Independent baseline-JPEG reference (NOT part of the library).

Generates golden fixtures for the Scala codec's OpsSpec test: a pure-python
baseline-DCT encoder (4:4:4 and grayscale, standard Annex-K tables) and an
exact-arithmetic decoder whose IDCT/color math mirrors graft.ops.Codecs
bit-for-bit (shared hex-exact cosine basis, identical accumulation order,
floor(x+0.5) rounding) — so `decode(python) == decode(scala)` is an
equality, not a tolerance.

Usage: python3 tools/jpeg_ref.py  → prints Scala byte arrays for the test.
"""
import math

# the shared IDCT basis: B[u][x] = 0.5*C(u)*cos((2x+1)u*pi/16), hex-exact —
# the same 64 constants are embedded in graft.ops.Codecs (generated once)
BASIS_HEX = [
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
    "0x1.f6297cff75cb0p-2", "-0x1.a9b66290ea1a1p-2", "0x1.1c73b39ae68c2p-2", "-0x1.8f8b83c69a616p-4",
]
B = [float.fromhex(h) for h in BASIS_HEX]  # B[u*8+x]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

# Annex K quantization tables
QL = [16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
      14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
      18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
      49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99]
QC = [17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
      24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
      99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99]

# Annex K huffman tables: (bits[1..16], values)
DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)))
DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)))
AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d],
        [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
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
         0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
        [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
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
         0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])


def scale_q(table, quality):
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return [max(1, min(255, (t * s + 50) // 100)) for t in table]


def canonical_codes(bits, values):
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val, ln):
        for i in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1s


def fdct(block):  # block: 64 level-shifted doubles (row-major y*8+x)
    out = [0.0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                r = 0.0
                for x in range(8):
                    r += block[y * 8 + x] * B[u * 8 + x]
                s += r * B[v * 8 + y]
            out[v * 8 + u] = s
    return out


def idct(coef):  # coef: 64 dequantized doubles, natural order F[v*8+u]
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                r = 0.0
                for u in range(8):
                    r += coef[v * 8 + u] * B[u * 8 + x]
                s += r * B[v * 8 + y]
            p = int(math.floor(s + 128.5))
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def category(v):
    a, n = abs(v), 0
    while a:
        a >>= 1
        n += 1
    return n


def encode_block(bw, block, qtab, dc_codes, ac_codes, pred):
    coef = fdct(block)
    q = [0] * 64
    for i in range(64):
        c = coef[i] / qtab[i]
        q[i] = int(math.floor(abs(c) + 0.5)) * (1 if c >= 0 else -1)
    dc = q[0] - pred
    cat = category(dc)
    ln, code = dc_codes[cat]
    bw.put(code, ln)
    if cat:
        bw.put(dc if dc >= 0 else dc + (1 << cat) - 1, cat)
    zz = [q[ZIGZAG[i]] for i in range(64)]
    run = 0
    for i in range(1, 64):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.put(code, ln)
            run -= 16
        cat = category(zz[i])
        ln, code = ac_codes[(run << 4) | cat]
        bw.put(code, ln)
        v = zz[i]
        bw.put(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        ln, code = ac_codes[0x00]
        bw.put(code, ln)
    return q[0]


def encode(width, height, pixels, quality=90):
    """pixels: w*h*3 RGB bytes (4:4:4 three-component) or w*h (grayscale)."""
    gray = len(pixels) == width * height
    ql = scale_q(QL, quality)
    qc = scale_q(QC, quality)
    if gray:
        planes = [[float(pixels[i]) for i in range(width * height)]]
    else:
        y_, cb, cr = [], [], []
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            yv = 0.299 * r + 0.587 * g + 0.114 * b
            cbv = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
            crv = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
            def cl(v):
                p = int(math.floor(v + 0.5))
                return 0 if p < 0 else (255 if p > 255 else p)
            y_.append(float(cl(yv)))
            cb.append(float(cl(cbv)))
            cr.append(float(cl(crv)))
        planes = [y_, cb, cr]

    out = bytearray(b"\xff\xd8")  # SOI
    def dqt(tid, tab):
        zz = bytes(tab[ZIGZAG[i]] for i in range(64))
        out.extend(b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid]) + zz)
    dqt(0, ql)
    if not gray:
        dqt(1, qc)
    nc = 1 if gray else 3
    sof = bytearray((8 + 3 * nc).to_bytes(2, "big") + b"\x08")
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out.extend(b"\xff\xc0" + sof)
    def dht(cls, tid, bits, values):
        data = bytes([cls << 4 | tid]) + bytes(bits) + bytes(values)
        out.extend(b"\xff\xc4" + (2 + len(data)).to_bytes(2, "big") + data)
    dht(0, 0, *DC_L)
    dht(1, 0, *AC_L)
    if not gray:
        dht(0, 1, *DC_C)
        dht(1, 1, *AC_C)
    sos = bytearray((6 + 2 * nc).to_bytes(2, "big") + bytes([nc]))
    for c in range(nc):
        sos += bytes([c + 1, 0 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out.extend(b"\xff\xda" + sos)

    bw = BitWriter()
    dcl = canonical_codes(*DC_L)
    acl = canonical_codes(*AC_L)
    dcc = canonical_codes(*DC_C)
    acc_ = canonical_codes(*AC_C)
    preds = [0] * nc
    bw_, bh_ = (width + 7) // 8, (height + 7) // 8
    for by in range(bh_):
        for bx in range(bw_):
            for c in range(nc):
                block = [0.0] * 64
                for yy in range(8):
                    sy = min(by * 8 + yy, height - 1)
                    for xx in range(8):
                        sx = min(bx * 8 + xx, width - 1)
                        block[yy * 8 + xx] = planes[c][sy * width + sx] - 128.0
                qt = ql if c == 0 else qc
                dc_c = dcl if c == 0 else dcc
                ac_c = acl if c == 0 else acc_
                preds[c] = encode_block(bw, block, qt, dc_c, ac_c, preds[c])
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def encode_420(width, height, pixels, quality=90):
    """4:2:0 encoder (python-only, golden generation): 2x2 luma blocks per
    MCU + one subsampled Cb/Cr block each (top-left sample). Exercises the
    decoder's MCU interleave + chroma upsampling path."""
    ql = scale_q(QL, quality)
    qc = scale_q(QC, quality)
    y_, cb, cr = [], [], []
    for i in range(width * height):
        r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
        def cl(v):
            p = int(math.floor(v + 0.5))
            return 0 if p < 0 else (255 if p > 255 else p)
        y_.append(float(cl(0.299 * r + 0.587 * g + 0.114 * b)))
        cb.append(float(cl(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b)))
        cr.append(float(cl(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b)))
    cw, ch = (width + 1) // 2, (height + 1) // 2
    cbs = [cb[min(2 * i, height - 1) * width + min(2 * j, width - 1)]
           for i in range(ch) for j in range(cw)]
    crs = [cr[min(2 * i, height - 1) * width + min(2 * j, width - 1)]
           for i in range(ch) for j in range(cw)]

    out = bytearray(b"\xff\xd8")
    def dqt(tid, tab):
        zz = bytes(tab[ZIGZAG[i]] for i in range(64))
        out.extend(b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid]) + zz)
    dqt(0, ql)
    dqt(1, qc)
    sof = bytearray((17).to_bytes(2, "big") + b"\x08")
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big") + b"\x03"
    sof += bytes([1, 0x22, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out.extend(b"\xff\xc0" + sof)
    def dht(cls, tid, bits, values):
        data = bytes([cls << 4 | tid]) + bytes(bits) + bytes(values)
        out.extend(b"\xff\xc4" + (2 + len(data)).to_bytes(2, "big") + data)
    dht(0, 0, *DC_L)
    dht(1, 0, *AC_L)
    dht(0, 1, *DC_C)
    dht(1, 1, *AC_C)
    out.extend(b"\xff\xda" + (12).to_bytes(2, "big")
               + bytes([3, 1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")

    bw = BitWriter()
    dcl, acl = canonical_codes(*DC_L), canonical_codes(*AC_L)
    dcc, acc_ = canonical_codes(*DC_C), canonical_codes(*AC_C)
    preds = [0, 0, 0]
    def take(plane, pw, ph, ox, oy):
        blk = [0.0] * 64
        for yy in range(8):
            sy = min(oy + yy, ph - 1)
            for xx in range(8):
                sx = min(ox + xx, pw - 1)
                blk[yy * 8 + xx] = plane[sy * pw + sx] - 128.0
        return blk
    for my in range((height + 15) // 16):
        for mx in range((width + 15) // 16):
            for bv in range(2):
                for bh in range(2):
                    blk = take(y_, width, height, (2 * mx + bh) * 8, (2 * my + bv) * 8)
                    preds[0] = encode_block(bw, blk, ql, dcl, acl, preds[0])
            preds[1] = encode_block(bw, take(cbs, cw, ch, mx * 8, my * 8),
                                    qc, dcc, acc_, preds[1])
            preds[2] = encode_block(bw, take(crs, cw, ch, mx * 8, my * 8),
                                    qc, dcc, acc_, preds[2])
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


class BitReader:
    def __init__(self, data, pos):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self):
        if self.n == 0:
            b = self.d[self.pos]
            self.pos += 1
            if b == 0xFF:
                assert self.d[self.pos] == 0x00, "marker inside entropy data"
                self.pos += 1
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def build_decode(bits, values):
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode(data):
    """Baseline decode mirroring the Scala codec exactly. Returns
    (width, height, rgb bytes)."""
    assert data[0] == 0xFF and data[1] == 0xD8
    pos = 2
    qtabs = {}
    htabs = {}
    comps = None
    width = height = 0
    while True:
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        ln = int.from_bytes(data[pos:pos + 2], "big")
        seg = data[pos + 2:pos + ln]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                tid = seg[p] & 0x0F
                assert seg[p] >> 4 == 0, "only 8-bit qtables"
                tab = [0] * 64
                for i in range(64):
                    tab[ZIGZAG[i]] = seg[p + 1 + i]
                qtabs[tid] = tab
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                values = list(seg[p + 17:p + 17 + nv])
                htabs[(tc, th)] = build_decode(bits, values)
                p += 17 + nv
        elif marker == 0xC0:
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq})
        elif marker == 0xDA:
            ns = seg[0]
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tabs >> 4, tabs & 0x0F
            pos += ln
            break
        pos += ln

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        c["w"] = mcux * 8 * c["h"]
        c["hh"] = mcuy * 8 * c["v"]
        planes.append(bytearray(c["w"] * c["hh"]))
    br = BitReader(data, pos)

    def huff(table):
        ln, code = 0, 0
        while ln < 16:
            code = (code << 1) | br.bit()
            ln += 1
            if (ln, code) in table:
                return table[(ln, code)]
        raise AssertionError("bad huffman code")

    def extend(v, cat):
        return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1

    preds = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, c in enumerate(comps):
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        cat = huff(htabs[(0, c["td"])])
                        diff = extend(br.bits(cat), cat) if cat else 0
                        preds[ci] += diff
                        zz = [0] * 64
                        zz[0] = preds[ci]
                        i = 1
                        while i < 64:
                            rs = huff(htabs[(1, c["ta"])])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    i += 16
                                    continue
                                break
                            i += r
                            zz[i] = extend(br.bits(s), s)
                            i += 1
                        q = qtabs[c["tq"]]
                        coef = [0.0] * 64
                        for i in range(64):
                            coef[ZIGZAG[i]] = float(zz[i] * q[ZIGZAG[i]])
                        px = idct(coef)
                        ox = (mx * c["h"] + bh) * 8
                        oy = (my * c["v"] + bv) * 8
                        for yy in range(8):
                            for xx in range(8):
                                planes[ci][(oy + yy) * c["w"] + ox + xx] = px[yy * 8 + xx]

    rgb = bytearray(width * height * 3)
    if len(comps) == 1:
        for i in range(height):
            for j in range(width):
                v = planes[0][i * comps[0]["w"] + j]
                rgb[3 * (i * width + j):3 * (i * width + j) + 3] = bytes([v, v, v])
    else:
        for i in range(height):
            for j in range(width):
                yv = planes[0][(i * comps[0]["v"] // vmax) * comps[0]["w"]
                               + (j * comps[0]["h"] // hmax)]
                cbv = planes[1][(i * comps[1]["v"] // vmax) * comps[1]["w"]
                                + (j * comps[1]["h"] // hmax)]
                crv = planes[2][(i * comps[2]["v"] // vmax) * comps[2]["w"]
                                + (j * comps[2]["h"] // hmax)]
                def cl(v):
                    p = int(math.floor(v + 0.5))
                    return 0 if p < 0 else (255 if p > 255 else p)
                r = cl(yv + 1.402 * (crv - 128))
                g = cl(yv - 0.344136286 * (cbv - 128) - 0.714136286 * (crv - 128))
                b = cl(yv + 1.772 * (cbv - 128))
                o = 3 * (i * width + j)
                rgb[o] = r
                rgb[o + 1] = g
                rgb[o + 2] = b
    return width, height, bytes(rgb)


# ---- progressive (SOF2) encoder — golden generation for the Scala -------
# ---- decoder's Annex-G path. Entropy layout per spec G.1.2 (and the ------
# ---- standard libjpeg-compatible bit ordering): DC first/refine, AC ------
# ---- first/refine with EOB-run coding, optional restart intervals. -------
# The quantized coefficients are computed by the SAME fdct/round path as
# encode(), so a complete progressive decode must reproduce exactly the
# pixels of the baseline encoding of the same image — that equality is the
# Scala test's oracle.

def quantize_blocks(width, height, planes, qtabs_per_comp):
    """Per-component list of quantized 64-coef blocks (natural order),
    8x8 raster order with edge replication — identical to encode()."""
    nc = len(planes)
    bw_, bh_ = (width + 7) // 8, (height + 7) // 8
    out = [[] for _ in range(nc)]
    for by in range(bh_):
        for bx in range(bw_):
            for c in range(nc):
                block = [0.0] * 64
                for yy in range(8):
                    sy = min(by * 8 + yy, height - 1)
                    for xx in range(8):
                        sx = min(bx * 8 + xx, width - 1)
                        block[yy * 8 + xx] = planes[c][sy * width + sx] - 128.0
                coef = fdct(block)
                q = [0] * 64
                for i in range(64):
                    x = coef[i] / qtabs_per_comp[c][i]
                    q[i] = int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)
                out[c].append(q)
    return out


class ProgEmitter:
    """Two-pass scan emitter: dry run (bw=None) collects the AC symbol
    alphabet; real run writes bits with the supplied canonical codes."""

    def __init__(self, bw=None, codes=None):
        self.bw = bw
        self.codes = codes
        self.syms = set()
        self.rst = 0

    def symbol(self, s):
        if self.bw is None:
            self.syms.add(s)
        else:
            ln, code = self.codes[s]
            self.bw.put(code, ln)

    def rawbits(self, v, n):
        if self.bw is not None and n > 0:
            self.bw.put(v, n)

    def restart(self):
        if self.bw is not None:
            self.bw.flush()
            self.bw.out.append(0xFF)
            self.bw.out.append(0xD0 + self.rst)
        self.rst = (self.rst + 1) & 7


def custom_table(syms):
    """Canonical huffman table with every symbol at one code length L,
    2^L >= n+1 so the all-ones code stays unused (spec C.2)."""
    vals = sorted(syms)
    n = len(vals)
    L = 1
    while (1 << L) < n + 1:
        L += 1
    bits = [0] * 16
    bits[L - 1] = n
    return bits, vals


def ac_first_scan(em, blocks, ss, se, al, dri):
    eob = [0]

    def flush_eob():
        if eob[0] > 0:
            r = eob[0].bit_length() - 1
            em.symbol(r << 4)
            em.rawbits(eob[0] - (1 << r), r)
            eob[0] = 0

    for i, q in enumerate(blocks):
        if dri and i > 0 and i % dri == 0:
            flush_eob()
            em.restart()
        vals = [abs(q[ZIGZAG[k]]) >> al for k in range(ss, se + 1)]
        kend = -1
        for j, v in enumerate(vals):
            if v:
                kend = j
        if kend < 0:
            eob[0] += 1
            if eob[0] == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for j in range(kend + 1):
            v = vals[j]
            if v == 0:
                run += 1
                continue
            while run > 15:
                em.symbol(0xF0)
                run -= 16
            cat = category(v)
            em.symbol((run << 4) | cat)
            sv = v if q[ZIGZAG[ss + j]] >= 0 else -v
            em.rawbits(sv if sv >= 0 else sv + (1 << cat) - 1, cat)
            run = 0
        if kend < se - ss:
            eob[0] += 1
            if eob[0] == 0x7FFF:
                flush_eob()
    flush_eob()


def ac_refine_scan(em, blocks, ss, se, al, dri):
    # Ah is al+1 by construction; history = absv >> 1, so absv==1 means
    # newly nonzero at this precision and absv>1 means correction bit.
    eob = [0]
    be_bits = []

    def flush_eob():
        if eob[0] > 0:
            r = eob[0].bit_length() - 1
            em.symbol(r << 4)
            em.rawbits(eob[0] - (1 << r), r)
            for b in be_bits:
                em.rawbits(b, 1)
            eob[0] = 0
            be_bits.clear()

    for i, q in enumerate(blocks):
        if dri and i > 0 and i % dri == 0:
            flush_eob()
            em.restart()
        absv = [abs(q[ZIGZAG[k]]) >> al for k in range(ss, se + 1)]
        eobidx = -1
        for j, v in enumerate(absv):
            if v == 1:
                eobidx = j
        run = 0
        br_bits = []
        for j, v in enumerate(absv):
            if v == 0:
                run += 1
                continue
            # fold trailing ZRLs into the EOB run (libjpeg-compatible)
            while run > 15 and j <= eobidx:
                flush_eob()
                em.symbol(0xF0)
                for b in br_bits:
                    em.rawbits(b, 1)
                br_bits = []
                run -= 16
            if v > 1:
                br_bits.append(v & 1)
                continue
            flush_eob()
            em.symbol((run << 4) | 1)
            em.rawbits(1 if q[ZIGZAG[ss + j]] >= 0 else 0, 1)
            for b in br_bits:
                em.rawbits(b, 1)
            br_bits = []
            run = 0
        if run > 0 or br_bits:
            eob[0] += 1
            be_bits.extend(br_bits)
            if eob[0] == 0x7FFF:
                flush_eob()
    flush_eob()


def encode_progressive(width, height, pixels, quality=90, dri=0):
    """Progressive 4:4:4 (w*h*3 RGB) or grayscale (w*h) encoder. Scan
    script: DC first (Al=1, interleaved) → per-component banded AC first
    (Al=1) → DC refine → per-component AC refine, each AC scan with its
    own generated canonical DHT in slot (1,0)."""
    gray = len(pixels) == width * height
    ql = scale_q(QL, quality)
    qc = scale_q(QC, quality)
    nc = 1 if gray else 3
    if gray:
        planes = [[float(pixels[i]) for i in range(width * height)]]
    else:
        y_, cb, cr = [], [], []
        for i in range(width * height):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            def cl(v):
                p = int(math.floor(v + 0.5))
                return 0 if p < 0 else (255 if p > 255 else p)
            y_.append(float(cl(0.299 * r + 0.587 * g + 0.114 * b)))
            cb.append(float(cl(128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b)))
            cr.append(float(cl(128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b)))
        planes = [y_, cb, cr]
    qtabs = [ql] + [qc] * (nc - 1)
    blocks = quantize_blocks(width, height, planes, qtabs)
    bw_ = (width + 7) // 8

    out = bytearray(b"\xff\xd8")

    def dqt(tid, tab):
        zz = bytes(tab[ZIGZAG[i]] for i in range(64))
        out.extend(b"\xff\xdb" + (67).to_bytes(2, "big") + bytes([tid]) + zz)

    dqt(0, ql)
    if not gray:
        dqt(1, qc)
    sof = bytearray((8 + 3 * nc).to_bytes(2, "big") + b"\x08")
    sof += height.to_bytes(2, "big") + width.to_bytes(2, "big") + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    out.extend(b"\xff\xc2" + sof)  # SOF2

    def dht(cls, tid, bits, values):
        data = bytes([cls << 4 | tid]) + bytes(bits) + bytes(values)
        out.extend(b"\xff\xc4" + (2 + len(data)).to_bytes(2, "big") + data)

    if dri:
        out.extend(b"\xff\xdd" + (4).to_bytes(2, "big") + dri.to_bytes(2, "big"))

    def sos_header(comp_tabs, ss, se, ah, al):
        ns = len(comp_tabs)
        hdr = bytearray((6 + 2 * ns).to_bytes(2, "big") + bytes([ns]))
        for cid, tabs in comp_tabs:
            hdr += bytes([cid, tabs])
        hdr += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + hdr)

    def dc_scan(ah, al):
        # interleaved over all components (4:4:4 → 1 block each per MCU)
        if ah == 0:
            dht(0, 0, *DC_L)
            if not gray:
                dht(0, 1, *DC_C)
        sos_header([(c + 1, (0 if c == 0 else 1) << 4) for c in range(nc)],
                   0, 0, ah, al)
        bw = BitWriter()
        em = ProgEmitter(bw, None)
        dc_codes = [canonical_codes(*DC_L)] + [canonical_codes(*DC_C)] * (nc - 1)
        preds = [0] * nc
        nblocks = len(blocks[0])
        for i in range(nblocks):
            if dri and i > 0 and i % dri == 0:
                em.restart()
                preds = [0] * nc
            for c in range(nc):
                q0 = blocks[c][i][0]
                if ah == 0:
                    dcval = q0 >> al  # arithmetic shift (python / scala agree)
                    diff = dcval - preds[c]
                    preds[c] = dcval
                    cat = category(diff)
                    ln, code = dc_codes[c][cat]
                    bw.put(code, ln)
                    if cat:
                        bw.put(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
                else:
                    bw.put((q0 >> al) & 1, 1)
        bw.flush()
        out.extend(bw.out)

    def ac_scan(comp, ss, se, ah, al):
        scan_fn = ac_first_scan if ah == 0 else ac_refine_scan
        dry = ProgEmitter()
        scan_fn(dry, blocks[comp], ss, se, al, dri)
        bits, vals = custom_table(dry.syms if dry.syms else {0x00})
        dht(1, 0, bits, vals)
        sos_header([(comp + 1, 0x00)], ss, se, ah, al)
        bw = BitWriter()
        em = ProgEmitter(bw, canonical_codes(bits, vals))
        scan_fn(em, blocks[comp], ss, se, al, dri)
        bw.flush()
        out.extend(bw.out)

    dc_scan(0, 1)
    if gray:
        ac_scan(0, 1, 8, 0, 1)
        ac_scan(0, 9, 63, 0, 1)
        dc_scan(1, 0)
        ac_scan(0, 1, 8, 1, 0)
        ac_scan(0, 9, 63, 1, 0)
    else:
        ac_scan(0, 1, 5, 0, 1)
        ac_scan(1, 1, 63, 0, 1)
        ac_scan(2, 1, 63, 0, 1)
        ac_scan(0, 6, 63, 0, 1)
        dc_scan(1, 0)
        ac_scan(0, 1, 5, 1, 0)
        ac_scan(0, 6, 63, 1, 0)
        ac_scan(1, 1, 63, 1, 0)
        ac_scan(2, 1, 63, 1, 0)
    out.extend(b"\xff\xd9")
    return bytes(out)


def scala_bytes(bs):
    return ", ".join(str(b if b < 128 else b - 256) for b in bs)


if __name__ == "__main__":
    # deterministic 11x6 RGB fixture (odd width exercises edge replication)
    w, h = 11, 6
    px = bytes(((i * 29 + 17) % 256) for i in range(w * h * 3))
    jp = encode(w, h, px, quality=90)
    dw, dh, rgb = decode(jp)
    assert (dw, dh) == (w, h)
    # self-check: lossy but close on smooth-ish data
    print(f"// golden JPEG ({len(jp)} bytes), {w}x{h} RGB, quality 90")
    print("Array[Byte](" + scala_bytes(jp) + ")")
    print(f"// expected decode ({len(rgb)} bytes)")
    print("Array[Byte](" + scala_bytes(rgb) + ")")
    # grayscale fixture
    w2, h2 = 9, 7
    px2 = bytes(((i * 13 + 5) % 256) for i in range(w2 * h2))
    jp2 = encode(w2, h2, px2, quality=85)
    dw2, dh2, rgb2 = decode(jp2)
    assert (dw2, dh2) == (w2, h2)
    print(f"// golden grayscale JPEG ({len(jp2)} bytes), {w2}x{h2}, quality 85")
    print("Array[Byte](" + scala_bytes(jp2) + ")")
    print(f"// expected decode ({len(rgb2)} bytes)")
    print("Array[Byte](" + scala_bytes(rgb2) + ")")

    # progressive twins: same pixels/quality → identical quantized
    # coefficients → decode must be byte-equal to the BASELINE golden.
    # Color twin carries DRI=1 (restart marker in every scan); the larger
    # gray fixture runs restart-free so EOB runs can span blocks.
    import base64
    pj = encode_progressive(w, h, px, quality=90, dri=1)
    print(f"// progressive color twin of the 11x6 fixture ({len(pj)} bytes), DRI=1")
    print(base64.b64encode(pj).decode())
    w3, h3 = 19, 13
    px3 = bytes(((i * 13 + 5) % 256) for i in range(w3 * h3))
    jp3 = encode(w3, h3, px3, quality=85)
    dw3, dh3, rgb3 = decode(jp3)
    assert (dw3, dh3) == (w3, h3)
    pj3 = encode_progressive(w3, h3, px3, quality=85)
    print(f"// progressive gray fixture ({len(pj3)} bytes), {w3}x{h3}, quality 85")
    print(base64.b64encode(pj3).decode())
    print(f"// expected decode of the gray fixture = its baseline twin's decode ({len(rgb3)} bytes)")
    print(base64.b64encode(rgb3).decode())
