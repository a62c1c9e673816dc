#!/usr/bin/env python3
"""Independent GIF89a reference encoder (NOT part of the library).

Generates golden GIF payloads + expected RGB pixels for the Scala decoder
tests (OpsSpec), the same arrangement as jpeg_ref.py: a SEPARATE
implementation of palette building and LZW compression, so the Scala
codec is pinned against code it shares nothing with. Supports interlace
and per-frame transparency so those decoder paths get independent
coverage too.

Usage: python3 tools/gif_ref.py   # prints base64 payloads + pixel arrays
"""
import base64
import struct


def lzw_encode(indices, mcs):
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def put(v, k):
        nonlocal acc, nbits
        acc |= v << nbits
        nbits += k
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = mcs + 1
    nxt = eoi + 1
    table = {}
    put(clear, code_size)
    cur = indices[0]  # current code (roots are literal indices)
    for c in indices[1:]:
        key = (cur, c)
        if key in table:
            cur = table[key]
        else:
            put(cur, code_size)
            if nxt < 4096:
                table[key] = nxt
                if nxt == (1 << code_size) and code_size < 12:
                    code_size += 1
                nxt += 1
            else:
                put(clear, code_size)
                table = {}
                code_size = mcs + 1
                nxt = eoi + 1
            cur = c
    put(cur, code_size)
    put(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def interlace_rows(h):
    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, h, step))
    return rows


def encode(width, height, frames, palette, interlaced=False,
           transparent=None, delay_cs=10, bg=0):
    """frames: list of index arrays (row-major); palette: list of (r,g,b)."""
    exp = 0
    while (2 << exp) < len(palette):
        exp += 1
    mcs = max(exp + 1, 2)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | ((mcs - 1) << 4) | exp)
    out.append(bg)
    out.append(0)
    for (r, g, b) in palette:
        out += bytes((r, g, b))
    out += b"\x00\x00\x00" * ((2 << exp) - len(palette))
    for fi, idx in enumerate(frames):
        out += bytes((0x21, 0xF9, 4))
        out.append(1 if transparent is not None and fi > 0 else 0)
        out += struct.pack("<H", delay_cs)
        out.append(transparent if transparent is not None and fi > 0 else 0)
        out.append(0)
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out.append(0x40 if interlaced else 0)
        seq = idx
        if interlaced:
            order = interlace_rows(height)
            seq = []
            for y in order:
                seq.extend(idx[y * width:(y + 1) * width])
        out.append(mcs)
        data = lzw_encode(list(seq), mcs)
        for p in range(0, len(data), 255):
            chunk = data[p:p + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def encode_frames(width, height, frames, palette, delay_cs=10, bg=0):
    """General animation encoder: frames are dicts
    {idx, rect=(l,t,w,h), disposal=0..3, transparent=index|None} —
    exercises partial rects and the disposal methods."""
    exp = 0
    while (2 << exp) < len(palette):
        exp += 1
    mcs = max(exp + 1, 2)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out.append(0x80 | ((mcs - 1) << 4) | exp)
    out.append(bg)
    out.append(0)
    for (r, g, b) in palette:
        out += bytes((r, g, b))
    out += b"\x00\x00\x00" * ((2 << exp) - len(palette))
    for f in frames:
        l, t, fw, fh = f.get("rect", (0, 0, width, height))
        disp = f.get("disposal", 0)
        tr = f.get("transparent")
        out += bytes((0x21, 0xF9, 4))
        out.append((disp << 2) | (1 if tr is not None else 0))
        out += struct.pack("<H", delay_cs)
        out.append(tr if tr is not None else 0)
        out.append(0)
        out += b"\x2c" + struct.pack("<HHHH", l, t, fw, fh)
        out.append(0)
        out.append(mcs)
        data = lzw_encode(list(f["idx"]), mcs)
        for p in range(0, len(data), 255):
            chunk = data[p:p + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def compose_frames(width, height, frames, palette, bg=0):
    """Displayed canvas after each frame under GIF89a disposal semantics:
    a frame's disposal applies AFTER it is displayed (before the next
    frame composites); 2 clears its rect to background, 3 restores the
    canvas to its pre-frame state."""
    canvas = list(palette[bg]) * (width * height)
    outs = []
    prev_disp, prev_rect, snapshot = 0, None, None
    for f in frames:
        if prev_disp == 2:
            pl, pt, pw, ph = prev_rect
            for y in range(ph):
                for x in range(pw):
                    o = 3 * ((pt + y) * width + pl + x)
                    canvas[o:o + 3] = palette[bg]
        elif prev_disp == 3 and snapshot is not None:
            canvas = snapshot
        disp = f.get("disposal", 0)
        snapshot = list(canvas) if disp == 3 else None
        l, t, fw, fh = f.get("rect", (0, 0, width, height))
        tr = f.get("transparent")
        for y in range(fh):
            for x in range(fw):
                ci = f["idx"][y * fw + x]
                if tr is not None and ci == tr:
                    continue
                o = 3 * ((t + y) * width + l + x)
                canvas[o:o + 3] = palette[ci]
        outs.append(bytes(b & 0xFF for b in canvas))
        prev_disp, prev_rect = disp, (l, t, fw, fh)
    return outs


def compose_rgb(width, height, frames, palette, transparent=None, bg=0):
    """Expected top-down RGB canvas after each frame (decoder contract)."""
    canvas = list(palette[bg]) * (width * height)
    outs = []
    for fi, idx in enumerate(frames):
        for i, ci in enumerate(idx):
            if transparent is not None and fi > 0 and ci == transparent:
                continue
            canvas[3 * i:3 * i + 3] = palette[ci]
        outs.append(bytes(b & 0xFF for b in canvas))
    return outs


def show(name, gif, pixels):
    print(f"  // {name}")
    print(f'  val {name} = java.util.Base64.getDecoder.decode(')
    b64 = base64.b64encode(gif).decode()
    for i in range(0, len(b64), 72):
        sep = ' +' if i + 72 < len(b64) else ')'
        print(f'    "{b64[i:i+72]}"{sep}')
    for fi, px in enumerate(pixels):
        print(f'  val {name}Px{fi} = Array[Int](' +
              ', '.join(str(b) for b in px) + ').map(_.toByte)')


def main():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (250, 128, 10)]
    # 1) 5x4 single frame, plain
    w, h = 5, 4
    idx = [(x * 3 + y * 7) % 4 for y in range(h) for x in range(w)]
    show("goldenGif", encode(w, h, [idx], pal),
         compose_rgb(w, h, [idx], pal))
    # 2) 6x9 interlaced (tall enough that all four passes run)
    w, h = 6, 9
    idx = [(x + y * 2) % 4 for y in range(h) for x in range(w)]
    show("goldenGifInterlaced", encode(w, h, [idx], pal, interlaced=True),
         compose_rgb(w, h, [idx], pal))
    # 3) 4x3 two-frame animation, frame 2 transparent except one pixel
    w, h = 4, 3
    f1 = [(x + y) % 4 for y in range(h) for x in range(w)]
    f2 = [3] * (w * h)
    f2[5] = 1  # all others transparent (index 3)
    show("goldenGifAnim",
         encode(w, h, [f1, f2], pal, transparent=3, delay_cs=5),
         compose_rgb(w, h, [f1, f2], pal, transparent=3))
    # 4) 6x5 disposal torture test — partial rects, disposal 2 (clear AFTER
    #    display, affecting the NEXT frame), disposal 3 (restore to the
    #    pre-frame canvas), and a transparent pixel inside the disposal-2
    #    frame (must show the PREVIOUS canvas, not background):
    #    f0 full-rect pattern; f1 rect(1,1,3,2) disposal 2 with one
    #    transparent pixel; f2 rect(2,2,2,2) disposal 3; f3 rect(0,0,2,1).
    w, h = 6, 5
    f0 = {"idx": [(x + y) % 4 for y in range(h) for x in range(w)]}
    f1 = {"idx": [1, 2, 0, 2, 1, 2], "rect": (1, 1, 3, 2),
          "disposal": 2, "transparent": 0}
    f2 = {"idx": [3, 3, 3, 3], "rect": (2, 2, 2, 2), "disposal": 3}
    f3 = {"idx": [2, 2], "rect": (0, 0, 2, 1)}
    fs = [f0, f1, f2, f3]
    show("goldenGifDisposal", encode_frames(w, h, fs, pal),
         compose_frames(w, h, fs, pal))


if __name__ == "__main__":
    main()
