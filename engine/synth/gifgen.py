"""Deterministic GIF encoder — fixture generator for
engine/kernels/gif.py (same stance as jpeggen/pdfgen: no imaging
libs in this container, so the repo carries its own writer).

Grayscale 256-entry global color table (i,i,i), whose BT.601 luma is
exactly i — so gray fixtures round-trip BIT-EXACTLY through the
decoder (unlike JPEG's quantization loss). LZW is the GIF variant:
LSB-first, width min_code_size+1 -> 12, clear/EOI, NO early change
(the growth point mirrors the decoder: the encoder runs one table
entry ahead, so it widens at next_code > 2^w where the decoder
widens at len(table) >= 2^w). Optional interlace writes the 4-pass
row order. Pure stdlib, deterministic bytes.
"""

from __future__ import annotations

import struct

from engine.kernels.gif import _DEINTERLACE_PASSES


def _lzw_encode_gif(data: bytes, mcs: int) -> bytes:
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = clear + 2
    width = mcs + 1
    emit(clear, width)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:  # table full -> frozen (decoder mirrors)
            table[wc] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        w = c
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_gray(
    px: bytes,
    w: int,
    h: int,
    interlaced: bool = False,
    comment: bytes | None = None,
    bg_index: int = 0,
    frame_rect: tuple[int, int, int, int] | None = None,
) -> bytes:
    """Row-major gray bytes -> single-frame GIF89a with a 256-gray
    GCT. `comment` adds an extension block (exercises the decoder's
    block skipping). `bg_index` sets the logical-screen background-
    color-index byte; `frame_rect=(left, top, fw, fh)` places a
    sub-rectangle frame (px must then be fw*fh bytes), exposing the
    background fill around it (ADVICE r4 coverage)."""
    left, top, fw, fh = frame_rect if frame_rect else (0, 0, w, h)
    if len(px) != fw * fh:
        raise ValueError("pixel buffer size mismatch")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    # GCT flag, 8-bit color res, 256 entries; then bg index byte
    out += bytes([0x80 | 0x70 | 0x07, bg_index & 0xFF, 0])
    for i in range(256):  # grayscale GCT: luma(i,i,i) == i exactly
        out += bytes([i, i, i])
    if comment is not None:
        out += b"\x21\xfe" + _sub_blocks(comment)
    frame = bytearray(px)
    if interlaced:
        il = bytearray(fw * fh)
        dst = 0
        for start, step in _DEINTERLACE_PASSES:
            for y in range(start, fh, step):
                il[dst : dst + fw] = px[y * fw : (y + 1) * fw]
                dst += fw
        frame = il
    out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh)
    out += bytes([0x40 if interlaced else 0x00])
    out += bytes([8])  # min code size
    out += _sub_blocks(_lzw_encode_gif(bytes(frame), 8))
    out += b"\x3b"
    return bytes(out)


def make_gif_gray(seed: int, i: int, w: int = 32, h: int = 24) -> bytes:
    """Deterministic synthetic GIF — the mediagen gradient family
    (same pixel recipe as make_png_gray / make_jpeg_gray, so
    cross-format perceptual dedup has real targets)."""
    from engine.corpus import _Rng

    rng = _Rng(seed, i)
    base = rng.next() & 0xFF
    px = bytes(
        (base + 3 * x + 5 * y) & 0xFF for y in range(h) for x in range(w)
    )
    return encode_gif_gray(px, w, h, interlaced=(i % 3 == 0))
