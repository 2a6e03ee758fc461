"""Baseline GIF decoder (GIF87a/GIF89a, first frame, luma output) —
the second image codec stub turned real in r4 (after
engine/kernels/jpeg.py; the repo's honestly-scoped-baseline stance).

Honest scope, enforced by typed errors (the multimodal seam maps
them into decode_status, never a task failure):

  REAL   header + logical screen descriptor, global/local color
         tables, extension-block skipping, the FIRST image
         descriptor's pixel data via GIF-variant LZW (LSB-first
         variable-width codes, clear/EOI, NO early change — note the
         bit order and growth rule both differ from the PDF LZW in
         engine/kernels/pdf_textlayer.py, which is why the two
         decoders are separate ~60-line cores rather than one
         parameterized maze), interlaced images (4-pass
         deinterlace), transparent-index-as-palette-color.
  OUT    animation (frames after the first are ignored — GIF's frame
         composition model is out of the perceptual-dedup use case).

Output is the LUMA plane (integer BT.601: (299r+587g+114b)//1000),
matching decode_jpeg_luma / decode_png_gray8 so aHash near-dup works
across all three container formats. stdlib only; deterministic.
"""

from __future__ import annotations

import struct

GIF_SIGS = (b"GIF87a", b"GIF89a")


def _read_color_table(raw: bytes, pos: int, n: int):
    tbl = raw[pos : pos + 3 * n]
    if len(tbl) != 3 * n:
        raise ValueError("gif_truncated_color_table")
    return tbl, pos + 3 * n


def _skip_sub_blocks(raw: bytes, pos: int) -> int:
    while True:
        if pos >= len(raw):
            raise ValueError("gif_truncated_blocks")
        n = raw[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _collect_sub_blocks(raw: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(raw):
            raise ValueError("gif_truncated_data")
        n = raw[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += raw[pos : pos + n]
        if len(raw[pos : pos + n]) != n:
            raise ValueError("gif_truncated_data")
        pos += n


def _lzw_decode_gif(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF LZW: LSB-first packing, initial width = min_code_size + 1,
    clear = 2^mcs, EOI = clear + 1; width grows AFTER the table
    reaches 2^width entries (no early change), capped at 12 bits.
    Decodes at most n_pixels indices (trailing junk tolerated, per
    every real-world decoder)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out[:n_pixels])
            if prev is None:
                if code >= len(table):
                    raise ValueError("gif_bad_first_code")
                entry = table[code]
            else:
                if code < len(table):
                    entry = table[code]
                elif code == len(table):
                    entry = prev + prev[:1]
                else:
                    raise ValueError("gif_code_out_of_range")
                if len(table) < 4096:
                    table.append(prev + entry[:1])
                    if len(table) >= (1 << width) and width < 12:
                        width += 1
            out += entry
            prev = entry
            if len(out) >= n_pixels:
                return bytes(out[:n_pixels])
    return bytes(out[:n_pixels])


def gif_meta(raw: bytes) -> tuple[int, int, int]:
    """(width, height, global_color_table_size) from the header."""
    if raw[:6] not in GIF_SIGS:
        raise ValueError("not_gif")
    if len(raw) < 13:
        raise ValueError("gif_truncated_header")
    w, h = struct.unpack("<HH", raw[6:10])
    flags = raw[10]
    gct_n = (2 << (flags & 0x07)) if flags & 0x80 else 0
    return (w, h, gct_n)


_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_luma(raw: bytes) -> tuple[int, int, bytes]:
    """First frame -> (width, height, row-major luma bytes) at the
    LOGICAL SCREEN size; the frame rectangle lands at its (left, top)
    offset on the background color — the logical-screen descriptor's
    background-color-index byte (raw[11]) resolved through the GLOBAL
    color table per GIF89a §18 (index 0 when there is no GCT or the
    index is out of range) (ADVICE r4)."""
    w, h, gct_n = gif_meta(raw)
    from engine.kernels.multimodal import _check_pixels

    _check_pixels(w, h, "gif")  # bomb guard: header-declared plane
    bg_idx = raw[11]
    pos = 13
    gct = b""
    if gct_n:
        gct, pos = _read_color_table(raw, pos, gct_n)
    if gct and bg_idx < len(gct) // 3:
        bg_luma = (
            299 * gct[3 * bg_idx]
            + 587 * gct[3 * bg_idx + 1]
            + 114 * gct[3 * bg_idx + 2]
        ) // 1000
    else:
        bg_luma = None  # resolved below from the frame's table, index 0
    while pos < len(raw):
        b = raw[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos = _skip_sub_blocks(raw, pos + 1)
            continue
        if b != 0x2C:
            raise ValueError("gif_bad_block")
        left, top, fw, fh = struct.unpack("<HHHH", raw[pos : pos + 8])
        _check_pixels(fw, fh, "gif_frame")  # frame rect is independent
        flags = raw[pos + 8]
        pos += 9
        lct = gct
        if flags & 0x80:
            lct, pos = _read_color_table(raw, pos, 2 << (flags & 0x07))
        if not lct:
            raise ValueError("gif_no_color_table")
        interlaced = bool(flags & 0x40)
        mcs = raw[pos]
        pos += 1
        if not (2 <= mcs <= 8):
            raise ValueError("gif_bad_min_code_size")
        data, pos = _collect_sub_blocks(raw, pos)
        idx = _lzw_decode_gif(data, mcs, fw * fh)
        if len(idx) < fw * fh:
            raise ValueError("gif_short_pixel_data")
        # palette -> integer BT.601 luma, one 256-entry lookup
        n_colors = len(lct) // 3
        luma = bytes(
            (299 * lct[3 * i] + 587 * lct[3 * i + 1] + 114 * lct[3 * i + 2])
            // 1000
            if i < n_colors
            else 0
            for i in range(256)
        )
        frame = bytes(idx).translate(luma)
        if interlaced:
            de = bytearray(fw * fh)
            src = 0
            for start, step in _DEINTERLACE_PASSES:
                for y in range(start, fh, step):
                    de[y * fw : (y + 1) * fw] = frame[src : src + fw]
                    src += fw
            frame = bytes(de)
        plane = bytearray(
            [luma[0] if bg_luma is None else bg_luma]
        ) * (w * h)
        for y in range(min(fh, max(0, h - top))):
            row = frame[y * fw : y * fw + min(fw, max(0, w - left))]
            o = (top + y) * w + left
            plane[o : o + len(row)] = row
        return (w, h, bytes(plane))
    raise ValueError("gif_no_image_block")
