"""Deterministic minimal-PDF builder for the synthetic corpus and the
pytest fixtures (SURVEY.md §5, FIXTURES.md §2.2-2.3).

Emits the exact PDF subset the text-layer kernel
(engine/kernels/pdf_textlayer.py) and OCR kernel (engine/kernels/ocr.py)
are scoped to parse: xref-table PDFs with Tj/TJ/'/Td/TD/Tm/T*/TL text
operators, optional FlateDecode content streams, and 1-bit raster image
XObjects rendered in the synthetic 5x7 font (ocr_font.py).

Pure functions of their arguments — no clock, no RNG.
"""

from __future__ import annotations

import zlib

from engine.kernels.ocr_font import (
    CELL_H,
    CELL_W,
    CHAR_TO_PATTERN,
    pattern_bits,
)

_PAGE_W, _PAGE_H = 612, 792
_MARGIN_X, _TOP_Y = 72, 720
_LEADING = 14


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _text_content_stream(page_text: str, variant: int) -> bytes:
    """Render one page of text. `variant` cycles operator styles so the
    corpus exercises the whole operator surface deterministically."""
    lines = page_text.split("\n")
    out = ["BT", "/F1 12 Tf", f"{_LEADING} TL"]
    mode = variant % 4
    if mode == 0:  # Td + T* + Tj
        out.append(f"{_MARGIN_X} {_TOP_Y} Td")
        for i, ln in enumerate(lines):
            if i > 0:
                out.append("T*")
            out.append(f"({_esc(ln)}) Tj")
    elif mode == 1:  # absolute Tm per line
        for i, ln in enumerate(lines):
            out.append(f"1 0 0 1 {_MARGIN_X} {_TOP_Y - i * _LEADING} Tm")
            out.append(f"({_esc(ln)}) Tj")
    elif mode == 2:  # TD (sets leading) + ' (next-line-show)
        out.append(f"{_MARGIN_X} {_TOP_Y} Td")
        first = True
        for ln in lines:
            if first:
                out.append(f"({_esc(ln)}) Tj")
                out.append(f"0 -{_LEADING} TD")
                first = False
            else:
                out.append(f"({_esc(ln)}) '")
    else:  # TJ kerning arrays: words split with kerning numbers
        out.append(f"{_MARGIN_X} {_TOP_Y} Td")
        for i, ln in enumerate(lines):
            if i > 0:
                out.append("T*")
            words = ln.split(" ")
            parts = []
            for j, w in enumerate(words):
                if j > 0:
                    parts.append("-250")  # > word-gap threshold -> space
                parts.append(f"({_esc(w)})")
                if len(w) > 1:  # intra-word kerning, must NOT become a space
                    parts.append("-40")
            out.append(f"[{' '.join(parts)}] TJ")
    out.append("ET")
    return "\n".join(out).encode("latin-1")


def _two_column_content_stream(col1: list[str], col2: list[str]) -> bytes:
    out = ["BT", "/F1 12 Tf"]
    for i, ln in enumerate(col1):
        out.append(f"1 0 0 1 {_MARGIN_X} {_TOP_Y - i * _LEADING} Tm")
        out.append(f"({_esc(ln)}) Tj")
    for i, ln in enumerate(col2):
        out.append(f"1 0 0 1 {320} {_TOP_Y - i * _LEADING} Tm")
        out.append(f"({_esc(ln)}) Tj")
    out.append("ET")
    return "\n".join(out).encode("latin-1")


def _assemble(objects: list[bytes]) -> bytes:
    """objects[i] is the full body of object i+1 (between 'N 0 obj' and
    'endobj'). Builds header, xref table, trailer."""
    head = b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"
    out = bytearray(head)
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _hex_encode(data: bytes) -> bytes:
    """ASCIIHexDecode inverse: hex pairs in 64-char lines + '>' EOD."""
    hx = data.hex().encode("ascii")
    lines = [hx[i : i + 64] for i in range(0, len(hx), 64)]
    return b"\n".join(lines) + b">"


def _lzw_encode(data: bytes) -> bytes:
    """PDF/TIFF LZW encoder (EarlyChange=1), the inverse of the
    kernel's _lzw_decode: MSB-first 9->12-bit codes, clear=256,
    EOD=257, table reset at 4095 entries. Deterministic."""
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code = 258
    width = 9
    emit(256, width)  # initial clear (conventional)
    w = b""
    for b in data:
        c = bytes([b])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # PDF 32000 §7.4.4.2 EarlyChange=1: the encoder grows "as
        # soon as it has inserted entry 2^w - 1"; the decoder (one
        # entry behind by construction) grows at 2^w - 2 — which is
        # the kernel _lzw_decode's len(table) >= (1<<width)-1 rule
        if next_code >= (1 << width):
            if width < 12:
                width += 1
            else:  # table full: clear and restart
                emit(256, width)
                table = fresh()
                next_code = 258
                width = 9
        w = c
    if w:
        emit(table[w], width)
    emit(257, width)  # EOD
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _stream_obj(
    dict_extra: str, data: bytes, compress: bool, filters: str | None = None
) -> bytes:
    """filters: None (respect `compress` -> Flate), or one of
    'hex', 'lzw', 'lzw+hex' (encode LZW, then hex — decoded as the
    filter ARRAY [/ASCIIHexDecode /LZWDecode])."""
    if filters == "hex":
        data = _hex_encode(data)
        filt = " /Filter /ASCIIHexDecode"
    elif filters == "lzw":
        data = _lzw_encode(data)
        filt = " /Filter /LZWDecode"
    elif filters == "lzw+hex":
        data = _hex_encode(_lzw_encode(data))
        filt = " /Filter [ /ASCIIHexDecode /LZWDecode ]"
    elif compress:
        data = zlib.compress(data, 6)
        filt = " /Filter /FlateDecode"
    else:
        filt = ""
    d = f"<< /Length {len(data)}{filt}{dict_extra} >>".encode()
    return d + b"\nstream\n" + data + b"\nendstream"


def make_text_pdf(pages: list[str], compress: bool = False) -> bytes:
    """Multi-page text-layer PDF. Each entry of `pages` is the page's
    text with '\n' line breaks."""
    n = len(pages)
    font_num = 3 + 2 * n
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    for i, ptext in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} {_PAGE_H}]"
                f" /Resources << /Font << /F1 {font_num} 0 R >> >>"
                f" /Contents {content_num} 0 R >>"
            ).encode()
        )
        objs.append(_stream_obj("", _text_content_stream(ptext, i), compress))
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    assert len(objs) == font_num
    return _assemble(objs)


def make_filtered_pdf(pages: list[str], filters: str) -> bytes:
    """make_text_pdf variant with every content stream encoded by
    `filters` ('hex' | 'lzw' | 'lzw+hex') — the r4 filter-widening
    fixture family (VERDICT r3 next #6)."""
    n = len(pages)
    font_num = 3 + 2 * n
    objs: list[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    for i, ptext in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} {_PAGE_H}]"
                f" /Resources << /Font << /F1 {font_num} 0 R >> >>"
                f" /Contents {content_num} 0 R >>"
            ).encode()
        )
        objs.append(
            _stream_obj(
                "", _text_content_stream(ptext, i), False, filters=filters
            )
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    assert len(objs) == font_num
    return _assemble(objs)


def make_xrefstream_pdf(pages: list[str]) -> bytes:
    """PDF 1.5 xref-STREAM document: catalog/pages/page/font dicts
    packed into a Flate /Type /ObjStm, content streams as ordinary
    objects, a /Type /XRef stream (W [1 2 1], type-1/type-2 entries)
    instead of an xref table, and a startxref pointing at it. The
    kernel reads it via the ObjStm unpacking path; the XRef stream
    itself is carried as an opaque object."""
    n = len(pages)
    # object numbering: 1..n = content streams, n+1 = ObjStm,
    # n+2 = XRef stream; packed (no top-level number): catalog=101,
    # pages=102, page dicts 103..102+n, font=103+n
    cat_num, pages_num, font_num = 101, 102, 103 + n
    packed: list[tuple[int, bytes]] = []
    packed.append((cat_num, f"<< /Type /Catalog /Pages {pages_num} 0 R >>".encode()))
    kids = " ".join(f"{103 + i} 0 R" for i in range(n))
    packed.append(
        (pages_num, f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    )
    for i in range(n):
        packed.append(
            (
                103 + i,
                (
                    f"<< /Type /Page /Parent {pages_num} 0 R"
                    f" /MediaBox [0 0 {_PAGE_W} {_PAGE_H}]"
                    f" /Resources << /Font << /F1 {font_num} 0 R >> >>"
                    f" /Contents {i + 1} 0 R >>"
                ).encode(),
            )
        )
    packed.append(
        (font_num, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    )
    bodies = b""
    header_parts = []
    for num, body in packed:
        header_parts.append(f"{num} {len(bodies)}")
        bodies += body + b"\n"
    header = (" ".join(header_parts) + "\n").encode()
    objstm_payload = header + bodies

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for i, ptext in enumerate(pages):
        offsets[i + 1] = len(out)
        out += f"{i + 1} 0 obj\n".encode()
        out += _stream_obj("", _text_content_stream(ptext, i), True)
        out += b"\nendobj\n"
    objstm_num = n + 1
    offsets[objstm_num] = len(out)
    out += f"{objstm_num} 0 obj\n".encode()
    out += _stream_obj(
        f" /Type /ObjStm /N {len(packed)} /First {len(header)}",
        objstm_payload,
        True,
    )
    out += b"\nendobj\n"

    # XRef stream: entries for objects 0..n+2 (type-1 = byte offset)
    # then the packed objects (type-2 = (objstm, index)); W [1 2 1]
    xref_num = n + 2
    xref_pos = len(out)

    def entry(t: int, a: int, b: int) -> bytes:
        return bytes([t]) + a.to_bytes(2, "big") + bytes([b])

    rows = [entry(0, 0, 255)]  # free head
    for i in range(1, n + 2):
        rows.append(entry(1, offsets[i], 0))
    rows.append(entry(1, xref_pos, 0))
    index_pairs = f"0 {n + 3}"
    packed_index = []
    for ix, (num, _b) in enumerate(packed):
        packed_index.append((num, ix))
    packed_index.sort()
    # contiguous packed ranges appended to /Index
    for num, ix in packed_index:
        index_pairs += f" {num} 1"
        rows.append(entry(2, objstm_num, ix))
    xref_payload = b"".join(rows)
    out += f"{xref_num} 0 obj\n".encode()
    out += _stream_obj(
        f" /Type /XRef /Size {font_num + 1} /W [1 2 1]"
        f" /Index [{index_pairs}] /Root {cat_num} 0 R",
        xref_payload,
        True,
    )
    out += b"\nendobj\n"
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def make_two_column_pdf(col1: list[str], col2: list[str]) -> bytes:
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} {_PAGE_H}]"
            f" /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        ).encode(),
        _stream_obj("", _two_column_content_stream(col1, col2), False),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    return _assemble(objs)


# --- scanned (raster-only) pages -------------------------------------------


def render_scan_bitmap(text: str) -> tuple[int, int, bytes]:
    """Render text lines into a 1-bit row-padded bitmap in the synthetic
    5x7 font. Returns (width_px, height_px, packed_rows)."""
    lines = text.split("\n")
    ncols = max((len(ln) for ln in lines), default=0) or 1
    width = ncols * CELL_W
    height = len(lines) * CELL_H
    row_bytes = (width + 7) // 8
    buf = bytearray(row_bytes * height)
    for li, ln in enumerate(lines):
        for ci, ch in enumerate(ln):
            pat = CHAR_TO_PATTERN.get(ch)
            if pat is None:
                # unsupported char renders as an out-of-font pattern the
                # decoder maps to U+FFFD (all 35 bits set is not in the font)
                pat = (1 << 35) - 1
            if pat == 0:
                continue
            x0 = ci * CELL_W
            y0 = li * CELL_H
            for r, c in pattern_bits(pat):
                x = x0 + c
                y = y0 + r
                buf[y * row_bytes + (x >> 3)] |= 0x80 >> (x & 7)
    return width, height, bytes(buf)


def make_scanned_pdf(text: str, compress: bool = True) -> bytes:
    """Raster-only PDF (no text operators): one page, one 1-bit image
    XObject whose bitmap is the rendered text."""
    w, h, bitmap = render_scan_bitmap(text)
    content = f"q {w} 0 0 {h} 72 {720 - h} cm /Im0 Do Q".encode()
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {_PAGE_W} {_PAGE_H}]"
            f" /Resources << /XObject << /Im0 5 0 R >> >> /Contents 4 0 R >>"
        ).encode(),
        _stream_obj("", content, False),
        _stream_obj(
            (
                f" /Type /XObject /Subtype /Image /Width {w} /Height {h}"
                f" /ColorSpace /DeviceGray /BitsPerComponent 1"
            ),
            bitmap,
            compress,
        ),
    ]
    return _assemble(objs)
