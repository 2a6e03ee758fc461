"""PDF text-layer extraction (SURVEY.md §2 A4).

Parses the well-defined PDF subset our corpus generator emits
(engine/synth/pdfgen.py) — xref-table PDFs, FlateDecode or plain
content streams, text operators Tj/TJ/'/\"/Td/TD/Tm/T*/TL — and
reassembles page text in reading order. Pure stdlib (re + zlib),
total (returns "" on any malformed input), deterministic.

Pinned reading-order spec:
  * Runs are recorded at their text-line origin (x, y).
  * Column band = x // 300 (two-column fixture places col2 at x>=300).
  * Order: column band asc, then y desc (top-to-bottom), then x asc,
    then emission order.
  * Runs sharing (band, y) form one line; consecutive runs on a line
    are joined with a single space (distinct runs at the same y are
    separate positioned fragments).
  * Inside a TJ array, strings concatenate; a kerning number <=
    WORD_GAP_KERN (-180) inserts a single space; larger (less
    negative) numbers are glyph kerning and insert nothing.
  * Pages join with a blank line ("\\n\\n"); output is canonicalized
    (normalize.canonicalize).
"""

from __future__ import annotations

import re
import zlib

from engine.kernels.normalize import canonicalize

WORD_GAP_KERN = -180.0
COLUMN_BAND_PX = 300

_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_KIDS_RE = re.compile(rb"/Kids\s*\[([^\]]*)\]")
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+0\s+R")
_FLATE_RE = re.compile(rb"/Filter\s*/FlateDecode")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\x08",
    b"f": b"\x0c", b"(": b"(", b")": b")", b"\\": b"\\",
}


def is_pdf(raw: bytes | None) -> bool:
    return raw is not None and raw[:5] == b"%PDF-"


def parse_objects(raw: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """obj_num -> (dict_and_body, decoded_stream_or_None)."""
    objs: dict[int, tuple[bytes, bytes | None]] = {}
    for m in _OBJ_RE.finditer(raw):
        num = int(m.group(1))
        body = m.group(2)
        stream = None
        sm = _STREAM_RE.search(body)
        if sm:
            data = sm.group(1)
            if _FLATE_RE.search(body[: sm.start()]):
                try:
                    data = zlib.decompress(data)
                except zlib.error:
                    data = b""
            stream = data
        objs[num] = (body, stream)
    return objs


def page_content_streams(raw: bytes) -> list[bytes]:
    """Content streams in page-tree order; [] if structure is absent."""
    objs = parse_objects(raw)
    pages_order: list[int] = []
    for num, (body, _s) in sorted(objs.items()):
        if b"/Type" in body and b"/Pages" in body:
            km = _KIDS_RE.search(body)
            if km:
                pages_order = [int(r) for r in _REF_RE.findall(km.group(1))]
                break
    if not pages_order:  # fall back: any /Type /Page objects in num order
        pages_order = [
            num
            for num, (body, _s) in sorted(objs.items())
            if re.search(rb"/Type\s*/Page\b", body)
        ]
    streams: list[bytes] = []
    for pnum in pages_order:
        if pnum not in objs:
            continue
        cm = _CONTENTS_RE.search(objs[pnum][0])
        if not cm:
            continue
        cnum = int(cm.group(1))
        if cnum in objs and objs[cnum][1] is not None:
            streams.append(objs[cnum][1])
    return streams


# --- content-stream tokenizer ----------------------------------------------


def _read_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at data[i] == '('."""
    # fast path: no escapes and no nesting before the closing paren —
    # the bytes up to it ARE the string (identical to what the loop
    # below would produce); covers the vast majority of real strings
    j = data.find(b")", i + 1)
    if j != -1:
        seg = data[i + 1 : j]
        if b"\\" not in seg and b"(" not in seg:
            return seg, j + 1
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n and depth > 0:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # octal \ddd
                j = i + 1
                oct_digits = b""
                while j < n and len(oct_digits) < 3 and data[j : j + 1].isdigit():
                    oct_digits += data[j : j + 1]
                    j += 1
                out.append(int(oct_digits, 8) & 0xFF)
                i = j
            elif nxt == b"\n":
                i += 2  # line continuation
            else:
                out += nxt
                i += 2
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth > 0:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


# single master scanner (alternation order == the old per-byte
# dispatch priority). Each match consumes any leading whitespace PLUS
# one token, so whitespace runs never cost a Python loop iteration;
# the common escape-free literal string is matched in C (group 'str'
# captures the inner bytes), with _read_string as the fallback for
# strings containing '\\' or nested parens (group 'lparen').
# Matching at a position (re.match(data, i)) avoids per-token
# data[i:] slice copies — semantics pinned by the PDF goldens and a
# full-corpus differential check.
_TOKEN_RE = re.compile(
    rb"[ \t\r\n\x0c\x00]*"
    rb"(?:\((?P<str>[^()\\]*)\)"
    rb"|(?P<arro>\[)"
    rb"|(?P<arrc>\])"
    rb"|(?P<name>/[^\s\[\]()<>/]*)"
    rb"|(?P<hex><[^>]*>?)"
    rb"|(?P<num>[+-]?(?:\d+\.?\d*|\.\d+))"
    rb"|(?P<op>[A-Za-z'\"*]+)"
    rb"|(?P<lparen>\())"
)


def extract_page_runs(stream: bytes) -> list[tuple[float, float, int, str]]:
    """(x, y, seq, text) for each text-showing op in one content stream.

    The tokenizer loop from tokenize() is fused inline: profiling showed
    ~40% of kernel time was generator yield overhead at ~half a million
    tokens per bench batch. Token semantics are identical (same master
    regex, same dispatch priority); equality vs the generator-driven
    version is pinned by the PDF goldens and a differential check over
    the full synthetic corpus.
    """
    runs: list[tuple[float, float, int, str]] = []
    stack: list = []
    in_array: list | None = None
    line_x = line_y = 0.0
    leading = 0.0
    seq = 0

    data = stream
    i, n = 0, len(data)
    match = _TOKEN_RE.match
    while i < n:
        m = match(data, i)
        if m is None:
            i += 1  # unknown byte: skip
            continue
        g = m.lastgroup
        i = m.end()
        if g == "num":
            v = float(m.group("num"))
            if in_array is not None:
                in_array.append(("num", v))
            else:
                stack.append(("num", v))
        elif g == "str":  # escape-free literal string, matched in C
            s = m.group("str")
            if in_array is not None:
                in_array.append(("str", s))
            else:
                stack.append(("str", s))
        elif g == "lparen":  # string with escapes/nesting: slow path
            s, i = _read_string(data, m.start("lparen"))
            if in_array is not None:
                in_array.append(("str", s))
            else:
                stack.append(("str", s))
        elif g == "arro":
            in_array = []
        elif g == "arrc":
            stack.append(("arr", in_array))
            in_array = None
        elif g == "name":
            stack.append(("name", m.group("name")))
        elif g == "op":
            op = m.group("op")
            if op == b"Td" or op == b"TD":
                if len(stack) >= 2:
                    ty = _num(stack[-1])
                    tx = _num(stack[-2])
                    line_x += tx
                    line_y += ty
                    if op == b"TD":
                        leading = -ty
            elif op == b"Tm":
                if len(stack) >= 6:
                    line_y = _num(stack[-1])
                    line_x = _num(stack[-2])
            elif op == b"T*":
                line_y -= leading
            elif op == b"TL":
                if stack:
                    leading = _num(stack[-1])
            elif op == b"Tj":
                if stack and stack[-1][0] == "str":
                    text = stack[-1][1].decode("latin-1")
                    if text:
                        runs.append((line_x, line_y, seq, text))
                        seq += 1
            elif op == b"'":
                line_y -= leading
                if stack and stack[-1][0] == "str":
                    text = stack[-1][1].decode("latin-1")
                    if text:
                        runs.append((line_x, line_y, seq, text))
                        seq += 1
            elif op == b'"':
                line_y -= leading
                if stack and stack[-1][0] == "str":
                    text = stack[-1][1].decode("latin-1")
                    if text:
                        runs.append((line_x, line_y, seq, text))
                        seq += 1
            elif op == b"TJ":
                if stack and stack[-1][0] == "arr":
                    parts: list[str] = []
                    for k, v in stack[-1][1]:
                        if k == "str":
                            parts.append(v.decode("latin-1"))
                        elif k == "num" and v <= WORD_GAP_KERN:
                            parts.append(" ")
                    text = "".join(parts)
                    if text:
                        runs.append((line_x, line_y, seq, text))
                        seq += 1
            elif op == b"BT":
                line_x = line_y = 0.0
            stack.clear()
    return runs


def _num(tok) -> float:
    return tok[1] if tok[0] == "num" else 0.0


def assemble_page_text(runs: list[tuple[float, float, int, str]]) -> str:
    """Reading order: column band, y desc, x asc, emission order."""
    if not runs:
        return ""
    keyed = sorted(
        runs, key=lambda r: (int(r[0] // COLUMN_BAND_PX), -r[1], r[0], r[2])
    )
    lines: list[str] = []
    cur_key: tuple[int, float] | None = None
    cur_parts: list[str] = []
    for x, y, _seq, text in keyed:
        key = (int(x // COLUMN_BAND_PX), y)
        if key != cur_key:
            if cur_parts:
                lines.append(" ".join(cur_parts))
            cur_parts = []
            cur_key = key
        cur_parts.append(text)
    if cur_parts:
        lines.append(" ".join(cur_parts))
    return "\n".join(lines)


def extract_pdf_text(raw: bytes | None) -> str:
    """Kernel entrypoint: PDF bytes -> canonicalized text-layer text."""
    if not is_pdf(raw):
        return ""
    try:
        pages = [
            assemble_page_text(extract_page_runs(s))
            for s in page_content_streams(raw)
        ]
    except Exception:
        return ""
    return canonicalize("\n\n".join(p for p in pages if p))


def text_layer_coverage(raw: bytes | None) -> int:
    """Cheap probe for the media router: number of text-layer chars
    that survive canonicalization. 0 on raster-only or malformed PDFs
    (-> OCR path). Counting canonicalized chars (not str.strip, which
    keeps C0/C1 controls) keeps this probe's >=1 decision exactly
    equivalent to "extract_pdf_text(raw) is non-empty" — the fused
    route_extract_udf routes on that equivalence, so a control-chars-
    only text layer goes to OCR under BOTH routers."""
    if not is_pdf(raw):
        return 0
    from engine.kernels.normalize import canonicalize

    try:
        total = 0
        for s in page_content_streams(raw):
            for _x, _y, _q, t in extract_page_runs(s):
                total += len(canonicalize(t))
        return total
    except Exception:
        return 0
