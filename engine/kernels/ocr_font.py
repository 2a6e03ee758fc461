"""Deterministic synthetic 5x7 bitmap font shared by the scan renderer
(engine/synth/pdfgen.py) and the OCR decoder (engine/kernels/ocr.py).

SURVEY.md §2 A5: no tesseract exists in this environment, so the OCR
path ships a *real* decode — bit-pattern -> glyph-table lookup — over
a font whose glyph bitmaps are generated deterministically from the
codepoint via a splitmix64-style mixer. Production would swap a real
OCR engine in at the same kernel seam (engine/udfs.py ocr_udf);
nothing else changes. Glyph realism is irrelevant to the pipeline:
what is exercised is the decode, the grid layout, and byte-identity.

Charset: printable ASCII 0x21..0x7E. Space = all-zero cell (and any
all-zero cell decodes to space). All glyph patterns are verified
distinct and non-zero at import time.
"""

from __future__ import annotations

GLYPH_W = 5
GLYPH_H = 7
CELL_W = GLYPH_W + 1  # 1px inter-glyph gap
CELL_H = GLYPH_H + 1  # 1px inter-line gap
_BITS = GLYPH_W * GLYPH_H  # 35


def _mix(x: int) -> int:
    """splitmix64 finalizer (public domain constant set)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _glyph_pattern(codepoint: int) -> int:
    """35-bit non-zero pattern, unique per supported codepoint."""
    p = _mix(codepoint) & ((1 << _BITS) - 1)
    # ensure non-zero and embed the codepoint's low 7 bits so patterns
    # can never collide across the 94-char set
    p = (p & ~0x7F) | (codepoint & 0x7F) | (1 << (_BITS - 1))
    return p


CHARSET = "".join(chr(c) for c in range(0x21, 0x7F))

CHAR_TO_PATTERN: dict[str, int] = {ch: _glyph_pattern(ord(ch)) for ch in CHARSET}
CHAR_TO_PATTERN[" "] = 0
PATTERN_TO_CHAR: dict[int, str] = {p: ch for ch, p in CHAR_TO_PATTERN.items()}

assert len(PATTERN_TO_CHAR) == len(CHAR_TO_PATTERN), "glyph collision"


def pattern_bits(pattern: int):
    """Yield (row, col) of set pixels for a 35-bit pattern, row-major."""
    for r in range(GLYPH_H):
        for c in range(GLYPH_W):
            if pattern & (1 << (_BITS - 1 - (r * GLYPH_W + c))):
                yield r, c


def pattern_from_cell(get_pixel) -> int:
    """Rebuild the 35-bit pattern from a get_pixel(row, col) -> 0/1 fn."""
    p = 0
    for r in range(GLYPH_H):
        for c in range(GLYPH_W):
            p = (p << 1) | (1 if get_pixel(r, c) else 0)
    return p
