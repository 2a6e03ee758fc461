"""Generate the pinned kernel golden fixtures (FIXTURES.md §2).

Run ONCE (then commit): inputs are handwritten here; expected outputs
are computed by the kernels, eyeballed, and frozen. After committing,
any kernel change that alters bytes fails tests/test_kernels.py —
that is the point (byte-identity, BASELINE.json:14).

Usage: python scripts/make_fixtures.py
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from engine.kernels.chunker import chunk_text
from engine.kernels.html_extract import extract_html
from engine.kernels.ocr import extract_ocr_text
from engine.kernels.pdf_textlayer import extract_pdf_text
from engine.synth.pdfgen import (
    make_filtered_pdf,
    make_scanned_pdf,
    make_text_pdf,
    make_two_column_pdf,
    make_xrefstream_pdf,
)

ROOT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures"

LONG_P1 = (
    "This is the first paragraph of the article body, long enough to clear the "
    "minimum-content threshold comfortably and stand on its own."
)
LONG_P2 = (
    "The second paragraph continues the story with additional sentences. "
    "It includes punctuation, numbers like 42, and keeps a healthy text density."
)
LONG_P3 = (
    "A closing paragraph wraps up the piece and thanks the reader for their time "
    "and attention to this synthetic but plausible article."
)

HTML_CASES: dict[str, bytes] = {
    "basic_article.html": f"""<html><head><title>Site Title</title></head><body>
<header><a href="/">Home</a> <a href="/about">About</a></header>
<nav><ul><li><a href="/a">Alpha</a></li><li><a href="/b">Beta</a></li></ul></nav>
<article>
<h1>A Plausible Headline</h1>
<p>{LONG_P1}</p>
<p>{LONG_P2}</p>
<p>{LONG_P3}</p>
</article>
<aside>Related links and promos that must vanish entirely.</aside>
<footer>Copyright 2025 Example Corp. All rights reserved.</footer>
</body></html>""".encode(),
    "link_farm.html": f"""<html><body>
<div class="content"><p>{LONG_P1}</p></div>
<div><a href="/1">First partner site link</a> <a href="/2">Second partner site link</a>
<a href="/3">Third partner site link</a> <a href="/4">Fourth partner site link</a>
<a href="/5">Fifth partner site link</a> and barely any prose.</div>
</body></html>""".encode(),
    "comments_section.html": f"""<html><body>
<article><p>{LONG_P1}</p></article>
<div id="comments"><p>A sufficiently long comment that would otherwise count as
content but must be dropped by the id stop-word rule.</p></div>
<div class="comment-list"><p>Another long comment block under a class stop-word
that also needs to disappear from the extraction output.</p></div>
</body></html>""".encode(),
    "nested_tables.html": f"""<html><body>
<table><tr><td class="menu"><a href="/x">X</a><a href="/y">Y</a></td>
<td><table><tr><td><p>{LONG_P1}</p><p>{LONG_P2}</p></td></tr></table></td>
<td width="20%">Short ad text</td></tr></table>
</body></html>""".encode(),
    "meta_charset_latin1.html": (
        '<html><head><meta charset="iso-8859-1"></head><body>'
        "<p>Caf\xe9 cr\xe8me br\xfbl\xe9e \xe0 la fran\xe7aise, served daily in "
        "the caf\xe9 around the corner from the mus\xe9e.</p>"
        "</body></html>"
    ).encode("latin-1"),
    "bom_utf8.html": "﻿<html><body><p>A BOM-prefixed document whose "
    "byte-order mark must be stripped before parsing begins.</p></body></html>".encode(
        "utf-8-sig"
    ),
    "inline_noise.html": f"""<html><body>
<p>Before the noise {LONG_P1}</p>
<script>var x = "should never appear";</script>
<style>.c {{ color: red }}</style>
<!-- an HTML comment that must not leak -->
<noscript>Enable JavaScript please</noscript>
<p>After the noise {LONG_P2}</p>
</body></html>""".encode(),
    "malformed.html": f"""<html><body>
<div><p>{LONG_P1}
<p>{LONG_P2}</div></span></div>
<p>Unclosed final paragraph that still carries enough text to be kept
""".encode(),
    "empty.html": b"",
    "whitespace_only.html": b"   \n\t  \n ",
    "short_boilerplate_only.html": b"""<html><body>
<nav><a href="/">Home</a></nav><footer>(c) 2025</footer>
</body></html>""",
}

PDF_CASES: dict[str, bytes] = {
    "single_page_tj.pdf": make_text_pdf(
        ["Hello PDF world\nThe second line of page one\nAnd a third line"],
        compress=False,
    ),
    "multipage.pdf": make_text_pdf(
        [
            "Page one opening line\nPage one second line",
            "Page two content here\nStill page two",
            "Page three finale",
        ],
        compress=False,
    ),
    "tj_kerning_array.pdf": make_text_pdf(
        ["zero", "one", "two", "kerned words join here\nsecond kerned line"],
        compress=False,
    ),
    "flate_stream.pdf": make_text_pdf(
        ["Compressed stream content line\nDeflated second line"], compress=True
    ),
    "two_column.pdf": make_two_column_pdf(
        ["Left column first line", "Left column second line"],
        ["Right column first line", "Right column second line"],
    ),
    "empty_textlayer.pdf": make_scanned_pdf("NO TEXT LAYER HERE"),
    # r4 filter-widening family (VERDICT r3 next #6): ASCIIHexDecode,
    # LZWDecode, a [/ASCIIHexDecode /LZWDecode] filter ARRAY, and a
    # PDF 1.5 xref-STREAM document (page dicts inside /Type /ObjStm)
    "ascii_hex_stream.pdf": make_filtered_pdf(
        ["Hex encoded stream line\nHexadecimal second line"], "hex"
    ),
    "lzw_stream.pdf": make_filtered_pdf(
        ["LZW encoded stream line\nCompressed dictionary words words"],
        "lzw",
    ),
    "lzw_hex_array_stream.pdf": make_filtered_pdf(
        ["Filter array content here\nDecoded right to left"], "lzw+hex"
    ),
    "xref_stream.pdf": make_xrefstream_pdf(
        [
            "Cross reference stream page one\nSecond line of page one",
            "Object stream packed page two",
        ]
    ),
}

OCR_CASES: dict[str, bytes] = {
    "scan_clean.pdf": make_scanned_pdf(
        "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG 0123456789"
    ),
    "scan_multiline.pdf": make_scanned_pdf(
        "FIRST LINE OF THE SCAN\nSECOND LINE FOLLOWS\n\nNEW PARAGRAPH AFTER GAP"
    ),
    "scan_unknown_glyph.pdf": make_scanned_pdf("KNOWN É TEXT"),
}

CHUNK_CASES: dict[str, tuple[str, int]] = {
    # name -> (text, max_chars)
    "exact_boundary": ("A" * 56 + ". " + "B" * 40 + ".", 58),
    "overlong_sentence": (
        "Short lead. " + "x" * 200 + " keeps going without a terminal until here. Tail.",
        80,
    ),
    "overlap_start_end": (
        "One two three. Four five six. Seven eight nine. Ten eleven twelve.",
        35,
    ),
    "abbreviation_traps": (
        "See e.g. Dr. No. 3.14 and U.S. data. Next sentence starts here. Done.",
        45,
    ),
    "url_email": (
        "Visit https://example.com/a.b.c for info. Mail me at a.b@test.org today. Bye.",
        50,
    ),
    "empty_doc": ("", 100),
    "one_sentence": ("Just one sentence here.", 100),
}


def main() -> None:
    for sub in ("html", "pdf", "ocr", "chunks", "expected"):
        (ROOT / sub).mkdir(parents=True, exist_ok=True)

    for name, data in HTML_CASES.items():
        (ROOT / "html" / name).write_bytes(data)
        out = extract_html(data)
        (ROOT / "expected" / f"{name}.txt").write_text(out, encoding="utf-8")
        print(f"html/{name}: {out[:60]!r}")

    for name, data in PDF_CASES.items():
        (ROOT / "pdf" / name).write_bytes(data)
        out = extract_pdf_text(data)
        (ROOT / "expected" / f"{name}.txt").write_text(out, encoding="utf-8")
        print(f"pdf/{name}: {out[:60]!r}")

    for name, data in OCR_CASES.items():
        (ROOT / "ocr" / name).write_bytes(data)
        out = extract_ocr_text(data)
        (ROOT / "expected" / f"{name}.txt").write_text(out, encoding="utf-8")
        print(f"ocr/{name}: {out[:60]!r}")

    chunk_golden = {}
    for name, (text, max_chars) in CHUNK_CASES.items():
        chunks = chunk_text(text, max_chars=max_chars)
        chunk_golden[name] = {
            "text": text,
            "max_chars": max_chars,
            "chunks": [
                [c.chunk_ix, c.char_start, c.char_end, c.sent_start, c.sent_end]
                for c in chunks
            ],
        }
        print(f"chunks/{name}: {len(chunks)} chunks")
    (ROOT / "chunks" / "golden.json").write_text(
        json.dumps(chunk_golden, indent=1, sort_keys=True), encoding="utf-8"
    )


if __name__ == "__main__":
    main()
