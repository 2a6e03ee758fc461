"""Media router (SURVEY.md §2 A1).

Classifies each payload into one of three extraction paths by content
sniffing — never by URL suffix:

  * ``pdf_text`` — bytes start with %PDF- and the text layer shows at
    least MIN_TEXT_LAYER_CHARS characters of text operators;
  * ``pdf_ocr``  — %PDF- magic but an empty/low text layer (scanned
    page: "OCR fallback", BASELINE.json:6);
  * ``html``     — everything else with a non-empty payload;
  * ``error``    — null/empty payload.

The expensive probe (text_layer_coverage) only runs on PDF-magic rows;
the Spark plan applies it via a pandas UDF after a cheap
``substring(html, 1, 5)`` prefilter so the TB-scale HTML majority
never pays for PDF parsing (SURVEY.md §2 A1 "routing via one `path`
column, not three filtered scans").
"""

from __future__ import annotations

from engine.kernels.pdf_textlayer import is_pdf, text_layer_coverage

PATH_HTML = "html"
PATH_PDF_TEXT = "pdf_text"
PATH_PDF_OCR = "pdf_ocr"
PATH_ERROR = "error"

MIN_TEXT_LAYER_CHARS = 1


def route(raw: bytes | None) -> str:
    if raw is None or len(raw) == 0:
        return PATH_ERROR
    if is_pdf(raw):
        if text_layer_coverage(raw) >= MIN_TEXT_LAYER_CHARS:
            return PATH_PDF_TEXT
        return PATH_PDF_OCR
    return PATH_HTML
