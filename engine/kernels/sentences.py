"""Rule-based sentence boundary detection (SURVEY.md §2 A6).

Returns character-offset spans over *canonicalized* text (normalize.py).
Pure stdlib, deterministic; the spans feed the sentence-aware chunker
(chunker.py) whose boundaries must be exact (BASELINE.json:6).

Pinned rules:
  * A sentence ends at '.', '!', '?' or U+2026 '…' when followed by
    whitespace and then an uppercase letter, digit, or opening
    quote/bracket — or at end of text.
  * A newline always ends the current sentence (paragraph structure
    is authoritative after canonicalization).
  * Protected (never split after): known abbreviations (e.g. `Dr.`,
    `e.g.`, `U.S.`), single-letter initials (`J.`), decimal numbers
    (`3.14`), ellipsis runs (`...` splits only after the last dot),
    and dots inside URL/email-like tokens (no whitespace after dot).
  * Spans are [start, end) over the input string; leading/trailing
    whitespace is excluded from each span; empty spans never emitted.
"""

from __future__ import annotations

import re

# Lowercased abbreviation tokens (the token before the period, without
# the period itself). Frozen list — adding to it changes chunk goldens.
_ABBREVIATIONS = frozenset(
    {
        "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st",
        "vs", "etc", "e.g", "i.e", "cf", "al", "no", "nos",
        "fig", "figs", "eq", "eqs", "sec", "dept", "est", "approx",
        "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep",
        "sept", "oct", "nov", "dec", "u.s", "u.k", "u.n", "a.m", "p.m",
        "inc", "ltd", "co", "corp",
    }
)

_TERMINALS = ".!?…"
_OPENERS = "\"'‘“([{"


def _token_before(text: str, i: int) -> str:
    """The word-ish token ending at index i (exclusive), lowercased."""
    j = i
    while j > 0 and not text[j - 1].isspace():
        j -= 1
    return text[j:i].lower()


def _is_boundary(text: str, i: int) -> bool:
    """Is the terminal char at index i a sentence boundary?"""
    ch = text[i]
    n = len(text)
    # run of terminals: only the last one can be a boundary (ellipsis '...')
    if i + 1 < n and text[i + 1] in _TERMINALS:
        return False
    # closing quotes/brackets may follow the terminal; skip them
    k = i + 1
    while k < n and text[k] in "\"'’”)]}":
        k += 1
    if k >= n:
        return True
    if text[k] == "\n":
        return True  # newline split handled by caller too; boundary here
    if not text[k].isspace():
        return False  # e.g. dots inside URLs, 'example.com/x'
    # find the first non-space char after the gap
    m = k
    while m < n and text[m] == " ":
        m += 1
    if m >= n:
        return True
    nxt = text[m]
    if not (nxt.isupper() or nxt.isdigit() or nxt in _OPENERS):
        return False
    if ch == ".":
        tok = _token_before(text, i).lstrip("(\"'‘“[")
        if tok in _ABBREVIATIONS:
            return False
        # single-letter UPPERCASE initial: "J. Smith" (lowercase 'x.' splits)
        if len(tok) == 1 and tok.isalpha() and text[i - 1].isupper():
            return False
        # decimal number continued by digit is handled below via digits rule
        if tok and tok[-1].isdigit() and nxt.isdigit():
            return False
    return True


# jump between candidate chars instead of scanning every char in
# Python — behavior-identical (the per-char loop only ever acted on
# exactly this character class), ~5-10x faster on real pages
_CANDIDATE = re.compile(r"[\n.!?…]")


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """Split canonicalized text into sentence [start, end) spans."""
    spans: list[tuple[int, int]] = []
    n = len(text)
    start = 0
    for m in _CANDIDATE.finditer(text):
        i = m.start()
        ch = text[i]
        if ch == "\n":
            _emit(text, start, i, spans)
            start = i + 1
        else:
            # decimal number: '3.14' — dot between digits, never a boundary
            if (
                ch == "."
                and 0 < i < n - 1
                and text[i - 1].isdigit()
                and text[i + 1].isdigit()
            ):
                continue
            if _is_boundary(text, i):
                # include trailing closers in the sentence
                k = i + 1
                while k < n and text[k] in "\"'’”)]}":
                    k += 1
                _emit(text, start, k, spans)
                start = k
    _emit(text, start, n, spans)
    return spans


def _emit(text: str, start: int, end: int, spans: list[tuple[int, int]]) -> None:
    while start < end and text[start].isspace():
        start += 1
    while end > start and text[end - 1].isspace():
        end -= 1
    if end > start:
        spans.append((start, end))


def split_sentences(text: str) -> list[str]:
    return [text[a:b] for a, b in sentence_spans(text)]
