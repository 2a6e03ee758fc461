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

# ASCII fast path: on `text.isascii()` input the forward checks of
# _is_boundary (terminal-run rule, closers skip, space gap, next-char
# class) collapse into ONE anchored regex match, because every
# character-class predicate has an exact ASCII spelling:
#   * `…` and the unicode closers ’ ” / openers ‘ “ cannot occur;
#   * str.isspace() on ASCII is precisely re `\s` (the ten chars
#     \x09-\x0d, \x1c-\x1f, \x20 agree);
#   * isupper/isdigit are [A-Z]/[0-9].
# Matched at i+1 (just past the terminal): consumes the closers run
# (span end = m.end(); the lookahead is zero-width), succeeds iff the
# position is a boundary per the forward rules, captures the next
# significant char (group 1) for the digit-digit rule. A terminal
# directly followed by another terminal fails automatically (the
# second terminal is neither closer, \Z, \n, nor space). `\Z` not
# `$`: `$` would also match before a trailing '\n', where the general
# path says "next char is not upper/digit/opener -> no boundary".
# Scanning stays on the cheap candidate jump (a backtracking
# `\S*[.!?]` scan pattern measured 3.8x SLOWER than the per-candidate
# anchored match — greedy token backtracking is O(len^2) per token).
_ASCII_CANDIDATE = re.compile(r"[\n.!?]")
_ASCII_AFTER = re.compile(
    r"[\"')\]}]*(?=\Z|\n| +\Z| +([A-Z0-9\"'(\[{]))"
)


def _sentence_spans_ascii(text: str) -> list[tuple[int, int]]:
    spans: list[tuple[int, int]] = []
    n = len(text)
    start = 0
    match_after = _ASCII_AFTER.match
    for m in _ASCII_CANDIDATE.finditer(text):
        i = m.start()
        ch = text[i]
        if ch == "\n":
            end = i
            nxt_start = i + 1
        else:
            m2 = match_after(text, i + 1)
            if m2 is None:
                continue
            if ch == ".":
                # exact fast form of: tok = _token_before(text, i)
                #   .lstrip("(\"'[") + the three token rules. The
                # slice/lower/hash is built ONLY when the stripped
                # token is short enough (<= 6 chars = len('approx'))
                # to possibly be an abbreviation; the digit rule needs
                # just the last char, which is text[i-1].
                j = i
                while j > 0 and not text[j - 1].isspace():
                    j -= 1
                while j < i and text[j] in "(\"'[":
                    j += 1  # lstrip of leading openers
                if j < i:  # non-empty stripped token
                    if i - j <= 6:
                        tok = text[j:i].lower()
                        if tok in _ABBREVIATIONS:
                            continue
                        if i - j == 1 and tok.isalpha() and text[i - 1].isupper():
                            continue
                    nxt = m2.group(1)
                    if text[i - 1].isdigit() and nxt is not None and nxt.isdigit():
                        continue
            end = m2.end()  # after trailing closers
            nxt_start = end
        # inline _emit([start, end))
        while start < end and text[start].isspace():
            start += 1
        while end > start and text[end - 1].isspace():
            end -= 1
        if end > start:
            spans.append((start, end))
        start = nxt_start
    # tail segment
    end = n
    while start < end and text[start].isspace():
        start += 1
    while end > start and text[end - 1].isspace():
        end -= 1
    if end > start:
        spans.append((start, end))
    return spans


def sentence_spans(text: str) -> list[tuple[int, int]]:
    """Split canonicalized text into sentence [start, end) spans."""
    if text.isascii():
        return _sentence_spans_ascii(text)
    return _sentence_spans_general(text)


def _sentence_spans_general(text: str) -> list[tuple[int, int]]:
    """Reference implementation (any input; the ASCII fast path is
    differentially fuzzed against this — scripts/fuzz_sentences.py)."""
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
