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


# ---------------------------------------------------------------------------
# Batched numpy path: one vectorized pass over a WHOLE Arrow batch of
# documents (the same treatment minhash/simhash got — per-candidate
# Python in _sentence_spans_ascii was ~38% of single-core extraction).
#
# ASCII docs are joined with '\n' separators and scanned once. This is
# behavior-identical to per-doc processing because a '\n' is itself a
# hard boundary and _ASCII_AFTER's forward visibility never crosses a
# '\n' (its gap char is literal ' '), while the backward token scan
# stops at whitespace — so mid-doc candidates see identical bytes, and
# the end-of-doc alternatives (\Z, ' +\Z') produce, after whitespace
# strip, exactly the span the separator '\n' produces. The one true
# cross-doc read in the scalar spec — text[i-1] at i==0 wraps to the
# doc's LAST char (a pinned negative-index quirk in the digit rule) —
# is replicated explicitly. Differentially fuzzed against the scalar
# path in scripts/fuzz_sentences.py and tests/test_kernels.py.
# ---------------------------------------------------------------------------

def _abbr_codes():
    import numpy as np

    # every abbreviation is <= 6 ASCII bytes -> pack little-endian into
    # int64 and match candidates with one np.isin
    return np.array(
        sorted(int.from_bytes(t.encode(), "little") for t in _ABBREVIATIONS),
        dtype=np.int64,
    )


_ABBR_CODES_NP = None

# module-level workspaces: on this host, FIRST-TOUCH pages of a fresh
# large allocation cost ~7ms/MB (microVM page-fault path), so the two
# full-buffer masks are written into reused buffers (np.take out=) and
# everything else operates on small candidate/whitespace-position
# arrays via searchsorted -- no full-length int64 temporaries at all.
_WS_BUFS: dict = {}


def _ws_buf(name: str, size: int, dtype):
    import numpy as np

    b = _WS_BUFS.get(name)
    if b is None or b.size < size:
        _WS_BUFS[name] = b = np.empty(max(size * 5 // 4, 1 << 16), dtype)
    return b[:size]


_TBL_CAND = None
_TBL_WS = None


def _init_tables():
    import numpy as np

    global _TBL_CAND, _TBL_WS, _ABBR_CODES_NP
    _TBL_CAND = np.zeros(256, np.uint8)
    _TBL_CAND[[10, 33, 46, 63]] = 1  # \n ! . ?
    _TBL_WS = np.zeros(256, np.uint8)
    # exactly the ASCII bytes str.isspace() accepts
    _TBL_WS[[9, 10, 11, 12, 13, 28, 29, 30, 31, 32]] = 1
    _ABBR_CODES_NP = _abbr_codes()


def _spans_ascii_batch_np(texts: list[str]) -> list[list[tuple[int, int]]]:
    import numpy as np

    if _TBL_CAND is None:
        _init_tables()

    joined = "\n".join(texts) + "\n"
    arr = np.frombuffer(joined.encode("ascii"), dtype=np.uint8)
    n = arr.size
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    doc_starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]

    # full-buffer masks via comparison chains into reused bool
    # workspaces: measured 5-10x faster than np.take on this host
    # (gather is slow; streaming compare+or runs at memory speed)
    m1 = _ws_buf("m1", n, bool)
    m2 = _ws_buf("m2", n, bool)
    np.equal(arr, 46, out=m1)  # .
    np.equal(arr, 33, out=m2)  # !
    np.logical_or(m1, m2, out=m1)
    np.equal(arr, 63, out=m2)  # ?
    np.logical_or(m1, m2, out=m1)
    np.equal(arr, 10, out=m2)  # \n
    np.logical_or(m1, m2, out=m1)
    cand = np.flatnonzero(m1)
    # ASCII str.isspace() bytes: 9-13 and 28-32 (two contiguous runs)
    m3 = _ws_buf("m3", n, bool)
    np.less_equal(arr, 13, out=m1)
    np.greater_equal(arr, 9, out=m2)
    np.logical_and(m1, m2, out=m1)
    np.less_equal(arr, 32, out=m2)
    np.greater_equal(arr, 28, out=m3)
    np.logical_and(m2, m3, out=m2)
    np.logical_or(m1, m2, out=m2)
    wpos = np.flatnonzero(m2)  # sorted whitespace positions
    # wd[t] = wpos[t] - t is constant within a consecutive ws run and
    # non-decreasing overall -> run start/end by searchsorted
    wd = wpos - np.arange(wpos.size, dtype=np.int64)

    ch = arr[cand]
    is_nl = ch == 10
    nl_pos = cand[is_nl]
    term = cand[~is_nl]
    tch = ch[~is_nl]

    # forward classification (buffer always ends '\n', so term+1 < n,
    # and c1==' ' implies term+2 < n)
    c1 = arr[term + 1]
    c2 = arr[np.minimum(term + 2, n - 1)]
    closers = np.array([34, 39, 41, 93, 125], dtype=np.uint8)  # " ' ) ] }
    openers = np.array([34, 39, 40, 91, 123], dtype=np.uint8)  # " ' ( [ {
    c2_class = (
        ((c2 >= 65) & (c2 <= 90))
        | ((c2 >= 48) & (c2 <= 57))
        | np.isin(c2, openers)
    )
    simple_nl = c1 == 10
    simple_sp = (c1 == 32) & (c2 != 32)
    rare = np.isin(c1, closers) | ((c1 == 32) & (c2 == 32))

    bnd = simple_nl | (simple_sp & c2_class)
    end = (term + 1).copy()
    # nxt char for the digit rule: only the ' +(class)' alternative
    # captures one (0 = None)
    nxt = np.where(simple_sp & c2_class, c2, np.uint8(0))

    if rare.any():
        # closers after terminal / multi-space gap: exact regex at
        # those few positions (canonicalized text collapses space
        # runs, so this path is cold in production)
        match_after = _ASCII_AFTER.match
        for k in np.flatnonzero(rare).tolist():
            m2 = match_after(joined, int(term[k]) + 1)
            if m2 is None:
                continue
            bnd[k] = True
            end[k] = m2.end()
            g = m2.group(1)
            nxt[k] = ord(g) if g is not None else 0

    # '.'-only suppression rules on boundary candidates
    dot = bnd & (tch == 46)
    if dot.any():
        dpos = term[dot]
        # token start = one past the last ws before the dot
        r = np.searchsorted(wpos, dpos)
        j = np.where(r > 0, wpos[np.maximum(r - 1, 0)] + 1, 0)
        # lstrip leading openers ( " ' [  (scalar spec strips exactly these)
        tok_openers = np.array([40, 34, 39, 91], dtype=np.uint8)
        while True:
            step = (j < dpos) & np.isin(arr[np.minimum(j, n - 1)], tok_openers)
            if not step.any():
                break
            j = j + step
        tlen = dpos - j
        suppress = np.zeros(dpos.size, dtype=bool)
        short = (tlen > 0) & (tlen <= 6)
        if short.any():
            offs = np.arange(6, dtype=np.int64)
            gi = np.minimum(j[:, None] + offs[None, :], n - 1)
            b6 = np.where(offs[None, :] < tlen[:, None], arr[gi], 0).astype(
                np.int64
            )
            b6 = np.where((b6 >= 65) & (b6 <= 90), b6 + 32, b6)
            codes = (b6 << (8 * offs)[None, :]).sum(axis=1)
            suppress |= short & np.isin(codes, _ABBR_CODES_NP)
        tok0 = arr[np.minimum(j, n - 1)]
        suppress |= (tlen == 1) & (tok0 >= 65) & (tok0 <= 90)
        # digit rule — like every token rule it is gated on a NON-EMPTY
        # stripped token (the scalar spec's `if j < i:` block), so
        # text[i-1] is always the token's last char, never out of range
        prevb = arr[np.maximum(dpos - 1, 0)]
        nxtb = nxt[dot]
        suppress |= (
            (tlen > 0)
            & ((prevb >= 48) & (prevb <= 57))
            & ((nxtb >= 48) & (nxtb <= 57))
        )
        keep = np.ones(term.size, dtype=bool)
        keep[np.flatnonzero(dot)[suppress]] = False
        bnd &= keep

    # merge newline boundaries (end=i, next=i+1) and terminal
    # boundaries (end=next=end[k]) in position order
    t_pos = term[bnd]
    t_end = end[bnd]
    all_pos = np.concatenate((nl_pos, t_pos))
    all_end = np.concatenate((nl_pos, t_end))
    all_nxt = np.concatenate((nl_pos + 1, t_end))
    order = np.argsort(all_pos, kind="stable")
    all_end = all_end[order]
    all_nxt = all_nxt[order]

    # segments: [start_k, end_k) with start_0=0, start_{k+1}=nxt_k
    seg_s = np.concatenate(([0], all_nxt))
    seg_e = np.concatenate((all_end, [n]))

    # whitespace strip via ws-run lookup (no full-buffer scans):
    # start: if seg_s is ws, jump to one past the end of its ws run
    rs = np.searchsorted(wpos, seg_s)
    rs_c = np.minimum(rs, max(wpos.size - 1, 0))
    s_ws = (rs < wpos.size) & (wpos[rs_c] == seg_s)
    run_end = np.searchsorted(wd, seg_s - rs, side="right")
    a = np.where(s_ws, wpos[np.maximum(run_end - 1, 0)] + 1, seg_s)
    # end: if seg_e-1 is ws, pull back to the first ws of its run
    e1 = seg_e - 1
    re_ = np.searchsorted(wpos, e1)
    re_c = np.minimum(re_, max(wpos.size - 1, 0))
    e_ws = (seg_e > 0) & (re_ < wpos.size) & (wpos[re_c] == e1)
    run_start = np.searchsorted(wd, e1 - re_, side="left")
    b = np.where(e_ws, wpos[np.minimum(run_start, max(wpos.size - 1, 0))], seg_e)
    ok = a < b
    a, b = a[ok], b[ok]

    # split spans per doc (a span's start is non-ws, so it lies inside
    # exactly one doc; separators are ws)
    doc_of = np.searchsorted(doc_starts, a, side="right") - 1
    a_loc = (a - doc_starts[doc_of]).tolist()
    b_loc = (b - doc_starts[doc_of]).tolist()
    counts = np.bincount(doc_of, minlength=len(texts))
    out: list[list[tuple[int, int]]] = []
    p = 0
    for c in counts.tolist():
        out.append(list(zip(a_loc[p : p + c], b_loc[p : p + c])))
        p += c
    return out


def sentence_spans_batch(texts: list) -> list[list[tuple[int, int]]]:
    """Batched sentence_spans: one numpy pass for all ASCII docs in the
    batch, general per-doc path for the rest. Bit-identical to calling
    sentence_spans per document (fuzz-pinned)."""
    out: list = [None] * len(texts)
    ascii_ix: list[int] = []
    ascii_txt: list[str] = []
    for k, t in enumerate(texts):
        t = t or ""
        if t.isascii():
            ascii_ix.append(k)
            ascii_txt.append(t)
        else:
            out[k] = _sentence_spans_general(t)
    if ascii_txt:
        for k, spans in zip(ascii_ix, _spans_ascii_batch_np(ascii_txt)):
            out[k] = spans
    return out
