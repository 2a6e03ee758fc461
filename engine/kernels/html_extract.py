"""HTML main-content extraction — DOM boilerplate stripping
(SURVEY.md §2 A2; BASELINE.json:6 "trafilatura/readability-style
link-density and text-density heuristics").

Pure stdlib (`html.parser`), deterministic, total (never raises on
malformed input). The reference checkout is empty (SURVEY.md §0), so
this pinned spec defines "the reference extractor" for byte-identity;
goldens in tests/fixtures/html pin every rule.

Pinned algorithm:
  1. Hard-drop subtrees: structural boilerplate tags (_DROP_TAGS) and
     any element whose id/class matches _STOPWORD_RE.
  2. Segment the remaining text into blocks: a block-level element's
     direct text forms a segment; nested block elements flush the
     parent's pending text first, so document order is preserved.
     <br> contributes a newline inside its segment.
  3. Per segment record (order, tag, text, linked_chars) where
     linked_chars counts characters inside <a> descendants.
  4. Keep a segment iff, after whitespace-collapse:
       len(text) >= 25 and linked_chars/len(text) <= 0.45
     Headings (h1-h6) are kept iff 2 <= len <= 200, link_density
     < 0.2, AND at least one kept content segment follows them.
  5. Output = kept segment texts joined with "\n\n", then
     canonicalized (normalize.canonicalize).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from engine.kernels.normalize import canonicalize, decode_bytes

_DROP_TAGS = frozenset(
    {
        "script", "style", "noscript", "template", "svg", "math",
        "iframe", "form", "nav", "header", "footer", "aside",
        "button", "select", "option", "datalist", "head", "figure",
    }
)

_BLOCK_TAGS = frozenset(
    {
        "p", "div", "article", "section", "main", "body", "html",
        "td", "th", "li", "dd", "dt", "blockquote", "pre",
        "figcaption", "caption", "summary", "details", "center",
        "table", "tr", "ul", "ol", "dl", "tbody", "thead", "tfoot",
        "h1", "h2", "h3", "h4", "h5", "h6",
    }
)

_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

_VOID_TAGS = frozenset(
    {
        "br", "hr", "img", "input", "meta", "link", "area", "base",
        "col", "embed", "source", "track", "wbr", "param",
    }
)

_STOPWORD_RE = re.compile(
    r"comment|sidebar|side-bar|menu|footer|header|banner|breadcrumb"
    r"|\bnav\b|navbar|\bad\b|ad-|-ad\b|advert|sponsor|social|share"
    r"|sharing|related|widget|promo|popup|cookie|subscribe|newsletter"
    r"|masthead|pagination|disqus|byline-extra",
    re.IGNORECASE,
)

MIN_CONTENT_CHARS = 25
MAX_LINK_DENSITY = 0.45
MAX_HEADING_LINK_DENSITY = 0.2

_WS_RE = re.compile(r"\s+")


class _Segment:
    __slots__ = ("order", "tag", "parts", "linked")

    def __init__(self, order: int, tag: str):
        self.order = order
        self.tag = tag
        self.parts: list[str] = []
        self.linked = 0


class _Extractor(HTMLParser):
    """Single-pass segmenter; tolerant of unclosed/stray tags."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.segments: list[tuple[int, str, str, int]] = []
        self._order = 0
        self._drop = 0  # depth inside dropped subtrees
        self._a = 0  # depth inside <a>
        # element stack entries: (tag, dropped_here, is_block, is_a)
        self._stack: list[tuple[str, bool, bool, bool]] = []
        self._open: list[_Segment] = []  # open block segments

    # -- segment plumbing --
    def _flush_top(self) -> None:
        if not self._open:
            return
        seg = self._open[-1]
        if not seg.parts:  # nothing buffered: only the order advances
            seg.linked = 0
            seg.order = self._next_order()
            return
        # " ".join(split()) == _WS_RE.sub(" ", ...).strip(): verified
        # char-for-char over the BMP (same Py_UNICODE_ISSPACE set), ~3x faster
        text = " ".join("".join(seg.parts).split())
        if text:
            self.segments.append((seg.order, seg.tag, text, seg.linked))
        seg.parts = []
        seg.linked = 0
        seg.order = self._next_order()

    def _next_order(self) -> int:
        self._order += 1
        return self._order

    # -- parser callbacks --
    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            if tag == "br" and self._drop == 0 and self._open:
                self._open[-1].parts.append("\n")
            return
        dropped = False
        if self._drop == 0:
            if tag in _DROP_TAGS:
                dropped = True
            else:
                for k, v in attrs:
                    if v and k in ("id", "class", "role") and _STOPWORD_RE.search(v):
                        dropped = True
                        break
        if dropped or self._drop > 0:
            self._drop += 1
            self._stack.append((tag, True, False, False))
            return
        is_block = tag in _BLOCK_TAGS
        is_a = tag == "a"
        if is_block:
            self._flush_top()  # parent's pending text becomes its own segment
            self._open.append(_Segment(self._next_order(), tag))
        if is_a:
            self._a += 1
        self._stack.append((tag, False, is_block, is_a))

    def handle_startendtag(self, tag, attrs):
        if tag == "br" and self._drop == 0 and self._open:
            self._open[-1].parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        # fast path: well-nested end tag matches top of stack (== the
        # i = len-1 iteration of the general loop below, verbatim)
        if self._stack and self._stack[-1][0] == tag:
            t, was_drop, was_block, was_a = self._stack.pop()
            if was_drop or self._drop > 0:
                if self._drop > 0:
                    self._drop -= 1
                return
            if was_a and self._a > 0:
                self._a -= 1
            if was_block and self._open:
                self._flush_top()
                self._open.pop()
            return
        # find the matching open element; ignore stray end tags
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                # unwind everything above and including i
                for _ in range(len(self._stack) - i):
                    t, was_drop, was_block, was_a = self._stack.pop()
                    if was_drop or self._drop > 0:
                        if self._drop > 0:
                            self._drop -= 1
                        continue
                    if was_a and self._a > 0:
                        self._a -= 1
                    if was_block and self._open:
                        self._flush_top()
                        self._open.pop()
                return
        return  # stray </tag> with no open match: ignored

    def handle_data(self, data):
        if self._drop > 0 or not data:
            return
        if not self._open:  # text before any block: implicit root block
            self._open.append(_Segment(self._next_order(), "body"))
        seg = self._open[-1]
        seg.parts.append(data)
        if self._a > 0:
            seg.linked += len(" ".join(data.split()))

    def close_all(self):
        while self._stack:
            t, was_drop, was_block, was_a = self._stack.pop()
            if was_drop or self._drop > 0:
                if self._drop > 0:
                    self._drop -= 1
                continue
            if was_block and self._open:
                self._flush_top()
                self._open.pop()
        while self._open:
            self._flush_top()
            self._open.pop()


# ---------------------------------------------------------------------------
# Fast tokenizer: a lean transcription of html.parser's goahead(end=1)
# (convert_charrefs mode) that drives the SAME _Extractor handlers, so
# all segment/drop/link logic above stays the single source of truth.
# It uses the stdlib parser's own compiled regexes for the tolerant
# paths, adds a single-regex fast path for clean start tags, and skips
# what our extractor ignores (line/col tracking, comment/decl/pi
# callbacks, attr processing when no id/class/role can occur). The one
# construct not transcribed is the <![ marked section (_markupbase
# raises on unknown keywords) — _drive_fast returns False there and
# the caller re-runs the stdlib parser on a fresh extractor, which is
# byte-identical by construction. Differential fuzz in
# tests/test_kernels.py pins equality for everything else.
# ---------------------------------------------------------------------------

from html import unescape as _unescape  # noqa: E402
from html.parser import (  # noqa: E402  (stdlib's own tolerant regexes)
    attrfind_tolerant as _attrfind,
    endtagfind as _endtagfind,
    locatestarttagend_tolerant as _locatestart,
    tagfind_tolerant as _tagfind,
)

from _markupbase import _commentclose  # noqa: E402

# clean start tag: wellformed space-separated attrs, one '>'. For any
# string this matches, html.parser's locate+tagfind+attrfind pipeline
# consumes exactly the same span and takes the same starttag path.
_F_CLEAN_START = re.compile(
    r"<([a-zA-Z][-.a-zA-Z0-9:_]*)"
    r"((?:\s+[a-zA-Z_:][-.:a-zA-Z_0-9]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>'\"=`<]+))?)*)"
    r"\s*(/?)>"
)
_F_ATTR_HINT = re.compile(r"id|class|role", re.IGNORECASE)
_F_CDATA_END = {
    "script": re.compile(r"</\s*script\s*>", re.IGNORECASE),
    "style": re.compile(r"</\s*style\s*>", re.IGNORECASE),
}
_LETTERS_EQ_SLASH = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/"
)


def _parse_attrs(s: str, k: int, endpos: int) -> tuple[list, int]:
    """parse_starttag's attr loop, verbatim semantics."""
    attrs = []
    while k < endpos:
        m = _attrfind.match(s, k)
        if not m:
            break
        attrname, rest, attrvalue = m.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif (
            attrvalue[:1] == "'" == attrvalue[-1:]
            or attrvalue[:1] == '"' == attrvalue[-1:]
        ):
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = _unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = m.end()
    return attrs, k


def _drive_fast(p: _Extractor, s: str) -> bool:
    """Tokenize s, calling p.handle_*; False = bail to stdlib parser."""
    i, n = 0, len(s)
    handle_data = p.handle_data

    def endpath(i: int) -> int:
        # goahead's k<0 + end=True recovery: the unterminated construct
        # becomes data up to the next '>' (inclusive) or '<' (exclusive)
        k = s.find(">", i + 1)
        if k < 0:
            k = s.find("<", i + 1)
            if k < 0:
                k = i + 1
        else:
            k += 1
        txt = s[i:k]
        handle_data(_unescape(txt) if "&" in txt else txt)
        return k

    while i < n:
        j = s.find("<", i)
        if j < 0:
            j = n
        if i < j:
            txt = s[i:j]
            handle_data(_unescape(txt) if "&" in txt else txt)
            i = j
        if i == n:
            break
        nxt = s[i + 1] if i + 1 < n else ""
        if "a" <= nxt <= "z" or "A" <= nxt <= "Z":  # starttagopen is ASCII-only
            m = _F_CLEAN_START.match(s, i)
            if m:
                tag = m.group(1).lower()
                endpos = m.end()
                selfclose = m.group(3) == "/"
                region = m.group(2)
                if region and "=" in region and _F_ATTR_HINT.search(region):
                    # _tagfind consumes the post-name whitespace so the
                    # attrfind lookbehind sees it, exactly as stdlib
                    attrs, _ = _parse_attrs(s, _tagfind.match(s, i + 1).end(), endpos)
                else:
                    attrs = []
            else:
                # full parse_starttag transcription
                lm = _locatestart.match(s, i)
                jj = lm.end()
                nc = s[jj : jj + 1]
                if nc == ">":
                    endpos = jj + 1
                elif nc == "/":
                    if s.startswith("/>", jj):
                        endpos = jj + 2
                    else:
                        i = endpath(i)
                        continue
                elif nc == "" or nc in _LETTERS_EQ_SLASH:
                    i = endpath(i)
                    continue
                else:
                    endpos = jj if jj > i else i + 1
                nm = _tagfind.match(s, i + 1)
                tag = nm.group(1).lower()
                attrs, k = _parse_attrs(s, nm.end(), endpos)
                end = s[k:endpos].strip()
                if end not in (">", "/>"):
                    handle_data(s[i:endpos])  # raw, per parse_starttag
                    i = endpos
                    continue
                selfclose = end.endswith("/>")
            if selfclose:
                p.handle_startendtag(tag, attrs)
                i = endpos
                continue
            p.handle_starttag(tag, attrs)
            i = endpos
            cd = _F_CDATA_END.get(tag)
            if cd is not None:
                # CDATA mode: raw data until a clean end-tag token of
                # the same element (html.parser's interesting regex);
                # unterminated -> content silently discarded (goahead
                # breaks without emitting, and the end-path skips
                # cdata). Content is inside a dropped subtree either
                # way, so only the resume point and end tag matter.
                mm = cd.search(s, i)
                if mm is None:
                    i = n
                    break
                handle_data(s[i : mm.start()])
                p.handle_endtag(tag)
                i = mm.end()
            continue
        if nxt == "/":
            gt = s.find(">", i + 1)
            if gt < 0:
                i = endpath(i)
                continue
            gtpos = gt + 1
            em = _endtagfind.match(s, i)
            if em:
                p.handle_endtag(em.group(1).lower())
                i = em.end()
                continue
            nm = _tagfind.match(s, i + 2)
            if not nm:
                if s[i : i + 3] == "</>":
                    i = i + 3
                    continue
                # bogus comment: ends at first '>' after i+2
                pos = s.find(">", i + 2)
                if pos == -1:
                    i = endpath(i)
                    continue
                i = pos + 1
                continue
            p.handle_endtag(nm.group(1).lower())
            gt2 = s.find(">", nm.end())
            i = gt2 + 1 if gt2 >= 0 else gtpos
            continue
        if nxt == "!":
            if s.startswith("<!--", i):
                cm = _commentclose.search(s, i + 4)
                if not cm:
                    i = endpath(i)
                    continue
                i = cm.end()
                continue
            if s.startswith("<![", i):
                return False  # marked section: _markupbase exotica
            if s[i : i + 9].lower() == "<!doctype":
                gt = s.find(">", i + 9)
            else:  # bogus comment
                gt = s.find(">", i + 2)
            if gt == -1:
                i = endpath(i)
                continue
            i = gt + 1
            continue
        if nxt == "?":
            gt = s.find(">", i + 2)
            if gt < 0:
                i = endpath(i)
                continue
            i = gt + 1
            continue
        if nxt == "":
            handle_data("<")  # lone '<' at EOF: goahead's end block
            break
        handle_data("<")  # literal '<' before a non-construct char
        i += 1
    return True


def extract_segments(html_text: str) -> list[tuple[int, str, str, int]]:
    """(order, tag, collapsed_text, linked_chars) per block segment."""
    p = _Extractor()
    ok = False
    try:
        ok = _drive_fast(p, html_text)
    except Exception:
        ok = False
    if not ok:  # exotic construct: byte-identical stdlib path
        p = _Extractor()
        try:
            p.feed(html_text)
            p.close()
        except Exception:
            pass  # total function: salvage whatever was segmented
    p.close_all()
    return sorted(p.segments, key=lambda s: s[0])


def extract_main_text(html_text: str) -> str:
    """Main content of an HTML document per the pinned spec."""
    segs = extract_segments(html_text)
    keep_flags: list[bool] = []
    for _order, tag, text, linked in segs:
        if tag in _HEADING_TAGS:
            keep_flags.append(False)  # decided in second pass
            continue
        n = len(text)
        ld = linked / n if n else 1.0
        keep_flags.append(n >= MIN_CONTENT_CHARS and ld <= MAX_LINK_DENSITY)
    # second pass: headings kept only if kept content follows them
    any_following_content = False
    for i in range(len(segs) - 1, -1, -1):
        _order, tag, text, linked = segs[i]
        if tag in _HEADING_TAGS:
            n = len(text)
            ld = linked / n if n else 1.0
            keep_flags[i] = (
                any_following_content
                and 2 <= n <= 200
                and ld < MAX_HEADING_LINK_DENSITY
            )
        elif keep_flags[i]:
            any_following_content = True
    kept = [segs[i][2] for i in range(len(segs)) if keep_flags[i]]
    return canonicalize("\n\n".join(kept))


def extract_html(raw: bytes | None) -> str:
    """Kernel entrypoint: bytes -> main-content text (total function)."""
    return extract_main_text(decode_bytes(raw))
