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


def extract_segments(html_text: str) -> list[tuple[int, str, str, int]]:
    """(order, tag, collapsed_text, linked_chars) per block segment."""
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
