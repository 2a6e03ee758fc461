"""Outlink extraction: the hyperlinks a page points at.

The link structure of a crawl is a first-class quality signal for a
web-text training pipeline: Common Crawl publishes host-level webgraph
releases, and centrality over that graph (PageRank / harmonic) is a
standard document-quality prior (cf. Brin & Page 1998; the CC webgraph
datasets). This kernel produces the raw edges; the graph aggregation
and centrality live in engine/ops/linkgraph.py.

Pinned semantics (deterministic, pure function of (page_url, bytes)):
  * `<a href=...>` values only (not link/img/script — those are
    resources, not citations).
  * relative hrefs are resolved against the PAGE url with stdlib
    urljoin; scheme-less network-path refs (//host/x) inherit the
    page scheme.
  * only http/https results survive (javascript:, mailto:, data:,
    ftp: dropped); fragments (#...) are stripped; whitespace trimmed.
  * anchor text (extract_anchors) is the character data between <a>
    and its close — whitespace-collapsed, capped at MAX_ANCHOR_CHARS;
    the first occurrence of a url keeps its anchor; an unclosed <a>
    is closed implicitly by the next <a> or end of document.
  * order-preserving dedup, capped at `max_links` DISTINCT links —
    link farms must not blow up the edge table (the cap is the
    disclosed recall bound; CC's own host graph applies the same
    discipline).
  * charset handling reuses the pinned decoder
    (engine/kernels/normalize.decode_bytes); malformed HTML yields
    whatever was parsed before the breakage (total function).
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit, urlunsplit

DEFAULT_MAX_LINKS = 100
MAX_ANCHOR_CHARS = 256


class _Done(Exception):
    """Raised to stop parsing once max_links distinct links are seen."""


class _LinkParser(HTMLParser):
    """Collects (resolved url, anchor text) pairs. Anchor text is the
    character data between <a> and its close (whitespace-collapsed,
    capped at MAX_ANCHOR_CHARS); the FIRST occurrence of a url keeps
    its anchor. A new <a> implicitly closes an unclosed one (the
    html.parser leniency the extraction kernels already pin)."""

    def __init__(self, base_url: str, max_links: int) -> None:
        super().__init__(convert_charrefs=True)
        self._base = base_url
        self._max = max_links
        self.links: list[tuple[str, str]] = []
        self._seen: set[str] = set()
        self._open: str | None = None  # url of the <a> being read
        self._parts: list[str] = []

    def _finish(self) -> None:
        if self._open is not None:
            anchor = " ".join("".join(self._parts).split())[:MAX_ANCHOR_CHARS]
            self.links.append((self._open, anchor))
            self._open = None
            self._parts = []
            if len(self.links) >= self._max:
                raise _Done

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag != "a":
            return
        self._finish()  # implicit close of a dangling <a>
        href = next((v for k, v in attrs if k == "href"), None)
        if not href:
            return
        href = href.strip()
        if not href or href.startswith("#"):
            return
        try:
            resolved = urljoin(self._base, href)
            parts = urlsplit(resolved)
        except ValueError:
            return
        if parts.scheme not in ("http", "https") or not parts.netloc:
            return
        # strip the fragment; keep query (distinct pages on many sites)
        url = urlunsplit((parts.scheme, parts.netloc, parts.path, parts.query, ""))
        if url in self._seen:
            return
        self._seen.add(url)
        self._open = url

    def handle_endtag(self, tag: str) -> None:
        if tag == "a":
            self._finish()

    def handle_data(self, data: str) -> None:
        if self._open is not None:
            self._parts.append(data)


def extract_anchors(
    page_url: str | None,
    raw: bytes | None,
    max_links: int = DEFAULT_MAX_LINKS,
) -> list[tuple[str, str]]:
    """Distinct resolved http(s) outlinks with their anchor text,
    document order, capped at max_links. [] on empty/None input."""
    if not raw or not page_url:
        return []
    from engine.kernels.normalize import decode_bytes

    text = decode_bytes(raw)
    if not text:
        return []
    p = _LinkParser(page_url, max_links)
    try:
        p.feed(text)
        p.close()
        p._finish()  # a document ending inside <a> keeps the link
    except _Done:
        pass
    except Exception:
        pass  # keep what was parsed (total function)
    return p.links


def extract_outlinks(
    page_url: str | None,
    raw: bytes | None,
    max_links: int = DEFAULT_MAX_LINKS,
) -> list[str]:
    """Distinct resolved http(s) outlinks of the page, document order,
    capped at max_links. [] on empty/None/non-HTML-looking input."""
    return [u for u, _ in extract_anchors(page_url, raw, max_links)]
