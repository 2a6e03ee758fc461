"""B2+: WARC ingestion — read Common-Crawl-style web archives.

The input contract (`BASELINE.json:6,14`) is "Common-Crawl-style web
pages"; Common Crawl distributes those as WARC files (ISO 28500):
a sequence of records, each a header block + Content-Length-framed
payload, conventionally stored with ONE GZIP MEMBER PER RECORD so
readers can skip without decompressing everything. This module turns
a directory of `*.warc[.gz]` files into PAGES_SCHEMA rows:

    url      <- WARC-Target-URI
    warc_ts  <- WARC-Date (ISO 8601, UTC)
    html     <- HTTP response body (response/resource records),
                transfer-dechunked, raw bytes — charset handling stays
                downstream in the normalize kernel where it belongs
    text     <- payload of `conversion` records (WET plain text)
    lang     <- WARC-Identified-Content-Language (first tag), if any

Scale shape: a .warc.gz is splittable only at gzip-member boundaries,
which vanilla Spark cannot see, so parallelism is PER FILE — exactly
how Common Crawl shards a crawl (~64k files x ~1 GB), giving a
1000-executor cluster ample task granularity without a custom
InputFormat. `spark.read.format("binaryFile")` ships whole files to
executors; ONE `mapInPandas` pass parses records out of each file
(pure-Python, stdlib-only, deterministic). No shuffle anywhere: the
scan IS the job.

Parsing is tolerant per the WARC ethos (crawls contain garbage): a
record that cannot be framed ends that file's parse (framing is
byte-offset arithmetic — past a corrupt length field every subsequent
offset is noise); a record whose HTTP payload is malformed degrades
to the raw payload bytes rather than being dropped.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

_CRLF2 = b"\r\n\r\n"
_WANTED_TYPES = {"response", "resource", "conversion"}


# ---------------------------------------------------------------- parse

def _split_head(block: bytes) -> tuple[bytes, bytes] | None:
    """Split a header block from its body at the first blank line
    (tolerating bare-LF producers)."""
    i = block.find(_CRLF2)
    j = block.find(b"\n\n")
    if i == -1 and j == -1:
        return None
    if i == -1 or (j != -1 and j < i):
        return block[:j], block[j + 2 :]
    return block[:i], block[i + 4 :]


def _parse_headers(head: bytes) -> dict[str, str]:
    """Case-insensitive header dict from a WARC/HTTP header block.
    Duplicate names keep the FIRST value (deterministic; duplicates
    in the wild are crawler noise)."""
    out: dict[str, str] = {}
    for line in head.split(b"\n")[1:]:  # [0] is the version/status line
        line = line.rstrip(b"\r")
        k, sep, v = line.partition(b":")
        if not sep:
            continue
        key = k.strip().decode("latin-1").lower()
        if key not in out:
            out[key] = v.strip().decode("latin-1")
    return out


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer encoding; malformed input
    degrades to the raw bytes (never raises)."""
    out = io.BytesIO()
    pos = 0
    try:
        while True:
            nl = body.index(b"\n", pos)
            size_tok = body[pos:nl].strip().split(b";", 1)[0]
            size = int(size_tok, 16)
            if size == 0:
                return out.getvalue()
            start = nl + 1
            out.write(body[start : start + size])
            pos = start + size
            # skip the CRLF that closes the chunk
            while pos < len(body) and body[pos : pos + 1] in (b"\r", b"\n"):
                pos += 1
                if body[pos - 1 : pos] == b"\n":
                    break
    except (ValueError, IndexError):
        return body


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope from a response record's
    payload; degrade to raw payload when it isn't HTTP-shaped."""
    if not payload.startswith(b"HTTP/"):
        return payload
    split = _split_head(payload)
    if split is None:
        return payload
    head, body = split
    hdrs = _parse_headers(head)
    if "chunked" in hdrs.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    # Content-Encoding (real CC archives routinely store gzip/deflate
    # bodies verbatim): inflate so the html column carries the actual
    # document, not compressed bytes that would decode to mojibake
    # downstream (review r3). Unknown codings (br/zstd — no codec in
    # the stdlib) and corrupt streams degrade to the raw body.
    ce = hdrs.get("content-encoding", "").lower().strip()
    if ce in ("gzip", "x-gzip"):
        try:
            body = gzip.decompress(body)
        except Exception:
            pass
    elif ce == "deflate":
        try:  # RFC-correct zlib wrapper first, then raw-deflate quirk
            body = zlib.decompress(body)
        except Exception:
            try:
                body = zlib.decompress(body, -zlib.MAX_WBITS)
            except Exception:
                pass
    return body


def _parse_ts(value: str) -> datetime | None:
    """WARC-Date: ISO 8601, spec-mandated UTC ('Z')."""
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    # emit naive-UTC: Spark's TimestampType via Arrow treats naive
    # datetimes as session-tz (pinned UTC engine-wide)
    return dt.astimezone(timezone.utc).replace(tzinfo=None)


def _maybe_gunzip(data: bytes) -> bytes:
    """Transparently inflate (multi-member) gzip; pass through plain
    WARC bytes. Framing below is offset arithmetic on the INFLATED
    stream, so member boundaries need not be tracked."""
    if data[:2] == b"\x1f\x8b":
        return gzip.decompress(data)
    return data


def parse_warc_bytes(data: bytes) -> Iterator[dict]:
    """Yield one dict per wanted record (response/resource/conversion):
    {url, warc_ts, html, text, lang}. Pure function of the bytes."""
    data = _maybe_gunzip(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            return  # lost framing — the rest of the file is noise
        head_end = data.find(_CRLF2, pos)
        sep_len = 4
        alt = data.find(b"\n\n", pos)
        if head_end == -1 or (alt != -1 and alt < head_end):
            head_end, sep_len = alt, 2
        if head_end == -1:
            return
        hdrs = _parse_headers(data[pos:head_end])
        try:
            clen = int(hdrs.get("content-length", ""))
        except ValueError:
            return
        body_start = head_end + sep_len
        payload = data[body_start : body_start + clen]
        pos = body_start + clen
        rtype = hdrs.get("warc-type", "").lower()
        if rtype not in _WANTED_TYPES:
            continue
        url = hdrs.get("warc-target-uri", "").strip("<>")
        if not url:
            continue
        ts = _parse_ts(hdrs.get("warc-date", ""))
        lang = hdrs.get("warc-identified-content-language")
        lang = lang.split(",")[0].strip() if lang else None
        if rtype == "conversion":  # WET plain text
            html, text = None, payload.decode("utf-8", "replace")
        else:
            html, text = _http_body(payload), None
        yield {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "text": text,
            "lang": lang,
        }


# ---------------------------------------------------------------- write
# Test/synth writer — spec-conformant output (one gzip member per
# record, the Common-Crawl storage convention) so the reader's
# multi-member path is exercised by every round-trip test.

def _record_bytes(
    rtype: str,
    url: str,
    ts: str,
    payload: bytes,
    extra: dict[str, str] | None = None,
) -> bytes:
    hdrs = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: " + ts.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    for k, v in (extra or {}).items():
        hdrs.append(f"{k}: {v}".encode())
    return b"\r\n".join(hdrs) + _CRLF2 + payload + _CRLF2


def http_response(body: bytes, ctype: str = "text/html") -> bytes:
    head = (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body


def write_warc_gz(path: str, records: list[dict]) -> None:
    """records: [{type, url, ts, payload, extra?}]; ts ISO-8601 'Z'."""
    with open(path, "wb") as f:
        for r in records:
            member = _record_bytes(
                r["type"], r["url"], r["ts"], r["payload"], r.get("extra")
            )
            f.write(gzip.compress(member, mtime=0))


# ---------------------------------------------------------------- spark

def read_warc(spark: SparkSession, input_dir: str) -> DataFrame:
    """Directory of *.warc / *.warc.gz -> PAGES_SCHEMA rows.

    binaryFile scan (no Python crossing for the read) -> one
    mapInPandas parse per file. Map-only plan; per-task memory is
    bounded by the largest single archive (the CC convention is ~1 GB
    compressed — size archives, not this reader).
    """
    import pandas as pd

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(input_dir)
        .select("path", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            for blob in pdf["content"]:
                rows = list(parse_warc_bytes(bytes(blob)))
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(
        parse,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
