"""WARC ingestion (engine/io/warc.py): parser + Spark reader.

Covers the framing/tolerance contract: multi-member gzip, CRLF and
bare-LF header blocks, chunked transfer decode, conversion (WET)
records, unwanted record types, lost framing, and the end-to-end
hand-off into build_extracted.
"""

import gzip
import os

import pytest

from engine.io.warc import (
    http_response,
    parse_warc_bytes,
    read_warc,
    write_warc_gz,
)

TS = "2017-03-22T17:04:32Z"


def _mk_records():
    html = (
        b"<html><body><p>Hello WARC world, this paragraph is long "
        b"enough to clear the main-content extractor's pinned "
        b"minimum-segment threshold.</p></body></html>"
    )
    return [
        {  # skipped: not a wanted type
            "type": "warcinfo",
            "url": "urn:warcinfo",
            "ts": TS,
            "payload": b"software: test\r\n",
        },
        {
            "type": "response",
            "url": "https://a.example/page",
            "ts": TS,
            "payload": http_response(html),
        },
        {  # skipped: request
            "type": "request",
            "url": "https://a.example/page",
            "ts": TS,
            "payload": b"GET /page HTTP/1.1\r\nHost: a.example\r\n\r\n",
        },
        {
            "type": "conversion",
            "url": "https://b.example/wet",
            "ts": "2018-01-05T00:00:01Z",
            "payload": "plain text wét".encode("utf-8"),
            "extra": {"WARC-Identified-Content-Language": "fra,eng"},
        },
        {
            "type": "resource",
            "url": "https://c.example/raw",
            "ts": TS,
            "payload": b"%PDF-1.4 fake",
        },
    ]


def test_roundtrip_multimember_gz(tmp_path):
    p = str(tmp_path / "t.warc.gz")
    write_warc_gz(p, _mk_records())
    rows = list(parse_warc_bytes(open(p, "rb").read()))
    assert [r["url"] for r in rows] == [
        "https://a.example/page",
        "https://b.example/wet",
        "https://c.example/raw",
    ]
    resp, wet, res = rows
    assert b"Hello WARC world" in resp["html"]
    assert resp["text"] is None and resp["lang"] is None
    assert resp["warc_ts"].isoformat() == "2017-03-22T17:04:32"
    assert wet["html"] is None and wet["text"] == "plain text wét"
    assert wet["lang"] == "fra"  # first tag only
    assert res["html"] == b"%PDF-1.4 fake"


def test_plain_uncompressed_and_bare_lf():
    # bare-LF producer: headers separated by \n, blank line \n\n
    payload = http_response(b"<p>lf</p>")
    rec = (
        "WARC/1.0\nWARC-Type: response\n"
        "WARC-Target-URI: https://lf.example/\n"
        f"WARC-Date: {TS}\nContent-Length: {len(payload)}\n\n"
    ).encode() + payload + b"\n\n"
    rows = list(parse_warc_bytes(rec))
    assert len(rows) == 1 and rows[0]["html"] == b"<p>lf</p>"


def test_chunked_transfer_decoded():
    from engine.io.warc import _record_bytes

    body = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"5\r\nHello\r\n7\r\n, chunk\r\n0\r\n\r\n"
    )
    raw = _record_bytes("response", "https://ch.example/", TS, body)
    rows = list(parse_warc_bytes(raw))
    assert rows[0]["html"] == b"Hello, chunk"


def test_malformed_http_degrades_to_raw_payload():
    raw_payload = b"HTTP/1.1 200 OK\r\nNo-Blank-Line-Ever"
    from engine.io.warc import _record_bytes

    raw = _record_bytes("response", "https://bad.example/", TS, raw_payload)
    rows = list(parse_warc_bytes(raw))
    assert rows[0]["html"] == raw_payload


def test_lost_framing_keeps_prior_records():
    from engine.io.warc import _record_bytes

    good = _record_bytes(
        "response", "https://ok.example/", TS, http_response(b"<p>ok</p>")
    )
    rows = list(parse_warc_bytes(good + b"GARBAGE NOT A WARC HEADER"))
    assert [r["url"] for r in rows] == ["https://ok.example/"]


def test_missing_url_or_bad_length_handled():
    from engine.io.warc import _record_bytes

    no_url = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: "
        + TS.encode()
        + b"\r\nContent-Length: 2\r\n\r\nab\r\n\r\n"
    )
    assert list(parse_warc_bytes(no_url)) == []
    bad_len = no_url.replace(b"Content-Length: 2", b"Content-Length: x")
    assert list(parse_warc_bytes(bad_len)) == []


@pytest.fixture(scope="module")
def spark():
    from engine.session import get_spark

    return get_spark(master="local[4]", shuffle_partitions=4)


def test_read_warc_spark_and_extract(spark, tmp_path):
    d = str(tmp_path / "drop")
    os.makedirs(d)
    write_warc_gz(os.path.join(d, "a.warc.gz"), _mk_records())
    write_warc_gz(
        os.path.join(d, "b.warc.gz"),
        [
            {
                "type": "response",
                "url": f"https://bulk.example/{i}",
                "ts": TS,
                "payload": http_response(
                    f"<html><body><p>Doc {i} body text, padded well past the extractor minimum-segment threshold.</p></body></html>".encode()
                ),
            }
            for i in range(20)
        ],
    )
    pages = read_warc(spark, d)
    rows = {r["url"]: r for r in pages.collect()}
    assert len(rows) == 23
    assert rows["https://a.example/page"]["html"] is not None
    assert rows["https://b.example/wet"]["lang"] == "fra"
    assert rows["https://b.example/wet"]["text"].startswith("plain text")
    # timestamps land as UTC session-tz values
    assert rows["https://a.example/page"]["warc_ts"].year == 2017

    # map-only plan: no Exchange anywhere in the scan+parse
    plan = pages._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # the hand-off: WARC rows drive the extraction pipeline directly
    from engine.pipeline import build_extracted

    extracted = build_extracted(pages)
    out = {r["url"]: r for r in extracted.collect()}
    assert out["https://a.example/page"]["path"] == "html"
    assert "Hello WARC world" in out["https://a.example/page"]["text"]
    assert out["https://c.example/raw"]["path"].startswith("pdf")


# ------------------------------------------------------------ property
# Writer -> parser round-trip over arbitrary payloads: framing is
# Content-Length arithmetic, so ANY byte payload (including ones
# containing "WARC/1.0", blank lines, or gzip magic) must survive.
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(max_examples=200, deadline=None)
    @given(
        payloads=st.lists(
            st.binary(min_size=0, max_size=400), min_size=1, max_size=8
        ),
        gz=st.booleans(),
    )
    def test_roundtrip_arbitrary_payload_bytes(payloads, gz, tmp_path_factory):
        import gzip as _gz

        from engine.io.warc import _record_bytes

        recs = [
            _record_bytes("resource", f"https://fuzz.example/{i}", TS, p)
            for i, p in enumerate(payloads)
        ]
        blob = b"".join(
            _gz.compress(r, mtime=0) if gz else r for r in recs
        )
        rows = list(parse_warc_bytes(blob))
        assert [r["url"] for r in rows] == [
            f"https://fuzz.example/{i}" for i in range(len(payloads))
        ]
        # resource payloads round-trip byte-identically
        assert [r["html"] for r in rows] == payloads


def test_content_encoding_gzip_and_deflate_inflated():
    # review r3: real CC archives store Content-Encoding'd bodies
    # verbatim; the reader must inflate them or the html column
    # carries compressed bytes
    import gzip as _gz
    import zlib as _zl

    from engine.io.warc import _record_bytes

    doc = b"<html><body>compressed page</body></html>"
    co = _zl.compressobj(wbits=-15)
    raw_deflate = co.compress(doc) + co.flush()
    cases = [
        (b"gzip", _gz.compress(doc)),
        (b"deflate", _zl.compress(doc)),  # RFC zlib wrapper
        (b"deflate", raw_deflate),        # raw-deflate server quirk
    ]
    for i, (ce, body) in enumerate(cases):
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Encoding: " + ce + b"\r\n\r\n" + body
        )
        raw = _record_bytes("response", f"https://ce{i}.example/", TS, payload)
        rows = list(parse_warc_bytes(raw))
        assert rows[0]["html"] == doc, (i, ce)
    # unknown coding degrades to raw bytes, never raises
    payload = b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nNOTBR"
    raw = _record_bytes("response", "https://br.example/", TS, payload)
    assert list(parse_warc_bytes(raw))[0]["html"] == b"NOTBR"
    # corrupt gzip degrades to raw bytes
    payload = b"HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n\x1f\x8bBAD"
    raw = _record_bytes("response", "https://cgz.example/", TS, payload)
    assert list(parse_warc_bytes(raw))[0]["html"] == b"\x1f\x8bBAD"


def test_ingest_stages_warc_once_per_run(spark, tmp_path, monkeypatch):
    """review r3: with --input-format warc and B commit batches the
    job re-parsed every archive B times. It now stages the parse to
    parquet once; batched and single-batch runs must agree and the
    staging dir must not outlive the run."""
    import argparse

    import jobs.ingest as ingest

    d = str(tmp_path / "drop")
    os.makedirs(d)
    write_warc_gz(
        os.path.join(d, "bulk.warc.gz"),
        [
            {
                "type": "response",
                "url": f"https://h{i % 7}.example/{i}",
                "ts": TS,
                "payload": http_response(
                    f"<html><body><p>Doc {i} body text, padded well past the extractor minimum-segment threshold.</p></body></html>".encode()
                ),
            }
            for i in range(30)
        ],
    )

    def args(out, batches):
        return argparse.Namespace(
            input=d,
            input_format="warc",
            output=out,
            run_id="rw",
            master="local[4]",
            shuffle_partitions=4,
            commit_batches=batches,
        )

    # count how many times the WARC parse actually runs
    import engine.io.warc as warcmod

    calls = {"n": 0}
    real = warcmod.read_warc

    def counting(spark_, path, **kw):
        calls["n"] += 1
        return real(spark_, path, **kw)

    monkeypatch.setattr(warcmod, "read_warc", counting)

    one = str(tmp_path / "one")
    ingest.run(args(one, 1))
    n_single = calls["n"]

    calls["n"] = 0
    many = str(tmp_path / "many")
    ingest.run(args(many, 4))
    assert calls["n"] == 1, "batched run must parse the archives once"
    assert n_single == 1
    assert not os.path.exists(os.path.join(many, "_staged_pages"))

    a = spark.read.parquet(one + "/extracted").drop("day", "pbucket")
    b = spark.read.parquet(many + "/extracted").drop("day", "pbucket")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
