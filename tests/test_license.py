"""License-marker detection (engine/ops/license.py): ccREL semantics
pinned, rel-vs-bare signal precedence, permissive filter, map-only
plan."""

from __future__ import annotations

from engine.ops.license import detect_license, license_filter

PROSE = "<p>" + "Plenty of ordinary page content here. " * 5 + "</p>"


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode() if h is not None else None) for u, h in rows],
        "url string, html binary",
    )


def _detect(spark, html):
    df = _pages(spark, [("http://h/x", html)])
    r = detect_license(df).collect()[0]
    return r["license_code"], r["license_version"], r["license_rel"]


def test_rel_license_anchor_both_attribute_orders(spark):
    a = (
        "<html><body>" + PROSE
        + '<a rel="license" href="https://creativecommons.org/licenses/by-sa/4.0/">CC BY-SA</a>'
        + "</body></html>"
    )
    assert _detect(spark, a) == ("by-sa", "4.0", True)
    b = (
        "<html><body>" + PROSE
        + "<link href='http://creativecommons.org/licenses/by/3.0/' rel=license>"
        + "</body></html>"
    )
    assert _detect(spark, b) == ("by", "3.0", True)


def test_bare_cc_url_is_weak_signal(spark):
    h = (
        "<html><body>" + PROSE
        + '<a href="https://creativecommons.org/licenses/by-nc/4.0/">image credit</a>'
        + "</body></html>"
    )
    code, ver, rel = _detect(spark, h)
    assert (code, ver, rel) == ("by-nc", "4.0", False)


def test_publicdomain_and_no_marker_and_null_html(spark):
    h = (
        "<html><body>" + PROSE
        + '<a rel=license href="https://creativecommons.org/publicdomain/zero/1.0/">CC0</a>'
        + "</body></html>"
    )
    assert _detect(spark, h) == ("zero", "1.0", True)
    assert _detect(spark, "<html><body>" + PROSE + "</body></html>") == (
        None, None, None,
    )
    df = _pages(spark, [("http://h/n", None)])
    r = detect_license(df).collect()[0]
    assert r["license_code"] is None and r["license_rel"] is None


def test_rel_declaration_outranks_bare_url(spark):
    # page declares BY for itself but links an NC image credit
    h = (
        "<html><body>"
        + '<a href="https://creativecommons.org/licenses/by-nc/2.0/">someone else</a>'
        + PROSE
        + '<a rel="license" href="https://creativecommons.org/licenses/by/4.0/">this page</a>'
        + "</body></html>"
    )
    assert _detect(spark, h) == ("by", "4.0", True)


def test_license_filter_policies(spark):
    mk = lambda code, rel: (
        "<html><body>" + PROSE
        + ('<a rel="license" ' if rel else "<a ")
        + f'href="https://creativecommons.org/licenses/{code}/4.0/">L</a>'
        + "</body></html>"
    )
    df = _pages(
        spark,
        [
            ("http://h/1", mk("by", True)),
            ("http://h/2", mk("by-nc", True)),   # non-permissive
            ("http://h/3", mk("by-sa", False)),  # permissive, bare url
            ("http://h/4", "<html><body>" + PROSE + "</body></html>"),
        ],
    )
    strict = {r["url"] for r in license_filter(df).collect()}
    assert strict == {"http://h/1"}
    loose = {
        r["url"] for r in license_filter(df, require_rel=False).collect()
    }
    assert loose == {"http://h/1", "http://h/3"}


def test_plan_is_map_only(spark):
    from tests.test_plans import plan

    df = _pages(spark, [("http://h/x", "<html></html>")])
    p = plan(detect_license(df))
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
