"""Open-license marker detection (CC REL, ccREL W3C submission /
RFC 4946 rel="license"): tag every page with the Creative-Commons (or
public-domain) license its markup declares, so a corpus build can keep
an openly-licensed slice — the third leg of the respectful-corpus
story beside the robots.txt screen (engine/ops/robots.py) and the
meta-robots noindex screen (engine/pipeline.screen_noindex).

This detects MARKERS, not legal status: a page that displays someone
else's CC-licensed image also links creativecommons.org. The
rel="license" anchor/link (the ccREL mechanism — an explicit statement
about THIS page) therefore outranks a bare license URL anywhere in the
page, and the column records which signal fired so downstream policy
can choose its strictness.

Scale shape: ONE map-only pass, pure JVM codegen — UTF-8 lossy decode
of the html bytes (license URLs are ASCII, so charset damage elsewhere
in the page cannot corrupt the match) + two regexp_extracts. Zero
Python, zero shuffle, html never moves (plan-asserted in
tests/test_license.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# canonical CC path: /licenses/<code>/<version>/ or /publicdomain/<code>/
_CC_PATH = r"creativecommons\.org/(?:licenses|publicdomain)/([a-z][a-z\-\+]*)/([0-9]\.[0-9])?"
# a rel="license" anchor/link naming a CC url, either attribute order
_REL_FIRST = (
    r'(?i)<(?:a|link)\b[^>]*\brel\s*=\s*["\']?license["\']?[^>]*'
    r'\bhref\s*=\s*["\']?[^"\'<>]*' + _CC_PATH
)
_HREF_FIRST = (
    r'(?i)<(?:a|link)\b[^>]*\bhref\s*=\s*["\']?[^"\'<>]*'
    + _CC_PATH
    + r'[^>]*\brel\s*=\s*["\']?license["\']?'
)
_ANYWHERE = r"(?i)" + _CC_PATH

# the codes an "openly licensed, commercial-ok, no-copyleft-surprise"
# training slice usually keeps; callers can pass their own policy
PERMISSIVE = ("by", "by-sa", "zero", "mark", "publicdomain", "cc0")


def detect_license(
    pages: DataFrame,
    html_col: str = "html",
    out_prefix: str = "license",
) -> DataFrame:
    """pages + html binary -> pages + (<prefix>_code, <prefix>_version,
    <prefix>_rel) columns. code/version NULL when no CC marker exists;
    rel=True when an explicit rel="license" declaration fired (the
    trustworthy signal), False when only a bare CC url appeared
    somewhere in the page."""
    # lossy UTF-8: multibyte damage elsewhere cannot touch the ASCII
    # license markup; try_to_binary never raises on NULL html
    html = F.decode(
        F.coalesce(F.col(html_col), F.lit(b"")), "UTF-8"
    )
    rel_code = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(html, _REL_FIRST, 1), F.lit("")),
            F.nullif(F.regexp_extract(html, _HREF_FIRST, 1), F.lit("")),
        )
    )
    rel_ver = F.coalesce(
        F.nullif(F.regexp_extract(html, _REL_FIRST, 2), F.lit("")),
        F.nullif(F.regexp_extract(html, _HREF_FIRST, 2), F.lit("")),
    )
    any_code = F.lower(
        F.nullif(F.regexp_extract(html, _ANYWHERE, 1), F.lit(""))
    )
    any_ver = F.nullif(F.regexp_extract(html, _ANYWHERE, 2), F.lit(""))
    code = F.coalesce(rel_code, any_code)
    return (
        pages.withColumn(f"{out_prefix}_code", code)
        .withColumn(
            f"{out_prefix}_version", F.coalesce(rel_ver, any_ver)
        )
        .withColumn(
            f"{out_prefix}_rel",
            F.when(code.isNull(), F.lit(None).cast("boolean")).otherwise(
                rel_code.isNotNull()
            ),
        )
    )


def license_filter(
    pages: DataFrame,
    allowed: tuple[str, ...] = PERMISSIVE,
    require_rel: bool = True,
    html_col: str = "html",
) -> DataFrame:
    """Keep only pages declaring an allowed license (the
    openly-licensed-slice builder). require_rel=True trusts only
    explicit rel="license" declarations; False also accepts bare CC
    urls (higher recall, more false positives — disclosed trade-off)."""
    tagged = detect_license(pages, html_col=html_col)
    keep = F.col("license_code").isin(*allowed)
    if require_rel:
        keep = keep & F.col("license_rel")
    return tagged.filter(keep)
