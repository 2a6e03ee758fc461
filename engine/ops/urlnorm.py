"""URL canonicalization — pure JVM expressions (SURVEY.md §2 A10's
dedup key done right: re-crawls of the same resource differ by
fragment, tracking params, query order, host case and default ports;
canonicalizing before the per-url dedup makes those captures collide).

Everything is parse_url / regexp / array built-ins inside whole-stage
codegen: no Python, map-only, usable directly inside the extraction
pipeline's dedup key at 10^12 rows.

Normalizations applied (conservative set — nothing that can change
which resource the URL names):
  * strip the fragment (#...)
  * lowercase scheme and authority (host is case-insensitive)
  * drop default ports (:80 for http, :443 for https)
  * collapse duplicate slashes in the path, empty path -> "/"
  * drop tracking params (utm_*, fbclid, gclid, msclkid — pure
    click-attribution tokens; NOT `ref`, which selects content on
    some sites) — matched case-insensitively and with or without a
    value (`UTM_SOURCE=x` and a bare `utm_source` both count: query
    keys are conventionally case-insensitive for these trackers and
    a valueless token still carries no content) — then sort the
    surviving query params and drop an empty query
Non-http(s) or unparseable URLs pass through trimmed but otherwise
untouched (try_parse_url: malformed input yields NULL, never an ANSI
error).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

TRACKING_PARAM_RE = r"(?i)^(utm_[a-z0-9_]+|fbclid|gclid|msclkid)(=|$)"


def canonical_url_col(url_col: str = "url") -> Column:
    u = F.substring_index(F.trim(F.col(url_col)), "#", 1)  # defrag
    proto = F.lower(F.try_parse_url(u, F.lit("PROTOCOL")))
    # lowercase host(:port) only — userinfo (user@) is case-sensitive
    raw_auth = F.try_parse_url(u, F.lit("AUTHORITY"))
    hostport = F.lower(F.substring_index(raw_auth, "@", -1))
    userinfo = F.when(
        raw_auth.contains("@"),
        F.concat(F.substring_index(raw_auth, "@", 1), F.lit("@")),
    ).otherwise(F.lit(""))
    hostport = F.when(
        proto == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        proto == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)
    auth = F.concat(userinfo, hostport)
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    canon_q = F.concat_ws("&", params)
    rebuilt = F.concat(
        proto,
        F.lit("://"),
        auth,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(
            F.lit("")
        ),
    )
    return F.when(
        proto.isin("http", "https") & raw_auth.isNotNull(), rebuilt
    ).otherwise(F.trim(F.col(url_col)))
