"""Deterministic synthetic Common-Crawl-style pages corpus
(SURVEY.md §7 M2; FIXTURES.md §1).

Every row is a pure function of (seed, i): no wall clock, no global
RNG, no dict-order dependence — so any scale factor regenerates
identically, on any executor, in any partition order. That property
is what lets the test suite assert byte-identical extraction across
parallelism levels (local[8] vs local[32]) and resumed runs.

Media mix per FIXTURES.md §1: ~80% HTML, ~12% text-layer PDFs,
~5% raster-only scans (OCR path), ~3% null/garbage (error path).
Hosts are drawn log-uniform from 1,000 hosts (zipf-ish skew — a few
hosts dominate, exercising salting A13); ~2% of urls repeat with a
later warc_ts (exercising per-url latest-capture dedup A10).

Generation is distributed: gen_pages_df builds the corpus with
spark.range(n) + mapInPandas so bench-scale corpora are produced in
parallel — the same pattern a 10^12-row backfill would use.
"""

from __future__ import annotations

import datetime as dt
import math

from engine.synth.pdfgen import make_scanned_pdf, make_text_pdf

SEED = 42
N_HOSTS = 1000
BASE_TS = dt.datetime(2025, 1, 1, 0, 0, 0)
SPAN_SECONDS = 30 * 24 * 3600

PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

_MASK = 0xFFFFFFFFFFFFFFFF


def _mix(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


class _Rng:
    """Tiny splitmix64 stream keyed by (seed, i)."""

    __slots__ = ("state",)

    def __init__(self, seed: int, i: int):
        self.state = _mix((seed << 32) ^ (i & _MASK))

    def next(self) -> int:
        self.state = _mix(self.state ^ 0xD1B54A32D192ED03)
        return self.state

    def uniform(self) -> float:
        return (self.next() >> 11) / float(1 << 53)

    def randint(self, lo: int, hi: int) -> int:  # inclusive
        return lo + self.next() % (hi - lo + 1)

    def choice(self, seq):
        return seq[self.next() % len(seq)]


_WORDS = {
    "en": (
        "the of and to in is that it was for on are as with they at be this have "
        "from or had by not but what all were when we there can an your which said "
        "time people water long day way thing world life hand part child eye place "
        "work week case point company number group problem fact night area money "
        "story quality market history question business service power change"
    ).split(),
    "fr": (
        "le la les de des du un une et en est que qui dans pour sur avec ne pas ce "
        "cette il elle nous vous ils au aux par plus mais ou si leur son temps monde "
        "vie main enfant oeil lieu travail semaine cas point nombre groupe question "
        "histoire nuit argent affaire service pouvoir marche societe probleme"
    ).split(),
    "es": (
        "el la los las de del un una y en es que se no por con para su al lo como "
        "pero sus le ya este porque entre cuando muy sin sobre tiempo mundo vida "
        "mano parte nino ojo lugar trabajo semana caso punto numero grupo problema "
        "noche zona dinero historia pregunta negocio servicio poder cambio"
    ).split(),
    "de": (
        "der die das und ist in den von zu mit sich des auf nicht ein eine als auch "
        "es an werden aus er hat dass sie nach wird bei einer um am sind noch wie "
        "zeit welt leben hand teil kind auge ort arbeit woche fall punkt zahl gruppe "
        "problem nacht geld geschichte frage geschaeft dienst macht wandel"
    ).split(),
    "zh": list("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下以生会自着去之过家学对可她里后小么心多天而能好都然没日于起还发成事"),
}

_LANGS = ("en", "en", "en", "en", "en", "fr", "fr", "es", "es", "de", "de", "zh", "zh")


def _sentence(rng: _Rng, lang: str) -> str:
    words = _WORDS[lang]
    n = rng.randint(6, 18)
    toks = [rng.choice(words) for _ in range(n)]
    if lang == "zh":
        body = "".join(toks)
        return body + "。"
    toks[0] = toks[0].capitalize()
    return " ".join(toks) + rng.choice((".", ".", ".", "!", "?"))


def _paragraph(rng: _Rng, lang: str) -> str:
    return " ".join(_sentence(rng, lang) for _ in range(rng.randint(3, 10)))


def _host(rng: _Rng) -> str:
    # log-uniform rank in [1, N_HOSTS]: heavy head, long tail
    k = int(math.exp(rng.uniform() * math.log(N_HOSTS))) or 1
    return f"host{k:04d}.example.com"


def _html_doc(rng: _Rng, lang: str, paras: list[str], title: str) -> bytes:
    nav = '<nav><a href="/">Home</a> <a href="/a">Alpha</a> <a href="/b">Beta</a></nav>'
    aside = '<aside class="sidebar">Related promo links and teasers</aside>'
    footer = "<footer>Copyright 2025 example.com. All rights reserved.</footer>"
    comments = (
        '<div id="comments"><p>First! Great long comment text that must be '
        "stripped by the extractor stop-word rule entirely.</p></div>"
        if rng.uniform() < 0.3
        else ""
    )
    linkfarm = (
        '<div><a href="/1">Partner one link</a> <a href="/2">Partner two link</a> '
        '<a href="/3">Partner three link</a></div>'
        if rng.uniform() < 0.3
        else ""
    )
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    script = "<script>var tracking = 'never-in-output';</script>"
    return (
        f"<html><head><title>{title}</title></head><body>{nav}{script}"
        f"<article><h1>{title}</h1>\n{body}\n</article>{linkfarm}{comments}"
        f"{aside}{footer}</body></html>"
    ).encode("utf-8")


def page_row(seed: int, i: int) -> tuple[str, dt.datetime, bytes | None, str | None, str]:
    """The pure generator: (url, warc_ts, html, text, lang) for row i."""
    rng = _Rng(seed, i)
    lang = _LANGS[rng.next() % len(_LANGS)]
    host = _host(rng)
    ts = BASE_TS + dt.timedelta(seconds=rng.next() % SPAN_SECONDS)

    # ~2% re-crawls: row i clones row (i - i%53) 's url with a later ts
    if i % 53 == 7 and i >= 53:
        base = i - 7
        burl, _bts, bhtml, btext, blang = page_row(seed, base)
        return (burl, ts + dt.timedelta(seconds=1 + i % 97), bhtml, btext, blang)

    url = f"https://{host}/{lang}/page-{i}"
    media = rng.uniform()
    title_words = _sentence(rng, "en").rstrip(".!?")

    if media < 0.80:  # HTML — CC-realistic size: tens of KB of markup
        paras = [_paragraph(rng, lang) for _ in range(rng.randint(10, 50))]
        html = _html_doc(rng, lang, paras, title_words)
        text = "\n".join(paras) if rng.uniform() < 0.7 else None
        return (url, ts, html, text, lang)
    if media < 0.92:  # text-layer PDF (latin-script langs only)
        plang = lang if lang != "zh" else "en"
        npages = rng.randint(2, 5)
        pages = []
        for _p in range(npages):
            lines = [_sentence(rng, plang) for _ in range(rng.randint(8, 25))]
            pages.append("\n".join(lines))
        pdf = make_text_pdf(pages, compress=(rng.next() % 2 == 0))
        return (url, ts, pdf, None, plang)
    if media < 0.97:  # raster-only scan (ASCII font -> uppercase en)
        lines = [_sentence(rng, "en").upper() for _ in range(rng.randint(2, 8))]
        scan = make_scanned_pdf("\n".join(lines))
        return (url, ts, scan, None, "en")
    # error path: null or garbage payload
    if rng.next() % 2 == 0:
        return (url, ts, None, None, lang)
    return (url, ts, bytes([rng.next() % 251 for _ in range(64)]), None, lang)


def gen_pages_pandas(seed: int, start: int, end: int):
    """Rows [start, end) as a pandas DataFrame (driver-side / tests)."""
    import pandas as pd

    rows = [page_row(seed, i) for i in range(start, end)]
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


def gen_pages_df(spark, n: int, seed: int = SEED, partitions: int | None = None):
    """Distributed corpus: spark.range + mapInPandas (scale path).

    spark.range(0, p, 1, p) pins EXACTLY one chunk id per partition —
    a hash repartition of the chunk ids (the previous approach)
    collides for small p, yielding uneven multi-chunk partitions and
    empty ones; written as parquet those become uneven single-row-
    group files, and since a row group is the atomic scan-split unit,
    the resulting skewed scan caps wide-parallelism extraction at the
    largest file. Content is a pure function of (seed, row id) —
    independent of `partitions`."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    partitions = max(1, min(partitions, n))

    def gen(batches):
        for pdf in batches:
            for k in pdf["id"]:
                k = int(k)
                yield gen_pages_pandas(
                    seed, k * n // partitions, (k + 1) * n // partitions
                )

    bdf = spark.range(0, partitions, 1, partitions)
    return bdf.mapInPandas(gen, PAGES_SCHEMA_DDL)
