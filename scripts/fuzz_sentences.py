"""Differential fuzz: _sentence_spans_ascii vs _sentence_spans_general.

The ASCII fast path (engine/kernels/sentences.py) must return
byte-identical spans to the general (reference) implementation on any
ASCII input — chunk boundaries and n_sents derive from it, and the
whole engine's byte-identity contract sits on top (BASELINE.json:14).

Corpus sources:
  1. every extracted text from the first N synthetic pages (all three
     media paths), plus each text re-joined with edge separators;
  2. adversarial generated strings over a grammar of the exact token
     classes the splitter branches on (abbreviations, initials,
     decimals, closers/openers, terminal runs, control whitespace,
     tabs/CR/FF, URLs, empty tokens);
  3. random slicings of (2) to hit mid-token starts/ends.

Non-ASCII inputs take the general path by construction (sentence_spans
dispatches on text.isascii()), so ASCII equivalence is total coverage.
"""

from __future__ import annotations

import itertools
import random
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from engine.kernels.sentences import (  # noqa: E402
    _sentence_spans_ascii,
    _sentence_spans_general,
    sentence_spans_batch,
)

_ALL_CASES: list[str] = []


def check(text: str, where: str) -> None:
    assert text.isascii(), where
    a = _sentence_spans_ascii(text)
    b = _sentence_spans_general(text)
    if a != b:
        print(f"MISMATCH [{where}]: {text!r}")
        print(f"  fast: {a}")
        print(f"  slow: {b}")
        raise SystemExit(1)
    _ALL_CASES.append(text)


def check_batched(rng: random.Random) -> int:
    """Replay every scalar-checked case through sentence_spans_batch in
    random batch groupings — the joined-buffer numpy path must be span-
    identical to per-doc processing (doc-boundary rules, negative-index
    digit quirk, workspace reuse across calls)."""
    cases = list(_ALL_CASES)
    rng.shuffle(cases)
    i = 0
    while i < len(cases):
        k = rng.randrange(1, 17)
        grp = cases[i : i + k]
        i += k
        got = sentence_spans_batch(grp)
        for t, g in zip(grp, got):
            want = _sentence_spans_ascii(t)
            if [tuple(x) for x in g] != want:
                print(f"BATCH MISMATCH: {t!r}")
                print(f"  batch: {g}")
                print(f"  scalar: {want}")
                raise SystemExit(1)
    return len(cases)


def corpus_texts(n_pages: int):
    from engine.corpus import gen_pages_pandas
    from engine.udfs import _route_and_extract_one

    pdf = gen_pages_pandas(42, 0, n_pages)
    for raw in pdf["html"]:
        _path, text, _err = _route_and_extract_one(raw)
        if text and text.isascii():
            yield text


TOKENS = [
    "Dr.", "e.g.", "U.S.", "No.", "approx.", "inc.",  # abbreviations
    "J.", "X.", "x.", "q.",                            # initials, lower
    "3.14", "3.", ".5", "12.", "No. 5.",               # decimals/digits
    "end.", "End.", "stop!", "what?", "Wait...", "Hi!?",
    'said."', "done.')", '("ok.")', "[note.]", "{x.}",
    "example.com/x", "a@b.co", "v1.2.3",
    "word", "Word", "WORD", "(", ")", '"', "'", "",
    ".", "!", "?", "...", "!!", "?!",
]
SEPS = ["", " ", "  ", "\n", " \n", "\n\n", "\t", " \t", "\r", "\x0c",
        "\x1c", "   ", ". ", "! "]
NEXTS = ["Next", "next", "5", '"Q', "'A", "(B", "[C", "{D", ")E", "", "\n"]


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    n_checked = 0

    for t in corpus_texts(n_pages):
        check(t, "corpus")
        n_checked += 1
    print(f"corpus: {n_checked} texts OK")

    # exhaustive small combinations: token + sep + next
    n = 0
    for tok, sep, nxt in itertools.product(TOKENS, SEPS, NEXTS):
        check(f"{tok}{sep}{nxt}", "combo")
        check(f"Start here. {tok}{sep}{nxt} End here.", "combo-framed")
        n += 2
    print(f"combos: {n} OK")

    # random concatenations + slicings
    rng = random.Random(1234)
    pool = TOKENS + SEPS + NEXTS
    n = 0
    for _ in range(4000):
        s = "".join(rng.choice(pool) for _ in range(rng.randrange(1, 24)))
        check(s, "random")
        if len(s) > 3:
            i = rng.randrange(len(s))
            j = rng.randrange(i, len(s))
            check(s[i:j], "random-slice")
        n += 2
    print(f"random: {n} OK")

    n = check_batched(random.Random(99))
    print(f"batched replay: {n} OK")
    print("ALL OK")


if __name__ == "__main__":
    main()
