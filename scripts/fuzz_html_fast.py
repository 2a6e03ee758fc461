"""Differential fuzz: _drive_fast tokenizer vs stdlib html.parser path.

Both drive the same _Extractor handlers; outputs (segment tuples) must be
identical on every input. Sources: golden fixtures, corpus docs, and
adversarially generated random markup soup.

Usage: python scripts/fuzz_html_fast.py [n_random] [seed]
"""

import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from engine.kernels import html_extract as hx


def stdlib_segments(s: str):
    p = hx._Extractor()
    try:
        p.feed(s)
        p.close()
    except Exception:
        pass
    p.close_all()
    return sorted(p.segments, key=lambda t: t[0])


def fast_segments(s: str):
    # mirrors extract_segments exactly (incl. bail-to-stdlib)
    return hx.extract_segments(s)


TAGS = ["p", "div", "a", "span", "li", "ul", "nav", "script", "style",
        "h1", "h2", "br", "td", "table", "article", "b", "i", "foo-bar",
        "SCRIPT", "A", "P"]
ATTRS = ['id="main"', "class='sidebar menu'", "href=x", "id=|weird|",
         'class="content"', "data-x=1", "role=navigation", "id", "=",
         'class="a b', "id='unterminated", 'onclick="f(1<2)"']
SOUP = ["<", ">", "</", "<!", "<!-", "<!--", "-->", "<![", "<![CDATA[",
        "]]>", "<?", "?>", "<!doctype html>", "<!DOCTYPE", "&amp;",
        "&lt;", "&#65;", "&#x41;", "&nosemi", "&", ";", "=", '"', "'",
        "/", "\\", "\n", "\t", "  ", "text here long enough to matter ",
        "<a", "<p", "</p", "word", "<3", "a<b", "x > y", "<!>", "</>",
        "<==>", "<--", "<<", ">>", "\x00", "é", "漢字", "<br/>", "<br />",
        "<img src=x>", "<p/>", "< p>", "<p >", "<p =>", "<p a=>",
        "<p/ >", "<p / >", "<a/b>", "<a b/c>", "<a b=c/>", "<a b='c'd>"]


def gen_doc(rng: random.Random) -> str:
    parts = []
    n = rng.randint(1, 60)
    for _ in range(n):
        r = rng.random()
        if r < 0.35:
            t = rng.choice(TAGS)
            if rng.random() < 0.4:
                a = " " + " ".join(rng.sample(ATTRS, rng.randint(1, 3)))
            else:
                a = ""
            close = rng.choice([">", "/>", "", " >", "\n>"])
            parts.append(f"<{t}{a}{close}")
        elif r < 0.5:
            parts.append(f"</{rng.choice(TAGS)}{rng.choice(['>', ' >', '', ' x>'])}")
        elif r < 0.85:
            parts.append(rng.choice(SOUP))
        else:
            parts.append("".join(rng.choice("abc <>&=!/-'\"?") for _ in range(rng.randint(1, 30))))
    return "".join(parts)


def main():
    n_random = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    inputs = []

    fixdir = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "html"
    for f in sorted(fixdir.glob("*.html")):
        inputs.append(("fixture:" + f.name, f.read_text(errors="replace")))

    # corpus docs
    from engine.corpus import SEED, page_row
    from engine.kernels.normalize import decode_bytes
    ndocs = 1500
    for i in range(ndocs):
        _url, _ts, html, _text, _lang = page_row(SEED, i)
        if html is not None:
            inputs.append((f"corpus:{i}", decode_bytes(html)))

    rng = random.Random(seed)
    for i in range(n_random):
        inputs.append((f"rand:{i}", gen_doc(rng)))

    bad = 0
    bails = 0
    for name, s in inputs:
        want = stdlib_segments(s)
        p = hx._Extractor()
        try:
            ok = hx._drive_fast(p, s)
        except Exception as e:
            print(f"RAISE {name}: {e!r}")
            print(repr(s[:400]))
            bad += 1
            continue
        if not ok:
            bails += 1
            continue  # bail path re-runs stdlib: identical by construction
        p.close_all()
        got = sorted(p.segments, key=lambda t: t[0])
        if got != want:
            bad += 1
            print(f"MISMATCH {name}")
            print("  input:", repr(s[:400]))
            for a, b in zip(want, got):
                if a != b:
                    print("  want:", a)
                    print("  got :", b)
                    break
            if len(want) != len(got):
                print(f"  len want={len(want)} got={len(got)}")
            if bad > 10:
                break
    print(f"checked={len(inputs)} bails={bails} mismatches={bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
