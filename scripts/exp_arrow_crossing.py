"""Experiment (VERDICT r1 #9): scalar/iterator pandas UDF vs
mapInArrow for the html->extracted Python crossing.

Both run the identical kernel chain (route + extract + sentence
count) over the same cached bench corpus; the only variable is the
Arrow boundary API:

  * pandas path: ArrowEvalPython, pyarrow -> pd.Series of Python
    bytes objects in, pd.DataFrame out;
  * arrow path: MapInArrow, raw RecordBatches in/out, values
    unwrapped with .as_py() (same Python bytes materialization the
    kernels need either way).

Usage: python scripts/exp_arrow_crossing.py [n_pages] [repeats]
Prints per-variant wall seconds; the pipeline keeps whichever wins
(result recorded in BENCH/BASELINE.md notes).
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def extract_arrow_batches(batches):
    import pyarrow as pa

    from engine.kernels.sentences import sentence_spans
    from engine.udfs import _route_and_extract_one as route

    for batch in batches:
        paths, texts, errs, nsents = [], [], [], []
        for v in batch.column("html"):
            p, t, e = route(v.as_py())
            paths.append(p)
            texts.append(t)
            errs.append(e)
            nsents.append(len(sentence_spans(t)) if t else 0)
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("url"),
                pa.array(paths, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(errs, pa.string()),
                pa.array(nsents, pa.int32()),
            ],
            names=["url", "path", "text", "error", "n_sents"],
        )


ARROW_DDL = "url string, path string, text string, error string, n_sents int"


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from engine.session import get_spark
    from engine.udfs import route_extract_udf

    spark = get_spark("local[32]", shuffle_partitions=32, app_name="arrow-exp")
    corpus = str(
        pathlib.Path(__file__).resolve().parents[1]
        / "data"
        / f"bench_pages_{n_pages}"
    )
    pages = spark.read.parquet(corpus).select("url", "html")

    def force(df):
        return df.agg(
            F.count(F.lit(1)),
            F.sum("n_sents"),
            F.sum(F.length("text")),
            F.max(F.sha2("text", 256)),
        ).collect()[0]

    def pandas_path():
        df = pages.withColumn("_ex", route_extract_udf(F.col("html"))).select(
            "url", "_ex.path", "_ex.text", "_ex.error", "_ex.n_sents"
        )
        return force(df)

    def arrow_path():
        return force(pages.mapInArrow(extract_arrow_batches, ARROW_DDL))

    # warm-up both (JVM + reused python workers)
    r_p = pandas_path()
    r_a = arrow_path()
    assert tuple(r_p) == tuple(r_a), (r_p, r_a)  # identical output

    results: dict[str, list[float]] = {"pandas_udf": [], "map_in_arrow": []}
    for _ in range(repeats):
        t0 = time.monotonic()
        pandas_path()
        results["pandas_udf"].append(time.monotonic() - t0)
        t0 = time.monotonic()
        arrow_path()
        results["map_in_arrow"].append(time.monotonic() - t0)
    for k, v in results.items():
        print(f"{k}: min={min(v):.2f}s all={[round(x, 2) for x in v]}")


if __name__ == "__main__":
    main()
