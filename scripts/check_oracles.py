"""Local mirror of the driver's correctness gate: run every registered
query on Spark AND its DuckDB oracle at a given sf, compare row count,
sorted column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(
            col.dropna().iloc[0] if not col.dropna().empty else None, (list, np.ndarray)
        ):
            df[c] = col.map(lambda v: tuple(v) if v is not None else None)
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("int64")
        elif col.dtype.kind == "f":
            df[c] = col.round(6)
        elif str(col.dtype) in ("int32", "int8", "int16", "uint32"):
            df[c] = col.astype("int64")
        elif str(col.dtype) == "object":
            # decimals etc.
            try:
                df[c] = pd.to_numeric(col)
                if df[c].dtype.kind == "f":
                    df[c] = df[c].round(6)
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    from engine.queries_extract import ALL as REGISTRY
    from engine.session import get_spark

    spark = get_spark("local[8]", shuffle_partitions=8, app_name="oracle-check")
    con = duck_connection(sf_dir)

    n_pass = n_fail = 0
    for name, (fn, oracle) in sorted(REGISTRY.items()):
        if name_filter and name_filter not in name:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        if oracle is None:
            print(f"ROWS {name}: {len(got)} rows (no oracle)")
            n_pass += 1
            continue
        try:
            exp = con.sql(oracle).df()
        except Exception as exc:
            print(f"FAIL {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rowcount {len(got)} vs {len(exp)}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        try:
            pd.testing.assert_frame_equal(
                g, e, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9
            )
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
        except AssertionError as exc:
            print(f"FAIL {name}: value mismatch\n{str(exc)[:500]}")
            diff = (g != e) & ~(g.isna() & e.isna())
            bad = diff.any(axis=1)
            if bad.any():
                print("spark:", g[bad].head(3).to_string())
                print("duck :", e[bad].head(3).to_string())
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
