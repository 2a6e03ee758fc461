"""Input-schema validation: fail fast with a readable diff instead of
an executor-side AnalysisException three stages into a 100-TB run."""

from __future__ import annotations

from pyspark.sql import DataFrame

# required column -> accepted Spark simpleString type(s)
PAGES_CONTRACT: dict[str, tuple[str, ...]] = {
    "url": ("string",),
    "warc_ts": ("timestamp", "timestamp_ntz"),
    "html": ("binary",),
    "text": ("string",),
    "lang": ("string",),
}


def assert_pages_schema(df: DataFrame) -> DataFrame:
    """Raise ValueError listing every missing/mistyped column of the
    pages contract (BASELINE.json input_hint); extra columns pass."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    problems = []
    for col, accepted in PAGES_CONTRACT.items():
        if col not in actual:
            problems.append(f"missing column {col!r} ({accepted[0]})")
        elif actual[col] not in accepted:
            problems.append(
                f"column {col!r} is {actual[col]}, expected "
                f"{' or '.join(accepted)}"
            )
    if problems:
        raise ValueError(
            "input does not match the pages contract: " + "; ".join(problems)
        )
    return df
