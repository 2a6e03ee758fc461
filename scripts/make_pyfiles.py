"""Build dist/engine.zip for spark-submit --py-files (SURVEY.md §3.1).

    python scripts/make_pyfiles.py
    spark-submit --py-files dist/engine.zip jobs/ingest.py --output /data/out

The zip contains the `engine` package only — jobs/*.py are submitted
as the driver script. Deterministic entries (sorted, fixed timestamp)
so re-builds of identical sources produce identical artifacts, which
lets cluster deploy tooling skip redundant uploads.
"""

from __future__ import annotations

import os
import pathlib
import zipfile

REPO = pathlib.Path(__file__).resolve().parents[1]
DIST = REPO / "dist"


def build(out: pathlib.Path | None = None) -> pathlib.Path:
    out = out or DIST / "engine.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    files = sorted(
        p
        for p in (REPO / "engine").rglob("*.py")
        if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in files:
            info = zipfile.ZipInfo(str(p.relative_to(REPO)))
            info.date_time = (2020, 1, 1, 0, 0, 0)  # deterministic
            info.external_attr = 0o644 << 16
            zf.writestr(info, p.read_bytes(), zipfile.ZIP_DEFLATED)
    return out


if __name__ == "__main__":
    path = build()
    print(path, os.path.getsize(path), "bytes")
