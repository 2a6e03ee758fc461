from __future__ import annotations

import sys
import pathlib

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from engine.session import get_spark

    s = get_spark("local[4]", shuffle_partitions=4, app_name="engine-tests")
    yield s
