from __future__ import annotations

import sys
from pathlib import Path

import pytest

# Make the repo root importable regardless of pytest invocation directory.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from european_public_data_pipeline_spark.session import get_spark  # noqa: E402

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="epdp-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_small():
    return SF0001


@pytest.fixture(scope="session")
def sf_medium():
    return SF001
