"""Regression tests for the dtype-robust events loader.

Round 3 shipped a loader that hard-coded the parquet INT64 TIMESTAMP(NANOS)
encoding of ``events.ts``; the driver's testdata then switched to
``timestamp[us]`` and 13 queries, the bench, and the suite broke
(VERDICT.md round 3, item 1).  These tests pin both encodings so the next
flip can't recur: the loader must dispatch on the *loaded* dtype.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from european_public_data_pipeline_spark.tables import load_table

ROWS = [
    # (event_id, user_id, epoch ns)  — deliberately NOT µs-aligned nanos.
    (1, 10, 1_700_000_000_123_456_789),
    (2, 11, 1_700_000_100_999_999_999),
    (3, 10, 1_700_000_200_000_000_001),
]


def _write_events(tmp_path, ts_array: pa.Array, subdir: str) -> str:
    sf_dir = tmp_path / subdir
    sf_dir.mkdir()
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "user_id": pa.array([r[1] for r in ROWS], pa.int64()),
            "ts": ts_array,
        }
    )
    pq.write_table(table, str(sf_dir / "events.parquet"))
    return str(sf_dir)


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("events_enc")
    nanos = pa.array([r[2] for r in ROWS], pa.timestamp("ns"))
    micros = pa.array([r[2] // 1000 for r in ROWS], pa.timestamp("us"))
    return {
        "ns": _write_events(tmp_path, nanos, "ns"),
        "us": _write_events(tmp_path, micros, "us"),
    }


@pytest.mark.parametrize("enc", ["ns", "us"])
def test_events_ts_is_timestamp_under_both_encodings(spark, fixture_dirs, enc):
    df = load_table(spark, fixture_dirs[enc], "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)


def test_events_values_agree_across_encodings(spark, fixture_dirs):
    """ns (truncated to µs) and µs-native reads must yield identical rows."""
    a = load_table(spark, fixture_dirs["ns"], "events").orderBy("event_id").collect()
    b = load_table(spark, fixture_dirs["us"], "events").orderBy("event_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    # Spot-check absolute value: µs truncation of the first row's nanos.
    expected = datetime.datetime.fromtimestamp(
        ROWS[0][2] // 1000 / 1_000_000, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    assert a[0]["ts"] == expected


def test_real_testdata_loads_and_filters(spark):
    """The driver's current testdata must load and support ts predicates."""
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    n = df.count()
    assert n > 0
    lo = df.agg({"ts": "min"}).collect()[0][0]
    assert df.filter(df.ts > lo).count() < n


@pytest.mark.parametrize("enc", ["ns", "us"])
def test_loader_scopes_nanos_conf_to_the_nanos_path(spark, fixture_dirs, enc):
    """The loader must not flip ``nanosAsLong`` session-wide unless the file
    actually carries a NANOS column (VERDICT r4 nit): on a session where the
    conf is unset/false, a µs read leaves it false, while a NANOS read sets
    it (required for the plan's lifetime) and still loads correctly."""
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        df = load_table(spark, fixture_dirs[enc], "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        assert df.count() == len(ROWS)
        after = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
        assert after == ("true" if enc == "ns" else "false")
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
