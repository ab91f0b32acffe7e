"""Streaming MV maintenance: after every AvailableNow pass the stored MV
must equal a full recompute over everything committed, absorbing only the
new files per pass; a replayed batch_id must be a no-op (exactly-once)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from european_public_data_pipeline_spark.streaming.mv_maintenance import (
    maintain_event_summary,
    merge_event_summary,
    read_event_summary,
    recompute_event_summary,
)
from european_public_data_pipeline_spark.streaming.windows import read_events_stream

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(i0, n, etype, val):
    return [
        (i0 + i, T0 + dt.timedelta(minutes=i0 + i), 1, etype, val, "{}")
        for i in range(n)
    ]


def _mv(spark, path):
    return {
        r["event_type"]: (r["n_events"], r["sum_value_c"], r["first_ts"], r["last_ts"])
        for r in read_event_summary(spark, path).collect()
    }


def _want(spark, src):
    return {
        r["event_type"]: (r["n_events"], r["sum_value_c"], r["first_ts"], r["last_ts"])
        for r in recompute_event_summary(spark.read.parquet(src)).collect()
    }


def test_mv_equals_recompute_across_incremental_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        _rows(0, 5, "view", 10.0) + _rows(5, 3, "purchase", 99.5), SCHEMA
    ).write.parquet(src)
    maintain_event_summary(read_events_stream(spark, src), mv, ckpt)
    assert _mv(spark, mv) == _want(spark, src)

    # Second accretion: only the new files are absorbed (same checkpoint).
    spark.createDataFrame(
        _rows(8, 4, "view", 2.25) + _rows(12, 1, "click", 0.5), SCHEMA
    ).write.mode("append").parquet(src)
    maintain_event_summary(read_events_stream(spark, src), mv, ckpt)
    assert _mv(spark, mv) == _want(spark, src)


def test_replayed_batch_is_a_noop(spark, tmp_path):
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(_rows(0, 4, "view", 1.0), SCHEMA).write.parquet(src)
    maintain_event_summary(read_events_stream(spark, src), mv, ckpt)
    before = _mv(spark, mv)

    # Simulate a foreachBatch retry: re-merge an already-absorbed batch id.
    replay = spark.read.parquet(src)
    last = read_event_summary(spark, mv).agg(F.max("applied_batch")).collect()[0][0]
    merge_event_summary(spark, mv, replay, int(last))
    assert _mv(spark, mv) == before  # double-count prevented


def test_empty_first_batch_does_not_poison_the_mv(spark, tmp_path):
    """A zero-row first batch writes an empty MV whose max(applied_batch)
    is None — later batches must still merge (code-review r5: the None
    comparison used to kill the query permanently)."""
    mv = str(tmp_path / "mv")
    empty = spark.createDataFrame([], SCHEMA)
    merge_event_summary(spark, mv, empty, 0)
    assert read_event_summary(spark, mv).count() == 0
    batch = spark.createDataFrame(_rows(0, 3, "view", 2.0), SCHEMA)
    merge_event_summary(spark, mv, batch, 1)
    got = _mv(spark, mv)
    assert got["view"][0] == 3 and got["view"][1] == 600


def test_mv_history_is_versioned_and_crash_safe(spark, tmp_path):
    """Each merge commits a NEW manifest version: the previous MV state
    stays readable (time travel), so a crash mid-merge can never corrupt
    the committed view — the plain-overwrite failure mode review found."""
    from european_public_data_pipeline_spark.pipeline.manifest import (
        read_version,
        versions,
    )

    mv = str(tmp_path / "mv")
    merge_event_summary(spark, mv, spark.createDataFrame(_rows(0, 2, "view", 1.0), SCHEMA), 0)
    merge_event_summary(spark, mv, spark.createDataFrame(_rows(2, 3, "view", 1.0), SCHEMA), 1)
    assert versions(spark, mv) == [1, 2]
    v1 = {r["event_type"]: r["n_events"] for r in read_version(spark, mv, 1).collect()}
    v2 = {r["event_type"]: r["n_events"] for r in read_version(spark, mv, 2).collect()}
    assert v1["view"] == 2 and v2["view"] == 5
