"""Versioned manifests: time travel, pointer semantics, snapshot
isolation of an in-flight reader, and rollback."""

from __future__ import annotations

import pytest

from european_public_data_pipeline_spark.pipeline.manifest import (
    current_version,
    publish_version,
    read_version,
    rollback,
    versions,
)


def _batch(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "k long, v string")


def _vals(df):
    return sorted(r["v"] for r in df.collect())


def test_publish_read_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert publish_version(_batch(spark, ["a", "b"]), t) == 1
    assert publish_version(_batch(spark, ["c"]), t) == 2
    assert publish_version(_batch(spark, ["d", "e", "f"]), t) == 3
    assert versions(spark, t) == [1, 2, 3]
    assert current_version(spark, t) == 3
    assert _vals(read_version(spark, t)) == ["d", "e", "f"]
    assert _vals(read_version(spark, t, 1)) == ["a", "b"]  # time travel
    assert _vals(read_version(spark, t, 2)) == ["c"]


def test_reader_snapshot_survives_later_publishes(spark, tmp_path):
    t = str(tmp_path / "tbl")
    publish_version(_batch(spark, ["old1", "old2"]), t)
    snapshot = read_version(spark, t)  # reader pins version 1's files
    publish_version(_batch(spark, ["new"]), t)
    # The pinned plan still reads version 1's files — unaffected by the
    # publish (new versions write to new immutable prefixes).
    assert _vals(snapshot) == ["old1", "old2"]
    assert _vals(read_version(spark, t)) == ["new"]


def test_rollback_re_points_without_touching_data(spark, tmp_path):
    t = str(tmp_path / "tbl")
    publish_version(_batch(spark, ["good"]), t)
    publish_version(_batch(spark, ["bad"]), t)
    rollback(spark, t, 1)
    assert current_version(spark, t) == 1
    assert _vals(read_version(spark, t)) == ["good"]
    # Roll forward again — nothing was deleted.
    rollback(spark, t, 2)
    assert _vals(read_version(spark, t)) == ["bad"]
    with pytest.raises(ValueError):
        rollback(spark, t, 99)


def test_next_publish_after_rollback_takes_fresh_version(spark, tmp_path):
    t = str(tmp_path / "tbl")
    publish_version(_batch(spark, ["v1"]), t)
    publish_version(_batch(spark, ["v2"]), t)
    rollback(spark, t, 1)
    # History is append-only: a publish after rollback becomes v3, and
    # the superseded v2 remains readable.
    assert publish_version(_batch(spark, ["v3"]), t) == 3
    assert _vals(read_version(spark, t)) == ["v3"]
    assert _vals(read_version(spark, t, 2)) == ["v2"]
