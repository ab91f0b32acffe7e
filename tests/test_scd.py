"""SCD Type 2 history: close/open semantics, append-only history partition,
point-in-time snapshots."""

from __future__ import annotations

import datetime as dt
import os

from european_public_data_pipeline_spark.pipeline.scd import (
    read_scd2,
    scd2_apply,
    snapshot_at,
)

T1 = dt.datetime(2026, 1, 1)
T2 = dt.datetime(2026, 2, 1)
T3 = dt.datetime(2026, 3, 1)

SCHEMA = "k long, city string, tier string, effective_ts timestamp"


def _apply(spark, path, rows):
    scd2_apply(
        spark,
        path,
        spark.createDataFrame(rows, SCHEMA),
        key_cols=["k"],
        attr_cols=["city", "tier"],
    )


def _all(spark, path):
    return sorted(
        (
            r["k"],
            r["city"],
            r["tier"],
            r["valid_from"],
            r["valid_to"],
            bool(r["is_current"]),
        )
        for r in read_scd2(spark, path).collect()
    )


def test_scd2_close_and_open(spark, tmp_path):
    path = str(tmp_path / "dim")
    _apply(spark, path, [(1, "lux", "gold", T1), (2, "ber", "silver", T1)])
    # k=1 changes city, k=2 unchanged, k=3 new
    _apply(spark, path, [(1, "par", "gold", T2), (2, "ber", "silver", T2), (3, "mad", "bronze", T2)])
    assert _all(spark, path) == [
        (1, "lux", "gold", T1, T2, False),  # closed
        (1, "par", "gold", T2, None, True),  # reopened
        (2, "ber", "silver", T1, None, True),  # untouched: keeps T1 valid_from
        (3, "mad", "bronze", T2, None, True),  # inserted
    ]


def test_scd2_history_partition_is_append_only(spark, tmp_path):
    path = str(tmp_path / "dim")
    _apply(spark, path, [(1, "lux", "gold", T1)])
    _apply(spark, path, [(1, "par", "gold", T2)])  # closes the T1 row
    hist_dir = os.path.join(path, "is_current=false")
    before = {
        f: os.path.getmtime(os.path.join(hist_dir, f))
        for f in os.listdir(hist_dir)
        if f.endswith(".parquet")
    }
    assert before  # history exists
    _apply(spark, path, [(1, "rom", "gold", T3)])  # closes the T2 row
    after = {
        f: os.path.getmtime(os.path.join(hist_dir, f))
        for f in os.listdir(hist_dir)
        if f.endswith(".parquet")
    }
    # Every pre-existing history file is untouched; new files were appended.
    for f, m in before.items():
        assert after[f] == m
    assert len(after) > len(before)


def test_scd2_snapshot_at(spark, tmp_path):
    path = str(tmp_path / "dim")
    _apply(spark, path, [(1, "lux", "gold", T1)])
    _apply(spark, path, [(1, "par", "gold", T2)])
    _apply(spark, path, [(1, "rom", "gold", T3)])
    mid = dt.datetime(2026, 2, 15)

    def city_at(ts):
        rows = snapshot_at(spark, path, ts).collect()
        assert len(rows) == 1
        return rows[0]["city"]

    assert city_at(T1) == "lux"
    assert city_at(mid) == "par"
    assert city_at(T3) == "rom"
    assert snapshot_at(spark, path, dt.datetime(2025, 1, 1)).count() == 0


def test_scd2_latest_update_in_batch_wins(spark, tmp_path):
    path = str(tmp_path / "dim")
    _apply(spark, path, [(1, "lux", "gold", T1), (1, "par", "gold", T2)])
    rows = _all(spark, path)
    assert rows == [(1, "par", "gold", T2, None, True)]


def test_scd2_no_op_batch_changes_nothing(spark, tmp_path):
    path = str(tmp_path / "dim")
    _apply(spark, path, [(1, "lux", "gold", T1)])
    before = _all(spark, path)
    _apply(spark, path, [(1, "lux", "gold", T2)])  # same attrs: no-op
    assert _all(spark, path) == before


def test_scd2_partition_scoped_apply(spark, tmp_path):
    """With ``partition_col`` (a stable function of the key), an apply
    must produce the same logical table as the unscoped layout AND leave
    untouched sub-partitions' current files physically alone — the
    fact-scale cost fix measured in PLANS.md round 9."""
    import glob
    import time

    path = str(tmp_path / "dim")
    schema = "k long, region string, city string, tier string, effective_ts timestamp"

    def apply(rows):
        scd2_apply(
            spark,
            path,
            spark.createDataFrame(rows, schema),
            key_cols=["k"],
            attr_cols=["city", "tier"],
            partition_col="region",
        )

    apply([
        (1, "eu", "lux", "gold", T1), (2, "eu", "ber", "silver", T1),
        (3, "us", "nyc", "gold", T1), (4, "us", "sfo", "bronze", T1),
    ])
    us_files = sorted(glob.glob(f"{path}/is_current=true/region=us/*.parquet"))
    assert us_files, "expected sub-partitioned current layout"
    t0 = time.time()
    time.sleep(1.1)
    # Batch touches ONLY eu: k=1 changes, k=5 new.
    apply([(1, "eu", "par", "gold", T2), (5, "eu", "rom", "silver", T2)])

    rows = sorted(
        (r["k"], r["region"], r["city"], r["valid_from"], r["valid_to"],
         bool(r["is_current"]))
        for r in read_scd2(spark, path).collect()
    )
    assert rows == [
        (1, "eu", "lux", T1, T2, False),
        (1, "eu", "par", T2, None, True),
        (2, "eu", "ber", T1, None, True),
        (3, "us", "nyc", T1, None, True),
        (4, "us", "sfo", T1, None, True),
        (5, "eu", "rom", T2, None, True),
    ]
    # The us current sub-partition was not rewritten: same files, old mtimes.
    us_after = sorted(glob.glob(f"{path}/is_current=true/region=us/*.parquet"))
    assert us_after == us_files
    assert all(os.path.getmtime(f) < t0 for f in us_after)
    # History landed under its sub-partition.
    assert glob.glob(f"{path}/is_current=false/region=eu/*.parquet")
    # Point-in-time reconstruction still works on the scoped layout.
    snap = sorted(
        (r["k"], r["city"]) for r in snapshot_at(spark, path, T1).collect()
    )
    assert snap == [(1, "lux"), (2, "ber"), (3, "nyc"), (4, "sfo")]


def test_scd2_partition_scoped_apply_null_partition_value(spark, tmp_path):
    """A NULL partition value must scope with an explicit isNull
    predicate — plain isin() evaluates to NULL for NULL-valued current
    rows, which would drop the whole NULL sub-partition's untouched
    keys from the rewrite (round-9 review finding)."""
    path = str(tmp_path / "dim")
    schema = "k long, region string, city string, tier string, effective_ts timestamp"

    def apply(rows):
        scd2_apply(
            spark,
            path,
            spark.createDataFrame(rows, schema),
            key_cols=["k"],
            attr_cols=["city", "tier"],
            partition_col="region",
        )

    apply([
        (1, None, "lux", "gold", T1), (2, None, "ber", "silver", T1),
        (3, "us", "nyc", "gold", T1),
    ])
    # Batch touches the NULL partition only: k=1 changes, k=4 new.
    apply([(1, None, "par", "gold", T2), (4, None, "rom", "silver", T2)])
    rows = sorted(
        (r["k"], r["region"], r["city"], bool(r["is_current"]))
        for r in read_scd2(spark, path).collect()
    )
    assert rows == [
        (1, None, "lux", False),
        (1, None, "par", True),
        (2, None, "ber", True),   # untouched NULL-partition key SURVIVES
        (3, "us", "nyc", True),
        (4, None, "rom", True),
    ]
