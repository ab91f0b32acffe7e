"""Partition pruning: a filter on a partition column must become directory
pruning (PartitionFilters in the scan, partition count 1), never a
file-content filter — the property that makes Hive-style layout
(silver_io.write_partitioned) pay off at 100 TB.
"""

from __future__ import annotations

import datetime as dt

import pytest

from european_public_data_pipeline_spark.pipeline.silver_io import (
    read_partitioned,
    write_partitioned,
)


@pytest.fixture(autouse=True, scope="module")
def _uncached_session(spark):
    """Plan-shape assertions must see the real scan plans: any cached
    relation left by earlier test modules (the session-scoped fixture is
    shared suite-wide) gets substituted into matching plan fragments by
    the CacheManager, changing Exchange counts and ReadSchema non-
    deterministically with test order (r6: t10 flaked only in the full
    run, after the 191-query parity sweep's union of caches)."""
    spark.catalog.clearCache()
    yield


def test_partition_filter_prunes_directories(spark, tmp_path):
    path = str(tmp_path / "tbl")
    rows = [
        (geo, dt.date(2024, m, 1), float(m))
        for geo in ("LU", "FR", "DE")
        for m in range(1, 4)
    ]
    df = spark.createDataFrame(rows, "geo string, time date, value double")
    write_partitioned(df, path, ["geo"])

    scan = read_partitioned(spark, path).filter("geo = 'LU'")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    # The predicate must appear as a PartitionFilters entry on the scan...
    assert "PartitionFilters" in plan and "geo" in plan.split("PartitionFilters", 1)[1][:200]
    # ...and actually prune: the scan's file-listing metric shows ONE of the
    # three partition directories surviving.
    assert len(scan.collect()) == 3  # executes scan's own plan -> metrics live
    node = scan._jdf.queryExecution().executedPlan()
    leaves = node.collectLeaves()
    metrics = leaves.apply(0).metrics()
    n_parts = metrics.get("numPartitions")
    if not n_parts.isEmpty():
        assert n_parts.get().value() == 1
    assert scan.select("geo").distinct().collect() == [("LU",)]


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DYNAMIC partition pruning: when the partition-column predicate only
    materializes at runtime (a filter on the JOINED dimension, not on the
    fact), the fact scan must still prune directories — Catalyst injects a
    dynamicpruning subquery into the scan's PartitionFilters. This is the
    plan shape that saves the 100 TB fact scan when the calendar dim is
    filtered to a week."""
    fact_path = str(tmp_path / "fact")
    rows = [(d, i, float(i)) for d in range(10) for i in range(20)]
    fact = spark.createDataFrame(rows, "d int, k int, v double")
    write_partitioned(fact, fact_path, ["d"])
    dim = spark.createDataFrame(
        [(d, "keep" if d in (3, 7) else "drop") for d in range(10)],
        "d int, tag string",
    )
    joined = read_partitioned(spark, fact_path).join(dim, "d").filter(
        "tag = 'keep'"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert joined.count() == 2 * 20
