"""Write-audit-publish (one-scan gated load) tests.

The contract under test: row-level constraints are computed by the WRITE
job itself (``df.observe`` — verified by matching them against the
two-scan ``to_dataframe`` results on identical data), a failed audit
leaves the published table untouched and the staging batch quarantined,
and a passing audit publishes with dynamic partition overwrite (other
partitions survive).
"""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.pipeline.silver_io import read_partitioned
from european_public_data_pipeline_spark.pipeline.wap import (
    quarantine_report,
    write_audit_publish,
)
from european_public_data_pipeline_spark.quality.checks import (
    QualityGateError,
    check_suite,
)


def batch(spark, geo="LU", bad_null=False):
    rows = [
        (geo, "CP00", dt.date(2024, m, 1), None if (bad_null and m == 3) else float(100 + m), f"2024M{m:02d}")
        for m in range(1, 7)
    ]
    return spark.createDataFrame(
        rows, "geo string, coicop string, time date, value double, code string"
    )


def suite_for(df):
    return (
        check_suite(df)
        .expect_columns(["geo", "coicop", "time", "value"])
        .expect_not_null(["geo", "value"])
        .expect_positive("value")
        .expect_parseable_time("code", "yyyy'M'MM")
        .expect_unique_key(["geo", "coicop", "time"])
        .expect_monthly_continuity(["geo", "coicop"], "time")
    )


def test_publish_on_pass_and_observed_metrics_match_two_scan(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = batch(spark)
    report = write_audit_publish(df, suite_for(df), path, ["geo"])

    got = {r["check"]: (r["passed"], r["violations"]) for r in report.collect()}
    direct = {
        r["check"]: (r["passed"], r["violations"])
        for r in suite_for(df).to_dataframe(spark).collect()
    }
    assert got == direct  # observed one-scan metrics == classic two-scan
    assert all(p for p, _ in got.values())
    assert read_partitioned(spark, path).count() == 6
    assert not os.path.exists(path + "__staging")  # staging cleaned up


def test_failed_audit_quarantines_and_never_publishes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    good = batch(spark, geo="LU")
    write_audit_publish(good, suite_for(good), path, ["geo"])

    bad = batch(spark, geo="FR", bad_null=True)
    with pytest.raises(QualityGateError, match="not_null:value"):
        write_audit_publish(bad, suite_for(bad), path, ["geo"])

    # Published table untouched: only the good partition exists.
    published = read_partitioned(spark, path)
    assert published.select("geo").distinct().collect() == [("LU",)]
    # Quarantine retained with the failing rows for inspection.
    q = quarantine_report(spark, path + "__staging")
    assert q.count() == 6
    assert q.filter(F.col("value").isNull()).count() == 1


def test_publish_is_partition_scoped(spark, tmp_path):
    path = str(tmp_path / "tbl")
    lu = batch(spark, geo="LU")
    write_audit_publish(lu, suite_for(lu), path, ["geo"])
    fr = batch(spark, geo="FR")
    write_audit_publish(fr, suite_for(fr), path, ["geo"])
    # Re-publishing FR (idempotent re-run) must not disturb LU.
    write_audit_publish(fr, suite_for(fr), path, ["geo"])
    counts = dict(
        read_partitioned(spark, path).groupBy("geo").count().collect()
    )
    assert counts == {"LU": 6, "FR": 6}


def test_empty_suite_rejected_before_any_write(spark, tmp_path):
    """A suite declaring no checks is a declaration bug: fail fast, before
    the staging write (ADVICE r4, wap.py)."""
    path = str(tmp_path / "tbl")
    df = batch(spark)
    with pytest.raises(ValueError, match="declares no checks"):
        write_audit_publish(df, check_suite(df), path, ["geo"])
    assert not os.path.exists(path)
    assert not os.path.exists(path + "__staging")
