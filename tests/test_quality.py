"""Quality-constraint suite + gated idempotent write tests (SURVEY.md §5).

Mirrors the reference's check semantics by injecting one violation per
check (a null, a duplicated key, a gap month, a zero value, a garbage time
code) and asserting exactly that check flips to failed
(/root/reference/src/quality/check_hicp_quality.py:52-119).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.pipeline.silver_io import (
    quality_gated_write,
    read_partitioned,
    write_partitioned,
)
from european_public_data_pipeline_spark.quality.checks import (
    QualityGateError,
    check_suite,
    gate,
)


def clean_df(spark):
    rows = [
        ("LU", "CP00", dt.date(2024, m, 1), float(100 + m), f"2024M{m:02d}")
        for m in range(1, 7)
    ]
    return spark.createDataFrame(rows, "geo string, coicop string, time date, value double, code string")


def full_suite(df):
    return (
        check_suite(df)
        .expect_columns(["geo", "coicop", "time", "value"])
        .expect_not_null(["geo", "value"])
        .expect_positive("value")
        .expect_parseable_time("code", "yyyy'M'MM")
        .expect_unique_key(["geo", "coicop", "time"])
        .expect_monthly_continuity(["geo", "coicop"], "time")
    )


def results(spark, df):
    return {r["check"]: (r["passed"], r["violations"]) for r in full_suite(df).to_dataframe(spark).collect()}


def test_all_pass_on_clean_data(spark):
    res = results(spark, clean_df(spark))
    assert len(res) == 7
    assert all(passed for passed, _ in res.values()), res
    gate(full_suite(clean_df(spark)).to_dataframe(spark))  # no raise


def test_null_value_fails_only_not_null(spark):
    df = clean_df(spark).withColumn(
        "value", F.when(F.col("time") == "2024-03-01", None).otherwise(F.col("value"))
    )
    res = results(spark, df)
    assert res["not_null:value"] == (False, 1)
    assert res["not_null:geo"][0] is True
    assert res["positive:value"][0] is True


def test_duplicate_key_detected(spark):
    df = clean_df(spark)
    df = df.unionAll(df.limit(1))
    res = results(spark, df)
    assert res["unique_key:geo,coicop,time"] == (False, 1)
    assert res["monthly_continuity:geo,coicop:time"][0] is True


def test_gap_month_detected(spark):
    df = clean_df(spark).filter(F.col("time") != "2024-03-01")
    res = results(spark, df)
    assert res["monthly_continuity:geo,coicop:time"] == (False, 1)
    assert res["unique_key:geo,coicop,time"][0] is True


def test_nonpositive_value_detected(spark):
    df = clean_df(spark).withColumn(
        "value", F.when(F.col("time") == "2024-02-01", -1.0).otherwise(F.col("value"))
    )
    res = results(spark, df)
    assert res["positive:value"] == (False, 1)


def test_bad_time_code_detected(spark):
    df = clean_df(spark).withColumn(
        "code", F.when(F.col("time") == "2024-04-01", "not-a-month").otherwise(F.col("code"))
    )
    res = results(spark, df)
    assert res["parseable_time:code"] == (False, 1)


def test_missing_column_detected(spark):
    res = results(spark, clean_df(spark).drop("coicop").withColumn("coicop", F.lit("CP00")))
    assert res["columns_present"][0] is True
    df = clean_df(spark).drop("value")
    res2 = {
        r["check"]: (r["passed"], r["violations"])
        for r in check_suite(df).expect_columns(["geo", "value"]).to_dataframe(spark).collect()
    }
    assert res2["columns_present"] == (False, 1)


def test_gate_raises_with_detail(spark):
    df = clean_df(spark).withColumn("value", F.lit(0.0))
    with pytest.raises(QualityGateError, match="positive:value"):
        gate(full_suite(df).to_dataframe(spark))


# -- idempotent partitioned write (W1-W2) -----------------------------------


def test_dynamic_partition_overwrite_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "silver")
    df = clean_df(spark)
    write_partitioned(df, path, ["geo"])
    assert read_partitioned(spark, path).count() == 6

    # Re-writing a DIFFERENT geo partition must not clobber the existing one.
    other = df.withColumn("geo", F.lit("DE"))
    write_partitioned(other, path, ["geo"])
    out = read_partitioned(spark, path)
    assert out.count() == 12
    assert out.select("geo").distinct().count() == 2

    # Re-running the same batch replaces, not duplicates (idempotency, W1).
    write_partitioned(other, path, ["geo"])
    assert read_partitioned(spark, path).count() == 12


def test_quality_gated_write_blocks_bad_data(spark, tmp_path):
    path = str(tmp_path / "gated")
    bad = clean_df(spark).withColumn("value", F.lit(-5.0))
    with pytest.raises(QualityGateError):
        quality_gated_write(bad, full_suite(bad), path, ["geo"])
    # Nothing must have been written (the gate runs before the write).
    import os

    assert not os.path.exists(path)

    good = clean_df(spark)
    checks = quality_gated_write(good, full_suite(good), path, ["geo"])
    assert read_partitioned(spark, path).count() == 6
    assert all(r["passed"] for r in checks.collect())


def test_freshness_check(spark):
    import datetime as dt

    from european_public_data_pipeline_spark.quality.checks import CheckSuite

    df = spark.createDataFrame(
        [(1, dt.datetime(2026, 1, 1)), (2, dt.datetime(2026, 3, 1))],
        "id long, ts timestamp",
    )

    def result(as_of):
        checks = (
            CheckSuite(df).expect_fresh("ts", "45 days", as_of=as_of)
            .to_dataframe(spark)
            .collect()
        )
        assert len(checks) == 1
        return checks[0]["passed"], checks[0]["violations"]

    assert result(dt.datetime(2026, 3, 20)) == (True, 0)   # 19 days old
    assert result(dt.datetime(2026, 6, 1)) == (False, 1)   # 92 days old

    empty = df.filter("id < 0")
    row = (
        CheckSuite(empty)
        .expect_fresh("ts", "45 days", as_of=dt.datetime(2026, 3, 20))
        .to_dataframe(spark)
        .collect()[0]
    )
    assert row["passed"] is False  # empty table is never fresh
