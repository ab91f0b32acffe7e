"""Real JDBC round-trip (S12) against embedded Apache Derby.

The reference loads silver data into a SQL warehouse over a live DB
connection with DDL-if-absent, a per-series pre-DELETE, and chunked
INSERTs (/root/reference/src/db/load_hicp_to_sql.py:32-101). Derby ships
in Spark's own classpath, so the same contract is exercised against an
actual JDBC database here — connection, DDL, batched parallel insert,
delete-then-append idempotency, and read-back — not just documented.
"""

from __future__ import annotations

import datetime as dt

import pytest

from european_public_data_pipeline_spark.pipeline.jdbc import (
    execute_update,
    read_jdbc,
    table_exists,
    write_jdbc,
)

DDL = (
    "time DATE NOT NULL, coicop VARCHAR(8) NOT NULL, unit VARCHAR(8) NOT NULL, "
    "value DOUBLE NOT NULL, geo VARCHAR(4) NOT NULL"
)


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "warehouse"
    return f"jdbc:derby:{db};create=true"


def series(spark, geo, base=100.0):
    rows = [
        (dt.date(2024, m, 1), "CP00", "I15", base + m, geo) for m in range(1, 7)
    ]
    return spark.createDataFrame(
        rows, "time DATE, coicop STRING, unit STRING, value DOUBLE, geo STRING"
    )


@pytest.fixture(scope="module")
def fact_table(spark, derby_url):
    name = "FACT_HICP"
    if not table_exists(spark, derby_url, name):
        execute_update(spark, derby_url, f"CREATE TABLE {name} ({DDL})")
    yield name


def test_ddl_if_absent_guard(spark, derby_url, fact_table):
    # Second ensure must detect the table instead of failing CREATE.
    assert table_exists(spark, derby_url, fact_table)
    assert not table_exists(spark, derby_url, "NO_SUCH_TABLE")


def test_round_trip_batched_insert(spark, derby_url, fact_table):
    df = series(spark, "AT")
    write_jdbc(df, derby_url, fact_table, batchsize=2, num_partitions=3)
    back = read_jdbc(spark, derby_url, fact_table).filter("geo = 'AT'")
    back = back.toDF(*[c.lower() for c in back.columns])  # Derby uppercases
    got = sorted((r.time, r.coicop, r.unit, r.value, r.geo) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
    # Read-back schema survives the JDBC type mapping.
    assert dict(back.dtypes)["value"] == "double"
    assert dict(back.dtypes)["time"] == "date"


def test_pre_delete_makes_rerun_idempotent(spark, derby_url, fact_table):
    df = series(spark, "DE", base=200.0)
    for _ in range(2):  # second run must replace, not duplicate
        write_jdbc(
            df, derby_url, fact_table, delete_where="geo = 'DE'", batchsize=200
        )
    back = read_jdbc(
        spark,
        derby_url,
        f"(SELECT * FROM {fact_table} WHERE geo = 'DE') t",
    )
    assert back.count() == 6
    # Other series untouched by the scoped delete.
    df_fr = series(spark, "FR", base=300.0)
    write_jdbc(df_fr, derby_url, fact_table, delete_where="geo = 'FR'")
    write_jdbc(df, derby_url, fact_table, delete_where="geo = 'DE'")
    assert read_jdbc(spark, derby_url, fact_table).filter("geo = 'FR'").count() == 6


def test_execute_update_reports_rowcount(spark, derby_url, fact_table):
    write_jdbc(series(spark, "IT"), derby_url, fact_table, delete_where="geo = 'IT'")
    n = execute_update(spark, derby_url, f"DELETE FROM {fact_table} WHERE geo = 'IT'")
    assert n == 6
