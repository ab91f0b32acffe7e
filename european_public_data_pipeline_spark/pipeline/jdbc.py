"""JDBC warehouse sink (SURVEY.md §2.1 S12): the reference's SQL load
path over a real JDBC connection.

The reference (/root/reference/src/db/load_hicp_to_sql.py:54-101) loads a
pandas frame into Azure SQL with (a) a parameterized pre-DELETE for
idempotency, (b) hand-written DDL-if-absent, (c) chunked multi-row
INSERTs (chunksize=200). Spark-first:

- the chunked INSERT is ``df.write.jdbc(mode="append")`` with the
  ``batchsize`` option — every partition opens its own connection and
  batches rows, so an N-executor cluster loads N-way parallel (the
  reference is single-connection);
- the pre-DELETE and DDL run once, driver-side, through a plain
  ``java.sql`` connection obtained from the same JVM Spark runs in — the
  exact statements the reference issues, see ``execute_update``;
- idempotency stays delete-then-append per series/partition key
  (load_hicp_to_sql.py:54-62), not truncate-reload.

Exercised end-to-end in tests/test_jdbc.py against embedded Apache Derby
(shipped in Spark's own classpath), so S12 is a tested path, not a
documented one. Scale note: for a real warehouse put ``numPartitions`` on
the write to cap concurrent connections, and prefer a staging table +
server-side MERGE for transactional swap — the staging load is this same
``write_jdbc``.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, SparkSession


def _jdbc_connection(spark: SparkSession, url: str, properties: Mapping[str, str] | None):
    jvm = spark._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    return jvm.java.sql.DriverManager.getConnection(url, props)


def execute_update(
    spark: SparkSession,
    url: str,
    sql: str,
    properties: Mapping[str, str] | None = None,
) -> int:
    """Run one DDL/DML statement over JDBC (driver-side); returns the
    update count (0 for DDL). The reference's cursor.execute
    (db/sql.py:10-40) for statements Spark's writer cannot express
    (DELETE, CREATE TABLE with warehouse-specific types)."""
    conn = _jdbc_connection(spark, url, properties)
    try:
        stmt = conn.createStatement()
        try:
            stmt.execute(sql)
            n = stmt.getUpdateCount()
            return n if n > 0 else 0
        finally:
            stmt.close()
    finally:
        conn.close()


def table_exists(
    spark: SparkSession,
    url: str,
    table: str,
    properties: Mapping[str, str] | None = None,
) -> bool:
    """DDL-if-absent guard (S13; reference IF OBJECT_ID,
    load_hicp_to_sql.py:32-51) via JDBC catalog metadata."""
    conn = _jdbc_connection(spark, url, properties)
    try:
        rs = conn.getMetaData().getTables(None, None, table.upper(), None)
        try:
            return bool(rs.next())
        finally:
            rs.close()
    finally:
        conn.close()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    delete_where: str | None = None,
    batchsize: int = 1000,
    num_partitions: int | None = None,
    properties: Mapping[str, str] | None = None,
) -> None:
    """Idempotent JDBC load: optional scoped pre-DELETE, then parallel
    batched INSERTs.

    ``delete_where`` is the reference's per-series DELETE predicate
    (load_hicp_to_sql.py:54-62): re-running the same batch replaces it
    instead of duplicating. ``batchsize`` is the chunksize=200 knob
    (load_hicp_to_sql.py:99-100); ``num_partitions`` caps concurrent
    connections against the warehouse.
    """
    spark = df.sparkSession
    if delete_where:
        execute_update(spark, url, f"DELETE FROM {table} WHERE {delete_where}", properties)
    out = df.repartition(num_partitions) if num_partitions else df
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode("append")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    properties: Mapping[str, str] | None = None,
) -> DataFrame:
    """Read a warehouse table (or pushdown subquery) back as a DataFrame."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
