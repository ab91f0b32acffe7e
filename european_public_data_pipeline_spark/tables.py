"""Table loaders for the driver's synthetic star schema (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf directory.

``load_tables`` reads them lazily (a Spark read is just a plan node), and
``register_views`` exposes them as temp views so SQL and DataFrame code share
one catalog. At cluster scale the same names would come from a real catalog
(Hive/Unity/Glue); this module is the only place that would change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts is parquet INT64 TIMESTAMP(NANOS) — not a legal Spark
        # type. Read the raw nanos as LongType (runtime-settable conf, so
        # this works under any caller-provided session) and convert to
        # Spark's native µs timestamp. The synthetic data is NOT µs-aligned
        # (most rows carry sub-µs nanos), so `div 1000` TRUNCATES — every
        # events oracle must therefore µs-truncate too
        # (CAST(ts AS TIMESTAMP) / epoch_us arithmetic) rather than rely on
        # the reader's ns behavior.
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view; returns the DataFrames too."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
