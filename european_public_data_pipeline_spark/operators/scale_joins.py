"""Cluster-scale join strategies: bucketed co-located joins and skew
salting (SURVEY.md §4 — the partitioning techniques the 100 TB deployment
relies on; nothing here exists in the single-process reference).

- ``write_bucketed`` / ``bucketed_join``: pre-shuffle both fact tables into
  the same bucket layout at WRITE time (``bucketBy`` + ``sortBy``), so every
  subsequent equi-join on the bucket key is a zero-shuffle sort-merge join —
  the single biggest cost lever for repeated fact-fact joins at scale.
  tests/test_scale_joins.py asserts the physical plan contains NO shuffle
  exchange on the bucketed sides.

- ``salted_join``: hot-key mitigation when one side has pathological key
  skew (one user = 30% of events). The skewed side gets a deterministic
  salt (hash of a secondary column, NOT a random number — reproducibility),
  the small side is replicated once per salt value, and the join key becomes
  (key, salt) — the hot key's rows spread over ``n_salts`` reducers instead
  of one straggler. AQE's skew-join handles moderate skew automatically;
  explicit salting is for the extreme tail and for deterministic layout.

Both helpers return plain DataFrames: they compose with every other
operator in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed, sorted managed table: the one-time shuffle
    that makes every later join/aggregation on ``bucket_col`` shuffle-free."""
    w = df.write.bucketBy(n_buckets, bucket_col).sortBy(sort_col or bucket_col)
    w.mode("overwrite").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on the bucket key: Catalyst
    recognizes the matching output partitioning and plans a sort-merge join
    with no Exchange on either side. The merge hint pins the SMJ strategy
    (at toy scale AQE would otherwise pick broadcast and hide the
    co-location property this helper exists to exploit)."""
    return spark.table(left_table).hint("merge").join(spark.table(right_table), key)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with the skewed side salted across ``n_salts`` sub-keys.

    ``salt_source``: a column on the skewed side whose hash spreads the hot
    key's rows (e.g. an event id); defaults to the whole row's first column.
    The small side is exploded once per salt value (size x n_salts — cheap
    when the small side is dimension-sized).
    """
    src = salt_source or skewed.columns[0]
    salted_left = skewed.withColumn(
        "_salt", (F.abs(F.hash(F.col(src))) % n_salts).cast("int")
    )
    replicated_right = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )
    out = salted_left.join(replicated_right, [key, "_salt"])
    return out.drop("_salt")
