"""Physical data layout for scan pruning (SURVEY.md §4).

Parquet readers skip row groups whose column min/max statistics exclude
the query predicate — but statistics only prune if the data is laid out
so ranges are narrow. Two layouts:

- ``cluster_by``: range-repartition + sort on one ordering — row groups
  become non-overlapping intervals of the clustering key, so a range
  predicate on it touches O(selectivity) of the file bytes. The right
  layout when one column dominates predicates (usually event time).
- ``zorder_by``: interleave the bits of two rank-normalized keys into one
  Morton code and cluster by it — each row group covers a small rectangle
  in (a, b) space, so predicates on EITHER column prune (weaker per
  column than a dedicated sort, but covering both at once). The classic
  multi-dimensional clustering trick (public: Morton 1966, used by every
  lakehouse engine).

Rank normalization uses ``percent_rank`` over each column so skewed
domains still fill the key space uniformly — one window per column over
the write batch, then one range shuffle; at 100 TB this runs per
partition/ingest batch, not over the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ZBITS = 16  # bits per dimension in the Morton code


def cluster_by(df: DataFrame, cols: list[str], n_files: int) -> DataFrame:
    """Range-cluster: non-overlapping row groups along ``cols``."""
    return df.repartitionByRange(n_files, *cols).sortWithinPartitions(*cols)


def _morton(a: F.Column, b: F.Column, bits: int = ZBITS) -> F.Column:
    """Interleave the low ``bits`` of two non-negative ints (a even
    positions, b odd)."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            a.bitwiseAND(F.lit(1 << i)).cast("long") * F.lit(1 << i)
        ).bitwiseOR(
            b.bitwiseAND(F.lit(1 << i)).cast("long") * F.lit(1 << (i + 1))
        )
    return key


def zorder_by(df: DataFrame, col_a: str, col_b: str, n_files: int) -> DataFrame:
    """Morton-cluster on two columns: row groups cover small (a, b)
    rectangles, pruning predicates on either column."""
    scale = (1 << ZBITS) - 1
    wa = Window.orderBy(col_a)
    wb = Window.orderBy(col_b)
    ra = F.floor(F.percent_rank().over(wa) * scale).cast("long")
    rb = F.floor(F.percent_rank().over(wb) * scale).cast("long")
    keyed = df.withColumn("_zkey", _morton(ra, rb))
    return (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
