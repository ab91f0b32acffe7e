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

Rank normalization uses SAMPLED QUANTILE BINNING (one ``approxQuantile``
pass over both columns, then a JVM-side ``Bucketizer``) so skewed domains
still fill the key space uniformly. The naive alternative — a
``percent_rank`` window per column — single-partition-sorts the entire
write batch twice, which is exactly what a 100 TB layout utility must not
do; Greenwald-Khanna sketch boundaries give the same uniform fill with
one distributed pass and no global sort before the final range shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 10  # bits per dimension in the Morton code (1024 quantile bins)


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


def _quantile_splits(df: DataFrame, cols: list[str]) -> list[list[float]]:
    """Per-column strictly-increasing bucket boundaries from one
    approxQuantile (Greenwald-Khanna) pass over all columns at once."""
    nbins = 1 << ZBITS
    probs = [i / nbins for i in range(1, nbins)]
    all_cuts = df.stat.approxQuantile(cols, probs, 1.0 / (4 * nbins))
    splits = []
    for cuts in all_cuts:
        inner = sorted(set(cuts))  # skewed domains repeat boundaries; dedupe
        splits.append([float("-inf"), *inner, float("inf")])
    return splits


_ZORDERABLE = ("byte", "short", "integer", "long", "float", "double", "decimal")
_ZTEMPORAL = ("date", "timestamp", "timestamp_ntz")


def _zorder_key(df: DataFrame, name: str, alias: str) -> F.Column:
    """Quantile-rankable double for a z-order column; raises on types the
    quantile binning would silently corrupt (strings cast to NULL and all
    collapse into the single handleInvalid bucket, degenerating the Morton
    interleave into a sort on the other column)."""
    dtype = df.schema[name].dataType.typeName()
    if dtype in _ZORDERABLE or dtype.startswith("decimal"):
        return F.col(name).cast("double").alias(alias)
    if dtype in _ZTEMPORAL:
        # epoch seconds/days: order-preserving numeric image
        return F.col(name).cast("timestamp").cast("double").alias(alias)
    raise TypeError(
        f"zorder_by: column {name!r} has type {dtype}, which is not "
        "numeric, date, or timestamp — quantile binning would collapse it "
        "into one bucket. Cluster strings via cluster_by, or derive a "
        "numeric key (e.g. a hash or dictionary code) first."
    )


def zorder_by(df: DataFrame, col_a: str, col_b: str, n_files: int) -> DataFrame:
    """Morton-cluster on two NUMERIC-or-TEMPORAL columns: row groups cover
    small (a, b) rectangles, pruning predicates on either column. Other
    types raise ``TypeError`` (see ``_zorder_key``)."""
    from pyspark.ml.feature import Bucketizer

    cast = df.select(
        "*", _zorder_key(df, col_a, "_za"), _zorder_key(df, col_b, "_zb")
    )
    splits = _quantile_splits(cast, ["_za", "_zb"])
    bucketizer = Bucketizer(
        splitsArray=splits,
        inputCols=["_za", "_zb"],
        outputCols=["_zra", "_zrb"],
        handleInvalid="keep",  # null keys land in one extra trailing bucket
    )
    # Rescale each bucket index to the full 2^ZBITS range: a low-cardinality
    # column (e.g. 50 distinct quantities -> 50 buckets) would otherwise
    # occupy only the low bits and the interleave would degenerate into a
    # plain sort on the other column.
    nbins = 1 << ZBITS

    def scaled(col: str, n_buckets: int) -> F.Column:
        return F.floor(F.col(col).cast("long") * nbins / n_buckets).cast("long")

    keyed = bucketizer.transform(cast).withColumn(
        "_zkey",
        # bits+1: the handleInvalid="keep" null bucket rescales to exactly
        # 2^ZBITS, one past the largest quantile bin.
        _morton(
            scaled("_zra", len(splits[0]) - 1),
            scaled("_zrb", len(splits[1]) - 1),
            bits=ZBITS + 1,
        ),
    )
    return (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_za", "_zb", "_zra", "_zrb", "_zkey")
    )
