"""Row-level MERGE (upsert) emulation on plain parquet (SURVEY.md §2.7).

The reference's idempotency is delete-then-append at series granularity
(/root/reference/src/db/load_hicp_to_sql.py:54-62) — partition-scoped, not
row-scoped. ``merge_by_key`` provides the row-scoped form — the MERGE INTO
/ upsert every warehouse load eventually needs — without a transactional
table format: updates win over existing rows on the merge key, unmatched
existing rows survive, new keys are inserted.

Algorithm (Spark-first, no driver-side row handling):

1. Scope the read: when the target is partitioned, only partitions that
   appear in ``updates`` are read (partition pruning) and rewritten
   (dynamic partition overwrite) — untouched partitions are never opened.
2. ``updates UNION ALL scoped-target`` with a source-precedence literal,
   then one window (`row_number` per key, updates first) keeps the winner —
   the standard "latest wins" merge as a single shuffle on the merge key.
3. ``localCheckpoint`` materializes the merged rows before the overwrite —
   Spark cannot overwrite files it is still lazily reading from. A
   production deployment on a transactional format (Delta/Iceberg MERGE)
   replaces step 3 with the format's own commit protocol; on raw parquet
   the checkpoint is the price of self-overwrite.

Scale notes: cost is one shuffle over (updates + touched partitions), not
the whole table. Partition the target on the natural update-locality key
(ingest date, tenant, geo) so a merge touches few partitions. Skewed merge
keys behave like any skewed shuffle — AQE skew handling applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def merge_by_key(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
) -> None:
    """Upsert ``updates`` into the parquet table at ``target_path``.

    Rows whose ``keys`` match an existing row replace it; new keys are
    appended; all other existing rows are preserved. When ``partition_col``
    is given, only partitions present in ``updates`` are read or rewritten.
    """
    try:
        target = spark.read.parquet(target_path)
        exists = True
    except AnalysisException:
        exists = False

    if not exists:
        writer = updates.write.mode("overwrite")
        if partition_col:
            writer = writer.partitionBy(partition_col)
        writer.parquet(target_path)
        return

    if partition_col:
        touched = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        scoped = target.filter(F.col(partition_col).isin(touched))
    else:
        scoped = target

    merged = (
        updates.withColumn("_src", F.lit(0))
        .unionByName(scoped.withColumn("_src", F.lit(1)))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy("_src")
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )

    # Materialize before overwriting the files the plan reads from.
    merged = merged.localCheckpoint(eager=True)

    if partition_col:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.partitionBy(partition_col).mode("overwrite").parquet(
                target_path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    else:
        merged.write.mode("overwrite").parquet(target_path)
