"""Row-level MERGE (upsert) emulation on plain parquet (SURVEY.md §2.7).

The reference's idempotency is delete-then-append at series granularity
(/root/reference/src/db/load_hicp_to_sql.py:54-62) — partition-scoped, not
row-scoped. ``merge_by_key`` provides the row-scoped form — the MERGE INTO
/ upsert every warehouse load eventually needs — without a transactional
table format: updates win over existing rows on the merge key, unmatched
existing rows survive, new keys are inserted.

Algorithm (Spark-first, no driver-side row handling):

1. Scope the read: when the target is partitioned, the rewrite set is the
   partitions present in ``updates`` PLUS any partition holding an updated
   key (found with one column-pruned key scan + left-semi join) — the
   latter is what makes partition-value changes correct: a key that moves
   from ``lang=en`` to ``lang=de`` must have its old row deleted from
   ``en``, which a naive replaceWhere-style merge silently skips. All
   other partitions are never opened.
2. ``updates UNION ALL scoped-target`` with a source-precedence literal,
   then one window (`row_number` per key, updates first) keeps the winner —
   the standard "latest wins" merge as a single shuffle on the merge key.
3. ``localCheckpoint`` materializes the merged rows before the overwrite —
   Spark cannot overwrite files it is still lazily reading from. Dynamic
   partition overwrite only replaces partitions PRESENT in the output, so
   a touched partition that the merge emptied is deleted explicitly via
   the Hadoop FS API (works on any supported filesystem). A production
   deployment on a transactional format (Delta/Iceberg MERGE) replaces
   step 3 with the format's own commit protocol; on raw parquet this is
   the price of self-overwrite.

Scale notes: cost is one shuffle over (updates + touched partitions) plus
one column-pruned key scan for moved-key detection (skippable via the
``keys_stay_in_partition`` flag when the partition column is a function of
the key — ingest date of an immutable record, tenant id). Partition the
target on the natural update-locality key so a merge touches few
partitions. Skewed merge keys behave like any skewed shuffle — AQE skew
handling applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from european_public_data_pipeline_spark.pipeline.fs_util import delete_path


def _delete_partition_dir(spark: SparkSession, target_path: str, part_dir: str) -> None:
    """Remove one emptied partition directory through the Hadoop FS API."""
    delete_path(spark, f"{target_path}/{part_dir}")


def _partition_dir_name(spark: SparkSession, partition_col: str, value_str: str | None) -> str:
    """Directory fragment (``col=escaped-value``) for one partition value,
    escaped by the SAME function Spark's file commit protocol uses
    (``ExternalCatalogUtils.getPartitionPathString``): Hive ``%XX`` escapes
    for ``/ : % #`` etc. and ``__HIVE_DEFAULT_PARTITION__`` for null/empty.
    A hand-built ``f"{col}={value}"`` would miss those encodings and leave
    an emptied partition's stale files readable — fatal for the
    right-to-erasure path.
    """
    jvm = spark.sparkContext._jvm
    utils = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    return utils.getPartitionPathString(partition_col, value_str)


def _collect_partition_values(
    df: DataFrame, partition_col: str
) -> tuple[list, set]:
    """Distinct partition values as ``(raw values, Spark-cast strings)``.

    The raw values feed ``isin`` filters (value space); the strings feed
    directory-name construction — cast WITH Spark so date/timestamp
    partitions render exactly as the writer renders them, not as Python
    ``str()`` would.
    """
    rows = (
        df.select(
            F.col(partition_col).alias("_v"),
            F.col(partition_col).cast("string").alias("_s"),
        )
        .distinct()
        .collect()
    )
    return [r["_v"] for r in rows], {r["_s"] for r in rows}


def _in_partitions(partition_col: str, touched: list) -> F.Column:
    """NULL-safe membership filter for partition scoping. ``isin`` is
    NULL-blind (``col.isin([None])`` is NULL, never true), which would
    EXCLUDE the null partition's rows from the scoped read while the
    write path still overwrites — or, in ``delete_by_key``, deletes —
    the ``__HIVE_DEFAULT_PARTITION__`` directory: silent loss of
    unrelated rows. Handle NULL explicitly."""
    non_null = [v for v in touched if v is not None]
    cond = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    if any(v is None for v in touched):
        cond = cond | F.col(partition_col).isNull()
    return cond


def resolve_latest_wins(
    updates: DataFrame,
    keys: list[str],
    order_col: str,
    caller: str,
) -> DataFrame:
    """Resolve duplicate merge keys inside one update batch: per key the
    row with the greatest ``order_col`` (a version/event-time column)
    wins — one window shuffle on the key. Ties on (keys, order_col)
    still raise: the winner would be nondeterministic, which is the bug
    this resolver exists to prevent, not to hide. Shared by the batch
    merges (``merge_by_key``, ``upsert_rows_mor``) and the streaming CDC
    sinks, whose ``availableNow`` trigger routinely coalesces a backlog
    holding several revisions of one key into a single micro-batch."""
    w_u = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    ranked = updates.withColumn("_urn", F.row_number().over(w_u)).withColumn(
        "_utie",
        F.count(F.lit(1)).over(Window.partitionBy(*keys, order_col)),
    )
    if ranked.filter((F.col("_urn") == 1) & (F.col("_utie") > 1)).limit(1).count():
        raise ValueError(
            f"{caller}: updates contain rows tied on "
            f"({', '.join(keys)}, {order_col}); the winner would "
            "be nondeterministic — use a unique ordering column"
        )
    return ranked.filter(F.col("_urn") == 1).drop("_urn", "_utie")


def merge_by_key(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
    keys_stay_in_partition: bool = False,
    allow_schema_evolution: bool = False,
    dedupe_updates_by: str | None = None,
) -> dict[str, int]:
    """Upsert ``updates`` into the parquet table at ``target_path``.

    Rows whose ``keys`` match an existing row replace it (even when the
    update moves the row to a different partition); new keys are appended;
    all other existing rows are preserved. ``keys_stay_in_partition=True``
    skips the moved-key scan when the partition value is known to be a
    function of the key. ``allow_schema_evolution=True`` permits updates
    to carry columns the target lacks (and vice versa) — missing columns
    fill with NULL on either side, the Delta-style additive evolution.
    After an evolving merge, untouched partitions keep their old file
    schema: readers must set ``mergeSchema=true`` (tested).

    Returns merge statistics — ``{"inserted": n, "updated": n,
    "unchanged_in_scope": n}`` — the accounting a transactional MERGE
    reports, computed from three key counts (updates, scoped target —
    column-pruned — and merged output, which is already checkpointed);
    "updated" means key-matched, whether or not any attribute changed.

    Duplicate merge keys WITHIN ``updates`` are an error (the same
    semantics as a transactional MERGE, which aborts on multiple source
    matches) — a silent arbitrary pick would be nondeterministic. Pass
    ``dedupe_updates_by=<column>`` to resolve them instead: per key the
    row with the greatest value of that column wins (a version/event-time
    column, expected unique per key — equal values still raise).
    """
    if dedupe_updates_by:
        updates = resolve_latest_wins(
            updates, keys, dedupe_updates_by, "merge_by_key"
        )
    else:
        # One aggregation job (map-side combined, short-circuits at the
        # first duplicate) instead of two full materializations of
        # ``updates`` — which would also re-execute an expensive or
        # non-deterministic source lineage twice per merge call (and per
        # streaming micro-batch via ``upsert_stream``).
        has_dup = (
            updates.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .count()
        )
        if has_dup:
            raise ValueError(
                f"merge_by_key: updates contain duplicate merge keys "
                f"({', '.join(keys)}); pass dedupe_updates_by=<ordering column> "
                "or pre-dedupe — an arbitrary winner would be nondeterministic"
            )
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
        return {
            "inserted": updates.count(),
            "updated": 0,
            "unchanged_in_scope": 0,
        }

    if partition_col:
        upd_parts = updates.select(partition_col).distinct()
        if keys_stay_in_partition:
            touched_df = upd_parts
        else:
            # Partitions holding an updated key (column-pruned key scan):
            # catches rows whose new partition value differs from the old.
            moved_parts = (
                target.join(updates.select(*keys).distinct(), keys, "left_semi")
                .select(partition_col)
                .distinct()
            )
            touched_df = upd_parts.union(moved_parts).distinct()
        touched, touched_str = _collect_partition_values(touched_df, partition_col)
        scoped = target.filter(_in_partitions(partition_col, touched))
    else:
        scoped = target

    scoped_keys_count = scoped.select(*keys).distinct().count()
    merged = (
        updates.withColumn("_src", F.lit(0))
        .unionByName(
            scoped.withColumn("_src", F.lit(1)),
            allowMissingColumns=allow_schema_evolution,
        )
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
        # Dynamic overwrite never touches partitions absent from the
        # output — delete any touched partition the merge emptied.
        _, out_str = _collect_partition_values(merged, partition_col)
        for s in touched_str - out_str:
            _delete_partition_dir(
                spark, target_path, _partition_dir_name(spark, partition_col, s)
            )
    else:
        merged.write.mode("overwrite").parquet(target_path)

    n_updates = updates.select(*keys).distinct().count()
    n_scoped = scoped_keys_count
    n_merged = merged.count()
    updated = n_updates + n_scoped - n_merged
    return {
        "inserted": n_updates - updated,
        "updated": updated,
        "unchanged_in_scope": n_scoped - updated,
    }


def delete_by_key(
    spark: SparkSession,
    target_path: str,
    delete_keys: DataFrame,
    keys: list[str],
    partition_col: str | None = None,
) -> dict[str, int]:
    """Hard delete by key (the right-to-erasure / retention primitive):
    remove every target row whose ``keys`` match a row of ``delete_keys``,
    rewriting ONLY the partitions that contain a matching key.

    Scale shape (same layout as ``merge_by_key``): locating the affected
    partitions is a column-pruned key scan + semi join; the rewrite is an
    anti join over just those partitions via dynamic partition overwrite;
    partitions without a matching key are never opened, let alone
    rewritten. A partition emptied by the delete is removed through the
    FS API (dynamic overwrite cannot express "write zero rows here").

    Returns ``{"deleted": n, "partitions_rewritten": n,
    "partitions_removed": n}`` — the audit numbers an erasure request
    must report. Deleting keys that do not exist is a no-op counted as 0.
    """
    dk = delete_keys.select(*keys).distinct()
    target = spark.read.parquet(target_path)

    if partition_col:
        touched, touched_str = _collect_partition_values(
            target.join(dk, keys, "left_semi"), partition_col
        )
        if not touched:
            return {"deleted": 0, "partitions_rewritten": 0, "partitions_removed": 0}
        scoped = target.filter(_in_partitions(partition_col, touched))
    else:
        scoped = target

    kept = scoped.join(dk, keys, "left_anti")
    n_scoped = scoped.count()
    # Materialize before overwriting the files the plan reads from.
    kept = kept.localCheckpoint(eager=True)
    n_kept = kept.count()

    if partition_col:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            kept.write.partitionBy(partition_col).mode("overwrite").parquet(
                target_path
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        _, out_str = _collect_partition_values(kept, partition_col)
        removed = 0
        for s in touched_str - out_str:
            _delete_partition_dir(
                spark, target_path, _partition_dir_name(spark, partition_col, s)
            )
            removed += 1
        return {
            "deleted": n_scoped - n_kept,
            "partitions_rewritten": len(touched) - removed,
            "partitions_removed": removed,
        }

    kept.write.mode("overwrite").parquet(target_path)
    return {
        "deleted": n_scoped - n_kept,
        "partitions_rewritten": 1,
        "partitions_removed": 0,
    }
