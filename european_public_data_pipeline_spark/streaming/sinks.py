"""Exactly-once streaming sink via foreachBatch + checkpointing
(SURVEY.md §2.11 / §4 "incremental processing").

The reference's incremental model is "re-run on the newest blob"
(/root/reference/src/storage/blob.py:55-60) with idempotency by
delete-then-append (load_hicp_to_sql.py:54-62). The Spark-native form is a
checkpointed stream with an idempotent batch writer:

- the checkpoint records which source files/offsets are committed — a
  restarted query resumes AFTER them (nothing reprocessed, nothing lost);
- ``foreachBatch`` writes each micro-batch to a ``batch_id=N`` partition
  with overwrite, so a batch retried after a mid-write crash replaces its
  own partial output instead of duplicating it (idempotence at batch
  granularity = exactly-once end-to-end for a deterministic batch).

This is the production landing pattern for any file/warehouse sink that
lacks transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_stream_exactly_once(
    stream_df: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    await_termination: bool = True,
):
    """Run the stream over all available input (Trigger.AvailableNow) into
    a parquet sink with exactly-once semantics. Returns the query handle.

    Re-invoking with the same checkpoint processes ONLY new input; a batch
    retried after a failure overwrites its own ``batch_id`` partition.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite").parquet(
                f"{sink_path}/batch_id={batch_id}"
            )
        )

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def upsert_stream(
    stream_df: DataFrame,
    target_path: str,
    checkpoint_path: str,
    keys: list[str],
    dedupe_updates_by: str,
    partition_col: str | None = None,
    await_termination: bool = True,
):
    """Streaming UPSERT sink: each micro-batch merges into the target by
    key (latest ``dedupe_updates_by`` wins) via ``pipeline.merge
    .merge_by_key`` — the foreachBatch + MERGE landing pattern for CDC-like
    streams where rows are revisions, not events.

    Exactly-once composition: the checkpoint deduplicates INPUT (a restarted
    query never re-reads committed files) and the merge deduplicates OUTPUT
    (a batch retried after a mid-write crash rewrites the same keys to the
    same values — idempotent), so replays cannot double-apply.
    """
    from european_public_data_pipeline_spark.pipeline.merge import merge_by_key

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_by_key(
            batch_df.sparkSession,
            target_path,
            batch_df,
            keys,
            partition_col=partition_col,
            dedupe_updates_by=dedupe_updates_by,
        )

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def upsert_stream_manifest(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_path: str,
    keys: list[str],
    persist_changelog: bool = True,
    dedupe_updates_by: str | None = None,
    mode: str = "cow",
    await_termination: bool = True,
):
    """Streaming CDC upsert into a VERSIONED-MANIFEST table — the
    lakehouse upgrade of ``upsert_stream``: each micro-batch lands as
    ONE commit (zone-map pruned, snapshot-isolated, time-travelable),
    and with ``persist_changelog`` every commit materializes its
    row-level delta, so a downstream MV maintained by ``refresh_mv``
    keeps folding at O(delta + |MV|) across the stream's merges instead
    of full-recomputing per commit — the end-to-end CDC shape: stream ->
    merge commits -> persisted CDF -> scheduled pull refresh.

    ``mode`` picks the write shape per the table's workload:
    ``"cow"`` (default) is ``merge_into_manifest`` — rewrite the
    touched files, right for bounded batches against a clustered table
    (no scan rent accrues); ``"mor"`` is ``upsert_rows_mor`` — one
    KB-scale delete sidecar + one small image file per micro-batch,
    O(batch) written bytes regardless of how scattered the keys are,
    which is what an hourly trickle of 1k CDC keys against a 100 TB
    table needs (COW would rewrite ~1k files per batch). MOR batches
    accrue a broadcast-anti-join scan rent until the next ``compact``
    (see ``maintain`` for the threshold-driven fold).

    ``dedupe_updates_by=<ordering column>`` resolves several revisions
    of one key WITHIN a micro-batch latest-wins BEFORE the merge —
    routine under ``availableNow``, which coalesces a whole backlog
    into one batch; without it duplicate keys are refused by the merge
    (crashing the stream is the alternative, not silently picking a
    winner). Ties on the ordering column still raise.

    Exactly-once composition: the checkpoint deduplicates INPUT (a
    restarted query never re-reads committed files), and a batch
    retried after a mid-commit crash re-merges the same rows onto the
    same keys — the end state is identical and the extra version's
    changelog folds to a net-zero delta (each key's -1 old image equals
    its +1 new image). Empty micro-batches commit nothing."""
    if mode not in ("cow", "mor"):
        raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
    from european_public_data_pipeline_spark.pipeline.cow_merge import (
        merge_into_manifest,
    )
    from european_public_data_pipeline_spark.pipeline.merge import (
        resolve_latest_wins,
    )
    from european_public_data_pipeline_spark.pipeline.mor_delete import (
        upsert_rows_mor,
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # idle trigger: no version, no empty changelog
        if mode == "mor":
            upsert_rows_mor(
                batch_df.sparkSession,
                table_path,
                batch_df,
                keys=keys,
                persist_changelog=persist_changelog,
                dedupe_updates_by=dedupe_updates_by,
            )
            return
        if dedupe_updates_by:
            batch_df = resolve_latest_wins(
                batch_df, keys, dedupe_updates_by, "upsert_stream_manifest"
            )
        merge_into_manifest(
            batch_df.sparkSession,
            table_path,
            batch_df,
            keys=keys,
            persist_changelog=persist_changelog,
        )

    q = (
        stream_df.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
