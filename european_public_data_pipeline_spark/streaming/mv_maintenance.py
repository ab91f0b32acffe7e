"""Streaming materialized-view maintenance via foreachBatch — q96's
algebraic aggregate merge applied continuously (SURVEY.md §2.11 / §2.7).

Each micro-batch is aggregated to the SAME storable partial state q96
maintains (count / exact centi-unit sum / min / max — every column
algebraic), then merged into the stored MV by unioning two
aggregate-sized relations and re-aggregating: the historical raw data is
never re-scanned, which is the entire point of an MV at 100 TB — the
refresh cost is O(batch + |MV|), not O(history).

The view's SHAPE comes from the same declarative ``MVSpec`` the
pull-based scheduler uses (``pipeline/mv_refresh.py``): ``maintain_mv``
maintains ANY spec continuously, and ``refresh_mv`` maintains the same
spec on a schedule — one algebra, two drivers, so a view can move
between the two (or run both against different sources) without
re-deriving its merge logic. ``*_event_summary`` are the original shape
(``EVENT_SUMMARY_SPEC``) expressed through the generic path.

Crash and replay safety — two layers:

1. The MV is stored through ``pipeline/manifest``'s versioned commit
   protocol, NOT a plain overwrite: each merge writes a NEW immutable
   data prefix and commits it by manifest + pointer swap. A crash
   mid-merge therefore cannot corrupt the current MV (the old version's
   files are never touched) — with a plain ``mode("overwrite")`` a crash
   after the delete phase would leave the MV unreadable, and the
   subsequent replay would silently REBUILD it from that one batch,
   losing all accumulated history (found by round-5 review).
2. A foreachBatch body can be re-invoked for the SAME batch_id after a
   crash; the MV carries the highest batch id it has absorbed
   (``applied_batch``) and a batch at or below it is a no-op —
   idempotence at batch granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.pipeline.manifest import (
    publish_version,
    read_version,
    versions,
)
from european_public_data_pipeline_spark.pipeline.mv_refresh import (
    EVENT_SUMMARY_SPEC,
    MVSpec,
)


def _batch_partial(batch_df: DataFrame, batch_id: int, spec: MVSpec) -> DataFrame:
    """The spec's algebraic state for one batch, stamped with the batch
    id (merged by max — the replay watermark)."""
    return spec.partial(batch_df).withColumn(
        "applied_batch", F.lit(batch_id).cast("long")
    )


def merge_mv(
    spark: SparkSession,
    mv_path: str,
    batch_df: DataFrame,
    batch_id: int,
    spec: MVSpec,
) -> None:
    """Merge one micro-batch into the MV at ``mv_path`` (idempotent per
    batch_id, crash-safe via versioned commits; see module docstring)."""
    partial = _batch_partial(batch_df, batch_id, spec)
    if not versions(spark, mv_path):
        publish_version(partial, mv_path)
        return
    # An empty batch contributes no groups AND cannot advance the max()
    # watermark — merging it would publish an identical MV version on
    # every replay forever (code-review r6). Nothing to absorb: return.
    if partial.limit(1).count() == 0:
        return
    mv = read_version(spark, mv_path)
    # max() over an EMPTY MV (a zero-row first batch) collects as None —
    # treat as "nothing absorbed yet", don't compare None >= int.
    last = mv.agg(F.max("applied_batch")).collect()[0][0]
    if last is not None and last >= batch_id:
        return  # replayed batch: already absorbed
    merged = spec.merge(
        mv, partial, extra=(F.max("applied_batch").alias("applied_batch"),)
    )
    publish_version(merged, mv_path)


def maintain_mv(
    stream_df: DataFrame, mv_path: str, checkpoint_path: str, spec: MVSpec
):
    """Run the maintenance over all available input (Trigger.AvailableNow).
    Re-invoking with the same checkpoint absorbs ONLY new input; the MV at
    ``mv_path`` always equals a full recompute over everything committed,
    and prior MV states remain time-travelable (manifest versions)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.foreachBatch(
            lambda df, bid: merge_mv(spark, mv_path, df, bid, spec)
        )
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def merge_event_summary(
    spark: SparkSession, mv_path: str, batch_df: DataFrame, batch_id: int
) -> None:
    """The original event-summary shape through the generic path."""
    merge_mv(spark, mv_path, batch_df, batch_id, EVENT_SUMMARY_SPEC)


def maintain_event_summary(stream_df: DataFrame, mv_path: str, checkpoint_path: str):
    return maintain_mv(stream_df, mv_path, checkpoint_path, EVENT_SUMMARY_SPEC)


def read_event_summary(spark: SparkSession, mv_path: str) -> DataFrame:
    """The current MV (manifest-committed view)."""
    return read_version(spark, mv_path)


def recompute_mv(src: DataFrame, spec: MVSpec) -> DataFrame:
    """The full-recompute twin (what the MV must always equal, minus the
    bookkeeping column)."""
    return spec.partial(src)


def recompute_event_summary(events: DataFrame) -> DataFrame:
    return recompute_mv(events, EVENT_SUMMARY_SPEC)
