"""Pull-based incremental MV refresh driven by the source table's
manifest log — the scheduled-job twin of ``streaming/mv_maintenance``
(which is push-based: a running stream hands it micro-batches).

A warehouse MV is usually refreshed by a scheduler, not a resident
stream: at each run, diff the source's manifest log since the last
APPLIED version (``read_incremental`` — O(delta) files planned from two
KB manifests), aggregate only the delta to the algebraic partial state,
merge it with the stored MV (two aggregate-sized relations — history is
never re-scanned), and commit the new MV version with the applied source
version in manifest ``meta``. Crash-safe and idempotent for free: the
MV commit is the versioned-manifest protocol (a crash mid-refresh leaves
the prior MV version intact and readable), and a re-run reads the
applied watermark from the committed meta, so refreshing twice is a
no-op.

File-level incremental reads are only exact for APPEND commits; two
distinct rewrite hazards are both detected, forcing a FULL recompute
(still correct, just not incremental — the documented cost of rewriting
an MV-feeding table; q97/q100's changelogs are the row-level
alternative):

1. A rewrite that BUMPS the version (compaction, full publish): the
   applied version's files are no longer a subset of the current list —
   file-set containment catches it.
2. ``purge_rows``, which rewrites history IN PLACE without bumping any
   version: containment still holds (every manifest was remapped
   consistently), so the MV meta additionally stores an md5 of the
   applied version's file list at refresh time; if the stored hash no
   longer matches that manifest's current file list, history changed
   under the MV and the aggregate must be rebuilt — this check runs even
   when the source version is unchanged, otherwise a purge with no
   subsequent append would leave the MV serving legally-erased rows
   forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.pipeline.manifest import (
    _read_json,
    current_version,
    publish_version,
    read_incremental,
    read_version,
    version_meta,
    versions,
)

_META_KEY = "applied_src_version"
_META_FILES_MD5 = "applied_src_files_md5"
_META_MODE = "refresh_mode"


def _files_md5(spark: SparkSession, table_path: str, version: int) -> str:
    import hashlib
    import json as _json

    files = _read_json(spark, f"{table_path}/manifest/{version:08d}.json")["files"]
    return hashlib.md5(_json.dumps(sorted(files)).encode()).hexdigest()


def _partial(events: DataFrame) -> DataFrame:
    """Algebraic per-event_type state: every column mergeable; money as
    exact centi-unit longs (q96's storable-MV recipe)."""
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_c"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def _merge(mv: DataFrame, partial: DataFrame) -> DataFrame:
    return (
        mv.unionByName(partial)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_c").alias("sum_value_c"),
            F.min("first_ts").alias("first_ts"),
            F.max("last_ts").alias("last_ts"),
        )
    )


def refresh_event_summary(
    spark: SparkSession, src_path: str, mv_path: str
) -> int:
    """Bring the MV at ``mv_path`` up to date with the source table at
    ``src_path``. Returns the source version now applied (unchanged on a
    no-op). O(delta + |MV|) when the source appended; O(source) full
    recompute when it was rewritten."""
    src_v = current_version(spark, src_path)
    meta = version_meta(spark, mv_path) if versions(spark, mv_path) else {}
    applied = int(meta.get(_META_KEY, 0))

    # purge_rows rewrites history in place without bumping versions: the
    # applied manifest's file list changing under the MV means the rows
    # the aggregate absorbed may no longer exist — rebuild, even when no
    # new source version arrived. An applied manifest that no longer
    # EXISTS (expire_versions retention GC dropped it) is the same
    # signal: the watermark's anchor is gone, so fall back to a full
    # recompute instead of failing every refresh forever.
    if applied == 0:
        history_intact = True
    else:
        try:
            history_intact = meta.get(_META_FILES_MD5) == _files_md5(
                spark, src_path, applied
            )
        except Exception:
            history_intact = False  # applied version expired/unreadable
    if applied >= src_v and history_intact:
        return applied  # nothing new — idempotent no-op

    incremental = False
    if applied > 0 and history_intact:
        old_files = set(
            _read_json(spark, f"{src_path}/manifest/{applied:08d}.json")["files"]
        )
        new_files = set(
            _read_json(spark, f"{src_path}/manifest/{src_v:08d}.json")["files"]
        )
        # Append chains keep every applied file; anything else (compact,
        # full publish) invalidates the file-level delta.
        incremental = old_files <= new_files

    if incremental:
        delta = read_incremental(spark, src_path, applied, src_v)
        merged = _merge(read_version(spark, mv_path), _partial(delta))
    else:
        merged = _partial(read_version(spark, src_path, src_v))
    publish_version(
        merged,
        mv_path,
        meta={
            _META_KEY: src_v,
            _META_FILES_MD5: _files_md5(spark, src_path, src_v),
            # Which branch produced this MV version — auditable from the
            # committed meta (q116 pins the hazard detector through the
            # driver hash by emitting these as result columns).
            _META_MODE: "incremental" if incremental else "full",
        },
    )
    return src_v
