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

The maintained view's SHAPE is a declarative ``MVSpec`` — group keys
plus re-aggregable measures (count/sum/min/max), the algebra whose
partial states merge exactly — so one refresh engine maintains any
number of views; ``refresh_mv(spark, src, mv, spec)`` is the generic
entry and ``refresh_event_summary`` is the original shape expressed as
a spec (``EVENT_SUMMARY_SPEC``). Non-re-aggregable measures (avg,
median, count-distinct) are refused at spec construction: derive avg
from sum+count downstream, and keep distincts in mergeable sketches
(q98's HLL rollup) — an MV that stored them directly could not merge
deltas without re-scanning history.

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

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
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

# The re-aggregable kinds: each partial state merges with the SAME
# associative fold, which is what lets ``_merge`` combine the stored MV
# with a delta partial without ever re-scanning history. (count merges
# by sum — a count of counts is meaningless.)
_MERGE_FN = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


@dataclass(frozen=True)
class Measure:
    """One maintained column: ``name`` in the MV, computed as
    ``kind(expr)`` over source rows. ``expr`` is a SQL expression string
    (kept as text so specs can be declared at import time, before any
    SparkSession exists); ``count`` ignores it."""

    name: str
    kind: str  # 'count' | 'sum' | 'min' | 'max'
    expr: str | None = None

    def __post_init__(self):
        if self.kind not in _MERGE_FN:
            raise ValueError(
                f"measure {self.name!r}: kind {self.kind!r} is not "
                f"re-aggregable — only {sorted(_MERGE_FN)} merge exactly "
                f"from partial states (derive avg from sum+count; keep "
                f"distincts in mergeable sketches, q98)"
            )
        if self.kind != "count" and not self.expr:
            raise ValueError(f"measure {self.name!r}: kind {self.kind!r} needs an expr")


@dataclass(frozen=True)
class MVSpec:
    """A maintained view's declarative shape: group keys + measures.
    Everything the refresh engine needs; the watermark/hazard machinery
    is shape-independent."""

    group_keys: tuple[str, ...]
    measures: tuple[Measure, ...] = field(default=())

    def __post_init__(self):
        if not self.group_keys or not self.measures:
            raise ValueError("MVSpec needs at least one group key and one measure")
        names = [m.name for m in self.measures]
        clash = set(names) & set(self.group_keys)
        if len(set(names)) != len(names) or clash:
            raise ValueError(f"MVSpec column names collide: {sorted(clash) or names}")

    def partial(self, src: DataFrame) -> DataFrame:
        """Aggregate source rows to the algebraic per-key state — every
        column mergeable (run over the full source on a rebuild, over
        just the delta on an incremental refresh)."""
        aggs: list[Column] = []
        for m in self.measures:
            if m.kind == "count":
                aggs.append(F.count(F.lit(1)).alias(m.name))
            else:
                aggs.append(_MERGE_FN[m.kind](F.expr(m.expr)).alias(m.name))
        return src.groupBy(*self.group_keys).agg(*aggs)

    def merge(
        self,
        mv: DataFrame,
        partial: DataFrame,
        extra: tuple[Column, ...] = (),
    ) -> DataFrame:
        """Fold a delta's partial state into the stored MV — two
        aggregate-sized relations, one shuffle on the group keys.
        (Counts merge by SUM — _MERGE_FN already encodes that.)
        ``extra``: additional aggregate columns carried by BOTH inputs
        (bookkeeping like streaming's applied-batch watermark) that
        merge alongside the measures."""
        return (
            mv.unionByName(partial)
            .groupBy(*self.group_keys)
            .agg(
                *[_MERGE_FN[m.kind](m.name).alias(m.name) for m in self.measures],
                *extra,
            )
        )


# The original hard-coded shape, now just a spec: per-event_type counts,
# exact centi-unit money (q96's storable-MV recipe), first/last seen.
EVENT_SUMMARY_SPEC = MVSpec(
    group_keys=("event_type",),
    measures=(
        Measure("n_events", "count"),
        Measure("sum_value_c", "sum", "CAST(ROUND(value * 100) AS BIGINT)"),
        Measure("first_ts", "min", "ts"),
        Measure("last_ts", "max", "ts"),
    ),
)

# A second maintained shape (q121): per-customer order totals over a
# manifest ``orders`` table — the 100 TB generalization of the
# reference's gold stage (load_hicp_to_sql.py:54-101), which is exactly
# a maintained downstream aggregate of silver.
ORDER_TOTALS_SPEC = MVSpec(
    group_keys=("o_custkey",),
    measures=(
        Measure("n_orders", "count"),
        Measure("sum_total_c", "sum", "CAST(ROUND(o_totalprice * 100) AS BIGINT)"),
        Measure("first_order", "min", "o_orderdate"),
        Measure("last_order", "max", "o_orderdate"),
    ),
)


def _files_md5(spark: SparkSession, table_path: str, version: int) -> str:
    import hashlib
    import json as _json

    files = _read_json(spark, f"{table_path}/manifest/{version:08d}.json")["files"]
    return hashlib.md5(_json.dumps(sorted(files)).encode()).hexdigest()


def _partial(events: DataFrame) -> DataFrame:
    """The event-summary partial (kept for tests and callers that treat
    the original shape directly)."""
    return EVENT_SUMMARY_SPEC.partial(events)


def _merge(mv: DataFrame, partial: DataFrame) -> DataFrame:
    return EVENT_SUMMARY_SPEC.merge(mv, partial)


def refresh_mv(
    spark: SparkSession, src_path: str, mv_path: str, spec: MVSpec
) -> int:
    """Bring the MV at ``mv_path`` (shape ``spec``) up to date with the
    source table at ``src_path``. Returns the source version now applied
    (unchanged on a no-op). O(delta + |MV|) when the source appended;
    O(source) full recompute when it was rewritten."""
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
        merged = spec.merge(read_version(spark, mv_path), spec.partial(delta))
    else:
        merged = spec.partial(read_version(spark, src_path, src_v))
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


def refresh_event_summary(
    spark: SparkSession, src_path: str, mv_path: str
) -> int:
    """The original event-summary view, maintained by the generic
    engine (shape: ``EVENT_SUMMARY_SPEC``)."""
    return refresh_mv(spark, src_path, mv_path, EVENT_SUMMARY_SPEC)


def _invertible(spec: MVSpec) -> None:
    """Changelog maintenance needs every measure INVERTIBLE (deletes
    subtract): count and sum are; min/max are not (removing the current
    minimum requires re-scanning the group — that is exactly the
    rewrite-hazard full recompute ``refresh_mv`` already performs).
    A count measure is additionally REQUIRED: it is the group's
    refcount — the only way to know a group emptied and must leave the
    view (a sum falling to 0 is not evidence of emptiness)."""
    bad = [m.name for m in spec.measures if m.kind not in ("count", "sum")]
    if bad:
        raise ValueError(
            f"changelog maintenance needs invertible measures; "
            f"{', '.join(bad)} is min/max — rebuild via refresh_mv's "
            f"full-recompute path instead"
        )
    if not any(m.kind == "count" for m in spec.measures):
        raise ValueError(
            "changelog maintenance needs a count measure (the group "
            "refcount that retires emptied groups from the view)"
        )


def changelog_partial(
    spec: MVSpec, changelog: DataFrame, weight_col: str = "__w"
) -> DataFrame:
    """Aggregate a WEIGHTED changelog (each row a source-row image with
    weight +1 added / -1 removed; an update contributes both images) to
    the spec's delta state: count deltas are weight sums, sum deltas are
    weight-scaled expression sums. One shuffle on the group keys, sized
    by the changelog — never the table."""
    _invertible(spec)
    aggs: list[Column] = []
    for m in spec.measures:
        if m.kind == "count":
            aggs.append(F.sum(F.col(weight_col)).cast("long").alias(m.name))
        else:  # sum
            aggs.append(
                F.sum(F.expr(m.expr) * F.col(weight_col)).alias(m.name)
            )
    return changelog.groupBy(*spec.group_keys).agg(*aggs)


def apply_changelog_mv(
    spark: SparkSession,
    mv_path: str,
    changelog: DataFrame,
    spec: MVSpec,
    weight_col: str = "__w",
) -> int:
    """Maintain the MV at ``mv_path`` from a ROW-LEVEL changelog — the
    Delta-CDF-style alternative to ``refresh_mv``'s file-level deltas
    for sources that UPDATE and DELETE in place (MERGE targets, SCD
    tables): file containment breaks on every such commit, so the
    file-level path would full-recompute each time, while a changelog
    (derived by q97/q100's snapshot diff, or emitted by the writer)
    folds in O(changelog + |MV|). Inserts add, deletes subtract, an
    update is its two images; groups whose count-refcount falls to zero
    leave the view (bit-parity with a direct recompute, which has no
    such group). Invertible measures only — ``_invertible`` refuses
    min/max loudly, full recompute being their documented path. The
    commit is the same versioned-manifest protocol as every other MV
    write (crash-safe, time-travelable); meta records the mode.
    Returns the committed MV version."""
    # Persist the delta around its two uses: the changelog is typically
    # an expensive derived plan (q97's snapshot diff), and the emptiness
    # probe plus the merge/publish would otherwise evaluate it twice.
    delta = changelog_partial(spec, changelog, weight_col).persist()
    try:
        have = versions(spark, mv_path)
        if delta.limit(1).count() == 0:
            # An empty changelog merges nothing — publishing would
            # commit an identical MV version on every idle cycle (the
            # streaming driver's empty-batch guard, same reasoning).
            return have[-1] if have else 0
        if have:
            merged = spec.merge(read_version(spark, mv_path), delta)
        else:
            merged = delta  # first build: the changelog IS the state so far
        refcount = next(m.name for m in spec.measures if m.kind == "count")
        merged = merged.filter(F.col(refcount) > 0)
        return publish_version(merged, mv_path, meta={_META_MODE: "changelog"})
    finally:
        delta.unpersist()
