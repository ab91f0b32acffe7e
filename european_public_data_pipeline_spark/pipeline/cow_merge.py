"""Copy-on-write MERGE INTO a versioned-manifest table (SURVEY.md §2.7
scaled onto §2.1 S11) — Iceberg's COW ``MERGE INTO`` on this repo's
manifest format, completing the write-side triangle:

- ``pipeline/merge.py merge_by_key``: row-level MERGE on plain
  partitioned parquet (partition-scoped rewrites, q113).
- ``pipeline/manifest.py``: versioned manifests with snapshot isolation,
  appends that carry files by reference, and commit-kind tags.
- THIS module: MERGE against a manifest table that rewrites ONLY the
  files containing matched keys — every untouched file is carried by
  reference into the new version — and can hand back the row-level
  changelog the merge implies, which ``apply_changelog_mv`` folds into
  downstream MVs at O(changelog + |MV|).

Why this is the 100 TB shape: a day's upsert batch touches a bounded
key range; with the table range-clustered on the merge key (compact
``cluster_by``), zone maps prove most files CANNOT contain a matched
key and the rewrite is O(touched files + batch), never O(table). The
commit is the standard immutable-manifest protocol — readers mid-merge
see the prior version, a crash leaves it current, and time travel to
pre-merge versions keeps working. The commit is tagged ``overwrite``
(rows changed — file-level incremental consumers MUST NOT treat it as
an append); the emitted changelog is exactly the row-level delta those
consumers need instead (Delta CDF's Change Data Feed, emitted by the
writer rather than re-derived by q97's snapshot diff).

Algorithm (one metadata read + two bounded scans + one batch write):

1. Zone-map candidate pruning: files whose recorded [min, max] on the
   first merge key cannot intersect the update batch's key range are
   carried without being read (``prune_candidates`` — conservative: files
   without stats stay candidates).
2. ONE scan of the candidate files, grouped by ``input_file_name``
   (never a per-file job storm), counts each file's total rows and
   matched rows against the broadcast update-key set. Files with zero
   matches join the carried set.
3. Affected files' surviving rows (anti join on the keys) UNION the
   full update batch are written as the staged batch; the new manifest
   is carried files + staged files (``_commit`` — concurrent-publisher
   safe, purge-fenced, schema-merged additively).

Changelog emission (``emit_changelog=True``): old images of matched
rows at weight -1 (read lazily from the PRIOR version's affected files,
which the prior manifest still references — consume before expiring
it), update rows at weight +1. Per-key weight sums are 0 (update) or
+1 (insert) by construction, satisfying ``apply_changelog_mv``'s
invariant. Duplicate keys in one update batch are refused loudly (the
same guard ``merge_by_key`` applies): two images for one key would
corrupt both the merge result and the changelog's refcounts.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.pipeline.fs_util import (
    delete_path,
    hadoop_fs,
)
from european_public_data_pipeline_spark.pipeline.manifest import (
    ConcurrentPublishError,
    PurgeInFlightError,
    _list_parquet,
    _changelog_stage_dir,
    _commit,
    _path_key,
    _read_files_live,
    _read_json,
    _stage_dir,
    current_version,
    prune_candidates,
    read_changelog,
    refuse_null_keys,
    versions,
)


def _refuse_duplicate_keys(updates: DataFrame, keys: list[str]) -> None:
    dup = (
        updates.groupBy(*keys)
        .count()
        .filter(F.col("count") > 1)
        .limit(3)
        .collect()
    )
    if dup:
        raise ValueError(
            "merge_into_manifest: update batch carries duplicate merge "
            "keys (first offenders: "
            + ", ".join(str(tuple(r[k] for k in keys)) for r in dup)
            + ") — resolve to one row per key upstream (latest-wins "
            "window), or the merge result and changelog are ambiguous"
        )


# NULL-key refusal is shared with the MOR delete writer
# (manifest.refuse_null_keys) — one guard, one message, no drift.


def merge_into_manifest(
    spark: SparkSession,
    table_path: str,
    updates: DataFrame,
    keys: list[str],
    emit_changelog: bool = False,
    deletes: DataFrame | None = None,
    persist_changelog: bool = False,
) -> dict:
    """MERGE ``updates`` into the manifest table's current version:
    key-matched rows are replaced by their update row, new keys are
    inserted, unmatched target rows survive untouched — and only the
    FILES containing matched keys are rewritten; everything else is
    carried by reference. ``deletes`` (key columns; extra columns
    ignored) adds the WHEN-MATCHED-DELETE clause: target rows with
    those keys are removed (a key absent from the target is a no-op; a
    key in BOTH updates and deletes is refused — ambiguous). Commits
    one new version (op ``overwrite``) and returns ``{"version",
    "files_rewritten", "files_carried", "files_pruned", "rows_matched",
    "rows_deleted", "changelog"}`` — ``changelog`` (only with
    ``emit_changelog``) is a lazy DataFrame of weighted row images
    (+1 insert/new image, -1 old/deleted image) for
    ``apply_changelog_mv``; consume it before the PRIOR version is
    expired (its old files back the -1 images).

    ``persist_changelog`` additionally MATERIALIZES those images under
    ``{table}/changelog/v{version}-<uuid>/`` and records the file list
    in the commit's manifest (Delta CDF's Change Data Feed persisted by
    the writer): ``manifest.read_changelog`` serves it later, it
    survives the prior version's expiry, and — the point —
    ``refresh_mv``'s chain walk folds it across this otherwise-opaque
    overwrite commit, so a downstream MV stays O(delta + |MV|) across
    routine merges instead of paying an O(source) rebuild. Costs one
    extra O(changelog) write inside the commit; the returned
    ``changelog`` is then the persisted copy (stable under re-reads).

    Like ``append_version``, the merge chains off the HIGHEST committed
    version, not the LATEST pointer — after a ``rollback`` the next
    manifest number is already taken, and a pointer-based merge would
    collide with it forever; compact first if resurrecting the
    rolled-back-from rows is not intended."""
    vs = versions(spark, table_path)
    if not vs:
        raise FileNotFoundError(f"no committed manifests at {table_path}")
    # ONE stable snapshot of the batch for its many uses (dup check,
    # prune collect, counting scan, staged write, post-commit changelog
    # images): a non-deterministic or expensive updates plan would
    # otherwise re-evaluate per use — the staged write could commit
    # different rows than the changelog reports (the hazard merge.py
    # handles the same way). Eager, batch-sized.
    updates = updates.localCheckpoint()
    _refuse_duplicate_keys(updates, keys)
    refuse_null_keys(updates, keys, "merge_into_manifest: update batch")
    if deletes is not None:
        deletes = deletes.select(*keys).distinct().localCheckpoint()
        refuse_null_keys(deletes, keys, "merge_into_manifest: delete batch")
        # No broadcast hint: the batch size is UNKNOWN at this point
        # (the full-tuple cap collect happens later) — an unconditional
        # hint on a 100M-key update batch would force the same
        # multi-GB broadcast build the counting scan's cap exists to
        # prevent. Catalyst picks broadcast itself off the checkpointed
        # sizes when the sides are small.
        overlap = (
            deletes.join(updates.select(*keys), on=keys, how="left_semi")
            .limit(3)
            .collect()
        )
        if overlap:
            raise ValueError(
                "merge_into_manifest: keys present in BOTH updates and "
                "deletes (first offenders: "
                + ", ".join(str(tuple(r[k] for k in keys)) for r in overlap)
                + ") — one clause per key; resolve the intent upstream"
            )
    t_read = time.time()  # carried-list read time (purge-fence TTL)
    head = vs[-1]
    m = _read_json(spark, f"{table_path}/manifest/{head:08d}.json")

    # 1. Zone-map pruning on EVERY merge key with recorded stats,
    # candidate sets intersected: a file survives only if, for each such
    # key, its [min, max] interval can hold one of the batch's values
    # for that key — a two-key merge prunes on both columns, not just
    # keys[0]. A single [lo, hi] envelope of the batch is useless for
    # the common mixed batch (updates in one range + inserts far above
    # the table's max stretch it over every file), so each file is
    # probed against the SORTED distinct value set (bisect — any value
    # inside the interval keeps the file). The batch's distinct key
    # TUPLES are collected only up to a cap; past it, fall back to
    # per-key envelopes (a batch that large touches most files anyway).
    # Conservative throughout: files without stats for a key pass that
    # key's test, all-NULL zones can hold no value (NULL keys were
    # refused above).
    all_keys = updates.select(*keys)
    if deletes is not None:
        all_keys = all_keys.unionByName(deletes)
    # 256k key tuples ≈ a few MB driver-side — cheap next to the scan a
    # failed prune costs (measured: a 170k-key batch over the old 64k
    # cap fell back to the envelope, pruned nothing, and paid a full-
    # table counting scan). The count is over the FULL key tuple, not
    # keys[0] alone: broadcast safety below rides on this flag, and a
    # composite key whose leading column is low-cardinality could pass
    # a key0-only cap while the probe relation (distinct full tuples)
    # is orders of magnitude larger — exactly the OOM the cap prevents.
    cap = 262144
    tuple_rows = all_keys.distinct().limit(cap + 1).collect()
    small_batch = len(tuple_rows) <= cap
    if small_batch:
        candidates = prune_candidates(m, keys, key_tuples=tuple_rows)
    else:
        aggs = []
        for k in keys:
            aggs += [F.min(k).alias(f"lo_{k}"), F.max(k).alias(f"hi_{k}")]
        env = all_keys.agg(*aggs).collect()[0]
        candidates = prune_candidates(
            m,
            keys,
            envelope={k: (env[f"lo_{k}"], env[f"hi_{k}"]) for k in keys},
        )
    cand_set = set(candidates)
    pruned = [f for f in m["files"] if f not in cand_set]

    # 2. One counting scan over the candidates: per-file totals +
    # matched update/delete counts against the key set (one flagged
    # relation — overlap was refused, so each key carries exactly one
    # flag). The broadcast hint is applied only when the FULL-TUPLE
    # distinct count is known small (the prune collect above bounded
    # it): an unconditional hint on a 100M-key batch would force a
    # multi-GB broadcast build instead of letting the join shuffle.
    upd_probe = updates.select(*keys).distinct().select(
        "*", F.lit(1).alias("__mu"), F.lit(None).cast("int").alias("__md")
    )
    if deletes is not None:
        probe = upd_probe.unionByName(
            deletes.select(
                "*",
                F.lit(None).cast("int").alias("__mu"),
                F.lit(1).alias("__md"),
            )
        )
    else:
        probe = upd_probe
    key_set = F.broadcast(probe) if small_batch else probe
    affected: list[str] = []
    by_key: dict[str, tuple[int, int, int]] = {}
    rows_matched = 0
    rows_deleted = 0
    if candidates:
        # input_file_name is resolved BEFORE any join (the live reader
        # captures it AT SCAN into __f): it is only defined on scan-side
        # rows, and a plan that shuffled the probe side (hint not
        # honored) — or the live reader's own delete anti joins — would
        # silently blank it after. The LIVE read also makes the counting
        # scan net of merge-on-read sidecars: a row an earlier delete
        # already killed neither matches nor counts toward file totals,
        # keeping carried-row arithmetic consistent with the manifest's
        # (net) row_count.
        tgt = _read_files_live(spark, m, candidates, file_col="__f").select(
            "__f", *keys
        )
        counts = (
            tgt.join(key_set, on=keys, how="left")
            .groupBy("__f")
            .agg(
                F.count(F.lit(1)).alias("total"),
                F.count("__mu").alias("matched"),
                F.count("__md").alias("deleted"),
            )
            .collect()
        )
        by_key = {
            _path_key(r["__f"]): (
                int(r["total"]), int(r["matched"]), int(r["deleted"])
            )
            for r in counts
        }
        for f in candidates:
            _t, mu, md = by_key.get(_path_key(f), (0, 0, 0))
            if mu + md > 0:
                affected.append(f)
                rows_matched += mu
                rows_deleted += md
    affected_set = set(affected)
    carried = [f for f in m["files"] if f not in affected_set]
    probe_keys = F.broadcast(probe.select(*keys)) if small_batch else (
        probe.select(*keys)
    )

    # 3. Staged batch: affected files' survivors (neither updated nor
    # deleted) + the whole update batch, one write job. Updates may
    # carry NEW columns (additive evolution — _commit merges schemas);
    # survivors NULL-backfill.
    if affected:
        # Live read: a rewritten file FOLDS its applicable delete
        # sidecars — sidecar-dead rows are not resurrected into the
        # staged batch (the staged files enter file_added at the new
        # version, past every recorded sidecar).
        survivors = _read_files_live(spark, m, affected).join(
            probe_keys, on=keys, how="left_anti"
        )
        staged_df = survivors.unionByName(updates, allowMissingColumns=True)
    else:
        staged_df = updates
    n = head + 1
    data_dir = _stage_dir(table_path, n)
    staged_df.write.mode("overwrite").parquet(data_dir)

    # Weighted row images (built lazily; evaluated only if emitted or
    # persisted): old images of matched/deleted rows at -1, update rows
    # at +1 — per-key weight sums 0 (update) / +1 (insert) / -1 (delete)
    # by construction, apply_changelog_mv's invariant.
    changelog_df: DataFrame | None = None
    if emit_changelog or persist_changelog:
        new_images = updates.select("*", F.lit(1).alias("__w"))
        if affected:
            # Live read: a sidecar-dead row produces no -1 image (it
            # was never visible, so it contributes nothing to fold).
            old_images = (
                _read_files_live(spark, m, affected)
                .join(probe_keys, on=keys, how="left_semi")
                .select("*", F.lit(-1).alias("__w"))
            )
            changelog_df = old_images.unionByName(
                new_images, allowMissingColumns=True
            )
        else:
            changelog_df = new_images

    extra_payload = None
    cl_dir = None
    if persist_changelog:
        # Staged BEFORE the manifest commit so the commit can reference
        # it atomically; uuid-prefixed, so a lost commit race (cleaned
        # up below) or a crash (reclaimed age-fenced by vacuum_orphans)
        # never collides with the winner's changelog.
        cl_dir = _changelog_stage_dir(table_path, n)
        # A bounded batch's changelog is KB-to-MB scale but inherits the
        # update batch's partitioning (measured: a 9k-image changelog
        # written as 34 near-empty files cost every later read ~60ms of
        # footer overhead PER FILE — the fold paid more for file opens
        # than for rows). Coalesce when the batch is known small; a
        # past-cap batch keeps its write parallelism.
        if small_batch:
            changelog_df = changelog_df.coalesce(4)
        changelog_df.write.mode("overwrite").parquet(cl_dir)
        jvm, fs, _ = hadoop_fs(spark, cl_dir)
        cl_files = _list_parquet(jvm, fs, cl_dir)
        extra_payload = {
            "changelog_files": cl_files,
            "changelog_weight_col": "__w",
        }

    carried_rows = int(m["row_count"]) - sum(
        by_key.get(_path_key(f), (0, 0, 0))[0] for f in affected
    )
    carried_stats = None
    stat_cols: set[str] = set()
    if m.get("file_stats"):
        carried_set = {_path_key(f) for f in carried}
        carried_stats = {
            k: v for k, v in m["file_stats"].items() if k in carried_set
        }
        # Zone maps for the STAGED files too, for every column the
        # prior version tracked (compact's discipline) — without this,
        # stats coverage decays monotonically on merge-heavy tables and
        # the NEXT merge's prune degrades file by file.
        stat_cols = {
            c for per_file in m["file_stats"].values() for c in per_file
        }
    try:
        version = _commit(
            spark,
            table_path,
            n,
            data_dir,
            carried_files=tuple(carried),
            carried_rows=carried_rows,
            meta=m.get("meta"),
            stats_cols=tuple(sorted(stat_cols)),
            carried_stats=carried_stats,
            carried_schema=m.get("schema"),
            carried_read_at=t_read,
            op="overwrite",
            extra_payload=extra_payload,
            # Merge-on-read state carries: untouched files keep their
            # applicable sidecars (entries skip the rewritten files
            # naturally — their file_added is the NEW version, past
            # every recorded sidecar, and their deletes were folded).
            carried_delete_entries=m.get("delete_files"),
            # Always a dict (not None) when sidecars exist: _commit then
            # records the staged files at the NEW version — without it,
            # the rewrites would default to version 0 and every sidecar
            # would re-apply to them.
            carried_file_added=(
                {
                    k: v
                    for k, v in (m.get("file_added") or {}).items()
                    if k in {_path_key(f) for f in carried}
                }
                if m.get("delete_files") or m.get("file_added")
                else None
            ),
        )
    except (ConcurrentPublishError, PurgeInFlightError):
        # _commit already reclaimed OUR staged data dir; the staged
        # changelog is equally ours-and-unreferenced — reclaim it too.
        if cl_dir is not None:
            delete_path(spark, cl_dir)
        raise
    out = {
        "version": version,
        "files_rewritten": len(affected),
        "files_carried": len(carried),
        "files_pruned": len(pruned),
        "rows_matched": rows_matched,
        "rows_deleted": rows_deleted,
    }
    if persist_changelog:
        # The PERSISTED copy: stable under re-reads and prior-version
        # expiry, unlike the lazy plan.
        out["changelog"] = read_changelog(spark, table_path, version)
    elif emit_changelog:
        out["changelog"] = changelog_df
    return out
