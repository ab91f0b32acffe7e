"""Pull-based incremental MV refresh: manifest-log-driven deltas must
equal a full recompute, re-runs must be no-ops, and source rewrites must
trigger the documented full-recompute fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from european_public_data_pipeline_spark.pipeline.manifest import (
    append_version,
    compact,
    current_version,
    version_meta,
)
from european_public_data_pipeline_spark.pipeline.mv_refresh import (
    _partial,
    refresh_event_summary,
)
from european_public_data_pipeline_spark.tables import load_table


def _mv_rows(spark, mv_path):
    from european_public_data_pipeline_spark.pipeline.manifest import read_version

    return {
        r["event_type"]: (r["n_events"], r["sum_value_c"], r["first_ts"], r["last_ts"])
        for r in read_version(spark, mv_path).collect()
    }


def _direct(spark, src_path):
    from european_public_data_pipeline_spark.pipeline.manifest import read_version

    return {
        r["event_type"]: (r["n_events"], r["sum_value_c"], r["first_ts"], r["last_ts"])
        for r in _partial(read_version(spark, src_path)).collect()
    }


def test_incremental_refresh_equals_full_recompute(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").select("event_type", "value", "ts")
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    thirds = [ev.filter(F.col("value") % 3 == i) for i in (0, 1, 2)]

    append_version(thirds[0], src)
    assert refresh_event_summary(spark, src, mv) == 1
    append_version(thirds[1], src)
    append_version(thirds[2], src)
    assert refresh_event_summary(spark, src, mv) == 3
    assert _mv_rows(spark, mv) == _direct(spark, src)

    # No new source version: refresh is a no-op, MV version unchanged.
    v_before = current_version(spark, mv)
    assert refresh_event_summary(spark, src, mv) == 3
    assert current_version(spark, mv) == v_before
    assert version_meta(spark, mv)["applied_src_version"] == 3


def test_source_rewrite_falls_back_to_full_recompute(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").select("event_type", "value", "ts")
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    append_version(ev.filter(F.col("value") < 100), src)
    refresh_event_summary(spark, src, mv)
    append_version(ev.filter(F.col("value") >= 100), src)
    # Rewrite the source in place: compaction replaces every file.
    compact(spark, src, target_files=2)
    v = refresh_event_summary(spark, src, mv)
    assert v == current_version(spark, src)
    assert _mv_rows(spark, mv) == _direct(spark, src)


def test_purge_between_refreshes_rebuilds_mv(spark, sf_small, tmp_path):
    """purge_rows rewrites history in place WITHOUT bumping versions; the
    MV must detect the applied manifest's file list changing under it
    and rebuild — even with no new source version — or it would serve
    legally-erased rows forever."""
    from european_public_data_pipeline_spark.pipeline.manifest import (
        append_version,
        purge_rows,
    )

    ev = load_table(spark, sf_small, "events").select(
        "event_type", "value", "ts", "user_id"
    )
    src = str(tmp_path / "src")
    mv = str(tmp_path / "mv")
    append_version(ev, src, stats_cols=("user_id",))
    refresh_event_summary(spark, src, mv)
    before = _mv_rows(spark, mv)

    purge_rows(spark, src, "user_id", [3])
    # No new source version — a naive watermark check would no-op here.
    refresh_event_summary(spark, src, mv)
    after = _mv_rows(spark, mv)
    assert after == _direct(spark, src)
    assert after != before  # user 3's rows are gone from the aggregate
