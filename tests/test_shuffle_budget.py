"""Measured shuffle-byte budgets for the queries whose design claim is
"the fact never rides a shuffle" (PLANS.md). Plan-shape tests catch a
missing BroadcastHashJoin node; these catch the same regression by its
physical symptom — bytes on the wire — which also covers AQE decisions
plan-string tests can't see.

Budgets are sf0.01 measurements with ~4x headroom: a broadcast join
flipping to a shuffle join drags the whole fact through the Exchange
(hundreds of KB to MB at this sf), two orders of magnitude over budget,
while legitimate variation (compression, partition count) stays well
inside it.
"""

from __future__ import annotations

import pytest

from european_public_data_pipeline_spark import plans
from european_public_data_pipeline_spark.plans.metrics import (
    exchange_count,
    shuffle_bytes_written,
)

# (query, max shuffle bytes at sf0.01, max Exchange nodes)
BUDGETS = [
    ("q02_filter_project", 0, 0),  # scan+filter+project: nothing shuffles
    # q01/q26 budgets re-measured for the r13 post-scan scatter: the
    # unsplittable single-row-group input is deliberately shipped ONCE
    # (projected columns only — 806K/837K measured at sf0.01) so the
    # partial aggregation parallelizes (OPTIMIZATION_r13.md, guide §2.5).
    # The budget still catches the regressions that matter: losing column
    # pruning through the scatter exchange (~2x the bytes) or losing the
    # map-side combine (the agg exchange ships raw rows again, ~+800K).
    ("q01_pricing_summary", 1_200_000, 3),  # scatter + partial/final agg
    ("q05_region_customer_rollup", 10_000, 2),  # dims broadcast; agg pair
    ("q36_local_supplier_volume", 10_000, 2),  # 6-table star, one agg
    ("q26_shipping_priority", 1_200_000, 3),  # scatter + broadcast star + top-10 agg
    ("q79_cms_heavy_hitters", 50_000, 4),  # sketch cells are constant-size
    ("q81_bloom_pruned_join", 200_000, 5),  # only Bloom survivors shuffle
    # MV maintenance: both partials map-side combine to #priorities rows,
    # the merge unions aggregate-sized relations (1.6 KB measured) — a
    # budget blowout here means the merge started re-shuffling raw rows.
    ("q96_incremental_agg_maintenance", 8_000, 3),
    # Round-7: the corpus never rides a shuffle in any of these — sm13
    # shuffles only source-cardinality aggregates + the 20-row weight
    # relation; t22 shuffles the vocab-sized LM and doc-sized scores
    # (token probe join is broadcast); q106/q107 shuffle one agg pair
    # over the pruned/incremental slice.
    ("sm13_repetition_capped_mixture", 25_000, 10),
    ("t22_perplexity_buckets", 55_000, 6),
    ("q106_zonemap_pruned_scan", 5_000, 2),
    ("q107_incremental_version_scan", 5_000, 2),
]


@pytest.fixture(autouse=True, scope="module")
def _uncached_session(spark):
    """Plan-shape assertions must see the real scan plans: any cached
    relation left by earlier test modules (the session-scoped fixture is
    shared suite-wide) gets substituted into matching plan fragments by
    the CacheManager, changing Exchange counts and ReadSchema non-
    deterministically with test order (r6: t10 flaked only in the full
    run, after the 191-query parity sweep's union of caches)."""
    spark.catalog.clearCache()
    yield


@pytest.mark.parametrize("name,max_bytes,max_exchanges", BUDGETS)
def test_shuffle_budget(spark, sf_medium, name, max_bytes, max_exchanges):
    df = plans.all_specs()[name].builder(spark, sf_medium)
    if len(df.columns) <= 16:
        df.collect()
    else:
        df.count()
    written = shuffle_bytes_written(df)
    n_ex = exchange_count(df)
    assert written <= max_bytes, (
        f"{name} wrote {written} shuffle bytes (budget {max_bytes}) — "
        "a broadcast likely degraded to a shuffle join"
    )
    assert n_ex <= max_exchanges, f"{name} has {n_ex} exchanges (budget {max_exchanges})"
