"""Registry mapping query names to (Spark builder, DuckDB oracle SQL).

Each declared operator from SURVEY.md §2 registers one ``QuerySpec``:

- ``builder(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet tables
  (pre-registered views), or ``None`` for genuinely non-SQL-expressible ops
  (the driver then records a weaker rows-only check).

Column names are part of the contract: the correctness driver sorts columns
by NAME before hashing, so builders and oracles must alias every computed
column identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, replace

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    category: str
    doc: str
    bench: bool = False  # include in bench.py headline set


def register(
    name: str,
    *,
    oracle: str | Callable[[], str] | None = None,
    category: str,
    doc: str = "",
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``.

    ``oracle`` may be a zero-arg callable for oracles composed from OTHER
    registered specs (resolved lazily on first registry access) — building
    such text at decoration time would race module import order: a direct
    import of one operator module re-enters ``plans/__init__`` while that
    module is still partially initialized.
    """

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle.strip() if isinstance(oracle, str) else oracle,
            category=category,
            doc=doc or (fn.__doc__ or "").strip(),
            bench=bench,
        )
        return fn

    return wrap


def _resolve(name: str) -> "QuerySpec":
    spec = _REGISTRY[name]
    if callable(spec.oracle):
        spec = replace(spec, oracle=spec.oracle().strip())
        _REGISTRY[name] = spec
    return spec


# Queries that already have a green row in CORRECTNESS_r01.json. The
# correctness driver verifies queries in dict-iteration order and only
# reaches ~50 per round, so ``queries_map`` yields the names WITHOUT a
# round-1 verdict first (then the two round-1 hash-failures, now fixed, so
# they get re-checked), and the already-green names last. Over two rounds
# every registered query gets a driver row.
_R1_DRIVER_GREEN = frozenset({
    "q01_pricing_summary", "q02_filter_project", "q03_revenue_forecast",
    "q04_top_revenue_orders", "q05_region_customer_rollup",
    "q06_priority_exists_semi", "q07_segment_anti", "q08_monthly_revenue_mom",
    "q09_rolling_3m_revenue", "q10_top3_orders_per_customer",
    "q11_nation_setops", "q12_cube_qty", "q13_pivot_linestatus",
    "q14_quantiles_by_flag", "q15_moments_exact", "q16_distinct_counts",
    "q18_event_hourly_windows", "q20_time_code_roundtrip",
    "q21_orders_gap_profile", "q24_string_functions", "q25_approx_distinct",
    "q26_shipping_priority", "q27_late_delivery_semi", "q28_try_arithmetic",
    "q44_price_histogram", "q48_winsorized_mean", "q50_revenue_share",
    "q51_gap_fill_interpolate",
    "d01_dedup_keep_first", "d02_exact_dedup_fingerprint",
    "d03_ngram_jaccard_pairs", "d04_minhash_lsh_pairs", "d05_simhash_pairs",
    "d06_embedding_near_dup", "d07_ml_minhash_lsh", "d08_dup_clusters",
    "d09_incremental_dedup", "d10_contamination_check", "d11_chunk_containment",
    "d12_semantic_dedup",
    "s01_cosine_topk", "s02_lsh_bucket_pairs", "s03_knn_label_vote",
    "s04_ivf_topk", "s05_lang_centroids", "s06_int8_quantization",
    "s07_kmeans_assignments", "t01_token_stats",
})

# Round-1 driver rows that exist but hash-failed (oracle typing, fixed in
# round 2) — re-check these right after the never-checked names.
_R1_DRIVER_RED = ("q17_events_json_extract", "q19_sessionization")

# Operators added in round 2 (no round-1 verdict could exist). Round-1's
# never-checked queries are older verification debt, so they outrank these
# for the driver's ~50-per-round budget.
_R2_NEW = frozenset({
    "d13_shingle_novelty", "d14_minhash_accuracy_audit", "sm06_epoch_shuffle",
    "q53_full_outer_reconciliation", "q54_regexp_functions", "q55_sliding_mau",
    "q56_revenue_anomaly_zscore", "s08_power_iteration_pca",
    "p03_curation_report", "t13_vocab_coverage",
})


def _driver_order() -> list[str]:
    names = list(_REGISTRY)
    red = [n for n in _R1_DRIVER_RED if n in _REGISTRY]
    r1_unchecked = [
        n
        for n in names
        if n not in _R1_DRIVER_GREEN and n not in _R1_DRIVER_RED and n not in _R2_NEW
    ]
    new = [n for n in names if n in _R2_NEW]
    green = [n for n in names if n in _R1_DRIVER_GREEN]
    return red + r1_unchecked + new + green


def all_specs() -> dict[str, QuerySpec]:
    return {name: _resolve(name) for name in _REGISTRY}


def queries_map() -> dict[str, Builder]:
    return {name: _REGISTRY[name].builder for name in _driver_order()}


def oracle_sql_map() -> dict[str, str]:
    return {
        name: _resolve(name).oracle
        for name in _driver_order()
        if _resolve(name).oracle
    }
