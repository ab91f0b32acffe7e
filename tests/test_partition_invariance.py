"""Partition-count invariance: the determinism engineering claim, tested.

Every oracle-parity result is only trustworthy in production if it does not
depend on HOW the data was partitioned. Each determinism recipe in the
codebase (exact DECIMAL sums, integer micro-nat folds, sequential
left-associated dot products, portable md5 hashing, rank-constructed
medians) is represented here by one query, executed under 3 and 32 shuffle
partitions on the same session; results must be BIT-identical (floats
compared by exact equality, not tolerance).

A failure means some aggregate accumulates IEEE doubles in partition order
— exactly the class of bug the exact-decimal / fixed-point recipes exist
to prevent.
"""

from __future__ import annotations

import pytest

from european_public_data_pipeline_spark import plans

# One query per determinism recipe.
CASES = [
    "q01_pricing_summary",      # exact DECIMAL money sums
    "q15_moments_exact",        # integer-cents exact moments
    "t14_unigram_cross_entropy",  # micro-nat surprisal folds
    "t18_zipf_slope",           # micro-nat OLS sums
    "q87_mad_outliers",         # rank-constructed medians over the domain
    "q89_twap",                 # DECIMAL(38,0) value x duration dot product
    "s12_product_quantization", # sequential-fold distances + fixed-point MSE
    "sm09_weighted_upsampling", # cumulative exact-integer resampling
    "g01_pagerank",             # fixed-point contribution accumulators
    "d04_minhash_lsh_pairs",    # portable md5 hashing end to end
    "q85_ewma_smoothing",       # long centi-unit sums + row-local prefix folds
    "q92_inflight_sweep",       # boundary-event histograms + HOF prefix sums
    "t19_heaps_law_fit",        # per-source micro-nat OLS points
    "t20_source_kl_divergence", # DECIMAL(38,0) micro-nat term folds
    "q93_conversion_latency",   # ordered-window pairing + exact bit-length buckets
    "t21_bigram_surprisal",     # integer micro-nat differences, doc folds, top-k
    "g04_label_propagation",    # integer argmax via max(struct(cnt, -label))
    "s13_mips_topk",            # sequential-fold dots + constant-division ranking
    "d19_span_contamination",   # gaps-and-islands integer arithmetic
    "q96_incremental_agg_maintenance",  # algebraic merge of DECIMAL partials
    "q101_correlation_exact",   # two-column exact power sums -> corr/covar
    # Round-7 recipes:
    "d25_repeated_span_removal",  # gram-hash heavy hitters + island integers
    "g06_star_connected_components",  # star-operation fixpoint (integer labels)
    "t22_perplexity_buckets",   # micro-nat LM + domain-histogram terciles
    "sm13_repetition_capped_mixture",  # fixed-point sqrt weights + hash emission
    "s15_multiprobe_lsh_topk",  # margin-sorted bit flips + sequential-fold cosines
    "d26_span_excision_apply",  # positioned anti-join + ordered text re-assembly
    # Round-8 recipes:
    "d27_excision_fixpoint",    # iterated excision: islands + ordered rebuild per round
    "q110_incremental_mv_refresh",  # centi-unit algebraic merge through manifest log
    "p07_ccnet_curation_report",    # composed gates + domain-histogram tercile gate
    "d28_incremental_gram_index",   # multiset delta merge + integer count checksum
]


def _rows(spark, name, sf_dir, partitions):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = plans.all_specs()[name].builder(spark, sf_dir)
        cols = sorted(df.columns)
        return sorted(tuple(r) for r in df.select(*cols).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", CASES)
def test_partition_count_invariance(spark, sf_small, name):
    a = _rows(spark, name, sf_small, 3)
    b = _rows(spark, name, sf_small, 32)
    assert a == b, f"{name}: result depends on shuffle partition count"
