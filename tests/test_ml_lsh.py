"""Cross-validation of the stock pyspark.ml MinHashLSH (d07) against the
exact n-gram Jaccard pairs (d03): with 8 hash tables and the planted
near-dups at jaccard ~0.98, the approximate join must recover exactly the
exact-method pair set (both apply the same >= 0.8 exact-Jaccard cutoff)."""

from __future__ import annotations

from european_public_data_pipeline_spark import plans


def test_ml_lsh_matches_exact_pairs(spark, sf_medium):
    exact = {
        (r["d1"], r["d2"])
        for r in plans.all_specs()["d03_ngram_jaccard_pairs"].builder(spark, sf_medium).collect()
    }
    ml = {
        (r["d1"], r["d2"])
        for r in plans.all_specs()["d07_ml_minhash_lsh"].builder(spark, sf_medium).collect()
    }
    assert ml == exact
    assert len(exact) > 0
