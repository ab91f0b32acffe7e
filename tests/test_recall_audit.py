"""d22's sampled-truth mode: the knob that turns the corpus²-cost
exhaustive recall audit into a fixed-budget estimate at scale.

The registered full-corpus mode is oracle-checked in
tests/test_oracle_parity.py; these tests pin the sampled mode's
statistical contract against the full run."""

from __future__ import annotations

from european_public_data_pipeline_spark.operators.dedup import (
    d22_lsh_recall_audit,
    exact_jaccard_pairs,
)
from european_public_data_pipeline_spark.tables import load_table


def test_sampled_truth_is_subset_and_rate_is_reported(spark, sf_small):
    full = d22_lsh_recall_audit(spark, sf_small).collect()[0]
    sampled = d22_lsh_recall_audit(spark, sf_small, truth_sample_bp=5000).collect()[0]
    # The rate rides in the output row — no silent caps.
    assert full["sample_rate_bp"] == 10000
    assert sampled["sample_rate_bp"] == 5000
    # Sampled truth/detections are restricted versions of the full sets.
    assert sampled["n_true"] <= full["n_true"]
    assert sampled["n_detected"] <= full["n_detected"]
    assert sampled["n_true_detected"] <= sampled["n_true"]
    if sampled["n_true"] > 0:
        assert 0.0 <= sampled["banding_recall"] <= 1.0


def test_sampled_truth_pairs_come_from_full_truth(spark, sf_small):
    """Every sampled-truth pair is a full-truth pair whose BOTH endpoints
    fall in the deterministic hash sample — i.e. the sample estimates the
    same population, it doesn't mint new 'truth'."""
    from european_public_data_pipeline_spark.operators.dedup import base_hash28
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    bp = 5000
    sample = docs.filter(
        base_hash28(F.col("doc_id").cast("string")) % 10000 < bp
    )
    sampled_truth = {
        (r["d1"], r["d2"])
        for r in exact_jaccard_pairs(sample).select("d1", "d2").collect()
    }
    full_truth = {
        (r["d1"], r["d2"])
        for r in exact_jaccard_pairs(docs).select("d1", "d2").collect()
    }
    ids = {r["doc_id"] for r in sample.select("doc_id").collect()}
    expected = {(a, b) for (a, b) in full_truth if a in ids and b in ids}
    assert sampled_truth == expected
