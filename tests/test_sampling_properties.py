"""Determinism and partition invariants for the sampling operators
(SURVEY.md §5 property-test strategy applied to §2.12):

- sm01's hash-rate sample must be a pure function of the row key —
  identical across reruns and shuffle layouts.
- sm05's split labels must come from the expected set and stay stable when
  the corpus grows (adding docs never moves an existing doc's split) — the
  growth-stability contract that makes train/val/test assignment
  append-safe.
- sm08's keep set must respect the per-language character budget and be a
  TOP SEGMENT of the quality-bucket ordering (greedy cumulative keep from
  the best bucket down: every dropped bucket sits strictly below every
  kept bucket of the same language).
"""

from __future__ import annotations

import math

import duckdb

from european_public_data_pipeline_spark import plans


def _specs():
    return plans.all_specs()


def test_sm01_rerun_and_repartition_stable(spark, sf_small):
    b = _specs()["sm01_stratified_sample"].builder
    a = {tuple(r) for r in b(spark, sf_small).collect()}
    c = {tuple(r) for r in b(spark, sf_small).collect()}
    assert a == c
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        d = {tuple(r) for r in b(spark, sf_small).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == d


def _split_labels(spark, sf_dir):
    """Per-document split labels via sm05's exact construction."""
    from pyspark.sql import functions as F

    from european_public_data_pipeline_spark.operators.dedup import base_hash28
    from european_public_data_pipeline_spark.operators.sampling import SPLIT_BP
    from european_public_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    bucket = base_hash28(F.col("doc_id").cast("string")) % 10000
    split = (
        F.when(bucket < SPLIT_BP["train"], F.lit("train"))
        .when(bucket < SPLIT_BP["train"] + SPLIT_BP["val"], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return {r["doc_id"]: r["split"] for r in docs.select("doc_id", split.alias("split")).collect()}


def test_sm05_labels_partition_and_growth_stable(spark, sf_small, sf_medium):
    small = _split_labels(spark, sf_small)
    assert set(small.values()) <= {"train", "val", "test"}
    medium = _split_labels(spark, sf_medium)
    shared = set(small) & set(medium)
    assert shared
    moved = {d for d in shared if small[d] != medium[d]}
    assert not moved, f"splits moved for {sorted(moved)[:5]}"
    # and the registered summary agrees with the per-doc labels
    summary = {
        r["split"]: r["n_docs"]
        for r in _specs()["sm05_train_val_test_split"].builder(spark, sf_small).collect()
    }
    from collections import Counter

    assert summary == dict(Counter(small.values()))


def _bucket_of(text: str) -> int:
    """Independent reimplementation of sm08's TTR bucket (whitespace split
    of trimmed text == Spark's split on \\s+ for this corpus)."""
    w = text.strip().split()
    ttr = len(set(w)) / len(w)
    return int(math.floor(min(ttr, 0.999) * 1000))


def test_sm08_budget_and_top_segment(spark, sf_medium):
    from european_public_data_pipeline_spark.operators.sampling import CHAR_BUDGET_BP

    kept = _specs()["sm08_quality_budget_mixture"].builder(spark, sf_medium).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, lang, n_chars, text FROM '{sf_medium}/documents.parquet'"
    ).fetchall()
    total: dict[str, int] = {}
    corpus_buckets: dict[str, set] = {}
    for _doc_id, lang, n_chars, text in docs:
        total[lang] = total.get(lang, 0) + n_chars
        corpus_buckets.setdefault(lang, set()).add(_bucket_of(text))
    kept_chars: dict[str, int] = {}
    kept_buckets: dict[str, set] = {}
    for r in kept:
        kept_chars[r["lang"]] = kept_chars.get(r["lang"], 0) + r["n_chars"]
        kept_buckets.setdefault(r["lang"], set()).add(r["bucket"])
    assert kept_buckets, "sm08 kept nothing"
    for lang, bs in kept_buckets.items():
        # budget respected
        assert kept_chars[lang] <= total[lang] * CHAR_BUDGET_BP / 10000.0 + 1e-9
        # top segment: every dropped bucket < every kept bucket
        dropped = corpus_buckets[lang] - bs
        if dropped:
            assert max(dropped) < min(bs), (
                f"{lang}: dropped bucket {max(dropped)} above kept {min(bs)}"
            )
