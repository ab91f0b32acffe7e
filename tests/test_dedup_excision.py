"""d26 span excision: executing d25's work orders must actually shrink
the corpus-repeated-span footprint, and re-running detection on the
excised corpus must find strictly less (one round removes every ORIGINAL
hot span; seam-boundary k-grams can still repeat, which is why
production ExactSubstr dedup iterates to a fixpoint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from european_public_data_pipeline_spark.operators.dedup import (
    repeated_span_islands,
)
from european_public_data_pipeline_spark.plans.registry import all_specs
from european_public_data_pipeline_spark.tables import load_table


def _island_tokens(base):
    m = repeated_span_islands(base)
    row = m.agg(
        F.coalesce(F.sum(F.col("me") - F.col("ms") + 1), F.lit(0)).alias("t")
    ).collect()[0]
    return int(row["t"])


def test_excision_shrinks_repeated_span_footprint(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    base = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("w")
    ).withColumn("doc_tokens", F.size("w"))
    before = _island_tokens(base)
    assert before > 0

    # Apply d26's excision: rebuild the corpus with islands removed.
    d26 = all_specs()["d26_span_excision_apply"].builder(spark, sf_small)
    # Per-doc reconstruction the same way the operator hashes it.
    merged = repeated_span_islands(base)
    pos_t = base.select(
        "doc_id", F.posexplode("w").alias("p0", "token")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "token")
    covered = (
        pos_t.alias("pt")
        .join(
            merged.alias("m"),
            (F.col("pt.doc_id") == F.col("m.doc_id"))
            & F.col("pt.p").between(F.col("m.ms"), F.col("m.me")),
            "left_semi",
        )
        .select("doc_id", "p")
    )
    kept = pos_t.join(covered, ["doc_id", "p"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("p", "token"))),
            lambda s: s.getField("token"),
        ).alias("w")
    ).withColumn("doc_tokens", F.size("w"))
    after = _island_tokens(rebuilt)
    assert after < before, f"excision did not shrink footprint: {before} -> {after}"

    # Sanity: d26's removed-token total equals the detected footprint.
    removed = d26.agg(F.sum("n_removed").alias("r")).collect()[0]["r"]
    assert removed == before
