"""End-to-end LLM training-corpus curation (SURVEY.md §2.12 composed).

The individual operators — quality scoring (t02), exact dedup (d02),
MinHash+LSH near-dedup (d04), benchmark decontamination (d10), hash
splits (sm05) — are each oracle-checked in isolation; this module chains
them into the pipeline a training-data team actually runs:

    raw documents
      -> quality gate        (score >= threshold)
      -> exact dedup         (md5 fingerprint, keep first)
      -> near-dedup          (LSH candidates, jaccard >= 0.8, keep lower id)
      -> decontamination     (drop the held-out benchmark docs AND any
                              training doc overlapping them)
      -> deterministic split (hash boundaries, train/val/test)
      -> parquet partitioned by split + a stats report

Every stage is hash-deterministic, so a re-run over the same input
produces byte-identical decisions — the property that makes a 100 TB
curation job resumable and auditable. Stage order matters and is the
standard one: cheap row-local gates first (they shrink the corpus before
any shuffle), pairwise dedup next, decontamination last so benchmark
overlap is judged against the documents that will actually ship.

Scale shape: stages communicate by doc_id anti/semi joins (id-cardinality
relations, AQE picks broadcast vs shuffle), never by re-shipping text;
the only non-linear stage is d04's candidate join, which is bucket-local
by construction. The final write is one pass partitioned by split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark import plans
from european_public_data_pipeline_spark.operators.dedup import CONTAM_MOD, base_hash28
from european_public_data_pipeline_spark.operators.sampling import SPLIT_BP
from european_public_data_pipeline_spark.tables import load_table

QUALITY_MIN = 0.5


def split_label(doc_id_col: F.Column) -> F.Column:
    """sm05's deterministic hash-boundary split label (train/val/test)."""
    bucket = base_hash28(doc_id_col.cast("string")) % 10000
    return (
        F.when(bucket < SPLIT_BP["train"], F.lit("train"))
        .when(bucket < SPLIT_BP["train"] + SPLIT_BP["val"], F.lit("val"))
        .otherwise(F.lit("test"))
    )


def curation_stages(
    spark: SparkSession, sf_dir: str, quality_min: float = QUALITY_MIN
) -> dict[str, DataFrame]:
    """The curation chain as doc_id relations, one entry per stage.

    Shared by ``curate_corpus`` (which writes the final corpus) and the
    driver-checked ``p03_curation_report`` query (which counts each stage
    against a composed-CTE oracle).
    """
    specs = plans.all_specs()
    docs = load_table(spark, sf_dir, "documents")

    # 1. Quality gate: row-local scoring, drops before anything shuffles.
    quality = specs["t02_quality_score"].builder(spark, sf_dir)
    good = quality.filter(F.col("quality_score") >= quality_min).select("doc_id")

    # 2. Exact dedup: fingerprint survivors (min doc_id per fingerprint).
    survivors = (
        specs["d02_exact_dedup_fingerprint"]
        .builder(spark, sf_dir)
        .select(F.col("survivor_doc_id").alias("doc_id"))
    )
    stage2 = good.join(survivors, "doc_id", "left_semi")

    # 3. Near-dedup: for every verified pair (d1 < d2, jaccard >= 0.8) the
    # higher id loses — survivors never pair with each other.
    near_losers = (
        specs["d04_minhash_lsh_pairs"]
        .builder(spark, sf_dir)
        .select(F.col("d2").alias("doc_id"))
        .distinct()
    )
    stage3 = stage2.join(near_losers, "doc_id", "left_anti")

    # 4. Decontamination: drop the held-out benchmark split (a pure hash
    # predicate of doc_id — no join needed) plus every training doc d10
    # scored as contaminated. The drop set is built EXPLICITLY rather than
    # semi-joining d10's clean rows: d10 only emits rows for docs that have
    # at least one 5-gram shingle, so docs shorter than 5 words are absent
    # from its output and a semi join would silently discard them.
    contaminated = (
        specs["d10_contamination_check"]
        .builder(spark, sf_dir)
        .filter(F.col("contaminated"))
        .select("doc_id")
    )
    is_bench = base_hash28(F.col("doc_id").cast("string")) % CONTAM_MOD == 0
    stage4 = stage3.filter(~is_bench).join(contaminated, "doc_id", "left_anti")
    return {
        "docs": docs,
        "quality": good,
        "exact_dedup": stage2,
        "near_dedup": stage3,
        "decontam": stage4,
    }


# Surgical decontamination: a doc whose benchmark-overlapping islands
# cover at most this share of its tokens is KEPT (the islands get excised
# by the write step) instead of dropped wholesale. 0.2 sits in the gap of
# the observed bimodal distribution (incidental shingle collisions < 0.2,
# near-copies of benchmark docs > 0.8 — see d19's PLANS.md notes).
SURGICAL_MAX_RATIO = 0.2


def surgical_stages(
    spark: SparkSession,
    sf_dir: str,
    quality_min: float = QUALITY_MIN,
    max_ratio: float = SURGICAL_MAX_RATIO,
) -> dict[str, DataFrame]:
    """The curation chain with d19's span-level decontamination replacing
    d10's drop-the-whole-document gate (VERDICT r5 #6): heavily
    contaminated docs (covered_ratio > max_ratio) still drop, but lightly
    contaminated ones survive with an excision work order — the shape
    production training-data audits actually gate on. Note the two gates
    measure DIFFERENT things (d10: distinct-shingle match rate; d19:
    covered-token ratio), so neither keep-set structurally contains the
    other — on corpora where overlaps are island-concentrated the
    surgical gate typically recovers documents the blunt gate drops, but
    that is an empirical property of the corpus, not a guarantee.

    Returns ``curation_stages``'s entries plus ``surgical`` (the kept
    set) and ``excision`` (d19 rows for kept docs — the spans the write
    step must cut, with token counts).
    """
    specs = plans.all_specs()
    stages = curation_stages(spark, sf_dir, quality_min)
    d19 = specs["d19_span_contamination"].builder(spark, sf_dir)
    heavy = d19.filter(F.col("covered_ratio") > max_ratio).select("doc_id")
    is_bench = base_hash28(F.col("doc_id").cast("string")) % CONTAM_MOD == 0
    surgical = (
        stages["near_dedup"].filter(~is_bench).join(heavy, "doc_id", "left_anti")
    )
    excision = d19.filter(F.col("covered_ratio") <= max_ratio).join(
        surgical, "doc_id", "left_semi"
    )
    return {**stages, "surgical": surgical, "excision": excision}


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    quality_min: float = QUALITY_MIN,
) -> dict[str, int]:
    """Run the curation chain over ``{sf_dir}/documents.parquet`` and write
    ``{out_dir}/documents.parquet`` partitioned by ``split``.

    Returns per-stage surviving-document counts (the curation report).
    """
    stages = curation_stages(spark, sf_dir, quality_min)
    docs = stages["docs"]
    n_raw = docs.count()
    n_quality = stages["quality"].count()
    n_exact = stages["exact_dedup"].count()
    n_near = stages["near_dedup"].count()
    stage4 = stages["decontam"]
    n_decontam = stage4.count()

    # 5. Split + write: one pass over the surviving text, partitioned so a
    # training job reads only its split's directories.
    curated = docs.join(stage4, "doc_id", "left_semi").withColumn(
        "split", split_label(F.col("doc_id"))
    )
    curated.write.mode("overwrite").partitionBy("split").parquet(
        f"{out_dir}/documents.parquet"
    )
    out = spark.read.parquet(f"{out_dir}/documents.parquet")
    splits = {
        f"n_{r['split']}": r["n"]
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return {
        "n_raw": n_raw,
        "n_after_quality": n_quality,
        "n_after_exact_dedup": n_exact,
        "n_after_near_dedup": n_near,
        "n_after_decontam": n_decontam,
        **splits,
    }
