"""Driver-checked curation report: the composed pipeline as one query.

``pipeline/curate.py`` chains t02 -> d02 -> d04 -> d10 -> sm05 into the
training-corpus curation run; this module registers the per-stage counts
of that chain as ``p03_curation_report`` with an oracle built by
composing the ALREADY-REGISTERED stage oracles as CTEs. The correctness
driver therefore hash-checks not only each operator in isolation but the
whole composition — the strongest end-to-end evidence the oracle
framework can express.

The oracle text is assembled from the registry LAZILY (``register``
accepts a callable): composing it at import time would race module
import order — a direct ``import operators.dedup`` re-enters
``plans/__init__`` while dedup is still partially initialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.operators.sampling import SPLIT_BP, _HASH_SQL
from european_public_data_pipeline_spark.plans import registry
from european_public_data_pipeline_spark.plans.registry import register

_QUALITY_MIN = 0.5  # pipeline.curate.QUALITY_MIN (kept literal: oracle text)


def _composed_oracle() -> str:
    # Raw registry access (not all_specs): resolving p03's own lazy oracle
    # from inside its composer would recurse. Operator-module imports stay
    # lazy too — a top-level one re-enters plans/__init__ during a direct
    # ``import operators.dedup`` while dedup is partially initialized.
    from european_public_data_pipeline_spark.operators.dedup import (
        CONTAM_MOD,
        _HASH_DOC_SQL,
    )
    from european_public_data_pipeline_spark.pipeline import curate

    # The oracle text keeps the threshold literal; fail loudly if it ever
    # drifts from the pipeline constant it claims to certify.
    assert _QUALITY_MIN == curate.QUALITY_MIN, (
        f"p03 oracle threshold {_QUALITY_MIN} != pipeline QUALITY_MIN "
        f"{curate.QUALITY_MIN}"
    )
    specs = registry._REGISTRY
    t02 = specs["t02_quality_score"].oracle
    d02 = specs["d02_exact_dedup_fingerprint"].oracle
    d04 = specs["d04_minhash_lsh_pairs"].oracle
    d10 = specs["d10_contamination_check"].oracle
    train_hi = SPLIT_BP["train"]
    val_hi = SPLIT_BP["train"] + SPLIT_BP["val"]
    return f"""
WITH t02 AS ({t02}),
good AS (SELECT doc_id FROM t02 WHERE quality_score >= {_QUALITY_MIN}),
d02 AS ({d02}),
s2 AS (SELECT doc_id FROM good
       WHERE doc_id IN (SELECT survivor_doc_id FROM d02)),
d04 AS ({d04}),
s3 AS (SELECT doc_id FROM s2
       WHERE doc_id NOT IN (SELECT DISTINCT d2 FROM d04)),
d10 AS ({d10}),
s4 AS (SELECT doc_id FROM s3
       WHERE {_HASH_DOC_SQL} % {CONTAM_MOD} != 0
         AND doc_id NOT IN (SELECT doc_id FROM d10 WHERE contaminated)),
sp AS (
  SELECT doc_id,
         CASE WHEN {_HASH_SQL} % 10000 < {train_hi} THEN 'train'
              WHEN {_HASH_SQL} % 10000 < {val_hi} THEN 'val'
              ELSE 'test' END AS split
  FROM s4
)
SELECT stage, n FROM (
  SELECT '1_raw' AS stage, (SELECT COUNT(*) FROM documents) AS n
  UNION ALL SELECT '2_quality', (SELECT COUNT(*) FROM good)
  UNION ALL SELECT '3_exact_dedup', (SELECT COUNT(*) FROM s2)
  UNION ALL SELECT '4_near_dedup', (SELECT COUNT(*) FROM s3)
  UNION ALL SELECT '5_decontam', (SELECT COUNT(*) FROM s4)
  UNION ALL SELECT '6_split_train', (SELECT COUNT(*) FROM sp WHERE split = 'train')
  UNION ALL SELECT '7_split_val', (SELECT COUNT(*) FROM sp WHERE split = 'val')
  UNION ALL SELECT '8_split_test', (SELECT COUNT(*) FROM sp WHERE split = 'test')
)
ORDER BY stage
"""


@register(
    "p03_curation_report",
    category="pipeline",
    doc="Per-stage surviving-document counts of the composed corpus-"
    "curation pipeline (quality gate -> exact dedup -> LSH near-dedup -> "
    "decontamination -> deterministic split). The oracle nests the four "
    "stage oracles as CTEs and recomputes the chain in SQL, so a driver "
    "hash match certifies the COMPOSITION, not just the parts.",
    oracle=_composed_oracle,  # lazy: composed from the registry on first use
)
def p03_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.pipeline.curate import (
        curation_stages,
        split_label,
    )

    stages = curation_stages(spark, sf_dir)

    def cnt(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(label).alias("stage"), "n"
        )

    sp = stages["decontam"].withColumn("split", split_label(F.col("doc_id")))
    report = (
        cnt(stages["docs"], "1_raw")
        .unionByName(cnt(stages["quality"], "2_quality"))
        .unionByName(cnt(stages["exact_dedup"], "3_exact_dedup"))
        .unionByName(cnt(stages["near_dedup"], "4_near_dedup"))
        .unionByName(cnt(stages["decontam"], "5_decontam"))
        .unionByName(cnt(sp.filter(F.col("split") == "train"), "6_split_train"))
        .unionByName(cnt(sp.filter(F.col("split") == "val"), "7_split_val"))
        .unionByName(cnt(sp.filter(F.col("split") == "test"), "8_split_test"))
    )
    return report.orderBy("stage")


def _surgical_oracle() -> str:
    from european_public_data_pipeline_spark.operators.dedup import (
        CONTAM_MOD,
        _HASH_DOC_SQL,
    )
    from european_public_data_pipeline_spark.pipeline import curate

    assert _QUALITY_MIN == curate.QUALITY_MIN
    ratio = curate.SURGICAL_MAX_RATIO
    specs = registry._REGISTRY
    t02 = specs["t02_quality_score"].oracle
    d02 = specs["d02_exact_dedup_fingerprint"].oracle
    d04 = specs["d04_minhash_lsh_pairs"].oracle
    d19 = specs["d19_span_contamination"].oracle
    train_hi = SPLIT_BP["train"]
    val_hi = SPLIT_BP["train"] + SPLIT_BP["val"]
    return f"""
WITH t02 AS ({t02}),
good AS (SELECT doc_id FROM t02 WHERE quality_score >= {_QUALITY_MIN}),
d02 AS ({d02}),
s2 AS (SELECT doc_id FROM good
       WHERE doc_id IN (SELECT survivor_doc_id FROM d02)),
d04 AS ({d04}),
s3 AS (SELECT doc_id FROM s2
       WHERE doc_id NOT IN (SELECT DISTINCT d2 FROM d04)),
d19 AS ({d19}),
s4 AS (SELECT doc_id FROM s3
       WHERE {_HASH_DOC_SQL} % {CONTAM_MOD} != 0
         AND doc_id NOT IN (SELECT doc_id FROM d19
                            WHERE covered_ratio > CAST({ratio} AS DOUBLE))),
exc AS (SELECT CAST(COALESCE(SUM(covered_tokens), 0) AS BIGINT) AS tok
        FROM d19
        WHERE covered_ratio <= CAST({ratio} AS DOUBLE)
          AND doc_id IN (SELECT doc_id FROM s4)),
sp AS (
  SELECT doc_id,
         CASE WHEN {_HASH_SQL} % 10000 < {train_hi} THEN 'train'
              WHEN {_HASH_SQL} % 10000 < {val_hi} THEN 'val'
              ELSE 'test' END AS split
  FROM s4
)
SELECT stage, n FROM (
  SELECT '1_raw' AS stage, (SELECT COUNT(*) FROM documents) AS n
  UNION ALL SELECT '2_quality', (SELECT COUNT(*) FROM good)
  UNION ALL SELECT '3_exact_dedup', (SELECT COUNT(*) FROM s2)
  UNION ALL SELECT '4_near_dedup', (SELECT COUNT(*) FROM s3)
  UNION ALL SELECT '5_surgical_decontam', (SELECT COUNT(*) FROM s4)
  UNION ALL SELECT '6_excised_tokens', (SELECT tok FROM exc)
  UNION ALL SELECT '7_split_train', (SELECT COUNT(*) FROM sp WHERE split = 'train')
  UNION ALL SELECT '8_split_val', (SELECT COUNT(*) FROM sp WHERE split = 'val')
  UNION ALL SELECT '9_split_test', (SELECT COUNT(*) FROM sp WHERE split = 'test')
)
ORDER BY stage
"""


@register(
    "p04_surgical_curation_report",
    category="pipeline",
    doc="p03's composed curation chain with d19's SPAN-level "
    "decontamination replacing d10's whole-document drop — the gate "
    "production training-data audits actually run: documents whose "
    "benchmark-overlapping islands cover more than SURGICAL_MAX_RATIO "
    "of their tokens drop; lightly contaminated documents SURVIVE with "
    "an excision work order, and the report carries the total tokens "
    "the excision pass must cut (6_excised_tokens) alongside the "
    "monotone per-stage survivor counts and split sizes. The oracle "
    "nests the registered t02/d02/d04/d19 SQL as CTEs, so a driver "
    "hash match certifies the five-operator composition end to end.",
    oracle=_surgical_oracle,  # lazy: composed from the registry on first use
)
def p04_surgical_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.pipeline.curate import (
        split_label,
        surgical_stages,
    )

    stages = surgical_stages(spark, sf_dir)

    def cnt(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(label).alias("stage"), "n"
        )

    excised = stages["excision"].agg(
        F.coalesce(F.sum("covered_tokens"), F.lit(0)).cast("long").alias("n")
    ).select(F.lit("6_excised_tokens").alias("stage"), "n")
    sp = stages["surgical"].withColumn("split", split_label(F.col("doc_id")))
    report = (
        cnt(stages["docs"], "1_raw")
        .unionByName(cnt(stages["quality"], "2_quality"))
        .unionByName(cnt(stages["exact_dedup"], "3_exact_dedup"))
        .unionByName(cnt(stages["near_dedup"], "4_near_dedup"))
        .unionByName(cnt(stages["surgical"], "5_surgical_decontam"))
        .unionByName(excised)
        .unionByName(cnt(sp.filter(F.col("split") == "train"), "7_split_train"))
        .unionByName(cnt(sp.filter(F.col("split") == "val"), "8_split_val"))
        .unionByName(cnt(sp.filter(F.col("split") == "test"), "9_split_test"))
    )
    return report.orderBy("stage")
