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


# ---------------------------------------------------------------------------
# p05: per-source corpus data card (the release datasheet)

QUALITY_MICRO = 1_000_000  # quality_score rounded to micro-points before
# summing — integer folds make the per-source mean order-independent
# (quality_score doubles are bit-identical across engines per t02 parity,
# so the rounding is too).


def _datacard_oracle() -> str:
    from european_public_data_pipeline_spark.operators.text import _SQL_TOKENS

    specs = registry._REGISTRY
    t02 = specs["t02_quality_score"].oracle
    d10 = specs["d10_contamination_check"].oracle
    return f"""
WITH t02 AS MATERIALIZED ({t02}),
d10 AS MATERIALIZED ({d10}),
base AS (
  SELECT source, doc_id, n_chars, len({_SQL_TOKENS}) AS n_tok, lang,
         md5(array_to_string(string_split_regex(trim(lower(text)), '\\s+'), ' ')) AS fp
  FROM documents
),
agg1 AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         COUNT(DISTINCT lang) AS n_langs,
         COUNT(DISTINCT fp) AS n_fp
  FROM base GROUP BY source
),
lc AS (
  SELECT source, lang, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY COUNT(*) DESC, lang) AS rn
  FROM documents GROUP BY source, lang
),
qa AS (
  SELECT d.source,
         CAST(SUM(CAST(ROUND(t.quality_score * {QUALITY_MICRO}) AS BIGINT))
              AS BIGINT) AS micro
  FROM t02 t JOIN documents d USING (doc_id) GROUP BY d.source
),
ca AS (
  SELECT d.source, COUNT(*) AS n_train,
         CAST(SUM(CASE WHEN c.contaminated THEN 1 ELSE 0 END) AS BIGINT)
           AS n_contaminated
  FROM d10 c JOIN documents d USING (doc_id) GROUP BY d.source
)
SELECT a.source, a.n_docs, a.total_chars, a.total_tokens,
       a.n_langs, l.lang AS top_lang,
       CAST(l.cnt AS DOUBLE) / a.n_docs AS top_lang_share,
       CAST(q.micro AS DOUBLE) / (a.n_docs * {QUALITY_MICRO}) AS mean_quality,
       CAST(a.n_docs - a.n_fp AS DOUBLE) / a.n_docs AS dup_rate,
       c.n_contaminated,
       CAST(c.n_contaminated AS DOUBLE) / c.n_train AS contaminated_share
FROM agg1 a
JOIN lc l ON l.source = a.source AND l.rn = 1
JOIN qa q ON q.source = a.source
JOIN ca c ON c.source = a.source
ORDER BY a.source
"""


@register(
    "p05_corpus_datacard",
    category="pipeline",
    doc="Per-source corpus data card — the datasheet shipped with every "
    "training-corpus release (Datasheets-for-Datasets style): document / "
    "character / token volume, language spread with the dominant "
    "language's share, mean quality (t02's composite, summed as exact "
    "micro-point integers so the mean is shuffle-order-independent), "
    "within-source exact-duplicate rate (d02's fingerprint), and the "
    "d10 benchmark-contamination share. The oracle nests the registered "
    "t02 and d10 SQL as CTEs, so a driver hash match certifies the "
    "composition. Shape: corpus-linear aggregations with map-side "
    "combine to source cardinality (countDistinct two-phase), every "
    "post-aggregate join source-sized; the top-language window runs on "
    "the (source, lang) histogram, never the corpus. The documents "
    "relation is cached across the card's own four uses; at 100 TB the "
    "t02/d10 inputs come from their already-materialized outputs, so "
    "the marginal cost is one corpus scan plus source-sized joins.",
    oracle=_datacard_oracle,  # lazy: composed from the registry on first use
)
def p05_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from european_public_data_pipeline_spark.operators.text import tokens
    from european_public_data_pipeline_spark.plans.registry import all_specs
    from european_public_data_pipeline_spark.tables import load_table

    # Cached: the card's own branches (volume agg, lang histogram, two
    # doc_id->source mapping joins) all read documents; without this the
    # plan re-scans the corpus four extra times.
    docs = load_table(spark, sf_dir, "documents").cache()
    fp = F.md5(F.array_join(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), " "))
    agg1 = (
        docs.select(
            "source",
            "n_chars",
            F.size(tokens()).cast("long").alias("n_tok"),
            "lang",
            fp.alias("fp"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_tok").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.countDistinct("fp").alias("n_fp"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("cnt"), F.asc("lang"))
    lc = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"), "cnt")
    )
    src = docs.select("doc_id", "source")
    qa = (
        all_specs()["t02_quality_score"].builder(spark, sf_dir)
        .select(
            "doc_id",
            F.round(F.col("quality_score") * QUALITY_MICRO, 0)
            .cast("long")
            .alias("q_micro"),
        )
        .join(src, "doc_id")
        .groupBy("source")
        .agg(F.sum("q_micro").alias("micro"))
    )
    ca = (
        all_specs()["d10_contamination_check"].builder(spark, sf_dir)
        .select("doc_id", F.col("contaminated").cast("long").alias("c"))
        .join(src, "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_train"), F.sum("c").alias("n_contaminated"))
    )
    nd = F.col("n_docs").cast("double")
    return (
        agg1.join(lc, "source")
        .join(qa, "source")
        .join(ca, "source")
        .select(
            "source",
            "n_docs",
            "total_chars",
            "total_tokens",
            "n_langs",
            "top_lang",
            (F.col("cnt").cast("double") / nd).alias("top_lang_share"),
            (
                F.col("micro").cast("double")
                / (nd * F.lit(float(QUALITY_MICRO)))
            ).alias("mean_quality"),
            ((nd - F.col("n_fp").cast("double")) / nd).alias("dup_rate"),
            "n_contaminated",
            (
                F.col("n_contaminated").cast("double")
                / F.col("n_train").cast("double")
            ).alias("contaminated_share"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# p06: data-constrained curation (round-7 chain)

SPAN_DROP_RATIO = 0.5  # drop docs more than half made of corpus-repeated spans


def _constrained_oracle() -> str:
    from european_public_data_pipeline_spark.operators.sampling import (
        allocation_sql_ctes,
    )

    specs = registry._REGISTRY
    d25 = specs["d25_repeated_span_removal"].oracle
    t02 = specs["t02_quality_score"].oracle
    return f"""
WITH d25 AS ({d25}),
t02 AS ({t02}),
s2 AS (
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (
    SELECT doc_id FROM d25
    WHERE CAST(excised_tokens AS DOUBLE) / doc_tokens
          > CAST({SPAN_DROP_RATIO} AS DOUBLE))
),
s3 AS (
  SELECT doc_id FROM s2
  WHERE doc_id IN (SELECT doc_id FROM t02
                   WHERE quality_score >= {_QUALITY_MIN})
),
{allocation_sql_ctes('s3')}
SELECT stage, n FROM (
  SELECT '1_raw' AS stage, (SELECT COUNT(*) FROM documents) AS n
  UNION ALL SELECT '2_span_dedup', (SELECT COUNT(*) FROM s2)
  UNION ALL SELECT '3_quality', (SELECT COUNT(*) FROM s3)
  UNION ALL SELECT '4_emitted_docs', (SELECT emitted FROM em)
  UNION ALL SELECT '5_effective_tokens', (SELECT eff FROM ef)
)
ORDER BY stage
"""


@register(
    "p06_constrained_curation_report",
    category="pipeline",
    doc="The data-constrained curation chain built from the round-7 "
    "operators: d25's ExactSubstr gate drops documents more than half "
    "made of corpus-repeated spans (boilerplate/template carcasses), "
    "t02's quality gate filters the survivors, and sm13's repetition-"
    "capped temperature allocation (shared repetition_allocation code "
    "path — builder and sm13 cannot drift) converts the cleaned corpus "
    "into the final epoch plan: emitted-doc and effective-token totals "
    "under per-source caps. The oracle nests the registered d25 and "
    "t02 SQL as CTEs and restates the allocation arithmetic over the "
    "survivor set, so a driver hash match certifies the three-operator "
    "composition end to end. All counts exact integers.",
    oracle=_constrained_oracle,  # lazy: composed from the registry on first use
)
def p06_constrained_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.sampling import (
        repetition_allocation,
        sm13_per_doc,
    )
    from european_public_data_pipeline_spark.plans.registry import all_specs
    from european_public_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    d25 = all_specs()["d25_repeated_span_removal"].builder(spark, sf_dir)
    heavy = d25.filter(
        F.col("excised_tokens").cast("double") / F.col("doc_tokens")
        > SPAN_DROP_RATIO
    ).select("doc_id")
    s2 = docs.join(heavy, "doc_id", "left_anti").cache()  # feeds count + next gate
    good = (
        all_specs()["t02_quality_score"].builder(spark, sf_dir)
        .filter(F.col("quality_score") >= _QUALITY_MIN)
        .select("doc_id")
    )
    s3 = s2.join(good, "doc_id", "left_semi").cache()  # feeds count + allocation
    alloc = repetition_allocation(sm13_per_doc(s3))

    def cnt(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(label).alias("stage"), "n"
        )

    emitted = alloc.agg(F.sum("n_emitted").cast("long").alias("n")).select(
        F.lit("4_emitted_docs").alias("stage"), "n"
    )
    eff = alloc.agg(F.sum("effective_tokens").cast("long").alias("n")).select(
        F.lit("5_effective_tokens").alias("stage"), "n"
    )
    return (
        cnt(docs, "1_raw")
        .unionByName(cnt(s2, "2_span_dedup"))
        .unionByName(cnt(s3, "3_quality"))
        .unionByName(emitted)
        .unionByName(eff)
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# p07: CCNet-faithful curation (round-8 chain — adds the perplexity gate)


def _ccnet_oracle() -> str:
    from european_public_data_pipeline_spark.operators.sampling import (
        allocation_sql_ctes,
    )
    from european_public_data_pipeline_spark.operators.text import (
        _SQL_PPL_SCORED,
    )

    specs = registry._REGISTRY
    d25 = specs["d25_repeated_span_removal"].oracle
    t02 = specs["t02_quality_score"].oracle
    return f"""
WITH d25 AS ({d25}),
t02 AS ({t02}),
{_SQL_PPL_SCORED},
s2 AS (
  SELECT doc_id FROM documents
  WHERE doc_id NOT IN (
    SELECT doc_id FROM d25
    WHERE CAST(excised_tokens AS DOUBLE) / doc_tokens
          > CAST({SPAN_DROP_RATIO} AS DOUBLE))
),
s3 AS (
  SELECT doc_id FROM s2
  WHERE doc_id IN (SELECT doc_id FROM t02
                   WHERE quality_score >= {_QUALITY_MIN})
),
sb AS (
  SELECT s3.doc_id,
         CASE WHEN sc.score <= th.t1 THEN 'head'
              WHEN sc.score <= th.t2 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM s3, scored sc, th
  WHERE sc.doc_id = s3.doc_id
),
s4 AS (SELECT doc_id FROM sb WHERE bucket IN ('head', 'middle')),
{allocation_sql_ctes('s4')}
SELECT stage, n FROM (
  SELECT '1_raw' AS stage, (SELECT COUNT(*) FROM documents) AS n
  UNION ALL SELECT '2_span_dedup', (SELECT COUNT(*) FROM s2)
  UNION ALL SELECT '3_quality', (SELECT COUNT(*) FROM s3)
  UNION ALL SELECT '4_ppl_' || bucket, COUNT(*) FROM sb GROUP BY bucket
  UNION ALL SELECT '5_ppl_kept', (SELECT COUNT(*) FROM s4)
  UNION ALL SELECT '6_emitted_docs', (SELECT emitted FROM em)
  UNION ALL SELECT '7_effective_tokens', (SELECT eff FROM ef)
)
ORDER BY stage
"""


@register(
    "p07_ccnet_curation_report",
    category="pipeline",
    doc="The CCNet pipeline end-to-end (Wenzek et al. 2020), as one "
    "driver-checked composition: d25's ExactSubstr gate drops span-"
    "dominated documents, t02's heuristic quality gate filters the "
    "survivors, t22's reference-LM perplexity TERCILES gate the rest "
    "(CCNet's actual production move: keep the head/middle buckets, "
    "discard the tail; the bucket assignment comes from the SHARED "
    "perplexity_scored relation, so the gate p07 applies is "
    "definitionally the bucketing t22 reports — reference-source docs "
    "have no score under their own LM and leave the target corpus "
    "here), and sm13's repetition-capped temperature allocation turns "
    "the survivors into the epoch plan. The report carries the full "
    "funnel INCLUDING the per-bucket distribution of quality "
    "survivors (stages 4_ppl_head/middle/tail), so a driver hash "
    "match certifies the four-operator composition and the bucket "
    "boundary placement in one row set. Oracle: the registered d25 "
    "and t02 SQL plus the shared t22 scoring CTE chain, with the "
    "allocation arithmetic restated over the perplexity-kept set. "
    "All counts exact integers; thresholds exact integer micro-nats.",
    oracle=_ccnet_oracle,  # lazy: composed from the registry on first use
)
def p07_ccnet_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.sampling import (
        repetition_allocation,
        sm13_per_doc,
    )
    from european_public_data_pipeline_spark.operators.text import (
        perplexity_scored,
    )
    from european_public_data_pipeline_spark.plans.registry import all_specs
    from european_public_data_pipeline_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    d25 = all_specs()["d25_repeated_span_removal"].builder(spark, sf_dir)
    heavy = d25.filter(
        F.col("excised_tokens").cast("double") / F.col("doc_tokens")
        > SPAN_DROP_RATIO
    ).select("doc_id")
    s2 = docs.join(heavy, "doc_id", "left_anti").cache()
    good = (
        all_specs()["t02_quality_score"].builder(spark, sf_dir)
        .filter(F.col("quality_score") >= _QUALITY_MIN)
        .select("doc_id")
    )
    s3 = s2.join(good, "doc_id", "left_semi").cache()
    # Inner join against the shared scored relation: reference-source
    # documents (the LM's training set) have no score and exit the
    # target corpus here, exactly as in CCNet.
    sb = (
        s3.select("doc_id")
        .join(perplexity_scored(spark, sf_dir).select("doc_id", "bucket"), "doc_id")
        .cache()  # feeds the bucket histogram AND the keep-gate
    )
    s4 = sb.filter(F.col("bucket") != "tail").select("doc_id")
    kept_docs = s3.join(s4, "doc_id", "left_semi")
    alloc = repetition_allocation(sm13_per_doc(kept_docs))

    def cnt(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(label).alias("stage"), "n"
        )

    buckets = (
        sb.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.concat(F.lit("4_ppl_"), F.col("bucket")).alias("stage"), "n"
        )
    )
    emitted = alloc.agg(F.sum("n_emitted").cast("long").alias("n")).select(
        F.lit("6_emitted_docs").alias("stage"), "n"
    )
    eff = alloc.agg(F.sum("effective_tokens").cast("long").alias("n")).select(
        F.lit("7_effective_tokens").alias("stage"), "n"
    )
    return (
        cnt(docs, "1_raw")
        .unionByName(cnt(s2, "2_span_dedup"))
        .unionByName(cnt(s3, "3_quality"))
        .unionByName(buckets)
        .unionByName(cnt(s4, "5_ppl_kept"))
        .unionByName(emitted)
        .unionByName(eff)
        .orderBy("stage")
    )
