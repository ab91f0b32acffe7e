"""Corpus sampling operators (SURVEY.md §2.12 — the training-data mandate).

Training-data pipelines rebalance corpus composition before training:
up/down-sample languages and sources to hit a target mix, or cap each
stratum at an exact document budget. Both shapes are here, and both are
**deterministic** — sampling decisions are pure functions of the row key
via the portable 28-bit md5 hash (operators/dedup.py base_hash28), never
an RNG. Deterministic sampling is what makes a 100 TB sample reproducible
across reruns, resumable after failure, and oracle-checkable: Spark's
``df.sample``/``sampleBy`` use seeded per-partition RNGs whose draw order
depends on partitioning, so results change when the cluster layout does.

Scale notes (100 TB):
- Rate-based sampling (sm01) is a pure narrow filter — zero shuffle, runs
  inside the scan's whole-stage codegen, trivially partition-parallel.
  This is THE way to cut a reproducible slice of a petabyte corpus.
- Exact-budget sampling (sm02) needs a per-stratum top-k: one shuffle keyed
  on the stratum. Hash-ordering within the stratum makes the chosen set a
  uniform pseudo-random subset, and keys are language codes (bounded
  cardinality) — with heavy skew, replace row_number with the two-phase
  "sample rank threshold per stratum, then filter" trick; at this k the
  single window is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.tables import load_table

# Target corpus mix: per-language keep rates in basis points (of 10000).
# en is downsampled (over-represented in the raw crawl), low-resource
# languages are kept in full — the standard rebalancing move.
STRATUM_RATES_BP = {"en": 5000, "de": 10000, "fr": 10000, "es": 7500, "zh": 2500}

# Exact per-stratum document budget for sm02.
STRATUM_BUDGET = 20

# Token capacity of one training block for sm03 (GPT-style packing).
PACK_CAPACITY = 512

_HASH_SQL = "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)"


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{lang}' THEN {bp}" for lang, bp in sorted(STRATUM_RATES_BP.items())
    )
    return f"CASE {whens} ELSE 0 END"


@register(
    "sm01_stratified_sample",
    category="sampling",
    doc="Deterministic stratified sample: keep a document iff "
    "portable_hash(doc_id) mod 10000 < its language's rate in basis "
    "points. A pure narrow filter (no shuffle, no RNG) — reproducible "
    "across reruns and cluster layouts, unlike df.sampleBy whose seeded "
    "per-partition draws move with the partitioning.",
    oracle=f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_HASH_SQL} % 10000 < ({_rate_case_sql()})
ORDER BY doc_id
""",
)
def sm01_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Imported here, not at module top: operators.dedup itself imports the
    # plans package (whose __init__ imports this module), so a top-level
    # import breaks when dedup is the first module loaded.
    from european_public_data_pipeline_spark.operators.dedup import base_hash28

    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(0)
    for lang, bp in sorted(STRATUM_RATES_BP.items()):
        rate = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(rate)
    keep = base_hash28(F.col("doc_id").cast("string")) % 10000 < rate
    return (
        docs.filter(keep)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "sm02_per_stratum_budget",
    category="sampling",
    doc="Exact-budget stratified sample: the first N documents per "
    "language in portable-hash order (doc_id tie-break) — a deterministic "
    "'reservoir' that yields an exact per-stratum count where sm01's "
    "rate filter yields an expected one. One shuffle keyed on the "
    "stratum; hash-ordering makes the kept set pseudo-uniform.",
    oracle=f"""
SELECT lang, doc_id, hv
FROM (
  SELECT lang, doc_id, {_HASH_SQL} AS hv,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {_HASH_SQL}, doc_id) AS rn
  FROM documents
)
WHERE rn <= {STRATUM_BUDGET}
ORDER BY lang, hv, doc_id
""",
)
def sm02_per_stratum_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.dedup import base_hash28

    docs = load_table(spark, sf_dir, "documents")
    hv = base_hash28(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy("hv", "doc_id")
    return (
        docs.select("lang", "doc_id", hv.alias("hv"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_BUDGET)
        .select("lang", "doc_id", "hv")
        .orderBy("lang", "hv", "doc_id")
    )


@register(
    "sm03_sequence_packing",
    category="sampling",
    doc="Concat-and-chunk sequence packing: per language, documents are "
    "concatenated in deterministic portable-hash order and the token "
    f"stream is cut into fixed {PACK_CAPACITY}-token training blocks "
    "(the GPT-style pack-then-split model). Each document's placement — "
    "its token offset, first/last block, and how many blocks it spans — "
    "falls out of one windowed cumulative sum of exact integer token "
    "counts: one shuffle on the language key, no sequential driver loop, "
    "and bit-exact parity for free. At 100 TB the window partitions by "
    "(lang, shard) where shard = hash-bucket of doc_id, keeping each "
    "cumsum partition bounded while preserving determinism.",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         {_HASH_SQL} AS hv
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY hv, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS token_offset
  FROM d
)
SELECT doc_id, lang, n_tokens, token_offset,
       token_offset // {PACK_CAPACITY} AS first_block,
       (token_offset + n_tokens - 1) // {PACK_CAPACITY} AS last_block,
       (token_offset + n_tokens - 1) // {PACK_CAPACITY}
         - token_offset // {PACK_CAPACITY} + 1 AS blocks_spanned
FROM c
ORDER BY doc_id
""",
)
def sm03_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.dedup import base_hash28

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tokens"),
        base_hash28(F.col("doc_id").cast("string")).alias("hv"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("hv", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offset = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint")
    first = F.floor(F.col("token_offset") / PACK_CAPACITY).cast("bigint")
    last = F.floor(
        (F.col("token_offset") + F.col("n_tokens") - 1) / PACK_CAPACITY
    ).cast("bigint")
    return (
        base.withColumn("token_offset", offset)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "token_offset",
            first.alias("first_block"),
            last.alias("last_block"),
            (last - first + 1).alias("blocks_spanned"),
        )
        .orderBy("doc_id")
    )


MIX_UNIFORM_WEIGHT = 0.5  # interpolation toward the uniform source mix


@register(
    "sm04_source_mixture_weights",
    category="sampling",
    doc="Source-rebalancing weights: per-source sampling weight as a "
    "linear interpolation between the corpus's natural source mix and "
    "the uniform mix (alpha = 0.5) — the standard 'flatten the source "
    "distribution' reweighting used to keep majority sources from "
    "dominating a training run, with the expected post-mix document "
    "count per source. A linear mixture (not a temperature power) keeps "
    "every float a ratio of exact integers — bit-exact with no libm. "
    "Shape: one source-keyed aggregate (tiny), one global window over "
    "the source-cardinality relation.",
    oracle=f"""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
tot AS (
  SELECT source, n_docs,
         CAST(SUM(n_docs) OVER () AS BIGINT) AS total,
         COUNT(*) OVER () AS n_sources
  FROM per_source
)
SELECT source, n_docs,
       CAST(n_docs AS DOUBLE) / total AS natural_share,
       {MIX_UNIFORM_WEIGHT} * (CAST(n_docs AS DOUBLE) / total)
         + {1 - MIX_UNIFORM_WEIGHT} * (1.0 / n_sources) AS mixed_share,
       ({MIX_UNIFORM_WEIGHT} * (CAST(n_docs AS DOUBLE) / total)
         + {1 - MIX_UNIFORM_WEIGHT} * (1.0 / n_sources))
         / (CAST(n_docs AS DOUBLE) / total) AS weight
FROM tot
ORDER BY source
""",
)
def sm04_source_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    total = F.sum("n_docs").over(w).cast("bigint")
    n_sources = F.count(F.lit(1)).over(w)
    tot = per_source.select(
        "source", "n_docs", total.alias("total"), n_sources.alias("n_sources")
    )
    natural = F.col("n_docs").cast("double") / F.col("total")
    mixed = MIX_UNIFORM_WEIGHT * natural + (1 - MIX_UNIFORM_WEIGHT) * (
        F.lit(1.0) / F.col("n_sources")
    )
    return tot.select(
        "source",
        "n_docs",
        natural.alias("natural_share"),
        mixed.alias("mixed_share"),
        (mixed / natural).alias("weight"),
    ).orderBy("source")


# Train/val/test split in basis points of 10000 (sums to 10000).
SPLIT_BP = {"train": 9000, "val": 500, "test": 500}


@register(
    "sm05_train_val_test_split",
    category="sampling",
    doc="Deterministic train/val/test split (90/5/5): the split label is "
    "a pure function of portable_hash(doc_id) mod 10000 against "
    "cumulative basis-point boundaries — reproducible across reruns, "
    "engines, and cluster layouts, and stable under corpus growth (a "
    "document never changes split when others are added, the property "
    "random splits lack). Zero shuffle: the label is a narrow projected "
    "expression; the per-split rollup is a 3-row aggregate.",
    oracle=f"""
WITH labeled AS (
  SELECT doc_id, lang,
         CASE WHEN {_HASH_SQL} % 10000 < {SPLIT_BP['train']} THEN 'train'
              WHEN {_HASH_SQL} % 10000 < {SPLIT_BP['train'] + SPLIT_BP['val']} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n_docs,
       CAST(COUNT(*) AS DOUBLE)
         / (SELECT COUNT(*) FROM documents) AS share
FROM labeled
GROUP BY split
ORDER BY split
""",
)
def sm05_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.dedup import base_hash28

    docs = load_table(spark, sf_dir, "documents")
    bucket = base_hash28(F.col("doc_id").cast("string")) % 10000
    split = (
        F.when(bucket < SPLIT_BP["train"], F.lit("train"))
        .when(bucket < SPLIT_BP["train"] + SPLIT_BP["val"], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    total = docs.count()
    return (
        docs.select(split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "split",
            "n_docs",
            (F.col("n_docs").cast("double") / F.lit(total)).alias("share"),
        )
        .orderBy("split")
    )


EPOCH_SEED = "epoch1"


@register(
    "sm06_epoch_shuffle",
    category="sampling",
    doc="Deterministic global training-order shuffle: the sort key is a "
    "portable hash of (epoch seed, doc_id), so every epoch is a "
    "reproducible full permutation and changing the seed literal reshuffles "
    "without touching the data. The ordering is a range-partitioned "
    "distributed sort on the hash key — no single-partition stage, no RNG, "
    "restart-safe; consumers stream partitions in key order. The output "
    "carries the key so downstream stages can merge-sort splits without "
    "re-ranking.",
    oracle=f"""
SELECT doc_id, lang, source,
       CAST('0x' || substr(md5('{EPOCH_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 7) AS BIGINT)
         AS shuffle_key
FROM documents
ORDER BY shuffle_key, doc_id
""",
)
def sm06_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.dedup import base_hash28

    docs = load_table(spark, sf_dir, "documents")
    key = base_hash28(
        F.concat(F.lit(f"{EPOCH_SEED}:"), F.col("doc_id").cast("string"))
    )
    return (
        docs.select("doc_id", "lang", "source", key.alias("shuffle_key"))
        .orderBy("shuffle_key", "doc_id")
    )


# Temperature exponent for sm07 — 0.5 (square root) is the multilingual-
# rebalancing exponent popularized by mBERT/XLM-R data sampling. sqrt is
# an IEEE correctly-rounded primitive, so unlike an arbitrary pow() the
# scaled weights are bit-identical across engines.
SM07_SEED = "sm07"


@register(
    "sm07_temperature_mixture",
    category="sampling",
    doc="Temperature-scaled language mixture (T=2, i.e. p^(1/2)): "
    "upsample low-resource languages by renormalizing sqrt-scaled shares, "
    "then APPLY the mixture with a deterministic per-doc hash filter at "
    "the implied basis-point rate — the standard multilingual rebalancing "
    "pass, reproducible across reruns and cluster layouts. Exactness: "
    "sqrt-shares are fixed-pointed (floor*1e9) so their sum is an exact "
    "integer fold; every emitted float is a short chain of correctly-"
    "rounded IEEE ops on exact inputs. Shape: one lang-keyed aggregate "
    "(tiny), the rate relation broadcast back onto the corpus for a "
    "narrow filter+count — corpus-linear, no global window.",
    oracle=f"""
WITH per_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM per_lang),
scaled AS (
  SELECT lang, n_docs,
         CAST(floor(sqrt(CAST(n_docs AS DOUBLE) / total) * 1e9) AS BIGINT) AS s
  FROM per_lang, tot
),
wts AS (
  SELECT lang, n_docs,
         CAST(s AS DOUBLE) / (SELECT CAST(SUM(s) AS BIGINT) FROM scaled) AS weight,
         CAST(floor(least(1.0,
             (CAST(s AS DOUBLE) / (SELECT CAST(SUM(s) AS BIGINT) FROM scaled))
             * (SELECT total FROM tot) / n_docs) * 10000) AS BIGINT) AS rate_bp
  FROM scaled
)
SELECT w.lang, w.n_docs, w.weight, w.rate_bp,
       CAST(COUNT(*) FILTER (
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '{SM07_SEED}'), 1, 7) AS BIGINT)
           % 10000 < w.rate_bp) AS BIGINT) AS n_sampled
FROM wts w JOIN documents d ON d.lang = w.lang
GROUP BY w.lang, w.n_docs, w.weight, w.rate_bp
ORDER BY w.lang
""",
)
def sm07_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.dedup import base_hash28

    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = per_lang.agg(F.sum("n_docs").cast("bigint").alias("total"))
    scaled = per_lang.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        "total",
        F.floor(F.sqrt(F.col("n_docs").cast("double") / F.col("total")) * 1e9)
        .cast("bigint")
        .alias("s"),
    )
    ssum = scaled.agg(F.sum("s").cast("bigint").alias("ssum"))
    weight = F.col("s").cast("double") / F.col("ssum")
    rate_bp = F.floor(
        F.least(
            F.lit(1.0), weight * F.col("total") / F.col("n_docs")
        )
        * 10000
    ).cast("bigint")
    wts = scaled.crossJoin(F.broadcast(ssum)).select(
        "lang", "n_docs", weight.alias("weight"), rate_bp.alias("rate_bp")
    )
    hv = base_hash28(F.concat(F.col("doc_id").cast("string"), F.lit(SM07_SEED)))
    return (
        docs.join(F.broadcast(wts), "lang")
        .groupBy("lang", "n_docs", "weight", "rate_bp")
        .agg(
            F.sum(F.when(hv % 10000 < F.col("rate_bp"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled")
        )
        .orderBy("lang")
    )


# Per-language character budget for sm08 as a fraction of the language's
# total characters (basis points of 10000). Buckets quantize the quality
# ordering; 1000 levels keeps the per-language decision relation tiny.
CHAR_BUDGET_BP = 3000
TTR_BUCKETS = 1000

_SM08_TTR_SQL = """
CAST(floor(least(
  CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS DOUBLE)
    / len(string_split_regex(trim(text), '\\s+')), 0.999) * 1000) AS BIGINT)
"""


@register(
    "sm08_quality_budget_mixture",
    category="sampling",
    doc="Budget-constrained quality selection per language: keep the "
    "highest-quality documents of each language until a character budget "
    "(30% of that language's total chars). Quality = type-token ratio, "
    "quantized to 1000 buckets. The scalable selection-by-quantile "
    "pattern: the corpus collapses to a (lang, bucket) char histogram "
    "(<=5k rows), a per-lang running total over bucket-descending order "
    "picks the greedy keep set (window partitions are language-sized — "
    "bounded, never corpus-wide), and the keep set broadcasts back as a "
    "semi join. No corpus-wide sort, no per-document window: the full "
    "sort-by-quality a naive cumsum would need is replaced by bucket "
    "granularity (documents inside one bucket are kept or dropped "
    "together — the boundary bucket is dropped if it overflows the "
    "budget).",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, lang, n_chars, {_SM08_TTR_SQL} AS bucket
  FROM documents
),
hist AS (
  SELECT lang, bucket, SUM(n_chars) AS bucket_chars
  FROM scored GROUP BY lang, bucket
),
budget AS (
  SELECT lang, SUM(bucket_chars) * {CHAR_BUDGET_BP} / 10000.0 AS char_budget
  FROM hist GROUP BY lang
),
keepset AS (
  SELECT h.lang, h.bucket
  FROM (
    SELECT lang, bucket,
           SUM(bucket_chars) OVER (PARTITION BY lang ORDER BY bucket DESC
                                   ROWS UNBOUNDED PRECEDING) AS cum_chars
    FROM hist
  ) h
  JOIN budget b ON b.lang = h.lang
  WHERE h.cum_chars <= b.char_budget
)
SELECT s.doc_id, s.lang, s.n_chars, s.bucket
FROM scored s
JOIN keepset k ON k.lang = s.lang AND k.bucket = s.bucket
ORDER BY s.doc_id
""",
)
def sm08_quality_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.trim(F.col("text")), r"\s+")
    ttr = F.size(F.array_distinct(w)).cast("double") / F.size(w)
    bucket = F.floor(F.least(ttr, F.lit(0.999)) * TTR_BUCKETS).cast("long")
    scored = docs.select("doc_id", "lang", "n_chars", bucket.alias("bucket"))
    hist = scored.groupBy("lang", "bucket").agg(
        F.sum("n_chars").alias("bucket_chars")
    )
    budget = hist.groupBy("lang").agg(
        (F.sum("bucket_chars") * CHAR_BUDGET_BP / 10000.0).alias("char_budget")
    )
    wlang = (
        Window.partitionBy("lang")
        .orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keepset = (
        hist.withColumn("cum_chars", F.sum("bucket_chars").over(wlang))
        .join(budget, "lang")
        .filter(F.col("cum_chars") <= F.col("char_budget"))
        .select("lang", "bucket")
    )
    return (
        scored.join(F.broadcast(keepset), ["lang", "bucket"], "left_semi")
        .select("doc_id", "lang", "n_chars", "bucket")
        .orderBy("doc_id")
    )


UPSAMPLE_STEP = 300  # one emitted copy per 300 chars of cumulative mass


@register(
    "sm09_weighted_upsampling",
    category="sampling",
    doc="Deterministic weighted upsampling (systematic resampling): each "
    "document is emitted floor(cumw_i/step) - floor(cumw_{i-1}/step) "
    "times, where cumw is the running n_chars mass per language in "
    "doc_id order — longer documents repeat proportionally more, total "
    "output is mass/step rows, and (unlike RNG multinomial draws) the "
    "result is reproducible bit-for-bit across engines and re-runs. "
    "This is the upweighting half of a training mixture (sm01-sm08 "
    "downsample; epoch recipes also need controlled repetition). One "
    "lang-keyed window cumsum (range-partitionable sort, sm06's "
    "contract) + a row-local sequence explode; all arithmetic is exact "
    "integers.",
    oracle=f"""
WITH c AS (
  SELECT lang, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id) AS cumw
  FROM documents
),
k AS (
  SELECT lang, doc_id, n_chars,
         cumw // {UPSAMPLE_STEP} - (cumw - n_chars) // {UPSAMPLE_STEP} AS n_copies
  FROM c
)
SELECT lang, doc_id, n_chars, CAST(n_copies AS BIGINT) AS n_copies, CAST(i AS BIGINT) AS copy_idx
FROM k, UNNEST(generate_series(1, CAST(n_copies AS BIGINT))) AS t(i)
WHERE n_copies > 0
ORDER BY lang, doc_id, copy_idx
""",
)
def sm09_weighted_upsampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    w = Window.partitionBy("lang").orderBy("doc_id")
    c = docs.withColumn("cumw", F.sum("n_chars").over(w))
    k = c.withColumn(
        "n_copies",
        F.expr(f"cumw div {UPSAMPLE_STEP}")
        - F.expr(f"(cumw - n_chars) div {UPSAMPLE_STEP}"),
    ).filter(F.col("n_copies") > 0)
    return (
        k.select(
            "lang",
            "doc_id",
            "n_chars",
            "n_copies",
            F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies"))).alias(
                "copy_idx"
            ),
        )
        .orderBy("lang", "doc_id", "copy_idx")
    )


def _sm10_oracle() -> str:
    # Lazy: composes dedup's shingle/closure SQL; a module-level import of
    # dedup here would re-enter plans/__init__ during partial init (same
    # hazard as d17's oracle).
    from european_public_data_pipeline_spark.operators.dedup import (
        _SQL_SHINGLES,
        JACCARD_THRESHOLD,
    )

    cluster_hash = (
        "CAST('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 7) AS BIGINT)"
    )
    return f"""
WITH RECURSIVE sh AS ({_SQL_SHINGLES}),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS isect
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT d1, d2
  FROM inter
  JOIN sizes s1 ON s1.doc_id = d1
  JOIN sizes s2 ON s2.doc_id = d2
  WHERE CAST(isect AS DOUBLE) / (s1.n + s2.n - isect) >= {JACCARD_THRESHOLD}
),
edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
          UNION ALL SELECT d2, d1 FROM pairs),
reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.id
),
comp AS (SELECT id AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY id),
labeled AS (
  SELECT doc_id, cluster_id,
         CASE WHEN {cluster_hash} % 10000 < {SPLIT_BP['train']} THEN 'train'
              WHEN {cluster_hash} % 10000 < {SPLIT_BP['train'] + SPLIT_BP['val']} THEN 'val'
              ELSE 'test' END AS split
  FROM comp
)
SELECT doc_id, cluster_id, split,
       CASE WHEN COUNT(*) OVER (PARTITION BY cluster_id) > 1 THEN 1 ELSE 0 END
         AS in_multi_cluster
FROM labeled
ORDER BY doc_id
"""


@register(
    "sm10_leakage_safe_split",
    category="sampling",
    doc="Train/val/test split that CANNOT leak near-duplicates across "
    "splits: the split label is a pure function of the near-dup CLUSTER "
    "id (d08's connected components), not the document id — every "
    "member of a duplicate cluster lands in the same split by "
    "construction, closing the classic evaluation-contamination hole "
    "in hash-per-document splits (a paraphrased copy of a test doc in "
    "train inflates eval). Same growth-stable basis-point rule as "
    "sm05. Cost beyond d08's cluster assignment: a narrow projected "
    "hash expression and one cluster-keyed window flag — the cluster "
    "relation is corpus-sized but the split adds no extra corpus "
    "shuffle.",
    oracle=_sm10_oracle,
)
def sm10_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.dedup import (
        base_hash28,
        d08_dup_clusters,
    )
    from pyspark.sql import Window

    comp = d08_dup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    bucket = base_hash28(F.col("cluster_id").cast("string")) % 10000
    split = (
        F.when(bucket < SPLIT_BP["train"], F.lit("train"))
        .when(bucket < SPLIT_BP["train"] + SPLIT_BP["val"], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    w = Window.partitionBy("cluster_id")
    return (
        comp.select("doc_id", "cluster_id", split.alias("split"))
        .withColumn(
            "in_multi_cluster",
            F.when(F.count(F.lit(1)).over(w) > 1, F.lit(1)).otherwise(F.lit(0)),
        )
        .orderBy("doc_id")
    )


SM11_SEED = "sm11"


@register(
    "sm11_temperature_sweep",
    category="sampling",
    doc="Temperature-sweep calibration for the multilingual mixture — "
    "d18's sweep pattern applied to sm07: per-language weights, implied "
    "sampling rates, and realized sample counts under tau in {1, 2, 4, "
    "uniform} side by side, the table read before committing to a "
    "mixture temperature. Determinism without pow(): the swept "
    "exponents are chosen so every scaling is a chain of IEEE-exact "
    "ops — p^1 (identity), p^(1/2) (sqrt), p^(1/4) (sqrt of sqrt), "
    "p^0 (uniform) — each fixed-pointed (floor*1e9) before the "
    "normalizing integer sum. Scale shape: the corpus is aggregated "
    "ONCE into a (lang, hash-bucket) histogram (q44's domain trick — "
    "at most 10k buckets per language); every temperature's realized "
    "count is then a histogram lookup, so sweeping more temperatures "
    "costs zero additional corpus scans.",
    oracle=f"""
WITH per_lang AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
),
tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM per_lang),
taus(tau) AS (VALUES ('t1'), ('t2'), ('t4'), ('uniform')),
scaled AS (
  SELECT t.tau, p.lang, p.n_docs,
         CAST(floor(CASE t.tau
            WHEN 't1' THEN CAST(p.n_docs AS DOUBLE) / tot.total
            WHEN 't2' THEN sqrt(CAST(p.n_docs AS DOUBLE) / tot.total)
            WHEN 't4' THEN sqrt(sqrt(CAST(p.n_docs AS DOUBLE) / tot.total))
            ELSE 1.0 END * 1e9) AS BIGINT) AS s
  FROM per_lang p CROSS JOIN tot CROSS JOIN taus t
),
wts AS (
  SELECT tau, lang, n_docs,
         CAST(s AS DOUBLE) / (SELECT CAST(SUM(s2.s) AS BIGINT)
                              FROM scaled s2 WHERE s2.tau = scaled.tau) AS weight
  FROM scaled
),
rates AS (
  SELECT w.tau, w.lang, w.n_docs, w.weight,
         CAST(floor(least(1.0, w.weight * tot.total / w.n_docs) * 10000) AS BIGINT)
           AS rate_bp
  FROM wts w CROSS JOIN tot
),
hist AS (
  SELECT lang,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{SM11_SEED}'), 1, 7) AS BIGINT)
           % 10000 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
)
SELECT r.tau, r.lang, r.n_docs, r.weight, r.rate_bp,
       CAST(COALESCE(SUM(h.n) FILTER (h.bucket < r.rate_bp), 0) AS BIGINT) AS n_sampled
FROM rates r JOIN hist h ON h.lang = r.lang
GROUP BY r.tau, r.lang, r.n_docs, r.weight, r.rate_bp
ORDER BY r.tau, r.lang
""",
)
def sm11_temperature_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.dedup import base_hash28

    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = per_lang.agg(F.sum("n_docs").cast("bigint").alias("total"))
    taus = docs.sparkSession.createDataFrame(
        [("t1",), ("t2",), ("t4",), ("uniform",)], "tau string"
    )
    p = F.col("n_docs").cast("double") / F.col("total")
    f = (
        F.when(F.col("tau") == "t1", p)
        .when(F.col("tau") == "t2", F.sqrt(p))
        .when(F.col("tau") == "t4", F.sqrt(F.sqrt(p)))
        .otherwise(F.lit(1.0))
    )
    scaled = (
        per_lang.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(taus))
        .select(
            "tau", "lang", "n_docs", "total",
            F.floor(f * 1e9).cast("bigint").alias("s"),
        )
    )
    sums = scaled.groupBy("tau").agg(F.sum("s").cast("bigint").alias("s_sum"))
    rates = (
        scaled.join(F.broadcast(sums), "tau")
        .select(
            "tau", "lang", "n_docs",
            (F.col("s").cast("double") / F.col("s_sum")).alias("weight"),
            "total",
        )
        .withColumn(
            "rate_bp",
            F.floor(
                F.least(
                    F.lit(1.0),
                    F.col("weight") * F.col("total") / F.col("n_docs"),
                )
                * 10000
            ).cast("bigint"),
        )
        .drop("total")
    )
    hist = docs.groupBy(
        "lang",
        (base_hash28(F.concat(F.col("doc_id").cast("string"), F.lit(SM11_SEED))) % 10000)
        .alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    sampled = F.coalesce(
        F.sum(F.when(F.col("bucket") < F.col("rate_bp"), F.col("n"))), F.lit(0)
    ).cast("bigint")
    return (
        rates.join(hist, "lang")
        .groupBy("tau", "lang", "n_docs", "weight", "rate_bp")
        .agg(sampled.alias("n_sampled"))
        .orderBy("tau", "lang")
    )


# sm12 curriculum: quality-banded training order with EXACT global
# positions and zero global sort. Band = floor(quality_score * 10)
# (t02's score, identical doubles in both engines, so the floor is
# bit-stable); within a band the order is a seeded portable hash
# (doc_id tie-break). The global position is assembled two-level:
# high-order hash bits define 16 contiguous buckets, per-(band, bucket)
# counts prefix-sum into offsets (an aggregate-sized relation), and a
# bounded row_number inside each (band, bucket) partition adds the
# local rank — the scalable replacement for ROW_NUMBER() OVER (ORDER BY
# ...) whose single global sort partition is the q87-class skew bomb.
CURRICULUM_SEED = "curriculum0"
CURRICULUM_BUCKETS = 16  # high-order 4 bits of the 28-bit hash
_CURR_HASH_SQL = (
    "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'curriculum0'), 1, 7) "
    "AS BIGINT)"
)


def _sm12_oracle() -> str:
    from european_public_data_pipeline_spark.plans import registry

    t02 = registry._resolve("t02_quality_score").oracle
    return f"""
WITH t02 AS MATERIALIZED ({t02}),
base AS (
  SELECT doc_id,
         CAST(LEAST(GREATEST(floor(quality_score * 10), 0), 9) AS INTEGER)
           AS band,
         {_CURR_HASH_SQL} AS h
  FROM t02
)
SELECT doc_id, band,
       CAST(ROW_NUMBER() OVER (ORDER BY band DESC, h, doc_id) AS BIGINT)
         AS pos
FROM base
ORDER BY pos
"""


@register(
    "sm12_curriculum_schedule",
    category="sampling",
    doc="Deterministic curriculum ordering for training: every document "
    "gets an EXACT global position — highest t02 quality band first, "
    "seeded-hash order within a band (easy-to-hard scheduling with "
    "reproducible within-band shuffling). The scalable construction "
    "computes that global total order WITHOUT any global sort or "
    "whole-corpus window: 16 contiguous buckets from the hash's "
    "high-order bits, one aggregate-sized (band, bucket) count + "
    "prefix-sum for the offsets, and a row_number bounded inside each "
    "(band, bucket) partition — position = offset + local rank, proven "
    "equal to the oracle's ROW_NUMBER() OVER (ORDER BY band DESC, "
    "hash, doc_id) global window. sm06 shuffles flat; sm12 adds the "
    "quality curriculum and materializes positions with bounded "
    "parallelism at any corpus size.",
    oracle=_sm12_oracle,  # lazy: composed from the registry on first use
)
def sm12_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.plans.registry import all_specs

    from european_public_data_pipeline_spark.operators.dedup import base_hash28

    q = all_specs()["t02_quality_score"].builder(spark, sf_dir).select(
        "doc_id", "quality_score"
    )
    h = base_hash28(
        F.concat(F.col("doc_id").cast("string"), F.lit(CURRICULUM_SEED))
    )
    band = F.least(
        F.greatest(F.floor(F.col("quality_score") * 10), F.lit(0)), F.lit(9)
    ).cast("int")
    base = q.select("doc_id", band.alias("band"), h.alias("h")).withColumn(
        # 28-bit hash -> high-order 4 bits: buckets are CONTIGUOUS hash
        # ranges, so (band DESC, bucket ASC, h ASC) is the global order.
        "bucket", F.shiftright(F.col("h"), 24).cast("int")
    )
    counts = base.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # Offsets: docs ordered strictly before this (band, bucket) group.
    # The window runs over the aggregate-sized counts relation (<= 160
    # rows), not the corpus — q87's domain-histogram pattern.
    w = (
        Window.orderBy(F.desc("band"), F.asc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "band", "bucket", F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("off")
    )
    local = Window.partitionBy("band", "bucket").orderBy("h", "doc_id")
    return (
        base.join(F.broadcast(offsets), ["band", "bucket"])
        .select(
            "doc_id",
            "band",
            (F.col("off") + F.row_number().over(local)).cast("bigint").alias("pos"),
        )
    )


# --- sm13: repetition-capped temperature mixture ---------------------------

SM13_BUDGET_X = 2       # token budget = 2x the corpus (two nominal epochs)
SM13_MAX_EPOCH_BP = 20000  # repetition cap: 2.0 epochs per source


@register(
    "sm13_repetition_capped_mixture",
    category="sampling",
    doc="Repetition-capped temperature mixture — the data-constrained-"
    "scaling allocation (Muennighoff et al. 2023): a 2x-corpus token "
    "budget is split across SOURCES by sqrt-temperature weights "
    "(sm07's recipe over token mass, which over-repeats small "
    "sources), then each source's epoch count is CAPPED at 2.0 — the "
    "cap binds exactly on the small sources temperature sampling "
    "would repeat hardest, which is where repeated data stops helping. "
    "Per source: desired vs capped epochs (basis points), effective "
    "token yield, and the emitted-doc count under deterministic "
    "fractional repetition (every doc repeats floor(epochs) times, "
    "plus one more iff its md5 hash lands under the fractional part — "
    "reproducible across reruns and partitionings, no RNG). "
    "Exactness: sqrt-weights are fixed-pointed micro-units summed as "
    "integers (sm07); the epoch arithmetic is one identical IEEE "
    "chain in both engines; everything else is exact ints. Shape: one "
    "doc-level projection feeding a source-keyed aggregate (map-side "
    "combined), the 20-row weight relation broadcast back onto the "
    "corpus for the emission count — corpus-linear, no windows.",
    oracle=f"""
WITH per_doc AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+')) AS toks,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'sm13'), 1, 7) AS BIGINT)
           % 10000 AS hv
  FROM documents
),
s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(toks) AS BIGINT) AS source_tokens
  FROM per_doc GROUP BY source
),
t AS (SELECT CAST(SUM(source_tokens) AS BIGINT) AS total FROM s),
w AS (
  SELECT source, n_docs, source_tokens,
         CAST(floor(sqrt(CAST(source_tokens AS DOUBLE) / total) * 1e9) AS BIGINT) AS sw
  FROM s, t
),
e AS (
  SELECT source, n_docs, source_tokens,
         CAST(floor({SM13_BUDGET_X}.0 * (SELECT total FROM t)
                    * (CAST(sw AS DOUBLE) / (SELECT CAST(SUM(sw) AS BIGINT) FROM w))
                    / CAST(source_tokens AS DOUBLE) * 10000) AS BIGINT)
           AS desired_epochs_bp
  FROM w
),
capped AS (
  SELECT source, n_docs, source_tokens, desired_epochs_bp,
         least(desired_epochs_bp, {SM13_MAX_EPOCH_BP}) AS capped_epochs_bp,
         desired_epochs_bp > {SM13_MAX_EPOCH_BP} AS was_capped
  FROM e
)
SELECT c.source, c.n_docs, c.source_tokens, c.desired_epochs_bp,
       c.capped_epochs_bp, c.was_capped,
       CAST(c.source_tokens * c.capped_epochs_bp // 10000 AS BIGINT)
         AS effective_tokens,
       CAST(SUM(c.capped_epochs_bp // 10000
                + CASE WHEN d.hv < c.capped_epochs_bp % 10000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_emitted
FROM capped c JOIN per_doc d ON d.source = c.source
GROUP BY 1, 2, 3, 4, 5, 6, 7
ORDER BY c.source
""",
)
def sm13_repetition_capped_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return repetition_allocation(sm13_per_doc(docs))


def allocation_sql_ctes(survivor_cte: str) -> str:
    """The repetition-capped allocation arithmetic as an oracle CTE chain
    (per_doc -> s -> t -> w -> ee -> cp -> em -> ef) restated over
    ``documents`` joined to ``survivor_cte`` (a CTE of surviving
    doc_ids). ONE definition shared by every curation-chain oracle (p06,
    p07) so the restatements cannot drift from each other — the same
    no-drift move as text._SQL_PPL_SCORED / dedup._SQL_SPAN_ISLANDS.
    (sm13's own registered oracle keeps its per-source SELECT over the
    same arithmetic; it is the independently driver-verified origin the
    chains' ``em``/``ef`` totals are checked against.)"""
    return f"""per_doc AS (
  SELECT d.doc_id, d.source,
         len(string_split_regex(trim(d.text), '\\s+')) AS toks,
         CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || 'sm13'), 1, 7)
              AS BIGINT) % 10000 AS hv
  FROM documents d JOIN {survivor_cte} ON {survivor_cte}.doc_id = d.doc_id
),
s AS (
  SELECT source, CAST(SUM(toks) AS BIGINT) AS source_tokens
  FROM per_doc GROUP BY source
),
t AS (SELECT CAST(SUM(source_tokens) AS BIGINT) AS total FROM s),
w AS (
  SELECT source, source_tokens,
         CAST(floor(sqrt(CAST(source_tokens AS DOUBLE) / total) * 1e9) AS BIGINT) AS sw
  FROM s, t
),
ee AS (
  SELECT source, source_tokens,
         CAST(floor({SM13_BUDGET_X}.0 * (SELECT total FROM t)
                    * (CAST(sw AS DOUBLE) / (SELECT CAST(SUM(sw) AS BIGINT) FROM w))
                    / CAST(source_tokens AS DOUBLE) * 10000) AS BIGINT) AS desired
  FROM w
),
cp AS (
  SELECT source, source_tokens,
         least(desired, {SM13_MAX_EPOCH_BP}) AS capped
  FROM ee
),
em AS (
  SELECT CAST(SUM(c.capped // 10000
                  + CASE WHEN d.hv < c.capped % 10000 THEN 1 ELSE 0 END)
              AS BIGINT) AS emitted
  FROM cp c JOIN per_doc d ON d.source = c.source
),
ef AS (
  SELECT CAST(SUM(source_tokens * capped // 10000) AS BIGINT) AS eff FROM cp
)"""


def sm13_per_doc(docs: DataFrame) -> DataFrame:
    """(source, toks, hv) projection the allocation runs on — shared with
    p06's constrained chain so the two cannot drift."""
    from european_public_data_pipeline_spark.operators.dedup import base_hash28

    return docs.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("toks"),
        (
            base_hash28(F.concat(F.col("doc_id").cast("string"), F.lit("sm13")))
            % 10000
        ).alias("hv"),
    )


def repetition_allocation(per_doc_in: DataFrame) -> DataFrame:
    """sm13's repetition-capped allocation over any (source, toks, hv)
    relation (full corpus for sm13, curation survivors for p06)."""
    per_doc = per_doc_in.cache()  # feeds the per-source aggregate AND the emission count
    s = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("toks").alias("source_tokens"),
    )
    t = s.agg(F.sum("source_tokens").alias("total"))
    sw = F.floor(
        F.sqrt(F.col("source_tokens").cast("double") / F.col("total")) * 1e9
    ).cast("long")
    w = s.crossJoin(F.broadcast(t)).select(
        "source", "n_docs", "source_tokens", "total", sw.alias("sw")
    )
    sum_w = w.agg(F.sum("sw").alias("sum_w"))
    desired = F.floor(
        F.lit(float(SM13_BUDGET_X))
        * F.col("total").cast("double")
        * (F.col("sw").cast("double") / F.col("sum_w").cast("double"))
        / F.col("source_tokens").cast("double")
        * 10000
    ).cast("long")
    capped = (
        w.crossJoin(F.broadcast(sum_w))
        .select(
            "source", "n_docs", "source_tokens",
            desired.alias("desired_epochs_bp"),
        )
        .select(
            "source", "n_docs", "source_tokens", "desired_epochs_bp",
            F.least(
                F.col("desired_epochs_bp"), F.lit(SM13_MAX_EPOCH_BP)
            ).alias("capped_epochs_bp"),
            (F.col("desired_epochs_bp") > SM13_MAX_EPOCH_BP).alias("was_capped"),
        )
    )
    return (
        per_doc.join(F.broadcast(capped), "source")
        .groupBy(
            "source", "n_docs", "source_tokens", "desired_epochs_bp",
            "capped_epochs_bp", "was_capped",
        )
        .agg(
            F.sum(
                F.expr("capped_epochs_bp div 10000")
                + F.when(
                    F.col("hv") < F.col("capped_epochs_bp") % 10000, 1
                ).otherwise(0)
            ).alias("n_emitted")
        )
        .select(
            "source", "n_docs", "source_tokens", "desired_epochs_bp",
            "capped_epochs_bp", "was_capped",
            F.expr(
                "CAST(source_tokens * capped_epochs_bp div 10000 AS BIGINT)"
            ).alias("effective_tokens"),
            "n_emitted",
        )
        .orderBy("source")
    )
