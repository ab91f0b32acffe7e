"""Similarity search over the ``embeddings`` table (SURVEY.md §2.12).

Approximate-nearest-neighbor surface for an ``array<float>`` column:

- s01: brute-force cosine top-k — the exact baseline every ANN variant is
  measured against.
- s02: random-hyperplane LSH bucketing — the scale path. Hyperplane
  components are deterministic constants derived from md5 (generated once,
  embedded as literals), so bucket assignment is bit-reproducible across
  engines and runs with no RNG/seed machinery.
- s03: kNN label vote — the downstream-consumer shape (classification from
  neighbor labels).

Determinism contract: every dot product is a sequential left-fold in double
precision with the same operand shapes in Spark (``aggregate``/``zip_with``)
and DuckDB (``list_reduce``/``list_transform``) — bit-identical cosines, so
hash comparison works at full float precision.

Scale notes (100 TB):
- Brute-force is O(|queries| x |corpus|): fine for reranking small candidate
  sets, never for the full corpus. The plan broadcasts the (small) query set
  so the corpus is scanned once, partition-parallel, no shuffle before the
  per-query top-k aggregation.
- LSH bucketing turns the quadratic pair space into per-bucket blocks: one
  narrow projection to compute the 4-bit bucket, one shuffle keyed on the
  bucket, quadratic only within buckets (expected n/16 per bucket). More
  planes / multi-probe trades recall for cost without changing plan shape.
- Top-k per query uses min_by-style aggregation, not a global sort.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.tables import load_table

DIM = 64
N_PLANES = 4
N_QUERIES = 10  # queries = vec_id < N_QUERIES
TOP_K = 5
KNN_K = 10


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    First 8 bytes of md5("plane:<p>:<d>") as a uint64, scaled — a public
    construction (hash-derived quasi-random projections), reproducible
    everywhere with no RNG.
    """
    digest = hashlib.md5(f"plane:{plane}:{dim}".encode()).digest()
    (val,) = struct.unpack(">Q", digest[:8])
    return round(val / 2**63 - 1.0, 6)


PLANES = [[_plane_component(p, d) for d in range(DIM)] for p in range(N_PLANES)]


def dvec(col: str = "embedding") -> F.Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def fold_sum(arr: F.Column) -> F.Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def norm(col: str = "embedding") -> F.Column:
    return F.sqrt(fold_sum(F.transform(dvec(col), lambda x: x * x)))


def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
    )


def _sql_plane_dot(emb: str, plane: list[float]) -> str:
    lits = "[" + ", ".join(f"{c!r}" for c in plane) + "]"
    return (
        f"list_reduce(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST({emb}[i] AS DOUBLE) * ({lits}::DOUBLE[])[i]), (x, y) -> x + y)"
    )


def _sql_bucket(emb: str) -> str:
    terms = " + ".join(
        f"(CASE WHEN {_sql_plane_dot(emb, PLANES[p])} > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return f"({terms})"


def bucket_expr(vec: F.Column) -> F.Column:
    """4-bit LSH bucket: sign bits of the hyperplane projections."""
    out = None
    for p in range(N_PLANES):
        plane = F.array(*[F.lit(c) for c in PLANES[p]])
        proj = fold_sum(F.zip_with(vec, plane, lambda x, y: x * y))
        term = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
        out = term if out is None else out + term
    return out


@register(
    "s01_cosine_topk",
    category="similarity",
    bench=True,
    doc="Brute-force cosine top-5 neighbors for each query vector "
    "(vec_id < 10, self excluded) — the exact ANN baseline. Query set is "
    "broadcast; corpus scanned once; rank via per-query window with "
    "deterministic tie-break.",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding, sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
)
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
""",
)
def s01_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", dvec().alias("vec"), norm().alias("nrm"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    dot = fold_sum(F.zip_with(F.col("qvec"), F.col("cvec"), lambda x, y: x * y))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot / (F.col("qnrm") * F.col("cnrm"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


@register(
    "s02_lsh_bucket_pairs",
    category="similarity",
    bench=True,
    doc="LSH-bucketed similar-pair search: 4 deterministic random-hyperplane "
    "sign bits -> 16 buckets; cosine computed only within buckets "
    "(expected n/16 block size), pairs kept at cosine >= 0.35. The "
    "quadratic pair space shrinks 16x; recall is approximate by design "
    "and the oracle runs the identical algorithm.",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_sql_dot('embedding', 'embedding')}) AS nrm,
         {_sql_bucket('embedding')} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS v1, b.vec_id AS v2, a.bucket,
       {_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS cosine
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_sql_dot('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= 0.35
ORDER BY v1, v2
""",
)
def s02_lsh_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        dvec().alias("vec"),
        norm().alias("nrm"),
        bucket_expr(dvec()).alias("bucket"),
    )
    a = e.select(
        F.col("vec_id").alias("v1"), F.col("vec").alias("vec_a"),
        F.col("nrm").alias("nrm_a"), "bucket",
    )
    b = e.select(
        F.col("vec_id").alias("v2"), F.col("vec").alias("vec_b"),
        F.col("nrm").alias("nrm_b"), "bucket",
    )
    dot = fold_sum(F.zip_with(F.col("vec_a"), F.col("vec_b"), lambda x, y: x * y))
    return (
        a.join(b, "bucket")
        .filter(F.col("v1") < F.col("v2"))
        .select("v1", "v2", "bucket", (dot / (F.col("nrm_a") * F.col("nrm_b"))).alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
        .orderBy("v1", "v2")
    )


@register(
    "s03_knn_label_vote",
    category="similarity",
    doc="kNN classification: majority label among the 10 nearest neighbors "
    "of each query vector (cosine, deterministic tie-breaks on vote count "
    "then label) — the downstream-consumer shape for a similarity index.",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, embedding, sqrt({_sql_dot('embedding', 'embedding')}) AS nrm
  FROM embeddings
),
topk AS (
  SELECT query_id, n_label FROM (
    SELECT q.vec_id AS query_id, c.label AS n_label,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_sql_dot('q.embedding', 'c.embedding')} / (q.nrm * c.nrm) DESC, c.vec_id
           ) AS rank
    FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id != q.vec_id
  ) WHERE rank <= {KNN_K}
),
votes AS (
  SELECT query_id, n_label, COUNT(*) AS votes FROM topk GROUP BY 1, 2
)
SELECT query_id, n_label AS predicted_label, votes FROM (
  SELECT query_id, n_label, votes,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, n_label) AS rn
  FROM votes
) WHERE rn = 1
ORDER BY query_id
""",
)
def s03_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "label", dvec().alias("vec"), norm().alias("nrm"))
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vec").alias("qvec"),
        F.col("nrm").alias("qnrm"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("n_label"),
        F.col("vec").alias("cvec"),
        F.col("nrm").alias("cnrm"),
    )
    dot = fold_sum(F.zip_with(F.col("qvec"), F.col("cvec"), lambda x, y: x * y))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    topk = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id", "n_label",
            (dot / (F.col("qnrm") * F.col("cnrm"))).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KNN_K)
    )
    votes = topk.groupBy("query_id", "n_label").agg(F.count(F.lit(1)).alias("votes"))
    wv = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("n_label"))
    return (
        votes.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("n_label").alias("predicted_label"), "votes")
        .orderBy("query_id")
    )
