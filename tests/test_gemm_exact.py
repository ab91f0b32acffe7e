"""The GEMM kernel's in-kernel cosine must be bit-identical to the JVM
``dot_fold`` expression (and therefore to the oracle's ``list_reduce``):
``gemm_cosine_pairs`` emits the exact sequential left-fold computed in
Python on the raw vectors, which is the determinism contract the r13
rescore joins used to enforce. A single ULP of drift breaks the
cross-engine hash comparison, so this is pinned at full precision."""

from __future__ import annotations

from pyspark.sql import functions as F

from european_public_data_pipeline_spark.operators.similarity import (
    bucket_expr,
    dot_fold,
    gemm_cosine_pairs,
    norm,
)
from european_public_data_pipeline_spark.tables import load_table


def _jvm_rescore(spark, e, pairs):
    """The r13 rescore: dot_fold / (nrm_a * nrm_b) evaluated in the JVM."""
    ea = e.select(
        F.col("vec_id").alias("v1"),
        F.col("embedding").alias("emb_a"),
        norm().alias("nrm_a"),
    )
    eb = e.select(
        F.col("vec_id").alias("v2"),
        F.col("embedding").alias("emb_b"),
        norm().alias("nrm_b"),
    )
    return (
        F.broadcast(pairs)
        .join(ea, "v1")
        .join(eb, "v2")
        .select(
            "v1",
            "v2",
            (
                dot_fold(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b"))
            ).alias("cosine"),
        )
    )


def test_kernel_cosine_bit_identical_to_jvm_fold(spark, sf_medium):
    emb = load_table(spark, sf_medium, "embeddings")
    e = emb.select("vec_id", "embedding")
    kernel = gemm_cosine_pairs(e, 0.35).collect()
    assert len(kernel) > 0
    jvm = {
        (r["v1"], r["v2"]): r["cosine"]
        for r in _jvm_rescore(
            spark,
            emb.select("vec_id", "embedding"),
            spark.createDataFrame(
                [(r["v1"], r["v2"]) for r in kernel], "v1 long, v2 long"
            ),
        ).collect()
    }
    for r in kernel:
        # Bit identity, not approx: struct.pack-level equality of doubles.
        assert jvm[(r["v1"], r["v2"])] == r["cosine"], (
            r["v1"],
            r["v2"],
            jvm[(r["v1"], r["v2"])].hex(),
            r["cosine"].hex(),
        )


def test_grouped_kernel_rides_group_and_matches(spark, sf_medium):
    emb = load_table(spark, sf_medium, "embeddings")
    e = emb.select(
        "vec_id", "embedding", bucket_expr(F.col("embedding")).alias("bucket")
    )
    out = gemm_cosine_pairs(e, 0.35, group_col="bucket", group_dtype="int")
    rows = out.collect()
    assert len(rows) > 0
    # The ridden group value is the pair's shared LSH bucket.
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in e.select("vec_id", "bucket").collect()
    }
    for r in rows:
        assert r["g"] == buckets[r["v1"]] == buckets[r["v2"]]
