"""Sketch-aggregate bounds tests for q25. The registered surface is a
bounds AUDIT (exact answer + in-bound booleans) so the driver's DuckDB
oracle can value-check it; these tests assert the booleans actually earn
their TRUEs and the exact column is sane."""

from __future__ import annotations

from european_public_data_pipeline_spark import plans


def test_q25_bounds_audit(spark, sf_medium):
    rows = plans.all_specs()["q25_approx_distinct"].builder(spark, sf_medium).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["exact_orders"] > 0
        assert r["hll_within_3rsd"] is True, r
        assert r["median_within_band"] is True, r


def test_q79_q80_q83_audits_earn_their_trues(spark, sf_medium):
    for name, bool_cols in [
        ("q79_cms_heavy_hitters", ["cms_never_undercounts", "cms_within_eps_n"]),
        ("q80_bloom_membership_audit", ["no_false_negatives", "fpr_within_bound"]),
        ("q83_sketch_mergeability", ["merge_identical"]),
    ]:
        rows = plans.all_specs()[name].builder(spark, sf_medium).collect()
        assert len(rows) > 0, name
        for r in rows:
            for c in bool_cols:
                assert r[c] is True, (name, c, r)


def test_cms_guarantee_on_adversarial_keys(spark):
    """CMS never undercounts, for ANY key set — including heavy skew and
    adjacent integers engineered to collide in low bits."""
    from pyspark.sql import functions as F

    from european_public_data_pipeline_spark.operators.sketches import (
        cms_cells,
        cms_estimate,
    )

    # 1 key with 10_000 rows, 500 keys with 7 rows, 1000 singleton keys
    rows = (
        spark.range(10_000).select(F.lit(0).alias("k"))
        .unionAll(
            spark.range(500 * 7).select((F.col("id") % 500 + 1).alias("k"))
        )
        .unionAll(spark.range(1000).select((F.col("id") + 100_000).alias("k")))
    )
    cells = cms_cells(rows, "k")
    exact = rows.groupBy("k").count()
    est = cms_estimate(cells, exact.select("k"), "k")
    joined = exact.join(est, "k").collect()
    assert len(joined) == 1501
    n_total = 10_000 + 3500 + 1000
    import math

    eps_n = math.e / 4096 * n_total
    for r in joined:
        assert r["cms_estimate"] >= r["count"], r
        assert r["cms_estimate"] <= r["count"] + eps_n + 1, r


def test_bloom_no_false_negatives_property(spark):
    """Every inserted key must probe positive — exact guarantee, any keys."""
    from pyspark.sql import functions as F

    from european_public_data_pipeline_spark.operators.sketches import (
        BLOOM_HASHES,
        bloom_bitset,
    )

    inserted = spark.range(5000).select((F.col("id") * 7919 + 13).alias("k"))
    bits = bloom_bitset(inserted, "k")
    from european_public_data_pipeline_spark.operators.sketches import BLOOM_BITS

    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(100 + i), F.col("k")), F.lit(BLOOM_BITS))
            for i in range(BLOOM_HASHES)
        ]
    )
    probed = inserted.select("k", F.explode(probes).alias("bit_pos"))
    hits = (
        probed.join(bits, "bit_pos", "left_semi")
        .groupBy("k")
        .count()
        .filter(F.col("count") == BLOOM_HASHES)
    )
    assert hits.count() == 5000
