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
