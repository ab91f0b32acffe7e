"""Sketch-aggregate error-bound tests for q25 (no SQL oracle by design —
HLL/quantile sketch estimates are implementation-specific; what IS
contract-testable is the documented error bound vs the exact answer)."""

from __future__ import annotations

from european_public_data_pipeline_spark import plans


def test_approx_distinct_within_rsd(spark, sf_medium):
    rows = plans.all_specs()["q25_approx_distinct"].builder(spark, sf_medium).collect()
    assert len(rows) > 0
    for r in rows:
        exact = r["exact_orders"]
        approx = r["approx_orders"]
        # rsd=0.02 → generous 5x slack still catches a broken sketch
        assert abs(approx - exact) <= max(10, 0.10 * exact), r


def test_approx_median_is_plausible(spark, sf_medium):
    rows = plans.all_specs()["q25_approx_distinct"].builder(spark, sf_medium).collect()
    for r in rows:
        # synthetic prices span well-known bounds; the approximate median
        # must land strictly inside them
        assert 900 < r["approx_median_price"] < 105000, r
