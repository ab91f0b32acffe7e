"""End-to-end pipeline integration test: bronze -> silver -> quality ->
gold against the deterministic HICP fixture, with a failure case proving
the gate blocks the warehouse load (the reference's core operational
contract, README.md:137)."""

from __future__ import annotations

import json

import pytest

from european_public_data_pipeline_spark.pipeline.hicp_queries import (
    GEOS,
    N_MONTHS,
    hicp_fixture_payload,
)
from european_public_data_pipeline_spark.pipeline.run_hicp import run_pipeline
from european_public_data_pipeline_spark.quality.checks import QualityGateError


def fixture_transport(url, timeout):
    # Serve the per-geo slice of the fixture cube, like the real API would
    # for a geo-filtered request.
    payload = hicp_fixture_payload()["data"]
    for geo in list(payload["dimension"]["geo"]["category"]["index"]):
        if f"geo={geo}" in url:
            gpos = payload["dimension"]["geo"]["category"]["index"][geo]
            sliced = {
                "id": payload["id"],
                "size": payload["size"][:3] + [1] + payload["size"][4:],
                "dimension": {
                    **payload["dimension"],
                    "geo": {"category": {"index": {geo: 0}}},
                },
                "value": {
                    str(int(k) - gpos * N_MONTHS): v
                    for k, v in payload["value"].items()
                    if gpos * N_MONTHS <= int(k) < (gpos + 1) * N_MONTHS
                },
            }
            return 200, json.dumps(sliced).encode()
    return 404, b"unknown geo"


def test_pipeline_end_to_end(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS gold_hicp_e2e")
    series = [{"geo": g, "coicop": "CP00", "unit": "I15"} for g in GEOS]
    result = run_pipeline(
        spark,
        root=str(tmp_path),
        dataset="prc_hicp_midx",
        series=series,
        gold_table="gold_hicp_e2e",
        transport=fixture_transport,
        gold_location=str(tmp_path / "gold"),
    )
    try:
        n_expected = len(GEOS) * N_MONTHS
        assert len(result.bronze_paths) == len(GEOS)
        assert result.silver_rows == n_expected
        assert result.gold_rows == n_expected
        assert all(r["passed"] for r in result.checks.collect())

        # Warehouse is queryable and idempotent: re-running the pipeline
        # must not duplicate rows (dynamic partition overwrite, W1).
        run_pipeline(
            spark,
            root=str(tmp_path),
            dataset="prc_hicp_midx",
            series=series,
            gold_table="gold_hicp_e2e",
            transport=fixture_transport,
            gold_location=str(tmp_path / "gold"),
        )
        n = spark.sql("SELECT COUNT(*) AS n FROM gold_hicp_e2e").first()["n"]
        assert n == n_expected

        # The one sparse cell (FR, last month) survived as NULL end to end.
        nulls = spark.sql(
            "SELECT COUNT(*) AS n FROM gold_hicp_e2e WHERE value IS NULL"
        ).first()["n"]
        assert nulls == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS gold_hicp_e2e")


def test_pipeline_gate_blocks_bad_data(spark, tmp_path):
    def corrupt_transport(url, timeout):
        status, body = fixture_transport(url, timeout)
        payload = json.loads(body)
        # negative value => positive:value check must fail
        first_key = next(iter(payload["value"]))
        payload["value"][first_key] = -1.0
        return status, json.dumps(payload).encode()

    spark.sql("DROP TABLE IF EXISTS gold_hicp_blocked")
    with pytest.raises(QualityGateError, match="positive:value"):
        run_pipeline(
            spark,
            root=str(tmp_path),
            dataset="prc_hicp_midx",
            series=[{"geo": "LU", "coicop": "CP00", "unit": "I15"}],
            gold_table="gold_hicp_blocked",
            transport=corrupt_transport,
            gold_location=str(tmp_path / "gold_blocked"),
        )
    assert not spark.catalog.tableExists("gold_hicp_blocked") or (
        spark.sql("SELECT COUNT(*) AS n FROM gold_hicp_blocked").first()["n"] == 0
    )
    spark.sql("DROP TABLE IF EXISTS gold_hicp_blocked")
