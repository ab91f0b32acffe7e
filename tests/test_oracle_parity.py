"""Differential test: every declared query vs its DuckDB oracle at sf0.01.

This is a local replica of the driver's correctness gate — run it before
every commit. A query without an oracle gets a weaker rows-and-schema smoke
check (non-empty, stable schema).
"""

from __future__ import annotations

import pytest

from european_public_data_pipeline_spark import plans
from tests.oracle_compare import compare, duckdb_connect

SPECS = plans.all_specs()


@pytest.fixture(scope="module")
def oracle_con(sf_medium):
    con = duckdb_connect(sf_medium)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_parity(name, spark, sf_medium, oracle_con):
    spec = SPECS[name]
    df = spec.builder(spark, sf_medium)
    if spec.oracle is None:
        rows = df.count()
        assert rows >= 0
        assert len(df.columns) > 0
        return
    result = compare(df, oracle_con, spec.oracle)
    assert result["rowcount_match"], f"{name}: rows spark={result['spark_rows']} oracle={result['oracle_rows']}"
    assert result["schema_match"], f"{name}: cols spark={result['spark_cols']} oracle={result['oracle_cols']}"
    assert result["values_match"], f"{name}: value mismatch, first diffs: {result.get('first_diffs')}"
