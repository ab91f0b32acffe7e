"""Unit tests for the iterative connected-components operator.

The d08 oracle-parity test exercises real near-dup clusters (diameter ~2);
these synthetic graphs force the label-propagation loop through many
rounds (a long chain) and check isolated vertices and multi-component
separation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from european_public_data_pipeline_spark.operators.dedup import connected_components


def _components(spark, n_vertices, edge_list):
    vertices = spark.range(n_vertices).select(F.col("id"))
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    out = connected_components(vertices, edges)
    return {r["id"]: r["component"] for r in out.collect()}


def test_long_chain_converges(spark):
    # 0-1-2-...-10 is one component; 11 is isolated. The chain needs ~10
    # propagation rounds — well past what clique-like dedup graphs exercise.
    got = _components(spark, 12, [(i, i + 1) for i in range(10)])
    assert all(got[i] == 0 for i in range(11))
    assert got[11] == 11


def test_two_components_and_direction_independence(spark):
    # Edges given in arbitrary direction; components must not leak labels.
    got = _components(spark, 7, [(1, 0), (1, 2), (5, 4), (6, 5)])
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == 3
    assert got[4] == got[5] == got[6] == 4
