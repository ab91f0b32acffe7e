"""Argmax aggregates and the raw-SQL surface (SURVEY.md §2.6 O3-O4, §2.1
S14).

- q32 ``max_by``/``min_by``: the reference's latest-blob argmax
  (/root/reference/src/storage/blob.py:55-60) and first-row extraction
  (load_hicp_to_sql.py:81-83) as single-pass aggregates — no sort, no
  window, map-side combinable.
- q33 raw SQL text over registered views: the engine's ``spark.sql`` path
  (db/sql.py:43-48's execute_sql as a first-class query API) — proves SQL
  and DataFrame plans hit the same Catalyst surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.tables import load_table


@register(
    "q32_argmax_per_group",
    category="aggregation",
    doc="max_by/min_by argmax aggregates: per market segment, the customer "
    "holding the max/min balance plus first/last keys — one aggregation "
    "pass, no window, no sort (O3/O4 distributed). Balances are unique "
    "per segment in the synthetic data, so argmax is deterministic.",
    oracle="""
SELECT c_mktsegment,
       arg_max(c_name, c_acctbal) AS richest_customer,
       CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal,
       arg_min(c_name, c_acctbal) AS poorest_customer,
       CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
       MIN(c_custkey) AS first_key,
       MAX(c_custkey) AS last_key
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q32_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.max_by("c_name", "c_acctbal").alias("richest_customer"),
            F.max("c_acctbal").cast("double").alias("max_bal"),
            F.min_by("c_name", "c_acctbal").alias("poorest_customer"),
            F.min("c_acctbal").cast("double").alias("min_bal"),
            F.min("c_custkey").alias("first_key"),
            F.max("c_custkey").alias("last_key"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q33_sql_text_surface",
    category="sql",
    doc="Raw SQL text through spark.sql over registered views (S14): the "
    "same ANSI query the oracle runs, executed by Catalyst — SQL and "
    "DataFrame code share one catalog, one optimizer, one result.",
    oracle="""
SELECT n.n_name,
       COUNT(DISTINCT s.s_suppkey) AS n_suppliers,
       CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
HAVING COUNT(DISTINCT s.s_suppkey) > 1
ORDER BY n.n_name
""",
)
def q33_sql_text_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("supplier", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n.n_name,
               COUNT(DISTINCT s.s_suppkey) AS n_suppliers,
               CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        HAVING COUNT(DISTINCT s.s_suppkey) > 1
        ORDER BY n.n_name
        """
    )


_Q84_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE o.o_orderpriority = '1-URGENT' AND l.l_quantity > 49
),
reach(nation, hops) AS (
  SELECT 0, 0
  UNION ALL
  SELECT e.dst, r.hops + 1
  FROM reach r JOIN edges e ON e.src = r.nation
  WHERE r.hops < 3
)
SELECT CAST(nation AS BIGINT) AS nation, CAST(MIN(hops) AS BIGINT) AS min_hops
FROM reach GROUP BY nation ORDER BY nation
"""


@register(
    "q84_recursive_reachability",
    category="sql",
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): BFS hop distance from "
    "nation 0 over the observed trade graph (customer nation -> supplier "
    "nation on urgent near-full-quantity lines), depth-capped at 3 — the "
    "iterative-join SQL surface (org charts, BOM explosions, lineage "
    "walks) that previously needed driver-side loops. Scale shape: the "
    "fact joins + DISTINCT collapse the edge relation to <= |nations|^2 "
    "rows ONCE; every recursion step then joins the frontier against "
    "that tiny relation, so iteration cost is graph-sized, not "
    "fact-sized. The oracle runs the IDENTICAL recursive SQL in DuckDB.",
    oracle=_Q84_SQL,
)
def q84_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "supplier", "orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q84_SQL)
