"""Rank-family window functions and map/JSON column functions
(SURVEY.md §2.9, §2.8 F7).

- q34: dense_rank / percent_rank / cume_dist / ntile / lead — the rest of
  the window-function family next to q08-q10's lag/row_number/frames. All
  partition-by-key windows: no global sort, state bounded per key.
- q35: JSON -> typed map -> element access / keys / explode — the
  reference's json.loads envelope handling (F7) as native column ops that
  never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from european_public_data_pipeline_spark.functions.exact import dsum
from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.tables import load_table


@register(
    "q34_rank_family",
    category="window",
    doc="Rank-family windows over monthly revenue per priority: dense_rank, "
    "percent_rank, cume_dist, ntile(4), lead — deterministic because the "
    "order key (month_start) is unique within each partition.",
    oracle="""
WITH monthly AS (
  SELECT o_orderpriority,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders
  GROUP BY 1, 2
)
SELECT o_orderpriority, month_start, revenue,
       DENSE_RANK() OVER w AS rnk,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       NTILE(4) OVER w AS quartile,
       LEAD(revenue) OVER (PARTITION BY o_orderpriority ORDER BY month_start) AS next_month_revenue
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY revenue DESC, month_start)
ORDER BY o_orderpriority, month_start
""",
)
def q34_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.trunc("o_orderdate", "MM").alias("month_start"),
    ).agg(dsum("o_totalprice").alias("revenue"))
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("revenue"), F.asc("month_start"))
    wt = Window.partitionBy("o_orderpriority").orderBy("month_start")
    return (
        monthly.select(
            "o_orderpriority",
            "month_start",
            "revenue",
            F.dense_rank().over(w).alias("rnk"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
            F.lead("revenue").over(wt).alias("next_month_revenue"),
        )
        .orderBy("o_orderpriority", "month_start")
    )


@register(
    "q35_json_map_functions",
    category="json",
    doc="JSON string -> typed MapType -> element access, map_keys, explode "
    "(F7 as JVM-native column functions): per-key stats of the event props "
    "map without any driver-side json.loads.",
    oracle="""
SELECT k AS prop_key,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS BIGINT) AS sum_val,
       MIN(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS min_val,
       MAX(CAST(json_extract_string(props, '$.' || k) AS BIGINT)) AS max_val
FROM (
  SELECT props, unnest(json_keys(props)) AS k FROM events
)
GROUP BY k
ORDER BY k
""",
)
def q35_json_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    props_map = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    exploded = events.select(
        F.explode(props_map).alias("prop_key", "val")
    )
    return (
        exploded.groupBy("prop_key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("prop_key")
    )
