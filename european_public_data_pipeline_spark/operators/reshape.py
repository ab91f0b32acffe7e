"""Reshape + temporal-join operators: rollup, unpivot/melt, as-of join
(SURVEY.md §2.3, §2.12).

- q29 ROLLUP: hierarchical subtotals in one pass (complements q12's CUBE).
- q30 unpivot/melt: the INVERSE of the JSON-stat unpivot (R1,
  /root/reference/src/ingestion/process_hicp_silver.py:65-118) — wide
  measure columns to tidy (key, measure, value) rows via ``df.unpivot``,
  Spark's native Expand, no shuffle.
- q31 as-of join: each 'view' event joined to the user's most recent
  'purchase' at-or-before it. Spark has no ASOF JOIN operator; the
  scalable construction is union + last(ignorenulls) over an ordered
  window — ONE shuffle on the partition key, linear in events, no range
  join explosion. The oracle runs the identical window construction in
  SQL, so parity checks the algorithm, not just the answer.

Scale notes: the as-of union trick is THE way to do time-travel joins on
big event streams — a naive range join is O(n*m) per user; this is
O((n+m) log) via one sort within user partitions, and it vectorizes.
Skewed users (bots) would be handled by salting the user key with a
time-bucket prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.functions.exact import dsum
from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.tables import load_table


@register(
    "q29_rollup_revenue",
    category="aggregation",
    doc="ROLLUP (priority -> status hierarchy): grand total, per-priority, "
    "and per-(priority,status) subtotals in one aggregation pass.",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
""",
)
def q29_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(dsum("o_totalprice").alias("revenue"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.asc_nulls_first("o_orderpriority"), F.asc_nulls_first("o_orderstatus")
        )
    )


@register(
    "q30_unpivot_measures",
    category="reshape",
    doc="Unpivot/melt (inverse of the JSON-stat hypercube unpivot R1): "
    "wide per-flag quantity/price measures to tidy (flag, measure, value) "
    "rows via Spark's native unpivot (Expand — no shuffle, no UDF).",
    oracle="""
WITH wide AS (
  SELECT l_returnflag,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_tax
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, measure, value FROM (
  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_price', sum_price FROM wide
  UNION ALL
  SELECT l_returnflag, 'sum_tax', sum_tax FROM wide
)
ORDER BY l_returnflag, measure
""",
)
def q30_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_tax").alias("sum_tax"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price", "sum_tax"],
            variableColumnName="measure",
            valueColumnName="value",
        )
        .orderBy("l_returnflag", "measure")
    )


@register(
    "q31_asof_join",
    category="join",
    bench=True,
    doc="As-of join (temporal): every 'view' event gets the user's most "
    "recent 'purchase' value at-or-before it. Union + last(ignorenulls) "
    "over an ordered user window — one shuffle, linear, no range-join "
    "explosion; purchases sort before views at equal timestamps.",
    oracle="""
WITH tagged AS (
  -- CAST(ts AS TIMESTAMP): µs-truncate to match Spark's read of the
  -- TIMESTAMP(NANOS) parquet column, so as-of ordering ties break the same way.
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS src,
         CASE WHEN event_type = 'purchase' THEN value END AS purchase_value,
         event_type
  FROM events
  WHERE event_type IN ('purchase', 'view')
),
joined AS (
  SELECT user_id, ts, event_id, event_type,
         LAST_VALUE(purchase_value IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, src, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS asof_purchase_value
  FROM tagged
)
SELECT event_id, user_id, ts, asof_purchase_value
FROM joined
WHERE event_type = 'view'
ORDER BY event_id
""",
)
def q31_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    tagged = events.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "purchase", 0).otherwise(1).alias("src"),
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("purchase_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "src", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "asof_purchase_value",
            F.last("purchase_value", ignorenulls=True).over(w),
        )
        .filter(F.col("event_type") == "view")
        .select("event_id", "user_id", "ts", "asof_purchase_value")
        .orderBy("event_id")
    )
