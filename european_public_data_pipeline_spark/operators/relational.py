"""Relational query catalog (SURVEY.md §2.2, §2.4-2.6, §2.9, §2.10, §2.12).

The reference pipeline's dataflow ops (projection, predicates, counts,
min/max, duplicate keys, gap detection — /root/reference/src/quality/
check_hicp_quality.py:52-119) generalized to the full relational surface a
Spark engine provides: scans with pushdown, broadcast/shuffle joins,
semi/anti joins, grouped and windowed aggregation, set ops, cube/pivot,
exact quantiles, top-k.

Scale notes (100 TB):
- Dimension joins (region/nation/customer/supplier/part) are explicitly
  ``F.broadcast`` — no shuffle of the fact table; at real scale AQE would
  pick this up too, the hint makes it deterministic.
- Fact-side aggregations are partial (map-side combine) by construction —
  ``groupBy().agg()`` on associative aggregates.
- All money arithmetic goes through exact decimals (functions.exact) so
  results are identical regardless of partition order — a correctness
  property, and a prerequisite for hash-comparison against any oracle.
- Windows partition by a key before ordering — no global sorts except final
  presentation ``orderBy`` on already-small aggregate outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.functions.exact import davg, dec, dsum, dsum_expr
from european_public_data_pipeline_spark.functions.timeparse import (
    month_start,
    parse_time_code,
    time_code,
)
from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.tables import load_table


# --------------------------------------------------------------------------
# Aggregation over a filtered scan (reference ops P1-P4, A1-A4 generalized)
# --------------------------------------------------------------------------

@register(
    "q01_pricing_summary",
    category="aggregation",
    bench=True,
    doc="TPC-H Q1 shape: filtered scan + grouped 8-way aggregate "
    "(generalizes check_hicp_quality.py:103-117 summary stats).",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # scatter: the serialized scan+partial-decimal-agg first stage is the
    # whole query; parallelizing it measured 0.57x (OPTIMIZATION_r13.md).
    li = load_table(spark, sf_dir, "lineitem", scatter=True)
    disc_factor = F.lit(1) - dec("l_discount", 4, 2)
    tax_factor = F.lit(1) + dec("l_tax", 4, 2)
    return (
        li.filter(F.col("l_shipdate") <= F.to_date(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(dec("l_extendedprice") * disc_factor).alias("sum_disc_price"),
            dsum_expr(dec("l_extendedprice") * disc_factor * tax_factor).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q02_filter_project",
    category="scan-filter-project",
    doc="Pushdown-friendly filter + projection (P1-P4): discount band scan. "
    "Predicate and column pruning reach the parquet reader.",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07) & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount")


@register(
    "q03_revenue_forecast",
    category="aggregation",
    bench=True,
    doc="TPC-H Q6 shape: tight filter + single exact-decimal global aggregate.",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def q03_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_date(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_date(F.lit("1997-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum_expr(dec("l_extendedprice") * dec("l_discount", 4, 2)).alias("revenue"))
    )


# --------------------------------------------------------------------------
# Joins (SURVEY.md §2.4 — absent in the reference, declared surface)
# --------------------------------------------------------------------------

@register(
    "q04_top_revenue_orders",
    category="join",
    bench=True,
    doc="Fact-fact equi-join (lineitem ⋈ orders) + broadcast dim (customer), "
    "grouped revenue, deterministic top-20.",
    oracle="""
SELECT o.o_orderkey, c.c_name, c.c_mktsegment,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_orderkey, c.c_name, c.c_mktsegment
ORDER BY revenue DESC, o_orderkey
LIMIT 20
""",
)
def q04_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Aggregate-then-join rewrite: revenue per order is computable from
    # lineitem alone (one narrow bigint group key), the top-20 is taken on
    # that aggregate, and orders/customer attach to just 20 rows — instead
    # of shuffling every joined row under a wide (orderkey, name, segment)
    # key. Same result (one customer per order); at 100 TB this is the
    # difference between shuffling the fact table once on a long vs.
    # carrying dimension strings through the aggregation.
    # scatter lineitem: the per-order partial decimal aggregation is the
    # dominant stage and runs on the unsplittable single-row-group scan
    # otherwise (0.69x measured). orders/customer join 20 rows — no need.
    li = load_table(spark, sf_dir, "lineitem", scatter=True)
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    per_order = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            dsum_expr(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(20)
    )
    return (
        F.broadcast(per_order)
        .join(orders, "o_orderkey")
        # after the 20-row broadcast join the left side is tiny — AQE
        # broadcasts IT into customer; hinting customer would push the
        # linearly-growing side into every executor at scale
        .join(customer, orders.o_custkey == customer.c_custkey)
        .select("o_orderkey", "c_name", "c_mktsegment", "revenue")
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
    )


@register(
    "q05_region_customer_rollup",
    category="join",
    bench=True,
    doc="Star join with two broadcast dims (region ⋈ nation ⋈ customer): "
    "no fact shuffle for the joins, single agg shuffle.",
    oracle="""
SELECT r.r_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
ORDER BY r.r_name
""",
)
def q05_region_customer_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


@register(
    "q06_priority_exists_semi",
    category="join",
    doc="Left-semi join (EXISTS): orders having at least one high-discount "
    "line item, counted per priority — the quality gate's existence-check "
    "shape (load_hicp_to_sql.py:18-29) as a distributed semi join.",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q06_priority_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q07_segment_anti",
    category="join",
    doc="Left-anti join (NOT EXISTS): customers with no orders, per market segment.",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_customers_without_orders
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q07_segment_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# Window analytics (SURVEY.md §2.9 — MoM inflation / rolling averages are the
# HICP-relevant analytics; lag/row_number/frames)
# --------------------------------------------------------------------------

@register(
    "q08_monthly_revenue_mom",
    category="window",
    bench=True,
    doc="Month-over-month growth via lag window — the reference's core "
    "analytic (HICP MoM inflation = value/lag(value)-1) on order revenue.",
    oracle="""
SELECT month_start, o_orderpriority, revenue,
       revenue / LAG(revenue) OVER (PARTITION BY o_orderpriority ORDER BY month_start) - 1
         AS mom_growth
FROM (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders
  GROUP BY 1, 2
)
ORDER BY o_orderpriority, month_start
""",
)
def q08_monthly_revenue_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            month_start("o_orderdate").alias("month_start"),
            F.col("o_orderpriority"),
        )
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month_start")
    return (
        monthly.withColumn("mom_growth", F.col("revenue") / F.lag("revenue").over(w) - 1)
        .orderBy("o_orderpriority", "month_start")
    )


@register(
    "q09_rolling_3m_revenue",
    category="window",
    doc="Rolling 3-month window frame (rowsBetween): exact decimal sum over "
    "the frame, divided once — deterministic rolling average.",
    oracle="""
SELECT month_start, o_orderpriority,
       CAST(revenue_dec AS DOUBLE) AS revenue,
       CAST(SUM(revenue_dec) OVER w AS DOUBLE) / COUNT(revenue_dec) OVER w AS rolling_avg_3m
FROM (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         o_orderpriority,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue_dec
  FROM orders
  GROUP BY 1, 2
)
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month_start ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_orderpriority, month_start
""",
)
def q09_rolling_3m_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(
            month_start("o_orderdate").alias("month_start"),
            F.col("o_orderpriority"),
        )
        .agg(F.sum(dec("o_totalprice")).alias("revenue_dec"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("month_start")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        monthly.select(
            "month_start",
            "o_orderpriority",
            F.col("revenue_dec").cast("double").alias("revenue"),
            (
                F.sum("revenue_dec").over(w).cast("double")
                / F.count("revenue_dec").over(w)
            ).alias("rolling_avg_3m"),
        )
        .orderBy("o_orderpriority", "month_start")
    )


@register(
    "q10_top3_orders_per_customer",
    category="window",
    bench=True,
    doc="Top-k per group via row_number with deterministic tie-break — the "
    "distributed form of the reference's latest-blob argmax (blob.py:55-60).",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
""",
)
def q10_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# --------------------------------------------------------------------------
# Set operations (SURVEY.md §2.10)
# --------------------------------------------------------------------------

@register(
    "q11_nation_setops",
    category="setops",
    doc="INTERSECT / EXCEPT over derived nation sets (which nations have "
    "customers vs suppliers) — the gap check's EXCEPT semantics "
    "(check_hicp_quality.py:48-49) as real set operators.",
    oracle="""
WITH cust_nations AS (
  SELECT DISTINCT n.n_name FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
supp_nations AS (
  SELECT DISTINCT n.n_name FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT n_name, 'both' AS membership FROM (SELECT n_name FROM cust_nations INTERSECT SELECT n_name FROM supp_nations)
UNION ALL
SELECT n_name, 'customer_only' AS membership FROM (SELECT n_name FROM cust_nations EXCEPT SELECT n_name FROM supp_nations)
UNION ALL
SELECT n_name, 'supplier_only' AS membership FROM (SELECT n_name FROM supp_nations EXCEPT SELECT n_name FROM cust_nations)
ORDER BY membership, n_name
""",
)
def q11_nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cust_nations = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select("n_name")
        .distinct()
    )
    supp_nations = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .select("n_name")
        .distinct()
    )
    both = cust_nations.intersect(supp_nations).withColumn("membership", F.lit("both"))
    cust_only = cust_nations.subtract(supp_nations).withColumn(
        "membership", F.lit("customer_only")
    )
    supp_only = supp_nations.subtract(cust_nations).withColumn(
        "membership", F.lit("supplier_only")
    )
    return both.unionByName(cust_only).unionByName(supp_only).orderBy("membership", "n_name")


# --------------------------------------------------------------------------
# Multi-dimensional aggregation: cube / pivot / quantiles / moments
# --------------------------------------------------------------------------

@register(
    "q12_cube_qty",
    category="aggregation",
    doc="CUBE over (returnflag, linestatus): all grouping-set subtotals in "
    "one pass (generalizes the reference's flat summary block).",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def q12_cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@register(
    "q13_pivot_linestatus",
    category="aggregation",
    doc="Pivot linestatus into columns (wide summary table).",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS qty_f,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS qty_o
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q13_pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(dsum("l_quantity"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")
    )


@register(
    "q14_quantiles_by_flag",
    category="aggregation",
    doc="Exact percentiles per group (PERCENTILE_CONT semantics). Rounded to "
    "4dp: underlying values are 2dp so interpolated midpoints are ≥5e-5 from "
    "any rounding boundary — deterministic across engines.",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q14_quantiles_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("median_price"),
            F.round(F.percentile("l_quantity", F.lit(0.9)), 4).alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q15_moments_exact",
    category="aggregation",
    doc="Mean/variance/stddev from exact decimal power sums — deterministic "
    "moments at any scale (unlike streaming variance over doubles).",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_qty,
       (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
       / (COUNT(*) - 1) AS var_qty,
       SQRT(
         (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
          - CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
         / (COUNT(*) - 1)
       ) AS std_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q15_moments_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    n = F.count(F.lit(1))
    s1 = F.sum(q).cast("double")
    s2 = F.sum(q * q).cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            (s1 / n).alias("mean_qty"),
            var.alias("var_qty"),
            F.sqrt(var).alias("std_qty"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q16_distinct_counts",
    category="aggregation",
    doc="Exact distinct cardinalities per group (A8 generalized). At 100 TB "
    "approx_count_distinct (HLL) is the scale path; exact here for the oracle.",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_suppliers,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q16_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# Events: JSON functions, time windows, sessionization (F7, §2.11 batch side)
# --------------------------------------------------------------------------

@register(
    "q17_events_json_extract",
    category="json",
    doc="JSON path extraction (F7: the reference's json.loads envelope "
    "handling as a native column op) + aggregation.",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q17_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            (F.sum(k).cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q18_event_hourly_windows",
    category="time-window",
    bench=True,
    doc="Tumbling 1-hour event-time windows (batch form of the streaming "
    "surface; window() works identically under readStream).",
    oracle="""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def q18_event_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q19_sessionization",
    category="window",
    bench=True,
    doc="Sessionization: lag-gap > 30 min starts a new session; per-user "
    "session counts. Timestamp arithmetic on exact microseconds.",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(is_new_session) AS BIGINT) AS n_sessions
FROM (
  -- epoch_us of the µs-truncated ts: the raw parquet carries TIMESTAMP(NANOS)
  -- and Spark truncates ns -> µs on load, so the oracle must compare gaps at
  -- µs precision too (a ns-preserving reader would otherwise flip
  -- exactly-30-minute-plus-nanos gaps).
  SELECT user_id,
         CASE WHEN LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL
                OR us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
              THEN 1 ELSE 0 END AS is_new_session
  FROM (SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
)
GROUP BY user_id
ORDER BY user_id
""",
)
def q19_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    return (
        events.select("user_id", is_new.alias("is_new_session"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_new_session").alias("n_sessions"),
        )
        .orderBy("user_id")
    )


# --------------------------------------------------------------------------
# Reference scalar functions in anger (F1-F4) and gap detection (A6-A7)
# --------------------------------------------------------------------------

@register(
    "q20_time_code_roundtrip",
    category="scalar-functions",
    doc="Eurostat period-code handling (F1-F4): format orderdates as "
    "YYYYMmm codes, parse them back to month-start dates with the engine's "
    "parse_time_code — all Catalyst expressions, no Python.",
    oracle="""
SELECT strftime(o_orderdate, '%YM%m') AS period_code,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1, 2
ORDER BY month_start
""",
)
def q20_time_code_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    coded = orders.select(time_code("o_orderdate").alias("period_code"))
    return (
        coded.select(
            "period_code",
            parse_time_code("period_code").alias("month_start"),
        )
        .groupBy("period_code", "month_start")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("month_start")
    )


@register(
    "q21_orders_gap_profile",
    category="quality",
    doc="Per-series monthly continuity profile (A6-A7: the reference's gap "
    "check, check_hicp_quality.py:41-49, as distributed aggregates — "
    "months_present vs expected span, no per-group Python).",
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT date_trunc('month', o_orderdate)) AS months_present,
       (date_part('year', MAX(o_orderdate)) - date_part('year', MIN(o_orderdate))) * 12
         + (date_part('month', MAX(o_orderdate)) - date_part('month', MIN(o_orderdate))) + 1
         AS months_expected,
       (date_part('year', MAX(o_orderdate)) - date_part('year', MIN(o_orderdate))) * 12
         + (date_part('month', MAX(o_orderdate)) - date_part('month', MIN(o_orderdate))) + 1
         - COUNT(DISTINCT date_trunc('month', o_orderdate))
         AS n_gap_months
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q21_orders_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    expected = (
        (F.year(F.max("o_orderdate")) - F.year(F.min("o_orderdate"))) * 12
        + (F.month(F.max("o_orderdate")) - F.month(F.min("o_orderdate")))
        + 1
    ).cast("long")
    present = F.countDistinct(month_start("o_orderdate"))
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            present.alias("months_present"),
            expected.alias("months_expected"),
            (expected - present).alias("n_gap_months"),
        )
        .orderBy("o_orderpriority")
    )
