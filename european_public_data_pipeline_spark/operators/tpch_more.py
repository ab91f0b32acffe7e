"""Classic analytic join/aggregation shapes (SURVEY.md §2.4/§2.5/§2.9
depth): multi-hop star join, conditional aggregation, HAVING-on-aggregate
semi join, range-frame windows, correlated-average filters.

Scale notes: q36 is the canonical "co-located dimension chain" — both fact
sides reach the nation key through broadcast dims, so the only big shuffle
is the final aggregation; q38 filters a fact by an aggregate of another
fact (broadcast the small aggregate result, never re-join row-level);
q39's range frame is bounded by the frame width, not partition size; q40's
per-group average comparison uses one window pass instead of a correlated
re-scan per row.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.functions.exact import dec, dsum, dsum_expr
from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.tables import load_table


@register(
    "q36_local_supplier_volume",
    category="join",
    bench=True,
    doc="TPC-H Q5 shape: revenue from lineitems where the customer's and "
    "supplier's nation coincide, per nation within one region and year — "
    "a 6-table star with every dimension broadcast; the fact shuffles "
    "once, for the aggregation.",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate < DATE '1996-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""",
)
def q36_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_date(F.lit("1995-01-01")))
        & (F.col("o_orderdate") < F.to_date(F.lit("1996-01-01")))
    )
    # No scatter: the date-filtered orders side auto-broadcasts, so the
    # fact side is never shuffled for the join — a scatter exchange here
    # measured 1.13x (pure overhead, OPTIMIZATION_r13.md).
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum_expr(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q37_conditional_agg",
    category="aggregation",
    doc="TPC-H Q12 shape: CASE-based conditional aggregation — per ship "
    "year, how many lineitems belong to urgent/high vs other priority "
    "orders. One join, one pass, both counts from the same rows.",
    oracle="""
SELECT CAST(date_part('year', l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
ORDER BY ship_year
""",
)
def q37_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_year")
    )


@register(
    "q38_large_volume_customers",
    category="join",
    doc="TPC-H Q18 shape: orders whose total quantity exceeds a threshold "
    "(HAVING on an aggregate) joined back to customer detail — the "
    "aggregate-filter result is broadcast; the fact is never re-joined "
    "row-level.",
    oracle="""
WITH big AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 180
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 50
""",
)
def q38_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 180)
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
    )
    return (
        F.broadcast(big)
        .join(o, "o_orderkey")
        # left side is already the selective aggregate — AQE broadcasts it
        # into customer rather than shipping customer everywhere
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


@register(
    "q39_range_frame_trailing",
    category="window",
    doc="RANGE-frame window (value-based, not row-based): trailing 30-day "
    "revenue per order priority over daily aggregates — frame membership "
    "by day distance, so gaps in the calendar are handled correctly "
    "(rowsBetween would be wrong here).",
    oracle="""
WITH daily AS (
  SELECT o_orderpriority,
         date_diff('day', DATE '1990-01-01', o_orderdate) AS day_num,
         o_orderdate,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
  FROM orders
  GROUP BY 1, 2, 3
)
SELECT o_orderpriority, o_orderdate,
       CAST(rev_dec AS DOUBLE) AS day_revenue,
       CAST(SUM(rev_dec) OVER (
         PARTITION BY o_orderpriority ORDER BY day_num
         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS trailing_30d_revenue
FROM daily
ORDER BY o_orderpriority, o_orderdate
""",
)
def q39_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1990-01-01"))).alias("day_num"),
        "o_orderdate",
    ).agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day_num")
        .rangeBetween(-29, Window.currentRow)
    )
    return (
        daily.select(
            "o_orderpriority",
            "o_orderdate",
            F.col("rev_dec").cast("double").alias("day_revenue"),
            F.sum("rev_dec").over(w).cast("double").alias("trailing_30d_revenue"),
        )
        .orderBy("o_orderpriority", "o_orderdate")
    )


@register(
    "q41_promo_revenue_share",
    category="join",
    doc="TPC-H Q14 shape: share of revenue from promotional part types in "
    "one month — broadcast part dimension, CASE numerator and plain "
    "denominator from the same aggregation pass; one exact division at "
    "the end.",
    oracle="""
SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type IN ('PROMO', 'ECONOMY')
             THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
             ELSE 0 END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS promo_revenue_pct,
       COUNT(*) AS n_lineitems
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1996-03-01' AND l.l_shipdate < DATE '1996-04-01'
""",
)
def q41_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_date(F.lit("1996-03-01")))
        & (F.col("l_shipdate") < F.to_date(F.lit("1996-04-01")))
    )
    p = load_table(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
    promo = F.when(F.col("p_type").isin("PROMO", "ECONOMY"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "q40_below_average_parts",
    category="aggregation",
    doc="TPC-H Q17 shape: lineitems below 20% of their part's average "
    "quantity (correlated-average filter) — one window pass over the fact "
    "instead of a per-row correlated re-scan; result is the total "
    "foregone revenue.",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM (
  SELECT l_extendedprice,
         l_quantity,
         AVG(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem
)
WHERE l_quantity < 0.2 * avg_qty
""",
)
def q40_below_average_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey")
    return (
        l.select(
            "l_extendedprice",
            "l_quantity",
            F.avg("l_quantity").over(w).alias("avg_qty"),
        )
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "q42_grouping_sets",
    category="aggregation",
    doc="Explicit GROUPING SETS ((returnflag), (linestatus), ()) with a "
    "grouping-id disambiguator — the general form that q12's CUBE and "
    "q29's ROLLUP specialize. One pass over the fact; Spark expands the "
    "sets map-side so the shuffle stays one aggregation exchange. The id "
    "is built explicitly as 2*grouping(a)+grouping(b) so the bit layout "
    "is engine-independent.",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS gid
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def q42_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    gid = (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).cast("int")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            gid.alias("gid"),
        )
        .orderBy(
            "gid",
            F.asc_nulls_first("l_returnflag"),
            F.asc_nulls_first("l_linestatus"),
        )
    )


@register(
    "q49_nation_pair_volume",
    category="join",
    doc="TPC-H Q7-shaped trade-volume query: revenue between distinct "
    "(customer nation, supplier nation) pairs per ship year. Five-table "
    "join where only the two fact tables are large: nation joins stay "
    "broadcast (25 rows, bounded by the world), the lineitem-orders join "
    "is the one real shuffle, and the (nation, nation, year) rollup is "
    "tiny. Year extraction stays on the shipdate column so the scan range "
    "filter pushes down.",
    oracle="""
SELECT cn.n_name AS cust_nation,
       sn.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS ship_year,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS volume
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE cn.n_nationkey <> sn.n_nationkey
GROUP BY cn.n_name, sn.n_name, ship_year
ORDER BY cust_nation, supp_nation, ship_year
""",
)
def q49_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    volume = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nk"))
        .filter(F.col("c_nk") != F.col("s_nk"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum_expr(volume).alias("volume"),
        )
        .orderBy("cust_nation", "supp_nation", "ship_year")
    )


@register(
    "q57_min_cost_supplier",
    category="join",
    doc="TPC-H Q2 shape (correlated scalar subquery): for every part of "
    "one brand, the supplier offering the lowest observed unit price, with "
    "its nation. The oracle keeps the classic doubly-correlated subquery; "
    "the Spark plan rewrites it as one aggregation plus a per-part window "
    "rank — the standard decorrelation, and the only shape that scales "
    "(each correlated probe would be a full re-scan). Unit price is a "
    "single IEEE division and MIN is order-independent, so no decimal "
    "machinery is needed for parity.",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p.p_partkey, p.p_name, s.s_name, n.n_name AS nation, ps.unit_cost
FROM part p
JOIN ps ON ps.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = ps.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_brand = 'Brand#1'
  AND ps.unit_cost = (SELECT MIN(ps2.unit_cost) FROM ps ps2
                      WHERE ps2.l_partkey = p.p_partkey)
  AND ps.l_suppkey = (SELECT MIN(ps3.l_suppkey) FROM ps ps3
                      WHERE ps3.l_partkey = p.p_partkey
                        AND ps3.unit_cost = (SELECT MIN(ps4.unit_cost) FROM ps ps4
                                             WHERE ps4.l_partkey = p.p_partkey))
ORDER BY p_partkey
""",
)
def q57_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    # One shuffle on (part, supp) for the aggregate, one on part for the
    # rank; dims broadcast. No correlated re-scans.
    ps = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "l_suppkey")
    best = ps.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return (
        best.join(F.broadcast(p), best.l_partkey == p.p_partkey)
        .join(s, best.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            "unit_cost",
        )
        .orderBy("p_partkey")
    )


@register(
    "q58_customer_order_distribution",
    category="join",
    doc="TPC-H Q13 shape: distribution of per-customer order counts, "
    "INCLUDING zero-order customers, with the priority filter inside the "
    "left join's ON clause (filtering the right side before a left join is "
    "the equivalent, scalable form — never filter after, which silently "
    "turns the join inner). Two aggregations: per-customer (shuffles on "
    "custkey) then per-count (tiny domain).",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q58_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q59_every_quarter_customers",
    category="join",
    doc="Relational division (FORALL): customers who placed at least one "
    "order in EVERY quarter of 1995. The oracle keeps the textbook double "
    "NOT EXISTS; the Spark plan uses the scalable set-cover form — distinct "
    "(customer, quarter) pairs, then a per-customer distinct count equal to "
    "the divisor cardinality. One shuffle on custkey; the quarter domain is "
    "a constant.",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT * FROM (VALUES (1), (2), (3), (4)) q(qtr)
  WHERE NOT EXISTS (
    SELECT * FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND year(o.o_orderdate) = 1995
      AND quarter(o.o_orderdate) = q.qtr))
ORDER BY c_custkey
""",
)
def q59_every_quarter_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.year("o_orderdate") == 1995)
    full_cover = (
        o.select("o_custkey", F.quarter("o_orderdate").alias("qtr"))
        .distinct()
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_qtrs"))
        .filter(F.col("n_qtrs") == 4)
    )
    return (
        c.join(full_cover, c.c_custkey == full_cover.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q60_sole_late_supplier",
    category="join",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting), adapted to "
    "this schema's columns: a lineitem is LATE when it ships more than 90 "
    "days after its order date. For finished ('F') multi-supplier orders "
    "where EXACTLY ONE supplier shipped late, charge that supplier; count "
    "waiting incidents per supplier, top 100. The oracle keeps the "
    "textbook EXISTS / NOT EXISTS correlated form; the Spark plan is the "
    "scalable decorrelation — ONE orderkey-grouped aggregate computing "
    "(distinct suppliers, distinct late suppliers, the sole late supplier "
    "via min) per order, then a suppkey-grouped count. Two key shuffles "
    "total, no per-row re-scans; supplier is broadcast for the name.",
    oracle="""
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT * FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT * FROM lineitem l3
    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
)
def q60_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    # ONE pass over the order's lineitems: which suppliers shipped, which
    # shipped late, how many late rows. o_orderdate rides along via an
    # orderkey join (both sides shuffle on orderkey once). Because the
    # filter demands exactly one late supplier, every late row in a
    # qualifying order belongs to that supplier — so the charge count
    # comes out of the same aggregate and no second fact pass exists.
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)
    # Two-level form: collapsing to the (order, supplier) grain first
    # replaces COUNT DISTINCT's expand of the full fact shuffle with a
    # plain map-side-combinable aggregate; the per-order pass then runs
    # on the collapsed (near order-cardinality) relation.
    per_os = (
        li.join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(late).alias("any_late"),
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late"),
        )
    )
    per_order = (
        per_os.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(F.when(F.col("any_late"), 1).otherwise(0)).alias("n_late_supp"),
            F.min(F.when(F.col("any_late"), F.col("l_suppkey"))).alias("late_supp"),
            F.sum(F.when(F.col("any_late"), F.col("n_late")).otherwise(0)).alias(
                "n_late_rows"
            ),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.join(F.broadcast(s), per_order.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


@register(
    "q61_acquisition_prospects",
    category="join",
    doc="TPC-H Q22 shape (global sales opportunity): customers from a "
    "fixed nation set with above-average positive account balance who "
    "never placed an URGENT order — per-nation prospect count and "
    "balance total. (The textbook NO-orders predicate is degenerate on "
    "this synthetic data — every customer has orders — so the anti-join "
    "subset is priority-filtered; the decorrelation shape is "
    "unchanged.) The oracle keeps the scalar subquery + NOT EXISTS; the "
    "Spark plan broadcasts the 1-row global average onto the filtered "
    "customer scan and anti-joins the filtered orders, then aggregates "
    "on the tiny nation domain. The fact-side shuffle is the anti "
    "join's custkey exchange only.",
    oracle="""
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_nationkey IN (1, 5, 9, 13, 17, 21)
  AND c.c_acctbal > (
    SELECT AVG(CAST(c2.c_acctbal AS DECIMAL(18,2)))
    FROM customer c2
    WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey IN (1, 5, 9, 13, 17, 21))
  AND NOT EXISTS (
    SELECT * FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey
""",
)
def q61_acquisition_prospects(spark: SparkSession, sf_dir: str) -> DataFrame:
    nations = (1, 5, 9, 13, 17, 21)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(*nations))
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    # DuckDB's AVG(DECIMAL) divides exactly then casts once; mirror with an
    # exact decimal sum / count division (davg shape, inline for the
    # pre-filtered relation).
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal")
    )
    prospects = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(dec("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
    )
    return (
        prospects.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q63_top_supplier_with_ties",
    category="join",
    doc="TPC-H Q15 shape (top supplier, WITH ties): revenue per supplier "
    "over a ship-date window, then every supplier whose revenue equals "
    "the maximum. The textbook form is a view + correlated MAX; the "
    "scalable form aggregates once (suppkey shuffle), broadcasts the "
    "1-row maximum back onto the aggregate, and filters — the max never "
    "re-scans the fact, and ties survive (unlike a LIMIT 1). Exact "
    "decimal revenue makes the equality comparison well-defined — "
    "float revenue would make 'equals the max' nondeterministic, which "
    "is WHY Q15 needs the decimal discipline.",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q63_top_supplier_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_date(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_date(F.lit("1996-04-01")))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))).alias(
            "rev_dec"
        )
    )
    # The aggregate feeds both the max and the filter; cache the supplier-
    # cardinality relation so the fact scan runs once (same load-bearing
    # cache as q44's domain relation).
    rev = rev.cache()
    mx = rev.agg(F.max("rev_dec").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_dec") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q64_part_supplier_variety",
    category="join",
    doc="TPC-H Q16 shape: distinct-supplier counts per part attribute "
    "group, excluding a supplier blacklist and filtered part classes. "
    "The (part, supplier) relation comes from lineitem (this schema's "
    "partsupp); the blacklist is a broadcast anti join BEFORE the "
    "distinct — never after, so excluded suppliers don't inflate the "
    "shuffled pair set. One (brand, type, size)-keyed count-distinct "
    "shuffle on the deduplicated pairs.",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%00')
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def q64_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").startswith("PROMO"))
        & (F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%00")
    ).select("s_suppkey")
    return (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


_Q65_ORACLE = """
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN sn.n_name = 'KENYA'
                     THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'AFRICA'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
GROUP BY 1
ORDER BY o_year
"""


def _market_share_rollup(spark: SparkSession, sf_dir: str, fact: DataFrame) -> DataFrame:
    """q65's dimension chain + conditional share rollup over an already-
    joined lineitem x orders relation (columns l_suppkey, l_extendedprice,
    l_discount, o_custkey, o_orderdate). Shared by the plain and the
    bucketed-layout variants so their results are definitionally the same
    computation after the fact-fact join."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    sup = load_table(spark, sf_dir, "supplier")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
    kenya_vol = F.when(F.col("supp_nation") == "KENYA", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        fact.join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(kenya_vol).cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "q65_market_share",
    category="join",
    doc="TPC-H Q8 shape (national market share): for one region's "
    "customers, the share of yearly revenue delivered by suppliers of "
    "one nation. Conditional-sum-over-sum per year — both numerator and "
    "denominator from ONE aggregation pass (a CASE inside the sum), "
    "never two scans. All dimensions broadcast; the fact shuffles once "
    "for the year rollup. Exact decimal sums; the final share is one "
    "IEEE division of two exact values, bit-stable across engines. "
    "q95_bucketed_market_share is the same computation over a bucketed "
    "layout where the fact-fact join plans zero Exchange.",
    oracle=_Q65_ORACLE,
)
def q65_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    fact = li.join(o, li.l_orderkey == o.o_orderkey)
    return _market_share_rollup(spark, sf_dir, fact)


@register(
    "q95_bucketed_market_share",
    category="join",
    doc="q65's market share over a BUCKETED fact layout — the 100 TB "
    "answer to the genuine lineitem x orders orderkey shuffle (measured "
    "15x at 100x for the plain join, PLANS.md): both facts are written "
    "once with bucketBy(16, orderkey) + sortBy, after which the "
    "fact-fact join is a zero-Exchange sort-merge join — Catalyst "
    "recognizes the matching bucket partitioning, so neither 100 TB "
    "side ever rides the wire again for ANY orderkey join. The builder "
    "pays the one-time layout write per call to stay self-contained "
    "(production does it in the ingest pipeline); the plan assertion "
    "lives in tests/test_scale_joins.py and the result is hash-identical "
    "to q65 by construction (same oracle, shared rollup).",
    oracle=_Q65_ORACLE,
)
def q95_bucketed_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.operators.scale_joins import (
        write_bucketed,
    )

    tag = re.sub(r"[^0-9a-z]+", "_", os.path.basename(sf_dir.rstrip("/")).lower())
    lt, ot = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    write_bucketed(li, lt, "l_orderkey", n_buckets=16)
    write_bucketed(o, ot, "o_orderkey", n_buckets=16)
    fact = (
        spark.table(lt)
        .hint("merge")  # pin SMJ so the co-location shows at toy scale too
        .join(spark.table(ot), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return _market_share_rollup(spark, sf_dir, fact)


@register(
    "q67_small_quantity_revenue",
    category="join",
    doc="TPC-H Q17 shape (small-quantity-order revenue): for one brand's "
    "parts, the revenue from lineitems whose quantity is below 20% of "
    "that part's average quantity — lost-revenue-if-minimum-lot "
    "analysis. The textbook form re-scans lineitem per part for the "
    "correlated AVG; the scalable decorrelation computes every part's "
    "average in ONE partkey-grouped pass over the fact, broadcasts the "
    "(tiny) filtered-part thresholds, and filters the fact scan "
    "row-locally. The threshold division stays exact: quantity is "
    "2-decimal, so 5*sum(q) vs n*q compares exact decimals — no float "
    "average, no rounding ambiguity at the boundary.",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3'
  AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * (
    SELECT COUNT(*) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    < (SELECT SUM(CAST(l2.l_quantity AS DECIMAL(18,2)))
       FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
)
def q67_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    qdec = F.col("l_quantity").cast("decimal(18,2)")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(qdec).alias("sum_q"), F.count(F.lit(1)).alias("n_q")
    )
    thresholds = per_part.join(
        F.broadcast(p.select("p_partkey")), F.col("pk") == F.col("p_partkey"), "left_semi"
    )
    return (
        li.join(F.broadcast(thresholds), li.l_partkey == F.col("pk"))
        # exact-integer comparison: 5*q*n < sum_q  <=>  q < 0.2*avg(q)
        .filter(qdec * 5 * F.col("n_q") < F.col("sum_q"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "q68_dominant_supplier_parts",
    category="join",
    doc="Dominant-supplier detection (TPC-H Q20's excess-stock shape "
    "adapted to this schema): (part, supplier) pairs where the supplier "
    "shipped more than half of the part's total 1995 quantity — the "
    "single-source-risk audit. One (part, supplier) aggregate and one "
    "part-level rollup of THAT aggregate (never a second fact scan), "
    "joined on the part key; 2x comparison stays in exact decimals.",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty
  FROM lineitem
  WHERE year(l_shipdate) = 1995
  GROUP BY l_partkey, l_suppkey
),
tot AS (
  SELECT l_partkey, SUM(supp_qty) AS part_qty, COUNT(*) AS n_supp
  FROM ps GROUP BY l_partkey
)
SELECT ps.l_partkey, ps.l_suppkey,
       CAST(ps.supp_qty AS DOUBLE) AS supp_qty,
       CAST(t.part_qty AS DOUBLE) AS part_qty
FROM ps
JOIN tot t ON t.l_partkey = ps.l_partkey
WHERE t.n_supp > 1 AND ps.supp_qty * 2 > t.part_qty
ORDER BY ps.l_partkey, ps.l_suppkey
""",
)
def q68_dominant_supplier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == 1995)
    qdec = F.col("l_quantity").cast("decimal(18,2)")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum(qdec).alias("supp_qty"))
    tot = ps.groupBy("l_partkey").agg(
        F.sum("supp_qty").alias("part_qty"), F.count(F.lit(1)).alias("n_supp")
    )
    return (
        ps.join(tot, "l_partkey")
        .filter((F.col("n_supp") > 1) & (F.col("supp_qty") * 2 > F.col("part_qty")))
        .select(
            "l_partkey",
            "l_suppkey",
            F.col("supp_qty").cast("double").alias("supp_qty"),
            F.col("part_qty").cast("double").alias("part_qty"),
        )
        .orderBy("l_partkey", "l_suppkey")
    )


@register(
    "q69_disjunctive_pushdown",
    category="join",
    doc="TPC-H Q19 shape: revenue under an OR-of-ANDs predicate over "
    "brand x quantity-band x size — the disjunctive-pushdown showcase. "
    "Declared as one boolean expression; Catalyst factors the common "
    "part-side and lineitem-side conjuncts out of the OR so both scans "
    "prune BEFORE the join (the common l_quantity upper bound and "
    "p_size floor reach PushedFilters), and the residual disjunction "
    "evaluates post-join in codegen. Part side broadcasts.",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def q69_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 20) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 25) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dsum_expr(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
            ).alias("revenue")
        )
    )


@register(
    "q70_returned_items",
    category="join",
    doc="TPC-H Q10 shape: revenue lost to returned items per customer in "
    "one quarter, top 20 — date-filtered orders join the 'R'-flagged "
    "lineitems, aggregate on the customer key, then customer/nation "
    "detail attaches to the 20-row result (aggregate-then-join, the q04 "
    "discipline: dimension strings never ride through the big shuffle).",
    oracle="""
WITH agg AS (
  SELECT o.o_custkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS rev_dec
  FROM orders o
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate >= DATE '1995-10-01' AND o.o_orderdate < DATE '1996-01-01'
    AND l.l_returnflag = 'R'
  GROUP BY o.o_custkey
  ORDER BY rev_dec DESC, o_custkey
  LIMIT 20
)
SELECT c.c_custkey, c.c_name, n.n_name, CAST(a.rev_dec AS DOUBLE) AS revenue
FROM agg a
JOIN customer c ON c.c_custkey = a.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
ORDER BY revenue DESC, c_custkey
""",
)
def q70_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_date(F.lit("1995-10-01")))
        & (F.col("o_orderdate") < F.to_date(F.lit("1996-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    agg = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.sum(
                dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
            ).alias("rev_dec")
        )
        .orderBy(F.desc("rev_dec"), F.asc("o_custkey"))
        .limit(20)
    )
    return (
        F.broadcast(agg)
        .join(c, agg.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("rev_dec").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
    )


@register(
    "q71_product_profit",
    category="join",
    doc="TPC-H Q9 shape (product-type profit by nation and year), adapted "
    "to this schema: profit = discounted revenue minus a 60%-of-retail "
    "cost proxy (no partsupp cost column exists), for parts whose name "
    "contains 'red', per supplier nation per order year. The fact "
    "shuffles once for the (nation, year) rollup; part filters before "
    "its broadcast; supplier/nation broadcast. Profit folds entirely in "
    "decimals (retailprice is 1-decimal -> DECIMAL(18,1) cast, products "
    "widen exactly) so the nation-year sums are bit-stable.",
    oracle="""
SELECT sn.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))
                - CAST(0.6 AS DECIMAL(2,1)) * CAST(p.p_retailprice AS DECIMAL(18,1)) * CAST(l.l_quantity AS DECIMAL(18,2)))
         AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
""",
)
def q71_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2)) - F.lit(
        0.6
    ).cast("decimal(2,1)") * F.col("p_retailprice").cast("decimal(18,1)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q72_order_history_strings",
    category="aggregation",
    doc="Ordered list aggregation: each customer's order history as a "
    "comma-joined orderkey string in (date, key) order, plus first/last "
    "order dates — the collect-and-serialize shape feature stores use "
    "for sequence features. Spark has no ordered string_agg, so the "
    "portable form is collect_list(struct(sort keys…)) -> array_sort -> "
    "transform -> concat_ws, which is deterministic under any partition "
    "order (the sort happens inside the row); the oracle uses DuckDB's "
    "native string_agg(… ORDER BY …). Per-customer state is "
    "order-count-sized — the same bounded-entity-grain contract as the "
    "session windows.",
    oracle="""
SELECT o_custkey,
       string_agg(o_orderkey, ',' ORDER BY o_orderdate, o_orderkey) AS order_history,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
""",
)
def q72_order_history_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    hist = F.concat_ws(
        ",",
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("o_orderdate", "o_orderkey"))
            ),
            lambda s: s.o_orderkey.cast("string"),
        ),
    )
    return (
        o.groupBy("o_custkey")
        .agg(
            hist.alias("order_history"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


@register(
    "q73_spend_percentile_rank",
    category="window",
    doc="Global rank + percentile of every customer by total spend "
    "WITHOUT a single-partition window (the #1 scale-killer this repo "
    "bans): the classic distributed ranking construction — range-"
    "repartition on the rank key, sort within partitions, per-partition "
    "row_number (window partitioned by spark_partition_id, so partition "
    "state is bounded by cluster width), then add broadcast partition-"
    "size prefix offsets. Global rank is exact and independent of where "
    "the range boundaries land; ties are impossible because (spend, "
    "custkey) is unique. The oracle uses the plain RANK() window — "
    "fine in DuckDB, banned here at scale.",
    oracle="""
WITH spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
  FROM orders GROUP BY o_custkey
),
n AS (SELECT COUNT(*) AS n_cust FROM spend)
SELECT o_custkey,
       CAST(spend_dec AS DOUBLE) AS total_spend,
       CAST(RANK() OVER (ORDER BY spend_dec, o_custkey) AS BIGINT) AS spend_rank,
       CAST(RANK() OVER (ORDER BY spend_dec, o_custkey) - 1 AS DOUBLE)
         / (SELECT n_cust - 1 FROM n) AS spend_percentile
FROM spend
ORDER BY o_custkey
""",
)
def q73_spend_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).alias("spend_dec")
    )
    total = spend.agg(F.count(F.lit(1)).alias("n_cust"))
    parts = (
        spend.repartitionByRange(32, F.col("spend_dec"), F.col("o_custkey"))
        .sortWithinPartitions("spend_dec", "o_custkey")
        .withColumn("pid", F.spark_partition_id())
    )
    wlocal = Window.partitionBy("pid").orderBy("spend_dec", "o_custkey")
    local = parts.withColumn("local_rank", F.row_number().over(wlocal))
    sizes = local.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    woff = (
        Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # the offsets relation is cluster-width-sized (32 rows) — its window
    # is the whitelisted tiny-relation single partition, not a data window
    offsets = sizes.withColumn("cum", F.sum("n").over(woff)).select(
        "pid", (F.col("cum") - F.col("n")).alias("offset")
    )
    return (
        local.join(F.broadcast(offsets), "pid")
        .crossJoin(F.broadcast(total))
        .select(
            "o_custkey",
            F.col("spend_dec").cast("double").alias("total_spend"),
            (F.col("offset") + F.col("local_rank")).alias("spend_rank"),
            (
                (F.col("offset") + F.col("local_rank") - 1).cast("double")
                / (F.col("n_cust") - 1)
            ).alias("spend_percentile"),
        )
        .orderBy("o_custkey")
    )


@register(
    "q78_value_concentration",
    category="aggregation",
    doc="TPC-H Q11 shape (the last of the 22 classic patterns): per-part "
    "traded value for one nation's suppliers, keeping parts whose value "
    "exceeds a threshold derived from the nation total — HAVING against "
    "a global scalar. Adapted to this schema: value = sum of "
    "extendedprice over lineitems shipped by NATION_8 suppliers (no "
    "partsupp table exists), keeping parts above 2x the mean part value "
    "— a SCALE-INVARIANT cut (TPC-H's own fixed fraction empties the "
    "answer as SF grows). The per-part aggregate is computed ONCE and "
    "cached; the grand total re-aggregates those group rows "
    "(part-cardinality input, not a second fact scan) and joins back as "
    "a broadcast single row. The threshold compare is multiplicative in "
    "exact decimals (val*n_parts > 2*total — no division anywhere), so "
    "no boundary part can flip on rounding in either engine.",
    oracle="""
WITH v AS (
  SELECT l.l_partkey,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS val_dec
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_8'
  GROUP BY 1
),
tot AS (SELECT SUM(val_dec) AS total, COUNT(*) AS n_parts FROM v)
SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
FROM v CROSS JOIN tot
WHERE CAST(val_dec AS DECIMAL(20,2)) * CAST(n_parts AS DECIMAL(10,0))
      > CAST(total AS DECIMAL(20,2)) * CAST(2 AS DECIMAL(10,0))
ORDER BY part_value DESC, l_partkey
""",
)
def q78_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_8")
    per_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("val_dec"))
        .cache()
    )
    totals = per_part.agg(
        F.sum("val_dec").alias("total"), F.count(F.lit(1)).alias("n_parts")
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .filter(
            F.col("val_dec").cast("decimal(20,2)")
            * F.col("n_parts").cast("decimal(10,0)")
            > F.col("total").cast("decimal(20,2)") * F.lit(2).cast("decimal(10,0)")
        )
        .select("l_partkey", F.col("val_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@register(
    "q92_inflight_sweep",
    category="window",
    doc="Temporal state reconstruction — orders in flight on the first of "
    "each month (order placed, last line not yet shipped) — solved as an "
    "interval SWEEP instead of the naive point-in-range join: a probe x "
    "intervals range join multiplies the fact by the probe count (80 "
    "months here; unbounded in general), while counting boundary events "
    "reduces everything after one orderkey-keyed shuffle to two "
    "day-grain histograms (calendar-bounded, ~2.5k rows). in_flight(d) "
    "= #starts <= d minus #ends < d. The cumulative reads run as "
    "row-local higher-order folds over the one collected day-axis "
    "array (q85's pattern — no partition-less window anywhere), so the "
    "whole reconstruction costs one fact join + one fact aggregate at "
    "any scale. The oracle cross-joins probes x intervals — the same "
    "semantics by brute force.",
    oracle="""
WITH iv AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS s,
         MAX(CAST(l.l_shipdate AS DATE)) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
bounds AS (
  SELECT CAST(date_trunc('month', MIN(s)) AS DATE) AS lo,
         CAST(date_trunc('month', MAX(e)) AS DATE) AS hi
  FROM iv
),
months AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS m
  FROM bounds
)
SELECT m.m AS month,
       CAST(COALESCE(SUM(CASE WHEN iv.s <= m.m THEN 1 END), 0) AS BIGINT)
         AS starts_cum,
       CAST(COALESCE(SUM(CASE WHEN iv.e < m.m THEN 1 END), 0) AS BIGINT)
         AS ends_cum,
       CAST(COALESCE(SUM(CASE WHEN iv.s <= m.m THEN 1 END), 0)
            - COALESCE(SUM(CASE WHEN iv.e < m.m THEN 1 END), 0) AS BIGINT)
         AS in_flight
FROM months m CROSS JOIN iv
GROUP BY m.m
ORDER BY m.m
""",
)
def q92_inflight_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    iv = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.first(F.col("o_orderdate").cast("date")).alias("s"),
            F.max(F.col("l_shipdate").cast("date")).alias("e"),
        )
    )
    sh = iv.groupBy(F.col("s").alias("day")).agg(F.count(F.lit(1)).alias("n_s"))
    eh = iv.groupBy(F.col("e").alias("day")).agg(F.count(F.lit(1)).alias("n_e"))
    axis = (
        sh.join(eh, "day", "full_outer")
        .select(
            "day",
            F.coalesce("n_s", F.lit(0)).alias("n_s"),
            F.coalesce("n_e", F.lit(0)).alias("n_e"),
        )
    )
    # One bounded row: the sorted day axis plus the month probe sequence.
    row = axis.agg(
        F.sort_array(F.collect_list(F.struct("day", "n_s", "n_e"))).alias("arr")
    ).select(
        "arr",
        F.sequence(
            F.date_trunc("month", F.element_at(F.col("arr"), 1).day).cast("date"),
            F.date_trunc("month", F.element_at(F.col("arr"), -1).day).cast("date"),
            F.expr("INTERVAL 1 MONTH"),
        ).alias("months"),
    )
    probed = row.select(
        F.explode(
            F.transform(
                F.col("months"),
                lambda m: F.struct(
                    m.alias("month"),
                    F.aggregate(
                        F.col("arr"),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc
                        + F.when(x.day <= m, x.n_s).otherwise(F.lit(0)),
                    ).alias("starts_cum"),
                    F.aggregate(
                        F.col("arr"),
                        F.lit(0).cast("bigint"),
                        lambda acc, x: acc
                        + F.when(x.day < m, x.n_e).otherwise(F.lit(0)),
                    ).alias("ends_cum"),
                ),
            )
        ).alias("r")
    )
    return probed.select(
        F.col("r.month").alias("month"),
        F.col("r.starts_cum").alias("starts_cum"),
        F.col("r.ends_cum").alias("ends_cum"),
        (F.col("r.starts_cum") - F.col("r.ends_cum")).alias("in_flight"),
    ).orderBy("month")
