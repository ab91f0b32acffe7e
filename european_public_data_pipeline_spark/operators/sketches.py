"""Frequency and membership sketches as first-class DataFrame computations.

A Count-Min sketch and a Bloom filter are both just constant-size cell
relations: hash every row into a handful of cells, aggregate, and the whole
sketch is a d*w (or m)-row table that one map-side-combined shuffle
produces regardless of input size. Building them AS DataFrames (instead of
an opaque serialized blob like ``count_min_sketch()``'s binary) keeps the
sketch queryable with ordinary joins, mergeable with ``unionAll`` +
re-aggregate, and auditable next to exact answers.

The sketch estimates depend on Spark's xxhash64, which DuckDB cannot
reproduce, so — as with q25's HLL audit — the oracle-checked surface is a
BOUNDS AUDIT: exact answers plus booleans asserting the sketch landed
inside its guarantee. The booleans are deterministic (fixed seeds, fixed
data), so a regression in the sketch pipeline hash-mismatches the oracle's
literal TRUEs.

Reference parity: the reference pipeline has no sketches (627-line pandas
ETL); this is part of the §2.12 capability surface for 100 TB curation,
where exact per-key state is the thing you cannot afford.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.tables import load_table

# Count-Min geometry: width 4096 gives eps = e/w ~= 6.6e-4; depth 6 gives
# per-key failure probability e^-6 ~= 0.25%. On this corpus the realized
# excess is far inside the bound (verified at sf0.001/0.01/0.1) because the
# supplier key cardinality is small next to w.
CMS_DEPTH = 6
CMS_WIDTH = 4096
CMS_TOPK = 10

# Bloom geometry: 2^17 bits, 5 probes. At sf0.1 ~2/3 of customers have
# orders (n ~= 10k inserted keys), so the theoretical false-positive rate
# is (1 - e^(-k*n/m))^k ~= 0.3%; the audit allows 3x that plus a +3
# absolute cushion per segment so small-sf noise cannot flip the boolean.
BLOOM_BITS = 131072
BLOOM_HASHES = 5


def cms_cells(rows: DataFrame, key: str) -> DataFrame:
    """The d*w Count-Min cell relation for ``rows[key]``.

    One projection explodes each row into ``CMS_DEPTH`` (hash_id, bucket)
    cells; the aggregation's map-side combine collapses every partition to
    at most d*w cells before the (constant-size) shuffle.
    """
    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(CMS_WIDTH))
            for i in range(CMS_DEPTH)
        ]
    )
    return (
        rows.select(F.posexplode(probes).alias("hash_id", "bucket"))
        .groupBy("hash_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def cms_estimate(cells: DataFrame, keys: DataFrame, key: str) -> DataFrame:
    """Point-estimate each ``keys[key]`` against a broadcast cell relation."""
    probes = F.array(
        *[
            F.struct(
                F.lit(i).alias("hash_id"),
                F.pmod(F.xxhash64(F.lit(i), F.col(key)), F.lit(CMS_WIDTH)).alias(
                    "bucket"
                ),
            )
            for i in range(CMS_DEPTH)
        ]
    )
    probed = keys.select(key, F.explode(probes).alias("p")).select(
        key, "p.hash_id", "p.bucket"
    )
    return (
        probed.join(F.broadcast(cells), ["hash_id", "bucket"], "left")
        .groupBy(key)
        # a missing cell means zero occurrences hashed there
        .agg(F.min(F.coalesce("cell_count", F.lit(0))).alias("cms_estimate"))
    )


@register(
    "q79_cms_heavy_hitters",
    category="sketch",
    bench=True,
    doc="Count-Min heavy-hitter audit: estimate each top-10 supplier's "
    "lineitem count from a 6x4096-cell Count-Min sketch built as a "
    "DataFrame aggregation, next to the exact counts. The sketch build "
    "shuffles a CONSTANT-size relation (map-side combine collapses every "
    "partition to <= d*w cells) — the 100 TB path for per-key frequency "
    "when exact groupBy state would be key-cardinality-sized. The audit "
    "asserts the CMS guarantee: estimate >= exact always (collisions "
    "only add), and estimate <= exact + eps*N with eps = e/w. Estimates "
    "use Spark's xxhash64 (not reproducible in DuckDB), so the oracle "
    "emits the exact counts with literal TRUEs — q25's HLL-audit "
    "pattern.",
    oracle=f"""
SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS exact_lines,
       TRUE AS cms_never_undercounts,
       TRUE AS cms_within_eps_n
FROM lineitem
GROUP BY l_suppkey
ORDER BY exact_lines DESC, l_suppkey
LIMIT {CMS_TOPK}
""",
)
def q79_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    cells = cms_cells(li, "l_suppkey")
    exact = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("exact_lines"))
    top = exact.orderBy(F.desc("exact_lines"), F.asc("l_suppkey")).limit(CMS_TOPK)
    est = cms_estimate(cells, top.select("l_suppkey"), "l_suppkey")
    total = li.agg(F.count(F.lit(1)).alias("n_rows"))
    # eps*N slack in exact integer arithmetic: ceil(e/w * N) computed as
    # (27183 * N) div (10000 * w) + 1 — e rounded UP at the 4th decimal so
    # the integer slack is never below the real bound.
    slack = (F.lit(27183) * F.col("n_rows") - F.lit(1)) / F.lit(10000 * CMS_WIDTH) + 1
    return (
        top.join(F.broadcast(est), "l_suppkey")
        .crossJoin(F.broadcast(total))
        .select(
            "l_suppkey",
            "exact_lines",
            (F.col("cms_estimate") >= F.col("exact_lines")).alias(
                "cms_never_undercounts"
            ),
            (
                F.col("cms_estimate")
                <= F.col("exact_lines") + slack.cast("long")
            ).alias("cms_within_eps_n"),
        )
        .orderBy(F.desc("exact_lines"), F.asc("l_suppkey"))
    )


def bloom_bitset(rows: DataFrame, key: str) -> DataFrame:
    """The set-bit relation of a Bloom filter over distinct ``rows[key]``."""
    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(100 + i), F.col(key)), F.lit(BLOOM_BITS))
            for i in range(BLOOM_HASHES)
        ]
    )
    return (
        rows.select(F.explode(probes).alias("bit_pos"))
        .distinct()  # <= m rows after one map-side-combined shuffle
    )


@register(
    "q80_bloom_membership_audit",
    category="sketch",
    doc="Bloom-filter membership audit: a 2^17-bit / 5-probe filter over "
    "the custkeys that appear in orders, built as a <=m-row set-bit "
    "relation (distinct bit positions — constant-size shuffle), then "
    "every customer probed via an explode + broadcast join + count==k "
    "fold. Per market segment the audit asserts the two Bloom "
    "guarantees: ZERO false negatives (every customer with orders tests "
    "positive — exact, not probabilistic), and the false-positive count "
    "within 3x the theoretical (1-e^(-kn/m))^k rate (+3 absolute) of "
    "the absent population. This is Spark's own runtime-filter "
    "pattern — build on the dim side, probe the fact — expressed "
    "openly. Oracle emits the exact per-segment counts with literal "
    "TRUEs (hash audit pattern, q25/q79).",
    oracle="""
WITH w AS (SELECT DISTINCT o_custkey FROM orders)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(w.o_custkey) AS BIGINT) AS n_with_orders,
       TRUE AS no_false_negatives,
       TRUE AS fpr_within_bound
FROM customer c
LEFT JOIN w ON c.c_custkey = w.o_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def q80_bloom_membership_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    ordered = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    bits = bloom_bitset(ordered, "c_custkey")
    n_inserted = ordered.count()

    probes = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(100 + i), F.col("c_custkey")), F.lit(BLOOM_BITS))
            for i in range(BLOOM_HASHES)
        ]
    )
    probed = cust.select("c_custkey", "c_mktsegment", F.explode(probes).alias("bit_pos"))
    hits = (
        probed.join(F.broadcast(bits), "bit_pos", "left_semi")
        .groupBy("c_custkey")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == BLOOM_HASHES)
        .select("c_custkey", F.lit(True).alias("bloom_positive"))
    )
    truth = cust.join(
        ordered.withColumn("has_orders", F.lit(True)), "c_custkey", "left"
    ).join(hits, "c_custkey", "left")

    import math

    theoretical_fpr = (
        1.0 - math.exp(-BLOOM_HASHES * n_inserted / BLOOM_BITS)
    ) ** BLOOM_HASHES
    per_seg = truth.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("has_orders"), 1).otherwise(0)).alias("n_with_orders"),
        F.sum(
            F.when(F.col("has_orders") & F.col("bloom_positive").isNull(), 1).otherwise(
                0
            )
        ).alias("n_false_neg"),
        F.sum(
            F.when(
                F.col("has_orders").isNull() & (F.col("bloom_positive") == True),  # noqa: E712
                1,
            ).otherwise(0)
        ).alias("n_false_pos"),
    )
    return per_seg.select(
        "c_mktsegment",
        "n_customers",
        "n_with_orders",
        (F.col("n_false_neg") == 0).alias("no_false_negatives"),
        (
            F.col("n_false_pos")
            <= F.lit(3.0 * theoretical_fpr)
            * (F.col("n_customers") - F.col("n_with_orders"))
            + F.lit(3)
        ).alias("fpr_within_bound"),
    ).orderBy("c_mktsegment")


@register(
    "q81_bloom_pruned_join",
    category="join",
    bench=True,
    doc="Semi-join reduction via Bloom filter — Spark's runtime-filter "
    "pattern expressed as a user-space operator: revenue per ship month "
    "for lineitems of 1-URGENT 1995 orders. The selective orders side "
    "builds a 2^17-bit Bloom filter, bit_or-packed into a DENSE "
    "2048-word array broadcast as ONE row; every lineitem row tests "
    "k=5 bit probes row-locally (O(1) array indexing + shifts, "
    "whole-stage codegen, no explode and no extra shuffle) and only "
    "survivors enter the join shuffle. "
    "False positives are eliminated by the exact join that follows, so "
    "the result is IDENTICAL to the plain join — the oracle IS the "
    "plain join. At 100 TB this ships the filter to the fact scan "
    "instead of shuffling the whole fact on l_orderkey.",
    oracle="""
SELECT CAST(date_trunc('month', l.l_shipdate) AS DATE) AS ship_month,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_orderdate >= DATE '1995-01-01' AND o.o_orderdate < DATE '1996-01-01'
GROUP BY 1
ORDER BY ship_month
""",
)
def q81_bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.functions.exact import dec

    li = load_table(spark, sf_dir, "lineitem")
    # Referenced twice (bitmap build + the exact join) — deliberately NOT
    # cached: both consumers read a pruned, filter-pushed orders scan, and
    # under a cold cache the write + two reads measured no better than the
    # two scans (r14 A/B, 1.28 vs 1.26 s). Scanning the creation side
    # twice is the guide §3.2 price of the Bloom pattern; a cache of the
    # filtered relation would hold it in cluster memory at 100 TB for no
    # measured local win.
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.to_date(F.lit("1995-01-01")))
        & (F.col("o_orderdate") < F.to_date(F.lit("1996-01-01")))
    )

    def probes(col: str) -> list:
        return [
            F.pmod(F.xxhash64(F.lit(200 + i), F.col(col)), F.lit(BLOOM_BITS))
            for i in range(BLOOM_HASHES)
        ]

    # Packed bitmap: bit positions -> (word_index, OR of set bits) ->
    # ONE row holding a DENSE m/64-long word array. Dense array, not a
    # map: element_at on a map is a linear scan of all entries per
    # lookup (measured 88x at 100x rows); on an array it is O(1), and
    # the sparse->dense densification costs m/64 map lookups exactly
    # once in the single-row relation.
    n_words = BLOOM_BITS // 64
    words = (
        o.select(F.explode(F.array(*probes("o_orderkey"))).alias("pos"))
        .groupBy(F.expr("pos div 64").alias("widx"))
        .agg(F.expr("bit_or(shiftleft(1L, cast(pos % 64 as int)))").alias("word"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("widx", "word"))).alias("bitmap")
        )
        .select(
            F.expr(
                f"transform(sequence(0L, {n_words - 1}L),"
                " i -> coalesce(element_at(bitmap, i), 0L))"
            ).alias("words")
        )
    )

    probed = li.crossJoin(F.broadcast(words))
    for i, p in enumerate(probes("l_orderkey")):
        probed = probed.withColumn(f"bpos{i}", p)
    survives = None
    for i in range(BLOOM_HASHES):
        ok = F.expr(
            f"(element_at(words, cast(bpos{i} div 64 as int) + 1)"
            f" & shiftleft(1L, cast(bpos{i} % 64 as int))) != 0"
        )
        survives = ok if survives is None else survives & ok
    pruned = probed.filter(survives).drop(
        "words", *[f"bpos{i}" for i in range(BLOOM_HASHES)]
    )
    joined = pruned.join(o, pruned.l_orderkey == o.o_orderkey)
    return (
        joined.groupBy(F.date_trunc("month", "l_shipdate").cast("date").alias("ship_month"))
        .agg(
            F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2)))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("ship_month")
    )


@register(
    "q83_sketch_mergeability",
    category="sketch",
    doc="Sketch MERGEABILITY audit — the property that makes sketches "
    "usable at 100 TB: build the Count-Min cell relation independently "
    "on two disjoint halves of the fact (even/odd orderkey — stand-ins "
    "for per-day or per-source partitions), merge by union + re-"
    "aggregation, and verify cell-for-cell equality with the sketch "
    "built over the whole fact in one pass. Counts are additive, so the "
    "identity is EXACT, not approximate — any deviation means the "
    "sketch pipeline lost commutativity (e.g. a seed or width drifted "
    "between builds). The oracle emits the exact row/key counts with a "
    "literal TRUE.",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_keys,
       TRUE AS merge_identical
FROM lineitem
""",
)
def q83_sketch_mergeability(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    whole = cms_cells(li.select("l_suppkey"), "l_suppkey")
    even = cms_cells(
        li.filter(F.col("l_orderkey") % 2 == 0).select("l_suppkey"), "l_suppkey"
    )
    odd = cms_cells(
        li.filter(F.col("l_orderkey") % 2 == 1).select("l_suppkey"), "l_suppkey"
    )
    merged = (
        even.unionAll(odd)
        .groupBy("hash_id", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
    diff = (
        whole.withColumnRenamed("cell_count", "whole_count")
        .join(merged.withColumnRenamed("cell_count", "merged_count"),
              ["hash_id", "bucket"], "full_outer")
        .filter(
            F.coalesce("whole_count", F.lit(-1))
            != F.coalesce("merged_count", F.lit(-2))
        )
    )
    stats = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_keys"),
    )
    n_mismatched = diff.count()
    return stats.select(
        "n_rows", "n_keys", F.lit(n_mismatched == 0).alias("merge_identical")
    )


@register(
    "q99_join_size_estimate",
    category="sketch",
    doc="Join-cardinality estimation WITHOUT executing the join — the "
    "AMS/CMS inner-product classic every cost-based planner needs at "
    "100 TB (choosing broadcast vs shuffle vs bucketed strategies "
    "before paying for the wrong one): |A ⋈ B on k| = Σ_k f_A(k)·f_B(k) "
    "is estimated as min over the 6 hash rows of the two sketches' "
    "cell-wise inner product. Each side's sketch is the constant-size "
    "cell relation q79 builds (map-side combined, never key-cardinality "
    "state); the inner product joins two ≤6x4096-cell relations — the "
    "whole estimate costs two fact scans and KB-sized shuffles. "
    "Oracle-checked surface is the q25/q79 bounds-audit pattern: exact "
    "side counts and the exact join size, plus booleans asserting the "
    "estimate never undershoots (CMS products only collide upward) and "
    "lands within the eps·|A|·|B| guarantee (eps = e/4096; failure "
    "probability e^-6 per the min over rows — deterministic here with "
    "fixed seeds and data).",
    oracle="""
SELECT CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_left,
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderpriority = '1-URGENT') AS BIGINT)
         AS n_right,
       CAST((SELECT COUNT(*)
             FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             WHERE o.o_orderpriority = '1-URGENT') AS BIGINT) AS exact_join_rows,
       TRUE AS estimate_at_least_exact,
       TRUE AS estimate_within_bound
""",
)
def q99_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
    )
    ca = cms_cells(li, "k").select(
        "hash_id", "bucket", F.col("cell_count").alias("ca")
    )
    cb = cms_cells(o, "k").select(
        "hash_id", "bucket", F.col("cell_count").alias("cb")
    )
    # Inner product per hash row, min across rows — both relations are
    # <= d*w cells, so this join is KB-sized regardless of fact size.
    est = (
        ca.join(cb, ["hash_id", "bucket"])
        .groupBy("hash_id")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
        .agg(F.min("ip").alias("cms_join_estimate"))
    )
    counts = (
        li.agg(F.count(F.lit(1)).alias("n_left"))
        .crossJoin(F.broadcast(o.agg(F.count(F.lit(1)).alias("n_right"))))
        .crossJoin(
            F.broadcast(
                li.join(o, "k").agg(F.count(F.lit(1)).alias("exact_join_rows"))
            )
        )
    )
    # q79's exact-slack convention: e rounded UP at the 4th decimal so the
    # integer slack is never below the real bound, and the whole bound
    # comparison stays exact (DECIMAL) — a float eps could flip the audit
    # boolean on a boundary estimate (review r5). Scaled inequality:
    # (est - exact) * 10^4 * WIDTH <= 27183 * nA * nB.
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lhs = (
        d(F.col("cms_join_estimate")) - d(F.col("exact_join_rows"))
    ) * (10_000 * CMS_WIDTH)
    rhs = F.lit(27183).cast("decimal(38,0)") * d(F.col("n_left")) * d(F.col("n_right"))
    return counts.crossJoin(F.broadcast(est)).select(
        "n_left",
        "n_right",
        "exact_join_rows",
        (F.col("cms_join_estimate") >= F.col("exact_join_rows")).alias(
            "estimate_at_least_exact"
        ),
        (lhs <= rhs).alias("estimate_within_bound"),
    )
