#!/usr/bin/env python
"""Regenerate the synthetic scaled extensions used for PLANS.md's 10x/100x
measurements (crossJoin a copies range, offset the join keys by max(id)+1 so sparse
id spaces cannot collide, symlink the unchanged tables). Dirs land under /tmp and do NOT survive rounds — re-run
this script before measuring.

Usage: python scripts/scale_gen.py  (builds all five extensions, idempotent)

  /tmp/sx100_events  events x100 (event_id offset)
  /tmp/sx10_docs     documents x10 (doc_id offset, text perturbed per copy)
  /tmp/sx10_emb      embeddings x10 (vec_id offset)
  /tmp/sx100_facts   orders+lineitem x100 (orderkey offset, dims shared)
  /tmp/sx100_merge   fact-sized MERGE/SCD2 snapshot pair: pristine 100x
                     orders base partitioned by o_month + a one-month
                     update batch; mutable target — COPY base fresh per
                     timed run (merge/scd2 rewrite it in place)

Measurement protocol (see .claude/skills/verify/SKILL.md): build a FRESH
DataFrame per timed run (prior actions leave reusable shuffle outputs that
fake ~0.1s timings), min-of-2+ runs, check `uptime` first.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from european_public_data_pipeline_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def link_others(dst: str, scaled: set[str]) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        if t in scaled:
            continue
        p = f"{dst}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"{SRC}/{t}.parquet", p)


def main() -> None:
    spark = get_spark(app_name="scale-gen", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    dst = "/tmp/sx100_events"
    if not os.path.exists(f"{dst}/events.parquet"):
        e = spark.read.parquet(f"{SRC}/events.parquet")
        stride = e.agg(F.max("event_id")).collect()[0][0] + 1
        copies = spark.range(100).withColumnRenamed("id", "copy")
        (
            e.crossJoin(copies)
            .withColumn("event_id", F.col("event_id") + F.col("copy") * F.lit(stride))
            .drop("copy")
            .write.mode("overwrite")
            .parquet(f"{dst}/events.parquet")
        )
    link_others(dst, {"events"})

    dst = "/tmp/sx10_docs"
    if not os.path.exists(f"{dst}/documents.parquet"):
        d = spark.read.parquet(f"{SRC}/documents.parquet")
        stride = d.agg(F.max("doc_id")).collect()[0][0] + 1
        copies = spark.range(10).withColumnRenamed("id", "copy")
        (
            d.crossJoin(copies)
            .withColumn("doc_id", F.col("doc_id") + F.col("copy") * F.lit(stride))
            .withColumn(
                "text",
                F.when(F.col("copy") == 0, F.col("text")).otherwise(
                    F.concat(
                        F.col("text"), F.lit(" variant"), F.col("copy").cast("string")
                    )
                ),
            )
            .withColumn("n_chars", F.length("text"))
            .drop("copy")
            .write.mode("overwrite")
            .parquet(f"{dst}/documents.parquet")
        )
        # NOTE: every doc gains ~10 near-copies, so near-dup PAIR counts are
        # quadratic in the copy count — d04/d17/sm10 super-linearity on this
        # corpus is output-driven, not a plan defect (PLANS.md).
    link_others(dst, {"documents"})

    dst = "/tmp/sx10_emb"
    if not os.path.exists(f"{dst}/embeddings.parquet"):
        e = spark.read.parquet(f"{SRC}/embeddings.parquet")
        stride = e.agg(F.max("vec_id")).collect()[0][0] + 1
        copies = spark.range(10).withColumnRenamed("id", "copy")
        (
            e.crossJoin(copies)
            .withColumn("vec_id", F.col("vec_id") + F.col("copy") * F.lit(stride))
            .drop("copy")
            .write.mode("overwrite")
            .parquet(f"{dst}/embeddings.parquet")
        )
    link_others(dst, {"embeddings"})

    dst = "/tmp/sx100_facts"
    if not os.path.exists(f"{dst}/lineitem.parquet"):
        o = spark.read.parquet(f"{SRC}/orders.parquet")
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        maxo = o.agg(F.max("o_orderkey")).collect()[0][0] + 1
        copies = spark.range(100).withColumnRenamed("id", "copy")
        (
            o.crossJoin(copies)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.col("copy") * F.lit(maxo))
            .drop("copy")
            .write.mode("overwrite")
            .parquet(f"{dst}/orders.parquet")
        )
        (
            li.crossJoin(copies)
            .withColumn("l_orderkey", F.col("l_orderkey") + F.col("copy") * F.lit(maxo))
            .drop("copy")
            .write.mode("overwrite")
            .parquet(f"{dst}/lineitem.parquet")
        )
    link_others(dst, {"orders", "lineitem"})

    # Fact-sized keyed snapshot pair for MERGE/SCD2 measurements
    # (q113/q114's sx100 extension keeps customer dim-sized by design, so
    # their measured 1.0x proved nothing about fact-sized keyed batches):
    # a PRISTINE 100x orders base partitioned by order month (~80
    # partitions; o_orderkey -> o_orderdate is fixed, so keys stay in
    # partition), plus an update batch touching keys in ONE month
    # (price bump) and a small new-key slice. The measurement script
    # copies base fresh per timed run — merge mutates it.
    dst = "/tmp/sx100_merge"
    if not os.path.exists(f"{dst}/updates.parquet"):
        o100 = spark.read.parquet("/tmp/sx100_facts/orders.parquet").withColumn(
            "o_month", F.date_format("o_orderdate", "yyyy-MM")
        )
        o100.write.partitionBy("o_month").mode("overwrite").parquet(f"{dst}/base")
        upd_keys = o100.filter(F.col("o_month") == "1995-03")
        maxk = o100.agg(F.max("o_orderkey")).collect()[0][0] + 1
        new_keys = (
            o100.filter(F.col("o_month") == "1995-04")
            .limit(10_000)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(maxk))
        )
        (
            upd_keys.unionByName(new_keys)
            .withColumn("o_totalprice", F.col("o_totalprice") * 1.01)
            .write.mode("overwrite")
            .parquet(f"{dst}/updates.parquet")
        )
    print(
        "scale extensions ready: sx100_events sx10_docs sx10_emb "
        "sx100_facts sx100_merge"
    )


if __name__ == "__main__":
    main()
