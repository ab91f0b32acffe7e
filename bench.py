#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion through the no-op sink
(``df.write.format("noop")``, optimization guide §1.4) after a warm-up
pass of the scan layer; timings are wall-clock per query on a shared
session, which is how the engine would run in production (session reuse,
JIT/codegen warm).

Measurement-methodology fix (round 13, documented in OPTIMIZATION_r13.md):
rounds 1-12 timed ``collect()`` for narrow outputs and ``count()`` for wide
ones. ``collect`` charges queries for single-threaded driver row-pickling
the computation doesn't have (q22's 95k-row collect measured 2.29s vs
0.69s of actual computation at sf0.1), and ``count`` lets the optimizer
prune columns, under-measuring wide outputs. The noop sink computes every
column of every row and discards it — guide §1.4's prescribed timing
action. Cross-round comparisons must use the shared methodology:
OPTIMIZATION_r13.md records this round's numbers under BOTH actions.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from european_public_data_pipeline_spark import plans  # noqa: E402
from european_public_data_pipeline_spark.session import get_spark  # noqa: E402


# Fixed 1-task calibration job's min-of-3 on a TRULY idle round-5 machine
# (load_avg 0.08; at load ~1 the same job measures ~215 ms).
# ``queries_normalized`` rescales by the measured/ref ratio so
# cross-round comparisons survive background machine load — two
# consecutive rounds of bench noise needed forensic explanation
# (VERDICT r4 #4).
CALIBRATION_REF_MS = 187.0


def calibrate(spark) -> float:
    """Single-task, pure-JVM, shuffle-free job with fixed work: its runtime
    moves with machine load and JVM health, not with any query change."""

    def once() -> float:
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, 1).selectExpr(
            "sum(id % 1000003) as s"
        ).collect()
        return (time.perf_counter() - t0) * 1000

    once()  # codegen warm-up
    return round(min(once() for _ in range(3)), 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Sample BEFORE the session starts — JVM startup's own thread burst
    # inflates the 1-minute loadavg within seconds.
    load_avg = round(os.getloadavg()[0], 2)

    spark = get_spark(
        app_name="epdp-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # Keep the archived bench log clean (progress-bar/stage chatter
    # otherwise pollutes it).
    spark.sparkContext.setLogLevel("ERROR")

    calibration_ms = calibrate(spark)

    specs = [s for s in plans.all_specs().values() if s.bench]

    # Warm-up: touch every input file once so OS page cache and Spark's
    # codegen are warm (steady-state throughput is what we benchmark).
    for spec in specs:
        spec.builder(spark, sf_dir).limit(1).collect()

    # Builders .cache() intermediates for WITHIN-query reuse, but Spark's
    # CacheManager matches cache entries by logical plan, so an identical
    # plan rebuilt later — the same query on a later pass, or a sibling
    # query sharing a subtree (d04 rebuilds d03's shingle relation) —
    # silently reuses the materialized InMemoryRelation. Min-of-N would
    # then report warm-cache timings that never touch the parquet inputs
    # (VERDICT r13 #1). Clearing the CacheManager after every timed
    # execution makes each sample compute fully from the inputs; the
    # within-run cache reuse a single query's plan performs is still
    # (correctly) part of its own timing.
    def run_once(spec) -> float:
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        # Execute fully: the noop sink materializes every column of every
        # row and discards it (guide §1.4) — times the computation, not
        # the driver transfer of the result set.
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        spark.catalog.clearCache()
        return elapsed

    # The warm-up's limit(1) probes may have part-materialized cached
    # subtrees; drop them so pass 1 starts cold like every other pass.
    spark.catalog.clearCache()

    # Three timed passes, INTERLEAVED (pass 1 all queries, pass 2 all,
    # pass 3 all), report the per-query min: back-to-back repeats of one
    # query land both samples inside the same transient load spike, which
    # produced 24% cross-round swings the 1-task calibration probe cannot
    # see (memory-bandwidth/neighbor contention — VERDICT r8). Interleaving
    # decorrelates each query's samples from any one spike; min-of-3 is
    # the repo's PLANS.md measurement discipline applied to the artifact.
    PASSES = 3
    samples: dict[str, list[float]] = {s.name: [] for s in specs}
    for _ in range(PASSES):
        for spec in specs:
            samples[spec.name].append(run_once(spec))
    timings = {name: round(min(ts), 4) for name, ts in samples.items()}

    total = round(sum(timings.values()), 4)
    scale = CALIBRATION_REF_MS / calibration_ms if calibration_ms > 0 else 1.0
    normalized = {k: round(v * scale, 4) for k, v in timings.items()}
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "passes": PASSES,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "load_avg": load_avg,
                "calibration_ms": calibration_ms,
                "calibration_ref_ms": CALIBRATION_REF_MS,
                "value_normalized": round(total * scale, 4),
                "queries_normalized": normalized,
            }
        )
    )


if __name__ == "__main__":
    main()
