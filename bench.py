#!/usr/bin/env python
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is executed to completion (collect on aggregates / count on wide
outputs) after a warm-up pass of the scan layer; timings are wall-clock per
query on a shared session, which is how the engine would run in production
(session reuse, JIT/codegen warm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from european_public_data_pipeline_spark import plans  # noqa: E402
from european_public_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = get_spark(
        app_name="epdp-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )

    specs = [s for s in plans.all_specs().values() if s.bench]

    # Warm-up: touch every input file once so OS page cache and Spark's
    # codegen are warm (steady-state throughput is what we benchmark).
    for spec in specs:
        spec.builder(spark, sf_dir).limit(1).collect()

    def run_once(spec) -> float:
        t0 = time.perf_counter()
        df = spec.builder(spark, sf_dir)
        # Execute fully: small aggregate outputs are collected, wide outputs
        # are counted (forces full evaluation without driver transfer).
        if len(df.columns) <= 16:
            df.collect()
        else:
            df.count()
        return time.perf_counter() - t0

    # Two timed passes, report the min: steady-state throughput without
    # one-off JIT/cache-population noise polluting individual queries.
    timings: dict[str, float] = {}
    for spec in specs:
        first = run_once(spec)
        timings[spec.name] = round(min(first, run_once(spec)), 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
