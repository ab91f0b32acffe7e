#!/usr/bin/env python
"""Full-registry sf0.1 sweep on ONE plain default-heap SparkSession —
the builder's full-surface guarantee (every registered query executes
at sf0.1 without tuned confs or an enlarged heap).

Session hygiene matters at this scale and is part of the protocol:

- ``spark.catalog.clearCache()`` after every query: builders cache
  intermediates for within-query reuse, and the CacheManager pins those
  plans (and the broadcasts they reference) until unpersist — across
  200+ queries the pinned heap otherwise accumulates until a mid-sweep
  OOM that no single query causes.
- A periodic ``System.gc()`` nudge: broadcast/shuffle cleanup is
  GC-driven (ContextCleaner acts on weak references), and a long-lived
  driver under steady allocation can lag far behind — the round-9 sweep
  saw "Not enough memory to build and broadcast" ~125 queries in from
  exactly this lag.

Usage: python scripts/full_sweep.py [sf_dir]  (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = SparkSession.builder.master("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ep

    qs = ep.queries()
    t0 = time.time()
    failures: list[tuple[str, str]] = []
    for i, name in enumerate(qs):
        try:
            qs[name](spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001 — collect, report, continue
            failures.append((name, f"{type(e).__name__}: {e}"[:200]))
        spark.catalog.clearCache()
        if (i + 1) % 25 == 0:
            spark.sparkContext._jvm.System.gc()
            print(f"SWEEP {i + 1}/{len(qs)} {time.time() - t0:.0f}s", flush=True)
    status = "GREEN" if not failures else f"FAILURES {failures}"
    print(
        f"SWEEP DONE {len(qs)} queries in {time.time() - t0:.0f}s: {status}",
        flush=True,
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
