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


def _drain_gc(spark) -> None:
    """Three-stage cleanup drain, all three stages load-bearing (found
    by heap-probing a round-10 mid-sweep OOM):

    1. PYTHON gc first — py4j proxies pin their JVM objects (plans,
       cached relations, broadcasts) in the gateway object map until
       Python finalizes them and sends detach; CPython refcounting
       misses the reference cycles query builders create, so without
       an explicit collect() the JVM side holds ~200 MB of a heavy
       iterative query (g05) long after it returned.
    2. JVM gc — clears the ContextCleaner's weak refs and enqueues
       broadcast/RDD cleanups.
    3. Sleep + second JVM gc — the cleaner drains its queue
       asynchronously; only the second collection reclaims what it
       just freed. One synchronous gc() races ahead of it.

    Measured: with this per-query drain the 1 GiB default heap holds
    ~70-110 MB through the first 100 queries; with a single gc() every
    25 it climbed to ~390 MB pinned and the report-family neighborhood
    (p04/p05) OOMed."""
    import gc as _pygc
    import time as _t

    _pygc.collect()
    spark.sparkContext._jvm.System.gc()
    _t.sleep(0.5)
    spark.sparkContext._jvm.System.gc()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        # Status-store retention bounds — the standard long-lived-driver
        # hygiene (Thrift servers set exactly these), NOT query tuning:
        # the UI's InMemoryStore retains up to 100k TaskDataWrapper rows
        # and 1000 SQL executions' full metric/plan graphs by DEFAULT,
        # which a 222-query sweep (g05 alone runs 21k tasks; the
        # manifest lifecycle rows commit dozens of jobs each) turns
        # into hundreds of MB of genuinely LIVE heap no GC can touch —
        # jmap-confirmed as the round-10 mid-sweep OOM. Heap size and
        # all query-semantics confs stay at defaults; that is the
        # guarantee this sweep exists to keep.
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "200")
        .config("spark.ui.retainedTasks", "5000")
        .config("spark.sql.ui.retainedExecutions", "50")
        # GCLocker allocation-retry hygiene (same class as the bounds
        # above, still not query tuning): a broadcast-build thread
        # allocating a large array while other threads sit in JNI
        # critical regions (py4j, native parquet IO) retries
        # GCLockerRetryAllocationCount times (default 2) and then
        # reports spurious allocation failure — observed once in a
        # round-11 sweep as "Not enough memory to build and broadcast"
        # on a heap that was ~80% free ([gc,alloc] "Retried waiting for
        # GCLocker too often"), with the same query green standalone
        # and on re-run. Raising the retry count removes the race; the
        # gc logging keeps the diagnosis one grep away next time.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UnlockDiagnosticVMOptions "
            "-XX:GCLockerRetryAllocationCount=8 -Xlog:gc+alloc=warning",
        )
        .getOrCreate()
    )
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
        _drain_gc(spark)  # per query — see _drain_gc for why all 3 stages
        if (i + 1) % 25 == 0:
            print(f"SWEEP {i + 1}/{len(qs)} {time.time() - t0:.0f}s", flush=True)
    status = "GREEN" if not failures else f"FAILURES {failures}"
    print(
        f"SWEEP DONE {len(qs)} queries in {time.time() - t0:.0f}s: {status}",
        flush=True,
    )
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
