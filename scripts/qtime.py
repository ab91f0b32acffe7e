#!/usr/bin/env python
"""Per-query timing + plan capture mirroring bench.py methodology.

Usage: python scripts/qtime.py [--passes N] [--plan OUTDIR_SUFFIX] q01_pricing_summary d03_...
Times each named query through the noop sink, clearCache after every run,
min-of-N over interleaved passes. With --plan <suffix>, writes
plans/r14/<name>_<suffix>.txt explain("formatted") captures.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

p = argparse.ArgumentParser()
p.add_argument("--passes", type=int, default=3)
p.add_argument("--plan", type=str, default=None)
p.add_argument("--sf", type=str, default="/root/testdata/sf0.1")
p.add_argument("names", nargs="+")
args = p.parse_args()

from european_public_data_pipeline_spark import plans  # noqa: E402
from european_public_data_pipeline_spark.session import get_spark  # noqa: E402

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = get_spark(app_name="qtime", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
spark.sparkContext.setLogLevel("ERROR")

specs = plans.all_specs()
sel = [specs[n] for n in args.names]

for s in sel:
    s.builder(spark, args.sf).limit(1).collect()
spark.catalog.clearCache()

if args.plan:
    os.makedirs("/root/repo/plans/r14", exist_ok=True)
    import contextlib
    import io

    for s in sel:
        df = s.builder(spark, args.sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(f"/root/repo/plans/r14/{s.name}_{args.plan}.txt", "w") as f:
            f.write(buf.getvalue())
        print(f"plan written: {s.name}_{args.plan}.txt")
    spark.catalog.clearCache()

samples = {s.name: [] for s in sel}
for _ in range(args.passes):
    for s in sel:
        spark.sparkContext.setJobDescription(s.name)
        t0 = time.perf_counter()
        s.builder(spark, args.sf).write.format("noop").mode("overwrite").save()
        samples[s.name].append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)

for name, ts in samples.items():
    if ts:
        print(f"{name:34s} min {min(ts):7.3f}  all {' '.join(f'{t:.3f}' for t in ts)}")
