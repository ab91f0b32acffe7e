"""Small-files compaction for partitioned parquet tables.

Streaming sinks, incremental merges, and SCD batches all accrete small
files (every micro-batch/update writes at least one file per touched
partition); at scale the file count — not the byte count — becomes the
bottleneck (driver-side listing, task-per-file scheduling, open-file
overhead). ``compact_partitions`` rewrites each partition's many small
files into ``ceil(bytes / target_file_bytes)`` files.

Shape: per-partition byte sizes come from one filesystem listing (Hadoop
FS API — works on any supported storage); each partition is rewritten
independently with ``repartition(n)`` under dynamic partition overwrite,
so untouched partitions are never opened and a failure mid-compaction
leaves every other partition intact (per-partition atomicity, the same
guarantee the write path already relies on). Data content is unchanged —
compaction is pure physical-layout maintenance.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def partition_file_stats(
    spark: SparkSession, path: str
) -> dict[str, tuple[int, int]]:
    """{partition_dir: (n_files, total_bytes)} from one FS listing."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(jsc.hadoopConfiguration())
    stats: dict[str, tuple[int, int]] = {}
    for part in fs.listStatus(root):
        if not part.isDirectory():
            continue
        name = part.getPath().getName()
        if "=" not in name:
            continue
        n = 0
        total = 0
        for f in fs.listStatus(part.getPath()):
            if f.getPath().getName().endswith(".parquet"):
                n += 1
                total += f.getLen()
        stats[name] = (n, total)
    return stats


def compact_partitions(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
) -> dict[str, int]:
    """Rewrite fragmented partitions; returns {partition_dir: new_n_files}.

    Only partitions with more than ``min_files_to_compact`` files AND more
    files than their byte size warrants are rewritten.
    """
    stats = partition_file_stats(spark, path)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    rewritten: dict[str, int] = {}
    try:
        for part_dir, (n_files, total_bytes) in stats.items():
            want = max(1, math.ceil(total_bytes / target_file_bytes))
            if n_files <= max(want, min_files_to_compact - 1):
                continue
            col, val = part_dir.split("=", 1)
            part_df = spark.read.parquet(path).filter(F.col(col) == val)
            out = part_df.repartition(want).localCheckpoint(eager=True)
            out.write.partitionBy(col).mode("overwrite").parquet(path)
            rewritten[part_dir] = want
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return rewritten
