"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); production is a multi-executor
cluster. Every knob below is chosen so the same code runs unchanged at both
scales:

- AQE on: runtime partition coalescing, skew-join splitting, and dynamic
  join-strategy switching replace hand-tuned plans at 100 TB.
- ``spark.sql.shuffle.partitions`` defaults to ~cores locally; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant as long
  as it is high enough, so we only pin it down for local determinism.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle and are stable across machines.
- Arrow enabled: every pandas interchange (createDataFrame, toPandas,
  pandas UDFs) goes through columnar batches instead of pickled rows.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "european_public_data_pipeline_spark"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-ready defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``) when
    no cluster master is configured; on a real deployment the master comes
    from spark-submit and this argument stays ``None``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # Local mode runs executors inside the driver JVM; the 1g default heap
    # is far below this class of box and OOMs long before the CPUs are the
    # bottleneck. Only effective for the session that starts the JVM —
    # cluster deployments take memory from spark-submit as usual.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The generated-code cache defaults to 100 classes; a session that
        # cycles through this engine's full query surface holds far more
        # distinct codegen units, so the default thrashes and every re-plan
        # pays Janino compilation again (~0.1-1s per query). Sized for the
        # whole registered surface; memory cost is a few MB of classes.
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        # Parquet INT64 TIMESTAMP(NANOS) is not a legal Spark type; read the
        # raw nanos as LongType and convert at the source (tables.py). The
        # ns->µs conversion TRUNCATES (the synthetic events data is not
        # µs-aligned); oracles must truncate identically.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_MASTER" not in os.environ:
        builder = builder.master(f"local[{cpus}]")
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(n_shuffle))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
