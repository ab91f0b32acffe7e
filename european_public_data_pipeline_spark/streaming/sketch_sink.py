"""Streaming sketch maintenance: keep a Count-Min sketch current over a
stream by writing per-micro-batch cell relations and re-aggregating on
read — the streaming face of q83's mergeability audit.

Because CMS cells are additive, each micro-batch contributes an
independent d*w-cell relation (constant-size, computed inside the batch
with map-side combine) appended under its batch id; the live sketch is
`SUM(cell_count) GROUP BY (hash_id, bucket)` over everything written so
far. No state store is needed, restarts are safe (append + checkpoint
gives exactly-once per batch id), and the merged sketch is BIT-IDENTICAL
to the one-pass batch sketch over the same rows — asserted by
`tests/test_streaming.py::test_streaming_cms_equals_batch`.

At scale this is the pattern for daily/hourly sketch rollups: per-window
sketches land as tiny cell files; any time range's sketch is one
re-aggregation of constant-size inputs, never a rescan of the raw stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.operators.sketches import cms_cells


def cms_stream_sink(
    stream_df: DataFrame, key: str, out_dir: str, checkpoint_dir: str
):
    """Start an AvailableNow stream that lands one CMS cell relation per
    micro-batch under ``out_dir``; returns the StreamingQuery."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            cms_cells(batch_df.select(key), key)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def merged_cms(spark: SparkSession, out_dir: str) -> DataFrame:
    """The live sketch: re-aggregate every landed micro-batch cell file."""
    return (
        spark.read.parquet(out_dir)
        .groupBy("hash_id", "bucket")
        .agg(F.sum("cell_count").alias("cell_count"))
    )
