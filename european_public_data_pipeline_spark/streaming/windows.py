"""Structured Streaming surface (SURVEY.md §2.11).

The reference is batch-only; its incremental model is "re-run on the latest
blob" (/root/reference/src/storage/blob.py:55-60). The Spark-native
incremental model is Structured Streaming: the SAME DataFrame expressions
run under ``readStream``/``writeStream`` with checkpointed state — so every
transform below is written against a plain DataFrame and works identically
in batch and streaming mode (that equivalence is what tests/test_streaming.py
asserts, and registered queries q22/q23 oracle-check the batch side).

Operators:
- ``tumbling_agg`` / ``sliding_agg``: event-time window aggregation.
- ``session_agg``: gap-based session windows (``F.session_window``).
- ``dedup_stream``: exactly-once event dedup within the watermark horizon.
- ``read_events_stream``: file-source stream over the events layout.

Scale notes (streaming at production volume):
- Watermarks bound state: an aggregation without ``withWatermark`` grows
  state forever; every streaming entry point here takes a watermark.
- State lives in the state store keyed by (group, window); shuffle is on
  the group key exactly as in batch — partitioning strategy carries over.
- ``Trigger.AvailableNow`` gives the reference's "process what's there,
  then stop" batch-increment mode with streaming exactly-once bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source stream over an events directory (the streaming analog of
    the reference's poll-the-latest-blob loop, with exactly-once tracking)."""
    return spark.readStream.format(fmt).schema(EVENTS_SCHEMA).load(path)


def tumbling_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows: count + sum(value) per (window, type)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "3 hours",
) -> DataFrame:
    """Sliding (overlapping) event-time windows per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def session_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user: a session closes after ``gap``
    of inactivity (the stateful generalization of q19's lag trick)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once event dedup by event_id within the watermark horizon —
    the streaming form of exact dedup (state is bounded by the watermark)."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id", "ts"])


def dedup_stream_within_watermark(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Key-only stream dedup with watermark-bounded state
    (``dropDuplicatesWithinWatermark``): unlike ``dropDuplicates``, the
    event-time column is NOT part of the key, so a replayed event whose
    timestamp drifted (retry with a re-stamped ts, at-least-once source
    re-delivery) still collapses onto the original as long as both fall
    inside the watermark horizon — the semantics a production exactly-once
    ingest actually needs. State per key is evicted once the watermark
    passes it, so memory is bounded by the horizon, not the stream.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream(
    events: DataFrame, customers: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Stream-static enrichment: decorate each event with its customer
    dimension row via a broadcast hash join on the key. The static side is
    re-read per micro-batch (so slowly-changing dims pick up updates), the
    join is stateless — no watermark-bounded buffering, append-mode safe —
    and the broadcast keeps the stream side shuffle-free, exactly the plan
    wanted at production volume where the stream is huge and the dim small.
    Works identically on batch DataFrames.
    """
    return (
        events.withWatermark("ts", watermark)
        .join(
            F.broadcast(customers),
            events["user_id"] == customers["c_custkey"],
            "left",
        )
        .select(
            "event_id",
            "ts",
            "user_id",
            "event_type",
            "value",
            "c_name",
            "c_nationkey",
            "c_mktsegment",
        )
    )


def interval_join(
    views: DataFrame,
    purchases: DataFrame,
    max_gap: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each view matched to purchases by the same
    user within ``max_gap`` AFTER the view. Watermarks on both sides bound
    the join state (without them a stream-stream join buffers forever);
    the time-interval condition lets Spark evict state as the watermark
    advances. Works identically on batch DataFrames.
    """
    v = views.withWatermark("ts", watermark).select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_gap}")),
    ).select("view_id", "user_id", "view_ts", "purchase_id", "purchase_ts", "purchase_value")


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame over all currently-available input
    (Trigger.AvailableNow) into an in-memory table; returns the result as a
    batch DataFrame. Test/driver helper — production would writeStream to a
    real sink with a checkpoint location. ``output_mode``: "complete" for
    aggregations, "append" for watermarked/stateless streams."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def ohlc_agg(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming OHLC bars: per (window, event_type), open/close via
    ``min_by``/``max_by`` on the (ts, event_id) struct — ordered first/last
    as a DECLARATIVE aggregate, which (unlike row_number) is legal inside a
    streaming groupBy: state per group is one candidate row, merged
    associatively across micro-batches. The batch-registered q62 computes
    the same bars with the two-row_number construction; the stream-equals-
    batch test pins the two constructions to each other."""
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("volume"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n",
            "volume",
        )
    )
