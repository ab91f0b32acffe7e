"""Batch registrations of the streaming window operators (SURVEY.md §2.11).

q22/q23 run the SAME functions from streaming/windows.py on the batch
``events`` table — Structured Streaming's batch/stream unification means
one definition serves both modes; the DuckDB oracles check the batch side
(session windows via the lag/cumsum island construction, sliding windows
via explicit window-offset expansion), and tests/test_streaming.py checks
the streaming side equals the batch side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_public_data_pipeline_spark.plans.registry import register
from european_public_data_pipeline_spark.streaming.windows import session_agg, sliding_agg
from european_public_data_pipeline_spark.tables import load_table


@register(
    "q22_session_windows",
    category="time-window",
    bench=True,
    doc="Gap-based session windows (F.session_window, 30 min gap) per user "
    "— Spark's stateful session operator in batch mode; the oracle builds "
    "identical sessions with the lag/cumsum island construction.",
    oracle="""
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s
GROUP BY user_id, sid
ORDER BY user_id, session_start
""",
)
def q22_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return session_agg(events, gap="30 minutes").orderBy("user_id", "session_start")


@register(
    "q23_sliding_windows",
    category="time-window",
    doc="Sliding event-time windows (2 h window, 1 h slide): every event "
    "lands in two hour-aligned windows; oracle expands the window "
    "membership explicitly.",
    oracle="""
SELECT window_start, event_type, COUNT(*) AS n FROM (
  SELECT date_trunc('hour', ts) - (k * INTERVAL 1 HOUR) AS window_start, event_type
  FROM events, UNNEST([0, 1]) AS t(k)
)
GROUP BY 1, 2
ORDER BY window_start, event_type
""",
)
def q23_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return sliding_agg(events).orderBy("window_start", "event_type")


@register(
    "q43_stream_enrichment",
    category="streaming",
    doc="Stream-static enrichment join (streaming/windows.py enrich_stream) "
    "run in batch mode: every event decorated with its customer dimension "
    "row through a broadcast hash join — the stateless lookup-join pattern "
    "that keeps a production event stream shuffle-free. The streaming side "
    "is asserted equal in tests/test_streaming.py.",
    oracle="""
SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
       c.c_name, c.c_nationkey, c.c_mktsegment
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
ORDER BY e.event_id
""",
)
def q43_stream_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from european_public_data_pipeline_spark.streaming.windows import enrich_stream

    events = load_table(spark, sf_dir, "events")
    customers = load_table(spark, sf_dir, "customer")
    return enrich_stream(events, customers).orderBy("event_id")
