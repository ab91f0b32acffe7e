"""Batch registrations of the streaming window operators (SURVEY.md §2.11).

q22/q23 run the SAME functions from streaming/windows.py on the batch
``events`` table — Structured Streaming's batch/stream unification means
one definition serves both modes; the DuckDB oracles check the batch side
(session windows via the lag/cumsum island construction, sliding windows
via explicit window-offset expansion), and tests/test_streaming.py checks
the streaming side equals the batch side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
WITH e AS (
  -- µs-truncate: the raw parquet is TIMESTAMP(NANOS); Spark reads µs, so gap
  -- arithmetic and session bounds must be computed at µs precision here too.
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
),
o AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM e
),
s AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
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
  SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) - (k * INTERVAL 1 HOUR) AS TIMESTAMP)
           AS window_start, event_type
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
SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id, e.event_type, e.value,
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


@register(
    "q45_funnel_conversion",
    category="event-analytics",
    doc="View-to-purchase funnel: per user, the first view and the first "
    "purchase strictly after it, with the conversion lag — one grouped "
    "min per event type and a conditional min for the ordered step "
    "(min(purchase_ts where ts > first_view)), i.e. two aggregation "
    "passes on the user key with no self-join: the fact table is "
    "scanned once, shuffled once on user_id. The classic product-"
    "analytics funnel, expressed so it scales linearly.",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS first_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(CAST(e.ts AS TIMESTAMP)) AS first_purchase
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > v.first_view
  GROUP BY e.user_id
)
SELECT v.user_id, v.first_view, p.first_purchase,
       CAST(date_diff('second', v.first_view, p.first_purchase) AS BIGINT)
         AS lag_seconds,
       p.first_purchase IS NOT NULL AS converted
FROM v LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id
""",
)
def q45_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(p, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_purchase",
            (F.col("first_purchase").cast("long") - F.col("first_view").cast("long")).alias(
                "lag_seconds"
            ),
            F.col("first_purchase").isNotNull().alias("converted"),
        )
        .orderBy("user_id")
    )


@register(
    "q46_retention_cohorts",
    category="event-analytics",
    doc="Weekly retention cohorts: users grouped by first-activity week, "
    "counted per subsequent activity week offset — the standard cohort "
    "triangle. Shape: one aggregate for cohort assignment (one row per "
    "user), joined back onto the distinct (user, week) activity pairs, "
    "final rollup on (cohort_week, offset). Both join inputs derive from "
    "the same events scan shuffled on user_id, so the join reuses that "
    "partitioning; the side is user-cardinality, so the join strategy is "
    "left to AQE (broadcast at test scale, sort-merge at 100 TB) rather "
    "than forced.",
    oracle="""
WITH first_week AS (
  SELECT user_id, CAST(date_trunc('week', MIN(CAST(ts AS TIMESTAMP))) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS activity_week
  FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('week', f.cohort_week, a.activity_week) AS BIGINT)
         AS week_offset,
       COUNT(*) AS n_users
FROM activity a JOIN first_week f ON a.user_id = f.user_id
GROUP BY f.cohort_week, week_offset
ORDER BY f.cohort_week, week_offset
""",
)
def q46_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first_week = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("activity_week")
    ).distinct()
    return (
        activity.join(first_week, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.col("activity_week"), F.col("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q55_sliding_mau",
    category="event-analytics",
    doc="Exact trailing-7-day active users per day (sliding MAU): COUNT("
    "DISTINCT) over a sliding window is not a window function anywhere — "
    "the scalable exact form dedups to (day, user) pairs FIRST (day-x-user "
    "cardinality, tiny vs the fact table), fans each pair out to the <= 7 "
    "window-end days it covers, and runs one distinct aggregation per "
    "target day. Fan-out is a row-local generate; the only shuffles move "
    "pair-cardinality rows. The approximate alternative (mergeable HLL "
    "per day) trades this for sketch unions — q25 covers that surface.",
    oracle="""
WITH p AS (
  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d, user_id FROM events
),
x AS (
  SELECT d + CAST(k AS INTEGER) AS target_d, user_id
  FROM p, UNNEST(generate_series(0, 6)) AS t(k)
),
m AS (SELECT MAX(d) AS maxd FROM p)
SELECT target_d AS d, COUNT(DISTINCT user_id) AS mau_7d
FROM x, m
WHERE target_d <= m.maxd
GROUP BY target_d
ORDER BY d
""",
)
def q55_sliding_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    p = events.select(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).distinct()
    maxd = p.agg(F.max("d").alias("maxd"))
    x = p.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "d", "user_id"
    ).select(F.date_add(F.col("d"), F.col("k")).alias("target_d"), "user_id")
    return (
        x.crossJoin(F.broadcast(maxd))
        .filter(F.col("target_d") <= F.col("maxd"))
        .groupBy(F.col("target_d").alias("d"))
        .agg(F.countDistinct("user_id").alias("mau_7d"))
        .orderBy("d")
    )


@register(
    "q62_hourly_ohlc_bars",
    category="time-window",
    doc="OHLC resampling: per (event_type, hour) bars with open/close "
    "(first/last value by (ts, event_id) — event_id breaks µs timestamp "
    "ties deterministically), high/low, event count, and an exact-decimal "
    "volume sum. The time-series downsampling shape every metrics store "
    "runs. One shuffle on the (type, hour) grain; the two row_number "
    "window passes share that partitioning (partition size = events per "
    "type-hour, bounded by the grain, never corpus-wide), and the final "
    "aggregate is on the same keys — Catalyst plans a single exchange.",
    oracle="""
WITH e AS (
  SELECT event_type, CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS hour,
         CAST(ts AS TIMESTAMP) AS ts, event_id, value
  FROM events
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, hour ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, hour ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT event_type, hour,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
FROM r
GROUP BY event_type, hour
ORDER BY event_type, hour
""",
)
def q62_hourly_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from european_public_data_pipeline_spark.functions.exact import dsum

    events = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts",
        "event_id",
        "value",
    )
    wa = Window.partitionBy("event_type", "hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "hour").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn_a", F.row_number().over(wa))
        .withColumn("rn_d", F.row_number().over(wd))
        .groupBy("event_type", "hour")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
            dsum("value").alias("volume"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "q66_user_running_totals",
    category="time-window",
    doc="Per-user cumulative event totals over event time — the batch "
    "twin of streaming/stateful.py's applyInPandasWithState running-"
    "totals operator: each event row carries the user's running count "
    "and exact-decimal running value sum as of that event ((ts, "
    "event_id) ordering, the trajectory the stateful operator emits "
    "across micro-batches). One user-keyed window; partition size = "
    "events per user, bounded by the entity grain, never corpus-wide. "
    "The cumulative sum accumulates DECIMAL so every prefix is exact "
    "and partition-order invariant (a double cumsum would drift).",
    oracle="""
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
       CAST(COUNT(*) OVER w AS BIGINT) AS running_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)
ORDER BY user_id, ts, event_id
""",
)
def q66_user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("running_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "running_value"
        ),
    ).orderBy("user_id", "ts", "event_id")


@register(
    "q76_longest_daily_streak",
    category="time-window",
    doc="Gaps-and-islands: each user's longest streak of CONSECUTIVE "
    "calendar days with at least one event. The classic construction — "
    "distinct (user, day), per-user row_number, island id = day minus "
    "rn days (consecutive days share it), then max island size. Two "
    "user-keyed aggregations and one user-partitioned window over "
    "distinct DAYS (entity-grain bounded, far smaller than the event "
    "relation).",
    oracle="""
WITH days AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
),
isl AS (
  SELECT user_id, d,
         d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER)
           AS island
  FROM days
),
runs AS (
  SELECT user_id, island, COUNT(*) AS run_len FROM isl GROUP BY user_id, island
)
SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_streak
FROM runs
GROUP BY user_id
ORDER BY user_id
""",
)
def q76_longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = days.withColumn(
        "island", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    runs = isl.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("run_len"))
    return (
        runs.groupBy("user_id")
        .agg(F.max("run_len").alias("longest_streak"))
        .orderBy("user_id")
    )


@register(
    "q77_event_transition_matrix",
    category="time-window",
    doc="First-order event-type transition counts (the Markov-chain "
    "estimate of user behavior): per user, each event's successor type "
    "via lag over (ts, event_id), then corpus-wide (from, to) counts "
    "and row-normalized transition shares. One user-partitioned window "
    "pass (entity-grain bounded) + one type-pair aggregate (25 cells). "
    "The share is a single division of exact counts — hash-stable.",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
cm AS (
  SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT from_type, SUM(n) AS row_total FROM cm GROUP BY from_type)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) / t.row_total AS share
FROM cm c JOIN tot t ON t.from_type = c.from_type
ORDER BY c.from_type, c.to_type
""",
)
def q77_event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    cm = seq.groupBy(
        F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cm.groupBy("from_type").agg(F.sum("n").alias("row_total"))
    return (
        cm.join(F.broadcast(tot), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.col("n").cast("double") / F.col("row_total")).alias("share"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "q88_rolling_median",
    category="window",
    doc="Per-user rolling median (last-7-events frame) of purchase values "
    "— windowed ORDER STATISTICS, the robust moving smoother that mean-"
    "based rolling frames (q09/q39) cannot give: one spike drags a "
    "rolling mean for 7 rows but leaves the rolling median untouched. "
    "Shape: one user-keyed shuffle (high-cardinality partition key — no "
    "skew), collect_list over a ROWS 6 PRECEDING frame, then the median "
    "is a row-local sort of a <=7-element array and the same "
    "(a[r1]+a[r2])/2 middle-rank arithmetic as q87, bit-equal to the "
    "identical list construction in DuckDB (no engine median() in the "
    "loop on either side). Frame state is bounded by the frame width, "
    "never partition size — unchanged at 100 TB.",
    oracle="""
WITH p AS (
  SELECT user_id, event_id, ts, value
  FROM events WHERE event_type = 'purchase'
),
fr AS (
  SELECT user_id, event_id, value,
         list_sort(list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS w
  FROM p
)
SELECT user_id, event_id, value,
       (w[(len(w) + 1) // 2] + w[(len(w) + 2) // 2]) / 2 AS rolling_median
FROM fr
ORDER BY user_id, event_id
""",
)
def q88_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    r1 = ((n + 1) / 2).cast("int")
    r2 = ((n + 2) / 2).cast("int")
    med = (F.element_at(arr, r1) + F.element_at(arr, r2)) / 2
    return (
        p.select(
            "user_id",
            "event_id",
            "value",
            med.alias("rolling_median"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q89_twap",
    category="window",
    doc="Per-user time-weighted average value (TWAP) — the correct "
    "aggregate for IRREGULARLY-sampled signals (sensor readings, "
    "prices), where a plain AVG over-weights chatty periods: each "
    "reading is held until the next one, so its weight is the gap to "
    "the next event. Shape: one user-keyed shuffle, lead() for the "
    "hold duration, then a combinable aggregate — no arrays, no "
    "re-scan. Determinism: durations are exact epoch-microsecond "
    "BIGINTs (unix_micros == epoch_us), values are exact centi-units "
    "(2-decimal money-style doubles, round(v*100) identical in both "
    "engines), and the value x duration dot product accumulates as "
    "DECIMAL(38,0) — partition-order invariant, hash-exact. The final "
    "TWAP is one identical double division. At 100 TB the partition "
    "key is user_id (cardinality grows with data), per-row state is "
    "O(1) — the canonical embarrassingly-scalable window shape.",
    oracle="""
WITH seq AS (
  SELECT user_id,
         CAST(round(value * 100) AS BIGINT) AS v_c,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch_us(ts) AS w_us
  FROM events
),
agg AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(w_us) AS BIGINT) AS held_us,
         SUM(CAST(v_c * w_us AS DECIMAL(38,0))) AS vw
  FROM seq WHERE w_us IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_events, held_us,
       CAST(vw AS DOUBLE) / CAST(held_us AS DOUBLE) / 100.0 AS twap
FROM agg
WHERE held_us > 0
ORDER BY user_id
""",
)
def q89_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("v_c"),
        (
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("w_us"),
    ).filter(F.col("w_us").isNotNull())
    agg = seq.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("w_us").alias("held_us"),
        F.sum((F.col("v_c") * F.col("w_us")).cast("decimal(38,0)")).alias("vw"),
    )
    return (
        agg.filter(F.col("held_us") > 0)
        .select(
            "user_id",
            "n_events",
            "held_us",
            (
                F.col("vw").cast("double") / F.col("held_us").cast("double") / 100.0
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


@register(
    "q93_conversion_latency",
    category="window",
    doc="View-to-purchase conversion latency distribution — the funnel "
    "TIMING report that q45's conversion counts lack: each purchase is "
    "paired with the user's most recent preceding view via one ordered "
    "window (MAX of the monotone view timestamp over the preceding "
    "frame IS the most recent — no self-join, no per-row scan-back), "
    "then latencies land in power-of-two second buckets. Bucketing is "
    "length(bin(x)) — the binary-representation length equals "
    "floor(log2)+1 as EXACT integer arithmetic, dodging the "
    "floor(log2(double)) boundary-ulp hazard entirely. Everything "
    "after the one user-keyed shuffle is a bucket-cardinality "
    "aggregate of exact integers. The same shape prices any "
    "time-to-event analysis (signup->first-purchase, error->recovery).",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_us
  FROM events
),
lat AS (
  SELECT (ts_us - prev_view_us) // 1000000 AS lat_s
  FROM seq
  WHERE event_type = 'purchase' AND prev_view_us IS NOT NULL
)
SELECT CAST(length(bin(lat_s + 1)) AS INTEGER) AS bucket_log2,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(MIN(lat_s) AS BIGINT) AS min_lat_s,
       CAST(MAX(lat_s) AS BIGINT) AS max_lat_s,
       CAST(SUM(lat_s) AS BIGINT) AS sum_lat_s
FROM lat
GROUP BY 1
ORDER BY bucket_log2
""",
)
def q93_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_us = F.unix_micros("ts")
    seq = events.select(
        "event_type",
        ts_us.alias("ts_us"),
        F.max(F.when(F.col("event_type") == "view", ts_us)).over(w).alias(
            "prev_view_us"
        ),
    )
    lat = (
        seq.filter(
            (F.col("event_type") == "purchase") & F.col("prev_view_us").isNotNull()
        )
        .select(
            ((F.col("ts_us") - F.col("prev_view_us")) / 1000000)
            .cast("long")
            .alias("lat_s")
        )
    )
    return (
        lat.groupBy(
            F.length(F.bin(F.col("lat_s") + 1)).cast("int").alias("bucket_log2")
        )
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.min("lat_s").alias("min_lat_s"),
            F.max("lat_s").alias("max_lat_s"),
            F.sum("lat_s").alias("sum_lat_s"),
        )
        .orderBy("bucket_log2")
    )


@register(
    "q94_cohort_ltv",
    category="window",
    doc="Cohort lifetime-value curves — the revenue-weighted twin of "
    "q46's retention triangle: users are cohorted by first-seen week, "
    "purchase revenue lands in (cohort, week-offset) cells, and each "
    "cohort's curve is the CUMULATIVE revenue per cohort member by "
    "age. Shape: two user-keyed aggregates (first-seen, cohort sizes) "
    "+ one (cohort, offset) cell aggregate in exact centi-units; the "
    "cumulative prefix runs ROW-LOCALLY over each cohort's collected "
    "offset array (q85's fold pattern — offsets are calendar-bounded, "
    "never fact-sized, and no partition-less window exists). "
    "cum_cents stays an exact integer fold; LTV-per-user is one final "
    "double division per cell.",
    oracle="""
WITH first_week AS (
  SELECT user_id,
         CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
  FROM first_week GROUP BY cohort_week
),
cells AS (
  SELECT f.cohort_week,
         CAST(date_diff('week', f.cohort_week,
                        CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT)
           AS week_offset,
         CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events e
  JOIN first_week f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_week, week_offset,
         SUM(cents) OVER (PARTITION BY cohort_week ORDER BY week_offset) AS cum_cents
  FROM cells
)
SELECT c.cohort_week, c.week_offset,
       CAST(c.cum_cents AS BIGINT) AS cum_cents,
       s.cohort_size,
       CAST(c.cum_cents AS DOUBLE) / 100.0 / CAST(s.cohort_size AS DOUBLE)
         AS ltv_per_user
FROM cum c JOIN sizes s USING (cohort_week)
ORDER BY c.cohort_week, c.week_offset
""",
)
def q94_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first_week = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    sizes = first_week.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    cells = (
        events.filter(F.col("event_type") == "purchase")
        .join(first_week, "user_id")
        .groupBy(
            "cohort_week",
            F.datediff(
                F.date_trunc("week", "ts").cast("date"), F.col("cohort_week")
            ).cast("long")
            .alias("days"),
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        .select(
            "cohort_week", (F.col("days") / 7).cast("long").alias("week_offset"), "cents"
        )
    )
    # Cumulative per cohort WITHOUT a window: collect each cohort's
    # calendar-bounded (offset, cents) cells into one sorted array and fold
    # prefix sums row-locally (q85's construction).
    grouped = cells.groupBy("cohort_week").agg(
        F.array_sort(F.collect_list(F.struct("week_offset", "cents"))).alias("arr")
    )
    cums = F.transform(
        F.sequence(F.lit(1), F.size("arr")),
        lambda i: F.struct(
            F.element_at(F.col("arr"), i).week_offset.alias("week_offset"),
            F.aggregate(
                F.slice(F.col("arr"), 1, i),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x.cents,
            ).alias("cum_cents"),
        ),
    )
    rows = grouped.select("cohort_week", F.explode(cums).alias("r")).select(
        "cohort_week", "r.week_offset", "r.cum_cents"
    )
    return (
        rows.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "cum_cents",
            "cohort_size",
            (
                F.col("cum_cents").cast("double")
                / 100.0
                / F.col("cohort_size").cast("double")
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "q103_event_path_mining",
    category="window",
    doc="Sequential pattern mining lite: the 20 most common 3-step "
    "event-type paths across per-user ordered event streams — the "
    "'what do users actually do' report one level above q77's 2-gram "
    "transition matrix (3-grams expose asymmetric funnels a Markov "
    "matrix factorizes away). Shape: one user-keyed shuffle, two lead() "
    "reads inside the per-user window (ordered by the deterministic "
    "(ts, event_id) key), a path-keyed map-side-combined rollup "
    "(≤ |types|³ = 125 groups), TakeOrdered 20 — never a global sort; "
    "path cardinality, not event volume, bounds everything after the "
    "window. Tie-break on the path string keeps the cut deterministic.",
    oracle="""
SELECT path, n_occurrences FROM (
  SELECT concat_ws(' > ', event_type, t1, t2) AS path,
         CAST(COUNT(*) AS BIGINT) AS n_occurrences
  FROM (
    SELECT event_type,
           LEAD(event_type, 1) OVER w AS t1,
           LEAD(event_type, 2) OVER w AS t2
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  )
  WHERE t1 IS NOT NULL AND t2 IS NOT NULL
  GROUP BY 1
)
ORDER BY n_occurrences DESC, path
LIMIT 20
""",
)
def q103_event_path_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        events.select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("t1"),
            F.lead("event_type", 2).over(w).alias("t2"),
        )
        .filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
        .select(
            F.concat_ws(" > ", "event_type", "t1", "t2").alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("path"))
        .limit(20)
    )
