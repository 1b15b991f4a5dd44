"""Event-time analytics over the `events` table (SURVEY.md §2i gap).

The reference has no streaming; its closest analogs are incremental
checkpoints and append loads.  These queries give the event-time surface
in batch form (every one oracle-checkable); the true Structured Streaming
versions of the same computations live in
`dffoo_data_pipeline_spark/streaming/` and are covered by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dffoo_data_pipeline_spark.functions import numeric as N
from dffoo_data_pipeline_spark.sources.readers import load_table

QUERIES: dict = {}
ORACLES: dict = {}

SESSION_GAP_SECONDS = 1800


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_register(
    "events_tumbling_hourly",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (batch form of the streaming
    tumbling window; identical grouping semantics to F.window(ts, '1 hour')).

    Scale: shuffle key is (hour, type) — naturally high-cardinality over
    time, so no hot partitions; in streaming form state is bounded by the
    watermark.
    """
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(N.dec2("value")).cast("double").alias("total_value"),
    )


@_register(
    "events_sliding_window",
    """
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) - INTERVAL 30 MINUTE AS lo,
               MAX(ts) + INTERVAL 1 MICROSECOND AS hi
        FROM events
    ),
    grid AS (
        SELECT unnest(range(lo, hi, INTERVAL 30 MINUTE)) AS window_start FROM bounds
    )
    SELECT g.window_start,
           g.window_start + INTERVAL 1 HOUR AS window_end,
           COUNT(*) AS n_events
    FROM events e
    JOIN grid g ON e.ts >= g.window_start AND e.ts < g.window_start + INTERVAL 1 HOUR
    GROUP BY g.window_start
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h length, 30m slide) via F.window — each event lands
    in 2 overlapping windows; Spark expands them without a self-join."""
    e = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
        )
    )


_SESSION_SQL = f"""
WITH ordered AS (
    SELECT user_id, ts, value, event_id,
           CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR date_diff('microsecond', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
                        > {SESSION_GAP_SECONDS} * 1000000
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT user_id, ts, value,
           CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_no
    FROM ordered
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
FROM sessions GROUP BY user_id, session_no
"""


@_register("events_sessionization", _SESSION_SQL)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) as a window
    cumulative-sum — the batch equivalent of F.session_window.

    Scale: one shuffle on user_id; the cumulative sum is a streaming-order
    scan within each key — no self-join, no range explosion.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    ordered = e.select(
        "user_id",
        "ts",
        "value",
        F.when(gap.isNull() | (gap > SESSION_GAP_SECONDS * 1_000_000), 1)
        .otherwise(0)
        .alias("new_session"),
        "event_id",
    )
    # event_id tiebreak: two events at the same microsecond (ns timestamps
    # are truncated) must accumulate in the same order the lag() above saw
    wsum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = ordered.withColumn("session_no", F.sum("new_session").over(wsum))
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(N.dec2("value")).cast("double").alias("session_value"),
    )
