"""Streaming-operator parity queries — the BATCH twins of the streaming
aggregations (same expressions, batch execution), oracle-checked against
DuckDB; stream==batch equality is asserted in tests/test_streaming.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lakehouse_architecture_for_realestatedata_spark.queries import _events, register
from lakehouse_architecture_for_realestatedata_spark.streaming.ingest import sessionize, windowed_counts


@register(
    "tumbling_window_agg",
    """
    SELECT time_bucket(INTERVAL '6 hours', cast(ts as timestamp)) AS window_start,
           event_type,
           count(*) AS n_events,
           cast(sum(cast(value as decimal(30,2))) as double) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 6h window count+sum per event_type — batch twin of the "
    "watermarked streaming aggregation (streaming/ingest.py:windowed_counts).",
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_counts(_events(spark, sf_dir), streaming=False)


@register(
    "sliding_window_agg",
    """
    WITH e AS (
        SELECT event_type, cast(ts as timestamp) AS ts, value FROM events
    ), w AS (
        -- 6h windows sliding every 3h: each event lands in exactly 2 windows,
        -- starts on the epoch-aligned 3h grid (Spark's window() alignment)
        SELECT event_type, value,
               time_bucket(INTERVAL '3 hours', ts) - i * INTERVAL '3 hours' AS window_start
        FROM e CROSS JOIN (SELECT unnest([0, 1]) AS i)
    )
    SELECT window_start, event_type,
           count(*) AS n_events,
           cast(sum(cast(value as decimal(30,2))) as double) AS sum_value
    FROM w GROUP BY 1, 2
    """,
    doc="Sliding 6h/3h hopping-window count+sum per event_type — batch twin "
    "of the watermarked sliding streaming aggregation; the oracle expands "
    "each event into its 2 covering windows explicitly.",
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windowed_counts(_events(spark, sf_dir), streaming=False, slide="3 hours")


@register(
    "session_windows",
    """
    WITH e AS (
        SELECT user_id, cast(ts as timestamp) AS ts, value FROM events
    ), flagged AS (
        SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                       THEN 1 ELSE 0 END AS new_sess
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           count(*) AS n_events,
           cast(sum(cast(value as decimal(30,2))) as double) AS sum_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="Gap-based sessionization (30 min) per user — session_window batch "
    "twin; the DuckDB oracle builds sessions with the lag/cumsum construction.",
)
def q_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_events(spark, sf_dir), streaming=False)
