"""Temporal-join queries: as-of (click attribution) and binned range join —
custom operators composed from shuffle-bounded primitives
(operators/asof.py), oracle-checked against DuckDB's native ASOF JOIN and
inequality-join execution."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.asof import (
    asof_join,
    range_join_binned,
)
from lakehouse_architecture_for_realestatedata_spark.operators.dedup import dedup_latest
from lakehouse_architecture_for_realestatedata_spark.queries import _events, register


@register(
    "asof_click_attribution",
    """
    WITH c0 AS (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
    ), c AS (
        SELECT user_id, ts, event_id, value FROM c0 WHERE rn = 1
    ), p AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS matched_ts,
           c.event_id AS matched_event_id,
           c.value AS matched_value
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="As-of (backward) join: each purchase attributed to the user's "
    "latest prior click — union + per-key window carry-forward, ONE shuffle, "
    "no join node (operators/asof.py). Oracle is DuckDB's native ASOF JOIN.",
)
def q_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = dedup_latest(
        ev.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id", "value"),
        ["user_id", "ts"],
        [F.col("event_id").desc()],
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id", "value"],
    )


@register(
    "range_join_signup_windows",
    """
    WITH c AS (
        SELECT event_id AS click_id, ts FROM events WHERE event_type = 'click'
    ), s AS (
        SELECT event_id AS signup_id, ts AS start_ts,
               ts + INTERVAL '2 hours' AS end_ts
        FROM events WHERE event_type = 'signup'
    )
    SELECT click_id, signup_id, c.ts
    FROM c JOIN s ON c.ts >= s.start_ts AND c.ts < s.end_ts
    """,
    doc="Pure range join (no equi key): clicks landing inside any signup's "
    "2-hour window. Spark-side this is the BINNED rewrite — intervals "
    "explode to covering 2h bins, points hash-join on their bin, exact "
    "predicate re-checked — instead of the quadratic "
    "BroadcastNestedLoopJoin a naive BETWEEN predicate plans.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    return range_join_binned(
        clicks,
        signups,
        point_ts="ts",
        start_col="start_ts",
        end_col="end_ts",
        bin_seconds=7200,
        point_cols=["click_id"],
        interval_cols=["signup_id"],
    )
