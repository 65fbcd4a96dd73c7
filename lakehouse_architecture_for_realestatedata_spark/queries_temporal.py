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
from lakehouse_architecture_for_realestatedata_spark.operators.temporal import (
    resample_locf,
    scd2_history,
)
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


@register(
    "resample_locf_daily",
    """
    WITH grid AS (
        SELECT user_id, date_trunc('day', ts) AS bucket,
               cast(sum(cast(value AS decimal(30,6))) AS double) AS observed
        FROM events GROUP BY 1, 2
    ), span AS (
        SELECT user_id, min(bucket) AS mn, max(bucket) AS mx FROM grid GROUP BY 1
    ), spine AS (
        SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS bucket
        FROM span
    )
    SELECT s.user_id, s.bucket, g.observed,
           last_value(g.observed IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM spine s LEFT JOIN grid g
      ON s.user_id = g.user_id AND s.bucket = g.bucket
    """,
    doc="Gap-fill/resample: dense daily series per user between each user's "
    "first and last event day, daily value sums forward-filled across gap "
    "days (LOCF). Spine is sequence()+explode over per-key spans — "
    "distributed, proportional to output, no calendar cross join; sums go "
    "through decimal for cross-engine bit-identity (operators/temporal.py).",
)
def q_resample_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return resample_locf(ev, key="user_id", ts="ts", value="value", step="day")


@register(
    "resample_locf_weekly_global",
    """
    WITH grid AS (
        SELECT user_id, date_trunc('week', ts) AS bucket,
               cast(sum(cast(value AS decimal(30,6))) AS double) AS observed
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT min(bucket) AS mn, max(bucket) AS mx FROM grid
    ), spine AS (
        SELECT k.user_id, unnest(generate_series(mn, mx, INTERVAL 7 DAY)) AS bucket
        FROM (SELECT DISTINCT user_id FROM grid) k CROSS JOIN bounds
    )
    SELECT s.user_id, s.bucket, g.observed,
           last_value(g.observed IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM spine s LEFT JOIN grid g
      ON s.user_id = g.user_id AND s.bucket = g.bucket
    """,
    doc="Weekly LOCF resample with align='global': every user shares the "
    "identical corpus-wide Monday-aligned week spine (charting matrices, "
    "join-on-spine). Pins the week-grid origin fix — date_trunc('week') is "
    "Monday-aligned (epoch+345600s), so the spine indexes steps relative to "
    "that origin, not floor(epoch/604800) which lands on Thursdays "
    "(operators/temporal.py:resample_locf). Both engines truncate weeks to "
    "Monday (ISO).",
)
def q_resample_locf_weekly_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return resample_locf(
        ev, key="user_id", ts="ts", value="value", step="week", align="global"
    )


@register(
    "scd2_user_event_history",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER w AS prev_type,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
        SELECT user_id, ts, event_id, event_type FROM ordered
        WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts)  OVER w2 AS valid_to,
           (lead(ts) OVER w2 IS NULL) AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="SCD Type-2 history build: each user's event_type change log "
    "collapsed to minimal validity intervals (valid_from inclusive, "
    "valid_to exclusive, NULL while current) — the temporal twin of the "
    "medallion SCD-current model (plans/medallion.py:326; reference "
    "scripts/transform_silver.py latest-wins dedup). Two windows over one "
    "Exchange (operators/temporal.py:scd2_history).",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    hist = scd2_history(
        ev, key="user_id", ts="ts", tracked=["event_type"], tiebreak=[F.col("event_id").asc()]
    )
    return hist.select("user_id", "event_type", "valid_from", "valid_to", "is_current")


@register(
    "scd2_point_in_time_purchases",
    """
    WITH ordered AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER w AS prev_type,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
        SELECT user_id, ts, event_id, event_type FROM ordered
        WHERE rn = 1 OR prev_type IS DISTINCT FROM event_type
    ), hist AS (
        SELECT user_id, event_type, ts AS valid_from, lead(ts) OVER w2 AS valid_to
        FROM changes
        WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), f AS (
        SELECT user_id, event_id, ts, value FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
    )
    SELECT f.user_id, f.event_id, f.ts, f.value,
           h.valid_from AS pit_valid_from, h.event_type AS pit_event_type
    FROM f LEFT JOIN hist h
      ON f.user_id = h.user_id
     AND h.valid_from <= f.ts
     AND (h.valid_to IS NULL OR f.ts < h.valid_to)
    """,
    doc="Point-in-time lookup of each purchase's SCD2 state version "
    "(operators/temporal.py:scd2_pit_join over scd2_history): equi-join on "
    "the key with the half-open interval predicate as a post-join filter — "
    "one shuffle per side, AQE broadcasts the (small) history side; "
    "interval partitioning guarantees a unique match. The composition "
    "pins history-build + PIT-lookup end-to-end against one SQL oracle.",
)
def q_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.temporal import scd2_pit_join

    ev = _events(spark, sf_dir)
    hist = scd2_history(
        ev.select("user_id", "ts", "event_id", "event_type"),
        key="user_id",
        ts="ts",
        tracked=["event_type"],
        tiebreak=[F.col("event_id").asc()],
    )
    facts = ev.filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    ).select("user_id", "event_id", "ts", "value")
    return scd2_pit_join(
        facts, hist, key="user_id", ts="ts", payload=["event_type"]
    ).select("user_id", "event_id", "ts", "value", "pit_valid_from", "pit_event_type")


@register(
    "asof_forward_next_purchase",
    """
    WITH p0 AS (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ), p AS (
        SELECT user_id, ts, event_id, value FROM p0 WHERE rn = 1
    ), c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS matched_ts,
           p.event_id AS matched_event_id,
           p.value AS matched_value
    FROM c ASOF LEFT JOIN p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
    doc="FORWARD as-of join (operators/asof.py asof_join "
    "direction='forward'): each click paired with the user's EARLIEST "
    "at-or-after purchase — the next-fulfillment/response-time shape. Same "
    "one-exchange union + per-key window carry as backward, with the "
    "order flag flipped so equal-timestamp rights stay inclusive. Oracle "
    "is DuckDB's native forward ASOF (p.ts >= c.ts).",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = dedup_latest(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        ),
        ["user_id", "ts"],
        [F.col("event_id").desc()],
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        clicks,
        purchases.withColumnRenamed("event_id", "p_event_id"),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["p_event_id", "value"],
        direction="forward",
    ).select(
        "event_id",
        "user_id",
        "ts",
        "matched_ts",
        F.col("matched_p_event_id").alias("matched_event_id"),
        F.col("matched_value").alias("matched_value"),
    )


@register(
    "asof_nearest_click_anchor",
    """
    WITH c AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), p0 AS (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase'
    ), p AS (
        SELECT user_id, ts, event_id, value FROM p0 WHERE rn = 1
    ), b AS (
        SELECT c.event_id, p.ts AS mts, p.event_id AS mid, p.value AS mv
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
    ), f AS (
        SELECT c.event_id, p.ts AS mts, p.event_id AS mid, p.value AS mv
        FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts
    )
    SELECT c.event_id, c.user_id, c.ts,
           CASE WHEN pick_f THEN f.mts ELSE b.mts END AS matched_ts,
           CASE WHEN pick_f THEN f.mid ELSE b.mid END AS matched_event_id,
           CASE WHEN pick_f THEN f.mv  ELSE b.mv  END AS matched_value
    FROM c
    LEFT JOIN b ON c.event_id = b.event_id
    LEFT JOIN f ON c.event_id = f.event_id
    CROSS JOIN LATERAL (
        -- forward wins only when strictly closer in truncated-second space
        -- (ties go backward, matching the operator's pandas convention);
        -- a NULL backward match defers to forward
        SELECT b.mts IS NULL OR (
                   f.mts IS NOT NULL
                   AND epoch(date_trunc('second', f.mts))::bigint
                       - epoch(date_trunc('second', c.ts))::bigint
                     < epoch(date_trunc('second', c.ts))::bigint
                       - epoch(date_trunc('second', b.mts))::bigint
               ) AS pick_f
    )
    """,
    doc="NEAREST as-of join (operators/asof.py asof_join "
    "direction='nearest'): each click anchored to its time-closest "
    "purchase in either direction, exact-distance ties going backward — "
    "both carries ride ONE hash exchange (the second window is only a "
    "local re-sort). Oracle composes DuckDB's two native ASOF directions "
    "with the same truncated-second tie rule.",
)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    purchases = dedup_latest(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "event_id", "value"
        ),
        ["user_id", "ts"],
        [F.col("event_id").desc()],
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        clicks,
        purchases.withColumnRenamed("event_id", "p_event_id"),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["p_event_id", "value"],
        direction="nearest",
    ).select(
        "event_id",
        "user_id",
        "ts",
        "matched_ts",
        F.col("matched_p_event_id").alias("matched_event_id"),
        F.col("matched_value").alias("matched_value"),
    )
