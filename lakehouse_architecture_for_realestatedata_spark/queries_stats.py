"""Statistical-normalization queries: per-group z-score standardization,
winsorization, and time-range rolling aggregates over the events table —
the score-hygiene steps of a curation pipeline (standardize noisy quality /
reward scores per slice, tame outliers, smooth per-user rates).

Registered AFTER the SURVEY-§2 modules (see ``queries.registry``) so they
never displace a §2 query from the driver's bounded correctness window;
their hard correctness signal is the pytest contract test plus
tools/check_oracle.py, like every other deferred query.

Oracle determinism: all three queries follow the repo's proven policies —
Σx / Σx² through exact decimal intermediates (the x² product is ONE
correctly-rounded double multiply before the cast, the same shape as
pricing_summary's price×discount), every remaining float op a fixed
sequence of correctly-rounded IEEE arithmetic spelled identically in both
engines, and NO stddev_samp/var_samp (Welford update order varies with
partitioning; see operators/aggregates.py:zscore_by_group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
    winsorize_by_group,
    zscore_by_group,
)
from lakehouse_architecture_for_realestatedata_spark.operators.windows import rolling_time_agg
from lakehouse_architecture_for_realestatedata_spark.queries import _events, register


@register(
    "zscore_events_by_type",
    """
    WITH s AS (
        SELECT event_id, event_type, value,
               cast(sum(cast(value AS decimal(30,6))) OVER w AS double) AS s1,
               cast(sum(cast(value * value AS decimal(30,6))) OVER w AS double) AS s2,
               count(value) OVER w AS n
        FROM events
        WINDOW w AS (PARTITION BY event_type)
    )
    SELECT event_id, event_type, value,
           CASE WHEN n > 1 AND (s2 - s1 * s1 / n) / (n - 1) > 0
                THEN (value - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))
           END AS zscore
    FROM s
    """,
    doc="Per-event-type z-score standardization "
    "(operators/aggregates.py:zscore_by_group): ONE hash exchange — the "
    "group's Σx/Σx²/n are whole-partition window aggregates, no "
    "groupBy+join-back. Variance is the fixed-op-order two-pass identity "
    "over exact decimal sums, never Welford stddev_samp (partition-order-"
    "dependent low bits).",
)
def q_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    return zscore_by_group(ev, "event_type", "value")


@register(
    "winsorized_event_values",
    """
    SELECT event_id, event_type, value,
           CASE WHEN value < p_lo THEN p_lo
                WHEN value > p_hi THEN p_hi
                ELSE value END AS winsorized
    FROM (
        SELECT event_id, event_type, value,
               quantile_cont(value, 0.05) OVER (PARTITION BY event_type) AS p_lo,
               quantile_cont(value, 0.95) OVER (PARTITION BY event_type) AS p_hi
        FROM events
    )
    """,
    doc="Per-type winsorization at the exact [5%, 95%] quantiles "
    "(operators/aggregates.py:winsorize_by_group): quantiles as "
    "whole-partition window aggregates + codegen clipping — one exchange. "
    "Spark percentile and DuckDB quantile_cont share linear interpolation "
    "(already pinned by exact_percentiles_by_type).",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    return winsorize_by_group(ev, "event_type", "value", 0.05, 0.95)


@register(
    "rolling_hourly_user_value",
    """
    SELECT event_id, user_id, ts, value,
           cast(sum(cast(value AS decimal(30,6))) OVER w AS double) AS rolling_sum,
           cast(sum(cast(value AS decimal(30,6))) OVER w AS double)
               / count(value) OVER w AS rolling_avg,
           count(value) OVER w AS rolling_n
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY cast(epoch(date_trunc('second', ts)) AS bigint)
                 RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    """,
    doc="Trailing-hour RANGE-frame rolling sum/avg per user "
    "(operators/windows.py:rolling_time_agg): the event-time twin of the "
    "row-count rolling frame — equal-timestamp rows are peers, so no "
    "tiebreak is needed and ties are deterministic. One hash exchange + "
    "per-key sort; the frame bound evaluates during the sorted scan (the "
    "naive self-join BETWEEN spelling is quadratic per key). Both engines "
    "order by floor-to-second epoch so the integer frame bounds agree.",
)
def q_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    return rolling_time_agg(ev, "user_id", "ts", "value", window_seconds=3600)
