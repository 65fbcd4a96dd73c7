"""Time-series regularization operators Spark lacks as built-ins: gap-fill /
resample with forward-fill (LOCF) and SCD Type-2 history construction — both
composed from shuffle-bounded DataFrame primitives, no UDFs.

``resample_locf``: turn an irregular per-key event series into a dense,
fixed-step series (one row per key per step between that key's first and last
observation), carrying the last observed value forward across gaps. The
reference's daily summaries (scripts/transform_silver.py's day-grained
aggregates) leave holes on inactive days; downstream consumers (charting,
training-data windowing, joins on a day spine) want a dense series.

Distributed shape (holds at 100 TB):
  1. one groupBy(key, step) partial-aggregated shuffle for the observed grid,
  2. a per-key (min, max) agg REUSING the same hash partitioning (no second
     wide shuffle of the raw data — it aggregates the already-keyed grid),
  3. the spine is sequence()+explode over the per-key span — generated
     distributed, proportional to output rows, never a driver loop or a
     cross join against a global calendar,
  4. spine LEFT JOIN grid on (key, step) — both sides are keyed aggregates,
     orders of magnitude smaller than the raw input,
  5. forward-fill is one window (partitionBy key, orderBy step) — the only
     per-key sort, over the dense grid, not the raw events.

``scd2_history``: collapse a change log into type-2 dimension history rows
(valid_from / valid_to / is_current) — the temporal twin of the medallion
layer's SCD-current keep-latest (plans/medallion.py:326, reference
scripts/transform_silver.py's latest-wins dedup). Consecutive rows with an
unchanged tracked payload are collapsed into one validity interval, so the
output is minimal (one row per actual change). Two windows over ONE
partitioning (key, ordered by event time): a lag() change-detect pass, then
lead() on the surviving change rows for the interval close — Catalyst plans
both windows in a single Exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_locf(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    step: str = "day",
    agg: str = "sum_decimal",
) -> DataFrame:
    """Dense fixed-``step`` series per ``key`` with LOCF forward-fill.

    Output columns: ``(key, bucket, observed, filled)`` where ``bucket`` is the
    truncated timestamp, ``observed`` is the step's aggregate (NULL on gap
    steps) and ``filled`` is observed with gaps carried forward from the last
    observed step of the same key.

    ``agg='sum_decimal'`` aggregates through decimal(30,6) and casts back to
    double — bit-identical across engines and partition counts (same policy
    as operators/aggregates.dsum); ``agg='count'`` counts rows per step.

    ``step`` is any ``date_trunc`` unit (``day``, ``hour``, ``week`` …).
    """
    if agg == "sum_decimal":
        observed: Column = F.sum(F.col(value).cast("decimal(30,6)")).cast("double")
    elif agg == "count":
        observed = F.count(F.lit(1)).cast("long")
    else:  # pragma: no cover - guarded API
        raise ValueError(f"unsupported agg: {agg}")

    step_seconds = {
        "hour": 3600,
        "day": 86400,
        "week": 7 * 86400,
    }
    if step not in step_seconds:
        raise ValueError(f"unsupported step: {step}")
    sec = step_seconds[step]

    grid = (
        df.select(F.col(key).alias("__k"), F.date_trunc(step, F.col(ts)).alias("__b"), value)
        .groupBy("__k", "__b")
        .agg(observed.alias("observed"))
    )
    # Per-key span over the (already small, already keyed) grid — AQE reuses
    # the grid's hash partitioning, so this adds no raw-data shuffle.
    span = grid.groupBy("__k").agg(F.min("__b").alias("__mn"), F.max("__b").alias("__mx"))
    # Dense spine: integer step arithmetic (sequence over epoch-second
    # buckets) rather than sequence-of-timestamps — date_trunc output is
    # exactly representable in epoch seconds for these units, and integer
    # sequences avoid interval/timezone edge cases. Row count equals the
    # output size; generation is narrow after the span agg.
    spine = span.select(
        "__k",
        F.explode(
            F.sequence(
                (F.col("__mn").cast("long") / sec).cast("long"),
                (F.col("__mx").cast("long") / sec).cast("long"),
            )
        ).alias("__step"),
    ).select("__k", F.timestamp_seconds(F.col("__step") * sec).alias("__b"))

    w = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(grid, ["__k", "__b"], "left")
        .withColumn("filled", F.last("observed", ignorenulls=True).over(w))
        .select(
            F.col("__k").alias(key),
            F.col("__b").alias("bucket"),
            "observed",
            "filled",
        )
    )


def scd2_history(
    df: DataFrame,
    key: str,
    ts: str,
    tracked: list[str],
    tiebreak: list[Column] | None = None,
) -> DataFrame:
    """Type-2 history: one row per (key, change of ``tracked`` payload), with
    ``valid_from`` (inclusive), ``valid_to`` (exclusive, NULL while current)
    and ``is_current``.

    Rows whose tracked payload equals the key's immediately-preceding row are
    collapsed into the preceding validity interval. Ordering within a key is
    ``ts`` plus ``tiebreak`` (REQUIRED to be total per key for a
    deterministic history — pass e.g. ``[F.col("event_id")]`` when timestamps
    can collide).

    NULL-safe change detection: a tracked column going NULL→value or
    value→NULL is a change (eqNullSafe comparison on a packed struct).
    """
    order = [F.col(ts).asc(), *(tiebreak or [])]
    wlag = Window.partitionBy(key).orderBy(*order)
    payload = F.struct(*[F.col(c) for c in tracked])
    changed = (
        df.withColumn("__prev", F.lag(payload).over(wlag))
        # first row per key: lag is NULL → NOT eqNullSafe(payload) unless the
        # payload itself is an all-NULL struct — guard with rn=1 explicitly.
        .withColumn("__rn", F.row_number().over(wlag))
        .filter((F.col("__rn") == 1) | ~F.col("__prev").eqNullSafe(payload))
    )
    wlead = Window.partitionBy(key).orderBy(*order)
    return (
        changed.withColumn("valid_from", F.col(ts))
        .withColumn("valid_to", F.lead(ts).over(wlead))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__prev", "__rn")
    )
