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
    align: str = "key",
) -> DataFrame:
    """Dense fixed-``step`` series per ``key`` with LOCF forward-fill.

    Output columns: ``(key, bucket, observed, filled)`` where ``bucket`` is the
    truncated timestamp, ``observed`` is the step's aggregate (NULL on gap
    steps) and ``filled`` is observed with gaps carried forward from the last
    observed step of the same key.

    ``agg='sum_decimal'`` aggregates through decimal(30,6) and casts back to
    double — bit-identical across engines and partition counts (same policy
    as operators/aggregates.dsum); ``agg='count'`` counts rows per step.

    ``step`` is ``hour``, ``day`` or ``week``.  ``align`` controls the spine
    span: ``'key'`` (default) spines each key from its own first to last
    observed bucket; ``'global'`` spines EVERY key over the corpus-wide
    [min, max] bucket span so all keys share the identical bucket set
    (charting matrices, join-on-spine) — keys get NULL ``filled`` on buckets
    before their first observation.  Buckets always land on the
    ``date_trunc`` grid either way, so mixed-align outputs still join.

    REQUIRES a UTC session timezone (session.py pins it): ``date_trunc``
    truncates in the session zone, while the spine is integer epoch
    arithmetic — they only describe the same grid when the session zone is
    UTC.  Raises otherwise rather than silently emitting a spine that never
    matches the grid.
    """
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00"):
        raise ValueError(
            f"resample_locf requires a UTC session timezone, got {tz!r}: "
            "date_trunc buckets are session-zone-aligned but the dense spine "
            "is epoch arithmetic, and they diverge off-UTC"
        )
    if agg == "sum_decimal":
        observed: Column = F.sum(F.col(value).cast("decimal(30,6)")).cast("double")
    elif agg == "count":
        observed = F.count(F.lit(1)).cast("long")
    else:  # pragma: no cover - guarded API
        raise ValueError(f"unsupported agg: {agg}")

    # (step_seconds, grid_origin_seconds): date_trunc('week') is
    # Monday-aligned — epoch day 0 (1970-01-01) was a THURSDAY, so week
    # buckets sit at origin 345600 s (1970-01-05, the first Monday), not 0.
    # The spine index is therefore floor((epoch - origin) / sec) and the
    # bucket timestamp index*sec + origin; a plain floor(epoch/sec) spine
    # would be Thursday-aligned and never match the grid's join keys.
    step_grid = {
        "hour": (3600, 0),
        "day": (86400, 0),
        "week": (7 * 86400, 4 * 86400),
    }
    if step not in step_grid:
        raise ValueError(f"unsupported step: {step}")
    if align not in ("key", "global"):
        raise ValueError(f"unsupported align: {align}")
    sec, origin = step_grid[step]

    grid = (
        df.select(F.col(key).alias("__k"), F.date_trunc(step, F.col(ts)).alias("__b"), value)
        .groupBy("__k", "__b")
        .agg(observed.alias("observed"))
    )
    # Per-key span over the (already small, already keyed) grid — AQE reuses
    # the grid's hash partitioning, so this adds no raw-data shuffle.  For
    # align='global' the span collapses to ONE row (metadata-scale) and is
    # broadcast onto the distinct-key frame, so every key carries the same
    # corpus-wide [mn, mx].
    if align == "key":
        span = grid.groupBy("__k").agg(F.min("__b").alias("__mn"), F.max("__b").alias("__mx"))
    else:
        bounds = grid.agg(F.min("__b").alias("__mn"), F.max("__b").alias("__mx"))
        span = grid.select("__k").distinct().crossJoin(F.broadcast(bounds))
    # Dense spine: integer step arithmetic (sequence over origin-relative
    # epoch-second step indices) rather than sequence-of-timestamps —
    # date_trunc output for these units is exactly representable in epoch
    # seconds, and integer sequences keep the generation narrow.  Row count
    # equals the output size; generation is narrow after the span agg.
    spine = span.select(
        "__k",
        F.explode(
            F.sequence(
                ((F.col("__mn").cast("long") - origin) / sec).cast("long"),
                ((F.col("__mx").cast("long") - origin) / sec).cast("long"),
            )
        ).alias("__step"),
    ).select("__k", F.timestamp_seconds(F.col("__step") * sec + origin).alias("__b"))

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

    Output contract: all input columns EXCEPT ``ts`` pass through (the
    surviving change-row's values), plus ``valid_from``/``valid_to``/
    ``is_current``; ``ts`` is dropped because ``valid_from`` is exactly that
    column renamed.
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
        .drop("__prev", "__rn", ts)
    )


def scd2_pit_join(
    facts: DataFrame,
    history: DataFrame,
    key: str,
    ts: str,
    payload: list[str],
    prefix: str = "pit_",
) -> DataFrame:
    """Point-in-time join: attach to each fact row the SCD2 dimension version
    valid at the fact's timestamp — ``valid_from <= ts`` and (``valid_to``
    NULL or ``ts < valid_to``), the standard half-open-interval lookup
    against a ``scd2_history`` table. Facts before the key's first version
    (or with no key match) keep NULL payload (left join). Payload columns
    are prefixed to avoid collisions.

    Uniqueness: ``scd2_history`` intervals partition each key's timeline
    (half-open, consecutive), so at most ONE version matches any fact —
    zero-length intervals from same-timestamp change ties can never match.

    Scale shape: an equi-join on the key with the interval predicate as a
    post-join filter — one hash shuffle per side, never a nested-loop or
    cross join; the dimension side is a history table (≪ facts), so AQE
    broadcasts it when small. For repeated lookups at extreme fact scale,
    bucket-write both sides by the key to elide the exchanges entirely
    (same contract as cdc.snapshot_diff)."""
    h = history.select(
        F.col(key).alias("__pit_k"),
        F.col("valid_from").alias(f"{prefix}valid_from"),
        F.col("valid_to").alias("__pit_to"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload],
    )
    cond = (
        (facts[key] == h["__pit_k"])
        & (h[f"{prefix}valid_from"] <= facts[ts])
        & (h["__pit_to"].isNull() | (facts[ts] < h["__pit_to"]))
    )
    return facts.join(h, cond, "left").drop("__pit_k", "__pit_to")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: list[str] | None = None,
    bin_width: int = 86_400,
) -> DataFrame:
    """All (left, right) row pairs whose CLOSED numeric intervals overlap:
    ``l_start <= r_end AND r_start <= l_end`` — the interval-interval
    generalization of the point-in-interval binned range join (sessions ×
    campaign windows, maintenance windows × incidents, span containment).

    Start/end columns must be NUMERIC in a shared unit (epoch seconds/
    micros — convert timestamps with ``unix_micros`` first; binning on a
    truncated cast would misjudge sub-unit boundaries). Rows with NULL or
    inverted (end < start) intervals are dropped. Column names must be
    disjoint apart from ``on``.

    Scale shape: each interval explodes to the ``bin_width`` buckets it
    covers and pairs meet by EQUI-join on (bins ∪ ``on``) — never a
    nested-loop/cartesian. A pair sharing several buckets is emitted
    exactly ONCE with zero dedup shuffle: only the bucket containing
    ``greatest(l_start, r_start)`` (the first overlapping bucket) emits
    (the standard first-bin trick — a distinct here would re-shuffle the
    whole pair stream). Pick ``bin_width`` near the typical interval
    length: too small explodes copies, too big degrades to few buckets.
    """
    on = list(on or [])

    def binned(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.filter(
            F.col(s).isNotNull() & F.col(e).isNotNull() & (F.col(e) >= F.col(s))
        ).withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(s) / bin_width), F.floor(F.col(e) / bin_width)
                )
            ),
        )

    lb = binned(left, l_start, l_end)
    rb = binned(right, r_start, r_end)
    pairs = lb.join(rb, on + ["__bin"]).filter(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        & (
            F.floor(F.greatest(F.col(l_start), F.col(r_start)) / bin_width)
            == F.col("__bin")
        )
    )
    return pairs.drop("__bin")
