"""Temporal joins Spark lacks as built-ins: as-of (backward) join and
interval/range join — composed from shuffle-bounded DataFrame primitives, no
UDFs, no cross joins.

As-of join (``asof_join``): for each left row, the latest right row with
``right_ts <= left_ts`` and equal key — click-attribution, mark-to-market,
sensor alignment. The classic distributed construction: tag both sides,
UNION, one window sort per key partition, ``last(..., ignorenulls)`` carries
the most recent right payload forward onto left rows. ONE shuffle (hash by
key), no join node at all — the sort-merge as-of that pandas does per-core,
expressed as a Spark window so it scales per key partition.

Range join (``range_join_binned``): points joined into intervals. A naive
``ts BETWEEN start AND end`` predicate with no equi-key plans
BroadcastNestedLoopJoin — quadratic. Binning makes it an EQUI-join: intervals
explode to the fixed-width bins they cover, points map to their single bin,
join on bin, re-check the exact predicate. Candidate work is
O(points + intervals × span/bin_width + true matches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: left rows + the payload of the latest right row
    with ``right_ts <= left_ts`` per key (NULL payload if none / outside
    ``tolerance_seconds``).

    Requirement: right must be UNIQUE per (key, right_ts) — pre-dedup with
    ``dedup_latest`` otherwise (ties at identical timestamps have no
    deterministic winner in any as-of semantics).

    Ordering puts right rows BEFORE left rows at equal timestamps, so an
    exactly-simultaneous right row matches (inclusive semantics, same as
    pandas ``merge_asof`` and DuckDB ``ASOF JOIN ... >=``)."""
    rstruct = F.struct(
        F.col(right_ts).alias("__matched_ts"), *[F.col(c).alias(c) for c in right_payload]
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        rstruct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
    )
    l = left.select(  # noqa: E741
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        *left.columns,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1)
    match = F.col("__m")
    if tolerance_seconds is not None:
        in_tol = F.col("__ts").cast("long") - match["__matched_ts"].cast("long") <= F.lit(
            tolerance_seconds
        )
        match = F.when(match.isNotNull() & in_tol, match)
    return out.select(
        *left.columns,
        match["__matched_ts"].alias("matched_ts"),
        *[match[c].alias(f"matched_{c}") for c in right_payload],
    )


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_seconds: int,
    point_cols: list[str],
    interval_cols: list[str],
) -> DataFrame:
    """Equi-join rewrite of ``start <= point_ts < end``: intervals explode to
    every ``bin_seconds`` bin they overlap, points map to exactly one bin —
    so each true (point, interval) pair meets in exactly one bin (no dedup
    pass needed) and the join is a plain hash join on the bin id.

    Pick ``bin_seconds`` ≈ the typical interval length: shorter bins blow up
    the interval side (span/bin rows each), longer bins blow up candidate
    pairs that fail the exact predicate re-check."""
    p = points.select(
        *point_cols,
        F.col(point_ts).alias("__pts"),
        F.floor(F.col(point_ts).cast("long") / bin_seconds).alias("__bin"),
    )
    start_bin = F.floor(F.col(start_col).cast("long") / bin_seconds)
    # end bin from the truncated end second WITHOUT the usual -1: sub-second
    # end timestamps truncate down, so excluding the boundary bin could miss
    # a point in [floor(end), end). The occasional extra bin only adds
    # candidates that the exact predicate re-check discards.
    end_bin = F.floor(F.col(end_col).cast("long") / bin_seconds)
    i = intervals.select(
        *interval_cols,
        F.col(start_col).alias("__start"),
        F.col(end_col).alias("__end"),
        F.explode(F.sequence(start_bin, end_bin)).alias("__bin"),
    )
    return (
        p.join(i, "__bin")
        .filter((F.col("__pts") >= F.col("__start")) & (F.col("__pts") < F.col("__end")))
        .select(*point_cols, *interval_cols, F.col("__pts").alias(point_ts))
    )
