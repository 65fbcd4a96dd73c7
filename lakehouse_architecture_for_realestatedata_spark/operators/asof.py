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
    direction: str = "backward",
) -> DataFrame:
    """As-of join in any direction: left rows + the payload of the
    ``direction``-matching right row per key (NULL payload if none /
    outside ``tolerance_seconds``):

    - ``backward`` (default): LATEST right with ``right_ts <= left_ts`` —
      click-attribution, mark-to-market;
    - ``forward``: EARLIEST right with ``right_ts >= left_ts`` — next
      fulfillment / next response (DuckDB ``ASOF ... >=``, pandas
      ``merge_asof(direction='forward')``);
    - ``nearest``: whichever of the two is closer in time; exact-distance
      ties go to the backward match (deterministic, pandas convention).

    Requirement: right must be UNIQUE per (key, right_ts) — pre-dedup with
    ``dedup_latest`` otherwise (ties at identical timestamps have no
    deterministic winner in any as-of semantics).

    At equal timestamps the right row matches in every direction
    (inclusive semantics): the union-order flag sorts right rows before
    left for the backward carry and after left for the forward carry.
    Both carries are windows over the SAME hash partitioning — ONE
    exchange total even for ``nearest`` (the second window adds a local
    re-sort, not a shuffle), still no join node."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
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
    unioned = r.unionByName(l)
    # backward: rights sort BEFORE lefts at equal ts; frame looks back
    w_back = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: rights sort AFTER lefts at equal ts; frame looks ahead
    w_fwd = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts"), -F.col("__is_left"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def _tol_gate(match, dist):
        if tolerance_seconds is None:
            return match
        return F.when(match.isNotNull() & (dist <= F.lit(tolerance_seconds)), match)

    cols = {}
    if direction in ("backward", "nearest"):
        m = F.last("__r", ignorenulls=True).over(w_back)
        cols["__mb"] = _tol_gate(m, F.col("__ts").cast("long") - m["__matched_ts"].cast("long"))
    if direction in ("forward", "nearest"):
        m = F.first("__r", ignorenulls=True).over(w_fwd)
        cols["__mf"] = _tol_gate(m, m["__matched_ts"].cast("long") - F.col("__ts").cast("long"))
    carried = unioned.select("*", *[c.alias(n) for n, c in cols.items()])
    out = carried.filter(F.col("__is_left") == 1)
    if direction == "backward":
        match = F.col("__mb")
    elif direction == "forward":
        match = F.col("__mf")
    else:
        mb, mf = F.col("__mb"), F.col("__mf")
        db = F.col("__ts").cast("long") - mb["__matched_ts"].cast("long")
        df_ = mf["__matched_ts"].cast("long") - F.col("__ts").cast("long")
        match = (
            F.when(mb.isNull(), mf)
            .when(mf.isNull(), mb)
            .when(df_ < db, mf)  # ties (df_ == db) fall through to backward
            .otherwise(mb)
        )
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
