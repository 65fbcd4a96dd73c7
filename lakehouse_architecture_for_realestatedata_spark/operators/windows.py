"""Analytic window operators — lag/lead period-over-period, rolling frames,
ntile bucketing, ranked top-k.

The reference exercises only ranking windows (W1/W2 dedup, W3 share-of-total —
SURVEY.md §2.5); BI serving over the gold tables implies the rest of the
analytic family, so the engine ships them as first-class, oracle-checked
operators.

Scale notes:
  - Every operator here windows over a PRE-AGGREGATED frame (daily rollups,
    per-group ranks) — the raw fact table is reduced by a partial+final hash
    aggregate BEFORE any window sort. Never window over raw 100 TB rows when
    the question is about aggregates.
  - Unpartitioned ``Window.orderBy`` funnels all rows through ONE task.
    That is acceptable exactly when the input is a bounded aggregate (days,
    buckets); the operators that do it say so. For per-key windows Spark
    hash-partitions — the usual skew rules apply.
  - Sums that feed frames stay DECIMAL until the final projection: exact,
    associative, partition-order-proof (see operators.aggregates.dsum).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _plain_columns(order_by: list[Column]) -> None:
    """Reject SortOrder columns (``.desc()`` / ``.asc()``): the two-phase
    primitives take PLAIN columns plus an explicit ``descending`` flag for
    the lead key, so the bucketing expression and the window order can never
    disagree about direction."""
    for c in order_by:
        s = str(c)
        if " DESC NULLS" in s or " ASC NULLS" in s:
            raise ValueError(
                f"order_by must be plain columns (got sort-order column {s}); "
                "pass descending=True for a descending lead key"
            )


def _window_order(order_by: list[Column], descending: bool) -> list[Column]:
    head = order_by[0].desc() if descending else order_by[0]
    return [head, *order_by[1:]]


def _literal_range_pid(
    df: DataFrame, first_key: Column, descending: bool, p: int
) -> Column:
    """Deterministic range-bucket id for the two-phase global-window
    primitives — the fix for round 7's silent-corruption bug.

    ``repartitionByRange`` re-SAMPLES its boundaries on every physical
    execution (the sampler seed derives from the RDD id), so a plan that
    consumes the ranged frame twice (totals branch + window branch) only
    agrees on partition ids while Catalyst happens to reuse the exchange —
    a map-task retry on a real cluster, or any plan change that defeats
    ReusedExchange, silently attaches the wrong prefix offsets (reproduced:
    5 runs of mann_whitney_auc → 5 different AUCs). The rule this module
    now follows is operators/ordered.py's: partition assignment must be a
    PURE ROW FUNCTION.

    Here the boundaries are collected ONCE at plan-build time — a single
    column-pruned approx-quantile pass over the lead sort key — and embedded
    as literals in a log2(p)-deep binary-search ``when`` tree. Every
    physical execution (retries, unshared exchanges, AQE re-plans) then
    assigns the SAME pid to the same row, by construction. The boundary
    VALUES need not be reproducible across operator invocations — pids only
    decide WHERE a row is ranked, never its rank — they only have to be
    fixed within one composed plan, which literals guarantee.

    Ties on the lead key all land in one bucket (comparisons touch only the
    lead key), so buckets stay contiguous ranges of the total order and the
    per-bucket window's tiebreak columns finish the job. NULL lead keys map
    to the first bucket ascending (Spark sorts NULLS FIRST asc) and the last
    bucket descending (NULLS LAST desc), matching the window's own null
    placement."""
    from pyspark.sql.types import DateType, NumericType, TimestampType

    lead_type = df.select(first_key.alias("__k")).schema[0].dataType
    if not isinstance(lead_type, (NumericType, DateType, TimestampType)):
        raise ValueError(
            f"lead sort key must be numeric/date/timestamp for literal range "
            f"bucketing (got {lead_type.simpleString()}); a string key would "
            "cast to NULL and silently collapse to one bucket — derive a "
            "numeric order key first (e.g. conv of a hash prefix)"
        )
    # dates do not cast to double (NULL); route through day numbers
    k = (
        F.unix_date(first_key).cast("double")
        if isinstance(lead_type, DateType)
        else first_key.cast("double")
    )
    qs = df.select(k.alias("__k"))
    bounds = sorted(
        set(qs.approxQuantile("__k", [i / p for i in range(1, p)], 0.001))
    )
    nb = len(bounds)

    def tree(lo: int, hi: int) -> Column:
        # buckets lo..hi; bounds[i] separates bucket i from i+1 (v <= bounds[i])
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(k <= F.lit(bounds[mid]), tree(lo, mid)).otherwise(
            tree(mid + 1, hi)
        )

    asc_pid = tree(0, nb)
    if descending:
        return F.when(k.isNull(), F.lit(nb)).otherwise(F.lit(nb) - asc_pid)
    return F.when(k.isNull(), F.lit(0)).otherwise(asc_pid)


def daily_measure(
    df: DataFrame, ts_col: str, measure_col: str, scale: int = 2
) -> DataFrame:
    """(day, measure) daily rollup with an EXACT decimal sum — the bounded
    base frame for the period-over-period / rolling operators below."""
    return df.groupBy(F.to_date(F.col(ts_col)).alias("day")).agg(
        F.sum(F.col(measure_col).cast(f"decimal(30,{scale})")).alias("__dec")
    )


def period_over_period(
    df: DataFrame, order_col: str, measure_col: str, periods: int = 1
) -> DataFrame:
    """lag-based delta: current vs ``periods``-back value of ``measure_col``
    ordered by ``order_col``. Input must be a bounded aggregate (one row per
    period) — the unpartitioned order-by is a single-task sort by design."""
    w = Window.orderBy(F.col(order_col))
    prev = F.lag(F.col(measure_col), periods).over(w)
    return df.select(
        F.col(order_col),
        F.col(measure_col),
        prev.alias("prev_value"),
        (F.col(measure_col) - prev).alias("delta"),
    )


def rolling_frame(
    df: DataFrame,
    order_col: str,
    dec_col: str,
    preceding: int = 6,
) -> DataFrame:
    """Trailing-N rolling sum/avg over a decimal measure: the frame sum stays
    exact decimal; only the final avg division is IEEE double (bit-identical
    across engines). Input is one row per period (bounded)."""
    w = Window.orderBy(F.col(order_col)).rowsBetween(-preceding, 0)
    roll_sum = F.sum(F.col(dec_col)).over(w)
    roll_n = F.count(F.col(dec_col)).over(w)
    return df.select(
        F.col(order_col),
        F.col(dec_col).cast("double").alias("value"),
        roll_sum.cast("double").alias("rolling_sum"),
        (roll_sum.cast("double") / roll_n).alias("rolling_avg"),
    )


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out_col: str = "rn",
    partitions: int | None = None,
    descending: bool = False,
) -> DataFrame:
    """EXACT global row_number over a total order with NO single-task sort:
    deterministic range-bucket the lead key (literal boundaries — see
    ``_literal_range_pid``), row_number locally per bucket, then add each
    bucket's prefix offset.

    ``order_by`` is PLAIN columns; ``descending`` flips the LEAD key (the
    tiebreaks stay ascending). The caller supplies a TOTAL order (unique
    tiebreak), so the numbering is independent of where boundaries land.

    The naive ``row_number() OVER (ORDER BY ...)`` funnels the entire input
    through ONE task (Spark logs "No Partition Defined ... Moving all data
    to a single partition") — a billion-row single-task sort at scale. Here
    every heavy step is distributed:

      1. ``__pid`` = literal-boundary bucket of the lead key — a pure row
         function, identical across physical executions and retries (the
         round-7 repartitionByRange spelling was NOT: boundaries resample
         per execution, corrupting results whenever ReusedExchange misses).
      2. per-bucket ``row_number`` windowed BY ``__pid`` — ONE hash
         exchange, parallel sorts, no cross-partition data movement.
      3. per-bucket counts (≤ p rows) get prefix offsets via an
         unpartitioned window — allowed exactly because the input is the
         bounded count frame, per this module's rule — and broadcast back.
    """
    _plain_columns(order_by)
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    pid = _literal_range_pid(df, order_by[0], descending, p)
    staged = df.withColumn("__pid", pid)
    counts = staged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    w_local = Window.partitionBy("__pid").orderBy(*_window_order(order_by, descending))
    local = staged.withColumn("__lrn", F.row_number().over(w_local))
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )


def global_running_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str | Column,
    out_col: str = "running_sum",
    partitions: int | None = None,
    scale: int = 2,
    descending: bool = False,
) -> DataFrame:
    """EXACT global running (prefix) sum of ``value_col`` over a total
    order, with NO single-task sort — the cumulative-share / Pareto / CDF
    primitive. Same two-phase shape as ``global_row_number``: range
    repartition on the order, per-partition decimal cumsum (parallel
    sorts), then each partition's prefix offset from the bounded
    per-partition total frame, broadcast back. The sum stays DECIMAL end
    to end (exact, associative, partition-invariant); ``out_col`` is the
    decimal running sum cast to double only in the caller's projection if
    wanted. Caller must supply a unique tiebreak in ``order_by`` (plain
    columns; ``descending`` flips the lead key).

    Partition ids come from ``_literal_range_pid`` — a pure row function
    with driver-collected literal boundaries — NOT ``repartitionByRange``,
    whose per-execution boundary resampling silently corrupted this
    operator in round 7 (totals branch and window branch disagreed on pids
    whenever the exchange wasn't reused)."""
    _plain_columns(order_by)
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    dec = f"decimal(38,{scale})"
    pid = _literal_range_pid(df, order_by[0], descending, p)
    staged = df.withColumn("__pid", pid).withColumn("__v", v.cast(dec))
    totals = staged.groupBy("__pid").agg(F.sum("__v").alias("__t"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid",
        F.coalesce(F.sum("__t").over(w_off), F.lit(0).cast(dec)).alias("__off"),
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*_window_order(order_by, descending))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = staged.withColumn("__lsum", F.sum("__v").over(w_local))
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.col("__lsum"))
        .drop("__pid", "__v", "__lsum", "__off")
    )


def global_running_max(
    df: DataFrame,
    order_by: list[Column],
    value_col: str | Column,
    out_col: str = "running_max",
    partitions: int | None = None,
    descending: bool = False,
    exclusive: bool = False,
) -> DataFrame:
    """EXACT global running (prefix) MAX of ``value_col`` over a total
    order with NO single-task sort — the skyline / record-to-date
    primitive. Same two-phase shape as ``global_running_sum``: literal-
    boundary range buckets (``_literal_range_pid`` — pure row function,
    execution-invariant), per-bucket running max (parallel sorts), then
    each bucket's prefix max from the bounded per-bucket frame, broadcast
    back and combined with ``greatest``. Max is associative and type-
    preserving, so no decimal staging is needed and the result is
    partition-invariant by construction.

    ``exclusive=True`` computes the prefix max over STRICTLY PRECEDING
    rows (``rows between unbounded preceding and 1 preceding``): the first
    row of the total order gets NULL — the dominance test a skyline needs.
    Caller supplies a unique tiebreak in ``order_by`` (plain columns;
    ``descending`` flips the lead key)."""
    _plain_columns(order_by)
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    pid = _literal_range_pid(df, order_by[0], descending, p)
    staged = df.withColumn("__pid", pid).withColumn("__v", v)
    totals = staged.groupBy("__pid").agg(F.max("__v").alias("__t"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.max("__t").over(w_off).alias("__off")
    )
    hi = -1 if exclusive else 0
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*_window_order(order_by, descending))
        .rowsBetween(Window.unboundedPreceding, hi)
    )
    local = staged.withColumn("__lmax", F.max("__v").over(w_local))
    combined = F.when(
        F.col("__off").isNull(), F.col("__lmax")
    ).otherwise(
        F.when(F.col("__lmax").isNull(), F.col("__off")).otherwise(
            F.greatest(F.col("__off"), F.col("__lmax"))
        )
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, combined)
        .drop("__pid", "__v", "__lmax", "__off")
    )


def ntile_buckets(
    df: DataFrame,
    order_by: list[Column],
    n: int = 4,
    partitions: int | None = None,
    descending: bool = False,
) -> DataFrame:
    """ntile(n) bucket assignment over a TOTAL order (caller must include a
    unique tiebreak column, or bucket edges are nondeterministic; plain
    columns, ``descending`` flips the lead key).

    Output-identical to ``ntile(n) OVER (ORDER BY ...)`` but WITHOUT the
    single-partition WindowExec: global rank comes from the distributed
    two-phase numbering (``global_row_number`` inlined so the per-partition
    count frame serves both the prefix offsets and the global total), and
    the bucket is ntile's closed form over (rn, cnt): with q = cnt div n
    and r = cnt mod n, buckets 1..r hold q+1 rows and buckets r+1..n hold
    q rows. Partition ids are literal-boundary buckets
    (``_literal_range_pid``) — pure row function, execution-invariant."""
    _plain_columns(order_by)
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    pid = _literal_range_pid(df, order_by[0], descending, p)
    ranged = df.withColumn("__pid", pid)
    counts = ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    meta = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__n").over(w_all).alias("__cnt"),
    )
    w_local = Window.partitionBy("__pid").orderBy(*_window_order(order_by, descending))
    local = ranged.withColumn("__lrn", F.row_number().over(w_local))
    rn = F.col("__off") + F.col("__lrn")
    cnt = F.col("__cnt")
    q = F.floor(cnt / n).cast("bigint")
    r = (cnt % n).cast("bigint")
    threshold = r * (q + 1)  # rows covered by the (q+1)-sized buckets
    bucket = F.when(
        rn <= threshold, F.floor((rn - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((rn - threshold - 1) / F.greatest(q, F.lit(1))) + 1)
    return (
        local.join(F.broadcast(meta), "__pid")
        .withColumn("bucket", bucket.cast("int"))
        .drop("__pid", "__lrn", "__off", "__cnt")
    )


def grouped_row_number(
    df: DataFrame,
    part_cols: list[str],
    order_by: list[Column],
    out_col: str = "rn",
    partitions: int | None = None,
    descending: bool = False,
) -> DataFrame:
    """Per-GROUP exact row_number for LOW-CARDINALITY group keys without a
    single-task-per-group WindowExec — the scale-safe spelling of
    ``row_number() OVER (PARTITION BY type ORDER BY ...)`` when the key has
    a handful of distinct values (event_type ≈ 5): the naive window gives
    each type ONE reducer task sorting that type's entire corpus — billions
    of rows per task at 100× scale even though it passes locally.

    Same literal-boundary two-phase shape as ``global_row_number``, with the
    group key prepended everywhere: pid buckets come from ONE global
    approx-quantile pass over the lead sort key (bucket boundaries need not
    be per-group — within a group the global boundaries still carve the
    order into contiguous ranges, which is all the prefix arithmetic
    needs), the local window partitions by (group, pid) — cells small
    enough for any executor — and the per-(group, pid) count frame
    (#groups × p rows, metadata-scale) yields per-group prefix offsets via
    a bounded window.

    Group keys must be NON-NULL (the offsets equi-join would drop NULL
    groups); ``order_by`` is plain columns with a unique tiebreak,
    ``descending`` flips the lead key."""
    _plain_columns(order_by)
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    pid = _literal_range_pid(df, order_by[0], descending, p)
    staged = df.withColumn("__pid", pid)
    counts = staged.groupBy(*part_cols, "__pid").agg(F.count(F.lit(1)).alias("__n"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *part_cols,
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = Window.partitionBy(*part_cols, "__pid").orderBy(
        *_window_order(order_by, descending)
    )
    local = staged.withColumn("__lrn", F.row_number().over(w_local))
    return (
        local.join(F.broadcast(offsets), [*part_cols, "__pid"])
        .withColumn(out_col, (F.col("__off") + F.col("__lrn")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )


def grouped_cume_dist(
    df: DataFrame,
    part_cols: list[str],
    value_col: str,
    out_col: str = "cd",
    partitions: int | None = None,
) -> DataFrame:
    """``cume_dist() OVER (PARTITION BY group ORDER BY value)`` for LOW-
    CARDINALITY group keys without a per-group WindowExec (and without the
    RANGE frame, which is even worse: each row re-scans its peer set).

    cume_dist(v) = (# rows in the group with value ≤ v) / group size, so it
    is a pure function of the DISTINCT value multiset: collapse to one row
    per (group, value) with multiplicity (partial-aggregated — the only
    full-data shuffle besides the final join-back), two-phase prefix-sum
    the multiplicities over literal-boundary value buckets
    (``_literal_range_pid`` — per-(group, bucket) cells, bounded offsets
    frame), then join the (cnt_le, group total) frame back to the rows on
    (group, value). Ties collapse into one distinct-value row, so peer
    semantics are exact by construction.

    Contracts: group keys non-null (equi-joins); ``value_col`` non-null
    (NULL ordering is engine-defined — filter or pin upstream, as the
    registered query does)."""
    spark = df.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    m = df.groupBy(*part_cols, value_col).agg(F.count(F.lit(1)).alias("__m"))
    pid = _literal_range_pid(m, F.col(value_col), False, p)
    staged = m.withColumn("__pid", pid)
    counts = staged.groupBy(*part_cols, "__pid").agg(F.sum("__m").alias("__n"))
    w_off = (
        Window.partitionBy(*part_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        *part_cols,
        "__pid",
        F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off"),
    )
    w_local = (
        Window.partitionBy(*part_cols, "__pid")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = m.groupBy(*part_cols).agg(F.sum("__m").alias("__tot"))
    dv = (
        staged.withColumn("__lsum", F.sum("__m").over(w_local))
        .join(F.broadcast(offsets), [*part_cols, "__pid"])
        .join(F.broadcast(totals), part_cols)
        .select(
            *part_cols,
            value_col,
            (
                (F.col("__off") + F.col("__lsum")).cast("double") / F.col("__tot")
            ).alias(out_col),
        )
    )
    return df.join(dv, [*part_cols, value_col])


def ranked_in_group(
    df: DataFrame,
    part_cols: list[str],
    order_by: list[Column],
    k: int | None = None,
) -> DataFrame:
    """rank/dense_rank/percent_rank within each partition; optionally keep
    rank ≤ k (per-group top-k: one hash-partition shuffle, no global sort).

    percent_rank is NOT computed in the window: Spark's WindowGroupLimit
    partial pushdown (the map-side k-cut this module pins for top-k) only
    fires when every window function is rank-like, and a ``percent_rank``
    sharing the window disables it — every row would flow through the
    #groups reducer tasks before the k-filter. Instead the rank window stays
    rank-only (partial cut applies), per-group row counts joined back
    (one tiny aggregate), and ``pct_rnk = (rnk-1)/(n-1)`` — percent_rank's
    literal definition — is derived in the projection. Output-identical,
    including the n=1 → 0.0 convention.

    The count join is NULL-SAFE (``<=>`` per partition column): a window
    partitions NULL keys into their own ranked group, so a null-unsafe
    equi-join would silently drop those rows (ADVICE r6, medium). And the
    join is deliberately UNHINTED: counts has one row per group — tiny for
    priority-like keys but corpus-scale for per-user keys — so the
    broadcast decision belongs to AQE's runtime size check, not an
    unconditional driver-OOM-able hint (ADVICE r6, low)."""
    w = Window.partitionBy(*part_cols).orderBy(*order_by)
    ranked = df.select(
        "*",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("dense_rnk"),
    )
    if k is not None:
        ranked = ranked.filter(F.col("rnk") <= k)
    counts = df.groupBy(*part_cols).agg(F.count(F.lit(1)).alias("__gn"))
    cond = None
    for c in part_cols:
        clause = ranked[c].eqNullSafe(counts[c])
        cond = clause if cond is None else cond & clause
    pct = (
        F.when(
            counts["__gn"] > 1,
            (ranked["rnk"] - 1).cast("double") / (counts["__gn"] - 1).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("pct_rnk")
    )
    return ranked.join(counts, cond).select(
        *[ranked[c] for c in df.columns], ranked["rnk"], ranked["dense_rnk"], pct
    )


def global_top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global ordered top-k: ``orderBy().limit()`` — Spark plans
    TakeOrderedAndProject (per-partition heap + driver merge of k·P rows),
    NOT a total sort. The right way to answer "top 100 of 100 TB"."""
    return df.orderBy(*order_by).limit(k)


def rolling_time_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
    scale: int = 6,
) -> DataFrame:
    """Trailing TIME-range rolling sum/avg per key: for each row, aggregate
    every row of the same key whose timestamp falls in
    ``(ts - window_seconds, ts]`` — a RANGE frame over epoch seconds, the
    event-time twin of the row-count frame in ``rolling_frame``.

    RANGE (not ROWS) semantics: rows with EQUAL timestamps are peers and
    always aggregate together, so no tiebreak column is needed and the
    result is deterministic under timestamp ties. The sum stays exact
    decimal inside the frame; the final avg division is one IEEE double op
    (cross-engine bit-identical, same policy as operators.aggregates.dsum).

    Scale shape: ONE hash exchange on ``key`` + per-key sort — identical
    physics to any per-key window; the frame bound is evaluated during the
    sorted scan, no self-join (the naive ``t1 JOIN t2 ON delta BETWEEN``
    spelling is quadratic per key)."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-(window_seconds - 1), 0)
    )
    dec = F.col(value_col).cast(f"decimal(30,{scale})")
    roll_sum = F.sum(dec).over(w)
    roll_n = F.count(dec).over(w)
    return df.select(
        "*",
        roll_sum.cast("double").alias("rolling_sum"),
        (roll_sum.cast("double") / roll_n).alias("rolling_avg"),
        roll_n.alias("rolling_n"),
    )


def rolling_anomaly_flags(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 3600,
    k: float = 3.0,
    scale: int = 6,
) -> DataFrame:
    """Streaming-style anomaly detection over a trailing time window: flag a
    row when its value deviates more than ``k`` sample standard deviations
    from its key's trailing-window mean — the monitoring twin of
    ``zscore_by_group`` where the population is the last ``window_seconds``
    rather than the whole group. Appends ``roll_mean``, ``roll_std``,
    ``is_anomaly`` (NULL when the trailing window has < 2 points or zero
    variance — no basis to flag).

    The row's own value is INCLUDED in the window (RANGE frame, equal
    timestamps are peers — deterministic under ties without a tiebreak);
    with n ≥ 2 a single spike still flags because the mean moves by at most
    spike/n. Determinism: Σx / Σx² through exact decimal window sums; mean,
    the two-pass variance identity, sqrt and the k·std comparison are a
    fixed IEEE op sequence (the zscore_by_group policy, applied to a moving
    frame).

    Scale shape: ONE hash exchange on ``key`` + per-key sort; all three
    window aggregates share the frame, evaluated during the sorted scan.
    """
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-(window_seconds - 1), 0)
    )
    x = F.col(value_col)
    s1 = F.sum(x.cast(f"decimal(30,{scale})")).over(w).cast("double")
    s2 = F.sum((x * x).cast(f"decimal(30,{scale})")).over(w).cast("double")
    n = F.count(x).over(w)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    std = F.sqrt(var)
    flag = F.when((n > 1) & (var > 0), F.abs(x - mean) > F.lit(k) * std)
    return df.select(
        "*",
        mean.alias("roll_mean"),
        F.when((n > 1) & (var > 0), std).alias("roll_std"),
        flag.alias("is_anomaly"),
    )
