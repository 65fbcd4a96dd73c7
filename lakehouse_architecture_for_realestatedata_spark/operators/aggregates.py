"""Aggregation operators (SURVEY §2.4 A1-A8, §2.5 W3).

Oracle-determinism note: double sums are order-dependent across partitionings,
so every money-sum here casts to decimal first (exact, associative) and
converts back to double at the end — identical bits on Spark and DuckDB
regardless of plan shape. Spark plans these as partial+final hash aggregates
(map-side combine), which is also the right 100 TB shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def dsum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent sum of a double measure.

    ``scale`` must be ≥ the exact decimal scale of the input values (money =
    2, price×discount products = 4): then the decimal cast never rounds, the
    sum is the exact rational, and the final double cast is correctly rounded
    identically on Spark and DuckDB. Plain sum(double) would vary with
    partition order; round()-based fixes still diverge on shortest-repr
    midpoints — exactness is the only partition-count-proof answer.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 2) -> Column:
    """Order-independent avg: exact decimal sum cast to double, divided by
    count in pure IEEE double arithmetic — bit-identical across engines and
    partitionings, no rounding step to disagree on."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(30,{scale})")).cast("double") / F.count(c)
    ).alias(alias)


def daily_summary(
    df: DataFrame,
    ts_col: str,
    id_col: str,
    price_col: str,
    area_col: str | None = None,
) -> DataFrame:
    """A1/A2/A3: per-day market summary — the fct_daily_summary shape
    (reference: dbt/models/marts/fct_daily_summary.sql:9-39): count distinct
    ids, sum/avg/min/max of the price measure (rounded), avg of a second
    measure, non-null counts, ordered by day desc."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date").alias("date_key")
    aggs = [
        F.count_distinct(F.col(id_col)).alias("total_listings"),
        dsum(price_col, "sum_price", 2),
        davg(price_col, "avg_price", 2),
        F.min(price_col).alias("min_price"),
        F.max(price_col).alias("max_price"),
        F.count(F.col(price_col)).alias("price_count"),  # A3: non-null count
        F.count(F.lit(1)).alias("row_count"),
    ]
    if area_col is not None:
        aggs.append(davg(area_col, "avg_area", 2))
    return df.groupBy(day).agg(*aggs).orderBy(F.col("date_key").desc())


def quality_report(df: DataFrame, ts_col: str, flag_col: str) -> DataFrame:
    """A4+W3: per-(day, flag) counts with share-of-day percentage — a grouped
    aggregate consumed by an unbounded partition-window aggregate
    (reference: dbt/models/marts/fct_data_quality_report.sql:4-13).

    Physical shape: one shuffle for the groupBy, one more for the window
    partitioned by day (strictly coarser key — AQE keeps it small since the
    windowed input is already aggregated, #days×#flags rows, not raw rows).
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date").alias("report_date")
    counted = df.groupBy(day, F.col(flag_col).alias("flag")).agg(
        F.count(F.lit(1)).alias("record_count")
    )
    w = Window.partitionBy("report_date")
    # Pure double division (bigint*100.0/bigint) — bit-deterministic, so no
    # rounding step that engines could disagree on.
    return (
        counted.withColumn(
            "percentage",
            (F.col("record_count") * 100.0 / F.sum("record_count").over(w)).cast("double"),
        )
        .orderBy(F.col("report_date").desc(), F.col("flag"))
    )


def completeness_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """A3 generalized: non-null count + fill rate per column. Single pass —
    one global aggregate with a count(col) per column, then unpivoted.
    ``fill_rate`` is the raw double ratio (no rounding: int/int division is
    bit-deterministic across engines, a trailing round() is not — callers
    round for presentation)."""
    total = F.count(F.lit(1))
    aggs = [total.alias("__total")] + [F.count(F.col(c)).alias(c) for c in cols]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', {c}" for c in cols)
    return wide.selectExpr(
        "__total", f"stack({len(cols)}, {stack_expr}) as (column_name, non_null_count)"
    ).select(
        "column_name",
        "non_null_count",
        (F.col("non_null_count").cast("double") / F.col("__total").cast("double")).alias(
            "fill_rate"
        ),
    )


def grouped_distinct(df: DataFrame, cols: list[str]) -> DataFrame:
    """A5: GROUP BY as dedup — distinct over a column subset
    (reference: dbt/models/marts/dim_locations.sql:30-42)."""
    return df.select(*cols).distinct()


def high_water_mark(df: DataFrame, ts_col: str) -> Column:
    """A8: scalar max(ts) with epoch default, as a literal Column
    (reference: dbt/models/staging/stg_properties.sql:15)."""
    row = df.agg(F.max(ts_col).alias("hwm")).collect()[0]
    return F.to_timestamp(F.lit(str(row["hwm"]) if row["hwm"] is not None else "1970-01-01"))


def heavy_hitters(
    df: DataFrame, col: str, num: int = 1, den: int = 100
) -> DataFrame:
    """Exact heavy hitters: values of ``col`` accounting for ≥ num/den of all
    rows. Output ``(col, n)``.

    The threshold comparison is pure integer arithmetic (``n·den ≥ total·num``)
    — no float fraction to disagree with an oracle over. ONE groupBy shuffle
    (partial-agg combined map-side); the grand total is a one-row aggregate
    of the already-grouped counts, broadcast back. At 100 TB the groupBy
    materializes every distinct key — when the key space itself is the
    problem, use ``heavy_hitters_approx`` (bounded state, one pass).
    """
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * den >= F.col("__total") * num)
        .select(col, "n")
    )


def heavy_hitters_approx(
    df: DataFrame, col: str, num: int = 1, den: int = 100, slack: int = 4
) -> DataFrame:
    """Misra-Gries candidate heavy hitters with bounded state: one pass, at
    most ``slack·den/num`` counters per partition, NO full distinct-key
    groupBy — the 100 TB path when the key cardinality is itself unboundable
    (URLs, n-grams, user agents).

    Guarantee (superset): every value with true frequency ≥ num/den of rows
    survives. Per partition, batch-merged Misra-Gries with c = slack·den/num
    counters undercounts any key by at most rows_in_partition/(c+1) — each
    overflow prune subtracts the (c+1)-th largest count from every counter
    (the standard mergeable-summaries MG merge, Agarwal et al. 2012), and
    those subtractions total ≤ rows/(c+1) < rows/c. Summing per-partition
    lower bounds and filtering at ``lb + n_total/c ≥ threshold`` therefore
    never drops a true heavy hitter. Counts are LOWER BOUNDS, not exact —
    re-count the (few) survivors exactly with ``heavy_hitters_exact_of``
    when exact frequencies matter. Output ``(col, lb)``.

    The key column is STRINGIFIED (cast to string before sketching, so one
    bounded-state kernel covers every input type); join survivors back on
    ``F.col(col).cast("string")`` — ``heavy_hitters_exact_of`` does exactly
    that. Values whose ``str()`` form differs from Spark's cast-to-string
    rendering (doubles, timestamps) round-trip correctly because the cast
    happens Spark-side, never in Python.

    The kernel is Arrow-native (``mapInArrow``) — value counting, chunk
    pruning and the overflow decrement all run on Arrow/numpy buffers
    without ever materializing a Python object per row; Python touches at
    most c entries per ~64k-row chunk. ~4× the per-row-dict kernel on the
    hostile all-distinct-tail case, more on skewed data, plus the saved
    Arrow→pandas conversion on both sides of the exchange.
    """
    import heapq

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if slack < 2:
        raise ValueError("slack must be >= 2 (marker-row filtering assumes c > den/num)")
    c = max(1, (slack * den) // max(1, num))
    out_schema = f"`{col}` string, lb long, rows long"
    chunk_rows = 65536  # amortizes one C value_counts over many Arrow batches

    def mg(batches):
        counters: dict[str | None, int] = {}
        rows = 0
        buf: list[pa.Array] = []
        buffered = 0

        def flush() -> None:
            nonlocal counters, buffered
            if not buf:
                return
            chunk = buf[0] if len(buf) == 1 else pa.concat_arrays(buf)
            buf.clear()
            buffered = 0
            vc = pc.value_counts(chunk)  # C-speed hash count, nulls included
            counts = vc.field("counts").to_numpy()
            if len(counts) > c:
                # Prune the CHUNK summary to c entries first, vectorized:
                # select the c+1 largest counts (argpartition), subtract the
                # smallest of them (the pivot) and keep the strictly-greater
                # — a Misra-Gries summary OF the chunk (mergeable-summaries
                # construction), so only ≤ c entries ever reach Python.
                idx = np.argpartition(counts, -(c + 1))[-(c + 1) :]
                order = idx[np.argsort(counts[idx])]
                pivot = int(counts[order[0]])
                keep = order[1:][counts[order[1:]] > pivot]
                kept_vals = vc.field("values").take(pa.array(keep)).to_pylist()
                kept_counts = counts[keep] - pivot
            else:
                kept_vals = vc.field("values").to_pylist()
                kept_counts = counts
            for k, n in zip(kept_vals, kept_counts):
                counters[k] = counters.get(k, 0) + int(n)
            if len(counters) > c:
                # Same decrement on the cross-chunk state. Every prune
                # (chunk- or state-level) subtracts its pivot from ≥ c+1
                # positive counters, so the pivots — the only undercount —
                # sum to ≤ rows/(c+1) over the partition.
                pivot = heapq.nlargest(c + 1, counters.values())[-1]
                counters = {k2: n2 - pivot for k2, n2 in counters.items() if n2 > pivot}

        for batch in batches:
            rows += batch.num_rows
            buf.append(batch.column(0))
            buffered += batch.num_rows
            if buffered >= chunk_rows:
                flush()
        flush()
        # Counter rows carry rows=0; ONE marker row (lb=0) carries the
        # partition's row count — summing the rows column downstream then
        # counts each partition exactly once (a rows-per-counter-row layout
        # would multiply the total by the counter count). The marker's lb=0
        # merges into the NULL key without changing its lower bound, and a
        # pure-marker NULL group (lb=0) cannot pass the filter for any
        # slack ≥ 2.
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(list(counters) + [None], type=pa.string()),
                pa.array([int(v) for v in counters.values()] + [0], type=pa.int64()),
                pa.array([0] * len(counters) + [rows], type=pa.int64()),
            ],
            [col, "lb", "rows"],
        )

    # Survivors merge per-partition lower bounds; the filter adds back the
    # worst-case total undercount (rows/c summed over partitions = total/c).
    part = df.select(F.col(col).cast("string")).mapInArrow(mg, schema=out_schema)
    merged = part.groupBy(col).agg(F.sum("lb").alias("lb"))
    totals = part.groupBy().agg(F.sum("rows").alias("__rows"))
    return (
        merged.crossJoin(F.broadcast(totals))
        .filter((F.col("lb") + F.col("__rows") / c) * den >= F.col("__rows") * num)
        .select(col, "lb")
    )


def heavy_hitters_exact_of(
    df: DataFrame,
    col: str,
    candidates: DataFrame,
    num: int | None = None,
    den: int | None = None,
) -> DataFrame:
    """Exact re-count of ``heavy_hitters_approx`` survivors: broadcast
    semi-join ``df`` to the (few) candidate values, then ONE partial-agg
    groupBy over only the surviving rows. Output ``(col, n)`` with the
    ORIGINAL column type and exact counts.

    ``candidates`` carries the stringified key column the approx pass emits;
    the semi-join matches on ``F.col(col).cast("string")`` (null-safe, so a
    NULL heavy hitter re-counts too) — Spark's own cast on both sides, so
    every type round-trips exactly.

    With ``num``/``den`` set, applies the integer threshold
    ``n·den ≥ total·num`` where ``total`` counts ALL rows of ``df`` — making
    approx→recount→threshold ≡ ``heavy_hitters`` exactly, for ANY candidate
    superset (recounts are exact, so non-heavy candidates fall out). Note
    the total is a second scan of ``df``; at scale, piggyback the row count
    on whatever pass produced the candidates if you already have it.
    """
    cand = candidates.select(F.col(col).cast("string").alias("__hh_cand")).distinct()
    counts = (
        df.join(
            F.broadcast(cand),
            F.col(col).cast("string").eqNullSafe(F.col("__hh_cand")),
            "left_semi",
        )
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if num is None or den is None:
        return counts
    total = df.agg(F.count(F.lit(1)).alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * den >= F.col("__total") * num)
        .select(col, "n")
    )


def histogram_equi_width(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Equi-width histogram: counts per bin over [lo, hi], rows outside the
    range dropped, ``x == hi`` folded into the last bin (right-inclusive
    final edge). Output ``(bin, lo_edge, hi_edge, n)``.

    Bin assignment is ``floor((x − lo) · nbins / (hi − lo))`` — three
    correctly-rounded IEEE double ops in a fixed order, so any engine
    computing the same expression assigns identical bins (no
    implementation-defined rounding to disagree with an oracle over).
    Physical shape: narrow projection + ONE partial-agg groupBy on a
    small integer key — the canonical map-side-combine aggregation; edges
    are recomputed per row from the bin id (constant-folded arithmetic),
    never joined.
    """
    if not (nbins > 0 and hi > lo):
        raise ValueError("need nbins > 0 and hi > lo")
    x = F.col(col)
    b = F.floor((x - F.lit(float(lo))) * nbins / F.lit(hi - lo))
    b = F.when(b >= nbins, F.lit(nbins - 1)).otherwise(b)  # x == hi edge
    return (
        df.filter(x.isNotNull() & (x >= lo) & (x <= hi))
        .select(b.cast("long").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit((hi - lo)) / nbins).alias("lo_edge"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit((hi - lo)) / nbins).alias(
                "hi_edge"
            ),
            "n",
        )
    )


def zscore_by_group(
    df: DataFrame, key: str, value_col: str, out_col: str = "zscore", scale: int = 6
) -> DataFrame:
    """Per-group standardization: ``out_col`` = (x − mean) / stddev over the
    row's ``key`` group (sample stddev, n−1). Rows in groups with n ≤ 1 or
    zero variance get NULL.

    Deterministic across engines and partitionings BY CONSTRUCTION: the
    group sums Σx and Σx² go through exact decimal intermediates (x² is
    computed as one correctly-rounded double multiply, then cast — the same
    proven policy as pricing_summary's disc-price decimal), and the
    remaining arithmetic is a FIXED sequence of correctly-rounded IEEE ops:
    mean = S1/n; var = (S2 − S1·S1/n)/(n−1); z = (x − mean)/sqrt(var).
    Never uses stddev_samp/var_samp — their streaming (Welford) update
    order varies with partitioning and disagrees with two-pass engines in
    the low bits.

    Scale shape: ONE hash exchange on ``key`` — the group sums are window
    aggregates over the key partition (whole-partition frame), not a
    groupBy + join-back, so stats and standardized rows share a single
    shuffle."""
    w = Window.partitionBy(key)
    x = F.col(value_col)
    s1 = F.sum(x.cast(f"decimal(30,{scale})")).over(w).cast("double")
    s2 = F.sum((x * x).cast(f"decimal(30,{scale})")).over(w).cast("double")
    n = F.count(x).over(w)
    mean = s1 / n
    var = (s2 - s1 * s1 / n) / (n - 1)
    z = F.when((n > 1) & (var > 0), (x - mean) / F.sqrt(var))
    return df.withColumn(out_col, z)


def corr_by_group(
    df: DataFrame, key: str, x_col: str, y_col: str, scale: int = 4
) -> DataFrame:
    """Per-group Pearson correlation of two measures, deterministic across
    engines and partitionings. Output ``(key, n, corr)``; groups where either
    variance is zero (or n ≤ 1) get NULL ``corr``.

    Rows where EITHER measure is NULL are excluded (pairwise deletion — the
    SQL ``corr`` contract). The five sums Σx, Σy, Σxy, Σx², Σy² go through
    exact decimal intermediates (each product is ONE correctly-rounded double
    multiply before the cast, the proven pricing_summary policy), and the
    closed form is a FIXED sequence of IEEE ops:
    ``(n·Σxy − Σx·Σy) / (sqrt(n·Σx² − Σx²̂) · sqrt(n·Σy² − Σy²̂))`` — sqrt is
    correctly rounded by IEEE 754, so any engine agrees bit-for-bit. Never
    uses the built-in ``corr`` (co-moment streaming update order varies with
    partitioning). ``scale`` must cover the exact scale of the PRODUCTS
    (money×money = 4).

    Scale shape: ONE partial-agg groupBy shuffle — five decimal sums + a
    count, all map-side combined; the closed form is per-group scalar math.
    """
    x, y = F.col(x_col), F.col(y_col)
    dec = f"decimal(30,{scale})"
    pairs = df.filter(x.isNotNull() & y.isNotNull())
    agg = pairs.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).cast("double").alias("__sx"),
        F.sum(y.cast(dec)).cast("double").alias("__sy"),
        F.sum((x * y).cast(dec)).cast("double").alias("__sxy"),
        F.sum((x * x).cast(dec)).cast("double").alias("__sxx"),
        F.sum((y * y).cast(dec)).cast("double").alias("__syy"),
    )
    n = F.col("n")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return agg.select(
        key,
        "n",
        F.when((n > 1) & (vx > 0) & (vy > 0), cov / (F.sqrt(vx) * F.sqrt(vy))).alias("corr"),
    )


def mad_outliers_by_group(
    df: DataFrame, key: str, value_col: str, k: float = 4.45
) -> DataFrame:
    """Robust per-group outlier flagging via Median Absolute Deviation: a row
    is an outlier when ``|x − median| > k · MAD`` where ``MAD =
    median(|x − median|)`` over the row's group. Appends ``med``, ``mad``,
    ``is_outlier`` (NULL value ⇒ NULL flag; MAD = 0 ⇒ only exact-median rows
    are inliers, the standard degenerate case).

    Unlike z-scores, median/MAD don't move when the outliers themselves get
    more extreme — the robust default for score-hygiene on heavy-tailed
    quality/reward distributions. ``k = 4.45 ≈ 3 / 0.6745`` corresponds to
    3σ under normality (1/0.6745 is the consistency constant).

    Determinism: both medians are exact linear-interpolation percentiles
    (already pinned vs DuckDB ``quantile_cont`` by exact_percentiles_by_type);
    ``|x − med|`` and the ``k·mad`` threshold are fixed-order IEEE ops.

    Scale shape: ONE hash exchange — both medians are whole-partition window
    aggregates over the same key (the second window reuses the first's hash
    partitioning; unbounded frames need no sort), clipping logic is codegen.
    Exact percentile holds each group's values in aggregation state: right
    for bounded groups; for unbounded ones switch to ``percentile_approx``
    (same trade as winsorize_by_group)."""
    w = Window.partitionBy(key)
    x = F.col(value_col)
    with_med = df.withColumn("med", F.percentile(x, F.lit(0.5)).over(w))
    absdev = F.abs(x - F.col("med"))
    with_mad = with_med.withColumn("mad", F.percentile(absdev, F.lit(0.5)).over(w))
    return with_mad.withColumn("is_outlier", absdev > F.lit(k) * F.col("mad"))


def winsorize_by_group(
    df: DataFrame,
    key: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: str = "winsorized",
) -> DataFrame:
    """Per-group winsorization: clip ``value_col`` to its group's [lo, hi]
    EXACT quantiles (linear interpolation) — the standard outlier-taming
    step before averaging noisy quality/reward scores. NULL values pass
    through unclipped.

    The quantiles are window aggregates over the key partition, so — like
    ``zscore_by_group`` — the whole operator is ONE hash exchange; clipping
    is two comparisons in codegen. Exact ``percentile`` sorts each group's
    values in aggregation state: right for bounded groups (types, langs,
    sources); for millions of rows per group switch to
    ``percentile_approx`` (KLL sketch, bounded state) and accept the
    documented rank error — same trade as quality_quantile_filter."""
    if not 0.0 <= lo <= hi <= 1.0:
        raise ValueError("need 0 <= lo <= hi <= 1")
    w = Window.partitionBy(key)
    x = F.col(value_col)
    p_lo = F.percentile(x, F.lit(lo)).over(w)
    p_hi = F.percentile(x, F.lit(hi)).over(w)
    clipped = F.when(x < p_lo, p_lo).when(x > p_hi, p_hi).otherwise(x)
    return df.withColumn(out_col, clipped)


def _select_rank(df: DataFrame, col: str, k: int, nbins: int = 1024) -> float:
    """Exact k-th order statistic (0-based, NULLs excluded) by iterative bin
    narrowing: each pass is ONE full aggregate computing per-bin
    (count, min, max) over the current value range, then the driver keeps
    the bin containing rank k and recurses into its actual [min, max] value
    span. Converges when the target bin holds a single distinct value —
    heavy ties therefore terminate immediately rather than looping.

    Per pass the driver sees ≤ nbins rows (metadata-scale, like AQE stats);
    the data never sorts globally and executor aggregation state is
    O(nbins), unlike ``F.percentile`` whose state holds every distinct
    value per group. Passes needed: ~log_nbins(distinct values) — 3 passes
    cover 1e9 distincts at the default 1024.
    """
    x = F.col(col)
    lo, hi = None, None
    offset = 0  # values strictly below the current range
    for _ in range(64):
        if lo is None:
            cur = df.filter(x.isNotNull())
            b = F.lit(0)
        else:
            cur = df.filter(x.isNotNull() & (x >= lo) & (x <= hi))
            if lo == hi:
                return lo
            # clamp x == hi into the last bin (same shape as histogram_equi_width)
            b = F.floor((x - F.lit(lo)) * nbins / F.lit(hi - lo))
            b = F.when(b >= nbins, F.lit(nbins - 1)).otherwise(b)
        stats = (
            cur.groupBy(b.cast("int").alias("__b"))
            .agg(F.count(F.lit(1)).alias("n"), F.min(x).alias("mn"), F.max(x).alias("mx"))
            .collect()
        )
        if not stats:
            raise ValueError("rank selection over empty input")
        acc = offset
        for r in sorted(stats, key=lambda r: r["__b"]):
            if acc + r["n"] > k:
                if r["mn"] == r["mx"]:
                    return r["mn"]
                lo, hi, offset = r["mn"], r["mx"], acc
                break
            acc += r["n"]
        else:
            raise ValueError(f"rank {k} out of range (counted {acc} values)")
    raise RuntimeError("rank selection failed to converge")


def quantile_exact_global(df: DataFrame, col: str, q: float, nbins: int = 1024) -> float:
    """EXACT global quantile (linear interpolation, SQL ``percentile_cont``
    semantics) computed with bounded executor state and NO global sort —
    the 100 TB path for a whole-corpus median/p99.

    Why not ``F.percentile``: Spark's exact percentile aggregate buffers
    every value in aggregation state — fine per bounded group, a
    driver/executor OOM as a single global aggregate over 100 TB. Why not
    ``percentile_approx``: rank error is unbounded in the VALUE domain on
    heavy-tailed data. This runs 2·~3 metadata-scale passes (multipass
    bin-narrowing per neighboring rank) and returns the exact value Spark's
    own ``percentile`` / DuckDB's ``quantile_cont`` would: interpolation is
    ``lower + (higher − lower) · frac`` — the same op order both engines
    use, so results are bit-identical.
    """
    if not 0.0 <= q <= 1.0:
        raise ValueError("q must be in [0, 1]")
    n = df.filter(F.col(col).isNotNull()).count()
    if n == 0:
        raise ValueError("quantile over empty input")
    rank = q * (n - 1)
    k_lo = int(rank)
    frac = rank - k_lo
    v_lo = _select_rank(df, col, k_lo, nbins)
    if frac == 0.0:
        return float(v_lo)
    v_hi = _select_rank(df, col, k_lo + 1, nbins)
    return float(v_lo + (v_hi - v_lo) * frac)


def histogram_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_range: tuple[float, float],
    y_range: tuple[float, float],
    nx: int,
    ny: int,
) -> DataFrame:
    """2-D equi-width histogram — the scatter-density / heatmap aggregation.
    Rows outside either range (or NULL in either column) are dropped; the
    max edge folds into the last bin per axis (``histogram_equi_width``
    semantics applied independently per axis). Output
    ``(x_bin, y_bin, x_lo, y_lo, n)`` for non-empty cells only.

    Bin arithmetic is the same three fixed-order IEEE ops per axis as the
    1-D histogram — engine-identical. Physical shape: narrow two-column
    projection + ONE partial-agg groupBy on the (small-int, small-int)
    composite key; edges recomputed from bin ids, never joined. Cell count
    is capped at nx·ny regardless of data size."""
    (x_lo, x_hi), (y_lo, y_hi) = x_range, y_range
    if not (nx > 0 and ny > 0 and x_hi > x_lo and y_hi > y_lo):
        raise ValueError("need positive bin counts and non-empty ranges")
    x, y = F.col(x_col), F.col(y_col)

    def bin_(c: Column, lo: float, hi: float, nb: int) -> Column:
        b = F.floor((c - F.lit(float(lo))) * nb / F.lit(hi - lo))
        return F.when(b >= nb, F.lit(nb - 1)).otherwise(b).cast("long")

    return (
        df.filter(
            x.isNotNull() & y.isNotNull()
            & (x >= x_lo) & (x <= x_hi) & (y >= y_lo) & (y <= y_hi)
        )
        .select(
            bin_(x, x_lo, x_hi, nx).alias("x_bin"), bin_(y, y_lo, y_hi, ny).alias("y_bin")
        )
        .groupBy("x_bin", "y_bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "x_bin",
            "y_bin",
            (F.lit(float(x_lo)) + F.col("x_bin") * F.lit(x_hi - x_lo) / nx).alias("x_lo"),
            (F.lit(float(y_lo)) + F.col("y_bin") * F.lit(y_hi - y_lo) / ny).alias("y_lo"),
            "n",
        )
    )


def shrunk_group_mean(
    df: DataFrame,
    key: str,
    value_col: str,
    m: float = 25.0,
    scale: int = 6,
) -> DataFrame:
    """Bayesian-shrunk per-group mean (m-estimate): ``(n·mean_g + m·prior) /
    (n + m)`` with the GLOBAL mean as prior — the standard fix for ranking
    groups by average score when small groups would otherwise dominate the
    extremes. Output ``(key, n, raw_mean, shrunk_mean)``; NULL values are
    excluded from both numerator and count.

    Determinism: group and global sums go through exact decimal
    intermediates; ``raw_mean``, ``prior`` and the shrink formula are a
    fixed sequence of IEEE ops spelled identically in any engine.

    Scale shape: ONE partial-agg groupBy; the one-row global aggregate is
    computed FROM the per-group sums (no second scan of the data) and
    broadcast back."""
    if m < 0:
        raise ValueError("m must be >= 0")
    x = F.col(value_col)
    dec = f"decimal(30,{scale})"
    grp = df.filter(x.isNotNull()).groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).alias("__s"),
    )
    tot = grp.agg(
        F.sum("__s").cast("double").alias("__ts"), F.sum("n").alias("__tn")
    )
    s = F.col("__s").cast("double")
    prior = F.col("__ts") / F.col("__tn")
    return (
        grp.crossJoin(F.broadcast(tot))
        .select(
            key,
            "n",
            (s / F.col("n")).alias("raw_mean"),
            ((s + F.lit(float(m)) * prior) / (F.col("n") + F.lit(float(m)))).alias(
                "shrunk_mean"
            ),
        )
    )


def ols_by_group(
    df: DataFrame,
    key: str,
    x_col,
    y_col,
    qbits: int = 20,
) -> DataFrame:
    """Per-group simple linear regression (OLS): output ``(key, n, slope,
    intercept)`` — the trend primitive (value drift over time per slice,
    price-per-area gradients). Groups with n <= 1 or zero x-variance get
    NULL slope/intercept.

    Determinism by the QUANTIZED-EXACT policy (the label_centroids /
    kNN contract), NOT decimal casts of double products: a double->decimal
    cast rounds the product's exact binary expansion, and the two engines
    implement that rounding differently on arbitrary doubles (observed
    low-bit slope divergence) — whereas ``round(v * 2^qbits)`` rounds the
    SAME IEEE product half-away-from-zero in both engines, always. So x
    and y snap to the 2^-qbits grid as int64, the four sums run exact
    (products via decimal(19,0)*decimal(19,0) — never a bigint overflow),
    and the closed form ``slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)`` is a
    fixed IEEE op sequence over exact integers. Because x and y share one
    grid scale, the slope needs NO rescaling; the intercept divides by
    2^qbits once. Quantization error is <= 2^-qbits per value — pick
    inputs scaled to O(1..1e4) (epoch DAYS, not micros) so grid error is
    negligible and the int64 grid values stay small.

    Scale shape: ONE partial-agg groupBy shuffle; never the built-in
    ``regr_slope`` (streaming co-moment update order varies with
    partitioning)."""
    x = F.col(x_col) if isinstance(x_col, str) else x_col
    y = F.col(y_col) if isinstance(y_col, str) else y_col
    s = float(1 << qbits)
    pairs = df.select(
        F.col(key),
        F.round(x * s).cast("bigint").alias("__x"),
        F.round(y * s).cast("bigint").alias("__y"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    xq = F.col("__x").cast("decimal(19,0)")
    yq = F.col("__y").cast("decimal(19,0)")
    agg = pairs.groupBy(key).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__x")).cast("double").alias("__sx"),
        F.sum(F.col("__y")).cast("double").alias("__sy"),
        F.sum(xq * yq).cast("double").alias("__sxy"),
        F.sum(xq * xq).cast("double").alias("__sxx"),
    )
    n = F.col("n")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = F.when((n > 1) & (vx > 0), cov / vx)
    return agg.select(
        key,
        "n",
        slope.alias("slope"),
        (((F.col("__sy") - slope * F.col("__sx")) / n) / s).alias("intercept"),
    )
