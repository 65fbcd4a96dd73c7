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
    survives. Per partition, Misra-Gries with c = slack·den/num counters
    undercounts any key by at most rows_in_partition/c; summing per-partition
    lower bounds and filtering at ``lb + n_total/c ≥ threshold`` therefore
    never drops a true heavy hitter. Counts are LOWER BOUNDS, not exact —
    re-count the (few) survivors exactly with a semi-join when exact
    frequencies matter. Output ``(col, lb)``.
    """
    import pandas as pd

    if slack < 2:
        raise ValueError("slack must be >= 2 (marker-row filtering assumes c > den/num)")
    c = max(1, (slack * den) // max(1, num))
    out_schema = f"`{col}` string, lb long, rows long"

    def mg(batches):
        counters: dict[str | None, int] = {}
        rows = 0
        for pdf in batches:
            for v in pdf[col]:
                rows += 1
                key = None if v is None else str(v)
                if key in counters:
                    counters[key] += 1
                elif len(counters) < c:
                    counters[key] = 1
                else:
                    # decrement-all step; drop zeros (classic Misra-Gries)
                    dead = []
                    for k2 in counters:
                        counters[k2] -= 1
                        if counters[k2] == 0:
                            dead.append(k2)
                    for k2 in dead:
                        del counters[k2]
        # Counter rows carry rows=0; ONE marker row (lb=0) carries the
        # partition's row count — summing the rows column downstream then
        # counts each partition exactly once (a rows-per-counter-row layout
        # would multiply the total by the counter count). The marker's lb=0
        # merges into the NULL key without changing its lower bound, and a
        # pure-marker NULL group (lb=0) cannot pass the filter for any
        # slack ≥ 2.
        yield pd.DataFrame(
            {
                col: list(counters) + [None],
                "lb": list(counters.values()) + [0],
                "rows": [0] * len(counters) + [rows],
            }
        )

    # Survivors merge per-partition lower bounds; the filter adds back the
    # worst-case total undercount (rows/c summed over partitions = total/c).
    part = df.select(F.col(col).cast("string")).mapInPandas(mg, schema=out_schema)
    merged = part.groupBy(col).agg(F.sum("lb").alias("lb"))
    totals = part.groupBy().agg(F.sum("rows").alias("__rows"))
    return (
        merged.crossJoin(F.broadcast(totals))
        .filter((F.col("lb") + F.col("__rows") / c) * den >= F.col("__rows") * num)
        .select(col, "lb")
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
