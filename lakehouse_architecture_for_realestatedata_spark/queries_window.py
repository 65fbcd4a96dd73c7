"""Analytic-window and multi-dimensional aggregate queries (lag/lead, rolling
frames, ntile, rank family, rollup/cube, global top-k) — the BI-serving
surface a gold layer implies (SURVEY.md §2.5-2.6 note these as
engine-required even where the reference's dbt models don't exercise them).

All oracle-checked: every query here is ANSI-SQL-expressible, so DuckDB twins
hash-compare exactly (decimal-exact sums, total orderings with unique
tiebreaks, no raw float aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
    daily_measure,
    global_top_k,
    ntile_buckets,
    period_over_period,
    ranked_in_group,
    rolling_frame,
)
from lakehouse_architecture_for_realestatedata_spark.queries import _t, register

# Shared oracle CTE: exact-decimal daily revenue (matches operators.windows.daily_measure)
_DAILY_DEC = """
    daily AS (
        SELECT cast(o_orderdate AS date) AS day,
               sum(cast(o_totalprice AS decimal(30,2))) AS dec_rev
        FROM orders GROUP BY 1
    )
"""


@register(
    "window_functions_daily",
    f"""
    WITH {_DAILY_DEC}
    SELECT day,
           cast(dec_rev as double) AS revenue,
           cast(lag(dec_rev) OVER (ORDER BY day) as double) AS prev_value,
           cast(dec_rev - lag(dec_rev) OVER (ORDER BY day) as double) AS delta,
           cast(sum(dec_rev) OVER w as double) AS rolling_sum,
           cast(sum(dec_rev) OVER w as double) / count(dec_rev) OVER w AS rolling_avg
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    doc="lag (period-over-period delta) + rowsBetween rolling frame over the "
    "bounded daily rollup — aggregate first, window the small frame. The two "
    "operator outputs are re-joined on day: every input is the ~#days "
    "aggregate (broadcast-sized at any data scale), so the composition costs "
    "nothing while keeping both library operators independently exercised; "
    "frame sums stay exact decimal so both engines agree bit-for-bit.",
)
def q_window_functions_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = daily_measure(_t(spark, sf_dir, "orders"), "o_orderdate", "o_totalprice")
    pop = period_over_period(daily, "day", "__dec")
    roll = rolling_frame(daily, "day", "__dec", preceding=6)
    # Same-ordered windows over the same bounded frame: the join is a
    # broadcast over ~#days rows, and both Window sorts reuse one exchange.
    return pop.join(roll, "day").select(
        "day",
        F.col("value").alias("revenue"),
        F.col("prev_value").cast("double").alias("prev_value"),
        F.col("delta").cast("double").alias("delta"),
        "rolling_sum",
        "rolling_avg",
    )


@register(
    "ntile_customer_quartiles",
    """
    WITH t AS (
        SELECT c_custkey, c_acctbal,
               ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS bucket
        FROM customer
    )
    SELECT bucket,
           count(*) AS n_customers,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
    FROM t GROUP BY bucket
    """,
    doc="ntile(4) wealth quartiles over a total order (unique tiebreak), "
    "reduced to per-bucket stats.",
)
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    b = ntile_buckets(cust, [F.col("c_acctbal"), F.col("c_custkey")], n=4)
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
    )


@register(
    "rank_orders_in_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, dense_rnk, pct_rnk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               rank()         OVER w AS rnk,
               dense_rank()   OVER w AS dense_rnk,
               percent_rank() OVER w AS pct_rnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rnk <= 5
    """,
    doc="rank/dense_rank/percent_rank within priority groups, top-5 per "
    "group — one hash-partition shuffle, no global sort.",
)
def q_rank_in_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderkey", "o_totalprice")
    return ranked_in_group(
        o,
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=5,
    )


@register(
    "rollup_revenue",
    """
    SELECT coalesce(o_orderpriority, 'ALL') AS priority,
           coalesce(o_orderstatus, 'ALL') AS status,
           cast(grouping(o_orderpriority) * 2 + grouping(o_orderstatus) as bigint) AS gid,
           count(*) AS n_orders,
           cast(sum(cast(o_totalprice as decimal(30,2))) as double) AS revenue
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP (priority, status): subtotal hierarchy in one pass — Spark "
    "expands grouping sets map-side, still partial+final hash aggregation.",
)
def q_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "gid",
            "n_orders",
            "revenue",
        )
    )


@register(
    "cube_status_year",
    """
    SELECT coalesce(o_orderstatus, 'ALL') AS status,
           coalesce(cast(year(o_orderdate) as bigint), -1) AS order_year,
           count(*) AS n_orders,
           cast(sum(cast(o_totalprice as decimal(30,2))) as double) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, year(o_orderdate))
    """,
    doc="CUBE (status, year): all 4 grouping sets in one aggregation pass.",
)
def q_cube_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("bigint")
    )
    return (
        o.cube("o_orderstatus", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double").alias("revenue"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("order_year", F.lit(-1)).alias("order_year"),
            "n_orders",
            "revenue",
        )
    )


@register(
    "exact_percentiles_by_type",
    """
    SELECT event_type,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.50) AS p50,
           quantile_cont(value, 0.75) AS p75
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per event_type (Spark percentile ≡ "
    "DuckDB quantile_cont: both (1-g)·lower + g·upper on the sorted set). "
    "Exact percentile sorts each group's values — fine at dashboard "
    "granularity; the approx twin below is the 100 TB path.",
)
def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _events

    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.50).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
    )


@register(
    "approx_sketches_by_type",
    None,  # HLL and KLL sketch estimates are implementation-specific;
    # error bounds vs exact are asserted in tests/test_queries_contract.py
    doc="Sketch aggregates per event_type: HyperLogLog++ distinct users and "
    "KLL-sketch median — mergeable, bounded-memory partial aggregates, the "
    "only viable shapes for distinct-count/percentile at 100 TB.",
)
def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _events

    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10_000).alias("approx_p50"),
    )


@register(
    "global_topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="Global top-100 orders by value: TakeOrderedAndProject (per-partition "
    "heaps + driver merge), never a total sort of the table.",
)
def q_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return global_top_k(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], k=100)


@register(
    "histogram_order_prices",
    """
    SELECT bin,
           0.0 + bin * 500000.0 / 25 AS lo_edge,
           0.0 + (bin + 1) * 500000.0 / 25 AS hi_edge,
           n
    FROM (
        SELECT CASE WHEN b >= 25 THEN 24 ELSE b END AS bin, count(*) AS n
        FROM (
            SELECT cast(floor((o_totalprice - 0.0) * 25 / 500000.0) AS bigint) AS b
            FROM orders
            WHERE o_totalprice IS NOT NULL
              AND o_totalprice >= 0.0 AND o_totalprice <= 500000.0
        ) GROUP BY 1
    )
    """,
    doc="Equi-width histogram of order prices: 25 bins over [0, 500000], "
    "right-inclusive final edge. Bin id is a fixed IEEE op sequence "
    "(sub, mul, div, floor) so engines agree bit-for-bit; one narrow "
    "partial-agg groupBy on a 25-value integer key "
    "(operators/aggregates.py:histogram_equi_width).",
)
def q_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
        histogram_equi_width,
    )

    return histogram_equi_width(
        _t(spark, sf_dir, "orders"), "o_totalprice", 0.0, 500000.0, 25
    )


_GSETS_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           grouping(o_orderpriority) AS g_prio,
           grouping(o_orderstatus) AS g_status,
           count(*) AS n,
           cast(sum(cast(o_totalprice AS decimal(30,2))) AS double) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus),
                            (o_orderpriority, o_orderstatus), ())
"""


@register(
    "grouping_sets_revenue",
    _GSETS_SQL,
    doc="Explicit GROUPING SETS — the generalized form behind ROLLUP/CUBE "
    "(both already driver-green): four simultaneous grains in ONE pass "
    "via Catalyst's Expand (each input row fans to its grouping sets, one "
    "partial-agg shuffle total — never four scans), with grouping() flags "
    "disambiguating real NULLs from subtotal rows. Identical SQL text runs "
    "on both engines.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GSETS_SQL)
