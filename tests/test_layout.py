"""Layout-policy tests: partition pruning actually prunes, clustering
actually narrows per-file key ranges, z-values actually interleave. These are
write-side choices whose whole value is read-side plan shape — so the
assertions are on plans and file stats, not row values."""

from __future__ import annotations

import pathlib

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan
from lakehouse_architecture_for_realestatedata_spark.plans.layout import (
    cluster_by,
    partition_stats,
    write_bucketed,
    write_partitioned,
    z_value,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_date", F.to_date("o_orderdate")
    )


def test_partition_pruning_prunes_directories(spark, sf_dir, tmp_path):
    """A date-filtered read of a date-partitioned table must prune at plan
    time: the scan's PartitionFilters carries the predicate, and the read
    touches only matching directories."""
    orders = _orders(spark, sf_dir).withColumn(
        "order_month", F.date_format("order_date", "yyyy-MM")
    )
    path = str(tmp_path / "orders_parted")
    write_partitioned(orders, path, ["order_month"])

    months = [p.name for p in pathlib.Path(path).glob("order_month=*")]
    assert len(months) > 3  # enough partitions for pruning to matter

    one = sorted(months)[0].split("=", 1)[1]
    df = spark.read.parquet(path).filter(F.col("order_month") == one)
    plan = physical_plan(df)
    assert "PartitionFilters" in plan and "order_month" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0], plan
    # pruned read returns exactly the rows of that partition
    expected = orders.filter(F.col("order_month") == one).count()
    assert df.count() == expected


def test_cluster_by_narrows_file_ranges(spark, sf_dir, tmp_path):
    """After range-clustering on o_custkey, each written file must cover a
    narrow, mostly-disjoint custkey range (the precondition for row-group
    skipping). Unclustered, every file spans ~the full key domain."""
    orders = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_clustered")
    cluster_by(orders, ["o_custkey"], n_partitions=8).write.mode("overwrite").parquet(path)

    ranges = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("o_custkey").alias("lo"), F.max("o_custkey").alias("hi"))
        .collect()
    )
    assert len(ranges) >= 4
    domain = max(r["hi"] for r in ranges) - min(r["lo"] for r in ranges)
    spans = [r["hi"] - r["lo"] for r in ranges]
    # each file spans a small slice of the domain, not the whole of it
    assert sorted(spans)[len(spans) // 2] <= domain / 4, (spans, domain)


def test_z_value_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "x long, y long")
    rows = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", z_value(df, ["x", "y"], bits=4).alias("z")).collect()
    }
    assert rows[(0, 0)] == 0
    assert rows[(1, 0)] == 1  # x occupies even bit positions
    assert rows[(0, 1)] == 2  # y occupies odd bit positions
    # 3=0b011, 5=0b101 → interleave(x=011, y=101) = y2x2 y1x1 y0x0 = 10 01 11 = 0b100111
    assert rows[(3, 5)] == 0b100111


def test_z_value_rejects_non_integer_columns_by_name(spark):
    """The r12 driver-red class, retired at the API (VERDICT r13 #6): a
    string/date/double key must raise TypeError naming the column — NOT
    NULL-collapse every row into one z-cell (non-ANSI) or throw
    CAST_INVALID_INPUT at runtime (ANSI)."""
    import pytest

    df = spark.createDataFrame(
        [(1, "HIGH", 2.5)], "x long, prio string, score double"
    )
    with pytest.raises(TypeError, match="prio.*z_value_ranked"):
        z_value(df, ["x", "prio"])
    with pytest.raises(TypeError, match="score"):
        z_value(df, [F.col("x"), F.col("score")])


def test_rank_encode_rejects_too_many_cluster_columns(spark):
    """>63 cluster columns cannot get one interleave bit each: refuse up
    front (ADVICE r13) instead of ZeroDivisionError mid-boundary-trim."""
    import pytest

    from lakehouse_architecture_for_realestatedata_spark.plans.layout import rank_encode

    df = spark.range(4).select(
        *[(F.col("id") + i).alias(f"c{i}") for i in range(64)]
    )
    with pytest.raises(ValueError, match="too many cluster columns"):
        rank_encode(df, [f"c{i}" for i in range(64)])


def test_zorder_clustering_preserves_rows(spark, sf_dir):
    orders = _orders(spark, sf_dir).withColumn(
        "day_int", F.datediff("order_date", F.lit("1990-01-01"))
    )
    clustered = cluster_by(orders, ["day_int", "o_custkey"], n_partitions=4, zorder=True)
    assert clustered.count() == orders.count()
    assert set(clustered.columns) == set(orders.columns)


def test_hilbert_clustering_narrows_both_dims(spark, sf_dir, tmp_path):
    """cluster_by(curve='hilbert'): rank-encoded Hilbert clustering gives
    every written file a narrow range in BOTH dimensions — the liquid-
    clustering property — including on a string column (rank encoding,
    no casts)."""
    orders = _orders(spark, sf_dir)
    path = str(tmp_path / "orders_hilbert")
    cluster_by(
        orders, ["o_orderpriority", "o_custkey"], n_partitions=8,
        curve="hilbert",
    ).write.mode("overwrite").parquet(path)
    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("o_custkey").alias("klo"), F.max("o_custkey").alias("khi"),
            F.count_distinct("o_orderpriority").alias("nprio"),
        )
        .collect()
    )
    assert len(stats) >= 6
    domain = max(r["khi"] for r in stats) - min(r["klo"] for r in stats)
    spans = sorted(r["khi"] - r["klo"] for r in stats)
    assert spans[len(spans) // 2] <= domain * 0.7, spans
    # most files cover a strict subset of the 5 priorities
    assert sum(1 for r in stats if r["nprio"] < 5) >= len(stats) // 2, stats
    got = spark.read.parquet(path)
    assert got.count() == orders.count()
    assert set(got.columns) == set(orders.columns)


def test_column_range_bounds_balances_buckets(spark):
    """Exact path (cardinality <= cap): boundaries split rows into
    frequency-balanced buckets, and range_bucket_id assigns by strict
    literal comparison — a pure row function, no casts."""
    from lakehouse_architecture_for_realestatedata_spark.plans.layout import (
        column_range_bounds,
        range_bucket_id,
    )

    # skewed: value 0 carries half the rows
    df = spark.range(0, 1000).select(
        F.when(F.col("id") < 500, F.lit(0)).otherwise(F.col("id")).alias("v")
    )
    bounds = column_range_bounds(df, "v", 4)
    assert bounds == sorted(bounds) and len(bounds) <= 3
    counts = {
        r["b"]: r["n"]
        for r in df.select(range_bucket_id("v", bounds).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # the heavy value lands alone in bucket 0; remaining rows spread
    assert counts[0] >= 500 and len(counts) >= 3
    assert max(counts.values()) <= 700


def test_column_range_bounds_string_and_sampled(spark):
    """String keys work (no cast anywhere), and the high-cardinality
    deterministic-sample path returns usable ordered boundaries."""
    from lakehouse_architecture_for_realestatedata_spark.plans.layout import (
        column_range_bounds,
        range_bucket_id,
    )

    df = spark.range(0, 20000).select(
        F.format_string("doc-%07d", F.col("id")).alias("s")
    )
    bounds = column_range_bounds(df, "s", 8, cap=64)  # force the sample path
    assert 1 <= len(bounds) <= 7 and bounds == sorted(bounds)
    counts = [
        r["n"]
        for r in df.select(range_bucket_id("s", bounds).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(counts) == len(bounds) + 1
    assert max(counts) < 20000 * 0.6  # no bucket holds the table
    # deterministic: same data -> same boundaries
    assert bounds == column_range_bounds(df, "s", 8, cap=64)


def test_cobucketed_join_needs_no_exchange(spark, sf_dir):
    """The bucketing contract: two tables bucketed on the join key with the
    same bucket count join with ZERO runtime shuffle — the shuffle was paid
    once at write time. At 100 TB this turns every nightly fact⋈fact join
    from a full-table exchange into a local per-bucket merge."""
    from lakehouse_architecture_for_realestatedata_spark.plans.explain import count_shuffles

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        4,
        sort_cols=["o_orderkey"],
    )
    try:
        bo = spark.table("b_orders")
        bl = spark.table("b_lineitem")
        # force the shuffle-sensitive path: no broadcast fallback
        joined = bo.hint("merge").join(bl, "o_orderkey")
        assert count_shuffles(joined) == 0, physical_plan(joined, mode="simple")
        # and the join still answers correctly
        n = joined.count()
        plain = orders.join(
            li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert n == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partition_stats_reports_per_partition_counts(spark, sf_dir, tmp_path):
    orders = _orders(spark, sf_dir).withColumn(
        "order_month", F.date_format("order_date", "yyyy-MM")
    )
    path = str(tmp_path / "orders_stats")
    write_partitioned(orders, path, ["order_month"])
    stats = partition_stats(spark, path, ["order_month"]).collect()
    assert sum(r["count"] for r in stats) == orders.count()


def test_column_range_bounds_nan_deterministic(spark):
    """r15 (ADVICE r14): a NaN in a float clustering column must not make
    the driver-side boundary sort order collect-order-dependent — NaN
    sorts GREATEST, matching Spark's orderBy, so boundaries are stable."""
    from lakehouse_architecture_for_realestatedata_spark.plans.layout import (
        column_range_bounds,
    )

    df = spark.range(0, 100).select(
        F.when(F.col("id") == 7, F.lit(float("nan")))
        .otherwise(F.col("id").cast("double"))
        .alias("v")
    )
    bounds = column_range_bounds(df, "v", 8)
    assert bounds == column_range_bounds(df, "v", 8)
    # every boundary except possibly the LAST is a finite float in sorted
    # order; NaN (if it ever becomes a boundary) can only be last
    finite = [b for b in bounds if b == b]
    assert finite == sorted(finite)
    assert all(b == b for b in bounds[:-1])


def test_with_hilbert_value_replaces_existing_out_col(spark):
    """r15 (ADVICE r14): with_hilbert_value(out_col=...) over a frame that
    ALREADY has out_col must replace it (the old withColumn semantics),
    not emit a duplicate column name."""
    from lakehouse_architecture_for_realestatedata_spark.plans.layout import (
        with_hilbert_value,
    )

    df = spark.range(0, 16).select(
        (F.col("id") % 4).alias("a"),
        (F.col("id") / F.lit(4)).cast("bigint").alias("b"),
        F.lit(-1).cast("bigint").alias("__h"),
    )
    out = with_hilbert_value(df, ["a", "b"], bits=2, out_col="__h")
    assert out.columns.count("__h") == 1
    vals = {r["__h"] for r in out.collect()}
    assert vals == set(range(16))  # a 2-bit 2-D Hilbert index is a bijection
