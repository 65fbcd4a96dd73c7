"""Deterministic sampling/splitting: partition-invariance, nesting, and the
exact plan shape that makes sample_exact_n scale (TakeOrderedAndProject)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
    hex_threshold,
    sample_exact_n,
    sample_fraction,
    split_assign,
)


def _ids(spark, n=5000):
    return spark.range(n).select(F.col("id").alias("k"))


def test_split_weights_approximate(spark):
    df = split_assign(_ids(spark), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


def test_split_partition_invariant(spark):
    base = _ids(spark)
    a = split_assign(base, "k", {"a": 0.5, "b": 0.5}, salt="x").collect()
    b = split_assign(base.repartition(17), "k", {"a": 0.5, "b": 0.5}, salt="x").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_split_salt_changes_assignment(spark):
    base = _ids(spark, 1000)
    a = {r["k"]: r["split"] for r in split_assign(base, "k", {"a": 0.5, "b": 0.5}, salt="s1").collect()}
    b = {r["k"]: r["split"] for r in split_assign(base, "k", {"a": 0.5, "b": 0.5}, salt="s2").collect()}
    assert any(a[k] != b[k] for k in a)  # independent draw


def test_sample_fraction_nested(spark):
    """Threshold hashing ⇒ smaller fractions are strict subsets of larger."""
    base = _ids(spark)
    small = {r["k"] for r in sample_fraction(base, "k", 0.2).collect()}
    big = {r["k"] for r in sample_fraction(base, "k", 0.5).collect()}
    assert small <= big
    assert abs(len(big) / 5000 - 0.5) < 0.03


def test_sample_exact_n_deterministic(spark):
    base = _ids(spark)
    a = sorted(r["k"] for r in sample_exact_n(base, "k", 100).collect())
    b = sorted(r["k"] for r in sample_exact_n(base.repartition(13), "k", 100).collect())
    assert len(a) == 100 and a == b


def test_sample_exact_n_plan_is_topn(spark):
    plan = sample_exact_n(_ids(spark), "k", 50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # heap top-n, not global sort


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(0.5) == "80000000"
    # fraction 1.0 must sort after EVERY possible hash value
    assert "ffffffff" < hex_threshold(1.0)


def test_sample_fraction_one_keeps_all(spark):
    assert sample_fraction(_ids(spark, 500), "k", 1.0).count() == 500
