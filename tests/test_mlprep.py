"""Contracts for the model-in-the-loop curation operators
(operators/mlprep.py): logistic-regression convergence on separable data,
bit-exact partition invariance of the learned weights (the quantized-exact
gradient policy), input validation, and exact Mann-Whitney AUC against an
independent midrank reference including the all-ties degenerate case."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.mlprep import (
    logreg_fit,
    logreg_score,
    mann_whitney_auc,
    standardized_features,
)


def _synth(spark, n=2000, seed=7):
    rng = np.random.RandomState(seed)
    x1, x2 = rng.randn(n), rng.randn(n)
    z = 1.5 * x1 - 2.0 * x2 + 0.3
    y = (1.0 / (1.0 + np.exp(-z)) > rng.rand(n)).astype(int)
    return spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y int",
    )


def test_logreg_converges_and_is_partition_invariant(spark):
    df = _synth(spark)
    w = logreg_fit(df, ["x1", "x2"], "y", n_iters=60, lr=1.0)
    # recovers the generating signs/ordering and better-than-chance accuracy
    assert w[1] > 0.5 and w[2] < -0.5 and abs(w[2]) > abs(w[1])
    acc = (
        logreg_score(df, ["x1", "x2"], w)
        .select(F.avg(((F.col("prob") > 0.5).cast("int") == F.col("y")).cast("double")))
        .first()[0]
    )
    assert acc > 0.75, acc
    # quantized-exact gradients: weights bit-identical under repartitioning
    w2 = logreg_fit(df.repartition(17), ["x1", "x2"], "y", n_iters=60, lr=1.0)
    assert w == w2


def test_logreg_validates_inputs(spark):
    df = _synth(spark, n=200)
    with pytest.raises(ValueError, match="max_abs_feature"):
        logreg_fit(
            df.withColumn("x1", F.col("x1") * 1e6), ["x1", "x2"], "y", n_iters=1
        )
    with pytest.raises(ValueError, match="labels outside"):
        logreg_fit(df.withColumn("y", F.lit(2)), ["x1", "x2"], "y", n_iters=1)
    # standardization brings wild features back inside the bound
    wide = df.withColumn("x1", F.col("x1") * 1e6)
    std = standardized_features(wide, ["x1", "x2"])
    w = logreg_fit(std, ["x1", "x2"], "y", n_iters=30, lr=1.0)
    assert w[1] > 0 and w[2] < 0


def _auc_ref(s, y):
    s, y = np.asarray(s), np.asarray(y)
    order = np.argsort(s, kind="mergesort")
    r = np.empty(len(s))
    ss = s[order]
    i = 0
    while i < len(ss):
        j = i
        while j + 1 < len(ss) and ss[j + 1] == ss[i]:
            j += 1
        r[order[i : j + 1]] = (i + j) / 2.0 + 1
        i = j + 1
    n1 = y.sum()
    n0 = len(y) - n1
    return (r[y == 1].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)


def test_auc_exact_vs_midrank_reference(spark):
    df = _synth(spark, n=1500, seed=11)
    w = logreg_fit(df, ["x1", "x2"], "y", n_iters=40, lr=1.0)
    scored = logreg_score(df, ["x1", "x2"], w)
    got = mann_whitney_auc(scored, "margin", "y").first()
    pdf = scored.select("margin", "y").toPandas()
    ref = _auc_ref(pdf["margin"].values, pdf["y"].values)
    assert got["auc"] == ref  # exact, not approximate
    assert got["n_pos"] + got["n_neg"] == 1500
    assert got["auc"] > 0.8


def test_auc_tie_and_perfect_cases(spark):
    df = spark.createDataFrame(
        [(1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0)], "s double, y int"
    )
    assert mann_whitney_auc(df, "s", "y").first()["auc"] == 0.5
    perfect = spark.createDataFrame(
        [(float(i), int(i >= 5)) for i in range(10)], "s double, y int"
    )
    assert mann_whitney_auc(perfect, "s", "y").first()["auc"] == 1.0


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_quality_classifier_separates_english(spark, sf):
    """The registered query's contract: the learned filter must rank the
    seed positives (raw docs) above the seed negatives (function-word-
    scrubbed variants) — margin AUC well above chance. The corpus's lang
    labels are independent of the text (verified r8), so the seed-set
    bootstrap is the only supervised signal the data actually carries."""
    from lakehouse_architecture_for_realestatedata_spark.queries import registry

    scored = registry()["quality_classifier_scores"].spark_fn(
        spark, f"/root/testdata/{sf}"
    )
    res = mann_whitney_auc(scored, "margin", "y").first()
    assert res["auc"] > 0.7, res["auc"]
