"""Model-in-the-loop curation operators: a distributed logistic-regression
trainer (the fastText/CCNet-style learned quality filter every large corpus
pipeline ends up training) and an exact Mann-Whitney AUC evaluator.

The reference has no ML training surface (its pipeline stops at dbt marts);
this extends the training-data-pipeline scope established in SURVEY §2's
extension inventory, like the dedup/ANN families.

Determinism discipline (the repo's quantized-exact policy): every
cross-partition reduction is an exact integer/decimal sum — per-row float
math (sigmoid etc.) is a fixed IEEE expression evaluated once per row, so
it is bit-identical regardless of partitioning; the only order-sensitive
step, the gradient SUM, is quantized to scaled integers summed in
decimal(38,0). Weights therefore come out bit-identical however the input
is partitioned (pinned in tests/test_mlprep.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.windows import global_running_sum


def _margin(feature_cols: list[str], w: list[float]) -> Column:
    """w0 + Σ w_j x_j as a FIXED-ORDER expression tree (left fold in column
    order): correctly-rounded IEEE ops in a deterministic order, so the
    margin is bit-stable across partitionings and plans."""
    z: Column = F.lit(float(w[0]))
    for j, c in enumerate(feature_cols):
        z = z + F.lit(float(w[j + 1])) * F.col(c).cast("double")
    return z


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    n_iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
    qbits: int = 30,
    max_abs_feature: float = 64.0,
) -> list[float]:
    """Train binary logistic regression by full-batch gradient descent.
    Returns ``[w0, w1, ..., wd]`` (intercept first).

    Scale shape (the Lloyd/PCA discipline): each iteration is ONE narrow
    pass over the corpus — broadcast-free, the current weights fold into
    the row expression as literals — followed by ONE partial-aggregated
    sum of d+1 quantized gradient components, so the shuffle is
    d+1 decimals regardless of corpus size. The driver applies the step
    (d-scale work) and re-plans; n_iters bounded, lineage never grows
    because each iteration re-derives from the source frame.

    Determinism: per-row sigmoid/multiply is fixed IEEE math; gradient
    components quantize to round(g·2^qbits) and sum in decimal(38,0) —
    exact and associative, so the learned weights are partition-invariant
    bit for bit. Features must be bounded (|x| ≤ ``max_abs_feature``,
    checked with one tiny aggregate): bounded ratios/z-scores are the
    intended inputs, and the bound keeps every quantized term far inside
    the decimal's 38 digits even at 10^12 rows.
    """
    d = len(feature_cols)
    if d == 0:
        raise ValueError("feature_cols must be non-empty")
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    bounds = feats.agg(
        *[F.max(F.abs(F.col(c))).alias(c) for c in feature_cols],
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.when((F.col("__y") != 0) & (F.col("__y") != 1), 1).otherwise(0)).alias(
            "__bad"
        ),
    ).collect()[0]
    n = bounds["__n"]
    if n == 0:
        raise ValueError("empty training frame")
    if bounds["__bad"]:
        raise ValueError(f"{bounds['__bad']} labels outside {{0,1}}")
    for c in feature_cols:
        if bounds[c] is not None and bounds[c] > max_abs_feature:
            raise ValueError(
                f"|{c}| reaches {bounds[c]:.3g} > max_abs_feature="
                f"{max_abs_feature}; standardize or clip features first"
            )
    scale = float(1 << qbits)
    feats = feats.localCheckpoint(eager=True)  # d+2 columns; scans n_iters times
    w = [0.0] * (d + 1)
    for _ in range(n_iters):
        z = _margin(feature_cols, w)
        # residual p - y; sigmoid spelled once, CSE'd by codegen
        r = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))) - F.col("__y")
        gq = [F.round(r * scale).cast("decimal(38,0)").alias("g0")] + [
            F.round(r * F.col(c) * scale).cast("decimal(38,0)").alias(f"g{j+1}")
            for j, c in enumerate(feature_cols)
        ]
        sums = feats.select(*gq).agg(
            *[F.sum(f"g{j}").alias(f"g{j}") for j in range(d + 1)]
        ).collect()[0]
        for j in range(d + 1):
            g = float(sums[f"g{j}"] or 0) / scale / n
            reg = l2 * w[j] if j > 0 else 0.0
            w[j] = w[j] - lr * (g + reg)
    return w


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    w: list[float],
    margin_col: str = "margin",
    prob_col: str = "prob",
) -> DataFrame:
    """Score rows with trained weights: adds the raw margin (fixed-IEEE,
    partition-invariant) and the sigmoid probability. Purely narrow."""
    z = _margin(feature_cols, w)
    return df.withColumn(margin_col, z).withColumn(
        prob_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(margin_col)))
    )


def mann_whitney_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    out_col: str = "auc",
) -> DataFrame:
    """Exact ROC AUC as the Mann-Whitney U statistic with midrank tie
    handling — the standard eval for a quality/toxicity classifier over a
    labeled sample. Returns one row: (auc, n_pos, n_neg).

    Scale shape: NO global sort of the corpus — rows first collapse to one
    row per DISTINCT score (partial-aggregated counts), then the exclusive
    prefix sum of negatives over the score order runs through
    ``global_running_sum`` (two-phase range repartition; no single-task
    window). AUC = Σ_s n_pos(s)·(neg_below(s) + n_neg(s)/2) / (N⁺·N⁻).

    Exactness: counts are integers; every product is integer × multiple of
    0.5 — binary-exact doubles whose sum is order-independent below 2^53 —
    and ONE final division. Bit-identical across engines, so the
    registered query carries a hard oracle.
    """
    t = df.select(
        F.col(score_col).cast("double").alias("__s"),
        F.when(F.col(label_col).cast("double") != 0, 1).otherwise(0).alias("__y"),
    ).where(F.col("__s").isNotNull())
    # materialize the distinct-score frame (≤ #distinct scores, tiny vs the
    # corpus): global_running_sum's literal-boundary pass plus the main job
    # would otherwise re-run the corpus aggregate once each
    g = t.groupBy("__s").agg(
        F.sum("__y").alias("__np"),
        F.sum(1 - F.col("__y")).alias("__nn"),
    ).localCheckpoint(eager=True)
    c = global_running_sum(g, [F.col("__s")], "__nn", out_col="__cum_nn", scale=0)
    term = (
        F.col("__np").cast("double")
        * (
            (F.col("__cum_nn") - F.col("__nn")).cast("double")
            + F.col("__nn").cast("double") / 2.0
        )
    )
    return c.agg(
        F.sum(term).alias("__u"),
        F.sum("__np").alias("n_pos"),
        F.sum("__nn").alias("n_neg"),
    ).select(
        (
            F.col("__u") / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
        ).alias(out_col),
        "n_pos",
        "n_neg",
    )


def standardized_features(
    df: DataFrame, feature_cols: list[str], clip: float = 8.0
) -> DataFrame:
    """Center/scale features to clipped z-scores using quantized-exact
    moments (operators.aggregates zscore policy: Σx, Σx² through decimal),
    making raw document statistics safe inputs for ``logreg_fit``'s
    bounded-feature contract. One tiny aggregate, broadcast constants,
    narrow projection."""
    aggs = []
    for c in feature_cols:
        x = F.col(c).cast("double")
        aggs += [
            F.sum(x.cast("decimal(30,6)")).alias(f"__s1_{c}"),
            F.sum((x * x).cast("decimal(30,6)")).alias(f"__s2_{c}"),
        ]
    aggs.append(F.count(F.lit(1)).alias("__n"))
    row = df.agg(*aggs).collect()[0]
    n = float(row["__n"])
    out = df
    for c in feature_cols:
        s1, s2 = float(row[f"__s1_{c}"]), float(row[f"__s2_{c}"])
        mean = s1 / n
        var = max(s2 / n - mean * mean, 0.0)
        sd = math.sqrt(var) or 1.0
        z = (F.col(c).cast("double") - F.lit(mean)) / F.lit(sd)
        out = out.withColumn(c, F.greatest(F.least(z, F.lit(clip)), F.lit(-clip)))
    return out
