"""Deterministic sampling & dataset splitting for training-data pipelines.

A 100 TB curation pipeline needs *reproducible* sampling: re-running the
pipeline (or running it on a re-partitioned copy of the data) must produce the
same train/val/test membership. ``rand()``/``sample()`` don't give that — they
depend on partitioning and task scheduling. Everything here derives membership
from a content hash of a stable key instead:

    bucket(key) = first 8 hex chars of md5(salt || key)

which is (a) partition-invariant, (b) engine-portable (md5 hex is identical in
Spark and DuckDB, and fixed-width lowercase-hex strings compare
lexicographically exactly like the numbers they encode), and (c) statistically
uniform for split purposes. Changing ``salt`` draws a fresh independent split.

Scale notes: all three operators are a narrow projection + filter — no
shuffle, no driver collect. ``sample_exact_n`` adds one global top-n
(TakeOrderedAndProject: per-partition heaps + driver merge of n rows, never a
full sort spill).

The reference's only "sampling" is implicit (daily incremental batches); these
operators are part of the training-data extension scope (BASELINE.json north
star), following the md5-keyed determinism idiom the reference itself uses for
surrogate ids (reference: scripts/normalize_csv.py:60-65).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: width of the hex prefix used for bucketing: 8 hex chars = 32 bits, plenty
#: of resolution for per-mille split weights while staying exact in a double.
_HEX_W = 8
_SPACE = 16**_HEX_W


def _hash_hex(key: Column, salt: str) -> Column:
    """Fixed-width lowercase-hex hash of ``salt || key`` (string-typed)."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, _HEX_W)


def hex_threshold(fraction: float) -> str:
    """The literal h such that P[hash < h] == ``fraction`` (up to 2^-32).
    For fraction ≥ 1 returns ``"g"``, which sorts after every hex string —
    a 9-char hex number would NOT (lexicographic compare is per-char)."""
    v = int(round(fraction * _SPACE))
    if v >= _SPACE:
        return "g"
    return format(v, f"0{_HEX_W}x")


def split_assign(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by hashed key.

    ``weights`` are normalized; assignment is deterministic in (key, salt) and
    independent of partitioning, row order, and cluster size. Rows with equal
    keys always land in the same split (leakage-safe for grouped keys).
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    h = _hash_hex(F.col(key), salt)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name] / total
        cond = h < F.lit(hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, out)


def sample_fraction(df: DataFrame, key: str, fraction: float, salt: str = "") -> DataFrame:
    """Deterministic Bernoulli(fraction) sample by hashed key — a filter, not
    a shuffle; re-runs and re-partitions return the identical row set."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_hash_hex(F.col(key), salt) < F.lit(hex_threshold(fraction)))


def sample_stratified(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample: each stratum value gets
    its own keep-fraction (e.g. downsample boilerplate languages, keep all
    of a rare one) — the language/source rebalancing step of a training-data
    mix. Strata not listed keep ``default_fraction``.

    Same guarantees as ``sample_fraction``: membership is a pure function of
    (key, salt), partition-invariant, engine-portable; the plan is a narrow
    filter against a CASE of hex-threshold literals — no shuffle, no UDF.
    """
    for name, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {name!r} must be in [0, 1], got {f}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    h = _hash_hex(F.col(key), salt)
    thr: Column = F.lit(hex_threshold(default_fraction))
    for name, f in fractions.items():
        thr = F.when(F.col(strata_col) == name, F.lit(hex_threshold(f))).otherwise(thr)
    return df.filter(h < thr)


def sample_exact_n(df: DataFrame, key: str, n: int, salt: str = "") -> DataFrame:
    """Deterministic exactly-n sample: the n rows with the smallest hashed
    key (ties broken by key). Plans as TakeOrderedAndProject — each partition
    keeps an n-row heap and the driver merges heaps, so this scales to any
    input size as long as n itself is driver-sized."""
    return (
        df.withColumn("__sample_h", _hash_hex(F.col(key), salt))
        .orderBy("__sample_h", key)
        .limit(n)
        .drop("__sample_h")
    )


def upsample(
    df: DataFrame,
    key: str,
    weight: float,
    salt: str = "",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Deterministically repeat rows ``weight`` times — the mixture-weight
    primitive of an LLM training mix. weight=2.5 gives every row 2 copies
    plus a third for the deterministic 50% of keys whose hash draw says so;
    weight=0.3 is a plain Bernoulli downsample; copies carry a 0-based
    ``epoch`` index so a loader can interleave epochs.

    Membership and copy count are pure functions of (key, salt): partition-
    invariant, engine-portable (md5-hex draw), re-runnable. The plan is a
    narrow project + explode — no shuffle.
    """
    if weight <= 0:
        raise ValueError(f"weight must be > 0, got {weight}")
    whole = int(weight)
    frac = weight - whole
    h = _hash_hex(F.col(key), salt)
    n_copies = F.lit(whole) + F.when(h < F.lit(hex_threshold(frac)), 1).otherwise(0)
    # sequence(a, b) runs DESCENDING when a > b — guard the zero-copy case
    epochs = F.when(n_copies > 0, F.sequence(F.lit(0), n_copies - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(epoch_col, F.explode(epochs))


def mix_corpus(
    df: DataFrame,
    key: str,
    strata_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Apply per-stratum mixture weights in one pass: each stratum value
    up- or down-samples by its own weight (e.g. {'code': 2.5, 'crawl': 0.4})
    via the same deterministic draw as ``upsample``. One narrow
    project + explode over the whole corpus — no union-per-stratum, no
    shuffle."""
    for name, w in weights.items():
        if w <= 0:
            raise ValueError(f"weight for stratum {name!r} must be > 0, got {w}")
    if default_weight <= 0:
        raise ValueError("default_weight must be > 0")

    h = _hash_hex(F.col(key), salt)

    def copies(w: float):
        whole = int(w)
        frac = w - whole
        return F.lit(whole) + F.when(h < F.lit(hex_threshold(frac)), 1).otherwise(0)

    n: Column = copies(default_weight)
    for name, w in weights.items():
        n = F.when(F.col(strata_col) == name, copies(w)).otherwise(n)
    epochs = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return df.withColumn(epoch_col, F.explode(epochs))


def sample_exact_n_per_group(
    df: DataFrame,
    key: str,
    group_col: str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic exactly-n sample PER GROUP (e.g. 100 eval docs per
    language): the n smallest hashed keys within each group win.

    Plan shape: the rank filter triggers Spark's WindowGroupLimit rewrite —
    each map task keeps only its n best rows per group BEFORE the exchange,
    so the shuffle carries ≤ #partitions × #groups × n rows, never the full
    table. Same md5 determinism contract as the other samplers."""
    from pyspark.sql import Window

    h = _hash_hex(F.col(key), salt)
    w = Window.partitionBy(group_col).orderBy(F.col("__sample_h"), F.col(key))
    return (
        df.withColumn("__sample_h", h)
        .withColumn("__sample_rn", F.row_number().over(w))
        .filter(F.col("__sample_rn") <= n)
        .drop("__sample_h", "__sample_rn")
    )


def sample_weighted(
    df: DataFrame, key: str, weight_col: Column | str, salt: str = ""
) -> DataFrame:
    """Deterministic per-row-probability Bernoulli sample: keep each row with
    probability ``weight_col`` (a [0, 1] column — e.g. a quality score, or a
    length-proportional keep rate), decided by the md5-hashed ``key``. The
    curation step between all-or-nothing filtering and uniform sampling:
    soft-downweight low-quality documents instead of dropping them outright.

    Contract: weight ≥ 1 keeps always; weight ≤ 0 or NULL drops always;
    membership is a pure function of (key, salt, weight) — partition-
    invariant, re-run-stable, engine-portable.

    The per-row threshold stays in the PROVEN hex-string comparison domain:
    ``floor(weight · 16^8)`` rendered as zero-padded 8-char lowercase hex
    (every step — one double multiply, floor, int→hex — is exact/identical
    in any engine; no float parse of the hash). Plan: narrow codegen filter,
    zero shuffle, zero UDF — same 100 TB shape as ``sample_fraction``.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    v = F.floor(w * F.lit(float(_SPACE))).cast("bigint")
    # Spark conv() emits uppercase hex; md5() emits lowercase — normalize.
    thr = F.when(w >= 1.0, F.lit("g")).otherwise(
        F.lpad(F.lower(F.conv(v.cast("string"), 10, 16)), _HEX_W, "0")
    )
    return df.filter(w.isNotNull() & (w > 0) & (_hash_hex(F.col(key), salt) < thr))


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    weights: dict[str, float],
    salt: str = "",
    src: str = "id_a",
    dst: str = "id_b",
    broadcast_max_labels: int = 4_000_000,
) -> DataFrame:
    """Train/val/test assignment that can NEVER split a near-duplicate group
    across splits: rows whose ids are connected in ``pairs`` (a near-dup
    edge list from any dedup operator) inherit ONE split, decided by the
    md5-hashed minimum id of their connected component; singletons hash
    their own id — i.e. plain ``split_assign`` degraded gracefully.

    This closes the classic eval-leakage hole: hashing raw ids puts two
    near-identical documents in train and test with probability
    2·p(train)·p(test); hashing the component label makes it impossible.

    Scale shape: component labels exist only for ids that appear in
    ``pairs`` — USUALLY the near-duplicate minority, ≪ corpus, so the
    label join broadcasts. That assumption is now GUARDED, not assumed: a
    boilerplate-heavy crawl can make most of the corpus near-duplicate, and
    broadcasting a corpus-sized label frame OOMs the driver. When the label
    count (already materialized by connected_components' lineage
    truncation — the count is metadata-cheap) exceeds
    ``broadcast_max_labels``, the join falls back to a plain shuffle
    hash/merge join on the id — one extra exchange, unbounded-safe,
    identical output. The split itself stays the zero-shuffle hex
    threshold filter either way. Output: ``df``'s columns + ``split``."""
    from lakehouse_architecture_for_realestatedata_spark.operators.graph import (
        connected_components,
    )

    labels = connected_components(pairs, src=src, dst=dst)
    label_side = labels.select(F.col("node"), F.col("label"))
    if labels.count() <= broadcast_max_labels:
        label_side = F.broadcast(label_side)
    with_key = df.join(
        label_side,
        df[id_col] == F.col("node"),
        "left",
    ).select(
        *[df[c] for c in df.columns],
        F.coalesce(F.col("label"), df[id_col]).alias("__split_key"),
    )
    return split_assign(with_key, "__split_key", weights, salt=salt).drop("__split_key")


def sample_weighted_exact_n(
    df: DataFrame,
    key: str,
    weight_col: str | Column,
    n: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY-n weighted sample WITHOUT replacement — the
    Efraimidis-Spirakis A-ES scheme: each row draws u ~ Uniform(0,1) from
    its md5-hashed key (deterministic "randomness", the module contract)
    and the n LARGEST u^(1/w) win. Inclusion probability is the exact
    sequential weighted-sampling-without-replacement law (≈ n·w/Σw when
    n ≪ N). Complements ``sample_weighted`` (per-row Bernoulli, random
    output size) and ``sample_exact_n`` (uniform): this is the budgeted
    corpus-mix pick — "exactly 100k docs, quality-weighted".

    Rows with NULL or non-positive weight never win. Ranking uses
    ``ln(u)/w`` (monotone in u^(1/w), better-conditioned); u maps from
    the first 13 hex digits of md5(salt||key) into (0,1) — never exactly
    0 or 1, so the log is finite. Deterministic for a fixed salt and
    partition-invariant; NOT cross-engine hash-exact (ln is
    transcendental), so the contract is pytest: inclusion frequencies
    over many salts track weights, same-salt runs are identical.

    Scale shape: narrow scoring pass + ``orderBy().limit(n)`` —
    TakeOrderedAndProject (per-partition heaps of n, driver merge of
    n·P rows), never a global sort."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h13 = F.substring(F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 13)
    u = (F.conv(h13, 16, 10).cast("double") + 1.0) / F.lit(float(16**13 + 1))
    score = F.log(u) / w
    return (
        df.filter(w.isNotNull() & (w > 0))
        .orderBy(score.desc(), F.col(key))
        .limit(n)
    )


def sample_weighted_exact_n_by_group(
    df: DataFrame,
    key: str,
    group_col: str,
    weight_col: str | Column,
    n: int,
    salt: str = "",
) -> DataFrame:
    """EXACTLY-n weighted sample without replacement PER GROUP — the
    stratified twin of ``sample_weighted_exact_n`` ("exactly 1k docs per
    language, quality-weighted", the per-slice corpus budget): within each
    ``group_col`` value, the n largest A-ES ranks ``ln(u)/w`` win, u drawn
    deterministically from md5(salt||key). Same determinism contract as
    the global variant (salt-reproducible, partition-invariant, NOT
    cross-engine hash-exact — ln is transcendental).

    Scale shape: a rank-ONLY window partitioned by group → Spark's
    WindowGroupLimit rewrite keeps the map-side n-cut (each task ships ≤ n
    rows per group before the exchange, the ``_topk_per_query`` plan) —
    never a global sort, never a per-group TakeOrdered loop."""
    from pyspark.sql import Window

    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h13 = F.substring(F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))), 1, 13)
    u = (F.conv(h13, 16, 10).cast("double") + 1.0) / F.lit(float(16**13 + 1))
    score = F.log(u) / w
    win = Window.partitionBy(group_col).orderBy(score.desc(), F.col(key))
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def sample_mixture_by_group(
    df: DataFrame,
    group_col: str,
    key: str,
    target_total: float,
    salt: str = "",
) -> DataFrame:
    """Temperature-weighted mixture sampling — THE training-mix rebalance
    (multilingual upsampling à la XLM-R / mC4): each group g (language,
    source domain) gets a sampling budget ∝ sqrt(n_g) (temperature α=½ —
    sub-linear, so low-resource groups are upweighted relative to their
    share) normalized to ``target_total`` rows in expectation, and rows
    are kept by the deterministic md5-threshold Bernoulli of
    ``sample_weighted`` at rate budget_g / n_g (clamped keep-all at ≥ 1).

    Cross-engine hash-exact ON PURPOSE, so it carries a hard oracle:
    sqrt / * / / are correctly-rounded IEEE ops applied in a pinned
    left-to-right order, the normalizer is an ORDERED running sum over
    the (metadata-scale, one row per group) weight frame — a fixed
    association both engines replay — and the final keep decision lives
    in the proven hex-threshold domain. NULL groups are dropped.

    Scale shape: one partial-agg groupBy(|groups| rows) + one broadcast
    join + a narrow codegen filter — no full-data shuffle beyond the
    count, no UDF; the data-side cost is ``sample_weighted``'s."""
    from pyspark.sql import Window

    d = df.filter(F.col(group_col).isNotNull())
    per = d.groupBy(group_col).agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    w = per.withColumn("__sw", F.sqrt(F.col("__n").cast("double")))
    # ordered running sum over ≤|groups| rows (bounded frame by
    # construction — one row per group), so the float association is the
    # same left-to-right fold in every engine
    win = Window.orderBy(group_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = w.withColumn("__cw", F.sum("__sw").over(win))
    total = cum.agg(F.max("__cw").alias("__W"))
    rates = (
        w.crossJoin(F.broadcast(total))
        .withColumn(
            "__rate",
            F.col("__sw")
            * F.lit(float(target_total))
            / F.col("__W")
            / F.col("__n").cast("double"),
        )
        .select(group_col, "__rate")
    )
    out = d.join(F.broadcast(rates), group_col)
    return sample_weighted(out, key, F.col("__rate"), salt).drop("__rate")
