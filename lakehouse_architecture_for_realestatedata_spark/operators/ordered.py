"""Globally-ordered running totals WITHOUT a single-partition window —
and the two training-data operators built on them: GPT-style sequence
packing and token-budget curation.

The naive Spark spelling — ``Window.orderBy(...)`` with no partitionBy — is
correct and catastrophic: Catalyst moves the ENTIRE table into one partition
to honor the global order, so the operator stops scaling at exactly the
moment it matters. The distributed shape here is the classic two-phase
prefix sum:

  1. derive a DETERMINISTIC low-cardinality bucket from the ordering key
     itself (a fixed range carve-up of the key space — no sampling, unlike
     ``repartitionByRange``, so two executions agree without materializing
     an intermediate);
  2. one slim aggregate computes each bucket's total (column-pruned scan of
     just the value column) and the driver folds them into per-bucket prefix
     offsets — ≤ n_buckets rows, metadata-scale, the same size class as
     AQE's shuffle statistics;
  3. the per-row cumulative sum is then an ordinary PARTITIONED window
     (one hash shuffle on the bucket, each bucket's rows sorted locally)
     plus the broadcast prefix literal.

Every row's running total is exact and partition-invariant; integer value
columns stay integer-exact, which is what lets the registered queries carry
bit-exact DuckDB oracles (the oracle uses the single-threaded global window
— same numbers, different physics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.sampling import _hash_hex

#: Default bucket count for the prefix-sum carve-up. 256 buckets keeps the
#: driver-side fold trivial while letting 100 TB spread across every
#: executor; raise it when a single bucket's rows would not fit one task.
N_BUCKETS = 256


#: Above this many buckets the per-bucket offsets stop being inlined as a
#: create_map literal (a 65536-bucket run would put a 131k-element literal
#: into the expression tree — slow to analyze, serialized into every task)
#: and become a broadcast-joined offsets frame instead.
LITERAL_OFFSET_CAP = 4096


def _prefix_offset_pairs(
    df: DataFrame, bucket: Column, value: Column
) -> list[tuple]:
    """Sorted (bucket, prefix_total) pairs: offset[b] = Σ value over all
    buckets < b. One column-pruned aggregate + a ≤ n_buckets-row collect
    (metadata-scale, like AQE stats)."""
    totals = {
        r["b"]: r["t"]
        for r in df.groupBy(bucket.alias("b")).agg(F.sum(value).alias("t")).collect()
    }
    if None in totals:
        raise ValueError(
            "ordering/bucket column produced NULLs — running totals need "
            "non-null order keys and values"
        )
    acc = 0
    pairs: list[tuple] = []
    for b in sorted(totals):
        pairs.append((b, acc))
        acc += totals[b] or 0
    return pairs


def _apply_offsets(
    with_b: DataFrame, value_col: str
) -> tuple[DataFrame, Column, list[str]]:
    """Attach the per-bucket prefix offset to a frame carrying ``__rt_b``.
    ≤ LITERAL_OFFSET_CAP observed buckets inline as a create_map literal;
    above that the same pairs ride the build side of a BroadcastHashJoin
    instead of bloating every task's expression tree. Returns the
    (possibly joined) frame, the offset column, and the temp columns to
    drop."""
    pairs = _prefix_offset_pairs(with_b, F.col("__rt_b"), F.col(value_col))
    drop = ["__rt_h", "__rt_b"]
    if len(pairs) <= LITERAL_OFFSET_CAP:
        flat: list = []
        for b, off in pairs:
            flat += [F.lit(b), F.lit(off)]
        offset = (
            F.coalesce(F.element_at(F.create_map(*flat), F.col("__rt_b")), F.lit(0))
            if flat
            else F.lit(0)
        )
    else:
        off_type = "double" if any(isinstance(o, float) for _, o in pairs) else "long"
        offs = with_b.sparkSession.createDataFrame(
            pairs, f"__rt_b int, __rt_off {off_type}"
        )
        with_b = with_b.join(F.broadcast(offs), "__rt_b", "left")
        offset = F.coalesce(F.col("__rt_off"), F.lit(0))
        drop.append("__rt_off")
    return with_b, offset, drop


def running_total_by_key(
    df: DataFrame,
    key: str,
    value_col: str,
    salt: str = "",
    out_col: str = "running_before",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Add ``out_col`` = Σ ``value_col`` over all rows strictly before this
    one in the deterministic pseudo-random order (hashed key asc, key asc).

    The hash order is the right default for packing/curation: it decorrelates
    neighbors (a corpus sorted by source/time packs badly) and makes the
    result a pure function of the row set — partition-invariant,
    engine-portable, reproducible."""
    if not 1 <= n_buckets <= 65536:
        raise ValueError("n_buckets must be in [1, 65536]")
    h = _hash_hex(F.col(key), salt)
    # Bucket = scaled 16-bit hash prefix. Scaling (NOT modulo — modulo folds
    # non-contiguous hash ranges into one bucket and breaks the prefix-sum
    # order) keeps bucket asc ≡ hash asc, the invariant _prefix_offset_pairs
    # relies on; hex digits sort lexicographically like numerically, so the
    # string order and the numeric prefix order agree.
    v = F.conv(F.substring(h, 1, 4), 16, 10).cast("long")  # long: v*n_buckets overflows int
    bucket = F.floor(v * F.lit(n_buckets) / F.lit(65536)).cast("int")
    return _running_total(df, h, bucket, key, value_col, out_col)


def _running_total(
    df: DataFrame,
    order_hash: Column,
    bucket: Column,
    key: str,
    value_col: str,
    out_col: str,
) -> DataFrame:
    with_b = df.withColumns({"__rt_h": order_hash, "__rt_b": bucket})
    with_b, offset, drop = _apply_offsets(with_b, value_col)
    w = (
        Window.partitionBy("__rt_b")
        .orderBy(F.col("__rt_h"), F.col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_in_bucket = F.coalesce(F.sum(value_col).over(w), F.lit(0))
    return with_b.withColumn(out_col, cum_in_bucket + offset).drop(*drop)


def pack_sequences(
    df: DataFrame,
    key: str,
    token_col: str,
    max_tokens: int,
    salt: str = "pack-v1",
) -> DataFrame:
    """GPT-style document packing metadata: concatenate the corpus in a
    deterministic pseudo-random order and chunk the token stream at
    ``max_tokens`` boundaries. Each doc gets:

      seq_id     — the training sequence its FIRST token lands in
      seq_offset — its first token's position within that sequence
      n_seqs     — how many sequences it spans (long docs straddle chunks,
                   exactly like real concat-and-chunk loaders)

    A data loader groups by seq_id (plus the spillover rows implied by
    n_seqs > 1) to materialize fixed-length training sequences with zero
    padding waste. Pure metadata — the text column never moves through the
    packer, so the operator's shuffle is (key, n_tokens)-slim."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    out = running_total_by_key(
        df, key, token_col, salt=salt, out_col="__tokens_before"
    )
    first = F.col("__tokens_before")
    # zero-token docs still occupy one boundary position so n_seqs >= 1
    last = first + F.greatest(F.col(token_col), F.lit(1)) - 1
    return (
        out.withColumns(
            {
                "seq_id": (first / max_tokens).cast("bigint"),
                "seq_offset": (first % max_tokens).cast("int"),
                "n_seqs": ((last / max_tokens).cast("bigint") - (first / max_tokens).cast("bigint") + 1).cast("int"),
            }
        )
        .drop("__tokens_before")
    )


def token_budget_head(
    df: DataFrame,
    key: str,
    quality_col: str,
    token_col: str,
    budget: int,
    n_bins: int = 64,
) -> DataFrame:
    """Keep the highest-quality documents whose cumulative token count fits
    ``budget`` — the 'take the best N-token subset' curation step.

    A doc is kept iff the token sum of every STRICTLY better doc (quality
    desc, key asc as tiebreak) is under the budget — so the boundary doc may
    overshoot by at most its own length, the standard greedy-prefix
    contract, and membership is a pure function of the row set.

    Distribution: quality lives in [0, 1], so fixed-width bins over
    (1 - quality) are a deterministic range carve-up of the order — the same
    two-phase prefix sum as ``running_total_by_key``, no sampling, no
    single-partition window. Quality clustering can skew a bin; raise
    ``n_bins`` (a bin is one window partition, not one task's full input)."""
    q = F.col(quality_col)
    bin_ = F.least(
        F.greatest((F.lit(1.0) - q) * n_bins, F.lit(0.0)), F.lit(n_bins - 1.0)
    ).cast("int")
    with_b = df.withColumns({"__rt_h": q, "__rt_b": bin_})
    with_b, offset, drop = _apply_offsets(with_b, token_col)
    w = (
        Window.partitionBy("__rt_b")
        .orderBy(F.col("__rt_h").desc(), F.col(key))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0)) + offset
    return (
        with_b.withColumn("__tokens_before", cum_before)
        .filter(F.col("__tokens_before") < budget)
        .drop(*drop, "__tokens_before")
    )
