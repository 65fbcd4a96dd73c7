"""Partition-invariance properties: the whole oracle-hash contract rests on
results being bit-identical regardless of how the data is split across tasks.
These tests repartition the same input several ways and demand identical
bits — the property that also makes results stable across cluster sizes
(local[32] today, 1000 executors tomorrow)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import davg, dsum


def test_dsum_bit_identical_across_partitionings(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice"
    )
    results = []
    for n in (1, 3, 32):
        out = (
            li.repartition(n)
            .groupBy("l_returnflag")
            .agg(dsum("l_extendedprice", "s"), davg("l_extendedprice", "a"))
            .collect()
        )
        results.append(sorted((r["l_returnflag"], r["s"], r["a"]) for r in out))
    assert results[0] == results[1] == results[2]  # exact ==, not approx


def test_plain_double_sum_is_why_dsum_exists(spark, sf_dir):
    """Documentation-as-test: plain sum(double) CAN drift across
    partitionings (non-associative IEEE addition). We don't assert it always
    drifts (it may not on small data) — we assert dsum equals the exact
    decimal result, which plain sum is not guaranteed to."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = (
        li.select(F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).alias("d"))
        .collect()[0]["d"]
    )
    got = li.select(dsum("l_extendedprice", "s")).collect()[0]["s"]
    assert got == float(exact)


@settings(max_examples=20, deadline=None)
@given(
    xs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**16 - 1),
            st.integers(min_value=0, max_value=2**16 - 1),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_z_value_orders_like_reference_morton(spark, xs):
    """z_value == the reference pure-python Morton interleave for any 16-bit
    pair (hypothesis-driven)."""
    from lakehouse_architecture_for_realestatedata_spark.plans.layout import z_value

    def morton(x: int, y: int) -> int:
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    df = spark.createDataFrame(xs, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", z_value(df, ["x", "y"], bits=16).alias("z")).collect()
    }
    for x, y in xs:
        assert got[(x, y)] == morton(x, y)


def _hilbert_ref(coords: list[int], bits: int) -> int:
    """Pure-python Skilling axes->Hilbert-index reference (AIP Conf. Proc.
    707, 2004) — the ground truth with_hilbert_value must reproduce."""
    X = list(coords)
    n = len(X)
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        for i in range(n):
            if X[i] & q:
                X[0] ^= p
            else:
                t = (X[0] ^ X[i]) & p
                X[0] ^= t
                X[i] ^= t
        q >>= 1
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = 0
    q = 1 << (bits - 1)
    while q > 1:
        if X[n - 1] & q:
            t ^= q - 1
        q >>= 1
    X = [x ^ t for x in X]
    h = 0
    for lvl in range(bits - 1, -1, -1):
        for i in range(n):
            h = (h << 1) | ((X[i] >> lvl) & 1)
    return h


@settings(max_examples=12, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=40,
    ),
    n_dims=st.integers(min_value=1, max_value=3),
)
def test_hilbert_value_matches_skilling_reference(spark, pts, n_dims):
    """with_hilbert_value == the pure-python Skilling transform for any
    8-bit point set in 1-3 dimensions (hypothesis-driven). Also pins the
    curve's defining property on a fixed 2-D grid: consecutive Hilbert
    indices are unit-distance neighbors (Morton/Z makes diagonal jumps)."""
    from lakehouse_architecture_for_realestatedata_spark.plans.layout import (
        with_hilbert_value,
    )

    cols = ["x", "y", "z"][:n_dims]
    schema = ", ".join(f"{c} long" for c in cols)
    df = spark.createDataFrame([p[:n_dims] for p in pts], schema)
    got = {
        tuple(r[c] for c in cols): r["__h"]
        for r in with_hilbert_value(df, cols, bits=8).collect()
    }
    for p in pts:
        key = p[:n_dims]
        assert got[key] == _hilbert_ref(list(key), 8)


def test_hilbert_consecutive_cells_are_adjacent(spark):
    from lakehouse_architecture_for_realestatedata_spark.plans.layout import (
        with_hilbert_value,
    )
    from pyspark.sql import functions as F

    grid = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = sorted(
        ((r["__h"], r["x"], r["y"])
         for r in with_hilbert_value(grid, ["x", "y"], bits=4).collect())
    )
    assert [h for h, _, _ in rows] == list(range(256))  # a true space-filling curve
    for (h1, x1, y1), (h2, x2, y2) in zip(rows, rows[1:]):
        assert abs(x1 - x2) + abs(y1 - y2) == 1  # unit steps, never diagonal


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=200,
    ),
    n_buckets=st.integers(min_value=2, max_value=16),
)
def test_range_bounds_invariants(spark, vals, n_buckets):
    """column_range_bounds invariants under arbitrary (skewed, duplicated,
    negative) int multisets: boundaries strictly increasing, at most
    n_buckets-1 of them, every bucket id within range, assignment is the
    pure count-of-smaller-bounds function, and the whole thing is
    deterministic (hypothesis-driven)."""
    from lakehouse_architecture_for_realestatedata_spark.plans.layout import (
        column_range_bounds,
        range_bucket_id,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in vals], "v long")
    bounds = column_range_bounds(df, "v", n_buckets)
    assert bounds == sorted(set(bounds))
    assert len(bounds) <= n_buckets - 1
    assert bounds == column_range_bounds(df, "v", n_buckets)  # deterministic
    got = {
        (r["v"], r["b"])
        for r in df.select(
            "v", range_bucket_id("v", bounds).alias("b")
        ).collect()
    }
    for v, b in got:
        assert b == sum(1 for x in bounds if v > x)


def test_blas_knn_bit_identical_across_partitionings(spark, sf_dir):
    """The mapInArrow local cut sees different batch boundaries under every
    partitioning; the merged global top-k must still be bit-identical —
    the property that licenses the BLAS path inside an oracle-hashed query."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        knn_quantized_blas,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 6)
    results = []
    for n in (1, 3, 16):
        out = knn_quantized_blas(emb.repartition(n), q, k=5).collect()
        results.append(sorted((r["query_id"], r["neighbor_id"], r["cosine"]) for r in out))
    assert results[0] == results[1] == results[2]


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", categories=("L", "N", "P", "Zs"), max_codepoint=0x2FFF
            ),
            max_size=120,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_text_function_invariants(spark, texts):
    """Property pins over arbitrary unicode text (hypothesis): quality in
    [0,1]; token/shingle/bpe counts consistent; lang_id only emits known
    profiles; redaction idempotent."""
    from lakehouse_architecture_for_realestatedata_spark.functions import text as T

    df = spark.createDataFrame([(t,) for t in texts], "s string")
    rows = df.select(
        "s",
        T.quality_score("s").alias("q"),
        T.token_count("s").alias("nt"),
        F.size(T.tokens("s")).alias("nt_lower"),
        T.bpe_ish_token_count("s").alias("nb"),
        F.size(T.shingles("s", 3)).alias("nsh"),
        T.lang_id("s").alias("lang"),
        T.redact_pii(T.redact_pii("s")).alias("rr"),
        T.redact_pii("s").alias("r1"),
        T.duplicate_line_ratio("s").alias("dlr"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["q"] <= 1.0
        # Lowercasing can SPLIT a token but never merge two: e.g. 'İ'
        # (U+0130) lowercases to 'i' + combining dot (\p{M}, a splitter).
        # Hypothesis found this; equality is NOT an invariant.
        assert r["nt_lower"] >= r["nt"]
        assert r["nb"] >= r["nt"]  # every \p{L}\p{N} token is >= 1 BPE piece
        # k-shingle count: max(n-k+1, 1-if-any-tokens) bounded by token count
        assert r["nsh"] <= max(r["nt"], 1)
        assert r["lang"] in {"en", "de", "fr", "es", "vi", "und"}
        assert r["rr"] == r["r1"]  # redaction is idempotent
        assert 0.0 <= r["dlr"] < 1.0 or (r["dlr"] == 0.0)
