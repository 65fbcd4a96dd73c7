"""Vectorized signature sketches (MinHash / SimHash / hyperplane-LSH).

Why this module exists: Spark's higher-order functions (``transform`` /
``aggregate`` / ``zip_with``) are evaluated INTERPRETED, one lambda frame per
array element — they sit inside a WholeStageCodegen span but fall back to
expression interpretation. A 64-seed MinHash over k-shingles written that way
costs ~50 ms/doc single-core (measured at sf0.1): 3 000+ interpreted lambda
steps per row. That is the difference between a 10-minute and a 17-hour pass
over 100 TB.

The scale design splits each sketch into:
  1. **JVM-side tokenize+hash** — ``xxhash64`` over shingles/tokens, computed
     ONCE per row with built-ins (codegen'd), producing ``array<bigint>``;
  2. **Arrow-batched numpy kernel** — the seed×element min/vote/projection
     loop as a vectorized ``pandas_udf``: one numpy op per seed over the
     flattened batch, ~1 µs/row, deterministic (seeded ``default_rng``,
     wrap-around uint64 multiply-shift hashing — no RNG at eval time).

Signatures are returned BIT-PACKED where possible (``bigint`` SimHash /
hyperplane sketches) so downstream banding and Hamming distance are scalar
codegen ops (``shiftrightunsigned``, ``bit_count(xor)``), not array walks.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from lakehouse_architecture_for_realestatedata_spark.functions.text import shingles, tokens

_U64 = np.uint64
_EMPTY_SENTINEL = np.int64(2**63 - 1)


def hashed_shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles hashed to ``array<bigint>`` via xxhash64 — computed
    once, JVM-side. This is the unit-set representation every fuzzy-dedup
    sketch consumes; Jaccard over these hashes equals Jaccard over the
    string shingles up to 2^-64 collision noise."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(shingles(c, k), lambda t: F.xxhash64(t))


def hashed_tokens(col: Column | str) -> Column:
    """Tokens hashed to ``array<bigint>`` (xxhash64), JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(tokens(c), lambda t: F.xxhash64(t))


def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic multiply-shift family: h_i(x) = a_i*x + b_i (mod 2^64),
    a_i odd. Seeded PCG64 streams are stable across numpy versions."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 2**62, size=num_hashes, dtype=_U64) * _U64(2) + _U64(1)
    b = rng.integers(0, 2**63, size=num_hashes, dtype=_U64)
    return a, b


def _flatten_batch(s: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat int64 values, per-row lengths, segment offsets) for one Arrow
    batch of array<bigint>; None rows become length 0."""
    arrs = [np.asarray(a, dtype=np.int64) if a is not None else np.empty(0, np.int64) for a in s]
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
    flat = np.concatenate(arrs) if len(arrs) else np.empty(0, np.int64)
    offsets = np.zeros(len(arrs), dtype=np.int64)
    if len(arrs) > 1:
        np.cumsum(lens[:-1], out=offsets[1:])
    return flat, lens, offsets


def minhash_signature(col: Column | str, num_hashes: int = 64, seed: int = 42) -> Column:
    """MinHash signature ``array<bigint>`` (length ``num_hashes``) over a
    pre-hashed shingle array (see ``hashed_shingles``).

    Kernel: per seed i, one vectorized ``a_i*flat+b_i`` pass over the whole
    Arrow batch plus a segmented min (``np.minimum.reduceat``) — O(seeds ×
    batch_elements) numpy ops, no per-row Python. Empty/null shingle sets get
    the max-int64 sentinel signature (never joins a band with real docs
    except against other empties)."""
    a_params, b_params = _hash_params(num_hashes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def _minhash(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            flat, lens, offsets = _flatten_batch(s)
            n_rows = len(lens)
            out = np.full((n_rows, num_hashes), _EMPTY_SENTINEL, dtype=np.int64)
            if flat.size:
                x = flat.view(_U64)
                nonempty = lens > 0
                # reduceat needs strictly valid segment starts; empty rows are
                # masked out afterwards.
                safe_off = np.minimum(offsets, max(flat.size - 1, 0))
                for i in range(num_hashes):
                    hx = (a_params[i] * x + b_params[i]).view(np.int64)
                    mins = np.minimum.reduceat(hx, safe_off)
                    out[nonempty, i] = mins[nonempty]
            yield pd.Series(list(out))

    c = F.col(col) if isinstance(col, str) else col
    return _minhash(c)


def minhash_buckets(
    col: Column | str, num_hashes: int = 64, bands: int = 16, seed: int = 42
) -> Column:
    """LSH band buckets ``array<bigint>`` (length ``bands``) straight from a
    pre-hashed shingle array: MinHash mins + per-band mixing in ONE numpy
    kernel.

    Exists as a fused alternative to ``minhash_signature`` + JVM-side band
    hashing: 16 band-slice ``aggregate`` folds make a Catalyst tree whose
    first-run optimize+codegen cost (~8 s, measured) dwarfs the actual sf0.1
    compute — and a benchmark (or an interactive user) runs each plan once.
    Two docs share bucket b iff their band-b min-vectors are equal (mod 2^-64
    mixing collisions) — identical LSH semantics, trivial plan tree."""
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    rows_per_band = num_hashes // bands
    a_params, b_params = _hash_params(num_hashes, seed)
    _MIX = _U64(0x9E3779B97F4A7C15)

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            flat, lens, offsets = _flatten_batch(s)
            n_rows = len(lens)
            mins = np.full((n_rows, num_hashes), _EMPTY_SENTINEL, dtype=np.int64)
            if flat.size:
                x = flat.view(_U64)
                nonempty = lens > 0
                safe_off = np.minimum(offsets, max(flat.size - 1, 0))
                for i in range(num_hashes):
                    hx = (a_params[i] * x + b_params[i]).view(np.int64)
                    m = np.minimum.reduceat(hx, safe_off)
                    mins[nonempty, i] = m[nonempty]
            # per-band multiply-add fold of the r mins → one bucket key
            m = mins.view(_U64).reshape(n_rows, bands, rows_per_band)
            acc = np.arange(1, bands + 1, dtype=_U64)[None, :].repeat(n_rows, axis=0)
            for j in range(rows_per_band):
                acc = acc * _MIX + m[:, :, j]
            yield pd.Series(list(acc.view(np.int64)))

    c = F.col(col) if isinstance(col, str) else col
    return _buckets(c)


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash packed into ONE ``bigint`` over a pre-hashed token
    array: bit j of the signature is the majority vote of bit j across the
    token hashes. No RNG — fully determined by the token multiset.

    Packed form makes Hamming distance ``bit_count(a ^ b)`` and band
    extraction ``shiftrightunsigned`` — scalar, codegen'd, zero array walks
    at comparison time."""

    @F.pandas_udf(LongType())
    def _simhash(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            flat, lens, offsets = _flatten_batch(s)
            n_rows = len(lens)
            sig = np.zeros(n_rows, dtype=np.int64)
            if flat.size:
                x = flat.view(_U64)
                nonempty = lens > 0
                safe_off = np.minimum(offsets, max(flat.size - 1, 0))
                acc = np.zeros(n_rows, dtype=_U64)
                for j in range(64):
                    bits = ((x >> _U64(j)) & _U64(1)).astype(np.int64)
                    ones = np.add.reduceat(bits, safe_off)
                    # majority: #ones > len/2  (ties -> 0 bit, deterministic)
                    bit_j = (2 * ones > lens) & nonempty
                    acc |= bit_j.astype(_U64) << _U64(j)
                sig = acc.view(np.int64)
            yield pd.Series(sig)

    c = F.col(col) if isinstance(col, str) else col
    return _simhash(c)


def hyperplane_sketch(
    col: Column | str, n_planes: int = 16, dim: int | None = None, seed: int = 42
) -> Column:
    """Random-hyperplane (sign) sketch of an ``array<float|double>`` embedding,
    packed into one ``bigint`` (``n_planes`` ≤ 64 bits): bit p = sign of
    v·r_p with r_p a seeded Gaussian plane. Cosine-similar vectors agree on
    most bits (P[bit match] = 1 - angle/π).

    The whole Arrow batch is one (rows × dim) @ (dim × planes) matmul —
    BLAS-grade, ~ns/row. Planes are regenerated per executor from ``seed``
    (cheap) rather than broadcast. ``dim`` is taken from the first non-null
    row if not given; rows with a different dim get sketch 0."""
    if not 0 < n_planes <= 64:
        raise ValueError("n_planes must be in (0, 64]")

    @F.pandas_udf(LongType())
    def _sketch(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        planes: np.ndarray | None = None
        powers = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
        for s in batches:
            arrs = [np.asarray(v, dtype=np.float64) if v is not None else None for v in s]
            d = dim
            if d is None:
                d = next((len(v) for v in arrs if v is not None and len(v)), 0)
            if planes is None or planes.shape[1] != d:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((n_planes, d))
            ok = np.array([v is not None and len(v) == d for v in arrs])
            sig = np.zeros(len(arrs), dtype=np.uint64)
            if ok.any() and d:
                mat = np.stack([v for v, o in zip(arrs, ok) if o])
                proj = mat @ planes.T  # (ok_rows, n_planes)
                bits = (proj > 0).astype(np.uint64)
                sig[ok] = bits @ powers
            yield pd.Series(sig.view(np.int64))

    c = F.col(col) if isinstance(col, str) else col
    return _sketch(c)


def batch_cosine(a: Column | str, b: Column | str) -> Column:
    """Exact cosine between two vector columns, vectorized per Arrow batch
    (one stacked einsum instead of ~2·dim interpreted lambda steps per row).
    Zero-norm / null / dim-mismatched rows get 0.0 — same contract as
    ``functions.vectors.cosine_similarity``. Use for bulk pair verification;
    the JVM expression version remains right for small/broadcast sides."""

    @F.pandas_udf("double")
    def _cos(batches: Iterator[tuple[pd.Series, pd.Series]]) -> Iterator[pd.Series]:
        for sa, sb in batches:
            n = len(sa)
            out = np.zeros(n, dtype=np.float64)
            va = [np.asarray(v, dtype=np.float64) if v is not None else None for v in sa]
            vb = [np.asarray(v, dtype=np.float64) if v is not None else None for v in sb]
            ok = np.array(
                [x is not None and y is not None and len(x) == len(y) and len(x) > 0
                 for x, y in zip(va, vb)]
            )
            if ok.any():
                dims = {len(x) for x, o in zip(va, ok) if o}
                if len(dims) == 1:
                    ma = np.stack([x for x, o in zip(va, ok) if o])
                    mb = np.stack([y for y, o in zip(vb, ok) if o])
                    dots = np.einsum("ij,ij->i", ma, mb)
                    den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
                    with np.errstate(divide="ignore", invalid="ignore"):
                        cos = np.where(den > 0, dots / den, 0.0)
                    out[ok] = cos
                else:  # ragged batch: per-row fallback
                    for i, (x, y, o) in enumerate(zip(va, vb, ok)):
                        if o:
                            d = float(np.linalg.norm(x)) * float(np.linalg.norm(y))
                            out[i] = float(x @ y) / d if d > 0 else 0.0
            yield pd.Series(out)

    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _cos(ca, cb)


def band_bucket(sig: Column, band: int, chunk_bits: int) -> Column:
    """Band ``band``'s bucket key from a bit-packed signature: an unsigned
    shift + mask — pure codegen scalar ops."""
    mask = (1 << chunk_bits) - 1
    return F.shiftrightunsigned(sig, band * chunk_bits).bitwiseAND(F.lit(mask))


def packed_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two bit-packed signatures."""
    return F.bit_count(a.bitwiseXOR(b))


# --------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency estimates, pure JVM-side
# --------------------------------------------------------------------------


def cms_bucket(col: Column, i: int, width: int) -> Column:
    """Row i's CMS bucket for a (stringified) key: the first 13 hex digits
    of md5('cms{i}|'||key) mod width — md5 is the one hash both engines
    share bit-for-bit (the sampling-module contract), so the whole sketch
    is DuckDB-oracle-able, unlike xxhash64-based sketches."""
    h13 = F.substring(
        F.md5(F.concat(F.lit(f"cms{i}|"), col.cast("string"))), 1, 13
    )
    return F.pmod(F.conv(h13, 16, 10).cast("bigint"), F.lit(width))


def cms_build(
    df,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    group_cols: list[str] | None = None,
) -> "DataFrame":
    """Count-Min sketch counters (Cormode & Muthukrishnan 2005) per group:
    ``(group..., i, bucket, cnt)`` — depth×width cells per group, built by
    ONE partial-aggregated groupBy (each row explodes to ``depth`` cell
    hits). Point estimate = min over i of its row's counter: NEVER an
    underestimate, over by collision mass only. Counters are plain counts,
    so sketches MERGE by adding cell-wise — the rollup property
    (daily → weekly) the HLL family already has, here with an exact SQL
    oracle because the construction is deterministic arithmetic."""
    key = F.col(key_col).cast("string")
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), cms_bucket(key, i, width).alias("bucket")
            )
            for i in range(depth)
        ]
    )
    gb = list(group_cols or [])
    return (
        df.select(*gb, F.explode(entries).alias("e"))
        .groupBy(*gb, F.col("e.i").alias("i"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketch: "DataFrame", group_cols: list[str] | None = None) -> "DataFrame":
    """Merge CMS sketches by summing counters cell-wise within the (new,
    typically coarser) grouping — e.g. after remapping a day column to its
    week, daily sketches collapse into exact weekly sketches."""
    gb = list(group_cols or [])
    return sketch.groupBy(*gb, "i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: "DataFrame",
    keys: "DataFrame",
    key_col: str,
    depth: int = 4,
    width: int = 256,
    group_cols: list[str] | None = None,
) -> "DataFrame":
    """Point-estimate each key (×group) against a CMS: probe rows LEFT-join
    the (depth×width-per-group, broadcastable) sketch on (group..., i,
    bucket), coalesce absent cells to 0, and take min(cnt) —
    ``(group..., key_col, est)``.

    The left join + zero-fill is true Count-Min semantics: the estimate is
    the min over ALL depth cells, and a cell no stream element hashed into
    counts 0 — so an out-of-stream probe with at least one empty cell
    estimates 0 (its true count), not the collision mass of its nonzero
    cells. Round 7's inner-join spelling dropped empty cells from the min
    (overestimating out-of-stream keys) and dropped never-seen groups
    entirely; for in-stream probes the two agree (a present key makes all
    of its cells ≥ its own count), which is why the registered query's
    oracle hashes were unaffected."""
    gb = list(group_cols or [])
    key = F.col(key_col).cast("string")
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), cms_bucket(key, i, width).alias("bucket")
            )
            for i in range(depth)
        ]
    )
    probes = keys.select(*gb, key.alias(key_col), F.explode(entries).alias("e")).select(
        *gb, key_col, F.col("e.i").alias("i"), F.col("e.bucket").alias("bucket")
    )
    return (
        probes.join(sketch, gb + ["i", "bucket"], "left")
        .groupBy(*gb, key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def qsketch_build(
    df,
    value_col: str,
    lo: float = 0.0,
    width: float = 4.0,
    nbins: int = 128,
    group_cols: list[str] | None = None,
) -> "DataFrame":
    """Mergeable equi-width quantile sketch: ``(group..., bin, cnt)`` —
    the distribution member of the sketch family (HLL = distinct count,
    CMS = point frequency, this = quantiles). Bin counts are plain counts,
    so sketches MERGE additively under a coarser grouping (daily → weekly)
    exactly like the CMS/HLL rollups, with bounded state (``nbins`` cells
    per group) and a hard SQL oracle: the bin index is one
    correctly-rounded IEEE divide + floor + clamp, identical cross-engine.
    Values outside [lo, lo + nbins·width) clamp into the edge bins (their
    rank mass is preserved; only their position detail is lost). The
    quantile readout is ``qsketch_quantiles``; the exact-value refinement
    path for a single global quantile is operators/aggregates.py:
    quantile_exact_global (multipass bin-narrowing over the same idea)."""
    v = F.col(value_col).cast("double")
    b = (
        F.least(
            F.greatest(F.floor((v - F.lit(lo)) / F.lit(width)), F.lit(0)),
            F.lit(nbins - 1),
        )
        .cast("int")
        .alias("bin")
    )
    gb = list(group_cols or [])
    return df.select(*gb, b).groupBy(*gb, "bin").agg(F.count(F.lit(1)).alias("cnt"))


def qsketch_merge(sketch: "DataFrame", group_cols: list[str] | None = None) -> "DataFrame":
    """Merge quantile sketches by summing bin counts within the (coarser)
    grouping — a day column remapped to its week collapses daily sketches
    into exact weekly sketches."""
    gb = list(group_cols or [])
    return sketch.groupBy(*gb, "bin").agg(F.sum("cnt").alias("cnt"))


def qsketch_cumulative(
    sketch: "DataFrame", group_cols: list[str] | None = None
) -> "DataFrame":
    """Per-bin integer cumulative surface: ``(group..., bin, cnt, c, n)``
    with ``c`` the running count up to this bin and ``n`` the group
    total, both bigint. This is the readout's entire integer state made
    directly hashable — exposed so a correctness harness can localize a
    divergence to either the window machinery (this frame) or the rank
    readout (``qsketch_quantiles``), and useful on its own as an exact
    empirical CDF over the sketch. Windows over the SKETCH (≤ nbins rows
    per group), never the data."""
    gb = list(group_cols or [])
    w = (
        Window.partitionBy(*[F.col(c) for c in gb])
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wg = Window.partitionBy(*[F.col(c) for c in gb])
    return (
        sketch.withColumn("c", F.sum("cnt").over(w).cast("bigint"))
        .withColumn("n", F.sum("cnt").over(wg).cast("bigint"))
        .select(*gb, "bin", F.col("cnt").cast("bigint").alias("cnt"), "c", "n")
    )


def qsketch_quantiles(
    sketch: "DataFrame",
    qs: list[float],
    lo: float = 0.0,
    width: float = 4.0,
    group_cols: list[str] | None = None,
    labels: list[str] | None = None,
    integer_est: bool = False,
) -> "DataFrame":
    """Quantile readout per group: for each q the FIRST bin whose running
    count reaches ``ceil(q·n)`` — ``(group..., q, bin, n, est)`` with
    ``est`` the bin's lower edge (the true quantile lies in
    [est, est + width); max error = one bin width, by construction).

    ALL-INTEGER rank arithmetic: each q is decomposed into an exact
    decimal ratio (qnum, qden) via ``Fraction(str(q))`` and the rank
    target ``ceil(q·n)`` is computed as ``(n·qnum + qden − 1) div qden``
    on bigints — no IEEE multiply anywhere, so the readout is hash-exact
    against the SQL oracle on EVERY engine/build (a float ``ceil(q*n)``
    is one rounding away from an off-by-one when q·n lands on an
    integer). The running count windows over the SKETCH (≤ nbins rows
    per group — the module's bounded-frame rule), never the data.

    ``labels`` (one per q) replaces the double ``q`` output column with a
    string label ('p50', …) and ``integer_est=True`` (requires integral
    lo/width) emits ``est`` as bigint ``lo + bin·width`` — together they
    remove every float from the output surface, making the hash
    environment-proof (no engine/build can diverge on double formatting)."""
    from fractions import Fraction

    gb = list(group_cols or [])
    cum = qsketch_cumulative(sketch, gb).withColumnRenamed("c", "__cum").withColumnRenamed(
        "n", "__n"
    )
    fracs = [Fraction(str(q)) for q in qs]
    if labels is not None and len(labels) != len(qs):
        raise ValueError("labels must match qs one-for-one")
    qarr = F.array(
        *[
            F.struct(
                (
                    F.lit(labels[i]).alias("q")
                    if labels is not None
                    else F.lit(float(q)).alias("q")
                ),
                F.lit(int(fr.numerator)).cast("bigint").alias("qnum"),
                F.lit(int(fr.denominator)).cast("bigint").alias("qden"),
            )
            for i, (q, fr) in enumerate(zip(qs, fracs))
        ]
    )
    hits = (
        cum.select(*gb, "bin", "__cum", "__n", F.explode(qarr).alias("__qe"))
        .select(
            *gb,
            "bin",
            "__cum",
            "__n",
            F.col("__qe.q").alias("q"),
            F.col("__qe.qnum").alias("__qnum"),
            F.col("__qe.qden").alias("__qden"),
        )
        .filter(F.expr("__cum >= (__n * __qnum + __qden - 1) div __qden"))
        .groupBy(*gb, "q")
        .agg(F.min("bin").alias("bin"), F.max("__n").alias("n"))
    )
    if integer_est:
        if not (float(lo).is_integer() and float(width).is_integer()):
            raise ValueError("integer_est requires integral lo and width")
        est = (
            F.lit(int(lo)).cast("bigint")
            + F.col("bin").cast("bigint") * F.lit(int(width)).cast("bigint")
        ).alias("est")
    else:
        est = (F.lit(lo) + F.col("bin").cast("double") * F.lit(width)).alias("est")
    return hits.select(*gb, "q", "bin", "n", est)
