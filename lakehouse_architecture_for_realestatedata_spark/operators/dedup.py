"""Deduplication operators — exact, keep-latest, and fuzzy (MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine).

The reference's core dedup is keep-latest-per-key via a row_number window
(reference: scripts/normalize_bronze_columns.py:126-130 and
 dbt/models/staging/stg_properties.sql:23-31). The fuzzy family is the
extension scope for training-data pipelines.

Scale notes:
  - ``dedup_latest`` is ONE shuffle on the key. For skewed keys use
    ``dedup_latest_agg`` (max_by) — it map-side combines, so a hot key
    arrives at the reducer pre-reduced per partition instead of as a
    billion-row sorted run.
  - MinHash-LSH: candidate generation is (doc → bands) explode + groupBy
    band-hash → pairs only within buckets. Never a cross join. Verification
    re-checks exact Jaccard on candidates only.
  - SimHash: 64-bit signature, grouped by rotated prefix bands.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.functions.text import shingles


def dedup_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact dedup (A5/A6 semantics): distinct over ``cols`` (or all).
    Physical plan: hash-aggregate with map-side partial — one shuffle."""
    return df.dropDuplicates(cols) if cols else df.distinct()


def dedup_latest(
    df: DataFrame,
    key: str | list[str],
    order_by: list[Column],
) -> DataFrame:
    """W1/W2: keep the single latest row per key.

    ``order_by`` should be a *total* order (add a unique id as final
    tiebreak) for deterministic output — the reference orders by file mtime
    only (reference: scripts/normalize_bronze_columns.py:127), which ties on
    same-file duplicates; we require callers to pass explicit tiebreaks.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)  # P4
        .drop("__rn")
    )


def dedup_latest_agg(df: DataFrame, key: str | list[str], ts: str | Column) -> DataFrame:
    """Skew-robust keep-latest via max_by struct-agg instead of a window.

    Same result as ``dedup_latest`` when ``ts`` is unique per key; unlike a
    window (full sort of each key's rows on one reducer), this runs as
    partial+final hash aggregation, so hot keys cost O(1) state per task.
    Preferred at 100 TB whenever the ordering key is unique.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ts_col = F.col(ts) if isinstance(ts, str) else ts
    payload = F.struct(*[F.col(c) for c in df.columns])
    out = df.groupBy(*keys).agg(F.max_by(payload, ts_col).alias("__row"))
    return out.select("__row.*")


# --------------------------------------------------------------------------
# Fuzzy dedup family
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    block_on: Column | None = None,
) -> DataFrame:
    """Near-duplicate pairs by exact Jaccard over word k-shingles.

    Without ``block_on`` this is a join on a shared shingle (candidate pairs
    share ≥1 shingle — a guaranteed superset of pairs with J>0), NOT a cross
    join: docs are exploded to (shingle, id), self-joined on shingle, then
    exact Jaccard is computed once per candidate pair from the shingle-set
    sizes. Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = df.select(
        F.col(id_col).alias("__id"), F.array_distinct(shingles(F.col(text_col), k)).alias("__sh")
    ).withColumn("__n", F.size("__sh"))
    if block_on is not None:
        sh = sh.withColumn("__blk", block_on)
    ex = sh.select("__id", "__n", *(["__blk"] if block_on is not None else []), F.explode("__sh").alias("__s"))
    join_keys = ["__s"] + (["__blk"] if block_on is not None else [])
    a = ex.select(*[F.col(c).alias(c + "_a") for c in ex.columns])
    b = ex.select(*[F.col(c).alias(c + "_b") for c in ex.columns])
    cond = [a[k_ + "_a"] == b[k_ + "_b"] for k_ in join_keys] + [a["__id_a"] < b["__id_b"]]
    pairs = (
        a.join(b, cond)
        .groupBy("__id_a", "__id_b", "__n_a", "__n_b")
        .agg(F.count("*").alias("__inter"))
        .withColumn(
            "jaccard",
            F.col("__inter") / (F.col("__n_a") + F.col("__n_b") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("__id_a").alias("id_a"), F.col("__id_b").alias("id_b"), F.col("jaccard")
        )
    )
    return pairs


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 64
) -> DataFrame:
    """MinHash signature per doc: for hash i, min over shingles of
    xxhash64(shingle, seed=i). Narrow projections only, no shuffle.

    The shingle array is materialized in its OWN projection first: passing
    the expression tree into the 64 per-seed lambdas would re-evaluate
    tokenization+shingling 64× per row (no CSE across higher-order
    functions — measured 100× slowdown), while an attribute reference is
    computed once."""
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    with_sh = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(shingles(F.col(text_col), k)).alias("__sh"),
    )
    sig = F.transform(
        seeds,
        lambda s: F.aggregate(
            F.col("__sh"),
            F.lit(None).cast("bigint"),
            lambda acc, t: F.least(
                F.coalesce(acc, F.lit(2**63 - 1)), F.xxhash64(t, s)
            ),
        ),
    )
    return with_sh.select("__id", "__sh", sig.alias("__sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, verified with exact Jaccard.

    Plan shape (the part that matters at 100 TB):
      1. signatures: narrow map, no shuffle;
      2. explode to ``bands`` rows/doc, hash each band slice → bucket key;
      3. self-join on (band, bucket) — only within-bucket pairs materialize;
      4. dedup candidate pairs, then ONE exact-Jaccard verification per pair
         via array_intersect on the (small) shingle arrays.
    Collision probability for Jaccard s: 1-(1-s^r)^b with r=num_hashes/bands.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes)
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        "__id",
        "__sh",
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("__bb"),
    ).select("__id", "__sh", F.col("__bb.band").alias("__band"), F.col("__bb.bucket").alias("__bucket"))

    a = banded.select(
        F.col("__id").alias("id_a"), F.col("__sh").alias("sh_a"), "__band", "__bucket"
    )
    b = banded.select(
        F.col("__id").alias("id_b"), F.col("__sh").alias("sh_b"), "__band", "__bucket"
    )
    cand = (
        a.join(b, ["__band", "__bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_bits(col: Column, num_bits: int = 56) -> Column:
    """SimHash of a token array as an array<int> of sign bits: per-bit
    majority vote of token hashes, all inside aggregate/zip_with (no UDF).

    Token hashes are materialized ONCE via transform (not re-hashed per
    bit), and bits are extracted with integer ``bitwiseAND`` against literal
    powers of two — double-division bit extraction would corrupt the low
    bits (53-bit mantissa vs 63-bit hash). num_bits ≤ 62 to stay in signed
    long range."""
    if not 0 < num_bits <= 62:
        raise ValueError("num_bits must be in (0, 62]")
    powers = F.array(*[F.lit(1 << b).cast("bigint") for b in range(num_bits)])
    hashes = F.transform(col, lambda t: F.xxhash64(t))
    votes = F.aggregate(
        hashes,
        F.array(*[F.lit(0) for _ in range(num_bits)]),
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda a, p: a + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    return F.transform(votes, lambda v: F.when(v > 0, 1).otherwise(0))


def _band_buckets(sig_bits: Column, prefix_bands: int, num_bits: int) -> Column:
    """array of (band, bucket-hash) structs: bucket = xxhash64 of the band's
    bit-slice rendered as a string. Pigeonhole: Hamming distance <
    prefix_bands ⇒ at least one identical band slice."""
    chunk = num_bits // prefix_bands
    band_idx = F.sequence(F.lit(0), F.lit(prefix_bands - 1))
    return F.transform(
        band_idx,
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.array_join(
                    F.transform(F.slice(sig_bits, b * chunk + 1, chunk), lambda v: v.cast("string")),
                    "",
                )
            ).alias("bucket"),
        ),
    )


def hamming_distance(a_bits: Column, b_bits: Column) -> Column:
    return F.aggregate(
        F.zip_with(a_bits, b_bits, lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    prefix_bands: int = 4,
    num_bits: int = 56,
) -> DataFrame:
    """Near-dup pairs with SimHash signatures ≤ ``max_hamming`` bits apart.

    Banding: split the signature into ``prefix_bands`` chunks; by pigeonhole
    any pair within Hamming distance < prefix_bands shares at least one exact
    chunk → join per (band, bucket), verify true Hamming on candidates. Same
    explode/join/verify shape as MinHash-LSH — never a cross join.
    """
    from lakehouse_architecture_for_realestatedata_spark.functions.text import tokens

    sigs = df.select(
        F.col(id_col).alias("__id"), simhash_bits(tokens(F.col(text_col)), num_bits).alias("__sig")
    )
    banded = sigs.select(
        "__id",
        "__sig",
        F.explode(_band_buckets(F.col("__sig"), prefix_bands, num_bits)).alias("__bb"),
    ).select("__id", "__sig", F.col("__bb.band").alias("__band"), F.col("__bb.bucket").alias("__bucket"))
    a = banded.select(F.col("__id").alias("id_a"), F.col("__sig").alias("sig_a"), "__band", "__bucket")
    b = banded.select(F.col("__id").alias("id_b"), F.col("__sig").alias("sig_b"), "__band", "__bucket")
    return (
        a.join(b, ["__band", "__bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming_distance(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 42,
    hamming_radius: int = 2,
) -> DataFrame:
    """Embedding near-duplicates: cosine ≥ threshold, candidate-generated by
    random-hyperplane LSH (sign-sketch) so the join is bucket-local.

    Hyperplanes are derived deterministically from ``seed`` via a hash-based
    pseudo-random projection computed with built-ins (no driver-side numpy
    state shipped to executors; nothing to broadcast).
    """
    from lakehouse_architecture_for_realestatedata_spark.functions.vectors import cosine_similarity

    vec = F.col(vec_col)
    dim_idx = lambda v: F.sequence(F.lit(0), F.size(v) - 1)  # noqa: E731
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    # pseudo-random weight for (plane p, dim d): centered hash in [-0.5, 0.5)
    weight = lambda p, d: (  # noqa: E731
        (F.pmod(F.xxhash64(p * 10007 + d, F.lit(seed)), F.lit(10000)) / 10000.0) - 0.5
    )
    # sign-sketch as an array<int> of bits (one per hyperplane)
    sketch = F.aggregate(
        F.zip_with(vec, dim_idx(vec), lambda x, d: F.struct(x.alias("x"), d.alias("d"))),
        F.transform(planes, lambda p: F.lit(0.0)),
        lambda acc, s: F.zip_with(
            acc, planes, lambda a, p: a + s["x"] * weight(p, s["d"])
        ),
        lambda acc: F.transform(acc, lambda v: F.when(v > 0, 1).otherwise(0)),
    )
    sigs = df.select(F.col(id_col).alias("__id"), vec.alias("__v"), sketch.alias("__sig"))
    # band the sign-sketch like simhash: pairs within small angular distance
    # share a chunk with high probability
    prefix_bands = 4
    banded = sigs.select(
        "__id",
        "__v",
        F.explode(_band_buckets(F.col("__sig"), prefix_bands, n_planes)).alias("__bb"),
    ).select("__id", "__v", F.col("__bb.band").alias("__band"), F.col("__bb.bucket").alias("__bucket"))
    a = banded.select(F.col("__id").alias("id_a"), F.col("__v").alias("v_a"), "__band", "__bucket")
    b = banded.select(F.col("__id").alias("id_b"), F.col("__v").alias("v_b"), "__band", "__bucket")
    return (
        a.join(b, ["__band", "__bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine", cosine_similarity("v_a", "v_b"))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
