"""Text-preparation operators for a pretraining corpus pipeline: fixed-size
document chunking (the context-window carve-up step before tokenization) and
corpus-frequency boilerplate line removal (the CCNet/RefinedWeb-style strip of
nav bars, cookie banners and footers that repeat across a crawl).

Both are pure built-in-function compositions — explode/substring and
posexplode/groupBy/array reassembly — no Python UDF anywhere, so the hot path
stays in whole-stage codegen and the only shuffles are the ones the semantics
force (none for chunking; line-frequency + per-doc reassembly for boilerplate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_fixed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document into fixed-size character chunks with ``overlap``
    characters shared between consecutive chunks — the deterministic carve-up
    used to fit long documents into a model's context window.

    Chunk ``i`` covers characters ``[i·stride, i·stride + size)`` with
    ``stride = size − overlap``; the chunk count is
    ``max(1, ceil((len − overlap) / stride))``, which guarantees every
    character is covered and a document of ≤ ``size`` chars yields exactly
    one chunk (the final chunk may be shorter than ``size``). NULL/empty
    documents yield no rows. Output ``(id_col, chunk_id, chunk_text,
    n_chars)``, ``chunk_id`` 0-based.

    Scale shape: NO shuffle at all — a narrow two-column projection, a
    ``sequence``+``explode`` whose output is ∝ total corpus characters /
    stride, and a codegen ``substring``. Output rows inherit the input
    partitioning; chunking 100 TB is embarrassingly parallel. The chunk-count
    arithmetic is one IEEE double divide + ceil, identical in any engine.
    """
    if size <= 0 or not 0 <= overlap < size:
        raise ValueError("need size > 0 and 0 <= overlap < size")
    stride = size - overlap
    text = F.col(text_col)
    n_chunks = F.greatest(
        F.lit(1).cast("bigint"), F.ceil((F.length(text) - F.lit(overlap)) / F.lit(stride))
    )
    return (
        df.filter(F.length(text) > 0)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias("chunk_id"),
            text.alias("__text"),
        )
        .select(
            id_col,
            "chunk_id",
            F.expr(f"substring(__text, cast(chunk_id * {stride} + 1 as int), {size})").alias(
                "chunk_text"
            ),
        )
        .withColumn("n_chars", F.length("chunk_text"))
    )


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_docs: int,
) -> DataFrame:
    """Strip lines that repeat across ≥ ``min_docs`` distinct documents —
    corpus-frequency boilerplate removal (nav bars, cookie banners, license
    footers), the line-level analogue of exact document dedup.

    A line's identity is its ``trim``-normalized text; whitespace-only lines
    are never counted as boilerplate (they stay). Surviving lines are
    reassembled in original order; every input document appears in the output,
    with ``clean_text = ''`` when all its lines were boilerplate (or the text
    was NULL). Output ``(id_col, clean_text)``.

    Scale shape: the line explode is narrow (no shuffle, output ∝ corpus
    lines); the frequency table shuffles once on the normalized line (plus
    the distinct-doc pre-exchange) and is then filtered to actual
    boilerplate — a tiny set by definition (lines repeated across many
    documents) — so the removal join is a BROADCAST anti-join, not a second
    line-keyed shuffle. Reassembly is ONE groupBy on the doc id with an
    ``array_sort``-by-ordinal ``collect_list`` (bounded by document size);
    a sentinel row unioned per document rides the same shuffle so
    fully-scrubbed / NULL-text docs survive WITHOUT a join back to the doc
    spine (a full-corpus join at 100 TB). Exact ``count_distinct`` per line
    is the oracle-matched path; at 100 TB swap in ``approx_count_distinct``
    — the threshold test tolerates HLL error because boilerplate counts are
    far above any sane ``min_docs``.
    """
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (a line can't be boilerplate in one doc)")
    split = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("__idx", "__line"),
    )
    norm = F.trim(F.col("__line"))
    boiler = (
        split.filter(norm != "")
        .groupBy(norm.alias("__nline"))
        .agg(F.count_distinct(F.col(id_col)).alias("__docs"))
        .filter(F.col("__docs") >= min_docs)
        .select("__nline")
    )
    kept = split.join(
        F.broadcast(boiler), norm == F.col("__nline"), "left_anti"
    )
    # One sentinel row per doc (__idx = -1) survives any scrub, so every
    # input document reaches the reassembly group — no doc-spine join.
    sentinel = df.select(
        F.col(id_col),
        F.lit(-1).alias("__idx"),
        F.lit(None).cast("string").alias("__line"),
    )
    return (
        kept.unionByName(sentinel)
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(F.collect_list(F.struct("__idx", "__line"))),
                        lambda s: s["__idx"] >= 0,
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias("clean_text")
        )
    )


def build_vocab(df, text_col: str, min_count: int = 2) -> DataFrame:
    """Corpus vocabulary construction: global token counts, frequency-filtered
    at ``min_count``, with contiguous ids assigned by (count desc, token asc)
    — the id-assignment step before embedding-table training. Output
    ``(token, n, id)``, ids 0-based and gap-free.

    The global rank is computed WITHOUT a single-partition window (the naive
    ``Window.orderBy`` spelling funnels the whole vocab through one task):
    tokens bucket by their count's integer log2 — computed EXACTLY as
    ``len(binary(n)) − 1`` via base conversion, never float ``log2`` (not
    correctly rounded, so a boundary count like 2^k could land in the wrong
    bucket) — which is a deterministic range carve-up of the (count desc)
    order into ≤ 64 contiguous ranges. Per-bucket row counts fold into
    prefix offsets driver-side (≤ 64 rows, metadata-scale) and the rank
    becomes an ordinary partitioned ``row_number`` plus the offset — the
    same two-phase shape as ``operators.ordered.running_total_by_key``.

    Scale shape: one token-keyed partial-agg groupBy (the only full-data
    shuffle), then everything operates on the min_count-filtered vocab
    (bounded, ≪ corpus); one hash exchange on the 64-ary bucket for the
    rank window.
    """
    from lakehouse_architecture_for_realestatedata_spark.functions.text import tokens
    from lakehouse_architecture_for_realestatedata_spark.operators.ordered import _apply_offsets

    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        # materialized once (bounded: the min_count-filtered vocab, ≪
        # corpus): consumed by the offsets collect below AND by the final
        # plan — without this the corpus tokenize+count pass runs TWICE
        # per invocation (r15, guide §2.4; the pareto per_cust pattern)
        .localCheckpoint(eager=False)
    )
    # exact floor(log2(n)) = length of n's binary representation - 1;
    # bucket ascends as n descends so bucket ranges are contiguous in the
    # (n desc, token asc) global order — the _apply_offsets invariant.
    log2n = F.length(F.conv(F.col("n").cast("string"), 10, 2)) - 1
    with_b = counts.withColumns(
        {"__rt_b": (F.lit(63) - log2n).cast("int"), "__one": F.lit(1)}
    )
    with_b, offset, drop = _apply_offsets(with_b, "__one")
    w = Window.partitionBy("__rt_b").orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        with_b.withColumn("id", F.row_number().over(w) - 1 + offset)
        .drop(*drop, "__one")
        .select("token", "n", "id")
    )


def encode_documents(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str,
    text_col: str,
    oov_id: int = -1,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Encode each document's token stream into vocabulary ids — the step
    that turns a curated corpus plus a ``build_vocab`` table into model-ready
    integer sequences. Output ``(id_col, ids, n_tokens, n_oov)`` where
    ``ids`` is the in-order ``array<int>`` (out-of-vocabulary tokens encoded
    as ``oov_id``) and ``n_oov`` counts them.

    Scale shape: tokens explode narrowly with their position, join the vocab
    BROADCAST on the token string (a vocab is ≤ a few M rows — the standard
    broadcast size class; for a rare giant vocab swap in a shuffle join),
    and reassemble with ONE doc-keyed groupBy via the ordinal-sorted
    ``collect_list`` — the boilerplate-removal shape. The left join keeps
    OOV positions so offsets stay aligned with the original token stream.
    Documents with NULL/empty text yield an empty ``ids`` array (a sentinel
    row rides the reassembly shuffle, no doc-spine join).
    """
    from lakehouse_architecture_for_realestatedata_spark.functions.text import tokens

    split = df.select(
        F.col(id_col),
        F.posexplode(tokens(F.col(text_col))).alias("__pos", "__tok"),
    )
    v = vocab.select(F.col("token").alias("__tok"), F.col("id").alias("__vid"))
    # broadcast_vocab=False: token-keyed shuffle join for a vocab too large
    # to broadcast (rare — raise spark.sql.autoBroadcastJoinThreshold first)
    joined = split.join(F.broadcast(v) if broadcast_vocab else v, "__tok", "left").select(
        id_col,
        "__pos",
        F.coalesce(F.col("__vid").cast("int"), F.lit(int(oov_id))).alias("__vid"),
        F.col("__vid").isNull().cast("int").alias("__oov"),
    )
    sentinel = df.select(
        F.col(id_col),
        F.lit(-1).alias("__pos"),
        F.lit(None).cast("int").alias("__vid"),
        F.lit(0).alias("__oov"),
    )
    packed = F.filter(
        F.array_sort(F.collect_list(F.struct("__pos", "__vid"))),
        lambda s: s["__pos"] >= 0,
    )
    return (
        joined.unionByName(sentinel)
        .groupBy(id_col)
        .agg(
            F.transform(packed, lambda s: s["__vid"]).alias("ids"),
            F.sum(F.when(F.col("__pos") >= 0, 1).otherwise(0)).alias("n_tokens"),
            F.sum("__oov").alias("n_oov"),
        )
    )


def token_bigram_counts(
    df: DataFrame, text_col: str, min_count: int = 1
) -> DataFrame:
    """Corpus bigram language-model counts: every adjacent token pair with
    its global count and conditional probability ``p = n(w1,w2) / n(w1,·)``.
    Output ``(w1, w2, n, p)``, filtered to ``n >= min_count`` AFTER the
    probability is computed (the denominator is the true unfiltered
    continuation mass of ``w1``, so probabilities stay calibrated).

    Adjacent pairs are built array-side (``transform`` over an index
    sequence, guarded for <2-token docs — Spark's ``sequence(1, 0)``
    DESCENDS, so the guard is load-bearing) and exploded: no self-join, no
    shuffle until the (w1, w2) groupBy. The w1-normalization window runs
    over the bigram vocabulary (≪ corpus). Scale shape: one full-data
    shuffle (the pair groupBy, partial-agg combined), one vocab-scale
    window.
    """
    from lakehouse_architecture_for_realestatedata_spark.functions.text import tokens

    # Materialize the token array ONCE per row: element_at(tokens(text), i)
    # inside the lambda would re-run the split+filter for EVERY index
    # (Catalyst does not CSE subexpressions across higher-order-function
    # lambdas), turning the pair build O(len²) per document — measured 6×
    # the whole-query wall at sf0.1 before this projection.
    toks = F.col("__toks")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"), F.element_at(toks, i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    counts = (
        df.select(tokens(F.col(text_col)).alias("__toks"))
        .select(F.explode(pairs).alias("__bg"))
        .select(F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("w1")
    return counts.withColumn(
        "p", F.col("n").cast("double") / F.sum("n").over(w)
    ).filter(F.col("n") >= min_count)


def vocab_with_coverage(df, text_col: str, min_count: int = 2) -> DataFrame:
    """``build_vocab`` plus the cumulative corpus-coverage curve: for each
    vocab entry, ``cum_frac`` = fraction of ALL corpus tokens (including
    sub-``min_count`` ones) covered by ids 0..id — the curve that answers
    "how big a vocab do I need for 95% coverage". Output
    ``(token, n, id, cum_frac)``.

    The cumulative count reuses the SAME two-phase prefix decomposition as
    the rank (exact integer-log2 count buckets): one extra metadata-scale
    offsets fold for Σn, then both rank and cumsum ride the one bucket
    window — still no single-partition pass anywhere. ``cum_frac`` is one
    bigint→double divide per row, bit-deterministic."""
    from lakehouse_architecture_for_realestatedata_spark.functions.text import tokens
    from lakehouse_architecture_for_realestatedata_spark.operators.ordered import _apply_offsets

    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("__total"))
    kept = counts.filter(F.col("n") >= min_count)
    log2n = F.length(F.conv(F.col("n").cast("string"), 10, 2)) - 1
    with_b = kept.withColumns(
        {"__rt_b": (F.lit(63) - log2n).cast("int"), "__one": F.lit(1)}
    )
    with_b, rank_off, drop1 = _apply_offsets(with_b, "__one")
    with_b, sum_off, drop2 = _apply_offsets(with_b, "n")
    w = Window.partitionBy("__rt_b").orderBy(F.col("n").desc(), F.col("token").asc())
    cum_in_bucket = F.sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        with_b.withColumn("id", F.row_number().over(w) - 1 + rank_off)
        .withColumn("__cum", cum_in_bucket + sum_off)
        .crossJoin(F.broadcast(total))
        .withColumn(
            "cum_frac", F.col("__cum").cast("double") / F.col("__total").cast("double")
        )
        .drop(*{*drop1, *drop2}, "__one", "__cum", "__total")
        .select("token", "n", "id", "cum_frac")
    )


def score_doc_perplexity(
    df,
    id_col: str,
    text_col: str,
    lm: DataFrame | None = None,
    floor_p: float = 1e-6,
    qbits: int = 30,
) -> DataFrame:
    """Per-document cross-entropy under the corpus bigram LM — the
    perplexity filter of corpus curation: gibberish scores HIGH (unseen /
    improbable continuations), machine-generated boilerplate suspiciously
    LOW; both tails get dropped or downweighted.

    ``lm`` defaults to ``token_bigram_counts(df)`` (self-scoring); pass a
    held-out LM for the honest filtering setup. Unseen bigrams floor to
    ``floor_p`` (simple floor smoothing — calibration is irrelevant for a
    RANKING filter; document-level scores only compare to each other).

    Output ``(id, n_bigrams, bits_per_bigram, perplexity)`` where
    ``bits_per_bigram = -(1/B)·Σ log2 p`` and ``perplexity = 2^bits``;
    docs with < 2 tokens score NULL (no evidence).

    Scale shape: doc bigrams build array-side (no self-join), the LM join
    is vocab-scale (hash join; broadcast when it fits), and the per-doc
    reduction quantizes each log2 term to int64 (round half away,
    2^qbits) so the sum is exact and PARTITION-INVARIANT — a plain double
    sum would make a document's score depend on task boundaries.
    """
    from lakehouse_architecture_for_realestatedata_spark.functions.text import tokens

    if lm is None:
        lm = token_bigram_counts(df, text_col)
    toks = F.col("__toks")
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"), F.element_at(toks, i + 1).alias("w2")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
        .select(F.col(id_col), F.explode_outer(pairs).alias("__bg"))
        .select(
            F.col(id_col),
            F.col("__bg.w1").alias("w1"),
            F.col("__bg.w2").alias("w2"),
        )
    )
    scored = bg.join(lm.select("w1", "w2", "p"), ["w1", "w2"], "left")
    scale = float(1 << qbits)
    bits = -F.log2(F.greatest(F.coalesce(F.col("p"), F.lit(0.0)), F.lit(floor_p)))
    q = F.when(
        F.col("w1").isNotNull(),
        F.when(bits >= 0, F.floor(bits * scale + 0.5)).otherwise(
            -F.floor(-bits * scale + 0.5)
        ),
    ).cast("bigint")
    agg = scored.groupBy(id_col).agg(
        F.count("w1").alias("n_bigrams"),
        F.sum(q).alias("__qsum"),
    )
    h = F.when(
        F.col("n_bigrams") > 0,
        F.col("__qsum").cast("double") / scale / F.col("n_bigrams"),
    )
    return agg.select(
        F.col(id_col),
        "n_bigrams",
        h.alias("bits_per_bigram"),
        F.pow(F.lit(2.0), h).alias("perplexity"),
    )

