"""Text-analysis column functions for the training-data pipeline scope.

All pure built-in expressions (split / transform / aggregate / xxhash64) so
they run inside codegen at 100 TB — no Python in the hot path. These back the
``operators.text_analysis`` queries over the ``documents`` table.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# \W+-ish tokenizer: split on runs of non-alphanumerics, drop empties.
_TOKEN_SPLIT = r"[^\p{L}\p{N}]+"


def tokens(col: Column | str, lowercase: bool = True) -> Column:
    """Whitespace/punctuation tokenization → array<string> (empties removed)."""
    c = F.col(col) if isinstance(col, str) else col
    if lowercase:
        c = F.lower(c)
    arr = F.split(c, _TOKEN_SPLIT)
    return F.filter(arr, lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Token count (whitespace tokenizer)."""
    return F.size(tokens(col, lowercase=False))


# GPT-2-style pre-tokenizer shape, lookaround-free so the SAME pattern runs
# under Java regex (Spark) and RE2 (DuckDB oracle): letter runs, digit runs,
# and each other non-space char as its own piece.
_BPE_PIECE = r"\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: words + digit runs + punctuation marks counted
    separately (a cheap, deterministic proxy for subword token counts used to
    budget LLM training data)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_PIECE), F.lit(0)))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles as array<string> — the unit set for Jaccard/MinHash
    dedup. Built from sequence+transform+slice; distinct'ed.

    NB: ``toks`` captured inside the lambda re-evaluates per shingle index
    (no CSE across lambda boundaries — see the measured 6× fix in
    operators/textprep.py:token_bigram_counts). A single-element-transform
    let-binding fixes that (measured 1.6× on this expansion alone), but
    nested-lambda trees break ExtractPythonUDFs when the column feeds a
    pandas UDF argument (sketches.minhash_buckets does exactly that), so
    this stays the plain spelling; materialize via ``.withColumn`` first
    when consuming shingles in a non-UDF O(n·len)-sensitive path."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    # Short docs (< k tokens): fall back to the whole token string as one shingle.
    return F.when(n >= k, F.array_distinct(sh)).otherwise(F.array(F.array_join(toks, " ")))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """``shingles`` over an ALREADY-BOUND token-array column — the exact
    same expression tree, with the tokenization hoisted out of the lambda.

    Why it exists (r14 optimization, guide §1/§2 "per-task work"): an
    expression captured inside a ``transform`` lambda re-evaluates per
    ELEMENT, so ``shingles(text)`` pays tokenize+filter once per shingle
    index — O(tokens²) string work per row. Binding the token array in a
    prior projection (``explode_outer(array(tokens(...)))`` barrier, the
    codebase's standard CollapseProject fence) makes ``toks`` an attribute
    reference, evaluated once per row: measured 1.62 s → 0.27 s on the
    2000-doc sf0.1 shingling pass. Output is bit-identical to
    ``shingles`` — same tree, different binding."""
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array(F.array_join(toks, " "))
    )


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Character n-grams (distinct) — alternative shingle unit for short text."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    ln = F.length(c)
    idx = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(c, i, n)))


def doc_fingerprint(col: Column | str) -> Column:
    """Order-insensitive 64-bit content fingerprint: xor-aggregate of token
    xxhash64s. Equal token multisets (mod xor-cancellation of exact dup
    tokens) collide deliberately — a cheap rolling-hash-style near-exact
    fingerprint for dedup candidate generation."""
    toks = tokens(col)
    return F.aggregate(
        F.array_distinct(toks),
        F.lit(0).cast("bigint"),
        lambda acc, t: acc.bitwiseXOR(F.xxhash64(t)),
    )


# --- language id (n-gram/stopword heuristic) --------------------------------
# Tiny built-in stopword profiles; argmax of stopword hit-ratio wins.
_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu", "mit"],
    "fr": ["le", "la", "les", "et", "est", "une", "un", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "que", "por"],
    "vi": ["của", "và", "là", "có", "không", "được", "trong", "cho", "người", "một"],
}


def _stopword_hits(toks: Column, lang: str) -> Column:
    return F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(w) for w in _STOPWORDS[lang]])))


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Heuristic language ID: distinct-stopword hit count per profile, argmax
    with deterministic tie-break by profile order; 'und' when no profile hits."""
    toks = tokens(col)
    scores = [(lang, _stopword_hits(toks, lang)) for lang in _STOPWORDS]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit(default)
    # Build reversed so earlier profiles win ties (when-chains evaluate in order).
    for lang, score in reversed(scores):
        expr = F.when((score == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def lines(col: Column | str) -> Column:
    """Non-empty trimmed lines of a document → array<string>. The unit for
    Gopher-style repetition filters (duplicate-line fraction)."""
    c = F.col(col) if isinstance(col, str) else col
    arr = F.split(c, r"\n")
    # NB: F.transform(arr, F.trim) would pass the element INDEX as trim's
    # optional trimStr argument — wrap in a single-arg lambda.
    return F.filter(F.transform(arr, lambda x: F.trim(x)), lambda x: x != "")


def duplicate_line_ratio(col: Column | str) -> Column:
    """Fraction of lines that are exact duplicates of an earlier line:
    1 - distinct/total (0.0 for empty/single-line docs). High values flag
    boilerplate/template pages in LLM training corpora (the Gopher
    repetition-filter family). Pure codegen — no shuffle, no Python."""
    ls = lines(col)
    n = F.size(ls)
    return F.when(
        n > 0, (n - F.size(F.array_distinct(ls))).cast("double") / n
    ).otherwise(F.lit(0.0))


def mean_word_length(col: Column | str) -> Column:
    """Mean token length in characters (NULL-safe: 0.0 for token-less text).
    Outlier values flag machine-generated or non-linguistic text."""
    toks = tokens(col, lowercase=False)
    n = F.size(toks)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


# PII patterns — RE2-safe (no lookaround/backrefs) so the same pattern runs
# verbatim in Spark (Java regex) and DuckDB/RE2 oracles.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9][0-9-]{7,14}[0-9]"


def redact_pii(col: Column | str) -> Column:
    """Replace email addresses and international-format phone numbers with
    typed placeholders — the scrub pass an LLM training pipeline runs before
    tokenization. Order matters: emails first so the phone pattern cannot
    eat digit runs inside an address."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, PHONE_RE, "<PHONE>")


def pii_count(col: Column | str) -> Column:
    """Number of PII matches (emails + phones) in the text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))) + F.size(
        F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))
    )


def quality_score(col: Column | str) -> Column:
    """Document quality in [0,1]: mean of three bounded signals —
    length adequacy (≥200 chars), alpha ratio (alphanumeric+space share of
    chars), stopword presence (≥2 distinct English stopwords). The shape of
    heuristic filters used to score LLM training documents."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    len_ok = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    alpha = F.length(F.regexp_replace(c, r"[^\p{L}\p{N} ]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    stop_ok = F.least(_stopword_hits(tokens(c), "en") / F.lit(2.0), F.lit(1.0))
    # No rounding: the raw IEEE expression tree is bit-deterministic, while a
    # round() can disagree across engines on shortest-repr midpoints.
    return (len_ok + alpha_ratio + stop_ok) / 3.0


def filter_top_quantile(
    df,
    score_col: str,
    keep_frac: float,
    by: str | None = None,
    exact: bool = False,
    accuracy: int = 10_000,
    threshold_col: str | None = None,
):
    """Keep the best ``keep_frac`` of rows by ``score_col``, optionally per
    group (``by``) — the "top-60% quality per language" curation step.

    The threshold is ONE tiny aggregate (one row per group), broadcast-joined
    back, then a narrow filter: the corpus itself never shuffles. ``exact``
    uses interpolated ``percentile`` (sorts each group's scores — dashboard
    scale); the default is ``percentile_approx`` (KLL-style sketch, bounded
    memory — the 100 TB path).
    """
    from pyspark.sql import functions as F

    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    q = 1.0 - keep_frac
    pct = (
        F.percentile(F.col(score_col), q)
        if exact
        else F.percentile_approx(F.col(score_col), q, accuracy)
    )
    out_thr = threshold_col or "__thr"
    if by is None:
        thr = df.agg(pct.alias(out_thr))
        kept = df.crossJoin(F.broadcast(thr)).filter(F.col(score_col) >= F.col(out_thr))
    else:
        # null-safe join key: a NULL stratum ("unknown language") is a real
        # group with its own threshold — a plain equi-join would silently
        # drop every row of it regardless of keep_frac
        thr = df.groupBy(by).agg(pct.alias(out_thr))
        kept = (
            df.join(
                F.broadcast(thr.withColumnRenamed(by, "__by_thr")),
                df[by].eqNullSafe(F.col("__by_thr")),
            )
            .filter(F.col(score_col) >= F.col(out_thr))
            .drop("__by_thr")
        )
    return kept if threshold_col else kept.drop(out_thr)


def top_keywords(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_len: int = 3,
):
    """Per-document keyword extraction: the ``k`` most characteristic terms
    by (term frequency DESC, document frequency ASC, term ASC) — i.e. how
    often the term occurs in THIS doc, rarity across the corpus as the
    tiebreak. This is the determinism-safe tf-idf rank: it is monotone in tf
    and anti-monotone in df like tf·idf, but uses the integer (tf, df) pair
    lexicographically instead of the float product, so Spark and any SQL
    oracle produce bit-identical rankings (ln() is not correctly-rounded in
    either engine; a float score can flip near-ties between them). The
    final term ASC tiebreak makes the ranking total.

    Output: ``(id_col, term, tf, df, rnk)``, ``rnk`` ∈ 1..k.

    100 TB shape: tokenize+explode is narrow; tf is one (doc, term) groupBy
    with map-side combine (the explode never crosses the network un-combined);
    df is an unbounded count WINDOW over the tf table partitioned by term —
    not a groupBy+join, which makes Catalyst derive the tf table twice (two
    full corpus scans + explodes, visible as a duplicated read schema in the
    plan); the final per-doc top-k plans as WindowGroupLimit — each task
    keeps only k rows per doc before the exchange. Net: ONE corpus scan,
    three exchanges (doc+term agg, term window, doc window), the latter two
    over the already-aggregated tf table.
    """
    from pyspark.sql import Window

    terms = df.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("term")
    ).filter(F.length("term") >= min_len)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    w = Window.partitionBy(id_col).orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "term", "tf", "df", "rnk")
    )
