"""Corpus-hygiene queries for the LLM training-data scope: Gopher-style
repetition signals and PII scrubbing over the ``documents`` table.

Registered AFTER every SURVEY-§2 module (see ``queries.registry``) so they
never displace a §2 query from the driver's bounded correctness window —
their hard correctness signal is the pytest contract test
(tests/test_queries_contract.py), which runs the same Spark-vs-DuckDB
comparison on every oracle-bearing entry regardless of position.

The synthetic documents are single-line word soup, so the repetition query
derives a multi-line document deterministically (a plain string replace that
both engines perform identically) instead of pretending the fixture has
newlines; the PII query synthesizes addresses/numbers from doc_id the same
way. All regexes are RE2-safe (no lookaround) so one pattern string runs
verbatim in both Spark's Java regex and DuckDB's RE2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.functions.text import (
    EMAIL_RE,
    PHONE_RE,
    duplicate_line_ratio,
    mean_word_length,
    pii_count,
    redact_pii,
)
from lakehouse_architecture_for_realestatedata_spark.queries import _t, register

# Split the word-soup docs into "lines" at a common word — deterministic,
# regex-free, identical scan-left-to-right semantics in both engines.
_LINE_SEP = " table "

_DUCK_LINES = (
    "list_filter(list_transform(string_split(replace(text, ' table ', chr(10)),"
    " chr(10)), x -> trim(x)), x -> x <> '')"
)
_DUCK_WORDS = (
    r"list_filter(string_split_regex(text, '[^\p{L}\p{N}]+'), x -> x <> '')"
)


@register(
    "doc_repetition_signals",
    f"""
    WITH ls AS (
        SELECT doc_id,
               {_DUCK_LINES} AS arr,
               {_DUCK_WORDS} AS toks
        FROM documents
    )
    SELECT doc_id,
           len(arr) AS n_lines,
           CASE WHEN len(arr) > 0
                THEN cast(len(arr) - len(list_distinct(arr)) AS double) / len(arr)
                ELSE 0.0 END AS dup_line_ratio,
           CASE WHEN len(toks) > 0
                THEN cast(list_aggregate(list_transform(toks, x -> length(x)),
                                         'sum') AS double) / len(toks)
                ELSE 0.0 END AS mean_word_len
    FROM ls
    """,
    doc="Gopher-style repetition/shape signals: duplicate-line fraction and "
    "mean word length per document — the boilerplate filter of an LLM "
    "training pipeline. Pure codegen, no shuffle.",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lined = F.replace(F.col("text"), F.lit(_LINE_SEP), F.lit("\n"))
    return docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.transform(F.split(lined, r"\n"), lambda x: F.trim(x)),
                lambda x: x != "",
            )
        ).alias("n_lines"),
        duplicate_line_ratio(lined).alias("dup_line_ratio"),
        mean_word_length(F.col("text")).alias("mean_word_len"),
    )


@register(
    "pii_redaction_scrub",
    f"""
    WITH synth AS (
        SELECT doc_id,
               substring(text, 1, 40)
               || CASE WHEN doc_id % 3 <> 0
                       THEN ' contact user' || doc_id || '@example.com' ELSE '' END
               || CASE WHEN doc_id % 2 = 0
                       THEN ' tel +84-90' || doc_id || '-1234' ELSE '' END AS s
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(regexp_replace(s, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed,
           cast(len(regexp_extract_all(s, '{EMAIL_RE}'))
                + len(regexp_extract_all(s, '{PHONE_RE}')) AS int) AS n_pii
    FROM synth
    """,
    doc="PII scrub pass: emails/phones (synthesized deterministically from "
    "doc_id — the fixture has none) replaced with typed placeholders, with a "
    "per-doc match count. One narrow pass, RE2-safe patterns.",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    synth = F.concat(
        F.substring("text", 1, 40),
        F.when(
            d % 3 != 0, F.concat(F.lit(" contact user"), d, F.lit("@example.com"))
        ).otherwise(F.lit("")),
        F.when(
            d % 2 == 0, F.concat(F.lit(" tel +84-90"), d, F.lit("-1234"))
        ).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id",
        redact_pii(synth).alias("scrubbed"),
        pii_count(synth).cast("int").alias("n_pii"),
    )


@register(
    "completeness_report_documents",
    """
    WITH synth AS (
        SELECT doc_id, text,
               CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang,
               source
        FROM documents
    ), tot AS (
        SELECT count(*) AS total,
               count(doc_id) AS doc_id, count(text) AS text,
               count(lang) AS lang, count(source) AS source
        FROM synth
    )
    SELECT 'doc_id' AS column_name, doc_id AS non_null_count,
           cast(doc_id AS double) / cast(total AS double) AS fill_rate FROM tot
    UNION ALL
    SELECT 'text', text, cast(text AS double) / cast(total AS double) FROM tot
    UNION ALL
    SELECT 'lang', lang, cast(lang AS double) / cast(total AS double) FROM tot
    UNION ALL
    SELECT 'source', source, cast(source AS double) / cast(total AS double) FROM tot
    """,
    doc="Column completeness / fill-rate profile (A3 generalized): one global "
    "aggregate pass, then stack-unpivot — the profiling step a training-data "
    "pipeline runs before schema hardening. Nulls synthesized "
    "deterministically (the fixture is fully dense).",
)
def q_completeness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import completeness_report

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("lang")).alias("lang"),
        "source",
    )
    return completeness_report(docs, ["doc_id", "text", "lang", "source"])


@register(
    "corpus_prep_funnel",
    None,  # the near-dup stage is MinHash-LSH + iterative connected
    # components — not SQL-expressible; stage semantics are hard-checked in
    # tests/test_corpus.py (planted fates, stepwise equivalence, idempotence)
    doc="End-to-end corpus preparation funnel (plans/corpus.py): quality/"
    "language/length gates → exact fingerprint dedup → MinHash-LSH near-dup "
    "clustering → per-status doc counts. The composed pipeline an LLM data "
    "team runs; every stage is an individually oracle-tested operator.",
)
def q_corpus_prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.plans.corpus import (
        CorpusPrepConfig,
        funnel_report,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    cfg = CorpusPrepConfig(min_quality=0.2, near_dup=True, jaccard_threshold=0.5)
    return funnel_report(docs, cfg)


@register(
    "decontaminate_eval_overlap",
    None,  # MinHash banding is xxhash64-seeded — not DuckDB-reproducible;
    # planted-contamination recall/precision is pinned in tests/test_dedup.py
    doc="Train/eval decontamination (operators/dedup.py:decontaminate): "
    "corpus docs near-duplicating a (synthesized) eval set via a broadcast "
    "MinHash bucket join — the corpus never shuffles. Eval docs are "
    "one-word perturbations of every 41st document, so expected overlap = "
    "the perturbed sources.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import decontaminate

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") % 41 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.lit("evalprefix "), F.col("text")).alias("text"),
    )
    return decontaminate(docs, eval_df, threshold=0.5)


def _stratified_oracle() -> str:
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import hex_threshold

    t_en, t_zh, t_dflt = hex_threshold(0.3), hex_threshold(1.0), hex_threshold(0.1)
    return f"""
    SELECT doc_id, lang, source FROM documents
    WHERE substr(md5(cast(doc_id AS varchar)), 1, 8)
          < CASE lang WHEN 'en' THEN '{t_en}' WHEN 'zh' THEN '{t_zh}'
                      ELSE '{t_dflt}' END
    """


@register(
    "stratified_sample_by_lang",
    _stratified_oracle(),
    doc="Per-stratum deterministic Bernoulli sample (operators/sampling.py:"
    "sample_stratified): downsample dominant 'en' to 30%, keep all 'zh', 10% "
    "of the rest — the language-rebalancing step of a training mix. Narrow "
    "filter against hex-threshold literals; membership is a pure function "
    "of (doc_id, salt).",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import sample_stratified

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sample_stratified(
        docs, "doc_id", "lang", {"en": 0.3, "zh": 1.0}, default_fraction=0.1
    )


@register(
    "quality_quantile_filter",
    """
    WITH scored AS (
        SELECT doc_id, lang, cast(n_chars AS double) AS score FROM documents
    ), thr AS (
        SELECT lang, quantile_cont(score, 0.4) AS threshold
        FROM scored GROUP BY lang
    )
    SELECT s.lang, any_value(t.threshold) AS threshold,
           count(*) AS n_kept
    FROM scored s JOIN thr t ON s.lang = t.lang
    WHERE s.score >= t.threshold
    GROUP BY s.lang
    """,
    doc="Per-group quantile curation (functions/text.py:filter_top_quantile "
    "exact path): keep the top 60% of docs by score within each language — "
    "threshold is one tiny per-group aggregate broadcast back, the corpus "
    "never shuffles. Spark percentile ≡ DuckDB quantile_cont "
    "(same linear interpolation).",
)
def q_quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.functions.text import filter_top_quantile

    scored = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("double").alias("score")
    )
    kept = filter_top_quantile(
        scored, "score", keep_frac=0.6, by="lang", exact=True, threshold_col="threshold"
    )
    return kept.groupBy("lang").agg(
        F.min("threshold").alias("threshold"),  # constant per group
        F.count(F.lit(1)).alias("n_kept"),
    )


_DUCK_TOKS_Q = (
    r"list_filter(string_split_regex(lower({c}), '[^\p{{L}}\p{{N}}]+'), x -> x <> '')"
)
# DuckDB twin of functions.text.shingles(k=13): 13-token windows, distinct,
# whole-token-string fallback for short docs — mirrors the Spark expression
# exactly (same tokenizer parity as every other shingle oracle here).
_DUCK_13G = (
    "list_distinct(CASE WHEN len({t}) >= 13 "
    "THEN [array_to_string(({t})[i:i+12], ' ') for i in range(1, len({t}) - 11)] "
    "ELSE [array_to_string({t}, ' ')] END)"
)


@register(
    "decontaminate_ngram_verbatim",
    f"""
    WITH ev AS (
        SELECT doc_id + 600000 AS eval_id,
               'quoted for eval purposes ' || text AS text
        FROM documents WHERE doc_id % 37 = 0
    ), eg AS (
        SELECT DISTINCT eval_id, unnest({_DUCK_13G.format(t=_DUCK_TOKS_Q.format(c='text'))}) AS g
        FROM ev
    ), cg AS (
        SELECT doc_id AS corpus_id, unnest({_DUCK_13G.format(t=_DUCK_TOKS_Q.format(c='text'))}) AS g
        FROM documents
    )
    SELECT cg.corpus_id, eg.eval_id, count(DISTINCT cg.g) AS n_shared_ngrams
    FROM cg JOIN eg ON cg.g = eg.g
    GROUP BY 1, 2
    HAVING count(DISTINCT cg.g) >= 1
    """,
    doc="Verbatim 13-gram decontamination (operators/dedup.py:"
    "decontaminate_ngram): corpus docs sharing any 13-gram with a "
    "(synthesized, prefix-quoted) eval set — catches eval text embedded in "
    "long documents, which Jaccard provably misses. Corpus n-grams stream "
    "against broadcast eval grams; shared-gram COUNTS are hash-free, so the "
    "DuckDB twin replays them with string n-grams exactly.",
)
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import decontaminate_ngram

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.concat(F.lit("quoted for eval purposes "), F.col("text")).alias("text"),
    )
    return decontaminate_ngram(docs, eval_df, n=13, min_hits=1)


def _mixture_oracle() -> str:
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import hex_threshold

    t_half, t_zero = hex_threshold(0.5), hex_threshold(0.0)
    return f"""
    WITH c AS (
        SELECT doc_id, lang,
               CASE lang WHEN 'zh' THEN 2 WHEN 'en' THEN 0 ELSE 1 END
               + CASE WHEN substr(md5(cast(doc_id AS varchar)), 1, 8)
                           < CASE lang WHEN 'zh' THEN '{t_half}'
                                       WHEN 'en' THEN '{t_half}'
                                       ELSE '{t_zero}' END
                      THEN 1 ELSE 0 END AS n
        FROM documents
    )
    SELECT doc_id, lang, cast(unnest(generate_series(0, n - 1)) AS int) AS epoch
    FROM c WHERE n > 0
    """


@register(
    "corpus_mixture_weights",
    _mixture_oracle(),
    doc="Per-stratum mixture weights (operators/sampling.py:mix_corpus): "
    "zh upsampled 2.5x (2 copies + a deterministic 50% third), en "
    "downsampled to 0.5, everything else kept once — one narrow "
    "project+explode, copies carry a 0-based epoch index. The md5-keyed "
    "draw replays exactly in DuckDB.",
)
def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import mix_corpus

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return mix_corpus(
        docs, "doc_id", "lang", {"zh": 2.5, "en": 0.5}, default_weight=1.0
    )


@register(
    "eval_sample_per_lang",
    """
    SELECT doc_id, lang FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY substr(md5(cast(doc_id AS varchar)), 1, 8), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 25
    """,
    doc="Exactly-25-per-language deterministic sample (operators/sampling.py:"
    "sample_exact_n_per_group) — building a balanced eval set. The rank "
    "filter plans with an n-bounded WindowGroupLimit partial, so the "
    "exchange ships at most partitions*groups*n rows.",
)
def q_eval_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
        sample_exact_n_per_group,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sample_exact_n_per_group(docs, "doc_id", "lang", 25)


# DuckDB twin of functions.text.quality_score — identical to the
# quality_filter oracle in queries_text (whose exact MATCH licenses reuse).
def _duck_quality() -> str:
    from lakehouse_architecture_for_realestatedata_spark.queries_text import _DUCK_TOKS, _SW

    toks = _DUCK_TOKS.format(c="text")
    return (
        "(least(length(text) / 200.0, 1.0)"
        " + (CASE WHEN length(text) > 0"
        "         THEN length(regexp_replace(text, '[^\\p{L}\\p{N} ]', '', 'g')) / length(text)"
        "         ELSE 0.0 END)"
        f" + least(len(list_intersect(list_distinct({toks}), {_SW['en']})) / 2.0, 1.0)"
        ") / 3.0"
    )


@register(
    "sequence_packing",
    f"""
    WITH t AS (
        SELECT doc_id, len({_DUCK_TOKS_Q.format(c='text')}) AS n_tokens,
               substr(md5('pack-v1' || cast(doc_id AS varchar)), 1, 8) AS h
        FROM documents
    ), o AS (
        SELECT doc_id, n_tokens,
               cast(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint) AS before
        FROM t
    )
    SELECT doc_id, n_tokens,
           before // 2048 AS seq_id,
           cast(before % 2048 AS int) AS seq_offset,
           cast((before + greatest(n_tokens, 1) - 1) // 2048
                - before // 2048 + 1 AS int) AS n_seqs
    FROM o
    """,
    doc="GPT-style sequence-packing metadata (operators/ordered.py:"
    "pack_sequences): concat the corpus in deterministic hashed order, "
    "chunk the token stream at 2048 — each doc's sequence id / offset / "
    "span count. The global running total is a two-phase bucketed prefix "
    "sum (no single-partition window); the oracle replays it with DuckDB's "
    "single-threaded global window — same numbers, different physics.",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.functions.text import token_count
    from lakehouse_architecture_for_realestatedata_spark.operators.ordered import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", max_tokens=2048)
    return out.select("doc_id", "n_tokens", "seq_id", "seq_offset", "n_seqs")


@register(
    "token_budget_curation",
    f"""
    WITH q AS (
        SELECT doc_id, {_duck_quality()} AS quality,
               len({_DUCK_TOKS_Q.format(c='text')}) AS n_tokens
        FROM documents
    ), o AS (
        SELECT doc_id, quality, n_tokens,
               coalesce(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
        FROM q
    )
    SELECT doc_id, quality, n_tokens FROM o WHERE before < 5000
    """,
    doc="Token-budget curation (operators/ordered.py:token_budget_head): "
    "keep the highest-quality docs whose cumulative token count fits a "
    "5000-token budget — greedy-prefix contract (the boundary doc may "
    "overshoot by its own length). Quality bins over [0,1] are the "
    "deterministic range carve-up that makes the prefix sum distributed; "
    "quality doubles are bit-identical across engines (quality_filter's "
    "exact MATCH), so the global DESC order agrees.",
)
def q_token_budget_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.functions.text import (
        quality_score,
        token_count,
    )
    from lakehouse_architecture_for_realestatedata_spark.operators.ordered import token_budget_head

    scored = _t(spark, sf_dir, "documents").select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return token_budget_head(scored, "doc_id", "quality", "n_tokens", budget=5000)


@register(
    "dup_ngram_spans",
    f"""
    WITH g AS (
        SELECT doc_id, unnest({_DUCK_13G.format(t=_DUCK_TOKS_Q.format(c='text'))}) AS g
        FROM documents
    ), dfreq AS (
        SELECT g, count(*) AS df FROM g GROUP BY 1
    )
    SELECT g.doc_id,
           count(*) AS n_grams,
           cast(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS bigint) AS n_dup_grams,
           cast(sum(CASE WHEN dfreq.df >= 2 THEN 1 ELSE 0 END) AS double)
               / count(*) AS dup_fraction
    FROM g JOIN dfreq USING (g)
    GROUP BY 1
    """,
    doc="Per-document verbatim-duplication signal (operators/dedup.py:"
    "duplicated_ngram_stats — the Lee et al. dedup diagnostic at 13-gram "
    "granularity): fraction of each doc's distinct 13-grams that occur in "
    "≥2 documents. One gram-keyed shuffle for document frequencies, one "
    "doc-keyed fold; hashed-gram counts equal string-gram counts up to "
    "2^-64 collisions, so the oracle runs on the strings.",
)
def q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import duplicated_ngram_stats

    docs = _t(spark, sf_dir, "documents")
    return duplicated_ngram_stats(docs, "doc_id", "text", n=13, min_df=2)


@register(
    "decontaminate_bloom_verbatim",
    f"""
    WITH ev AS (
        SELECT doc_id + 600000 AS eval_id,
               'quoted for eval purposes ' || text AS text
        FROM documents WHERE doc_id % 37 = 0
    ), eg AS (
        SELECT DISTINCT eval_id, unnest({_DUCK_13G.format(t=_DUCK_TOKS_Q.format(c='text'))}) AS g
        FROM ev
    ), cg AS (
        SELECT doc_id AS corpus_id, unnest({_DUCK_13G.format(t=_DUCK_TOKS_Q.format(c='text'))}) AS g
        FROM documents
    )
    SELECT cg.corpus_id, eg.eval_id, count(DISTINCT cg.g) AS n_shared_ngrams
    FROM cg JOIN eg ON cg.g = eg.g
    GROUP BY 1, 2
    HAVING count(DISTINCT cg.g) >= 1
    """,
    doc="Bloom-prefiltered verbatim decontamination (operators/dedup.py:"
    "decontaminate_ngram_bloom): the eval set's distinct 13-gram hashes "
    "build a pure-SQL bloom filter (functions/bloom.py — bit_or-aggregated "
    "array<bigint> words on a one-row broadcast), the corpus tests "
    "membership in one narrow exists() codegen pass, and only might-match "
    "documents reach the exact explode+join. No false negatives, exact "
    "verify downstream — so the oracle is the PLAIN exact n-gram overlap "
    "SQL, identical to decontaminate_ngram_verbatim: this row pins "
    "prefilter+verify ≡ exact end-to-end.",
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
        decontaminate_ngram_bloom,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.concat(F.lit("quoted for eval purposes "), F.col("text")).alias("text"),
    )
    return decontaminate_ngram_bloom(docs, eval_df, n=13, min_hits=1)
