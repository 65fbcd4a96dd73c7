"""Unit tests for corpus-prep operators: fixed-size chunking and boilerplate
line removal (the removal path the driver fixture can't exercise — the
synthetic documents have no cross-document repeated lines)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
    chunk_fixed,
    remove_boilerplate_lines,
)


def test_chunk_fixed_coverage_and_overlap(spark):
    df = spark.createDataFrame([(1, "abcdefghij")], "id long, text string")  # len 10
    rows = {
        r["chunk_id"]: r["chunk_text"]
        for r in chunk_fixed(df, "id", "text", size=8, overlap=2).collect()
    }
    # stride 6: ceil((10-2)/6) = 2 chunks, [0:8] and [6:10]
    assert rows == {0: "abcdefgh", 1: "ghij"}


def test_chunk_fixed_short_null_empty(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "")], "id long, text string"
    )
    out = chunk_fixed(df, "id", "text", size=8, overlap=2).collect()
    # short doc -> exactly one whole-text chunk; NULL/empty -> no rows
    assert [(r["id"], r["chunk_id"], r["chunk_text"], r["n_chars"]) for r in out] == [
        (1, 0, "abc", 3)
    ]


def test_chunk_fixed_reconstruction(spark):
    """De-overlapped chunk concatenation reproduces the document exactly."""
    text = "the quick brown fox jumps over the lazy dog " * 20
    df = spark.createDataFrame([(1, text)], "id long, text string")
    chunks = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in chunk_fixed(df, "id", "text", size=100, overlap=30).collect()
    )
    rebuilt = chunks[0][1] + "".join(c[30:] for _, c in chunks[1:])
    assert rebuilt == text
    # every chunk except possibly the last is full-size
    assert all(len(c) == 100 for _, c in chunks[:-1])


def test_chunk_fixed_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        chunk_fixed(df, "id", "text", size=0)
    with pytest.raises(ValueError):
        chunk_fixed(df, "id", "text", size=5, overlap=5)


BOILER = "Accept cookies to continue"


def _corpus(spark):
    docs = [
        (1, f"{BOILER}\nunique alpha one\nunique alpha two"),
        (2, f"{BOILER}\nunique beta"),
        (3, f"  {BOILER}  \nunique gamma\n\nunique gamma tail"),  # trim-normalized match
        (4, "no boilerplate here\nsecond line"),
        (5, None),
        (6, f"{BOILER}"),  # becomes fully empty after scrub
    ]
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_boilerplate_removed_and_order_preserved(spark):
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(_corpus(spark), "doc_id", "text", min_docs=3).collect()
    }
    assert out[1] == "unique alpha one\nunique alpha two"
    assert out[2] == "unique beta"
    # empty line survives, order preserved, trim-variant of the boiler line removed
    assert out[3] == "unique gamma\n\nunique gamma tail"
    assert out[4] == "no boilerplate here\nsecond line"
    assert out[5] == ""  # NULL text -> present with empty clean_text
    assert out[6] == ""  # fully-scrubbed doc survives as empty
    assert set(out) == {1, 2, 3, 4, 5, 6}


def test_boilerplate_threshold_not_met(spark):
    """min_docs above the line's document frequency -> identity round-trip."""
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_boilerplate_lines(_corpus(spark), "doc_id", "text", min_docs=5).collect()
    }
    src = {r["doc_id"]: r["text"] for r in _corpus(spark).collect()}
    for i in (1, 2, 4, 6):
        assert out[i] == src[i]
    assert out[3] == src[3]  # kept verbatim incl. surrounding whitespace
    assert out[5] == ""


def test_boilerplate_rejects_min_docs_one(spark):
    with pytest.raises(ValueError):
        remove_boilerplate_lines(_corpus(spark), "doc_id", "text", min_docs=1)


def test_boilerplate_join_is_broadcast(spark):
    """The removal anti-join must be broadcast (the boilerplate set is tiny
    by definition) — a shuffled line-keyed join would be a second full
    exchange of the corpus at 100 TB — and it must be the ONLY join: the
    doc spine reaches the reassembly via the unioned sentinel row, never a
    full-corpus join back."""
    plan = remove_boilerplate_lines(
        _corpus(spark), "doc_id", "text", min_docs=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Join") == 1


class TestBuildVocab:
    def _corpus(self, spark):
        rows = [(i, "alpha beta gamma " * 3 + "beta gamma " * 2 + "delta") for i in range(4)]
        rows += [(100, "epsilon")]  # below min_count
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_ids_contiguous_and_frequency_ranked(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.textprep import build_vocab

        out = sorted(
            (r["id"], r["token"], r["n"])
            for r in build_vocab(self._corpus(spark), "text", min_count=2).collect()
        )
        # per doc: alpha 3, beta 5, gamma 5, delta 1 -> ×4 docs
        assert [o[1] for o in out] == ["beta", "gamma", "alpha", "delta"]
        assert [o[0] for o in out] == [0, 1, 2, 3]  # contiguous, 0-based
        assert [o[2] for o in out] == [20, 20, 12, 4]  # count desc, token tiebreak
        # epsilon (n=1) filtered
        assert "epsilon" not in {o[1] for o in out}

    def test_partition_invariance(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.textprep import build_vocab

        df = self._corpus(spark)
        a = sorted(map(tuple, build_vocab(df.coalesce(1), "text", 2).collect()))
        b = sorted(map(tuple, build_vocab(df.repartition(8), "text", 2).collect()))
        assert a == b

    def test_no_single_partition_window(self, spark):
        """The global rank must never funnel the vocab through one task."""
        from lakehouse_architecture_for_realestatedata_spark.operators.textprep import build_vocab

        plan = (
            build_vocab(self._corpus(spark), "text", 2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "SinglePartition" not in plan


class TestEncodeDocuments:
    def test_encoding_alignment_and_oov(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
            build_vocab,
            encode_documents,
        )

        docs = spark.createDataFrame(
            [
                (1, "alpha beta alpha"),
                (2, "beta rare alpha"),  # 'rare' appears once -> OOV at min_count=2
                (3, None),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        vocab = build_vocab(docs, "text", min_count=2)
        v = {r["token"]: r["id"] for r in vocab.collect()}
        out = {
            r["doc_id"]: (r["ids"], r["n_tokens"], r["n_oov"])
            for r in encode_documents(docs, vocab, "doc_id", "text").collect()
        }
        a, b = v["alpha"], v["beta"]
        assert out[1] == ([a, b, a], 3, 0)
        assert out[2] == ([b, -1, a], 3, 1)  # OOV keeps its position
        assert out[3] == ([], 0, 0)
        assert out[4] == ([], 0, 0)
        assert set(out) == {1, 2, 3, 4}

    def test_broadcast_and_single_reassembly_shuffle(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
            build_vocab,
            encode_documents,
        )

        docs = spark.createDataFrame([(1, "x y x")], "doc_id long, text string")
        vocab = build_vocab(docs, "text", min_count=1)
        plan = (
            encode_documents(docs, vocab, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # vocab join broadcast; no SortMergeJoin anywhere (doc spine rides
        # the sentinel union, vocab rides the broadcast)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestTokenBigrams:
    def test_counts_probabilities_and_guards(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
            token_bigram_counts,
        )

        docs = spark.createDataFrame(
            [
                (1, "a b a b c"),
                (2, "a b"),
                (3, "solo"),  # <2 tokens: contributes nothing
                (4, None),
                (5, ""),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["w1"], r["w2"]): (r["n"], r["p"])
            for r in token_bigram_counts(docs, "text", min_count=1).collect()
        }
        # bigrams: (a,b)x3, (b,a)x1, (b,c)x1
        assert out[("a", "b")] == (3, 1.0)
        assert out[("b", "a")] == (1, pytest.approx(0.5))
        assert out[("b", "c")] == (1, pytest.approx(0.5))
        assert len(out) == 3

    def test_min_count_filters_after_probability(self, spark):
        """p keeps the unfiltered denominator: filtering (b,*) singletons
        must not inflate surviving probabilities."""
        from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
            token_bigram_counts,
        )

        docs = spark.createDataFrame(
            [(1, "b a b a b c")], "doc_id long, text string"
        )  # (b,a)x2 (a,b)x2 (b,c)x1
        out = {
            (r["w1"], r["w2"]): (r["n"], r["p"])
            for r in token_bigram_counts(docs, "text", min_count=2).collect()
        }
        assert out[("b", "a")] == (2, pytest.approx(2 / 3))  # not 1.0
        assert ("b", "c") not in out


def test_chunk_reconstruction_property(spark):
    """Random (size, overlap, length): de-overlapped concatenation is the
    identity, chunk count matches the closed form, every non-final chunk is
    full-size."""
    import math
    import random

    rng = random.Random(11)
    cases = []
    for i in range(25):
        size = rng.randint(2, 40)
        overlap = rng.randint(0, size - 1)
        length = rng.randint(1, 200)
        text = "".join(rng.choice("abcdefg") for _ in range(length))
        cases.append((i, size, overlap, text))
    df = spark.createDataFrame(
        [(i, t) for i, _, _, t in cases], "id long, text string"
    )
    for i, size, overlap, text in cases:
        chunks = sorted(
            (r["chunk_id"], r["chunk_text"])
            for r in chunk_fixed(
                df.filter(f"id = {i}"), "id", "text", size, overlap
            ).collect()
        )
        stride = size - overlap
        want_n = max(1, math.ceil((len(text) - overlap) / stride))
        assert len(chunks) == want_n, (i, size, overlap, len(text))
        rebuilt = chunks[0][1] + "".join(c[overlap:] for _, c in chunks[1:])
        assert rebuilt == text
        assert all(len(c) == size for _, c in chunks[:-1])


def test_vocab_coverage_curve_properties(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
        vocab_with_coverage,
    )

    docs = spark.createDataFrame(
        [(1, "a a a a b b c rare")], "id long, text string"  # a:4 b:2 c:1 rare:1
    )
    out = sorted(
        (r["id"], r["token"], r["n"], r["cum_frac"])
        for r in vocab_with_coverage(docs, "text", min_count=2).collect()
    )
    # denominator counts ALL 8 tokens incl. sub-threshold c/rare
    assert out == [(0, "a", 4, 0.5), (1, "b", 2, 0.75)]
    # monotone non-decreasing coverage, never exceeding 1
    fr = [o[3] for o in out]
    assert fr == sorted(fr) and fr[-1] <= 1.0


def test_encode_shuffle_join_variant_matches_broadcast(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
        build_vocab,
        encode_documents,
    )

    docs = spark.createDataFrame(
        [(1, "x y x z"), (2, "y y q")], "doc_id long, text string"
    )
    vocab = build_vocab(docs, "text", min_count=1)
    a = sorted(map(tuple, encode_documents(docs, vocab, "doc_id", "text").collect()))
    b = sorted(
        map(
            tuple,
            encode_documents(
                docs, vocab, "doc_id", "text", broadcast_vocab=False
            ).collect(),
        )
    )
    assert a == b


def test_chunk_fixed_multibyte_unicode(spark):
    """Character (not byte) semantics: multi-byte text chunks and rebuilds
    exactly — the contract the DuckDB oracle shares (both engines count
    code points)."""
    text = "xin chào thế giới — đây là một đoạn văn bản dài hơn " * 4
    df = spark.createDataFrame([(1, text)], "id long, text string")
    chunks = sorted(
        (r["chunk_id"], r["chunk_text"])
        for r in chunk_fixed(df, "id", "text", size=30, overlap=10).collect()
    )
    rebuilt = chunks[0][1] + "".join(c[10:] for _, c in chunks[1:])
    assert rebuilt == text
    assert all(len(c) == 30 for _, c in chunks[:-1])


def test_boilerplate_partition_invariance(spark):
    df = _corpus(spark)
    a = sorted(map(tuple, remove_boilerplate_lines(df.coalesce(1), "doc_id", "text", 3).collect()))
    b = sorted(map(tuple, remove_boilerplate_lines(df.repartition(8), "doc_id", "text", 3).collect()))
    assert a == b


def test_doc_perplexity_ranks_gibberish_high(spark):
    """Perplexity filter contract: fluent repeats of corpus-frequent
    bigrams score LOW, never-seen token sequences hit the smoothing floor
    (= -log2(floor_p) bits exactly), short docs (<2 tokens) score NULL,
    and scores are bit-stable across partitionings."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
        score_doc_perplexity,
        token_bigram_counts,
    )

    fluent = "the cat sat on the mat " * 10
    rows = [(i, fluent) for i in range(20)]
    rows += [(100, "zq xv qj wk vx jz zz qq"), (101, "one"), (102, fluent)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # held-out LM: trained on the fluent corpus only, so the gibberish
    # doc's bigrams are genuinely unseen (self-scoring would memorize them)
    lm = token_bigram_counts(df.filter(F.col("doc_id") < 100), "text")
    out = {r["doc_id"]: r for r in score_doc_perplexity(df, "doc_id", "text", lm=lm).collect()}
    assert out[101]["bits_per_bigram"] is None and out[101]["n_bigrams"] == 0
    assert out[102]["bits_per_bigram"] < out[100]["bits_per_bigram"]
    # all-unseen doc sits exactly at the floor: -log2(1e-6) bits per bigram
    import math

    floor_bits = -math.log2(1e-6)
    assert abs(out[100]["bits_per_bigram"] - floor_bits) < 1e-6
    assert abs(out[100]["perplexity"] - 2 ** out[100]["bits_per_bigram"]) < 1e-6
    a = sorted(map(tuple, score_doc_perplexity(df.coalesce(1), "doc_id", "text", lm=lm).collect()))
    b = sorted(map(tuple, score_doc_perplexity(df.repartition(7), "doc_id", "text", lm=lm).collect()))
    assert a == b
