"""End-to-end corpus-preparation pipeline (plans/corpus.py): funnel statuses
partition the input, planted duplicates are caught by the right stage, the
output is deterministic under repartitioning, and prepare_corpus equals the
stepwise application of its stages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.plans.corpus import (
    CorpusPrepConfig,
    annotate,
    corpus_funnel,
    funnel_report,
    prepare_corpus,
)

CFG = CorpusPrepConfig(min_quality=0.2, near_dup=True, jaccard_threshold=0.5)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    """documents plus planted pathologies:
    - 9001: byte-identical copy of doc 1 (exact_dup)
    - 9002: doc 2 with one word swapped (near_dup at jaccard 0.5)
    - 9003: empty text (gated: too_short/low_quality)
    """
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") < 200
    ).select("doc_id", "text")
    src = {r["doc_id"]: r["text"] for r in base.filter(F.col("doc_id").isin(1, 2)).collect()}
    toks = src[2].split()
    near = " ".join(toks[:-1] + ["zzzmutation"])
    planted = spark.createDataFrame(
        [(9001, src[1]), (9002, near), (9003, "")], "doc_id long, text string"
    )
    return base.unionByName(planted)


def test_funnel_statuses_partition_input(spark, docs):
    funnel = corpus_funnel(docs, CFG)
    assert funnel.count() == docs.count()  # no row lost or duplicated
    assert funnel.select("doc_id").distinct().count() == docs.count()
    statuses = {r["status"] for r in funnel.select("status").distinct().collect()}
    assert statuses <= {"kept", "low_quality", "wrong_lang", "too_short", "exact_dup", "near_dup"}


def test_planted_fates(spark, docs):
    fates = {
        r["doc_id"]: r["status"]
        for r in corpus_funnel(docs, CFG).filter(F.col("doc_id") >= 9000).collect()
    }
    assert fates[9001] == "exact_dup"  # identical copy, loses to min id 1
    assert fates[9002] == "near_dup"  # one-word mutation of doc 2
    assert fates[9003] in ("too_short", "low_quality")  # never reaches dedup
    # originals survive: the canonical member of each cluster is kept
    originals = {
        r["doc_id"]: r["status"]
        for r in corpus_funnel(docs, CFG).filter(F.col("doc_id").isin(1, 2)).collect()
    }
    assert originals[1] == "kept" and originals[2] == "kept"


def test_funnel_report_sums_to_total(spark, docs):
    rep = {r["status"]: r["n_docs"] for r in funnel_report(docs, CFG).collect()}
    assert sum(rep.values()) == docs.count()
    assert rep.get("exact_dup", 0) >= 1 and rep.get("near_dup", 0) >= 1


def test_prepare_corpus_deterministic_and_split(spark, docs):
    out1 = prepare_corpus(docs, CFG)
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    ids2 = sorted(r["doc_id"] for r in prepare_corpus(docs.repartition(7), CFG).collect())
    assert ids1 == ids2  # partition-invariant
    splits = {r["split"] for r in out1.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    # split is a pure function of (id, salt): re-run agrees row-for-row
    a = {(r["doc_id"], r["split"]) for r in out1.collect()}
    b = {(r["doc_id"], r["split"]) for r in prepare_corpus(docs, CFG).collect()}
    assert a == b


def test_prepare_equals_stepwise(spark, docs):
    """prepare_corpus kept-set == gates, then exact dedup, then near dedup
    applied one at a time with the same operators."""
    from lakehouse_architecture_for_realestatedata_spark.functions.text import doc_fingerprint
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
        dedup_latest,
        minhash_lsh_pairs,
    )
    from lakehouse_architecture_for_realestatedata_spark.operators.graph import keep_canonical

    ann = annotate(docs, CFG)
    gated = ann.filter(
        (F.col("quality") >= CFG.min_quality) & (F.col("n_tokens") >= CFG.min_tokens)
    )
    exact = dedup_latest(
        gated.withColumn("__fp", doc_fingerprint(F.col("text"))),
        "__fp",
        [F.col("doc_id").asc()],
    ).drop("__fp")
    pairs = minhash_lsh_pairs(exact, "doc_id", "text", k=CFG.shingle_k, threshold=CFG.jaccard_threshold)
    stepwise = keep_canonical(exact, pairs, "doc_id")
    want = sorted(r["doc_id"] for r in stepwise.collect())
    got = sorted(r["doc_id"] for r in prepare_corpus(docs, CFG).collect())
    assert got == want


def test_idempotent_on_clean_corpus(spark, docs):
    """Running the pipeline on its own output removes nothing."""
    clean = prepare_corpus(docs, CFG).drop("split", "quality", "lang", "n_tokens")
    again = prepare_corpus(clean, CFG)
    assert again.count() == clean.count()


def test_export_shards_deterministic_and_shuffled(spark, docs, tmp_path):
    import glob

    from lakehouse_architecture_for_realestatedata_spark.plans.corpus import export_shards

    out = prepare_corpus(docs, CFG).select("doc_id", "text", "split")
    p1, p2 = str(tmp_path / "x1"), str(tmp_path / "x2")
    export_shards(out, p1, n_shards=4, key="doc_id")
    export_shards(out.repartition(11), p2, n_shards=4, key="doc_id")

    def shard_contents(p):
        # per-shard ordered doc_id lists, keyed by shard index
        files = sorted(glob.glob(f"{p}/part-*.parquet"))
        assert len(files) == 4
        return [
            [r["doc_id"] for r in spark.read.parquet(f).collect()] for f in files
        ]

    s1, s2 = shard_contents(p1), shard_contents(p2)
    assert s1 == s2  # byte-stable membership AND row order under repartition
    # globally shuffled: within-shard order is not id order
    assert any(lst != sorted(lst) for lst in s1 if len(lst) > 2)
    # different salt redraws the shuffle
    p3 = str(tmp_path / "x3")
    export_shards(out, p3, n_shards=4, key="doc_id", salt="other")
    assert shard_contents(p3) != s1
    # nothing lost
    assert sorted(x for lst in s1 for x in lst) == sorted(
        r["doc_id"] for r in out.collect()
    )


def test_incremental_equals_oneshot_on_id_ordered_batches(spark, docs, tmp_path):
    """Processing id-ordered batches through prepare_corpus_incremental must
    keep exactly the same document set as one-shot prepare_corpus on the
    union — the invariant that makes the daily-drop pipeline trustworthy."""
    from lakehouse_architecture_for_realestatedata_spark.plans.corpus import prepare_corpus_incremental
    from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable

    state = str(tmp_path / "state")
    b1 = docs.filter(F.col("doc_id") < 100)
    b2 = docs.filter(F.col("doc_id") >= 100)  # includes the planted 9001/9002/9003
    new1 = prepare_corpus_incremental(spark, b1, state, CFG)
    new2 = prepare_corpus_incremental(spark, b2, state, CFG)

    oneshot = prepare_corpus(docs, CFG)
    want = sorted(r["doc_id"] for r in oneshot.collect())
    got_new = sorted(
        [r["doc_id"] for r in new1.collect()] + [r["doc_id"] for r in new2.collect()]
    )
    assert got_new == want
    # the persisted prepared table agrees with the returned increments
    table = ParquetTable(spark, f"{state}/prepared").read()
    assert sorted(r["doc_id"] for r in table.collect()) == want
    # split assignment identical to one-shot (pure function of id+salt)
    ws = {(r["doc_id"], r["split"]) for r in oneshot.collect()}
    ts = {(r["doc_id"], r["split"]) for r in table.collect()}
    assert ts == ws


def test_incremental_rejects_cross_batch_duplicates(spark, docs, tmp_path):
    """A batch-2 copy (exact or near) of a batch-1 keeper must be dropped by
    the HISTORY index, not just within-batch logic."""
    from lakehouse_architecture_for_realestatedata_spark.plans.corpus import prepare_corpus_incremental

    state = str(tmp_path / "state2")
    b1 = docs.filter(F.col("doc_id") < 100)
    kept1 = {r["doc_id"] for r in prepare_corpus_incremental(spark, b1, state, CFG).collect()}
    src = min(kept1)
    text = docs.filter(F.col("doc_id") == src).collect()[0]["text"]
    toks = text.split()
    b2 = spark.createDataFrame(
        [
            (20001, text),  # exact copy of a batch-1 keeper
            (20002, " ".join(toks[:-1] + ["zzznearmutation"])),  # near copy
            (20003, "an entirely fresh document about orbital mechanics and dynamics today"),
        ],
        "doc_id long, text string",
    )
    kept2 = {r["doc_id"] for r in prepare_corpus_incremental(spark, b2, state, CFG).collect()}
    assert 20001 not in kept2  # exact dup vs history index
    assert 20002 not in kept2  # near dup vs history bucket index
    assert 20003 in kept2


def test_funnel_contamination_stage(spark, docs):
    """With an eval set, surviving docs that overlap it are labeled
    'contaminated'; dedup verdicts still win (a near-dup stays near_dup)."""
    src = docs.filter(F.col("doc_id") == 7).collect()[0]["text"]
    eval_df = spark.createDataFrame(
        [(1, "bench " + src)], "doc_id long, text string"
    )
    funnel = corpus_funnel(docs, CFG, eval_df=eval_df)
    fates = {r["doc_id"]: r["status"] for r in funnel.collect()}
    assert fates[7] == "contaminated"
    assert fates[9001] == "exact_dup" and fates[9002] == "near_dup"  # unchanged
    # prepare_corpus drops it
    kept = {r["doc_id"] for r in prepare_corpus(docs, CFG, eval_df=eval_df).collect()}
    assert 7 not in kept
    # without eval_df, doc 7 is kept
    assert 7 in {r["doc_id"] for r in prepare_corpus(docs, CFG).collect()}


def test_language_gate(spark, docs):
    cfg = CorpusPrepConfig(min_quality=0.0, langs=("en",), near_dup=False)
    funnel = corpus_funnel(docs, cfg)
    fates = {r["status"] for r in funnel.collect()}
    assert "wrong_lang" in fates
    kept_langs = {
        r["lang"]
        for r in funnel.filter(F.col("status") == "kept").select("lang").distinct().collect()
    }
    assert kept_langs <= {"en"}
