"""Property tests for the fuzzy-dedup family — the operators whose outputs
are hash-dependent and therefore oracle-exempt (driver records rows-only):
we assert the *semantic* contracts instead — candidate recall vs exact
Jaccard, verification precision, planted-duplicate recovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
    dedup_latest,
    dedup_latest_agg,
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_minhash_precision_and_recall_vs_exact(spark, sf_dir):
    """Every MinHash-LSH pair must truly have Jaccard ≥ threshold (precision
    1.0 by construction — final exact verification) and high-similarity pairs
    (J ≥ 0.8, well above the 0.5 LSH operating point) must be recovered."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    lsh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    # precision: reported pairs are a subset of truly-similar pairs with equal J
    for pair, j in lsh.items():
        assert pair in exact and abs(exact[pair] - j) < 1e-9
    # recall at J≥0.8 (16 bands × 4 rows: P(detect) ≈ 1-(1-0.8^4)^16 ≈ 0.9997)
    strong = {p for p, j in exact.items() if j >= 0.8}
    found = strong & set(lsh)
    assert len(found) >= 0.9 * len(strong), (len(found), len(strong))


def test_simhash_pairs_are_near_duplicates(spark, sf_dir):
    """SimHash pairs at Hamming ≤3/64 must share most of their vocabulary."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    pairs = simhash_dedup_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    if not pairs:
        return
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", k=1, threshold=0.0).collect()
    }
    sims = [exact.get((r["id_a"], r["id_b"]), 0.0) for r in pairs]
    # simhash at d≤3 is a strong similarity signal: token-jaccard should be high
    assert sum(s >= 0.5 for s in sims) >= 0.8 * len(sims)


def test_embedding_near_dup_recovers_planted(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i == 0, F.lit(0.05)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
        "label",
    )
    pairs = embedding_near_dup_pairs(
        emb.unionByName(planted), "vec_id", "embedding", threshold=0.95
    ).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    want = {(i, i + 100000) for i in range(50)}
    assert len(got & want) >= 45  # ≥90% recall of planted near-identical pairs
    for r in pairs:
        assert r["cosine"] >= 0.95  # precision via final verification


def test_dedup_latest_agg_equals_window_variant(spark, sf_dir):
    """max_by-based skew-robust dedup ≡ window-based dedup when the ordering
    key is unique."""
    from lakehouse_architecture_for_realestatedata_spark.queries import _events

    ev = _events(spark, sf_dir)
    # event_id is unique → order by (ts, event_id) is total; use event_id as
    # the max_by key proxy for determinism
    a = dedup_latest(ev, "user_id", [F.col("event_id").desc()])
    b = dedup_latest_agg(ev, "user_id", "event_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_fuzzy_pairs_blocked(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import fuzzy_pairs_blocked

    df = spark.createDataFrame(
        [
            (1, "12 le loi", "q1"),
            (2, "12 le lo", "q1"),     # distance 1 from id 1, same block
            (3, "99 tran phu", "q1"),  # far from both
            (4, "12 le loi", "q3"),    # identical text, DIFFERENT block → no pair
        ],
        "id int, addr string, district string",
    )
    pairs = fuzzy_pairs_blocked(df, "id", "addr", F.col("district"), max_distance=2).collect()
    assert {(r["id_a"], r["id_b"], r["distance"]) for r in pairs} == {(1, 2, 1)}


def test_decontaminate_finds_planted_overlap(spark, sf_dir):
    """Eval docs derived from corpus docs (one-word perturbation) must map
    back to exactly their source documents; unrelated docs must not flag."""
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
        decontaminate,
        decontaminated_corpus,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 300)
        .select("doc_id", "text")
    )
    planted_src = [r["doc_id"] for r in docs.filter(F.col("doc_id") % 50 == 3).collect()]
    eval_df = docs.filter(F.col("doc_id") % 50 == 3).select(
        (F.col("doc_id") + 7000).alias("doc_id"),
        F.concat(F.lit("benchprefix "), F.col("text")).alias("text"),
    )
    hits = decontaminate(docs, eval_df, threshold=0.5)
    got = {(r["corpus_id"], r["eval_id"]) for r in hits.collect()}
    want = {(s, s + 7000) for s in planted_src}
    assert want <= got  # every planted source found against its eval twin
    # precision: nothing unrelated flagged (word-soup corpus: distinct docs
    # share almost no shingles)
    assert {c for c, _ in got} == set(planted_src)
    # and the cleaned corpus drops exactly the contaminated ids
    clean = decontaminated_corpus(docs, eval_df, threshold=0.5)
    assert clean.count() == docs.count() - len(planted_src)
    assert clean.filter(F.col("doc_id").isin(planted_src)).count() == 0


def test_decontaminate_clean_corpus_is_untouched(spark, sf_dir):
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import decontaminate

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    eval_df = spark.createDataFrame(
        [(1, "completely unrelated benchmark question about astrophysics")],
        "doc_id long, text string",
    )
    assert decontaminate(docs, eval_df, threshold=0.5).count() == 0


def test_ngram_decontamination_catches_embedded_quotes(spark, sf_dir):
    """An eval question QUOTED inside a long document is invisible to
    Jaccard (tiny shingle-set overlap) but must be caught by the verbatim
    n-gram rule — the GPT-3-style contamination case."""
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
        decontaminate,
        decontaminate_ngram,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    question = (
        "what is the expected number of rolls of a fair die until "
        "every face has appeared at least once in total"
    )  # 19 tokens > n=13
    long_doc = docs.filter(F.col("doc_id") == 5).select(
        F.lit(10001).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + question + " "), F.col("text")).alias("text"),
    )
    corpus = docs.unionByName(long_doc)
    eval_df = spark.createDataFrame([(1, question)], "doc_id long, text string")

    jac = decontaminate(corpus, eval_df, threshold=0.5)
    assert jac.filter(F.col("corpus_id") == 10001).count() == 0  # Jaccard blind

    ng = decontaminate_ngram(corpus, eval_df, n=13)
    hits = {(r["corpus_id"], r["eval_id"]) for r in ng.collect()}
    assert (10001, 1) in hits
    # precision: the word-soup corpus shares no 13-gram with the question
    assert all(c == 10001 for c, _ in hits)


class TestBloomPrefilter:
    def test_bloom_has_no_false_negatives_and_bounded_fp(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.functions import bloom

        members = spark.range(2_000).select(F.xxhash64("id").alias("h"))
        n_bits = bloom.bloom_n_bits(2_000, bits_per_item=10)
        words = bloom.bloom_build(members, "h", n_bits)
        probes = spark.range(10_000).select(
            "id", F.xxhash64("id").alias("h")
        )  # first 2000 are members
        hit = (
            bloom.with_bloom(probes, words)
            .withColumn(
                "m", bloom.bloom_might_contain(F.col("__bloom"), F.col("h"), n_bits)
            )
        )
        n_member_hits = hit.filter((F.col("id") < 2_000) & F.col("m")).count()
        assert n_member_hits == 2_000  # every inserted element tests positive
        fp = hit.filter((F.col("id") >= 2_000) & F.col("m")).count()
        assert fp <= 0.05 * 8_000, fp  # ~1% expected at 10 bits/item

    def test_bloom_decontamination_equals_exact(self, spark, sf_dir):
        from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
            decontaminate_ngram,
            decontaminate_ngram_bloom,
        )

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
        )
        eval_df = docs.filter(F.col("doc_id") % 37 == 0).select(
            (F.col("doc_id") + 600000).alias("doc_id"),
            F.concat(F.lit("quoted for eval purposes "), F.col("text")).alias("text"),
        )
        exact = sorted(map(tuple, decontaminate_ngram(docs, eval_df, n=13).collect()))
        blm = sorted(
            map(tuple, decontaminate_ngram_bloom(docs, eval_df, n=13).collect())
        )
        assert blm == exact  # no false negatives + exact verify ≡ exact

    def test_bloom_empty_eval_returns_empty(self, spark, sf_dir):
        from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
            decontaminate_ngram_bloom,
        )

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") < 50)
            .select("doc_id", "text")
        )
        out = decontaminate_ngram_bloom(docs, docs.limit(0), n=13)
        assert out.count() == 0
        assert out.columns == ["corpus_id", "eval_id", "n_shared_ngrams"]


class TestPageRank:
    def test_matches_numpy_power_iteration(self, spark):
        import random

        import numpy as np

        from lakehouse_architecture_for_realestatedata_spark.operators.graph import pagerank

        rng = random.Random(3)
        n, d, iters = 40, 0.85, 12
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["rank"] for r in pagerank(df, n_iters=iters).collect()}

        present = sorted({u for e in edges for u in e})
        idx = {u: i for i, u in enumerate(present)}
        m = len(present)
        A = np.zeros((m, m))
        outdeg = {}
        for s, t in edges:
            outdeg[s] = outdeg.get(s, 0) + 1
        for s, t in edges:
            A[idx[t], idx[s]] += 1.0 / outdeg[s]
        r = np.full(m, 1.0 / m)
        dang = np.array([1.0 if u not in outdeg else 0.0 for u in present])
        for _ in range(iters):
            r = (1 - d) / m + d * (A @ r + (dang @ r) / m)
        want = {u: r[idx[u]] for u in present}
        assert set(got) == set(want)
        for u in present:
            assert abs(got[u] - want[u]) < 1e-9, (u, got[u], want[u])
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_partition_invariance_bit_exact(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.graph import pagerank

        edges = [(i, (i * 7 + 3) % 23) for i in range(23)] + [(5, 11), (11, 5)]
        df = spark.createDataFrame(edges, "src long, dst long")
        a = sorted(map(tuple, pagerank(df.coalesce(1), n_iters=6).collect()))
        b = sorted(map(tuple, pagerank(df.repartition(9), n_iters=6).collect()))
        assert a == b  # decimal-summed contributions: exact equality


def test_ngram_jaccard_prefix_equals_plain(spark, sf_dir):
    """Prefix filtering is an OPTIMIZATION, not an approximation: the
    PPJoin-style variant must produce exactly the plain shared-shingle
    join's pairs and scores at every threshold."""
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for t in (0.5, 0.8):
        plain = sorted(map(tuple, ngram_jaccard_pairs(docs, "doc_id", "text", 3, t).collect()))
        pref = sorted(map(tuple, ngram_jaccard_pairs_prefix(docs, "doc_id", "text", 3, t).collect()))
        assert pref == plain and len(plain) > 0


def test_triangle_count_known_and_random(spark):
    """K4 has 4 triangles (dup/reversed/self edges ignored); a seeded
    G(40, 0.3) matches a driver-side adjacency-set reference."""
    import random

    from lakehouse_architecture_for_realestatedata_spark.operators.graph import triangle_count

    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (2, 1), (3, 3)],
        "src long, dst long",
    )
    assert triangle_count(k4).collect()[0][0] == 4
    rng = random.Random(7)
    n = 40
    es = [(i, j) for i in range(n) for j in range(i + 1, n) if rng.random() < 0.3]
    adj = {i: set() for i in range(n)}
    for i, j in es:
        adj[i].add(j)
        adj[j].add(i)
    ref = sum(
        len([k for k in (adj[i] & adj[j]) if k > j])
        for i in range(n)
        for j in adj[i]
        if j > i
    )
    got = triangle_count(spark.createDataFrame(es, "src long, dst long")).collect()[0][0]
    assert got == ref


def test_semdedup_planted_recall(spark, sf_dir):
    """SemDeDup (k-means-blocked semantic dedup) must (a) drop planted
    near-identical copies with the original as keeper, (b) never drop a
    natural vector — the synthetic corpus has no natural pair above 0.95,
    so every emitted drop MUST be a planted id. Recall tolerates the rare
    boundary case where a perturbed copy crosses into a different Lloyd
    cell than its original."""
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import semdedup_prune

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x + F.when(i == 0, F.lit(0.05)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
        "label",
    )
    corpus = emb.unionByName(planted)
    dropped = semdedup_prune(
        corpus, "vec_id", "embedding", n_cells=8, threshold=0.95, n_iters=1
    ).collect()
    by_id = {r["dropped_id"]: r for r in dropped}
    # (b) precision: only planted copies are ever dropped
    assert all(d >= 100000 for d in by_id), sorted(by_id)[:5]
    # keeper is the original (the only ≥0.95 neighbor with a smaller id)
    for d, r in by_id.items():
        assert r["keeper_id"] == d - 100000
        assert r["max_sim"] >= 0.95
    # (a) recall: ≥90% of planted copies land in their original's cell
    assert len(by_id) >= 45, len(by_id)


def test_minhash_md5_variant_precision_recall_and_determinism(spark, sf_dir):
    """The cross-engine-exact salted-md5 MinHash variant
    (minhash_lsh_pairs_md5 — the dedup family's hard-oracle LSH row) must
    behave like the numpy fast path: precision 1.0 by construction (exact
    Jaccard verify) and near-total recall at J >= 0.8 (8 single-hash bands:
    P(detect) = 1-(1-0.8)^8 ~ 0.99999974); reruns are bit-identical."""
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
        minhash_lsh_pairs_md5,
    )

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    runs = []
    for _ in range(2):
        runs.append(
            {
                (r["id_a"], r["id_b"]): (r["n_shared"], r["jaccard"])
                for r in minhash_lsh_pairs_md5(
                    docs, "doc_id", "text", k=3, bands=8, threshold=0.5
                ).collect()
            }
        )
    assert runs[0] == runs[1]
    lsh = {p: j for p, (_, j) in runs[0].items()}
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    for pair, j in lsh.items():
        assert pair in exact and abs(exact[pair] - j) < 1e-12, pair
    strong = {p for p, j in exact.items() if j >= 0.8}
    assert strong <= set(lsh), strong - set(lsh)


def test_simhash_md5_variant_finds_near_dups_and_is_deterministic(spark, sf_dir):
    """The md5-based SimHash (hard-oracle twin of the xxhash64 path) must
    recover planted near-duplicates (tiny edits → small Hamming distance),
    keep unrelated docs apart, and hash-stably rerun."""
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
        simhash_pairs_md5,
    )

    base = (
        "the quarterly revenue report shows strong growth across all "
        "regions with particular strength in the northern markets and "
        "steady performance in services consulting and licensing revenue "
        "streams during the second half of the fiscal year"
    )
    rows = [
        (1, base),
        (2, base.replace("strong", "robust")),  # one-token edit
        (3, base + " appendix follows"),        # small suffix
        (4, "completely different text about gardening tulips and soil "
            "acidity for spring planting in raised cedar beds with compost"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_md5(df, max_hamming=3).collect()
    }
    assert (1, 2) in got and (1, 3) in got, got
    assert all(4 not in pair for pair in got), got
    rerun = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs_md5(df, max_hamming=3).collect()
    }
    assert got == rerun


def test_md5_lsh_twins_max_bucket_drops_boilerplate_fanout(spark):
    """Degenerate-bucket cap on the cross-engine-exact md5 twins (VERDICT
    r9 #2): a boilerplate text shared verbatim by 30 documents puts all 30
    into the same (band, bucket) — without the cap that is ~30²/2 candidate
    pairs of noise per band; with ``max_bucket`` below 30 those buckets
    emit ZERO pairs while a genuine near-duplicate pair in its own small
    bucket survives. Mirrors tests/test_retrieval.py's winnowing pin."""
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
        minhash_lsh_pairs_md5,
        simhash_pairs_md5,
    )

    boiler = (
        "all rights reserved unauthorized copying of this file via any "
        "medium is strictly prohibited proprietary and confidential "
        "license terms apply to every distribution of this work"
    )
    near_a = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronomers catalog variable stars from the observatory roof"
    )
    near_b = near_a + " closing remark"  # hamming 2 on the 60-bit simhash
    rows = [(i, boiler) for i in range(1, 31)] + [(101, near_a), (102, near_b)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    # MinHash md5 twin: capped → only the planted pair; uncapped → blowup.
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs_md5(
            df, "doc_id", "text", k=3, bands=8, threshold=0.5, max_bucket=10
        ).collect()
    }
    assert capped == {(101, 102)}, capped
    uncapped = minhash_lsh_pairs_md5(
        df, "doc_id", "text", k=3, bands=8, threshold=0.5
    ).count()
    assert uncapped >= 30 * 29 // 2 + 1

    # SimHash md5 twin: identical docs share the full fingerprint → one
    # oversized bucket per band; the cap silences it, keeps the near-dups.
    s_capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_pairs_md5(df, max_hamming=3, max_bucket=10).collect()
    }
    assert s_capped == {(101, 102)}, s_capped
    s_uncapped = simhash_pairs_md5(df, max_hamming=3).count()
    assert s_uncapped >= 30 * 29 // 2 + 1
