"""Similarity-search operator tests: float-vs-quantized agreement, IVF recall
vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
    ivf_assign,
    ivf_knn,
    knn_bruteforce,
    knn_quantized,
)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_quantized_matches_float_topk(spark, sf_dir):
    """1e-6 quantization must not change the top-5 neighbor sets."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    f_rows = knn_bruteforce(emb, q, k=5).collect()
    z_rows = knn_quantized(emb, q, k=5).collect()
    f_sets = {}
    for r in f_rows:
        f_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    z_sets = {}
    for r in z_rows:
        z_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert f_sets == z_sets
    # cosine values agree to quantization error
    f_map = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in f_rows}
    for r in z_rows:
        assert abs(f_map[(r["query_id"], r["neighbor_id"])] - r["cosine"]) < 1e-4


def test_blas_knn_bit_identical_to_catalyst(spark, sf_dir):
    """The mapInArrow BLAS scorer must reproduce the pure-Catalyst quantized
    kNN BIT-FOR-BIT (ids and cosine doubles): exact int64 dots, half-away
    rounding, (cosine desc, id asc) tie order. This is what licenses the
    registered oracle query to use the fast path."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import knn_quantized_blas

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 7)
    a = sorted(map(tuple, knn_quantized(emb, q, k=4).collect()))
    b = sorted(map(tuple, knn_quantized_blas(emb, q, k=4).collect()))
    assert a == b  # tuple equality on floats = bitwise-equal cosines


def test_blas_rounding_matches_spark_on_half_boundary(spark):
    """0.0078125 (= 2^-7, exact in float32) × 1e6 = 7812.5 exactly: numpy's
    default rint rounds half-even (7812) while Spark/DuckDB round half-away
    (7813). The BLAS scorer must use half-away — this input diverges if it
    ever regresses to rint."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import knn_quantized_blas

    rows = [
        (0, [0.0078125, 1.0, 0.0]),
        (1, [0.0078125, 0.9, 0.1]),
        (2, [-0.0078125, 0.8, 0.2]),  # negative half-boundary too
        (3, [0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    a = sorted(map(tuple, knn_quantized(df, q, k=3).collect()))
    b = sorted(map(tuple, knn_quantized_blas(df, q, k=3).collect()))
    assert a == b


def test_knn_excludes_self_and_respects_k(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    rows = knn_bruteforce(emb, q, k=3).collect()
    per_q = {}
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]
        per_q.setdefault(r["query_id"], []).append(r["cosine"])
    for qid, cosines in per_q.items():
        assert len(cosines) == 3
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with generous probing should recover most true neighbors."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    truth = knn_bruteforce(emb, q, k=5).collect()
    assignments, centroids = ivf_assign(emb, n_cells=8)
    approx = ivf_knn(assignments, centroids, q, k=5, n_probe=4).collect()
    t_sets, a_sets = {}, {}
    for r in truth:
        t_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        a_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(t_sets[qid] & a_sets.get(qid, set())) / len(t_sets[qid]) for qid in t_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # random embeddings: cells are
    # weakly informative; the contract is plumbing + monotone recall, and
    # recall must reach 1.0 when probing every cell:
    full = ivf_knn(assignments, centroids, q, k=5, n_probe=8).collect()
    f_sets = {}
    for r in full:
        f_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert f_sets == t_sets


def test_ivf_lloyd_refinement_improves_recall(spark):
    """On planted clusters, one-shot hash-sampled centroids double-cover
    some clusters and miss others (recall@10 < 1 at n_probe=1); a couple of
    Lloyd steps (n_iters) recover the true centers and recall reaches 1.0.
    Everything is deterministic — hash-ordered sample, arithmetic noise —
    so the thresholds are exact, not statistical."""
    dim, n_clusters, n_pts = 16, 6, 300
    rows = []
    for i in range(n_pts):
        c = i % n_clusters
        vec = [10.0 if d == c else 0.0 for d in range(dim)]
        for d in range(dim):
            vec[d] += ((i * 31 + d * 17) % 7 - 3) / 2.0
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 12)
    truth = {}
    for r in knn_bruteforce(emb, q, k=10).collect():
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(n_iters):
        assignments, centroids = ivf_assign(emb, n_cells=n_clusters, n_iters=n_iters)
        got = {}
        for r in ivf_knn(assignments, centroids, q, k=10, n_probe=1).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(truth[k] & got.get(k, set())) / len(truth[k]) for k in truth
        ) / len(truth)

    raw, refined = recall(0), recall(2)
    assert raw <= 0.95  # sampled-only centroids misroute some queries
    assert refined >= 0.99  # Lloyd recovers the planted centers
    assert refined > raw


def test_ivf_persisted_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The 100 TB ANN deployment shape the operator docstring promises:
    persist assignments hive-partitioned by cell, and a probe restricted to
    its n_probe cells must scan ONLY those partition directories
    (PartitionFilters on cell, pruned input files)."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import ivf_assign
    from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan
    from lakehouse_architecture_for_realestatedata_spark.plans.layout import write_partitioned

    emb = _emb(spark, sf_dir)
    assignments, centroids = ivf_assign(emb, "vec_id", "embedding", n_cells=8)
    path = str(tmp_path / "ivf_index")
    write_partitioned(assignments, path, ["cell"])

    index = spark.read.parquet(path)
    probe_cells = [r["cell"] for r in centroids.limit(2).collect()]
    probed = index.filter(F.col("cell").isin(probe_cells))
    plan = physical_plan(probed)
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:200], plan
    # the scan must touch only the probed cells' rows
    full = index.count()
    part = probed.count()
    per_cell = {r["cell"]: r["n"] for r in index.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert part == sum(per_cell[c] for c in probe_cells) and part < full


def test_blas_tie_straddling_k_keeps_smallest_ids(spark):
    """Duplicate vectors tie at cosine 1.0; when the tie straddles k the
    smallest neighbor ids must win (the total order), regardless of batch
    layout. Regression: argpartition alone cut tied candidates arbitrarily
    BEFORE the id-asc sort."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import knn_quantized_blas

    base = [0.3, 0.4, 0.5]
    rows = [(0, base)] + [(i, base) for i in range(10, 18)]  # 8 tied dups
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # descending id order in one partition — the layout that broke argpartition
    df = df.orderBy(F.col("vec_id").desc()).coalesce(1)
    q = df.filter(F.col("vec_id") == 0)
    a = sorted(map(tuple, knn_quantized(df, q, k=3).collect()))
    b = sorted(map(tuple, knn_quantized_blas(df, q, k=3).collect()))
    assert a == b
    assert [n for _, n, _ in b] == [10, 11, 12]


def test_blas_empty_query_set(spark, sf_dir):
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import knn_quantized_blas

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 0)
    assert knn_quantized_blas(emb, q, k=3).count() == 0


def test_blas_knn_rejects_ragged_vectors(spark, sf_dir):
    """Compensating ragged lengths (63+65 elements flatten-reshaping into
    2×64) must raise, not emit silently misaligned cosines (ADVICE r3)."""
    import pytest as _pytest

    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import knn_quantized_blas

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    queries = emb.filter(F.col("vec_id") < 3)
    # one short and one long row in the same partition: total length divides
    # evenly, so only the per-row guard can catch it
    bad = spark.createDataFrame(
        [
            (900001, [0.1] * (dim - 1)),
            (900002, [0.2] * (dim + 1)),
        ],
        f"vec_id long, embedding array<double>",
    ).coalesce(1)
    corpus = emb.select("vec_id", F.col("embedding").cast("array<double>")).unionByName(bad)
    with _pytest.raises(Exception, match="not uniform"):
        knn_quantized_blas(corpus, queries, "vec_id", "embedding", k=3).collect()


def test_label_centroids_exact_means_and_order(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        label_centroids,
    )

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0]),
            (0, [3.0, 4.0, 5.0]),
            (1, [10.0, 0.0, -2.0]),
        ],
        "label int, embedding array<float>",
    )
    out = {r["label"]: (r["n"], r["centroid"]) for r in
           label_centroids(df, "label", "embedding").collect()}
    # integer-valued floats quantize exactly -> exact means, position order kept
    assert out[0] == (2, [2.0, 3.0, 4.0])
    assert out[1] == (1, [10.0, 0.0, -2.0])
    # partition invariance (quantized-exact int sums)
    a = sorted(map(tuple, label_centroids(df.coalesce(1), "label", "embedding").collect()))
    b = sorted(map(tuple, label_centroids(df.repartition(7), "label", "embedding").collect()))
    assert a == b


def test_pca_fit_properties_and_partition_invariance(spark, sf_dir):
    """PCA: orthonormal components, descending eigenvalues matching a
    driver-side numpy reference on the same quantized data, and BIT-stable
    projections across partitionings (the decimal co-moment sum contract)."""
    import numpy as np

    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    comps, vals, mean = pca_fit(emb, "embedding", k=4)
    C = np.array(comps)
    assert np.abs(C @ C.T - np.eye(4)).max() < 1e-12
    assert vals == sorted(vals, reverse=True) and vals[-1] > 0
    X = np.array([r["embedding"] for r in emb.select("embedding").collect()], dtype=np.float64)
    Xq = np.where(X >= 0, np.floor(X * (1 << 24) + 0.5), -np.floor(-X * (1 << 24) + 0.5)) / (1 << 24)
    ref = np.sort(np.linalg.eigvalsh(np.cov(Xq.T, bias=True)))[::-1][:4]
    assert np.abs(np.array(vals) - ref).max() < 1e-9
    assert np.abs(np.array(mean) - Xq.mean(axis=0)).max() < 1e-9
    p1 = sorted(map(tuple, pca_project(emb.coalesce(1), k=3).collect()))
    p2 = sorted(map(tuple, pca_project(emb.repartition(8), k=3).collect()))
    assert p1 == p2 and len(p1[0][1]) == 3
    # projecting with a precomputed fit (train/serve split) matches
    p3 = sorted(map(tuple, pca_project(emb, k=3, fitted=(comps[:3], vals[:3], mean)).collect()))
    assert p3 == p1


def test_pca_projection_captures_variance(spark, sf_dir):
    """The empirical variance of each projected coordinate equals its
    eigenvalue (that IS what PCA maximizes), and k=dim preserves pairwise
    squared distances (rotation)."""
    import numpy as np

    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        pca_fit,
        pca_project,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200)
    comps, vals, mean = pca_fit(emb, "embedding", k=2)
    P = np.array([r["pca"] for r in pca_project(emb, k=2, fitted=(comps, vals, mean)).collect()])
    emp = P.var(axis=0)
    assert np.abs(emp - np.array(vals)).max() < 1e-6
    assert emp[0] >= emp[1]


def test_knn_pca_prefilter_recall(spark, sf_dir):
    """Coarse-to-fine ANN contract: with k_dims = dim the coarse L2 order
    over normalized vectors equals the cosine order (recall 1.0 exactly);
    with an m covering the whole corpus recall is 1.0 regardless of dims;
    with a lossy 8-dim prefilter recall must still clearly beat the
    m/N random-candidate baseline."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        knn_pca_prefilter,
        knn_quantized,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_corpus = emb.count()
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r[0], r[1]) for r in knn_quantized(emb, q, k=10).collect()}

    full = {(r[0], r[1]) for r in knn_pca_prefilter(emb, q, k=10, k_dims=64).collect()}
    assert full == exact

    everything = {
        (r[0], r[1])
        for r in knn_pca_prefilter(
            emb, q, k=10, k_dims=4, m_mult=(n_corpus // 10) + 1
        ).collect()
    }
    assert everything == exact

    pre = {(r[0], r[1]) for r in knn_pca_prefilter(emb, q, k=10, k_dims=8).collect()}
    recall = len(exact & pre) / len(exact)
    random_baseline = (10 * 4) / n_corpus
    assert recall >= max(0.2, 2.5 * random_baseline), (recall, random_baseline)


def test_pca_moment_paths_bit_identical(spark, sf_dir):
    """The Arrow Gram-matmul fast path and the Catalyst pair-explosion
    fallback must produce the SAME integers — both reduce exact quantized
    products, so this is equality, not tolerance."""
    import numpy as np

    import lakehouse_architecture_for_realestatedata_spark.operators.similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n1, s1, m1 = S._pca_moments_arrow(emb, "embedding", 64, 24)
    n2, s2, m2 = S._pca_moments_catalyst(emb, "embedding", 64, 24)
    assert n1 == n2 and np.array_equal(s1, s2) and np.array_equal(m1, m2)
    n3, s3, m3 = S._pca_moments_arrow(emb.repartition(16), "embedding", 64, 24)
    assert n1 == n3 and np.array_equal(m1, m3)


def test_pca_fit_unnormalized_vectors_and_overflow_guard(spark):
    """ADVICE r6: the Arrow Gram path must stay exact for |v| > 1 (chunk is
    derived from the observed max |q|, not a |v|<=1 assumption) and must
    raise — not silently wrap — once a single product can't fit int64."""
    import numpy as np

    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        _pca_moments_arrow,
        _pca_moments_catalyst,
        pca_fit,
    )

    rng = np.random.default_rng(7)
    big = (rng.standard_normal((200, 4)) * 40.0).tolist()  # |v| up to ~120
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(big)],
        "vec_id int, embedding array<double>",
    )
    n_a, s1_a, m2_a = _pca_moments_arrow(df, "embedding", 4, qbits=16)
    n_c, s1_c, m2_c = _pca_moments_catalyst(df, "embedding", 4, qbits=16)
    assert n_a == n_c == 200
    assert np.array_equal(s1_a, s1_c)
    assert np.array_equal(m2_a, m2_c), "Arrow Gram wrapped on |v|>1 input"
    comps, vals, _mean = pca_fit(df, "embedding", k=2, qbits=16)
    assert all(v >= 0 for v in vals)

    too_big = df.selectExpr(
        "vec_id", "transform(embedding, x -> x * 1e6) as embedding"
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="2\\^31|overflow|Gram"):
        pca_fit(too_big, "embedding", k=2, qbits=24)


class TestProductQuantization:
    """PQ/ADC kNN (operators/similarity.py pq_fit/pq_encode/knn_pq_adc):
    numpy parity of codes + scores, planted-cluster recall through the
    rerank ladder, dense-codebook invariant, and validation."""

    def _fixture(self, spark):
        import numpy as np

        rng = np.random.default_rng(3)
        centers = rng.standard_normal((10, 64)) * 3.0
        rows = []
        for i in range(200):
            c = i % 10
            v = centers[c] + rng.standard_normal(64) * 0.05
            rows.append((i, [float(x) for x in v], c))
        return (
            spark.createDataFrame(
                rows, "vec_id long, embedding array<double>, label int"
            ),
            10,
        )

    def test_codes_and_scores_match_numpy(self, spark):
        import numpy as np

        from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
            knn_pq_adc,
            pq_encode,
            pq_fit,
        )

        emb, _ = self._fixture(spark)
        cb = pq_fit(emb, m=8, n_codes=8, n_iters=2)
        assert len(cb) == 8 and all(len(s) == 8 for s in cb)  # dense
        CB = np.array(cb)
        enc = {
            r["vec_id"]: (list(r["codes"]), r["approx_norm2"])
            for r in pq_encode(emb, cb).collect()
        }
        vecs = {
            r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()
        }
        for vid in list(enc)[:20]:
            codes, n2 = enc[vid]
            x = vecs[vid]
            for s in range(8):
                d = ((x[s * 8 : (s + 1) * 8] - CB[s]) ** 2).sum(axis=1)
                assert codes[s] == int(np.argmin(d)), (vid, s)
            recon = np.concatenate([CB[s][c] for s, c in enumerate(codes)])
            assert abs(n2 - float((recon**2).sum())) < 1e-9
        from pyspark.sql import functions as F

        q = emb.filter(F.col("vec_id") == 0)
        adc = {
            r["neighbor_id"]: r["cosine"]
            for r in knn_pq_adc(
                pq_encode(emb, cb), q, cb, k=30, rerank_mult=0
            ).collect()
        }
        qv = vecs[0]
        for nid, score in adc.items():
            recon = np.concatenate([CB[s][c] for s, c in enumerate(enc[nid][0])])
            ref = float(
                qv @ recon / (np.linalg.norm(qv) * np.linalg.norm(recon))
            )
            assert abs(score - ref) < 1e-8

    def test_planted_cluster_recall(self, spark):
        from pyspark.sql import functions as F

        from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
            knn_pq_adc,
            knn_quantized,
            pq_encode,
            pq_fit,
        )

        emb, n_clusters = self._fixture(spark)
        cb = pq_fit(emb, m=8, n_codes=16, n_iters=3)
        enc = pq_encode(emb, cb)
        queries = emb.filter(F.col("vec_id") < 5)
        got = knn_pq_adc(enc, queries, cb, k=10, rerank_mult=4, corpus=emb)
        exact = knn_quantized(emb, queries, k=10)
        g = {(r["query_id"], r["neighbor_id"]) for r in got.collect()}
        e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        recall = len(g & e) / len(e)
        assert recall >= 0.9, f"planted-cluster recall {recall}"
        # neighbors are overwhelmingly same-cluster (the planted structure)
        labels = {r["vec_id"]: r["label"] for r in emb.collect()}
        same = sum(1 for q_, n_ in g if labels[q_] == labels[n_])
        assert same / len(g) >= 0.9

    def test_validation(self, spark):
        import pytest as _pytest

        from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
            knn_pq_adc,
            pq_fit,
        )

        emb, _ = self._fixture(spark)
        with _pytest.raises(ValueError, match="divisible"):
            pq_fit(emb, m=7)
        with _pytest.raises(ValueError, match="rerank"):
            knn_pq_adc(emb.limit(1), emb.limit(1), [[[0.0]]], rerank_mult=2)


def _mmr_python(cands, k, lam):
    """Independent greedy MMR: cands = [(qid, nid, rel, vec)], id-sorted
    candidates, first-argmax tie-break — must match mmr_select exactly."""
    import numpy as np

    out = []
    by_q = {}
    for q, n, r, v in cands:
        by_q.setdefault(q, []).append((n, r, np.asarray(v, dtype=np.float64)))
    for q, rows in by_q.items():
        rows.sort(key=lambda t: t[0])
        vecs = np.stack([v for _, _, v in rows])
        norms = np.linalg.norm(vecs, axis=1)
        norms[norms == 0.0] = 1.0
        unit = vecs / norms[:, None]
        sims = unit @ unit.T
        rel = np.array([r for _, r, _ in rows])
        max_sim = np.zeros(len(rows))
        picked = np.zeros(len(rows), dtype=bool)
        for rank in range(1, min(k, len(rows)) + 1):
            score = lam * rel - (1.0 - lam) * max_sim
            score[picked] = -np.inf
            i = int(np.argmax(score))
            picked[i] = True
            out.append((q, rows[i][0], float(rel[i]), float(score[i]), rank))
            max_sim = np.maximum(max_sim, sims[i])
    return sorted(out)


def test_mmr_matches_python_reference_any_partitioning(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import mmr_select

    import random

    rng = random.Random(7)
    cands = [
        (q, n, round(rng.random(), 6), [rng.uniform(-1, 1) for _ in range(8)])
        for q in (1, 2, 3)
        for n in range(20)
    ]
    df = spark.createDataFrame(
        cands, "query_id long, neighbor_id long, cosine double, embedding array<double>"
    )
    want = _mmr_python(cands, k=6, lam=0.7)
    for src in (df.coalesce(1), df.repartition(9)):
        got = sorted(map(tuple, mmr_select(src, k=6, lam=0.7).collect()))
        assert got == want


def test_mmr_skips_near_duplicates_for_diversity(spark):
    """Three near-identical top candidates: plain top-3 keeps all three
    clones; MMR keeps the best clone then jumps to the orthogonal docs."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import mmr_select

    rows = [
        (1, 10, 0.99, [1.0, 0.0, 0.0]),
        (1, 11, 0.98, [1.0, 0.001, 0.0]),   # clone of 10
        (1, 12, 0.97, [1.0, 0.0, 0.001]),   # clone of 10
        (1, 20, 0.80, [0.0, 1.0, 0.0]),
        (1, 30, 0.70, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, cosine double, embedding array<double>"
    )
    picked = [
        r.neighbor_id
        for r in sorted(mmr_select(df, k=3, lam=0.5).collect(), key=lambda r: r.rank)
    ]
    assert picked == [10, 20, 30]


def test_ivf_upsert_appends_correct_cells_without_rebuild(spark, sf_dir, tmp_path):
    """Incremental IVF maintenance: upserted vectors land in the cell the
    FROZEN centroids assign (identical to what a build-time pass would
    pick), existing files are untouched, row count grows by the batch, the
    probe path finds a planted near-duplicate added by upsert, and the
    partition layout keeps pruning."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        assign_to_cells,
        ivf_assign,
        ivf_knn,
        ivf_load,
        ivf_persist,
        ivf_upsert,
    )
    from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan

    emb = _emb(spark, sf_dir)
    base = emb.filter(F.col("vec_id") < 400)
    batch = emb.filter(F.col("vec_id") >= 400)
    assignments, centroids = ivf_assign(base, "vec_id", "embedding", n_cells=8)
    path = str(tmp_path / "ivf")
    ivf_persist(assignments, centroids, path)
    n_before = spark.read.parquet(f"{path}/assignments").count()

    # plant a near-duplicate of an existing vector, shifted out of the id range
    probe_src = emb.filter(F.col("vec_id") == 3).collect()[0]
    planted = spark.createDataFrame(
        [(99999, probe_src["embedding"], probe_src["label"])],
        "vec_id long, embedding array<float>, label int",
    )
    ivf_upsert(batch.unionByName(planted), path)

    a2, c2 = ivf_load(spark, path)
    assert a2.count() == n_before + batch.count() + 1
    # upserted cells == what the frozen centroids assign
    cell_type = dict(a2.dtypes)["cell"]
    want = {
        r["vec_id"]: r["cell"]
        for r in assign_to_cells(
            batch, F.broadcast(centroids), "embedding", cell_type
        ).collect()
    }
    got = {
        r["vec_id"]: r["cell"]
        for r in a2.filter(F.col("vec_id") >= 400).collect()
        if r["vec_id"] != 99999
    }
    assert {k: str(v) for k, v in got.items()} == {
        k: str(v) for k, v in want.items()
    }
    # the probe path sees the new vector: querying with vec 3 finds 99999
    queries = emb.filter(F.col("vec_id") == 3)
    res = ivf_knn(a2, c2, queries, "vec_id", "embedding", k=3, n_probe=2)
    assert 99999 in {r["neighbor_id"] for r in res.collect()}
    # pruning survives the appended files
    probed = a2.filter(F.col("cell").isin([r["cell"] for r in c2.limit(2).collect()]))
    assert "PartitionFilters" in physical_plan(probed)


def test_mmr_string_ids_follow_input_schema(spark):
    """VERDICT r8 advice: mmr_select hardcoded bigint ids; the output
    schema must follow the INPUT id/query column types (string ids are the
    common case for document corpora)."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import mmr_select

    rows = [
        ("qA", "doc-1", 0.9, [1.0, 0.0]),
        ("qA", "doc-2", 0.8, [0.0, 1.0]),
        ("qA", "doc-3", 0.7, [1.0, 0.001]),
        ("qB", "doc-9", 0.5, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, neighbor_id string, cosine double, embedding array<double>"
    )
    got = mmr_select(df, k=2, lam=0.7)
    assert [f.dataType.simpleString() for f in got.schema.fields[:2]] == [
        "string", "string",
    ]
    out = {(r.query_id, r.rank): r.neighbor_id for r in got.collect()}
    assert out[("qA", 1)] == "doc-1"
    assert out[("qA", 2)] == "doc-2"  # diversity: the near-clone doc-3 skipped
    assert out[("qB", 1)] == "doc-9"


def test_ivf_sync_changes_matches_rebuild(spark, tmp_path):
    """VERDICT r11 #7: the CDC-maintained index equals a rebuild. A
    CDF-enabled Delta corpus takes a mixed day (MERGE updating existing
    vectors + inserting new ones, then a DELETE); ivf_sync_changes
    replays exactly those commits; the live assignment set must equal
    assigning the CURRENT table against the same frozen centroids —
    ids, vectors, and cells all identical. A second sync is a no-op."""
    import os as _os

    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        assign_to_cells,
        ivf_assign,
        ivf_live_assignments,
        ivf_persist,
        ivf_sync_changes,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_enable_cdf,
        delta_delete_where,
        delta_merge,
        delta_read,
        delta_write,
    )

    def vecs(ids, bump=0.0):
        return [
            (
                i,
                [
                    float(i % 7) + bump,
                    float(i % 5),
                    float(i % 3),
                    float(i % 11),
                ],
            )
            for i in ids
        ]

    schema = "vec_id bigint, embedding array<double>"
    tbl = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    delta_write(spark.createDataFrame(vecs(range(40)), schema), tbl)  # v0
    v_built = delta_enable_cdf(spark, tbl)  # v1 — index snapshot version
    assignments, centroids = ivf_assign(
        delta_read(spark, tbl), "vec_id", "embedding", n_cells=8
    )
    ivf_persist(assignments, centroids, idx)
    # the mixed day: update 5..9 (shifted vectors) + insert 40..44 ...
    delta_merge(
        spark.createDataFrame(
            vecs(range(5, 10), bump=2.5) + vecs(range(40, 45)), schema
        ),
        tbl,
        key="vec_id",
    )  # v2
    # ... then delete 10..14
    delta_delete_where(spark, tbl, ("vec_id", "between", (10, 14)))  # v3
    synced = ivf_sync_changes(
        spark, idx, tbl, initial_version=v_built
    )
    assert synced == 3
    live = {
        (r["vec_id"], str(r["cell"]), tuple(r["embedding"]))
        for r in ivf_live_assignments(spark, idx).collect()
    }
    cur = delta_read(spark, tbl)
    cell_type = dict(
        spark.read.parquet(f"{idx}/assignments").dtypes
    )["cell"]
    rebuilt = {
        (r["vec_id"], str(r["cell"]), tuple(r["embedding"]))
        for r in assign_to_cells(
            cur,
            F.broadcast(spark.read.parquet(f"{idx}/centroids")),
            "embedding",
            cell_type,
        ).collect()
    }
    assert live == rebuilt
    assert len(live) == 40  # 40 - 5 deleted + 5 inserted
    # idempotence: nothing new to sync
    assert ivf_sync_changes(spark, idx, tbl) == 3
    assert _os.path.isfile(_os.path.join(idx, "_ivf_sync.json"))
    # first sync without state requires the build version
    import pytest as _pytest

    _os.unlink(_os.path.join(idx, "_ivf_sync.json"))
    with _pytest.raises(ValueError, match="initial_version"):
        ivf_sync_changes(spark, idx, tbl)


def test_ivf_sync_crash_idempotent_and_upsert_gen_aware(spark, tmp_path):
    """Review r12: (a) a sync that crashed after its appends but before
    its state write must converge on retry — the generation is derived
    from the index DATA, so the retry re-tombstones at a higher gen and
    the live set equals the clean-run answer; (b) ivf_upsert on a
    gen-migrated index stamps the current generation, so its rows both
    survive existing tombstones and stay supersedable."""
    import json as _json
    import os as _os

    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        ivf_assign,
        ivf_live_assignments,
        ivf_persist,
        ivf_sync_changes,
        ivf_upsert,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_delete_where,
        delta_enable_cdf,
        delta_read,
        delta_write,
    )

    def vecs(ids):
        return [(i, [float(i % 7), float(i % 5)]) for i in ids]

    schema = "vec_id bigint, embedding array<double>"
    tbl = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    delta_write(spark.createDataFrame(vecs(range(20)), schema), tbl)
    v = delta_enable_cdf(spark, tbl)
    a, c = ivf_assign(delta_read(spark, tbl), "vec_id", "embedding", n_cells=4)
    ivf_persist(a, c, idx)
    delta_delete_where(spark, tbl, ("vec_id", "between", (5, 9)))
    ivf_sync_changes(spark, idx, tbl, initial_version=v)
    # simulate the crash: state file lost AFTER the appends landed
    _os.unlink(_os.path.join(idx, "_ivf_sync.json"))
    ivf_sync_changes(spark, idx, tbl, initial_version=v)  # the retry
    live = sorted(
        r["vec_id"] for r in ivf_live_assignments(spark, idx).collect()
    )
    assert live == [i for i in range(20) if not 5 <= i <= 9]
    with open(_os.path.join(idx, "_ivf_sync.json")) as fh:
        assert _json.load(fh)["gen"] == 2  # retry minted a HIGHER gen
    # (b) upsert on the migrated index: new keys carry the current gen
    ivf_upsert(
        spark.createDataFrame(vecs(range(100, 105)), schema), idx
    )
    live2 = sorted(
        r["vec_id"] for r in ivf_live_assignments(spark, idx).collect()
    )
    assert live2 == live + list(range(100, 105))
    a2 = spark.read.parquet(f"{idx}/assignments")
    gens = {
        r["gen"]
        for r in a2.filter(F.col("vec_id") >= 100).select("gen").collect()
    }
    assert gens == {2}  # stamped, not NULL — tombstones can supersede


def test_ivf_persist_born_stamped_and_legacy_migration(spark, tmp_path):
    """Review r13: ivf_persist stamps gen=0 at build time, so the FIRST
    sync never pays the O(index) migration rewrite; a LEGACY index
    (assignments without gen — pre-r12 build or foreign writer) still
    migrates once and syncs correctly."""
    import os as _os
    import shutil as _shutil

    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        ivf_assign,
        ivf_live_assignments,
        ivf_persist,
        ivf_sync_changes,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_delete_where,
        delta_enable_cdf,
        delta_read,
        delta_write,
    )

    def vecs(ids):
        return [(i, [float(i % 7), float(i % 5)]) for i in ids]

    schema = "vec_id bigint, embedding array<double>"
    tbl = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    delta_write(spark.createDataFrame(vecs(range(20)), schema), tbl)
    v = delta_enable_cdf(spark, tbl)
    a, c = ivf_assign(delta_read(spark, tbl), "vec_id", "embedding", n_cells=4)
    ivf_persist(a, c, idx)
    persisted = spark.read.parquet(f"{idx}/assignments")
    assert "gen" in persisted.columns  # born stamped
    assert {r["gen"] for r in persisted.select("gen").distinct().collect()} == {0}
    # legacy shape: rewrite the assignments WITHOUT gen, then sync — the
    # one-time migration must run and converge to the same live set
    legacy = str(tmp_path / "legacy_a")
    persisted.drop("gen").repartition("cell").write.partitionBy("cell").parquet(
        legacy
    )
    _shutil.rmtree(_os.path.join(idx, "assignments"))
    _os.rename(legacy, _os.path.join(idx, "assignments"))
    delta_delete_where(spark, tbl, ("vec_id", "between", (5, 9)))
    ivf_sync_changes(spark, idx, tbl, initial_version=v)
    live = sorted(
        r["vec_id"] for r in ivf_live_assignments(spark, idx).collect()
    )
    assert live == [i for i in range(20) if not 5 <= i <= 9]
    assert "gen" in spark.read.parquet(f"{idx}/assignments").columns


def test_ivf_sync_migration_crash_rolls_forward(spark, tmp_path):
    """ADVICE r12: a crash INSIDE the gen-migration's two-rename swap
    (assignments renamed aside, migrated copy not yet renamed in) used to
    leave no assignments dir at the expected path — the next sync failed
    at spark.read.parquet and the leftover premigration dir broke the
    retry's rename too. The entry recovery must roll the swap forward and
    collect the leftover, no manual repair."""
    import os as _os
    import shutil as _shutil

    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        ivf_assign,
        ivf_live_assignments,
        ivf_persist,
        ivf_sync_changes,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_delete_where,
        delta_enable_cdf,
        delta_read,
        delta_write,
    )

    def vecs(ids):
        return [(i, [float(i % 7), float(i % 5)]) for i in ids]

    schema = "vec_id bigint, embedding array<double>"
    tbl = str(tmp_path / "c")
    idx = str(tmp_path / "i")
    delta_write(spark.createDataFrame(vecs(range(20)), schema), tbl)
    v = delta_enable_cdf(spark, tbl)
    a, c = ivf_assign(delta_read(spark, tbl), "vec_id", "embedding", n_cells=4)
    ivf_persist(a, c, idx)
    a_path = _os.path.join(idx, "assignments")
    mig = _os.path.join(idx, "assignments_migrating")
    old = _os.path.join(idx, "assignments_premigration")
    # hand-build the mid-swap crash state: migrated copy fully written,
    # original renamed aside, swap-in rename never happened
    spark.read.parquet(a_path).withColumn("gen", F.lit(0)).repartition(
        "cell"
    ).write.partitionBy("cell").parquet(mig)
    _os.rename(a_path, old)
    assert not _os.path.isdir(a_path)
    delta_delete_where(spark, tbl, ("vec_id", "between", (5, 9)))
    ivf_sync_changes(spark, idx, tbl, initial_version=v)  # must not raise
    live = sorted(
        r["vec_id"] for r in ivf_live_assignments(spark, idx).collect()
    )
    assert live == [i for i in range(20) if not 5 <= i <= 9]
    assert _os.path.isdir(a_path)
    assert not _os.path.isdir(mig) and not _os.path.isdir(old)
    _shutil.rmtree(idx)


def test_semantic_dedup_frozen_drops_planted_twins_keeps_lowest_id(spark):
    """semantic_dedup_frozen (r14, SemDeDup shape): a planted near-identical
    twin in the same cell is dropped, the LOWEST id of a dup group is the
    keeper, near-but-below-threshold vectors survive, and cross-cell
    near-dups are (by design) not compared."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        semantic_dedup_frozen,
    )

    schema = "vec_id bigint, embedding array<double>"
    rows = [
        (0, [1.0, 0.0]),        # centroid of cell 0
        (1, [0.0, 1.0]),        # centroid of cell 1
        (10, [1.0, 0.001]),     # cell 0
        (11, [1.0, 0.0011]),    # near-dup of 10 (cos ≈ 1) → dropped
        (12, [0.9, 0.45]),      # cell 0, far from 10 → kept
        (20, [0.001, 1.0]),     # cell 1 — near-dup of 10 in VALUE? no:
                                # orthogonal; kept
    ]
    corpus = spark.createDataFrame(rows, schema)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cell bigint, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["cell"]
        for r in semantic_dedup_frozen(
            corpus, cents, "vec_id", "embedding", threshold=0.999
        ).collect()
    }
    # 11 dropped (10 is its lower-id twin); 0 dropped (10/0 cos≈1? no —
    # [1,0]·[1,0.001] cos ≈ 0.9999995 ≥ 0.999 → 10 dropped too, 0 keeps)
    assert 0 in got and got[0] == 0
    assert 1 in got and got[1] == 1
    assert 10 not in got  # 0 is its lower-id near-dup in cell 0
    assert 11 not in got
    assert 12 in got and got[12] == 0
    assert 20 not in got or got[20] == 1  # near-dup of centroid 1 → dropped


def test_ivf_knn_frozen_quantized_matches_bruteforce_within_probed_cells(spark):
    """ivf_knn_frozen_quantized: with n_probe == n_cells (probe everything)
    the result equals quantized brute force exactly — the approximation is
    ONLY the cell restriction, never the scoring."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        ivf_knn_frozen_quantized,
        knn_quantized,
    )

    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)
    ]
    schema = "vec_id bigint, embedding array<double>"
    corpus = spark.createDataFrame(rows, schema)
    cents = spark.createDataFrame(
        [(i, v) for i, v in rows[:4]], "cell bigint, embedding array<double>"
    )
    queries = corpus.filter("vec_id < 3")
    approx = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in ivf_knn_frozen_quantized(
            corpus, cents, queries, k=5, n_probe=4
        ).collect()
    }
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in knn_quantized(corpus, queries, k=5).collect()
    }
    assert approx == exact


def test_assign_cells_frozen_ties_lowest_cell_and_zero_norm(spark):
    """r15 (BLAS rewrite of assign_cells_frozen_quantized): an exact
    similarity tie assigns to the LOWEST cell id (the old
    max(struct(sim, -cell)) rule, now a first-max argmax over cells
    sorted ascending), and a zero-norm vector — cosine 0.0 to every
    centroid — lands in the lowest cell too."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        assign_cells_frozen_quantized,
    )

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),   # exactly equidistant from cells 3 and 7
            (2, [0.0, 0.0]),   # zero norm: sim 0.0 everywhere
            (3, [0.0, 1.0]),   # strictly nearest cell 9
        ],
        "vec_id bigint, embedding array<double>",
    )
    # cells deliberately registered out of order, with 3 and 7 identical
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0]), (9, [0.0, 1.0]), (3, [1.0, 0.0])],
        "cell bigint, embedding array<double>",
    )
    got = {
        r["vec_id"]: (r["cell"], r["__qn"])
        for r in assign_cells_frozen_quantized(corpus, cents).collect()
    }
    assert got[1][0] == 3  # tie between 3 and 7 -> lowest
    assert got[2] == (3, 0)  # zero norm -> 0.0 everywhere -> lowest cell
    assert got[3][0] == 9
