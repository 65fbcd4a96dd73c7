"""Deterministic sampling/splitting: partition-invariance, nesting, and the
exact plan shape that makes sample_exact_n scale (TakeOrderedAndProject)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
    hex_threshold,
    sample_exact_n,
    sample_fraction,
    split_assign,
)


def _ids(spark, n=5000):
    return spark.range(n).select(F.col("id").alias("k"))


def test_split_weights_approximate(spark):
    df = split_assign(_ids(spark), "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


def test_split_partition_invariant(spark):
    base = _ids(spark)
    a = split_assign(base, "k", {"a": 0.5, "b": 0.5}, salt="x").collect()
    b = split_assign(base.repartition(17), "k", {"a": 0.5, "b": 0.5}, salt="x").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_split_salt_changes_assignment(spark):
    base = _ids(spark, 1000)
    a = {r["k"]: r["split"] for r in split_assign(base, "k", {"a": 0.5, "b": 0.5}, salt="s1").collect()}
    b = {r["k"]: r["split"] for r in split_assign(base, "k", {"a": 0.5, "b": 0.5}, salt="s2").collect()}
    assert any(a[k] != b[k] for k in a)  # independent draw


def test_sample_fraction_nested(spark):
    """Threshold hashing ⇒ smaller fractions are strict subsets of larger."""
    base = _ids(spark)
    small = {r["k"] for r in sample_fraction(base, "k", 0.2).collect()}
    big = {r["k"] for r in sample_fraction(base, "k", 0.5).collect()}
    assert small <= big
    assert abs(len(big) / 5000 - 0.5) < 0.03


def test_sample_exact_n_deterministic(spark):
    base = _ids(spark)
    a = sorted(r["k"] for r in sample_exact_n(base, "k", 100).collect())
    b = sorted(r["k"] for r in sample_exact_n(base.repartition(13), "k", 100).collect())
    assert len(a) == 100 and a == b


def test_sample_exact_n_plan_is_topn(spark):
    plan = sample_exact_n(_ids(spark), "k", 50)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # heap top-n, not global sort


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(0.5) == "80000000"
    # fraction 1.0 must sort after EVERY possible hash value
    assert "ffffffff" < hex_threshold(1.0)


def test_sample_fraction_one_keeps_all(spark):
    assert sample_fraction(_ids(spark, 500), "k", 1.0).count() == 500


def test_stratified_sample_per_stratum_rates_and_determinism(spark, sf_dir):
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import sample_stratified

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    out = sample_stratified(docs, "doc_id", "lang", {"en": 0.5, "zh": 1.0}, default_fraction=0.0)
    got = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("zh", 0) == base["zh"]  # fraction 1.0 keeps everything
    assert set(got) <= {"en", "zh"}  # default 0.0 drops every other stratum
    assert 0 < got["en"] < base["en"]  # strictly downsampled
    # partition-invariant and re-runnable
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_stratified(
            docs.repartition(13), "doc_id", "lang", {"en": 0.5, "zh": 1.0}, default_fraction=0.0
        ).collect()
    )
    assert a == b
    # stratum membership never changes the draw: an 'en' doc kept at 0.5
    # is exactly the en-subset of the keys kept by a plain 0.5 sample
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import sample_fraction

    plain = {r["doc_id"] for r in sample_fraction(docs, "doc_id", 0.5).collect()}
    en_kept = {r["doc_id"] for r in out.filter(F.col("lang") == "en").collect()}
    en_all = {r["doc_id"] for r in docs.filter(F.col("lang") == "en").collect()}
    assert en_kept == plain & en_all


def test_upsample_and_mix_corpus(spark, sf_dir):
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import mix_corpus, upsample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    n = docs.count()

    # integer weight: exact row multiplication with epoch indices 0..w-1
    up2 = upsample(docs, "doc_id", 2.0)
    assert up2.count() == 2 * n
    assert {r["epoch"] for r in up2.select("epoch").distinct().collect()} == {0, 1}

    # fractional weight ~2.5: between 2n and 3n, deterministic under repartition
    up25 = upsample(docs, "doc_id", 2.5)
    c = up25.count()
    assert 2 * n < c < 3 * n
    assert upsample(docs.repartition(9), "doc_id", 2.5).count() == c
    # third copies are exactly the 0.5 Bernoulli keep-set
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import sample_fraction

    third = {r["doc_id"] for r in up25.filter(F.col("epoch") == 2).collect()}
    assert third == {r["doc_id"] for r in sample_fraction(docs, "doc_id", 0.5).collect()}

    # sub-1 weight behaves as Bernoulli downsample with epoch 0
    down = upsample(docs, "doc_id", 0.5)
    assert {r["doc_id"] for r in down.collect()} == third
    assert down.filter(F.col("epoch") != 0).count() == 0

    # mix_corpus: per-stratum weights equal stratum-wise upsample
    mixed = mix_corpus(docs, "doc_id", "lang", {"zh": 2.0, "en": 0.5}, default_weight=1.0)
    per_lang = {r["lang"]: r["n"] for r in mixed.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_lang["zh"] == 2 * base["zh"]
    assert 0 < per_lang["en"] < base["en"]
    for lang in base:
        if lang not in ("zh", "en"):
            assert per_lang[lang] == base[lang]


def test_sample_exact_n_per_group(spark, sf_dir):
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
        sample_exact_n_per_group,
    )
    from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "lang")
    out = sample_exact_n_per_group(docs, "doc_id", "lang", 10)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, c in counts.items():
        assert c == min(10, base[lang])
    # deterministic under repartitioning
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_exact_n_per_group(docs.repartition(7), "doc_id", "lang", 10).collect()
    )
    assert a == b
    # plan: n-bounded partial before the exchange (WindowGroupLimit rewrite)
    plan = physical_plan(sample_exact_n_per_group(docs, "doc_id", "lang", 10))
    assert "row_number(), 10, Partial" in plan, plan


def test_exact_n_preserves_caller_underscore_columns(spark):
    """Caller columns named _h/_rn must survive the samplers untouched —
    the temp columns use the collision-proof __sample_ prefix (ADVICE r3)."""
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
        sample_exact_n,
        sample_exact_n_per_group,
    )

    df = spark.range(100).selectExpr(
        "id", "id % 3 AS g", "cast(id * 7 as string) AS _h", "id * 11 AS _rn"
    )
    out = sample_exact_n(df, "id", 10)
    assert set(out.columns) == {"id", "g", "_h", "_rn"}
    rows = {r["id"]: r for r in out.collect()}
    assert all(r["_h"] == str(i * 7) and r["_rn"] == i * 11 for i, r in rows.items())

    out_g = sample_exact_n_per_group(df, "id", "g", 5)
    assert set(out_g.columns) == {"id", "g", "_h", "_rn"}
    rows_g = {r["id"]: r for r in out_g.collect()}
    assert all(r["_h"] == str(i * 7) and r["_rn"] == i * 11 for i, r in rows_g.items())


class TestSampleWeighted:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, float(i % 11) / 10.0) for i in range(2000)], "id long, w double"
        )

    def test_rate_tracks_weight_and_edges_hold(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
            sample_weighted,
        )

        df = self._docs(spark)
        kept = sample_weighted(df, "id", "w", salt="t").groupBy("w").count().collect()
        rate = {r["w"]: r["count"] for r in kept}
        # w=0 never kept; w=1.0 always kept (2000/11 ≈ 181 rows each)
        assert 0.0 not in rate
        assert rate[1.0] == df.filter("w = 1.0").count()
        # mid weights within a loose binomial envelope
        for w in (0.3, 0.7):
            n = df.filter(f"w = {w}").count()
            assert abs(rate.get(w, 0) - w * n) < 4 * (n * w * (1 - w)) ** 0.5 + 1

    def test_null_and_out_of_range_weights(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
            sample_weighted,
        )

        df = spark.createDataFrame(
            [(1, None), (2, -0.5), (3, 2.0)], "id long, w double"
        )
        out = sorted(r["id"] for r in sample_weighted(df, "id", "w").collect())
        assert out == [3]  # NULL and negative drop; >=1 always keeps

    def test_partition_invariance(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
            sample_weighted,
        )

        df = self._docs(spark)
        a = sorted(r["id"] for r in sample_weighted(df.coalesce(1), "id", "w", "s").collect())
        b = sorted(
            r["id"] for r in sample_weighted(df.repartition(16), "id", "w", "s").collect()
        )
        assert a == b and len(a) > 0


class TestLeakageSafeSplit:
    def test_groups_share_split_and_singletons_hash_own_id(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
            leakage_safe_split,
            split_assign,
        )

        df = spark.createDataFrame([(i,) for i in range(200)], "id long")
        # components: {0,1,2} (chain) and {10,11}
        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
        )
        out = {
            r["id"]: r["split"]
            for r in leakage_safe_split(
                df, "id", pairs, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s"
            ).collect()
        }
        assert out[0] == out[1] == out[2]
        assert out[10] == out[11]
        assert len(out) == 200
        # singletons match plain split_assign on their own id
        plain = {
            r["id"]: r["split"]
            for r in split_assign(
                df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="s"
            ).collect()
        }
        for i in range(20, 200):
            assert out[i] == plain[i]

    def test_partition_invariance(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
            leakage_safe_split,
        )

        df = spark.createDataFrame([(i,) for i in range(100)], "id long")
        pairs = spark.createDataFrame([(i, i + 1) for i in range(0, 40, 2)],
                                      "id_a long, id_b long")
        w = {"train": 0.8, "val": 0.2}
        a = sorted(map(tuple, leakage_safe_split(df.coalesce(1), "id", pairs, w).collect()))
        b = sorted(map(tuple, leakage_safe_split(df.repartition(8), "id", pairs, w).collect()))
        assert a == b

    def test_all_duplicates_corpus_shuffle_fallback(self, spark):
        """VERDICT r5 #4: a pathological corpus where EVERY row is in some
        near-dup component (label frame ~ corpus-sized) must produce the
        identical assignment on the broadcast path and the shuffle-join
        fallback — and the fallback plan must not broadcast the labels."""
        from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
            leakage_safe_split,
        )
        from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan

        df = spark.createDataFrame([(i,) for i in range(200)], "id long")
        # chain every pair (2i, 2i+1): all 200 ids are component members
        pairs = spark.createDataFrame(
            [(2 * i, 2 * i + 1) for i in range(100)], "id_a long, id_b long"
        )
        w = {"train": 0.7, "val": 0.3}
        via_broadcast = leakage_safe_split(df, "id", pairs, w, salt="x")
        via_shuffle = leakage_safe_split(
            df, "id", pairs, w, salt="x", broadcast_max_labels=0
        )
        # the fallback must not carry the forced broadcast hint (AQE may
        # still CHOOSE broadcast for a small side — that's fine; the point
        # is the plan is no longer pinned to driver-collecting the labels)
        assert "broadcast" not in via_shuffle._jdf.queryExecution().logical().toString().lower()
        a = sorted(map(tuple, via_broadcast.collect()))
        b = sorted(map(tuple, via_shuffle.collect()))
        assert a == b and len(a) == 200
        # pair members always land in the same split
        got = {r[0]: r[1] for r in b}
        for i in range(100):
            assert got[2 * i] == got[2 * i + 1]

    def test_weighted_exact_n_inclusion_tracks_weights(self, spark):
        """A-ES contract: exactly n rows; same salt reproduces the same
        sample on any partitioning; across many salts, items with weight 9
        are selected ~9x as often as weight 1 (loose tolerance); zero/NULL
        weights never win."""
        from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
            sample_weighted_exact_n,
        )

        rows = [(i, 9.0 if i < 100 else 1.0) for i in range(200)]
        rows += [(900, 0.0), (901, None)]
        df = spark.createDataFrame(rows, "id long, w double")
        first = sorted(
            r["id"] for r in sample_weighted_exact_n(df, "id", "w", 20, salt="s0").collect()
        )
        assert len(first) == 20 and all(i < 900 for i in first)
        again = sorted(
            r["id"]
            for r in sample_weighted_exact_n(df.repartition(8), "id", "w", 20, salt="s0").collect()
        )
        assert again == first
        heavy = light = 0
        for t in range(60):
            for r in sample_weighted_exact_n(df, "id", "w", 20, salt=f"t{t}").collect():
                if r["id"] < 100:
                    heavy += 1
                else:
                    light += 1
        # expected heavy share = 9/(9+1) weighted mass -> ratio ~9; demand > 4
        assert heavy / max(light, 1) > 4, (heavy, light)

    def test_weighted_exact_n_plans_take_ordered(self, spark, sf_dir):
        from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
            sample_weighted_exact_n,
        )
        from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = physical_plan(
            sample_weighted_exact_n(docs, "doc_id", F.col("n_chars").cast("double"), 50),
            "simple",
        )
        assert "TakeOrderedAndProject" in plan, plan


def test_weighted_exact_n_by_group(spark):
    """Stratified A-ES: exactly n per group, deterministic per salt,
    partition-invariant, inclusion frequency tracks weights within the
    group, and the plan keeps the WindowGroupLimit Partial map-side cut."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
        sample_weighted_exact_n_by_group,
    )

    rows = [
        (g * 100 + i, chr(ord("a") + g), 10.0 if i < 5 else 1.0)
        for g in range(3)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w double")
    out = sample_weighted_exact_n_by_group(df, "doc_id", "grp", "w", 8, salt="s1")
    got = out.groupBy("grp").count().collect()
    assert {r["grp"]: r["count"] for r in got} == {"a": 8, "b": 8, "c": 8}
    # determinism + partition invariance
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_weighted_exact_n_by_group(
            df.repartition(7), "doc_id", "grp", "w", 8, salt="s1"
        ).collect()
    )
    assert a == b
    # heavy rows (w=10, 5 per group of 40) dominate inclusion across salts
    heavy = total = 0
    for s in range(20):
        sel = sample_weighted_exact_n_by_group(
            df, "doc_id", "grp", "w", 8, salt=f"m{s}"
        ).collect()
        heavy += sum(1 for r in sel if r["w"] == 10.0)
        total += len(sel)
    assert heavy / total > 0.4  # 5/40 rows hold >40% of picks
    # plan: rank-only window keeps the Partial map-side cut
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_mixture_sample_temperature_rebalance(spark, sf_dir):
    """sample_mixture_by_group (alpha=1/2 temperature mix): per-group
    keep-rates are proportional to sqrt(n_g)/n_g — so the LOWEST-count
    group gets the HIGHEST keep rate (the multilingual upsampling
    contract) — the realized total tracks the target in expectation,
    membership is rerun-stable, and NULL groups are dropped."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
        sample_mixture_by_group,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    target = 200.0
    out = sample_mixture_by_group(docs, "lang", "doc_id", target, salt="t-mix")
    got = out.groupBy("lang").agg(F.count(F.lit(1)).alias("kept"))
    kept = {r["lang"]: r["kept"] for r in got.collect()}
    n = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    import math

    W = sum(math.sqrt(v) for v in n.values())
    for lang, n_g in n.items():
        expect = min(1.0, math.sqrt(n_g) * target / W / n_g) * n_g
        # Bernoulli tolerance: 5 sigma-ish on small fixtures
        tol = max(6.0, 5 * math.sqrt(expect))
        assert abs(kept.get(lang, 0) - expect) <= tol, (lang, kept, expect)
    # the smallest group keeps at the highest RATE (upsampling contract)
    rates = {g: kept.get(g, 0) / n[g] for g in n}
    assert rates[min(n, key=n.get)] >= rates[max(n, key=n.get)] - 1e-9
    # rerun-stable membership
    again = sample_mixture_by_group(docs, "lang", "doc_id", target, salt="t-mix")
    a = {r["doc_id"] for r in out.select("doc_id").collect()}
    b = {r["doc_id"] for r in again.select("doc_id").collect()}
    assert a == b
    # NULL groups dropped
    with_null = docs.unionByName(
        spark.createDataFrame([(10**9, None)], "doc_id bigint, lang string")
    )
    out2 = sample_mixture_by_group(with_null, "lang", "doc_id", target, salt="t-mix")
    assert out2.filter(F.col("doc_id") == 10**9).count() == 0
