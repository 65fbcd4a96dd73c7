"""Heavy-hitter operators: exact threshold semantics and the Misra-Gries
bounded-state superset guarantee (operators/aggregates.py); keyword-extraction
edge cases (functions/text.py:top_keywords). Oracle parity for the registered
queries lives in tests/test_queries_contract.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.functions.text import top_keywords
from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
    heavy_hitters,
    heavy_hitters_approx,
)


def _skewed(spark, n=20_000):
    """Zipf-ish planted skew: key 'hot' = 30% of rows, 'warm' = 10%, the rest
    spread over ~n/2 cold keys (deterministic, partition-spread)."""
    base = spark.range(n).repartition(8)
    return base.select(
        F.when(F.col("id") % 10 < 3, F.lit("hot"))
        .when(F.col("id") % 10 == 3, F.lit("warm"))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") / 2).cast("long").cast("string")))
        .alias("k")
    )


class TestHeavyHittersExact:
    def test_threshold_membership(self, spark):
        df = _skewed(spark)
        out = {r["k"]: r["n"] for r in heavy_hitters(df, "k", num=5, den=100).collect()}
        assert set(out) == {"hot", "warm"}
        assert out["hot"] == 6000 and out["warm"] == 2000

    def test_boundary_is_inclusive(self, spark):
        # 4 rows of 'a' out of 16 = exactly 25%: n*den >= total*num keeps it
        df = spark.createDataFrame(
            [("a",)] * 4 + [(f"b{i}",) for i in range(12)], "k string"
        )
        out = [r["k"] for r in heavy_hitters(df, "k", num=25, den=100).collect()]
        assert out == ["a"]

    def test_null_values_count_as_a_key(self, spark):
        df = spark.createDataFrame([(None,)] * 6 + [("x",)] * 4, "k string")
        out = {r["k"]: r["n"] for r in heavy_hitters(df, "k", num=1, den=2).collect()}
        assert out == {None: 6}


class TestHeavyHittersApprox:
    def test_superset_of_exact_and_bounded_counts(self, spark):
        df = _skewed(spark)
        exact = {r["k"]: r["n"] for r in heavy_hitters(df, "k", num=5, den=100).collect()}
        approx = {
            r["k"]: r["lb"]
            for r in heavy_hitters_approx(df, "k", num=5, den=100, slack=4).collect()
        }
        # Guarantee: every true heavy hitter survives the bounded-state pass.
        assert set(exact) <= set(approx)
        for k, n in exact.items():
            assert approx[k] <= n  # lower bound never exceeds truth
        # State bound held: candidates ≤ counters-per-partition × partitions.
        assert len(approx) <= (4 * 100 // 5) * df.rdd.getNumPartitions()

    def test_partition_invariance_of_guarantee(self, spark):
        df = _skewed(spark, n=5_000)
        exact = set(
            r["k"] for r in heavy_hitters(df, "k", num=5, den=100).collect()
        )
        for parts in (1, 3, 16):
            got = set(
                r["k"]
                for r in heavy_hitters_approx(
                    df.repartition(parts), "k", num=5, den=100
                ).collect()
            )
            assert exact <= got, parts

    def test_slack_guard(self, spark):
        df = _skewed(spark, n=100)
        with pytest.raises(ValueError, match="slack"):
            heavy_hitters_approx(df, "k", slack=1)


class TestHeavyHittersRecount:
    def test_approx_then_recount_equals_exact(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            heavy_hitters_exact_of,
        )

        df = _skewed(spark)
        exact = {r["k"]: r["n"] for r in heavy_hitters(df, "k", num=5, den=100).collect()}
        cands = heavy_hitters_approx(df, "k", num=5, den=100)
        got = {
            r["k"]: r["n"]
            for r in heavy_hitters_exact_of(df, "k", cands, num=5, den=100).collect()
        }
        assert got == exact  # superset candidates + exact recount ≡ exact

    def test_recount_preserves_input_type_and_nulls(self, spark):
        """Approx stringifies keys; the recount semi-join casts Spark-side
        on both ends (null-safe), so typed columns and NULL keys round-trip."""
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            heavy_hitters_exact_of,
        )

        df = spark.createDataFrame(
            [(7,)] * 6 + [(None,)] * 5 + [(i,) for i in range(10, 19)], "k long"
        )
        exact = {r["k"]: r["n"] for r in heavy_hitters(df, "k", num=1, den=5).collect()}
        assert exact == {7: 6, None: 5}
        cands = heavy_hitters_approx(df, "k", num=1, den=5)
        out = heavy_hitters_exact_of(df, "k", cands, num=1, den=5)
        assert dict(out.dtypes)["k"] == "bigint"  # original type, not string
        assert {r["k"]: r["n"] for r in out.collect()} == exact

    def test_unthresholded_recount_counts_all_candidates(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            heavy_hitters_exact_of,
        )

        df = spark.createDataFrame([("a",)] * 3 + [("b",)] * 2 + [("c",)], "k string")
        cands = spark.createDataFrame([("a",), ("c",), ("zzz",)], "k string")
        got = {r["k"]: r["n"] for r in heavy_hitters_exact_of(df, "k", cands).collect()}
        assert got == {"a": 3, "c": 1}  # absent candidate yields no row


class TestTopKeywords:
    def test_rank_prefers_frequent_then_rare(self, spark):
        docs = spark.createDataFrame(
            [
                # doc 1: 'apple' ×3; 'rare' and 'common' ×1 each — rare wins
                # the tiebreak because 'common' appears in every doc.
                (1, "apple apple apple rare common"),
                (2, "banana common"),
                (3, "cherry common"),
            ],
            "doc_id long, text string",
        )
        out = {
            (r["doc_id"], r["rnk"]): (r["term"], r["tf"], r["df"])
            for r in top_keywords(docs, k=2).collect()
        }
        assert out[(1, 1)] == ("apple", 3, 1)
        assert out[(1, 2)] == ("rare", 1, 1)  # df=1 beats common's df=3
        assert out[(2, 1)] == ("banana", 1, 1)
        assert out[(2, 2)] == ("common", 1, 3)

    def test_min_len_filters_short_tokens(self, spark):
        docs = spark.createDataFrame([(1, "a bb ccc dddd")], "doc_id long, text string")
        terms = {r["term"] for r in top_keywords(docs, k=10, min_len=3).collect()}
        assert terms == {"ccc", "dddd"}

    def test_empty_and_punctuation_only_docs_yield_no_rows(self, spark):
        docs = spark.createDataFrame(
            [(1, ""), (2, "!!! ... ???"), (3, "words exist here")],
            "doc_id long, text string",
        )
        out = top_keywords(docs, k=3).collect()
        assert {r["doc_id"] for r in out} == {3}


class TestHistogramEquiWidth:
    def test_bins_boundaries_and_out_of_range(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            histogram_equi_width,
        )

        df = spark.createDataFrame(
            [(x,) for x in [-0.5, 0.0, 0.9, 1.0, 5.0, 9.99, 10.0, 10.5, None]],
            "x double",
        )
        out = {r["bin"]: r for r in histogram_equi_width(df, "x", 0.0, 10.0, 10).collect()}
        # -0.5, 10.5, NULL excluded; 0.0 and 0.9 -> bin 0; 1.0 -> bin 1;
        # 5.0 -> bin 5; 9.99 -> bin 9; 10.0 (== hi) folds into bin 9.
        assert {b: out[b]["n"] for b in sorted(out)} == {0: 2, 1: 1, 5: 1, 9: 2}
        assert out[5]["lo_edge"] == 5.0 and out[5]["hi_edge"] == 6.0

    def test_rejects_bad_range(self, spark):
        import pytest

        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            histogram_equi_width,
        )

        df = spark.createDataFrame([(1.0,)], "x double")
        with pytest.raises(ValueError):
            histogram_equi_width(df, "x", 5.0, 5.0, 10)
        with pytest.raises(ValueError):
            histogram_equi_width(df, "x", 0.0, 1.0, 0)


def test_cms_merge_parity_and_overestimate(spark, sf_dir):
    """Count-Min sketch: daily->weekly cell-wise merge is BIT-EXACT equal
    to building weekly directly; estimates never undercount, and the
    overestimate stays within the collision-mass envelope for nearly all
    keys."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _events

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            F.col("ts").cast("date").alias("day"),
            "user_id",
        )
    )
    daily = cms_build(ev, "user_id", depth=4, width=128, group_cols=["week", "day"])
    merged = cms_merge(daily, ["week"])
    direct = cms_build(ev, "user_id", depth=4, width=128, group_cols=["week"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))

    probes = ev.select("week", F.col("user_id").cast("string").alias("user_id")).distinct()
    est = {
        (r["week"], r["user_id"]): r["est"]
        for r in cms_estimate(
            merged, probes, "user_id", depth=4, width=128, group_cols=["week"]
        ).collect()
    }
    true = {
        (r["week"], str(r["user_id"])): r["n"]
        for r in ev.groupBy("week", "user_id").agg(F.count("*").alias("n")).collect()
    }
    week_n = {
        r["week"]: r["n"]
        for r in ev.groupBy("week").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(true)
    loose = 0
    for key, t in true.items():
        assert est[key] >= t, f"CMS undercounted {key}"
        if est[key] - t > 8 * week_n[key[0]] / 128:  # 8x expected collision mass
            loose += 1
    assert loose / len(true) < 0.05, f"{loose}/{len(true)} estimates loose"


def test_cms_out_of_stream_probe_estimates_zero(spark):
    """True Count-Min semantics (ADVICE r7): the min ranges over ALL depth
    cells, empty cells count 0 — so an out-of-stream key with at least one
    empty cell estimates 0 instead of the collision mass of its nonzero
    cells, and probing a never-seen group yields 0, not a dropped row."""
    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([("g1", f"k{i}") for i in range(5)], "g string, k string")
    sketch = cms_build(df, "k", depth=4, width=4096, group_cols=["g"])
    probes = spark.createDataFrame(
        [("g1", "k0"), ("g1", "unseen-key"), ("g2", "k0")], "g string, k string"
    )
    est = {
        (r["g"], r["k"]): r["est"]
        for r in cms_estimate(
            sketch, probes, "k", depth=4, width=4096, group_cols=["g"]
        ).collect()
    }
    assert est[("g1", "k0")] == 1
    # width 4096 >> 5 keys: an unseen key almost surely has an empty cell
    assert est[("g1", "unseen-key")] == 0
    assert est[("g2", "k0")] == 0  # never-seen group: zero, not absent


def test_qsketch_merge_parity_and_quantile_bracket(spark, sf_dir):
    """Quantile sketch: daily->weekly additive merge is BIT-EXACT equal to
    building weekly directly, and each read-out quantile brackets the true
    (exact lower) quantile within one bin width."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import (
        qsketch_build,
        qsketch_merge,
        qsketch_quantiles,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _events

    ev = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            F.col("ts").cast("date").alias("day"),
            "value",
        )
    )
    lo, width, nbins = 0.0, 4.0, 128
    daily = qsketch_build(ev, "value", lo, width, nbins, group_cols=["week", "day"])
    merged = qsketch_merge(daily, ["week"])
    direct = qsketch_build(ev, "value", lo, width, nbins, group_cols=["week"])
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))

    qs = [0.5, 0.9, 0.99]
    got = qsketch_quantiles(merged, qs, lo, width, group_cols=["week"]).collect()
    vals = {
        w: sorted(r["value"] for r in rows)
        for w, rows in (
            (k, list(g))
            for k, g in __import__("itertools").groupby(
                sorted(ev.collect(), key=lambda r: str(r["week"])),
                key=lambda r: str(r["week"]),
            )
        )
    }
    assert got, "no quantile rows"
    for r in got:
        v = vals[str(r["week"])]
        n = len(v)
        assert r["n"] == n
        # exact lower quantile: the ceil(q*n)-th smallest value
        import math

        true_q = v[math.ceil(r["q"] * n) - 1]
        assert r["est"] <= true_q < r["est"] + width, (
            f"week {r['week']} q{r['q']}: est {r['est']} vs true {true_q}"
        )


def test_qsketch_clamps_out_of_range_values(spark):
    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import (
        qsketch_build,
    )

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (3.9,), (511.9,), (10_000.0,)], "value double"
    )
    bins = {
        r["bin"]: r["cnt"]
        for r in qsketch_build(df, "value", 0.0, 4.0, 128).collect()
    }
    assert bins[0] == 3  # -5, 0, 3.9 all land in the first bin
    assert bins[127] == 2  # 511.9 and the far outlier clamp into the last


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.floats(min_value=-50.0, max_value=600.0, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
    q=st.sampled_from([0.25, 0.5, 0.9, 0.99]),
)
def test_qsketch_property_bracket_any_values(spark, vals, q):
    """Hypothesis property: for ANY value list (incl. out-of-range values
    that clamp into edge bins) the sketch quantile's bin brackets the true
    ceil-quantile of the CLAMPED values within one bin width."""
    import math

    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import (
        qsketch_build,
        qsketch_quantiles,
    )

    lo, width, nbins = 0.0, 4.0, 16
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    sk = qsketch_build(df.withColumn("g", F.lit("g1")), "value", lo, width, nbins, ["g"])
    got = {
        r["q"]: r
        for r in qsketch_quantiles(sk, [q], lo, width, ["g"]).collect()
    }
    r = got[q]
    # clamp mirrors the sketch's binning; position detail inside the edge
    # bins is lost by design, so the bracket is on clamped values
    clamped = sorted(min(max(v, lo), lo + nbins * width - 1e-9) for v in vals)
    true_q = clamped[math.ceil(q * len(clamped)) - 1]
    assert r["n"] == len(vals)
    assert r["est"] <= true_q < r["est"] + width
