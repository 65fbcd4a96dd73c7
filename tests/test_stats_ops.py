"""Edge cases for the statistical-normalization operators (z-score,
winsorize, time-range rolling aggregates); fixture-scale oracle parity lives
in tests/test_queries_contract.py via queries_stats."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
    winsorize_by_group,
    zscore_by_group,
)
from lakehouse_architecture_for_realestatedata_spark.operators.windows import rolling_time_agg


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestZscore:
    def test_standardizes_and_guards_degenerate_groups(self, spark):
        df = spark.createDataFrame(
            [
                ("a", 1, 1.0),
                ("a", 2, 2.0),
                ("a", 3, 3.0),
                ("b", 4, 5.0),  # singleton group: n=1 -> NULL
                ("c", 5, 7.0),  # zero-variance group -> NULL
                ("c", 6, 7.0),
                ("a", 7, None),  # NULL value -> NULL z, excluded from stats
            ],
            "k string, id long, v double",
        )
        out = {r["id"]: r["zscore"] for r in zscore_by_group(df, "k", "v").collect()}
        assert out[4] is None and out[5] is None and out[6] is None and out[7] is None
        # group a: mean 2, sample std 1 -> z = (-1, 0, 1)
        assert math.isclose(out[1], -1.0) and out[2] == 0.0 and math.isclose(out[3], 1.0)

    def test_partition_invariance(self, spark):
        df = spark.createDataFrame(
            [("a", i, float(i * i % 17)) for i in range(200)], "k string, id long, v double"
        )
        one = {r["id"]: r["zscore"] for r in zscore_by_group(df.coalesce(1), "k", "v").collect()}
        many = {
            r["id"]: r["zscore"]
            for r in zscore_by_group(df.repartition(13), "k", "v").collect()
        }
        assert one == many  # decimal sums: bit-identical across partitionings


class TestWinsorize:
    def test_clips_to_group_quantiles(self, spark):
        df = spark.createDataFrame(
            [("a", i, float(i)) for i in range(1, 11)] + [("a", 99, 1000.0)],
            "k string, id long, v double",
        )
        out = {r["id"]: r["winsorized"] for r in
               winsorize_by_group(df, "k", "v", 0.0, 0.9).collect()}
        hi = max(out.values())
        assert out[99] == hi and hi < 1000.0  # outlier clipped to p90
        assert out[1] == 1.0  # lo=0.0: minimum untouched

    def test_null_passes_through_and_bad_bounds_reject(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, None), ("a", 3, 9.0)], "k string, id long, v double"
        )
        out = {r["id"]: r["winsorized"] for r in
               winsorize_by_group(df, "k", "v", 0.25, 0.75).collect()}
        assert out[2] is None
        with pytest.raises(ValueError):
            winsorize_by_group(df, "k", "v", 0.9, 0.1)


class TestRollingTimeAgg:
    def test_range_frame_includes_exact_window_and_ties(self, spark):
        df = spark.createDataFrame(
            [
                (1, 1, _ts("2024-01-01 10:00:00"), 1.0),
                (1, 2, _ts("2024-01-01 10:30:00"), 2.0),
                (1, 3, _ts("2024-01-01 10:59:59"), 4.0),  # within 1h of row 1
                (1, 4, _ts("2024-01-01 11:00:00"), 8.0),  # row 1 now outside
                (1, 5, _ts("2024-01-01 11:00:00"), 16.0),  # tie: peer of row 4
                (2, 6, _ts("2024-01-01 10:00:00"), 100.0),  # other key
            ],
            "user_id long, event_id long, ts timestamp, v double",
        )
        out = {
            r["event_id"]: (r["rolling_sum"], r["rolling_n"])
            for r in rolling_time_agg(df, "user_id", "ts", "v", 3600).collect()
        }
        assert out[1] == (1.0, 1)
        assert out[2] == (3.0, 2)
        assert out[3] == (7.0, 3)  # 10:00:00 still inside (3599s back)
        # RANGE frame: equal-timestamp rows are peers — BOTH tie rows see the
        # full peer sum (2+4+8+16; 10:00:00 fell out at 11:00).
        assert out[4] == (30.0, 4) and out[5] == (30.0, 4)
        assert out[6] == (100.0, 1)

    def test_no_self_join_in_plan(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan

        df = spark.createDataFrame(
            [(1, 1, _ts("2024-01-01 10:00:00"), 1.0)],
            "user_id long, event_id long, ts timestamp, v double",
        )
        plan = physical_plan(rolling_time_agg(df, "user_id", "ts", "v"), mode="simple")
        assert "Join" not in plan, plan
        assert "Window" in plan, plan


class TestCorrByGroup:
    def test_known_values_and_degenerate_guards(self, spark):
        df = spark.createDataFrame(
            [
                # group a: y = 2x exactly -> corr 1
                ("a", 1.0, 2.0),
                ("a", 2.0, 4.0),
                ("a", 3.0, 6.0),
                # group b: y = -x -> corr -1
                ("b", 1.0, 3.0),
                ("b", 2.0, 2.0),
                ("b", 3.0, 1.0),
                # group c: zero x-variance -> NULL
                ("c", 5.0, 1.0),
                ("c", 5.0, 2.0),
                # group d: singleton -> NULL
                ("d", 1.0, 1.0),
                # group e: NULL pair members excluded (pairwise deletion)
                ("e", 1.0, 1.0),
                ("e", 2.0, None),
                ("e", None, 9.0),
                ("e", 3.0, 3.0),
            ],
            "k string, x double, y double",
        )
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            corr_by_group,
        )

        out = {r["k"]: (r["n"], r["corr"]) for r in corr_by_group(df, "k", "x", "y").collect()}
        assert out["a"] == (3, pytest.approx(1.0))
        assert out["b"] == (3, pytest.approx(-1.0))
        assert out["c"] == (2, None)
        assert out["d"] == (1, None)
        assert out["e"][0] == 2 and out["e"][1] == pytest.approx(1.0)

    def test_partition_invariance(self, spark):
        """Bit-identical corr regardless of partitioning — the reason for the
        exact-decimal sums + closed form over the built-in corr."""
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            corr_by_group,
        )

        rows = [("g", float(i % 17) + 0.25, float((i * 7) % 23) + 0.5) for i in range(500)]
        df = spark.createDataFrame(rows, "k string, x double, y double")
        a = corr_by_group(df.coalesce(1), "k", "x", "y").collect()[0]["corr"]
        b = corr_by_group(df.repartition(16), "k", "x", "y").collect()[0]["corr"]
        assert a == b  # exact equality, not approx


class TestMadOutliers:
    def test_flags_and_degenerate_mad(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            mad_outliers_by_group,
        )

        df = spark.createDataFrame(
            [
                ("a", 1, 10.0),
                ("a", 2, 11.0),
                ("a", 3, 12.0),
                ("a", 4, 13.0),
                ("a", 5, 1000.0),  # clear outlier
                ("b", 6, 5.0),  # MAD=0 group: only exact-median rows inline
                ("b", 7, 5.0),
                ("b", 8, 6.0),
                ("a", 9, None),  # NULL value -> NULL flag
            ],
            "k string, id long, v double",
        )
        out = {
            r["id"]: (r["med"], r["mad"], r["is_outlier"])
            for r in mad_outliers_by_group(df, "k", "v").collect()
        }
        assert out[5][2] is True
        assert all(out[i][2] is False for i in (1, 2, 3, 4))
        # group b: med 5, MAD 0 -> 6.0 is an outlier, 5.0s are not
        assert out[6] == (5.0, 0.0, False)
        assert out[8][2] is True
        assert out[9][2] is None

    def test_single_exchange_plan(self, spark):
        """Both medians ride ONE hash exchange on the group key."""
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            mad_outliers_by_group,
        )

        df = spark.createDataFrame([("a", 1.0)], "k string, v double")
        plan = (
            mad_outliers_by_group(df, "k", "v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1


class TestQuantileExactGlobal:
    def test_matches_builtin_percentile(self, spark, sf_dir):
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            quantile_exact_global,
        )
        from lakehouse_architecture_for_realestatedata_spark.queries import _events

        ev = _events(spark, sf_dir).select("value")
        want = ev.agg(
            F.percentile("value", 0.25).alias("p25"),
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.95).alias("p95"),
        ).collect()[0]
        for q, name in [(0.25, "p25"), (0.5, "p50"), (0.95, "p95")]:
            assert quantile_exact_global(ev, "value", q) == want[name]  # bit-exact

    def test_heavy_ties_and_small_inputs(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            quantile_exact_global,
        )

        ties = spark.createDataFrame([(5.0,)] * 1000 + [(7.0,)], "v double")
        assert quantile_exact_global(ties, "v", 0.5) == 5.0  # converges instantly on ties
        two = spark.createDataFrame([(1.0,), (2.0,)], "v double")
        assert quantile_exact_global(two, "v", 0.5) == 1.5  # interpolates
        one = spark.createDataFrame([(3.0,), (None,)], "v double")
        assert quantile_exact_global(one, "v", 0.0) == 3.0  # NULLs excluded
        import pytest as _pytest

        empty = spark.createDataFrame([], "v double")
        with _pytest.raises(ValueError):
            quantile_exact_global(empty, "v", 0.5)
        with _pytest.raises(ValueError):
            quantile_exact_global(two, "v", 1.5)


class TestRollingAnomaly:
    def test_spike_flags_and_degenerate_windows(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
            rolling_anomaly_flags,
        )

        base = dt.datetime(2024, 1, 1, 10, 0, 0)
        rows = [(1, i, base + dt.timedelta(minutes=i), 10.0 + (i % 3) * 0.1) for i in range(10)]
        rows.append((1, 99, base + dt.timedelta(minutes=10), 1000.0))  # spike in-window
        rows.append((2, 100, base, 5.0))  # singleton window -> NULL flag
        rows.append((3, 101, base, 7.0))  # zero-variance pair -> NULL flag
        rows.append((3, 102, base + dt.timedelta(minutes=1), 7.0))
        df = spark.createDataFrame(rows, "k long, id long, ts timestamp, v double")
        out = {
            r["id"]: r["is_anomaly"]
            for r in rolling_anomaly_flags(df, "k", "ts", "v", 3600, 3.0).collect()
        }
        assert out[99] is True
        assert out[0] is None  # first row: singleton trailing window
        assert all(out[i] is False for i in range(1, 10))
        assert out[100] is None and out[101] is None and out[102] is None

    def test_out_of_window_history_does_not_flag(self, spark):
        """A value normal for its trailing hour must not be judged against
        older history outside the frame."""
        from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
            rolling_anomaly_flags,
        )

        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [(1, i, base + dt.timedelta(minutes=i), 100.0 + i) for i in range(3)]
        # 2h later a new regime at ~5.0: no overlap with the old frame
        rows += [(1, 10 + i, base + dt.timedelta(hours=2, minutes=i), 5.0 + 0.1 * i) for i in range(3)]
        df = spark.createDataFrame(rows, "k long, id long, ts timestamp, v double")
        out = {
            r["id"]: r["is_anomaly"]
            for r in rolling_anomaly_flags(df, "k", "ts", "v", 3600, 3.0).collect()
        }
        assert out[11] is False and out[12] is False


class TestHistogram2D:
    def test_cells_edges_and_fold(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            histogram_2d,
        )

        df = spark.createDataFrame(
            [(0.0, 0.0), (4.9, 9.9), (5.0, 10.0), (10.0, 20.0), (None, 1.0), (11.0, 1.0)],
            "x double, y double",
        )
        out = {
            (r["x_bin"], r["y_bin"]): (r["n"], r["x_lo"], r["y_lo"])
            for r in histogram_2d(df, "x", "y", (0.0, 10.0), (0.0, 20.0), 2, 2).collect()
        }
        # (0,0): first two points; (1,1): the 5.0/10.0 point and the max
        # corner folded into the last bin; NULL and out-of-range dropped
        assert out[(0, 0)] == (2, 0.0, 0.0)
        assert out[(1, 1)] == (2, 5.0, 10.0)
        assert set(out) == {(0, 0), (1, 1)}


class TestShrunkGroupMean:
    def test_shrinks_small_groups_toward_prior(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            shrunk_group_mean,
        )

        df = spark.createDataFrame(
            [("big", 10.0)] * 100 + [("tiny", 100.0)] + [("x", None)],
            "k string, v double",
        )
        out = {
            r["k"]: (r["n"], r["raw_mean"], r["shrunk_mean"])
            for r in shrunk_group_mean(df, "k", "v", m=10.0).collect()
        }
        prior = (10.0 * 100 + 100.0) / 101
        assert out["big"][0] == 100 and out["big"][1] == 10.0
        # the 1-row group collapses most of the way to the prior
        n, raw, shrunk = out["tiny"]
        assert n == 1 and raw == 100.0
        assert abs(shrunk - (100.0 + 10.0 * prior) / 11.0) < 1e-9
        assert shrunk < 25.0  # far from its raw 100, near the ~10.9 prior
        assert "x" not in out  # all-NULL group contributes nothing


def test_hll_rollup_merge_parity(spark, sf_dir):
    """Sketch-merge associativity: weekly estimates from unioned daily
    sketches must equal direct weekly sketches BIT-EXACTLY, and sit within
    HLL error of the exact distinct count."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.queries import _events, registry

    rolled = {
        r["week"]: r["approx_users"]
        for r in registry()["approx_users_weekly_rollup"].spark_fn(spark, sf_dir).collect()
    }
    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    wk = F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    direct = {
        r["week"]: r["d"]
        for r in ev.groupBy(wk)
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("d"))
        .collect()
    }
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy(wk).agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert set(rolled) == set(direct) == set(exact) and len(rolled) > 1
    for w in rolled:
        assert rolled[w] == direct[w], (w, rolled[w], direct[w])
        assert abs(rolled[w] - exact[w]) <= max(2, 0.06 * exact[w])


def test_ols_by_group_recovers_planted_slope(spark):
    """y = 3x + 7 (+ grid noise) recovers slope/intercept to within the
    2^-20 quantization error; zero-variance and n=1 groups are NULL;
    results are bit-stable across partitionings."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import ols_by_group

    rows = [("a", float(i), 3.0 * i + 7.0) for i in range(100)]
    rows += [("b", 5.0, 1.0), ("b", 5.0, 2.0)]  # zero x-variance
    rows += [("c", 1.0, 1.0)]  # n == 1
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: (r["n"], r["slope"], r["intercept"]) for r in ols_by_group(df, "g", "x", "y").collect()}
    n, slope, intercept = out["a"]
    assert n == 100 and abs(slope - 3.0) < 1e-5 and abs(intercept - 7.0) < 1e-3
    assert out["b"][1] is None and out["c"][1] is None
    a = sorted(map(tuple, ols_by_group(df.coalesce(1), "g", "x", "y").collect()))
    b = sorted(map(tuple, ols_by_group(df.repartition(8), "g", "x", "y").collect()))
    assert a == b
