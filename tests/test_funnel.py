"""Unit tests for the ordered-funnel operator: strictly-after semantics,
drop-off counting, tie handling — the paths the dense synthetic fixture
(everyone converts) can't discriminate."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
    funnel_conversion,
    funnel_reached,
)


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


STAGES = ["view", "click", "purchase"]


def test_funnel_dropoff_counts(spark):
    ev = _ev(
        spark,
        [
            # u1: full conversion
            (1, _ts("2024-01-01 10:00:00"), "view"),
            (1, _ts("2024-01-01 10:01:00"), "click"),
            (1, _ts("2024-01-01 10:02:00"), "purchase"),
            # u2: clicks but purchase happened BEFORE the click -> stops at click
            (2, _ts("2024-01-01 09:00:00"), "purchase"),
            (2, _ts("2024-01-01 10:00:00"), "view"),
            (2, _ts("2024-01-01 11:00:00"), "click"),
            # u3: view only
            (3, _ts("2024-01-01 10:00:00"), "view"),
            # u4: click without any view -> never enters the funnel
            (4, _ts("2024-01-01 10:00:00"), "click"),
            # NULL user: excluded
            (None, _ts("2024-01-01 10:00:00"), "view"),
        ],
    )
    out = {
        r["stage"]: (r["users"], r["conversion"])
        for r in funnel_conversion(ev, "user_id", "ts", "event_type", STAGES).collect()
    }
    assert out == {
        "view": (3, 1.0),
        "click": (2, pytest.approx(2 / 3)),
        "purchase": (1, pytest.approx(1 / 3)),
    }


def test_funnel_strictly_after_tie_does_not_count(spark):
    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), "view"),
            (1, _ts("2024-01-01 10:00:00"), "click"),  # tie with view: not after
            (1, _ts("2024-01-01 10:05:00"), "purchase"),
        ],
    )
    reached = funnel_reached(ev, "user_id", "ts", "event_type", STAGES).collect()[0]["reached"]
    assert reached[0] is not None and reached[1] is None and reached[2] is None


def test_funnel_greedy_earliest_matches_sequential_min(spark):
    """The earliest qualifying chain, not the densest: u1's first view at
    09:00 admits the 09:30 click even though a later view (10:00) also
    precedes it; the purchase before the click never counts."""
    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01 09:00:00"), "view"),
            (1, _ts("2024-01-01 09:10:00"), "purchase"),  # before first click: ignored
            (1, _ts("2024-01-01 09:30:00"), "click"),
            (1, _ts("2024-01-01 10:00:00"), "view"),
            (1, _ts("2024-01-01 10:30:00"), "purchase"),
        ],
    )
    reached = funnel_reached(ev, "user_id", "ts", "event_type", STAGES).collect()[0]["reached"]
    assert [str(t) for t in reached] == [
        "2024-01-01 09:00:00",
        "2024-01-01 09:30:00",
        "2024-01-01 10:30:00",
    ]


def test_funnel_empty_input_yields_zero_rows_per_stage(spark):
    ev = _ev(spark, []).filter(F.lit(False))
    out = funnel_conversion(ev, "user_id", "ts", "event_type", STAGES).collect()
    assert [(r["stage_idx"], r["users"], r["conversion"]) for r in out] == [
        (0, 0, None),
        (1, 0, None),
        (2, 0, None),
    ]


def test_funnel_rejects_bad_stages(spark):
    ev = _ev(spark, [])
    with pytest.raises(ValueError):
        funnel_reached(ev, "user_id", "ts", "event_type", ["view"])
    with pytest.raises(ValueError):
        funnel_reached(ev, "user_id", "ts", "event_type", ["view", "view"])


def test_funnel_single_shuffle_plan(spark):
    """The per-user walk is ONE hash exchange on the user key; no join nodes
    anywhere (the oracle's K-join chain is what we're avoiding)."""
    ev = _ev(spark, [(1, _ts("2024-01-01 10:00:00"), "view")])
    plan = (
        funnel_reached(ev, "user_id", "ts", "event_type", STAGES)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


class TestEventTransitions:
    def test_counts_and_row_normalization(self, spark):
        ev = _ev(
            spark,
            [
                (1, _ts("2024-01-01 10:00:00"), "a"),
                (1, _ts("2024-01-01 10:01:00"), "b"),
                (1, _ts("2024-01-01 10:02:00"), "a"),
                (1, _ts("2024-01-01 10:03:00"), "c"),
                (2, _ts("2024-01-01 10:00:00"), "a"),
                (2, _ts("2024-01-01 10:01:00"), "b"),
                (3, _ts("2024-01-01 10:00:00"), "solo"),  # single event: no pair
                (None, _ts("2024-01-01 10:00:00"), "a"),  # NULL user excluded
            ],
        )
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
            event_transitions,
        )

        out = {
            (r["from_stage"], r["to_stage"]): (r["n"], r["p"])
            for r in event_transitions(ev, "user_id", "ts", "event_type").collect()
        }
        # from 'a': 2×a→b, 1×a→c; from 'b': 1×b→a
        assert out[("a", "b")] == (2, pytest.approx(2 / 3))
        assert out[("a", "c")] == (1, pytest.approx(1 / 3))
        assert out[("b", "a")] == (1, 1.0)
        assert ("solo", "solo") not in out and len(out) == 3

    def test_tiebreak_orders_equal_timestamps(self, spark):
        rows = [
            (1, 10, _ts("2024-01-01 10:00:00"), "x"),
            (1, 20, _ts("2024-01-01 10:00:00"), "y"),  # same ts: event_id decides
            (1, 30, _ts("2024-01-01 10:00:00"), "z"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
            event_transitions,
        )

        out = {
            (r["from_stage"], r["to_stage"])
            for r in event_transitions(
                ev, "user_id", "ts", "event_type", tiebreak="event_id"
            ).collect()
        }
        assert out == {("x", "y"), ("y", "z")}


class TestRetentionCohorts:
    def test_weekly_matrix(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
            retention_cohorts,
        )

        ev = _ev(
            spark,
            [
                # u1: first week W0 (Mon 2024-01-01), returns W1 and W3
                (1, _ts("2024-01-03 10:00:00"), "view"),
                (1, _ts("2024-01-04 10:00:00"), "click"),  # same week, one count
                (1, _ts("2024-01-08 10:00:00"), "view"),
                (1, _ts("2024-01-22 10:00:00"), "view"),
                # u2: first week W0, never returns
                (2, _ts("2024-01-05 10:00:00"), "view"),
                # u3: first week W1
                (3, _ts("2024-01-10 10:00:00"), "view"),
                (None, _ts("2024-01-01 10:00:00"), "view"),
            ],
        )
        out = {
            (str(r["cohort"]), r["period_offset"]): r["users"]
            for r in retention_cohorts(ev, "user_id", "ts", "week").collect()
        }
        assert out == {
            ("2024-01-01", 0): 2,  # u1, u2
            ("2024-01-01", 1): 1,  # u1
            ("2024-01-01", 3): 1,  # u1
            ("2024-01-08", 0): 1,  # u3
        }

    def test_no_join_single_user_exchange(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
            retention_cohorts,
        )

        ev = _ev(spark, [(1, _ts("2024-01-01 10:00:00"), "view")])
        plan = (
            retention_cohorts(ev, "user_id", "ts")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Join" not in plan

    def test_rejects_bad_period(self, spark):
        import pytest as _pytest

        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
            retention_cohorts,
        )

        with _pytest.raises(ValueError):
            retention_cohorts(_ev(spark, []), "user_id", "ts", "year")


class TestSessionPaths:
    def test_paths_and_gap_break(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import session_paths

        rows = [
            # u1 session 1: a>b ; 40-min gap ; session 2: c
            (1, 1, _ts("2024-01-01 10:00:00"), "a"),
            (1, 2, _ts("2024-01-01 10:10:00"), "b"),
            (1, 3, _ts("2024-01-01 10:50:00"), "c"),
            # u2: a>b (one session)
            (2, 4, _ts("2024-01-01 09:00:00"), "a"),
            (2, 5, _ts("2024-01-01 09:05:00"), "b"),
            # tie at same ts: event_id orders x before y
            (3, 6, _ts("2024-01-01 08:00:00"), "x"),
            (3, 7, _ts("2024-01-01 08:00:00"), "y"),
            (None, 8, _ts("2024-01-01 08:00:00"), "z"),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        out = {
            r["path"]: r["n"]
            for r in session_paths(
                ev, "user_id", "ts", "event_type", 30, 20, tiebreak="event_id"
            ).collect()
        }
        assert out == {"a>b": 2, "c": 1, "x>y": 1}

    def test_exact_gap_boundary_breaks(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import session_paths

        ev = spark.createDataFrame(
            [
                (1, 1, _ts("2024-01-01 10:00:00"), "a"),
                (1, 2, _ts("2024-01-01 10:30:00"), "b"),  # exactly 30 min: new session
            ],
            "user_id long, event_id long, ts timestamp, event_type string",
        )
        out = {r["path"] for r in session_paths(ev, "user_id", "ts", "event_type", 30).collect()}
        assert out == {"a", "b"}

    def test_top_k_cut_is_total(self, spark):
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import session_paths

        rows = [(u, u, _ts("2024-01-01 10:00:00"), t) for u, t in
                [(1, "a"), (2, "b"), (3, "c"), (4, "d")]]
        ev = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, event_type string"
        )
        got = [r["path"] for r in session_paths(ev, "user_id", "ts", "event_type", 30, top_k=2).collect()]
        assert got == ["a", "b"]  # all n=1 -> path-text order decides the cut


def test_funnel_latency_values(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import funnel_latency

    ev = _ev(
        spark,
        [
            # u1: click 60s after view, purchase 120s after click
            (1, _ts("2024-01-01 10:00:00"), "view"),
            (1, _ts("2024-01-01 10:01:00"), "click"),
            (1, _ts("2024-01-01 10:03:00"), "purchase"),
            # u2: click 180s after view, no purchase
            (2, _ts("2024-01-01 10:00:00"), "view"),
            (2, _ts("2024-01-01 10:03:00"), "click"),
            # u3: view only
            (3, _ts("2024-01-01 10:00:00"), "view"),
        ],
    )
    out = {
        r["step"]: (r["n_users"], r["median_us"], r["avg_us"])
        for r in funnel_latency(ev, "user_id", "ts", "event_type", STAGES).collect()
    }
    assert out["view>click"] == (2, 120e6, 120e6)  # 60s & 180s -> median/mean 120s
    assert out["click>purchase"] == (1, 120e6, 120e6)
    assert set(out) == {"view>click", "click>purchase"}


def test_session_cooccurrence_pairs(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        session_cooccurrence,
    )

    ev = _ev(
        spark,
        [
            # u1 session 1: {a, b, c} ; big gap ; session 2: {a}
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 10:05:00"), "b"),
            (1, _ts("2024-01-01 10:06:00"), "b"),  # duplicate: set semantics
            (1, _ts("2024-01-01 10:10:00"), "c"),
            (1, _ts("2024-01-01 12:00:00"), "a"),  # singleton session: no pairs
            # u2: {a, b}
            (2, _ts("2024-01-01 09:00:00"), "b"),
            (2, _ts("2024-01-01 09:01:00"), "a"),  # order-insensitive: a<b pair
        ],
    )
    out = {
        (r["a"], r["b"]): r["n"]
        for r in session_cooccurrence(ev, "user_id", "ts", "event_type", 30).collect()
    }
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def _brute_funnel(events, stages):
    """Reference sequential-min semantics: t_j = min ts of stage_j events
    strictly after t_{j-1}, computed by literal search."""
    out = []
    prev = None
    for j, s in enumerate(stages):
        cand = [
            ts
            for ts, st in events
            if st == s and (j == 0 or (prev is not None and ts > prev))
        ]
        t = min(cand) if cand and (j == 0 or prev is not None) else None
        out.append(t)
        prev = t
    return out


def test_funnel_matches_bruteforce_reference(spark):
    """Greedy single-pass walk == sequential-min K-join semantics on
    adversarial small inputs (ties, repeats, out-of-order arrivals)."""
    import itertools
    import random

    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import funnel_reached

    rng = random.Random(7)
    stages = ["s0", "s1", "s2"]
    cases = []
    for case in range(40):
        n = rng.randint(1, 8)
        evs = [
            (
                _ts("2024-01-01 10:00:00")
                + __import__("datetime").timedelta(minutes=rng.randint(0, 5)),
                rng.choice(stages),
            )
            for _ in range(n)
        ]
        cases.append(evs)
    rows = [
        (uid, ts, st) for uid, evs in enumerate(cases) for ts, st in evs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["user_id"]: [t for t in r["reached"]]
        for r in funnel_reached(df, "user_id", "ts", "event_type", stages).collect()
    }
    for uid, evs in enumerate(cases):
        want = _brute_funnel(evs, stages)
        if want[0] is None:
            assert uid not in got
        else:
            assert got[uid] == want, (uid, sorted(evs), got.get(uid), want)


def test_rolling_active_users_window_semantics(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        rolling_active_users,
    )

    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), "view"),
            (1, _ts("2024-01-01 11:00:00"), "click"),  # same day: one grid cell
            (2, _ts("2024-01-01 10:00:00"), "view"),
            (1, _ts("2024-01-03 10:00:00"), "view"),
            (None, _ts("2024-01-02 10:00:00"), "view"),
        ],
    )
    out = {
        str(r["day"]): (r["dau"], r["wau"], r["stickiness"])
        for r in rolling_active_users(ev, "user_id", "ts", window_days=3).collect()
    }
    # Jan 1: both users active. Jan 2: no activity, but window [Dec31..Jan2]
    # still covers Jan 1 actives. Jan 3: u1 again; window [Jan1..Jan3] has 2.
    assert out["2024-01-01"] == (2, 2, 1.0)
    assert out["2024-01-02"] == (0, 2, 0.0)
    assert out["2024-01-03"] == (1, 2, 0.5)
    # window rolls off: Jan 4/5 only carry u1's Jan 3 activity
    assert out["2024-01-04"] == (0, 1, 0.0)
    assert out["2024-01-05"] == (0, 1, 0.0)
    assert len(out) == 5


def test_session_paths_matches_bruteforce_reference(spark):
    """Random event sets: gap sessionization + path assembly equals a
    literal Python reference."""
    import random
    from collections import Counter
    from datetime import timedelta

    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import session_paths

    rng = random.Random(13)
    gap_min = 30
    rows = []
    eid = 0
    users = {}
    for uid in range(25):
        t = _ts("2024-01-01 00:00:00") + timedelta(minutes=rng.randint(0, 600))
        evs = []
        for _ in range(rng.randint(1, 12)):
            t = t + timedelta(minutes=rng.randint(0, 70))
            stage = rng.choice("abc")
            evs.append((t, eid, stage))
            rows.append((uid, eid, t, stage))
            eid += 1
        users[uid] = evs
    want = Counter()
    for evs in users.values():
        evs = sorted(evs, key=lambda e: (e[0], e[1]))
        sess = [[evs[0]]]
        for prev, cur in zip(evs, evs[1:]):
            if (cur[0] - prev[0]).total_seconds() >= gap_min * 60:
                sess.append([])
            sess[-1].append(cur)
        for s in sess:
            want[">".join(e[2] for e in s)] += 1
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    got = {
        r["path"]: r["n"]
        for r in session_paths(
            df, "user_id", "ts", "event_type", gap_min, top_k=10_000, tiebreak="event_id"
        ).collect()
    }
    assert got == dict(want)


def test_association_rules_values(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        association_rules,
    )

    # 4 sessions (distinct users, one session each):
    # {a,b}, {a,b}, {a}, {b,c}
    ev = _ev(
        spark,
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 10:01:00"), "b"),
            (2, _ts("2024-01-01 10:00:00"), "a"),
            (2, _ts("2024-01-01 10:01:00"), "b"),
            (3, _ts("2024-01-01 10:00:00"), "a"),
            (4, _ts("2024-01-01 10:00:00"), "b"),
            (4, _ts("2024-01-01 10:01:00"), "c"),
        ],
    )
    out = {
        (r["antecedent"], r["consequent"]): (
            r["n_sessions"],
            r["support"],
            r["confidence"],
            r["lift"],
        )
        for r in association_rules(ev, "user_id", "ts", "event_type", 30).collect()
    }
    # a in 3 sessions, b in 3, c in 1; (a,b) in 2, (b,c) in 1; total 4
    assert out[("a", "b")] == (2, 0.5, pytest.approx(2 / 3), pytest.approx(0.5 / (0.75 * 0.75)))
    assert out[("b", "a")] == (2, 0.5, pytest.approx(2 / 3), pytest.approx(0.5 / (0.75 * 0.75)))
    assert out[("b", "c")][2] == pytest.approx(1 / 3)  # P(c|b)
    assert out[("c", "b")][2] == pytest.approx(1.0)  # P(b|c)
    assert out[("c", "b")][3] == pytest.approx((0.25) / (0.25 * 0.75))  # lift > 1
    assert len(out) == 4


def test_association_rules_materializes_sessions_once(spark):
    """Five consumers (total, singles x2, pairs x2) must read the
    materialized session frame — collect_set's nondeterminism marker bars
    ReuseExchange, so without materialization the corpus would shuffle
    five times."""
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        association_rules,
    )

    ev = _ev(spark, [(1, _ts("2024-01-01 10:00:00"), "a"),
                     (1, _ts("2024-01-01 10:01:00"), "b")])
    df = association_rules(ev, "user_id", "ts", "event_type", 30)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    cached_reads = plan.count("InMemoryTableScan") + plan.count("TableCacheQueryStage")
    assert cached_reads >= 5, plan[:500]
    spark.catalog.clearCache()  # free the plan-keyed cache entry


def test_retention_matches_bruteforce_reference(spark):
    import random
    from collections import Counter
    from datetime import timedelta

    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        retention_cohorts,
    )

    rng = random.Random(21)
    rows = []
    acts = {}
    for uid in range(30):
        days = sorted({rng.randint(0, 40) for _ in range(rng.randint(1, 6))})
        acts[uid] = days
        for d in days:
            rows.append(
                (uid, _ts("2024-01-01 00:00:00") + timedelta(days=d, hours=uid % 24), "x")
            )
    ev = _ev(spark, rows)
    got = {
        (str(r["cohort"]), r["period_offset"]): r["users"]
        for r in retention_cohorts(ev, "user_id", "ts", "week").collect()
    }
    import datetime as dt

    def monday(day_offset):
        d = (dt.date(2024, 1, 1) + dt.timedelta(days=day_offset))
        return d - dt.timedelta(days=d.weekday())

    want = Counter()
    for uid, days in acts.items():
        weeks = sorted({monday(d) for d in days})
        cohort = weeks[0]
        for w in weeks:
            want[(str(cohort), (w - cohort).days // 7)] += 1
    assert got == dict(want)


def test_retention_month_period_year_boundary(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        retention_cohorts,
    )

    ev = _ev(
        spark,
        [
            (1, _ts("2024-11-15 10:00:00"), "x"),  # cohort Nov 2024
            (1, _ts("2025-01-03 10:00:00"), "x"),  # offset 2 across the year
            (2, _ts("2024-12-31 23:00:00"), "x"),  # cohort Dec 2024
            (2, _ts("2025-01-01 01:00:00"), "x"),  # offset 1 next day
        ],
    )
    out = {
        (str(r["cohort"]), r["period_offset"]): r["users"]
        for r in retention_cohorts(ev, "user_id", "ts", "month").collect()
    }
    assert out == {
        ("2024-11-01", 0): 1,
        ("2024-11-01", 2): 1,
        ("2024-12-01", 0): 1,
        ("2024-12-01", 1): 1,
    }


def test_funnel_levels_within_window_semantics(spark):
    """Max-anchor DP contract: a later anchor completes after the earliest
    expires; out-of-window chains don't level up; same-instant events
    resolve by stage precedence; users without stage 0 are excluded;
    partition-invariant."""
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        funnel_levels_within,
    )

    rows = [
        (1, "2024-01-01 00:00:00", "view"), (1, "2024-01-01 01:00:00", "view"),
        (1, "2024-01-01 01:00:30", "click"), (1, "2024-01-01 01:01:00", "purchase"),
        (2, "2024-01-01 00:00:00", "view"), (2, "2024-01-01 02:00:00", "click"),
        (3, "2024-01-01 00:00:00", "view"), (3, "2024-01-01 00:00:00", "click"),
        (3, "2024-01-01 00:01:00", "purchase"),
        (4, "2024-01-01 00:00:00", "purchase"), (4, "2024-01-01 00:10:00", "view"),
        (5, "2024-01-01 00:00:00", "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string"
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "event_type")
    stages = ["view", "click", "purchase"]
    want = {1: 3, 2: 1, 3: 3, 4: 1}
    for src in (df.coalesce(1), df.repartition(8)):
        got = {
            r["user_id"]: r["level"]
            for r in funnel_levels_within(src, "user_id", "ts", "event_type", stages, 100).collect()
        }
        assert got == want


def test_sessionize_capped_splits_long_sessions(spark):
    """Cap contract: a continuous 5-hour burst (no 30-min gap) splits into
    2h spans anchored at its start; separate gap-sessions keep their own
    anchors; one exchange only."""
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import sessionize_capped
    from lakehouse_architecture_for_realestatedata_spark.plans.explain import count_shuffles

    rows = [(1, f"2024-01-01 {h:02d}:{m:02d}:00", h * 60 + m)
            for h in range(5) for m in range(0, 60, 10)]          # 5h burst
    rows += [(1, "2024-01-02 00:00:00", 9000)]                    # new gap-session
    rows += [(2, "2024-01-01 00:00:00", 9001)]                    # singleton
    df = spark.createDataFrame(rows, "user_id long, ts string, event_id long").selectExpr(
        "user_id", "cast(ts as timestamp) ts", "event_id")
    out = sessionize_capped(df, "user_id", "ts", gap_minutes=30, max_minutes=120,
                            tiebreak="event_id")
    # pin the shuffle count BEFORE collect: an executed adaptive plan's
    # string includes "== Initial Plan ==" and double-counts exchanges
    assert count_shuffles(out) == 1
    got = sorted((r["user_id"], str(r["session_start"]), r["n_events"]) for r in out.collect())
    # user 1 burst: spans [0h,2h) [2h,4h) [4h,5h) = 12+12+6 events, then the
    # next-day session; user 2 singleton
    assert got == [
        (1, "2024-01-01 00:00:00", 12),
        (1, "2024-01-01 02:00:00", 12),
        (1, "2024-01-01 04:00:00", 6),
        (1, "2024-01-02 00:00:00", 1),
        (2, "2024-01-01 00:00:00", 1),
    ], got
