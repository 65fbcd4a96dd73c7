"""Edge-case tests for the time-series regularization operators
(operators/temporal.py) and snapshot-diff CDC (operators/cdc.py) — the
fixture-scale oracle parity lives in tests/test_queries_contract.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.cdc import snapshot_diff
from lakehouse_architecture_for_realestatedata_spark.operators.temporal import (
    resample_locf,
    scd2_history,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


class TestResampleLocf:
    def test_fills_gap_days_with_locf(self, spark):
        df = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 10:00:00"), 5.0),
                (1, _ts("2024-01-01 11:00:00"), 7.0),  # same day: sums to 12
                (1, _ts("2024-01-04 00:00:00"), 3.0),  # 2-day gap before
                (2, _ts("2024-01-02 09:00:00"), 1.0),  # single-day key
            ],
            "k long, ts timestamp, v double",
        )
        out = resample_locf(df, key="k", ts="ts", value="v", step="day")
        rows = {(r["k"], r["bucket"].date().isoformat()): r for r in out.collect()}
        assert len(rows) == 5  # key 1: Jan 1..4 (4 rows), key 2: Jan 2
        assert rows[(1, "2024-01-01")]["observed"] == 12.0
        assert rows[(1, "2024-01-02")]["observed"] is None
        assert rows[(1, "2024-01-02")]["filled"] == 12.0  # carried forward
        assert rows[(1, "2024-01-03")]["filled"] == 12.0
        assert rows[(1, "2024-01-04")]["observed"] == 3.0
        assert rows[(1, "2024-01-04")]["filled"] == 3.0
        assert rows[(2, "2024-01-02")]["filled"] == 1.0

    def test_no_gaps_is_identity_grid(self, spark):
        df = spark.createDataFrame(
            [(1, _ts("2024-03-01 00:00:00"), 1.0), (1, _ts("2024-03-02 23:59:59"), 2.0)],
            "k long, ts timestamp, v double",
        )
        out = resample_locf(df, key="k", ts="ts", value="v", step="day").collect()
        assert len(out) == 2
        assert all(r["observed"] == r["filled"] for r in out)

    def test_hour_step(self, spark):
        df = spark.createDataFrame(
            [(1, _ts("2024-01-01 01:15:00"), 4.0), (1, _ts("2024-01-01 04:30:00"), 6.0)],
            "k long, ts timestamp, v double",
        )
        out = resample_locf(df, key="k", ts="ts", value="v", step="hour").collect()
        assert len(out) == 4  # hours 01..04
        filled = sorted((r["bucket"].hour, r["filled"]) for r in out)
        assert filled == [(1, 4.0), (2, 4.0), (3, 4.0), (4, 6.0)]

    def test_count_agg(self, spark):
        df = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 10:00:00"), 5.0),
                (1, _ts("2024-01-01 11:00:00"), None),  # count counts rows
                (1, _ts("2024-01-03 00:00:00"), 3.0),
            ],
            "k long, ts timestamp, v double",
        )
        out = resample_locf(df, key="k", ts="ts", value="v", step="day", agg="count")
        rows = {r["bucket"].day: (r["observed"], r["filled"]) for r in out.collect()}
        assert rows == {1: (2, 2), 2: (None, 2), 3: (1, 1)}

    def test_week_step_buckets_align_with_date_trunc(self, spark):
        """Regression for the week-grid origin bug: date_trunc('week') is
        Monday-aligned (epoch+345600s), so a floor(epoch/604800) spine lands
        on Thursdays and the spine→grid join silently loses every
        observation (all-NULL observed/filled)."""
        # 2024-01-03 is a Wednesday → its week bucket is Mon 2024-01-01;
        # 2024-01-17 is a Wednesday two weeks on → Mon 2024-01-15.
        df = spark.createDataFrame(
            [(1, _ts("2024-01-03 10:00:00"), 5.0), (1, _ts("2024-01-17 09:00:00"), 2.0)],
            "k long, ts timestamp, v double",
        )
        out = resample_locf(df, key="k", ts="ts", value="v", step="week")
        rows = {r["bucket"].date().isoformat(): (r["observed"], r["filled"]) for r in out.collect()}
        assert rows == {
            "2024-01-01": (5.0, 5.0),
            "2024-01-08": (None, 5.0),
            "2024-01-15": (2.0, 2.0),
        }
        assert all(dt.date.fromisoformat(d).weekday() == 0 for d in rows)  # Mondays

    def test_global_align_shares_one_spine(self, spark):
        """align='global': every key spans the corpus-wide [min, max] bucket
        range; keys with later first observations get NULL filled on their
        leading buckets (no LOCF source)."""
        df = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 00:00:00"), 1.0),
                (1, _ts("2024-01-03 00:00:00"), 3.0),
                (2, _ts("2024-01-02 00:00:00"), 9.0),  # starts a day later
            ],
            "k long, ts timestamp, v double",
        )
        out = resample_locf(df, key="k", ts="ts", value="v", step="day", align="global")
        rows = {(r["k"], r["bucket"].day): (r["observed"], r["filled"]) for r in out.collect()}
        assert rows == {
            (1, 1): (1.0, 1.0),
            (1, 2): (None, 1.0),
            (1, 3): (3.0, 3.0),
            (2, 1): (None, None),  # before key 2's first observation
            (2, 2): (9.0, 9.0),
            (2, 3): (None, 9.0),
        }

    def test_non_utc_session_is_rejected(self, spark):
        df = spark.createDataFrame(
            [(1, _ts("2024-01-01 00:00:00"), 1.0)], "k long, ts timestamp, v double"
        )
        spark.conf.set("spark.sql.session.timeZone", "Asia/Ho_Chi_Minh")
        try:
            import pytest

            with pytest.raises(ValueError, match="UTC session timezone"):
                resample_locf(df, key="k", ts="ts", value="v")
        finally:
            spark.conf.set("spark.sql.session.timeZone", "UTC")

    def test_single_shuffle_chain(self, spark):
        """The dense grid + fill plan must not shuffle the raw input more
        than once: one Exchange on the key for the grid aggregate; the span
        agg, spine explode, join and window all reuse key hashing (AQE may
        add coalesces, never a second wide exchange of raw rows)."""
        df = spark.createDataFrame(
            [(1, _ts("2024-01-01 00:00:00"), 1.0)], "k long, ts timestamp, v double"
        )
        plan = (
            resample_locf(df, key="k", ts="ts", value="v")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestScd2History:
    DATA = [
        # user 1: A@t1, A@t2 (collapse), B@t3, A@t4 (reopens A)
        (1, _ts("2024-01-01 00:00:00"), 1, "A"),
        (1, _ts("2024-01-02 00:00:00"), 2, "A"),
        (1, _ts("2024-01-03 00:00:00"), 3, "B"),
        (1, _ts("2024-01-04 00:00:00"), 4, "A"),
        # user 2: single row
        (2, _ts("2024-01-01 00:00:00"), 5, "Z"),
    ]

    def _hist(self, spark, data=None):
        df = spark.createDataFrame(
            data or self.DATA, "user_id long, ts timestamp, event_id long, state string"
        )
        return scd2_history(
            df, key="user_id", ts="ts", tracked=["state"], tiebreak=[F.col("event_id")]
        )

    def test_collapses_unchanged_and_closes_intervals(self, spark):
        rows = sorted(
            self._hist(spark).collect(), key=lambda r: (r["user_id"], r["valid_from"])
        )
        u1 = [r for r in rows if r["user_id"] == 1]
        assert [r["state"] for r in u1] == ["A", "B", "A"]
        assert u1[0]["valid_from"] == _ts("2024-01-01 00:00:00")
        assert u1[0]["valid_to"] == _ts("2024-01-03 00:00:00")  # skips collapsed row
        assert u1[1]["valid_to"] == _ts("2024-01-04 00:00:00")
        assert u1[2]["valid_to"] is None and u1[2]["is_current"]
        assert sum(r["is_current"] for r in u1) == 1
        (u2,) = [r for r in rows if r["user_id"] == 2]
        assert u2["is_current"] and u2["valid_to"] is None

    def test_null_transitions_are_changes(self, spark):
        data = [
            (1, _ts("2024-01-01 00:00:00"), 1, None),  # first row, NULL payload
            (1, _ts("2024-01-02 00:00:00"), 2, None),  # collapse (NULL == NULL)
            (1, _ts("2024-01-03 00:00:00"), 3, "A"),  # NULL -> A is a change
            (1, _ts("2024-01-04 00:00:00"), 4, None),  # A -> NULL is a change
        ]
        rows = sorted(self._hist(spark, data).collect(), key=lambda r: r["valid_from"])
        assert [r["state"] for r in rows] == [None, "A", None]

    def test_timestamp_ties_break_on_tiebreak(self, spark):
        t = _ts("2024-01-01 00:00:00")
        data = [(1, t, 2, "B"), (1, t, 1, "A")]  # same ts: event_id orders A then B
        rows = sorted(self._hist(spark, data).collect(), key=lambda r: r["valid_from"])
        assert [r["state"] for r in rows] == ["A", "B"]
        assert rows[0]["valid_to"] == t  # zero-width interval, closed by the tie row


class TestSnapshotDiff:
    SCHEMA = "id long, grp string, val double"

    def test_classifies_and_drops_unchanged(self, spark):
        old = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], self.SCHEMA
        )
        new = spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 99.0), (4, "d", 4.0)], self.SCHEMA
        )
        out = {r["id"]: r for r in snapshot_diff(old, new, keys=["id"]).collect()}
        assert set(out) == {2, 3, 4}  # id 1 unchanged -> dropped
        assert out[2]["change_type"] == "update" and out[2]["val"] == 99.0
        assert out[3]["change_type"] == "delete" and out[3]["val"] == 3.0  # old image
        assert out[4]["change_type"] == "insert" and out[4]["val"] == 4.0

    def test_null_keys_and_null_value_changes(self, spark):
        old = spark.createDataFrame([(None, "a", 1.0), (1, "b", None)], self.SCHEMA)
        new = spark.createDataFrame([(None, "a", 1.0), (1, "b", 5.0)], self.SCHEMA)
        out = snapshot_diff(old, new, keys=["id"]).collect()
        # NULL key matches NULL key (eqNullSafe): unchanged -> dropped;
        # NULL -> 5.0 is an update.
        assert len(out) == 1
        assert out[0]["id"] == 1 and out[0]["change_type"] == "update"

    def test_compare_subset_ignores_volatile_columns(self, spark):
        old = spark.createDataFrame([(1, "a", 1.0)], self.SCHEMA)
        new = spark.createDataFrame([(1, "a", 2.0)], self.SCHEMA)
        assert snapshot_diff(old, new, keys=["id"], compare=["grp"]).count() == 0
        out = snapshot_diff(old, new, keys=["id"], compare=["val"]).collect()
        assert out[0]["change_type"] == "update"

    def test_rejects_key_in_compare(self, spark):
        df = spark.createDataFrame([(1, "a", 1.0)], self.SCHEMA)
        try:
            snapshot_diff(df, df, keys=["id"], compare=["id"])
        except ValueError as e:
            assert "non-key" in str(e)
        else:  # pragma: no cover
            raise AssertionError("expected ValueError")

    def test_composite_keys(self, spark):
        old = spark.createDataFrame([(1, "a", 1.0), (1, "b", 2.0)], self.SCHEMA)
        new = spark.createDataFrame([(1, "a", 9.0), (2, "b", 2.0)], self.SCHEMA)
        out = {
            (r["id"], r["grp"]): r["change_type"]
            for r in snapshot_diff(old, new, keys=["id", "grp"]).collect()
        }
        assert out == {(1, "a"): "update", (1, "b"): "delete", (2, "b"): "insert"}


class TestScd2PitJoin:
    def test_lookup_edges(self, spark):
        import datetime as dt

        from lakehouse_architecture_for_realestatedata_spark.operators.temporal import (
            scd2_pit_join,
        )

        def ts(s):
            return dt.datetime.fromisoformat(s)

        hist = spark.createDataFrame(
            [
                # key 1: [10:00,11:00) state A, [11:00,NULL) state B
                (1, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "A"),
                (1, ts("2024-01-01 11:00:00"), None, "B"),
                # key 2: zero-length interval at 09:00 (same-ts change tie)
                (2, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:00"), "X"),
                (2, ts("2024-01-01 09:00:00"), None, "Y"),
            ],
            "k long, valid_from timestamp, valid_to timestamp, state string",
        )
        facts = spark.createDataFrame(
            [
                (1, 1, ts("2024-01-01 10:30:00")),  # inside first interval
                (2, 1, ts("2024-01-01 11:00:00")),  # boundary: valid_from inclusive
                (3, 1, ts("2024-01-01 09:00:00")),  # before first version -> NULL
                (4, 2, ts("2024-01-01 09:00:00")),  # zero-length interval never matches
                (5, 3, ts("2024-01-01 10:00:00")),  # unknown key -> NULL
            ],
            "fid long, k long, ts timestamp",
        )
        out = {
            r["fid"]: r["pit_state"]
            for r in scd2_pit_join(facts, hist, "k", "ts", ["state"]).collect()
        }
        assert out == {1: "A", 2: "B", 3: None, 4: "Y", 5: None}
        # exactly one row per fact (interval partitioning => unique match)
        assert scd2_pit_join(facts, hist, "k", "ts", ["state"]).count() == 5


def test_asof_directions_semantics(spark):
    """Forward picks the EARLIEST at-or-after right; nearest picks the
    closer side with exact-distance ties going backward; both stay
    inclusive at equal timestamps; tolerance gates each direction."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.asof import asof_join

    def ts(s):
        return f"2024-01-01 00:00:{s:02d}"

    left = spark.createDataFrame(
        [(1, ts(10)), (1, ts(20)), (1, ts(31)), (1, ts(55)), (2, ts(5))],
        "k int, lts string",
    ).select("k", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, ts(8), "a"), (1, ts(20), "b"), (1, ts(40), "c")],
        "k int, rts string, v string",
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "v")

    def run(direction, tol=None):
        out = asof_join(
            left, right, "k", "lts", "rts", ["v"],
            tolerance_seconds=tol, direction=direction,
        )
        return {
            (r["k"], r["lts"].second): r["matched_v"] for r in out.collect()
        }

    assert run("backward") == {(1, 10): "a", (1, 20): "b", (1, 31): "b", (1, 55): "c", (2, 5): None}
    assert run("forward") == {(1, 10): "b", (1, 20): "b", (1, 31): "c", (1, 55): None, (2, 5): None}
    # 31 is 11s after b(20) and 9s before c(40) -> nearest = c; 10 is 2s
    # after a(8) and 10s before b(20) -> a; 55 -> backward c only
    assert run("nearest") == {(1, 10): "a", (1, 20): "b", (1, 31): "c", (1, 55): "c", (2, 5): None}
    # exact-distance tie: left at 30 is 10s from both b(20) and c(40)
    tie = asof_join(
        spark.createDataFrame([(1, ts(30))], "k int, lts string").select(
            "k", F.col("lts").cast("timestamp").alias("lts")
        ),
        right, "k", "lts", "rts", ["v"], direction="nearest",
    ).collect()[0]
    assert tie["matched_v"] == "b"  # ties go backward
    assert run("forward", tol=5) == {(1, 10): None, (1, 20): "b", (1, 31): None, (1, 55): None, (2, 5): None}
    assert run("nearest", tol=5) == {(1, 10): "a", (1, 20): "b", (1, 31): None, (1, 55): None, (2, 5): None}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "lts", "rts", ["v"], direction="sideways")
