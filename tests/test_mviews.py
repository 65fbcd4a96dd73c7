"""Incremental materialized-view maintenance: touched-day recompute
correctness, the no-change fast path, and change-feed day discovery."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.plans.mviews import refresh_daily_summary
from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable


def _ev(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, user_id long, value double")


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_incremental_equals_full_and_untouched_days_keep(spark, tmp_path):
    base = ParquetTable(spark, str(tmp_path / "base"))
    summary = ParquetTable(spark, str(tmp_path / "sum"))
    b1 = _ev(
        spark,
        [
            (_t("2024-01-01 10:00:00"), 1, 1.0),
            (_t("2024-01-01 11:00:00"), 2, 2.0),
            (_t("2024-01-02 10:00:00"), 1, 3.0),
        ],
    )
    base.overwrite(b1)
    v1 = refresh_daily_summary(base, summary)
    # batch 2 touches Jan 2 (late data) and adds Jan 3
    b2 = _ev(
        spark,
        [
            (_t("2024-01-02 23:00:00"), 3, 10.0),
            (_t("2024-01-03 10:00:00"), 1, 5.0),
        ],
    )
    base.append(b2)
    v2 = refresh_daily_summary(base, summary, since_version=v1)
    got = {
        str(r["day"]): (r["n_events"], r["n_users"], r["sum_value"])
        for r in summary.read().collect()
    }
    assert got == {
        "2024-01-01": (2, 2, 3.0),
        "2024-01-02": (2, 2, 13.0),  # recomputed whole day incl. old row
        "2024-01-03": (1, 1, 5.0),
    }
    # no-change fast path: version unchanged, no new summary version
    sv = summary.version()
    assert refresh_daily_summary(base, summary, since_version=v2) == v2
    assert summary.version() == sv


def test_incremental_matches_full_rebuild(spark, tmp_path):
    import random

    rng = random.Random(5)
    rows = [
        (
            _t("2024-01-01 00:00:00") + dt.timedelta(hours=rng.randint(0, 200)),
            rng.randint(1, 20),
            float(rng.randint(1, 100)),
        )
        for _ in range(300)
    ]
    base = ParquetTable(spark, str(tmp_path / "base"))
    summary = ParquetTable(spark, str(tmp_path / "sum"))
    cut = _t("2024-01-05 00:00:00")
    base.overwrite(_ev(spark, [r for r in rows if r[0] < cut]))
    v1 = refresh_daily_summary(base, summary)
    base.append(_ev(spark, [r for r in rows if r[0] >= cut]))
    refresh_daily_summary(base, summary, since_version=v1)
    full = ParquetTable(spark, str(tmp_path / "full"))
    refresh_daily_summary(base, full)  # one-shot
    a = sorted(map(tuple, summary.read().collect()))
    b = sorted(map(tuple, full.read().collect()))
    assert a == b


def test_stream_drives_incremental_summary(spark, tmp_path):
    """Three micro-batches through the streaming sink: the final summary
    equals the one-shot aggregate of everything ingested."""
    from lakehouse_architecture_for_realestatedata_spark.streaming.ingest import (
        stream_refresh_daily_summary,
    )

    rows = [
        (_t("2024-01-01 10:00:00"), 1, 1.0),
        (_t("2024-01-01 12:00:00"), 2, 2.0),
        (_t("2024-01-02 10:00:00"), 1, 4.0),
        (_t("2024-01-02 11:00:00"), 3, 8.0),
        (_t("2024-01-03 10:00:00"), 2, 16.0),
        (_t("2024-01-04 10:00:00"), 1, 32.0),
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        _ev(spark, rows[i * 2 : i * 2 + 2]).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"f{i}")
        )
    schema = _ev(spark, rows[:1]).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "f*"))
    )
    base = ParquetTable(spark, str(tmp_path / "base"))
    summary = ParquetTable(spark, str(tmp_path / "sum"))
    stream_refresh_daily_summary(
        stream, base, summary, checkpoint=str(tmp_path / "ckpt")
    )
    full = ParquetTable(spark, str(tmp_path / "full"))
    refresh_daily_summary(base, full)
    assert sorted(map(tuple, summary.read().collect())) == sorted(
        map(tuple, full.read().collect())
    )
    assert base.read().count() == 6
