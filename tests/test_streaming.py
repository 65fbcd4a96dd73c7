"""Structured Streaming tests: stream output == batch output on the same
static input (the kappa-parity property), and exactly-once streaming MERGE."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable
from lakehouse_architecture_for_realestatedata_spark.streaming.ingest import (
    read_file_stream,
    run_to_memory,
    sessionize,
    stream_merge_into,
    windowed_counts,
)


def _event_stream(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = read_file_stream(
        spark,
        sf_dir,
        schema="event_id long, ts long, user_id long, event_type string, value double, props string",
        options={"pathGlobFilter": "events.parquet"},
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def _event_batch(spark, sf_dir):
    from lakehouse_architecture_for_realestatedata_spark.queries import _events

    return _events(spark, sf_dir)


def test_stream_equals_batch_tumbling(spark, sf_dir):
    stream = windowed_counts(_event_stream(spark, sf_dir), streaming=True)
    q = run_to_memory(stream, "tumbling_out")
    try:
        got = sorted(map(tuple, spark.sql("SELECT * FROM tumbling_out").collect()))
        want = sorted(
            map(tuple, windowed_counts(_event_batch(spark, sf_dir), streaming=False).collect())
        )
        assert got == want
    finally:
        q.stop()


def test_stream_equals_batch_sessions(spark, sf_dir):
    stream = sessionize(_event_stream(spark, sf_dir), streaming=True)
    q = run_to_memory(stream, "sessions_out")
    try:
        got = sorted(map(tuple, spark.sql("SELECT * FROM sessions_out").collect()))
        want = sorted(
            map(tuple, sessionize(_event_batch(spark, sf_dir), streaming=False).collect())
        )
        assert got == want
    finally:
        q.stop()


def test_stream_merge_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch MERGE ingest: dedup within batch, upsert by key, and a
    re-run with the same checkpoint ingests nothing new (exactly-once)."""
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import dedup_latest

    table = ParquetTable(spark, str(tmp_path / "events_table"))
    ckpt = str(tmp_path / "ckpt")

    def latest_per_user(df):
        return dedup_latest(df, "user_id", [F.col("ts").desc(), F.col("event_id").desc()])

    stream_merge_into(_event_stream(spark, sf_dir), table, "user_id", ckpt, latest_per_user)
    out = table.read()
    n_users = out.count()
    assert n_users == out.select("user_id").distinct().count()  # PK unique

    # equals the batch dedup result
    want = latest_per_user(_event_batch(spark, sf_dir)).count()
    assert n_users == want

    # second run, same checkpoint: no new files → no change
    stream_merge_into(_event_stream(spark, sf_dir), table, "user_id", ckpt, latest_per_user)
    assert table.read().count() == n_users
