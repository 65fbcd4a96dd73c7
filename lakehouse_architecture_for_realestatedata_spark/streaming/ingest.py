"""Streaming ingest & stateful aggregation.

The reference has NO streaming (SURVEY §2.9): its incrementality is a daily
batch loop over a hand-rolled file manifest (S6) + high-water-mark predicates
(P7) + MERGE (S9). This module is the idiomatic-Spark upgrade the survey
prescribes: the file source's checkpoint replaces `_processed_files.txt`,
``Trigger.AvailableNow`` replaces the daily Airflow tick, ``foreachBatch``
MERGE keeps the exactly-once upsert semantics, and watermarked windows give
the late-data story the batch design silently lacks.

Batch/stream parity: every streaming aggregation here has a batch twin built
from the same expressions, and tests assert stream output == batch output on
a static directory — the property that makes the operators trustworthy for
backfill + live running off one codebase (kappa style).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """File-source stream (the S6 replacement). ``path`` must be a directory
    (use ``options={'pathGlobFilter': ...}`` to select files). The checkpoint
    tracks processed files — no manifest object to maintain, and the listing
    is incremental instead of a full bucket list per run."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "6 hours",
    watermark: str = "1 day",
    streaming: bool = True,
) -> DataFrame:
    """Tumbling-window count+sum per key. In streaming mode the watermark
    bounds state: windows older than (max event time - watermark) are
    finalized and dropped from the state store — the knob that keeps a
    100 TB/day stream's state finite."""
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    streaming: bool = True,
    watermark: str = "1 day",
) -> DataFrame:
    """Session windows (gap-close semantics) per user: count + bounds.

    Streaming: native ``session_window`` state merging. Batch twin uses the
    same session_window expression — Spark supports it in batch, where it
    compiles to the lag/cumsum construction underneath."""
    src = events.withWatermark(ts_col, watermark) if streaming else events
    return (
        src.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(df: DataFrame, name: str) -> StreamingQuery:
    """Drive a streaming DataFrame to completion against a memory sink
    (complete mode) — the local smoke harness for stream/batch parity."""
    q = (
        df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    return q


def stream_merge_into(
    stream: DataFrame,
    table: ParquetTable,
    key: str | list[str],
    checkpoint: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Exactly-once streaming upsert: foreachBatch + MERGE (the reference's
    S9 Delta merge, driven by the stream instead of Airflow). Each micro-batch
    is deduped upstream by the caller's transform if needed; the checkpoint
    makes replayed batches idempotent because MERGE is idempotent per key."""

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        table.merge(out, key=key)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
