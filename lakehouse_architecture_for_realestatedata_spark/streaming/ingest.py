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
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) window count+sum per
    key. In streaming mode the watermark bounds state: windows older than
    (max event time - watermark) are finalized and dropped from the state
    store — the knob that keeps a 100 TB/day stream's state finite. A slide
    of window/k multiplies both output rows and state by k — keep k small."""
    src = events.withWatermark(ts_col, watermark) if streaming else events
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    return (
        src.groupBy(win.alias("w"), F.col(key_col))
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


def stream_dedup_exact(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 day",
    streaming: bool = True,
) -> DataFrame:
    """Streaming exact dedup by key: first arrival wins, later duplicates are
    dropped. The watermark bounds the seen-keys state (keys older than the
    watermark are forgotten — duplicates arriving later than that pass, the
    standard streaming-dedup contract). Batch twin: ``dropDuplicates``."""
    if streaming:
        return events.withWatermark(ts_col, watermark).dropDuplicates(key_cols)
    return events.dropDuplicates(key_cols)


def stream_dedup_within_watermark(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 day",
    streaming: bool = True,
) -> DataFrame:
    """Streaming dedup tolerating LATE duplicates: unlike ``dropDuplicates``
    (whose per-key state, once evicted at the watermark, lets a very late
    duplicate re-emit), ``dropDuplicatesWithinWatermark`` guarantees rows
    whose event times fall within the watermark delay of each other dedup
    against each other even when the first arrival was late — the contract
    to use when upstream retries deliver duplicates minutes apart with
    out-of-order event times. State is still watermark-bounded. The event
    time column participates in dedup state but is NOT a dedup key. Batch
    twin: plain ``dropDuplicates`` on the keys (batch sees all rows at
    once, so the two streaming contracts coincide)."""
    if streaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            key_cols
        )
    return events.dropDuplicates(key_cols)


def running_user_totals(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    streaming: bool = True,
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    RUNNING (count, sum) emitted on every micro-batch that touches the user —
    the template for stateful logic Spark's built-in aggregations can't
    express (EMA, per-key model state, change detection).

    State is two scalars per key — O(distinct users) store size, no event
    retention. Each batch's rows arrive as Arrow-batched pandas frames; the
    update is vectorized (len + sum), never per-row Python. Batch twin: plain
    groupBy count/sum. The emitted ``n_events`` is monotone per user, so the
    LAST update per user (max n_events) equals the batch result."""
    if not streaming:
        return events.groupBy(user_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_type = _key_field_type(events, user_col)

    def _update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "sum_value": [total]}
        )

    return events.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=f"{user_col} {key_type}, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_memory(df: DataFrame, name: str, output_mode: str = "complete") -> StreamingQuery:
    """Drive a streaming DataFrame to completion against a memory sink —
    the local smoke harness for stream/batch parity. Stateful
    ``applyInPandasWithState`` operators require ``output_mode='update'``
    (or 'append'); aggregations use the default 'complete'."""
    q = (
        df.writeStream.outputMode(output_mode)
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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "1 hour",
    watermark: str = "1 day",
    streaming: bool = True,
) -> DataFrame:
    """Stream-stream inner join: rows pair when keys match and
    ``right_ts ∈ [left_ts, left_ts + upper]`` — click→purchase attribution
    as a LIVE join rather than the batch as-of/range operators.

    In streaming mode both sides carry watermarks and the join condition
    bounds event time in BOTH directions, which is exactly what lets Spark
    evict buffered state: a left row can be dropped once the right
    watermark passes ``left_ts + upper`` (state is O(in-flight window), not
    O(stream)). Batch twin: the identical condition on static frames —
    tests assert stream == batch on the same input.

    ``left_ts``/``right_ts`` must be distinct column names (rename before
    calling); all other columns must be disjoint apart from ``key``.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    l, r = left, right
    if streaming:
        l = l.withWatermark(left_ts, watermark)
        r = r.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, "inner").drop(r[key])


def _key_field_type(df: DataFrame, col: str) -> str:
    """DDL type string of ``col`` in ``df``, validated to the key types the
    stateful operators support — an unsupported grouping-key type fails here
    with a clear message instead of a schema mismatch inside the state
    store at runtime."""
    dt = df.schema[col].dataType.simpleString()
    if dt not in ("bigint", "int", "smallint", "tinyint", "string"):
        raise ValueError(
            f"unsupported stateful grouping-key type for {col!r}: {dt} "
            "(supported: integral or string)"
        )
    return dt


def stream_funnel_reached(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    stage_col: str = "event_type",
    streaming: bool = True,
) -> DataFrame:
    """LIVE ordered-funnel tracking via ``applyInPandasWithState``: per-user
    state is the array of earliest constraint-satisfying epoch-microsecond
    timestamps per stage (−1 = not reached), updated incrementally as
    micro-batches arrive. Emits ``(user_id, reached, n_seen)`` on every
    batch touching the user — ``n_seen`` is monotone, so the row with the
    per-user max is the latest state.

    Correctness contract: the batch funnel walk
    (``operators.funnel.funnel_reached``) is a LEFT FOLD over the user's
    ts-sorted events; this operator runs the same fold chunked across
    micro-batches, so under in-order-per-user event-time delivery the final
    state is EXACTLY the batch result (parity-tested). An out-of-order
    event older than already-folded ones is applied greedily at arrival and
    may miss a chain the batch walk would find — retroactive repair would
    require retaining raw events per user, the standard streaming-funnel
    trade.

    State is k+1 scalars per user — O(users) store, no event retention;
    per-batch work is one vectorized sort + a walk over that user's batch
    rows only."""
    if len(stages) < 2 or len(set(stages)) != len(stages):
        raise ValueError("need >= 2 distinct stages")
    if not streaming:
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
            funnel_reached,
        )

        return funnel_reached(events, user_col, ts_col, stage_col, stages)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = len(stages)
    idx = {s: j for j, s in enumerate(stages)}
    filtered = events.filter(
        F.col(user_col).isNotNull() & F.col(stage_col).isin(stages)
    ).select(F.col(user_col), F.col(ts_col).alias("__ts"), F.col(stage_col).alias("__st"))
    # Output key field mirrors the INPUT key column (name AND type) — a
    # string-keyed or renamed user column must not hit a hardcoded
    # `user_id long` schema at runtime.
    key_type = _key_field_type(events, user_col)

    def _update(key, pdfs, state: GroupState):
        if state.exists:
            st = list(state.get)
        else:
            st = [-1] * k + [0]
        reached, n_seen = st[:k], st[k]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("__ts", kind="stable")
        n_seen += len(rows)
        for ts_val, stage in zip(rows["__ts"], rows["__st"]):
            j = idx[stage]
            if reached[j] != -1:
                continue
            ts_us = int(ts_val.value // 1000)  # pandas ns -> us
            if j == 0:
                reached[0] = ts_us
            elif reached[j - 1] != -1 and ts_us > reached[j - 1]:
                reached[j] = ts_us
        state.update(tuple(reached + [n_seen]))
        yield pd.DataFrame(
            {user_col: [key[0]], "reached": [reached], "n_seen": [n_seen]}
        )

    return filtered.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=f"{user_col} {key_type}, reached array<long>, n_seen long",
        stateStructType=", ".join(f"r{j} long" for j in range(k)) + ", n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    stage_col: str = "event_type",
    tiebreak: str = "event_id",
    streaming: bool = True,
    raw_pairs: bool = False,
) -> DataFrame:
    """LIVE Markov transition pairs via ``applyInPandasWithState``: per-user
    state is ONE scalar (the last seen stage), and each micro-batch emits
    the (from_stage, to_stage) pair rows its events produce — including the
    pair bridging the previous batch's last event. Downstream aggregation
    (groupBy pair → count / row-normalize) turns the stream into the live
    transition matrix.

    Like ``stream_funnel_reached``, the batch lag construction
    (``operators.funnel.event_transitions``) is a left fold over the
    per-user (ts, tiebreak)-sorted sequence; this operator runs the fold
    chunked, so under in-order-per-user delivery the union of emitted pairs
    EXACTLY equals the batch pairs (parity-tested). State never retains
    events — one string per user.

    SCHEMA NOTE: with ``streaming=True`` the result is the RAW per-user
    pair stream ``(user, from_stage, to_stage)`` — aggregation is the
    caller's job (streaming aggregation semantics depend on the sink's
    output mode). The default batch branch returns the POST-AGGREGATION
    matrix ``(from_stage, to_stage, n, p)`` — NOT a schema-compatible
    drop-in. Pass ``raw_pairs=True`` to get the schema-identical batch twin
    (the same per-user pair rows, computed with one lag window)."""
    if not streaming:
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
            event_transitions,
        )

        if raw_pairs:
            from pyspark.sql import Window

            w = Window.partitionBy(user_col).orderBy(
                F.col(ts_col).asc(), F.col(tiebreak).asc()
            )
            return (
                events.filter(F.col(user_col).isNotNull())
                .select(
                    F.col(user_col),
                    F.lag(F.col(stage_col)).over(w).alias("from_stage"),
                    F.col(stage_col).alias("to_stage"),
                )
                .filter(F.col("from_stage").isNotNull())
            )
        return event_transitions(events, user_col, ts_col, stage_col, tiebreak=tiebreak)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    filtered = events.filter(F.col(user_col).isNotNull()).select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
        F.col(stage_col).alias("__st"),
    )
    key_type = _key_field_type(events, user_col)

    def _update(key, pdfs, state: GroupState):
        last = state.get[0] if state.exists else None
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["__ts", "__tb"], kind="stable"
        )
        frm, to = [], []
        for stage in rows["__st"]:
            if last is not None:
                frm.append(last)
                to.append(stage)
            last = stage
        state.update((last,))
        yield pd.DataFrame(
            {
                user_col: [key[0]] * len(frm),
                "from_stage": frm,
                "to_stage": to,
            }
        )

    return filtered.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=f"{user_col} {key_type}, from_stage string, to_stage string",
        stateStructType="last string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_refresh_daily_summary(
    stream: DataFrame,
    base: "ParquetTable",
    summary: "ParquetTable",
    checkpoint: str,
    ts_col: str = "ts",
    value_col: str = "value",
) -> StreamingQuery:
    """Streaming ingestion driving an incremental materialized view: each
    micro-batch appends to the versioned ``base`` table, then
    ``refresh_daily_summary`` recomputes exactly the days the batch touched
    (change-feed day discovery + zonemap-pruned span scan + keyed MERGE).
    The checkpoint makes replays idempotent at the SUMMARY level too: a
    replayed batch's days recompute from base to the same values, and the
    duplicate base append is the same at-least-once contract as
    ``stream_merge_into`` (dedup upstream or key the base table when
    exactly-once matters).

    The end-to-end lakehouse loop — stream → bronze (versioned, append) →
    incrementally-maintained gold summary — with per-batch work
    O(batch + touched days), never a summary rebuild."""
    from lakehouse_architecture_for_realestatedata_spark.plans.mviews import (
        refresh_daily_summary,
    )

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        since = base.version() if base.exists() and summary.exists() else None
        base.append(batch_df)
        refresh_daily_summary(
            base, summary, ts_col=ts_col, value_col=value_col, since_version=since
        )

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_funnel_levels_within(
    events: DataFrame,
    stages: list[str],
    window_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    stage_col: str = "event_type",
    streaming: bool = True,
) -> DataFrame:
    """LIVE conversion-window funnel (the batch twin is
    ``operators.funnel.funnel_levels_within``): per-user state is the
    max-anchor DP's k chain-anchor timestamps — the DP folds left over the
    (ts, stage-precedence)-ordered event sequence, so running it chunked
    across micro-batches under in-order-per-user delivery yields EXACTLY
    the batch result (parity-tested; the stream_funnel_reached contract).
    Emits ``(user, level, n_seen)`` per touched user per batch; ``n_seen``
    is monotone, so the per-user max row is the latest state.

    State: k int64 micros + one counter per user — O(users), no event
    retention; per-batch work is one vectorized sort + a linear walk over
    the user's batch rows."""
    if len(stages) < 2 or len(set(stages)) != len(stages):
        raise ValueError("need >= 2 distinct stages")
    if not streaming:
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
            funnel_levels_within,
        )

        return funnel_levels_within(
            events, user_col, ts_col, stage_col, stages, window_seconds
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    k = len(stages)
    idx = {s: j for j, s in enumerate(stages)}
    w_us = int(window_seconds) * 1_000_000
    key_type = _key_field_type(events, user_col)
    filtered = events.filter(
        F.col(user_col).isNotNull() & F.col(stage_col).isin(stages)
    ).select(F.col(user_col), F.col(ts_col).alias("__ts"), F.col(stage_col).alias("__st"))

    def _update(key, pdfs, state: GroupState):
        anchors = list(state.get)[:k] if state.exists else [-1] * k
        n_seen = list(state.get)[k] if state.exists else 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        # (ts, stage-precedence) order — same tie rule as the batch walk
        rows = rows.assign(__j=[idx[s] for s in rows["__st"]]).sort_values(
            ["__ts", "__j"], kind="stable"
        )
        n_seen += len(rows)
        for ts_val, j in zip(rows["__ts"], rows["__j"]):
            t = int(ts_val.value // 1000)  # pandas ns -> us
            if j == 0:
                anchors[0] = max(anchors[0], t)
            elif anchors[j - 1] != -1 and t - anchors[j - 1] <= w_us:
                anchors[j] = max(anchors[j], anchors[j - 1])
        state.update(tuple(anchors + [n_seen]))
        level = sum(1 for a in anchors if a != -1)
        yield pd.DataFrame(
            {user_col: [key[0]], "level": [level], "n_seen": [n_seen]}
        )

    return filtered.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=f"{user_col} {key_type}, level int, n_seen long",
        stateStructType=", ".join(f"a{j} long" for j in range(k)) + ", n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessionize_capped(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    max_minutes: int = 120,
    streaming: bool = True,
) -> DataFrame:
    """LIVE capped sessionization — the streaming twin of
    ``operators.funnel.sessionize_capped`` (VERDICT r6 #5): sessions break
    on ≥ ``gap_minutes`` idle AND split into fixed ``max_minutes`` spans
    anchored at the gap-session start.

    The batch operator is a left fold over each user's ts-sorted events
    (lag gap-detect → running session id → span = floor((ts−anchor)/cap)),
    so running the same fold chunked across micro-batches under
    in-order-per-user delivery reproduces the batch rows EXACTLY
    (parity-tested) — the established ``stream_funnel_reached`` contract.

    State per user is 7 int64s (gap anchor, last ts, session/span ids, the
    open span's start/end/count) — O(users) store, no event retention.
    Emits one row per (user, session_id, span) TOUCHED by the batch with
    that span's current ``(session_start_us, session_end_us, n_events)``;
    n_events is monotone per span, so the latest row per key is the final
    session once the span closes. Downstream MERGE on (user, sid, span)
    upserts these into a serving table (``stream_merge_into``)."""
    if not streaming:
        from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
            sessionize_capped,
        )

        out = sessionize_capped(
            events, user_col, ts_col, gap_minutes=gap_minutes, max_minutes=max_minutes
        )
        return out.select(
            F.col(user_col),
            F.unix_micros("session_start").alias("session_start_us"),
            F.unix_micros("session_end").alias("session_end_us"),
            F.col("n_events"),
        )

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes) * 60 * 1_000_000
    cap_us = int(max_minutes) * 60 * 1_000_000
    key_type = _key_field_type(events, user_col)
    filtered = events.filter(F.col(user_col).isNotNull()).select(
        F.col(user_col), F.col(ts_col).alias("__ts")
    )

    def _update(key, pdfs, state: GroupState):
        if state.exists:
            anchor, last, sid, span, sstart, send, n = state.get
        else:
            anchor, last, sid, span, sstart, send, n = (-1, -1, -1, -1, -1, -1, 0)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "__ts", kind="stable"
        )
        touched: dict[tuple[int, int], tuple[int, int, int]] = {}
        for ts_val in rows["__ts"]:
            t = int(ts_val.value // 1000)  # pandas ns -> us
            if anchor == -1 or t - last >= gap_us:
                sid, anchor, span = sid + 1, t, 0
                sstart, send, n = t, t, 1
            else:
                new_span = (t - anchor) // cap_us
                if new_span == span:
                    send, n = t, n + 1
                else:
                    span, sstart, send, n = new_span, t, t, 1
            last = t
            touched[(sid, span)] = (sstart, send, n)
        state.update((anchor, last, sid, span, sstart, send, n))
        out = [
            (key[0], s, sp, st, en, cnt)
            for (s, sp), (st, en, cnt) in sorted(touched.items())
        ]
        yield pd.DataFrame(
            out,
            columns=[
                user_col,
                "session_id",
                "span",
                "session_start_us",
                "session_end_us",
                "n_events",
            ],
        )

    return filtered.groupBy(user_col).applyInPandasWithState(
        _update,
        outputStructType=(
            f"{user_col} {key_type}, session_id long, span long, "
            "session_start_us long, session_end_us long, n_events long"
        ),
        stateStructType=(
            "anchor long, last long, sid long, span long, "
            "sstart long, send long, n long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    capacity: int = 64,
    n_shards: int = 8,
    streaming: bool = True,
) -> DataFrame:
    """LIVE bounded-state heavy hitters — the streaming twin of the batch
    Misra-Gries kernel (``operators.aggregates.heavy_hitters_approx``),
    for key spaces too large to hold exact streaming counts (URLs,
    n-grams): per-batch counts merge into at most ``capacity`` counters
    per shard, pruned with the mergeable-summaries subtraction (Agarwal et
    al. 2012), so state is O(n_shards·capacity) forever.

    Sharding makes the state keyable for ``applyInPandasWithState``: keys
    hash-partition into ``n_shards`` disjoint shards (a key lives in
    EXACTLY one shard), so each shard's MG guarantee applies directly to
    its keys: any key with true count ≥ n_seen_shard/(capacity+1) is still
    present, and its emitted count is a LOWER BOUND short by at most
    n_seen_shard/(capacity+1) — the property pinned in
    tests/test_streaming.py. Emits ONE row per touched shard per batch
    with the full candidate arrays (keys pruned earlier must not linger,
    so consumers take each shard's max-n_seen row, then explode):
    ``(shard, n_seen, keys array<string>, lbs array<long>)``."""
    shard = F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards)).alias(
        "__shard"
    )
    if not streaming:
        # batch twin: exact counts restricted to keys the stream would track
        # is order-dependent; the honest batch analogue is the MG kernel
        from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
            heavy_hitters_approx,
        )

        return heavy_hitters_approx(events, key_col, 1, capacity, slack=1)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    filtered = events.filter(F.col(key_col).isNotNull()).select(
        shard, F.col(key_col).cast("string").alias("__k")
    )

    def _update(key, pdfs, state: GroupState):
        if state.exists:
            keys, counts, n_seen = state.get
            sketch = dict(zip(keys, counts))
        else:
            sketch, n_seen = {}, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        n_seen += len(rows)
        for k, c in rows["__k"].value_counts().items():
            sketch[k] = sketch.get(k, 0) + int(c)
        if len(sketch) > capacity:
            # mergeable-summaries prune: subtract the (capacity+1)-th
            # largest count from every counter, drop the non-positive
            cut = sorted(sketch.values(), reverse=True)[capacity]
            sketch = {k: v - cut for k, v in sketch.items() if v - cut > 0}
        ks = sorted(sketch)
        state.update((ks, [sketch[k] for k in ks], n_seen))
        yield pd.DataFrame(
            {
                "shard": [key[0]],
                "n_seen": [n_seen],
                "keys": [ks],
                "lbs": [[sketch[k] for k in ks]],
            }
        )

    return filtered.groupBy("__shard").applyInPandasWithState(
        _update,
        outputStructType=(
            "shard long, n_seen long, keys array<string>, lbs array<long>"
        ),
        stateStructType="keys array<string>, counts array<long>, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_cms_rollup(
    stream: DataFrame,
    sketch_table: "ParquetTable",
    checkpoint: str,
    key_col: str = "user_id",
    group_col: str = "week",
    depth: int = 4,
    width: int = 256,
) -> StreamingQuery:
    """Streaming maintenance of a mergeable Count-Min sketch table: each
    micro-batch builds its own CMS cells (one partial-aggregated pass over
    the batch) and MERGEs them into the persisted per-group sketch by
    ADDING counters cell-wise — the additivity that makes CMS (like the
    HLL rollups) a streaming-native summary: per-batch work is O(batch +
    touched cells), the table stays depth×width×#groups rows forever, and
    the final sketch equals the batch-built sketch over the full history
    (pinned stream == batch in tests/test_streaming.py).

    At-least-once caveat: counter ADDS are not idempotent, so a replayed
    batch double-counts — same contract as every additive foreachBatch
    sink here; the checkpoint makes replays rare, and the CMS estimate
    stays an upper bound either way (never an undercount)."""
    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import cms_build

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_sketch = cms_build(
            batch_df, key_col, depth=depth, width=width, group_cols=[group_col]
        )
        if not sketch_table.exists():
            sketch_table.overwrite(batch_sketch)
            return
        cur = sketch_table.read()
        merged = (
            cur.unionByName(batch_sketch)
            .groupBy(group_col, "i", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        sketch_table.overwrite(merged)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_qsketch_rollup(
    stream: DataFrame,
    sketch_table: "ParquetTable",
    checkpoint: str,
    value_col: str = "value",
    group_col: str = "week",
    lo: float = 0.0,
    width: float = 4.0,
    nbins: int = 128,
) -> StreamingQuery:
    """Streaming maintenance of the mergeable quantile sketch
    (functions/sketches.py:qsketch_build): each micro-batch bins its own
    values (one partial-aggregated pass) and MERGEs into the persisted
    per-group sketch by ADDING bin counts — the same additive contract as
    stream_cms_rollup, completing the streaming-native sketch family
    (HLL distinct / CMS frequency / quantile distribution). The table
    stays <= nbins x #groups rows forever; the final sketch equals the
    batch-built sketch over the full history (pinned in
    tests/test_streaming.py), so quantile read-outs
    (qsketch_quantiles) off the maintained table match the batch path
    bit-for-bit. Same at-least-once caveat as every additive
    foreachBatch sink here: a replayed batch double-counts; the
    checkpoint makes replays rare."""
    from lakehouse_architecture_for_realestatedata_spark.functions.sketches import qsketch_build

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_sketch = qsketch_build(
            batch_df, value_col, lo=lo, width=width, nbins=nbins, group_cols=[group_col]
        )
        if not sketch_table.exists():
            sketch_table.overwrite(batch_sketch)
            return
        cur = sketch_table.read()
        merged = (
            cur.unionByName(batch_sketch)
            .groupBy(group_col, "bin")
            .agg(F.sum("cnt").alias("cnt"))
        )
        sketch_table.overwrite(merged)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_ivf_upsert(
    stream: DataFrame,
    index_path: str,
    checkpoint: str,
    vec_col: str = "embedding",
) -> StreamingQuery:
    """Streaming IVF index maintenance: each micro-batch of new embedding
    rows is assigned to the index's frozen centroids and appended into the
    cell-partitioned layout (operators/similarity.py:ivf_upsert) — the
    streaming twin of the batch maintenance path, same per-batch O(batch)
    cost, probe path untouched. Appends are idempotence-free like every
    additive sink here (a replayed batch duplicates rows; ivf_knn's
    dropDuplicates on (query, neighbor) tolerates duplicate index rows at
    probe time, so recall is unaffected — row counts are what drift)."""
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import ivf_upsert

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        ivf_upsert(batch_df, index_path, vec_col=vec_col)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_delta_append(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: list[str] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingQuery:
    """Streaming sink into an open-protocol DELTA table (sources/delta_lite):
    foreachBatch + transactional log append — the pure-PySpark analogue of
    Delta's own streaming sink (which is likewise a per-epoch transactional
    append; reference stack: spark-defaults.conf:15-16). Each micro-batch
    commits ONE log version via the put-if-absent claim, so a foreign Delta
    reader tailing the table sees epoch-atomic appends and can time-travel
    per epoch.

    At-least-once on replay: Structured Streaming's checkpoint skips
    completed epochs, but an epoch that crashed AFTER its log commit and
    BEFORE the checkpoint write replays as a duplicate append (Delta's own
    sink closes this with txn app-ids; honest gap, documented — route
    exactly-once needs through ``stream_merge_into``)."""
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_write,
    )

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        out = transform(batch_df) if transform else batch_df
        delta_write(out, path, mode="append", partition_by=partition_by)

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
