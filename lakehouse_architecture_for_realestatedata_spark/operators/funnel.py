"""Ordered-funnel conversion analysis: how many users progress through an
ordered sequence of event stages (view → click → purchase), where each stage
must occur STRICTLY AFTER the user's earliest qualifying occurrence of the
previous stage.

Single-scan design: ONE groupBy on the user key collects each user's
(ts, stage) events into a bounded per-user array, then a higher-order
``aggregate`` expression walks the time-sorted array once, greedily recording
the earliest timestamp at which each stage's ordering constraint is satisfied.
Greedy-earliest is exactly the sequential-min semantics (taking the minimal
t_{i-1} can only enlarge the set of candidate t_i), so the walk reproduces the
classic K-join formulation — `t_i = min ts of stage_i events with
ts > t_{i-1}` — in one shuffle instead of K scans + K joins.

Everything is built-in expressions (sort_array / aggregate / exists): no
Python UDF, no per-user Python state. Per-user state is bounded by that
user's event count for the funnel's stages only (pre-filtered), the standard
assumption for user-grain funnels at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_reached(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
) -> DataFrame:
    """Per-user funnel walk: one row per user who reached stage 0, with
    ``reached`` = array of the earliest constraint-satisfying timestamp per
    stage (NULL where the user never got that far). Users with NULL
    ``user_col`` are excluded (no meaningful funnel identity)."""
    if len(stages) < 2 or len(set(stages)) != len(stages):
        raise ValueError("need >= 2 distinct stages")
    k = len(stages)
    ev = (
        events.filter(F.col(user_col).isNotNull() & F.col(stage_col).isin(stages))
        .select(
            F.col(user_col),
            F.struct(F.col(ts_col).alias("ts"), F.col(stage_col).alias("stage")).alias("__e"),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("__e")).alias("__evs"))
    )

    def step(acc: Column, e: Column) -> Column:
        # Unrolled per-stage update (k is a small literal): stage j fires the
        # first time its event appears with ts strictly after acc[j-1].
        slots = []
        for j, stage in enumerate(stages):
            fired = (e["stage"] == stage) & acc[j].isNull()
            if j > 0:
                fired = fired & acc[j - 1].isNotNull() & (e["ts"] > acc[j - 1])
            slots.append(F.when(acc[j].isNotNull(), acc[j]).when(fired, e["ts"]))
        return F.array(*slots)

    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])
    return ev.select(
        user_col, F.aggregate(F.col("__evs"), init, step).alias("reached")
    ).filter(F.col("reached")[0].isNotNull())


def funnel_conversion(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
) -> DataFrame:
    """Funnel summary: per stage, the count of users whose earliest-qualifying
    event chain reaches it, plus conversion rate vs stage 0. Output
    ``(stage_idx, stage, users, conversion)``, one row per stage in order.

    Scale shape: the per-user walk is ONE hash exchange (``funnel_reached``);
    the stage counts are a single global aggregate of k boolean casts over
    the (already tiny) per-user result, unpivoted with ``stack`` — metadata-
    scale, like AQE statistics. ``conversion`` is one bigint→double divide,
    bit-deterministic in any engine."""
    reached = funnel_reached(events, user_col, ts_col, stage_col, stages)
    counts = reached.agg(
        *[
            F.coalesce(
                F.sum(F.col("reached")[j].isNotNull().cast("bigint")), F.lit(0).cast("bigint")
            ).alias(f"__s{j}")
            for j in range(len(stages))
        ]
    )
    stack_expr = ", ".join(f"{j}L, '{s}', __s{j}" for j, s in enumerate(stages))
    # stack() unpivots the one-row count frame; __s0 rides along as the
    # conversion base, so no window / second pass is needed.
    return counts.selectExpr(
        "__s0 as __base", f"stack({len(stages)}, {stack_expr}) as (stage_idx, stage, users)"
    ).select(
        "stage_idx",
        "stage",
        "users",
        F.when(F.col("__base") > 0, F.col("users").cast("double") / F.col("__base")).alias(
            "conversion"
        ),
    )


def event_transitions(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for each ordered pair of consecutive events within a user, count the
    (from_stage → to_stage) transition and its probability among all
    transitions leaving ``from_stage``. Output ``(from_stage, to_stage, n,
    p)``; users with a single event contribute nothing, NULL users are
    excluded.

    ``tiebreak`` (e.g. the event id) makes the per-user ordering total —
    REQUIRED for a deterministic matrix when timestamps can collide.

    Scale shape: one user-keyed exchange for the lag window, then a groupBy
    on the (from, to) pair — whose cardinality is #stages², metadata-scale —
    and a stage-keyed window for the row-normalization, also metadata-scale.
    The only full-data shuffle is the first one. ``p`` is one bigint/bigint
    double divide, bit-deterministic."""
    from pyspark.sql import Window

    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.filter(F.col(user_col).isNotNull())
        .select(
            F.col(user_col),
            F.lag(F.col(stage_col)).over(w).alias("from_stage"),
            F.col(stage_col).alias("to_stage"),
        )
        .filter(F.col("from_stage").isNotNull())
    )
    counts = pairs.groupBy("from_stage", "to_stage").agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy("from_stage")
    return counts.withColumn(
        "p", F.col("n").cast("double") / F.sum("n").over(total)
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity period
    (the cohort), counted at each later period they returned. Output
    ``(cohort, period_offset, users)`` — offset 0 is the cohort's own period
    (``users`` there = cohort size), offset k counts members active k
    periods later. NULL users excluded. (Named ``period_offset`` because
    bare OFFSET is a reserved clause keyword in ANSI engines.)

    Scale shape: ONE user-keyed exchange computes each user's cohort as a
    window min over truncated activity periods; the (user, cohort, period)
    distinct and the final (cohort, offset) count reuse that partitioning
    (strictly coarser keys under AQE) — no join anywhere, unlike the classic
    first-activity-table + self-join spelling. Offsets are integer
    date_diff arithmetic on truncated dates, identical in any engine."""
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day, week, or month")
    per = F.date_trunc(period, F.col(ts_col)).cast("date")
    w = Window.partitionBy(user_col)
    act = (
        events.filter(F.col(user_col).isNotNull())
        .select(F.col(user_col), per.alias("__per"))
        .withColumn("cohort", F.min("__per").over(w))
        .distinct()
    )
    if period == "month":
        offset = (F.month("__per") - F.month("cohort")) + (
            F.year("__per") - F.year("cohort")
        ) * 12
    else:
        days = 7 if period == "week" else 1
        offset = F.floor(F.datediff(F.col("__per"), F.col("cohort")) / days)
    return (
        act.select("cohort", offset.cast("int").alias("period_offset"), F.col(user_col))
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(F.col(user_col)).alias("users"))
    )


def session_paths(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    gap_minutes: int = 30,
    top_k: int = 20,
    tiebreak: str | None = None,
) -> DataFrame:
    """Most common session journeys: gap-based sessionization (a session
    breaks when ≥ ``gap_minutes`` elapse between consecutive events), each
    session rendered as its ordered ``stage`` path string (``a>b>c``), and
    the ``top_k`` most frequent paths returned as ``(path, n)`` — ties
    broken by path text so the cut is total.

    ``tiebreak`` (e.g. the event id) is REQUIRED for deterministic paths
    when timestamps can collide within a session.

    Scale shape: ONE user-keyed exchange carries the lag/cumsum session
    construction AND the per-session path groupBy (strictly finer key,
    partitioning reused); the path-frequency groupBy runs over session
    counts (≪ events) and the final cut is a TakeOrdered top-k, never a
    global sort."""
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col(ts_col) - prev >= F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        1,
    ).otherwise(0)
    sid = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    sort_cols = [F.col(ts_col), *(
        [F.col(tiebreak)] if tiebreak else []
    ), F.col(stage_col)]
    paths = (
        events.filter(F.col(user_col).isNotNull())
        .withColumn("__sid", sid)
        .groupBy(user_col, "__sid")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(*sort_cols))),
                    lambda s: s[stage_col],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(top_k)
    )


def funnel_latency(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
) -> DataFrame:
    """Per-step conversion latency over the earliest-qualifying funnel
    chains: for each consecutive stage pair, the user count plus median and
    mean microseconds between the two stages' qualifying events. Output
    ``(step, n_users, median_us, avg_us)``, one row per stage pair (absent
    when no user converted that step).

    Latencies are integer microsecond diffs of the ``funnel_reached``
    timestamps; the mean goes through an exact decimal sum and the median
    is the exact linear-interpolation percentile — the standard
    cross-engine-deterministic pair. Scale shape: the funnel walk's ONE
    user-keyed exchange, then a k−1-row-per-user projection aggregated by
    the (tiny) step key."""
    reached = funnel_reached(events, user_col, ts_col, stage_col, stages)
    steps = []
    for j in range(1, len(stages)):
        steps.append(
            reached.filter(F.col("reached")[j].isNotNull()).select(
                F.lit(f"{stages[j - 1]}>{stages[j]}").alias("step"),
                (
                    F.unix_micros(F.col("reached")[j])
                    - F.unix_micros(F.col("reached")[j - 1])
                ).alias("__us"),
            )
        )
    lat = steps[0]
    for s in steps[1:]:
        lat = lat.unionByName(s)
    return lat.groupBy("step").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.percentile(F.col("__us"), F.lit(0.5)).alias("median_us"),
        (F.sum(F.col("__us").cast("decimal(30,0)")).cast("double") / F.count(F.lit(1))).alias(
            "avg_us"
        ),
    )


def session_cooccurrence(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    gap_minutes: int = 30,
    min_n: int = 1,
) -> DataFrame:
    """Market-basket co-occurrence over sessions: for every unordered pair
    of DISTINCT stages appearing in the same gap-based session, the number
    of sessions containing both. Output ``(a, b, n)`` with ``a < b``
    lexicographically, filtered to ``n >= min_n``.

    Pairs expand array-side from each session's sorted distinct item set
    (the LSH-combos construction — nested transform over a MATERIALIZED
    aggregate column, so nothing re-evaluates per element) — never a
    self-join of the session-item table. Sessions have bounded distinct
    stages, so the expansion is |items|²/2 per session, tiny.

    Scale shape: the sessionization + item-set groupBy share ONE user-keyed
    exchange (same construction as ``session_paths``); the pair count
    groupBy runs over pair-vocabulary cardinality."""
    order = [F.col(ts_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col(ts_col) - prev >= F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        1,
    ).otherwise(0)
    sid = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    sessions = (
        events.filter(F.col(user_col).isNotNull())
        .withColumn("__sid", sid)
        .groupBy(user_col, "__sid")
        .agg(F.array_sort(F.collect_set(F.col(stage_col))).alias("__items"))
    )
    items = F.col("__items")
    n = F.size(items)
    combos = F.when(
        n >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.slice(items, i + 1, n - i),
                    lambda j: F.struct(F.element_at(items, i).alias("a"), j.alias("b")),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    return (
        sessions.select(F.explode(combos).alias("__p"))
        .select(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_n)
    )


def rolling_active_users(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    window_days: int = 7,
) -> DataFrame:
    """Engagement time series: per calendar day, the distinct users active
    that day (DAU), the distinct users active in the trailing
    ``window_days`` window ending that day (WAU for 7), and the stickiness
    ratio DAU/WAU. Output ``(day, dau, wau, stickiness)``; only days with
    ≥ 1 active user appear (the window count covers every day the trailing
    window touches a real activity day).

    Rolling COUNT DISTINCT is not window-decomposable (no subtraction for
    distinct state), so the naive per-day re-scan is O(days·window). The
    scalable spelling: reduce to the distinct (user, day) activity grid —
    corpus-sized shuffle #1 — then EXPLODE each activity day onto the
    ``window_days`` target days it contributes to (output ∝ grid ×
    window) and count distinct users per target day — shuffle #2 over the
    exploded grid. Work is linear in activity-days × window, never
    days × corpus. DAU rides the same grid.

    NULL users excluded. ``stickiness`` is one bigint→double divide.
    """
    if window_days < 1:
        raise ValueError("window_days must be >= 1")
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    grid = (
        events.filter(F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("__u"), day.alias("__d"))
        .distinct()
    )
    dau = grid.groupBy(F.col("__d").alias("day")).agg(
        F.count_distinct("__u").alias("dau")
    )
    targets = grid.select(
        "__u",
        F.explode(
            F.sequence(F.col("__d"), F.date_add(F.col("__d"), window_days - 1))
        ).alias("day"),
    )
    wau = targets.groupBy("day").agg(F.count_distinct("__u").alias("wau"))
    return (
        wau.join(dau, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("dau"), F.lit(0)).alias("dau"),
            "wau",
            (F.coalesce(F.col("dau"), F.lit(0)).cast("double") / F.col("wau")).alias(
                "stickiness"
            ),
        )
    )


def association_rules(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    gap_minutes: int = 30,
    min_pair_sessions: int = 1,
    materialize: str = "persist",
) -> DataFrame:
    """Session-basket association rules: for each ordered stage pair
    (a → b) co-occurring in ≥ ``min_pair_sessions`` sessions, emit
    ``support``   = P(a ∧ b)  (pair sessions / all sessions),
    ``confidence``= P(b | a)  (pair sessions / sessions containing a),
    ``lift``      = P(a ∧ b) / (P(a)·P(b)) — >1 means a and b attract.
    Both rule directions are emitted (confidence is asymmetric). Output
    ``(antecedent, consequent, n_sessions, support, confidence, lift)``.

    All inputs are exact session counts; the three ratios are fixed-order
    IEEE divides (lift = support / (pa·pb) with pa, pb each one divide) —
    engine-identical.

    Scale shape: sessionization + item-set assembly share ONE user-keyed
    exchange (the ``session_cooccurrence`` construction); item and pair
    counts are vocabulary-scale groupBys; singles and the session total
    broadcast onto the pair frame. Never a self-join of the corpus.

    The session frame (one slim row per session) feeds FIVE consumers
    (total, singles ×2 via the rule directions, pairs ×2) — diamond
    lineage that ``collect_set``'s nondeterminism marker bars
    ReuseExchange from deduplicating, so it is materialized once:
    ``materialize='persist'`` (default, plan-keyed cache — clear with
    ``spark.catalog.clearCache()`` in sessions sweeping many corpora) or
    ``'checkpoint'`` (eager lineage truncation, ContextCleaner-freed,
    no cross-run reuse) — the ``minhash_lsh`` policy applied here."""
    order = [F.col(ts_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col(ts_col) - prev >= F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        1,
    ).otherwise(0)
    sid = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    sessions = (
        events.filter(F.col(user_col).isNotNull())
        .withColumn("__sid", sid)
        .groupBy(user_col, "__sid")
        .agg(F.array_sort(F.collect_set(F.col(stage_col))).alias("__items"))
    )
    if materialize == "persist":
        sessions = sessions.persist()
    elif materialize == "checkpoint":
        from lakehouse_architecture_for_realestatedata_spark.operators.graph import (
            truncate_lineage,
        )

        sessions = truncate_lineage(sessions)
    else:
        raise ValueError(
            f"materialize must be 'persist' or 'checkpoint', got {materialize!r}"
        )
    total = sessions.agg(F.count(F.lit(1)).alias("__total"))
    singles = (
        sessions.select(F.explode("__items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("__n1"))
    )
    items = F.col("__items")
    n = F.size(items)
    combos = F.when(
        n >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.slice(items, i + 1, n - i),
                    lambda j: F.struct(F.element_at(items, i).alias("a"), j.alias("b")),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    pairs = (
        sessions.select(F.explode(combos).alias("__p"))
        .select(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .filter(F.col("n_sessions") >= min_pair_sessions)
    )
    both_dirs = pairs.select(
        F.col("a").alias("antecedent"), F.col("b").alias("consequent"), "n_sessions"
    ).unionByName(
        pairs.select(
            F.col("b").alias("antecedent"), F.col("a").alias("consequent"), "n_sessions"
        )
    )
    sa = singles.select(F.col("item").alias("antecedent"), F.col("__n1").alias("__na"))
    sb = singles.select(F.col("item").alias("consequent"), F.col("__n1").alias("__nb"))
    t = F.col("__total")
    return (
        both_dirs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .crossJoin(F.broadcast(total))
        .select(
            "antecedent",
            "consequent",
            "n_sessions",
            (F.col("n_sessions").cast("double") / t).alias("support"),
            (F.col("n_sessions").cast("double") / F.col("__na")).alias("confidence"),
            (
                (F.col("n_sessions").cast("double") / t)
                / ((F.col("__na").cast("double") / t) * (F.col("__nb").cast("double") / t))
            ).alias("lift"),
        )
    )


def funnel_levels_within(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    stage_col: str,
    stages: list[str],
    window_seconds: int,
) -> DataFrame:
    """Conversion-window funnel (the ClickHouse ``windowFunnel`` shape): per
    user, the deepest stage reachable by a chain whose EVERY event falls
    within ``window_seconds`` of the chain's stage-0 anchor. Output
    ``(user, level)`` (1..k), one row per user with at least one stage-0
    event.

    Greedy-earliest (``funnel_reached``) is WRONG under a window: the
    earliest anchor can expire while a later anchor still completes. The
    walk instead runs the max-anchor DP — process events in (ts,
    stage-precedence) order, track per level the LATEST viable chain
    anchor, and extend level j when the event lies within the window of
    level j−1's anchor. Keeping the maximum anchor dominates every other
    choice (a later anchor can only extend the remaining window), so the
    DP finds a chain iff one exists.

    Equal timestamps resolve by stage precedence (stage j may complete at
    the same instant as stage j−1) — the non-strict semantics, matching
    the SQL oracle's ``>=`` joins; ``funnel_reached`` keeps its separate
    strictly-after contract.

    Scale shape: identical to ``funnel_reached`` — one hash exchange, a
    bounded per-user array, one higher-order fold; the window test adds
    two ``unix_micros`` ops per event-stage pair."""
    if len(stages) < 2 or len(set(stages)) != len(stages):
        raise ValueError("need >= 2 distinct stages")
    k = len(stages)
    w_us = int(window_seconds) * 1_000_000
    idx = F.lit(None).cast("int")
    for j in reversed(range(k)):
        idx = F.when(F.col(stage_col) == stages[j], j).otherwise(idx)
    ev = (
        events.filter(F.col(user_col).isNotNull() & F.col(stage_col).isin(stages))
        .select(
            F.col(user_col),
            F.struct(F.col(ts_col).alias("ts"), idx.alias("idx")).alias("__e"),
        )
        .groupBy(user_col)
        .agg(F.sort_array(F.collect_list("__e")).alias("__evs"))
    )

    def step(acc: Column, e: Column) -> Column:
        slots = []
        for j in range(k):
            if j == 0:
                fired = e["idx"] == 0
                cand = e["ts"]
            else:
                fired = (
                    (e["idx"] == j)
                    & acc[j - 1].isNotNull()
                    & (
                        F.unix_micros(e["ts"]) - F.unix_micros(acc[j - 1])
                        <= F.lit(w_us)
                    )
                )
                cand = acc[j - 1]  # the chain's anchor propagates
            # greatest() skips NULLs, so this is "max anchor so far"
            slots.append(F.when(fired, F.greatest(acc[j], cand)).otherwise(acc[j]))
        return F.array(*slots)

    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(k)])
    anchors = F.aggregate(F.col("__evs"), init, step)
    level = F.aggregate(
        F.transform(anchors, lambda a: a.isNotNull().cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return ev.select(F.col(user_col), level.alias("level")).filter(F.col("level") >= 1)


def sessionize_capped(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    max_minutes: int = 120,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap sessionization with a MAX-DURATION cap: sessions break on
    ≥ ``gap_minutes`` of inactivity AND split into ``max_minutes``-sized
    spans anchored at the gap-session's start — the guard against
    never-idle actors (bots, kiosk devices, instrumentation loops) whose
    gap-only sessions grow unbounded. Output one row per capped session:
    ``(user, session_start, session_end, n_events)``.

    Cap semantics: fixed ``max_minutes`` windows measured from the
    gap-session anchor (span k covers [start + k·cap, start + (k+1)·cap)) —
    deterministic and closed-form, unlike "restart the clock at the split
    event", which needs a sequential rescan. NULL users are excluded;
    ``tiebreak`` makes the ordering total under timestamp collisions.

    Scale shape: ONE user-keyed exchange carries everything — the lag
    gap-detect, the running session id, the per-session anchor min, and
    the final (user, sid, span) groupBy are all windows/aggregates over
    strictly finer keys, so Catalyst reuses the single partitioning."""
    order = [F.col(ts_col).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull()
        | (F.col(ts_col) - prev >= F.expr(f"INTERVAL {int(gap_minutes)} MINUTES")),
        1,
    ).otherwise(0)
    sid = F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    base = events.filter(F.col(user_col).isNotNull()).withColumn("__sid", sid)
    anchor = F.min(F.col(ts_col)).over(Window.partitionBy(user_col, "__sid"))
    cap_us = int(max_minutes) * 60 * 1_000_000
    span = F.floor(
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(anchor)).cast("double")
        / F.lit(float(cap_us))
    ).cast("bigint")
    return (
        base.withColumn("__span", span)
        .groupBy(user_col, "__sid", "__span")
        .agg(
            F.min(F.col(ts_col)).alias("session_start"),
            F.max(F.col(ts_col)).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("__sid", "__span")
    )
