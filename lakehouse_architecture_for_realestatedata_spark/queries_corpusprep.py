"""Corpus-preparation queries: fixed-size document chunking, corpus-frequency
boilerplate line removal, vocabulary construction / document encoding /
bigram LM counts (the tokenize→vocab→encode loop), per-row-probability
weighted sampling, and the behavior-analytics family (ordered funnel +
step latency, Markov transition matrix, weekly retention cohorts, session
journey paths, session co-occurrence pairs) plus a correlated-subquery
SQL-front-door showcase — the carve-up / scrub / tokenize / curate /
analyze steps of a training-data pipeline.

Registered AFTER the SURVEY-§2 modules (see ``queries.registry``) so they
never displace a §2 query from the driver's bounded correctness window; their
hard correctness signal is the pytest contract test plus
tools/check_oracle.py, like every other deferred query.

Note on fixture power: the synthetic documents table has no cross-document
repeated lines, so ``remove_boilerplate`` exercises the split→reassemble
identity path at driver scale (an exact round-trip check in itself); the
removal path is pinned by tests/test_textprep.py on a crafted corpus with
planted boilerplate. Likewise the dense synthetic events fully convert the
view→click→purchase funnel; drop-off ordering is pinned by
tests/test_funnel.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
    event_transitions,
    funnel_conversion,
)
from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
    chunk_fixed,
    remove_boilerplate_lines,
)
from lakehouse_architecture_for_realestatedata_spark.queries import _events, _t, register


@register(
    "chunk_documents_fixed",
    """
    SELECT doc_id, idx AS chunk_id,
           substr(text, (idx * 150 + 1)::int, 200) AS chunk_text,
           length(substr(text, (idx * 150 + 1)::int, 200)) AS n_chars
    FROM documents,
         LATERAL unnest(generate_series(
             0, greatest(1, ceil((length(text) - 50) / 150.0))::bigint - 1)) AS t(idx)
    WHERE length(text) > 0
    """,
    doc="Fixed-size character chunking, size=200 overlap=50 "
    "(operators/textprep.py:chunk_fixed): ZERO-shuffle sequence+explode+"
    "substring, all codegen — output rows inherit input partitioning, "
    "embarrassingly parallel at 100 TB. Chunk-count arithmetic is one IEEE "
    "divide+ceil, identical in both engines.",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_fixed(docs, "doc_id", "text", size=200, overlap=50)


@register(
    "remove_boilerplate",
    """
    WITH p AS (SELECT doc_id, string_split(text, chr(10)) AS parts FROM documents),
    l AS (SELECT doc_id, idx, parts[idx] AS line
          FROM p, LATERAL unnest(generate_series(1, greatest(len(parts), 0))) AS t(idx)),
    f AS (SELECT trim(line) AS nline
          FROM l WHERE trim(line) <> ''
          GROUP BY trim(line) HAVING count(DISTINCT doc_id) >= 3),
    k AS (SELECT doc_id, idx, line FROM l
          WHERE trim(line) = '' OR trim(line) NOT IN (SELECT nline FROM f))
    SELECT d.doc_id,
           coalesce(string_agg(k.line, chr(10) ORDER BY k.idx), '') AS clean_text
    FROM documents d LEFT JOIN k USING (doc_id)
    GROUP BY d.doc_id
    """,
    doc="Corpus-frequency boilerplate strip, min_docs=3 "
    "(operators/textprep.py:remove_boilerplate_lines): narrow line explode, "
    "ONE line-keyed frequency shuffle filtered to the (tiny) boilerplate "
    "set, BROADCAST anti-join removal, one doc-keyed reassembly groupBy "
    "with array_sort-by-ordinal. Fixture has no repeated lines, so this row "
    "pins the exact split→reassemble round-trip; the removal path is pinned "
    "by tests/test_textprep.py on planted boilerplate.",
)
def q_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return remove_boilerplate_lines(docs, "doc_id", "text", min_docs=3)


@register(
    "funnel_view_click_purchase",
    """
    WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s0 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY e.user_id),
    c AS (SELECT (SELECT count(*) FROM s0) AS u0,
                 (SELECT count(*) FROM s1) AS u1,
                 (SELECT count(*) FROM s2) AS u2)
    SELECT cast(0 AS bigint) AS stage_idx, 'view' AS stage, u0 AS users,
           CASE WHEN u0 > 0 THEN u0::double / u0 END AS conversion FROM c
    UNION ALL
    SELECT cast(1 AS bigint), 'click', u1,
           CASE WHEN u0 > 0 THEN u1::double / u0 END FROM c
    UNION ALL
    SELECT cast(2 AS bigint), 'purchase', u2,
           CASE WHEN u0 > 0 THEN u2::double / u0 END FROM c
    """,
    doc="Ordered funnel with strictly-after semantics "
    "(operators/funnel.py:funnel_conversion): ONE user-keyed shuffle — the "
    "sorted per-user event array is walked by a higher-order aggregate "
    "expression (greedy-earliest ≡ the oracle's K-join sequential-min), "
    "then a metadata-scale stack unpivot. The oracle spells the classic "
    "K-scan join chain; the Spark plan does it in a single pass.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    return funnel_conversion(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


@register(
    "event_transition_matrix",
    """
    WITH pr AS (
      SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS from_stage,
             event_type AS to_stage
      FROM events WHERE user_id IS NOT NULL)
    SELECT from_stage, to_stage, count(*) AS n,
           count(*)::double / sum(count(*)) OVER (PARTITION BY from_stage) AS p
    FROM pr WHERE from_stage IS NOT NULL
    GROUP BY from_stage, to_stage
    """,
    doc="First-order Markov transition matrix over per-user event sequences "
    "(operators/funnel.py:event_transitions): ONE full-data exchange (the "
    "user-keyed lag window, event_id tiebreak for total order); the pair "
    "groupBy and row-normalization window are #stages²-cardinality — "
    "metadata-scale.",
)
def q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    return event_transitions(ev, "user_id", "ts", "event_type", tiebreak="event_id")


@register(
    "weighted_doc_sample",
    """
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE n_chars / 600.0 > 0
      AND substr(md5('wsample' || cast(doc_id as varchar)), 1, 8) <
          CASE WHEN n_chars / 600.0 >= 1.0 THEN 'g'
               ELSE lpad(lower(to_hex(
                   floor((n_chars / 600.0) * 4294967296.0)::bigint)), 8, '0')
          END
    """,
    doc="Per-row-probability Bernoulli sample — keep each doc with "
    "probability n_chars/600 (length-proportional curation weight) decided "
    "by its md5-hashed id (operators/sampling.py:sample_weighted). The "
    "per-row threshold stays in the proven hex-string domain: floor(w·16^8) "
    "zero-padded to 8 hex chars — exact in both engines. Narrow codegen "
    "filter, zero shuffle, zero UDF.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import sample_weighted

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    return sample_weighted(docs, "doc_id", F.col("n_chars") / 600.0, salt="wsample")


@register(
    "vocab_top_tokens",
    r"""
    WITH c AS (
      SELECT token, count(*) AS n
      FROM (SELECT unnest(list_filter(
                string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                x -> x <> '')) AS token
            FROM documents)
      GROUP BY token HAVING count(*) >= 5)
    SELECT token, n, row_number() OVER (ORDER BY n DESC, token) - 1 AS id
    FROM c
    """,
    doc="Corpus vocabulary with contiguous frequency-ranked ids, min_count=5 "
    "(operators/textprep.py:build_vocab): one token-keyed partial-agg "
    "groupBy is the only full-data shuffle; the global (n desc, token) rank "
    "runs as a TWO-PHASE prefix rank over exact integer-log2 count buckets "
    "— never a single-partition window (the oracle's spelling, same "
    "numbers, different physics). Ties broken by token, so ids are total.",
)
def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.textprep import build_vocab

    docs = _t(spark, sf_dir, "documents").select("text")
    return build_vocab(docs, "text", min_count=5)


@register(
    "encode_documents_vocab",
    r"""
    WITH c AS (
      SELECT token, count(*) AS n
      FROM (SELECT unnest(list_filter(
                string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                x -> x <> '')) AS token
            FROM documents)
      GROUP BY token HAVING count(*) >= 5),
    v AS (SELECT token, row_number() OVER (ORDER BY n DESC, token) - 1 AS id FROM c),
    t AS (SELECT doc_id, idx - 1 AS pos, toks[idx] AS tok
          FROM (SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                                   x -> x <> '') AS toks
                FROM documents),
               LATERAL unnest(generate_series(1, greatest(len(toks), 0))) AS u(idx)),
    j AS (SELECT t.doc_id, t.pos,
                 coalesce(v.id, -1)::int AS vid,
                 (v.id IS NULL)::int AS oov
          FROM t LEFT JOIN v ON t.tok = v.token)
    SELECT d.doc_id,
           coalesce(array_to_string(list(j.vid ORDER BY j.pos)
                                    FILTER (WHERE j.pos IS NOT NULL), ','),
                    '') AS ids,
           count(j.pos) AS n_tokens,
           coalesce(sum(j.oov), 0)::bigint AS n_oov
    FROM documents d LEFT JOIN j USING (doc_id)
    GROUP BY d.doc_id
    """,
    doc="Vocabulary encoding of the token stream (operators/textprep.py:"
    "encode_documents over build_vocab, min_count=5, oov_id=-1): narrow "
    "posexplode, BROADCAST left join on the token (vocab ≤ a few M rows), "
    "ONE doc-keyed reassembly groupBy with ordinal-sorted collect_list + "
    "sentinel row (no doc-spine join) — model-ready token-id sequences "
    "with aligned OOV markers. The id sequence serializes as a "
    "comma-joined string (the inverted_index_postings convention) so the "
    "value hash is engine-neutral and the driver's scalar canonicalizer "
    "accepts it — round 7's array<int> spelling errored at the gate.",
)
def q_encode_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
        build_vocab,
        encode_documents,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = build_vocab(docs, "text", min_count=5)
    enc = encode_documents(docs, vocab, "doc_id", "text", oov_id=-1)
    return enc.withColumn(
        "ids",
        F.array_join(F.transform("ids", lambda i: i.cast("string")), ","),
    )


@register(
    "token_bigram_lm",
    r"""
    WITH toks AS (SELECT list_filter(
                      string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                      x -> x <> '') AS t
                  FROM documents),
    b AS (SELECT t[idx] AS w1, t[idx + 1] AS w2
          FROM toks, LATERAL unnest(generate_series(1, greatest(len(t) - 1, 0))) AS u(idx)
          WHERE len(t) >= 2),
    c AS (SELECT w1, w2, count(*) AS n FROM b GROUP BY w1, w2)
    SELECT w1, w2, n, n::double / sum(n) OVER (PARTITION BY w1) AS p
    FROM c QUALIFY n >= 3
    """,
    doc="Bigram LM counts with conditional probabilities, min_count=3 "
    "(operators/textprep.py:token_bigram_counts): adjacent pairs built "
    "array-side and exploded — no self-join; ONE full-data shuffle (the "
    "pair groupBy), then a bigram-vocab-scale w1-normalization window. "
    "Probabilities computed BEFORE the count filter so denominators are "
    "the true continuation mass.",
)
def q_token_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
        token_bigram_counts,
    )

    docs = _t(spark, sf_dir, "documents").select("text")
    return token_bigram_counts(docs, "text", min_count=3)


@register(
    "weekly_retention_cohorts",
    """
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::date AS per
      FROM events WHERE user_id IS NOT NULL),
    c AS (SELECT user_id, per,
                 min(per) OVER (PARTITION BY user_id) AS cohort
          FROM act)
    SELECT cohort, (date_diff('day', cohort, per) // 7)::int AS period_offset,
           count(DISTINCT user_id) AS users
    FROM c GROUP BY cohort, period_offset
    """,
    doc="Weekly cohort retention matrix "
    "(operators/funnel.py:retention_cohorts): ONE user-keyed exchange — "
    "cohort is a window min over truncated activity weeks, and the "
    "(user, cohort, week) distinct plus the (cohort, offset) count reuse "
    "that partitioning — no first-activity self-join. Offsets are integer "
    "day-diff arithmetic on Monday-truncated dates, identical in both "
    "engines (session TZ pinned UTC).",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        retention_cohorts,
    )

    ev = _events(spark, sf_dir).select("user_id", "ts")
    return retention_cohorts(ev, "user_id", "ts", period="week")


@register(
    "top_session_paths",
    """
    WITH e AS (SELECT user_id, ts, event_id, event_type FROM events
               WHERE user_id IS NOT NULL),
    f AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                         THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM f),
    p AS (SELECT user_id, sid,
                 string_agg(event_type, '>' ORDER BY ts, event_id) AS path
          FROM s GROUP BY user_id, sid)
    SELECT path, count(*) AS n
    FROM p GROUP BY path
    ORDER BY n DESC, path LIMIT 20
    """,
    doc="Top-20 session journey paths, 30-min gap sessions "
    "(operators/funnel.py:session_paths): ONE user-keyed exchange carries "
    "lag/cumsum sessionization AND the per-session path assembly "
    "(finer-key groupBy reuses the partitioning); path frequencies run "
    "over sessions (<< events) and the cut is TakeOrdered. Deterministic "
    "via the event_id tiebreak and path-text tie-break on the cut.",
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import session_paths

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    return session_paths(
        ev, "user_id", "ts", "event_type", gap_minutes=30, top_k=20, tiebreak="event_id"
    )


@register(
    "funnel_step_latency",
    """
    WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
                WHERE event_type = 'view' AND user_id IS NOT NULL GROUP BY user_id),
    s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s0 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY e.user_id),
    d AS (
      SELECT 'view>click' AS step, epoch_us(s1.t) - epoch_us(s0.t) AS us
      FROM s1 JOIN s0 USING (user_id)
      UNION ALL
      SELECT 'click>purchase', epoch_us(s2.t) - epoch_us(s1.t)
      FROM s2 JOIN s1 USING (user_id))
    SELECT step, count(*) AS n_users,
           quantile_cont(us, 0.5) AS median_us,
           cast(sum(cast(us AS decimal(30,0))) AS double) / count(*) AS avg_us
    FROM d GROUP BY step
    """,
    doc="Median/mean conversion latency per funnel step "
    "(operators/funnel.py:funnel_latency): microsecond diffs of the "
    "earliest-qualifying chain timestamps (greedy walk ≡ the oracle's "
    "K-join chain), exact decimal mean + exact interpolated median — the "
    "deterministic pair. One user-keyed exchange + a step-keyed aggregate "
    "over k−1 rows per converted user.",
)
def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import funnel_latency

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    return funnel_latency(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


@register(
    "session_cooccurrence_pairs",
    """
    WITH e AS (SELECT user_id, ts, event_type FROM events WHERE user_id IS NOT NULL),
    f AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                         THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM f),
    p AS (SELECT user_id, sid,
                 list_sort(list_distinct(list(event_type))) AS items
          FROM s GROUP BY user_id, sid),
    pr AS (SELECT items[i] AS a, items[j] AS b
           FROM p,
                LATERAL unnest(generate_series(1, len(items))) t1(i),
                LATERAL unnest(generate_series(1, len(items))) t2(j)
           WHERE j > i)
    SELECT a, b, count(*) AS n
    FROM pr GROUP BY a, b HAVING count(*) >= 2
    """,
    doc="Unordered stage co-occurrence per 30-min session, min_n=2 "
    "(operators/funnel.py:session_cooccurrence): pairs expand array-side "
    "from each session's sorted distinct item set (LSH-combos shape over a "
    "materialized aggregate column) — never a self-join; sessionization "
    "and item-set assembly share one user-keyed exchange. Sessionization "
    "here needs no event_id tiebreak: the item SET is order-insensitive "
    "and equal-timestamp events always share a session.",
)
def q_session_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        session_cooccurrence,
    )

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    return session_cooccurrence(ev, "user_id", "ts", "event_type", 30, min_n=2)


_Q17_SQL = """
    SELECT cast(sum(cast(l_extendedprice AS decimal(30,2))) AS double) / 7.0
               AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#4' AND p_size < 15
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity)
          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


@register(
    "correlated_subquery_q17",
    _Q17_SQL,
    doc="TPC-H Q17 shape — small-quantity-order revenue with a CORRELATED "
    "scalar subquery, submitted as raw SQL through the front door. "
    "Catalyst decorrelates the per-part average into an aggregate + join "
    "(no per-row re-execution); avg(l_quantity) is order-independent "
    "because integer-valued doubles sum exactly, and the 0.2·avg threshold "
    "is the same two IEEE ops in both engines. Identical SQL text runs on "
    "both engines — the decorrelation is the Spark-side physics.",
)
def q_correlated_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("lineitem", "part"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17_SQL)


@register(
    "vocab_coverage_curve",
    r"""
    WITH allc AS (
      SELECT token, count(*) AS n
      FROM (SELECT unnest(list_filter(
                string_split_regex(lower(text), '[^\p{L}\p{N}]+'),
                x -> x <> '')) AS token
            FROM documents)
      GROUP BY token),
    t AS (SELECT sum(n) AS total FROM allc),
    k AS (SELECT token, n FROM allc WHERE n >= 5)
    SELECT token, n, row_number() OVER w - 1 AS id,
           (sum(n) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::double
               / total::double AS cum_frac
    FROM k, t
    WINDOW w AS (ORDER BY n DESC, token)
    """,
    doc="Vocabulary cumulative-coverage curve, min_count=5 "
    "(operators/textprep.py:vocab_with_coverage): rank AND cumulative "
    "token count both ride the two-phase prefix decomposition over exact "
    "integer-log2 buckets — one extra metadata-scale offsets fold, still "
    "no single-partition window (the oracle's spelling). Answers 'how big "
    "a vocab covers 95% of corpus tokens'; denominator includes "
    "sub-threshold tokens.",
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
        vocab_with_coverage,
    )

    docs = _t(spark, sf_dir, "documents").select("text")
    return vocab_with_coverage(docs, "text", min_count=5)


@register(
    "rolling_active_users_7d",
    """
    WITH grid AS (
      SELECT DISTINCT user_id AS u, date_trunc('day', ts)::date AS d
      FROM events WHERE user_id IS NOT NULL),
    dau AS (SELECT d AS day, count(DISTINCT u) AS dau FROM grid GROUP BY d),
    tgt AS (SELECT u, unnest(generate_series(d, d + INTERVAL 6 DAY,
                                             INTERVAL 1 DAY))::date AS day
            FROM grid),
    wau AS (SELECT day, count(DISTINCT u) AS wau FROM tgt GROUP BY day)
    SELECT wau.day, coalesce(dau.dau, 0) AS dau, wau.wau,
           coalesce(dau.dau, 0)::double / wau.wau AS stickiness
    FROM wau LEFT JOIN dau USING (day)
    """,
    doc="DAU / trailing-7-day WAU / stickiness per day "
    "(operators/funnel.py:rolling_active_users): rolling COUNT DISTINCT is "
    "not window-decomposable, so each (user, day) activity cell EXPLODES "
    "onto the 7 target days it serves and distinct-counts per target day — "
    "work ∝ activity-grid × window, never days × corpus. Both engines "
    "spell the same construction.",
)
def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        rolling_active_users,
    )

    ev = _events(spark, sf_dir).select("user_id", "ts")
    return rolling_active_users(ev, "user_id", "ts", window_days=7)


@register(
    "session_association_rules",
    """
    WITH e AS (SELECT user_id, ts, event_type FROM events WHERE user_id IS NOT NULL),
    f AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                         THEN 1 ELSE 0 END AS new_sess
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM f),
    p AS (SELECT user_id, sid, list_sort(list_distinct(list(event_type))) AS items
          FROM s GROUP BY user_id, sid),
    tot AS (SELECT count(*) AS total FROM p),
    singles AS (SELECT item, count(*) AS n1
                FROM (SELECT unnest(items) AS item FROM p) GROUP BY item),
    pairs AS (SELECT a, b, count(*) AS n_sessions FROM (
                SELECT items[i] AS a, items[j] AS b
                FROM p,
                     LATERAL unnest(generate_series(1, len(items))) t1(i),
                     LATERAL unnest(generate_series(1, len(items))) t2(j)
                WHERE j > i)
              GROUP BY a, b HAVING count(*) >= 5),
    both_dirs AS (
      SELECT a AS antecedent, b AS consequent, n_sessions FROM pairs
      UNION ALL
      SELECT b, a, n_sessions FROM pairs)
    SELECT antecedent, consequent, n_sessions,
           n_sessions::double / total AS support,
           n_sessions::double / sa.n1 AS confidence,
           (n_sessions::double / total)
             / ((sa.n1::double / total) * (sb.n1::double / total)) AS lift
    FROM both_dirs
    JOIN singles sa ON sa.item = antecedent
    JOIN singles sb ON sb.item = consequent
    CROSS JOIN tot
    """,
    doc="Session-basket association rules (support/confidence/lift, both "
    "directions, min 5 pair-sessions; operators/funnel.py:"
    "association_rules): sessionization + item sets on ONE user-keyed "
    "exchange, vocabulary-scale pair/single counts, singles and the total "
    "broadcast onto the pair frame — never a corpus self-join. Ratios are "
    "fixed-order IEEE divides over exact session counts.",
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        association_rules,
    )

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    return association_rules(ev, "user_id", "ts", "event_type", 30, min_pair_sessions=5)


@register(
    "user_feature_matrix",
    """
    SELECT user_id,
           count(*) AS n_events,
           count(*) FILTER (WHERE event_type = 'view') AS n_view,
           count(*) FILTER (WHERE event_type = 'click') AS n_click,
           count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           count(DISTINCT date_trunc('day', ts)::date) AS active_days,
           cast(sum(cast(value AS decimal(30,6))) AS double) AS sum_value,
           cast(sum(cast(value AS decimal(30,6)))
                    FILTER (WHERE event_type = 'purchase') AS double)
               AS purchase_value,
           count(*) FILTER (WHERE event_type = 'click')::double
               / greatest(count(*) FILTER (WHERE event_type = 'view'), 1)
               AS click_per_view
    FROM events WHERE user_id IS NOT NULL
    GROUP BY user_id
    """,
    doc="Per-user feature matrix — the feature-engineering aggregate feeding "
    "a training table: conditional counts per event type (one pass, FILTER "
    "clauses / when-casts, never a pivot join), distinct active days, "
    "decimal-exact value sums, and a guarded ratio feature. ONE partial-agg "
    "groupBy (the count-distinct adds its expand pass); every feature is "
    "integer arithmetic, exact decimal sums, or a fixed-order divide.",
)
def q_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type", "value")
    et = F.col("event_type")
    val6 = F.col("value").cast("decimal(30,6)")
    return (
        ev.filter(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(et == "view", 1)).alias("n_view"),
            F.count(F.when(et == "click", 1)).alias("n_click"),
            F.count(F.when(et == "purchase", 1)).alias("n_purchase"),
            F.count_distinct(F.date_trunc("day", F.col("ts")).cast("date")).alias(
                "active_days"
            ),
            F.sum(val6).cast("double").alias("sum_value"),
            F.sum(F.when(et == "purchase", val6)).cast("double").alias("purchase_value"),
            (
                F.count(F.when(et == "click", 1)).cast("double")
                / F.greatest(F.count(F.when(et == "view", 1)), F.lit(1).cast("bigint"))
            ).alias("click_per_view"),
        )
    )


@register(
    "label_centroids_embeddings",
    """
    WITH e AS (SELECT label, idx - 1 AS pos, embedding[idx] AS v
               FROM read_parquet_embeddings,
                    LATERAL unnest(generate_series(1, len(embedding))) u(idx)),
    m AS (SELECT label, pos, count(*) AS n,
                 sum(round(cast(v AS double) * 16777216.0)::bigint) AS qsum
          FROM e GROUP BY label, pos)
    SELECT label, max(n) AS n,
           string_agg(cast(qsum AS varchar), ',' ORDER BY pos) AS centroid_qsums
    FROM m GROUP BY label
    """.replace("read_parquet_embeddings", "embeddings"),
    doc="Per-label mean embedding (class centroids; operators/similarity.py:"
    "label_centroids): narrow posexplode, ONE (label, pos) partial-agg "
    "groupBy (labels × dim cells), label-keyed reassembly over dim-sized "
    "groups — vectors never collect to the driver. Quantized-exact sums "
    "(round(v·2^24) as int64, the quantized-kNN policy) — partition-"
    "invariant and engine-identical where a float→decimal cast would hit "
    "rounding-mode boundaries. Emitted in the serialized form (position-"
    "ordered comma-joined EXACT bigint component sums; mean = qsum/n/2^24) "
    "so the row is driver-window-eligible — the driver's canonicalizer "
    "hashes scalar cells only, and integer digits dodge cross-engine float "
    "formatting entirely. The array<double> form stays the library API "
    "(tests/test_similarity.py).",
)
def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        label_centroids,
    )

    emb = _t(spark, sf_dir, "embeddings").select("label", "embedding")
    return label_centroids(emb, "label", "embedding", qbits=24, serialize=True)


@register(
    "pagerank_event_graph",
    None,  # iterative fixpoint — no SQL oracle; numpy-reference + bit-exact
    # partition-invariance pytest in tests/test_dedup.py::TestPageRank
    doc="PageRank over the event-transition graph (operators/graph.py:"
    "pagerank): fixed-iteration power method, dangling mass redistributed; "
    "per-iteration cost is one edge join + one dst aggregation with "
    "decimal-summed contributions (bit-identical across partitionings — "
    "tested), lineage truncated per round (the connected-components "
    "discipline). Rows-only by design: iterative fixpoints have no "
    "single-query SQL twin; correctness is pinned against numpy power "
    "iteration to 1e-9.",
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.funnel import (
        event_transitions,
    )
    from lakehouse_architecture_for_realestatedata_spark.operators.graph import pagerank

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    edges = event_transitions(ev, "user_id", "ts", "event_type", tiebreak="event_id")
    return pagerank(
        edges.select(F.col("from_stage").alias("src"), F.col("to_stage").alias("dst")),
        n_iters=10,
    )


@register(
    "doc_perplexity_bigram",
    None,  # rows-only: log2 is transcendental (engine-specific ULP at the
    # quantization boundary); the ranking/floor/partition-invariance
    # contract is tests/test_textprep.py::test_doc_perplexity_ranks_gibberish_high
    doc="Per-document bigram cross-entropy under the corpus LM "
    "(operators/textprep.py score_doc_perplexity): the perplexity filter "
    "of corpus curation — gibberish scores high, machine boilerplate "
    "suspiciously low. Doc bigrams build array-side, the LM join is "
    "vocab-scale, and per-doc log sums quantize to int64 so scores are "
    "partition-invariant. Completes the tokenize->vocab->encode->LM loop "
    "with the loop's actual downstream use.",
)
def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.textprep import (
        score_doc_perplexity,
        token_bigram_counts,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _t
    from lakehouse_architecture_for_realestatedata_spark.queries_text import _spread

    docs = _spread(spark, _t(spark, sf_dir, "documents"))
    lm = token_bigram_counts(docs, "text", min_count=2)
    return score_doc_perplexity(docs, "doc_id", "text", lm=lm)


@register(
    "weighted_exact_n_per_lang",
    None,  # rows-only: same transcendental A-ES rank as the global variant
    # (ln not cross-engine hash-exact); the exactly-n-per-group, inclusion-
    # tracks-weights, and WindowGroupLimit-Partial contracts are
    # tests/test_sampling.py::test_weighted_exact_n_by_group
    doc="EXACTLY-n weighted sample per language "
    "(operators/sampling.py sample_weighted_exact_n_by_group): stratified "
    "Efraimidis-Spirakis — within each lang the n largest ln(u)/w win, u "
    "from the md5-hashed doc id. The per-slice corpus budget ('exactly 20 "
    "docs per language, length-weighted'). Rank-only window keeps Spark's "
    "WindowGroupLimit map-side n-cut; never a global sort.",
)
def q_weighted_exact_n_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
        sample_weighted_exact_n_by_group,
    )

    docs = _t(spark, sf_dir, "documents")
    return sample_weighted_exact_n_by_group(
        docs.select("doc_id", "lang", F.col("n_chars").cast("double").alias("w")),
        "doc_id",
        "lang",
        "w",
        20,
        salt="mix1",
    ).select("doc_id", "lang", "w")


@register(
    "weighted_exact_n_docs",
    None,  # rows-only: the A-ES rank uses ln(u)/w — transcendental, so the
    # selected set is not cross-engine hash-stable near score ties; the
    # inclusion-probability + determinism contract is
    # tests/test_sampling.py::test_weighted_exact_n_inclusion_tracks_weights
    doc="EXACTLY-n weighted sample without replacement "
    "(operators/sampling.py sample_weighted_exact_n, Efraimidis-Spirakis "
    "A-ES): the n largest u^(1/w) win, u drawn deterministically from the "
    "md5-hashed key — the budgeted quality-weighted corpus pick ('exactly "
    "100k docs, weighted by length/quality'). Narrow scoring pass + "
    "TakeOrderedAndProject; partition-invariant and salt-reproducible.",
)
def q_weighted_exact_n_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
        sample_weighted_exact_n,
    )

    docs = _t(spark, sf_dir, "documents")
    return sample_weighted_exact_n(
        docs.select("doc_id", "lang", F.col("n_chars").cast("double").alias("w")),
        "doc_id",
        "w",
        100,
        salt="mix1",
    ).select("doc_id", "lang", "w")


@register(
    "vocab_bpe_merges",
    None,  # rows-only: BPE training is an ITERATIVE argmax loop (merge r+1's
    # pair counts depend on merge r's rewrite) — not expressible as one
    # DuckDB SELECT. The hard contract is tests/test_bpe.py: merge-list
    # equality with a pure-Python reference BPE on pinned fixtures, plus
    # partition invariance of the trained table.
    doc="Real BPE subword training (operators/bpe.py bpe_train_merges, "
    "Sennrich 2016): one corpus-scale word-count aggregate, then per round "
    "one pair-frequency aggregate over the vocab-scale word table + a "
    "limit(1) argmax collect; merges applied array-side (F.aggregate fold) "
    "— no Python UDF anywhere. Returns the ordered (rank, left, right) "
    "merge table.",
)
def q_vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.bpe import (
        bpe_train_merges,
        merges_to_df,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    docs = _t(spark, sf_dir, "documents")
    return merges_to_df(spark, bpe_train_merges(docs, "text", num_merges=24))


@register(
    "encode_documents_bpe",
    None,  # rows-only: inherits vocab_bpe_merges' iterative training (same
    # reason no SQL oracle exists); segmentation parity with the reference
    # Python encoder is pinned in tests/test_bpe.py.
    doc="Merge-table BPE encoding (operators/bpe.py bpe_encode): segment the "
    "DISTINCT-words table with the trained merges (rank-order array-side "
    "application — provably equal to min-rank-first), assign piece ids from "
    "the bounded piece set, then one word join + one doc-keyed reassembly "
    "over the corpus. (doc_id, n_tokens, token_ids).",
)
def q_encode_documents_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.bpe import (
        bpe_encode,
        bpe_train_merges,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train_merges(docs, "text", num_merges=24)
    return bpe_encode(docs, "doc_id", "text", merges).select(
        "doc_id", "n_tokens", "token_ids"
    )


# DuckDB twin of functions.text.tokens — single source in queries_text
from lakehouse_architecture_for_realestatedata_spark.queries_text import _DUCK_TOKS  # noqa: E402


@register(
    "inverted_index_postings",
    f"""
    WITH e AS (
        SELECT doc_id, unnest(list_distinct({_DUCK_TOKS.format(c='text')})) AS term
        FROM documents WHERE doc_id < 500
    )
    SELECT term, count(*) AS doc_freq,
           array_to_string((list_sort(list(doc_id)))[1:20], ',') AS postings
    FROM e GROUP BY term
    """,
    doc="Inverted-index build (term → document-frequency + capped postings "
    "list of the 20 smallest doc ids): the search-index construction pass "
    "of a corpus pipeline. Scale shape: postings are capped BEFORE any "
    "list materializes — a rank-only row_number ≤ 20 per term keeps "
    "Spark's WindowGroupLimit map-side cut, so a stop-word term never "
    "collects millions of ids into one aggregation buffer; doc_freq comes "
    "from a plain partial-aggregated count on the same term key (AQE "
    "reuses the exchange). Postings serialize as a comma-joined string so "
    "the value hash is engine-neutral.",
)
def q_inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from lakehouse_architecture_for_realestatedata_spark.functions.text import tokens

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    e = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")), lambda d: d.cast("string")
                ),
                ",",
            ).alias("postings")
        )
    )
    freq = e.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    return freq.join(capped, "term").select("term", "doc_freq", "postings")


@register(
    "per_source_doc_caps",
    """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(cast(doc_id AS varchar)), doc_id
               ) AS rn
        FROM documents) t
    WHERE rn <= 15
    """,
    doc="Per-source document caps (common-crawl-style curation: no domain "
    "may contribute more than N docs): deterministic md5-hash order picks "
    "WHICH docs survive the cap — reproducible across runs and engines, "
    "unlike an arbitrary LIMIT — with doc_id as the total-order tiebreak. "
    "Rank-only window over the source key keeps the WindowGroupLimit "
    "map-side cut: each task locally discards rows past the cap before "
    "the exchange, so a mega-domain never funnels through one reducer "
    "unbounded.",
)
def q_per_source_doc_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), "doc_id"
    )
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .select("doc_id", "source")
    )


@register(
    "quality_classifier_scores",
    None,  # rows-only: the sigmoid/exp in training and scoring is
    # transcendental (not cross-engine hash-exact); convergence, accuracy
    # on separable data, and bit-exact partition invariance of the learned
    # weights are pinned in tests/test_mlprep.py
    doc="Learned quality filter (operators/mlprep.py logreg_fit), trained "
    "with the standard seed-set bootstrap (CCNet/fastText style: a "
    "trusted corpus as positives vs a degraded corpus as negatives — "
    "here, each doc minus its English function words, a deterministic "
    "engine-side scrub; the synthetic corpus's lang labels are "
    "independent of the text, so they cannot supervise anything). "
    "Features are per-doc text statistics (length adequacy, alpha "
    "ratio, English-stopword hits, digit ratio); each GD iteration is "
    "one narrow pass + one d+1-cell quantized-exact gradient reduction "
    "(metadata-scale shuffle); weights are partition-invariant bit for "
    "bit. Returns per-(doc, variant) margin/probability with the seed "
    "label for downstream threshold curation.",
)
def q_quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.functions.text import tokens
    from lakehouse_architecture_for_realestatedata_spark.operators.mlprep import (
        logreg_fit,
        logreg_score,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    stop_words = ("the", "and", "of", "to", "in", "is", "it", "for", "a")
    scrub = F.regexp_replace(
        F.col("text"), r"\b(?:" + "|".join(stop_words) + r")\b\s*", ""
    )
    pairs = docs.select(
        "doc_id",
        F.lit("orig").alias("variant"),
        F.col("text"),
        F.lit(1).alias("y"),
    ).unionByName(
        docs.select(
            "doc_id",
            F.lit("scrubbed").alias("variant"),
            scrub.alias("text"),
            F.lit(0).alias("y"),
        )
    )
    toks = tokens(F.col("text"))
    n_chars = F.length("text")
    alpha = F.length(F.regexp_replace(F.col("text"), r"[^\p{L}\p{N} ]", ""))
    digits = F.length(F.regexp_replace(F.col("text"), r"[^\p{N}]", ""))
    stops = F.array(*[F.lit(s) for s in stop_words])
    feats = pairs.select(
        "doc_id",
        "variant",
        "y",
        F.least(n_chars / F.lit(200.0), F.lit(1.0)).alias("len_ok"),
        F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0)).alias("alpha_ratio"),
        F.least(
            F.size(F.array_intersect(F.array_distinct(toks), stops)) / F.lit(4.0),
            F.lit(1.0),
        ).alias("stop_hits"),
        F.when(n_chars > 0, digits / n_chars).otherwise(F.lit(0.0)).alias("digit_ratio"),
    )
    fcols = ["len_ok", "alpha_ratio", "stop_hits", "digit_ratio"]
    w = logreg_fit(feats, fcols, "y", n_iters=20, lr=2.0)
    return logreg_score(feats, fcols, w).select(
        "doc_id", "variant", "margin", "prob", "y"
    )


@register(
    "bm25_search_topk",
    rf"""
    WITH toks AS (
        SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents
    ), stream AS (
        SELECT doc_id, unnest(t) AS term FROM toks
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM stream GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, term, tf, sum(tf) OVER (PARTITION BY doc_id) AS dl FROM tf
    ), consts AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT count(*) FROM stream) AS total_tokens
    ), q(query_id, term) AS (VALUES
        ('scan_filter', 'scan'), ('scan_filter', 'filter'), ('scan_filter', 'column'),
        ('join_key', 'join'), ('join_key', 'merge'), ('join_key', 'key'),
        ('stream_window', 'stream'), ('stream_window', 'window'), ('stream_window', 'order')
    ), cut AS (
        -- tf cut to the DISTINCT queried terms: df counts each document
        -- once per term, never per (query, term) multiplicity
        SELECT doc_id, term, tf, dl
        FROM dl JOIN (SELECT DISTINCT term FROM q) USING (term)
    ), dfreq AS (
        SELECT term, count(*) AS df FROM cut GROUP BY 1
    ), hit AS (
        SELECT query_id, doc_id, term, tf, dl FROM cut JOIN q USING (term)
    ), contrib AS (
        SELECT query_id, doc_id,
               cast(floor(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * ((cast(tf AS double) * 2.2)
                      / (cast(tf AS double)
                         + 1.2 * (0.25 + 0.75 * (cast(dl AS double)
                             / (cast(total_tokens AS double) / cast(n_docs AS double))))))
                   * 1048576.0 + 0.5) AS bigint) AS qc
        FROM hit JOIN dfreq USING (term) CROSS JOIN consts
    ), scored AS (
        SELECT query_id, doc_id, sum(qc) AS qsum FROM contrib GROUP BY 1, 2
    )
    SELECT query_id, doc_id, cast(qsum AS double) / 1048576.0 AS score, rnk
    FROM (
        SELECT query_id, doc_id, qsum,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY qsum DESC, doc_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 10
    """,
    doc="BM25 ranked search (operators/retrieval.py:bm25_topk): top-10 "
    "documents for three literal term queries under Robertson/Okapi BM25 "
    "with the Lucene non-negative idf, k1=1.2 b=0.75. Cross-engine-exact "
    "despite ln(): each (query, doc, term) contribution quantizes to "
    "int64 at 2^20 (round half away) so the per-doc score is an EXACT "
    "integer sum — partition-invariant in Spark, bit-equal in DuckDB; "
    "ties break on ascending doc id (total order). Physics: ONE corpus "
    "shuffle (the tf groupBy); the literal query-term frame broadcasts "
    "into tf so document frequencies and scores are computed only for "
    "queried terms; N/avgdl ride a broadcast one-row frame; the final "
    "top-k windows over #queries partitions of already-cut input.",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.retrieval import (
        bm25_topk,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(
        docs,
        [
            ("scan_filter", ["scan", "filter", "column"]),
            ("join_key", ["join", "merge", "key"]),
            ("stream_window", ["stream", "window", "order"]),
        ],
        k=10,
    )


@register(
    "winnow_plagiarism_pairs",
    rf"""
    WITH toks AS (
        SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents
    ), grams AS (
        SELECT doc_id, idx AS pos, md5(array_to_string(t[idx:idx+3], ' ')) AS gh
        FROM toks, LATERAL unnest(generate_series(1, len(t) - 3)) AS u(idx)
        WHERE len(t) >= 4
        UNION ALL
        SELECT doc_id, 1 AS pos, md5(array_to_string(t, ' ')) AS gh
        FROM toks WHERE len(t) >= 1 AND len(t) < 4
    ), fp_all AS (
        SELECT DISTINCT doc_id, wmin AS gh FROM (
            SELECT doc_id,
                   min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS wmin
            FROM grams
        )
    ), fp AS (
        -- MOSS over-common-fingerprint rule: boilerplate shared by > 64
        -- documents carries no plagiarism signal, only quadratic fanout
        SELECT doc_id, gh FROM (
            SELECT doc_id, gh, count(*) OVER (PARTITION BY gh) AS df FROM fp_all
        ) WHERE df <= 64
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
    FROM fp a JOIN fp b ON a.gh = b.gh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    doc="Winnowing overlap detection (operators/retrieval.py:"
    "winnow_overlap_pairs, Schleimer et al. SIGMOD'03 / MOSS): token "
    "4-gram md5 fingerprints sampled as the DISTINCT w=5 sliding-window "
    "minima (the classic fingerprint set — any shared token run of >= "
    "w+k-1 = 8 tokens yields a shared fingerprint, pinned in pytest on "
    "planted plagiarism), then "
    "document pairs sharing >= 2 sampled fingerprints. Hash comparisons "
    "are md5 HEX STRINGS (binary collation) so both engines pick "
    "identical window minima. Physics: grams build array-side in one "
    "projection; the per-doc window partitions on the high-cardinality "
    "doc id with a bounded frame; only the ~2/(w+1) sampled hashes reach "
    "the inverted-index pair join — and fingerprints common to > 64 "
    "documents (boilerplate; quadratic fanout, zero signal) are dropped "
    "first, MOSS's own rule (corpus max df is 3 at sf0.01 / 6 at sf0.1, "
    "so the cap changes nothing here while bounding the 100x-scale "
    "worst case; planted-boilerplate pytest pins the bound).",
)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.retrieval import (
        winnow_overlap_pairs,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return winnow_overlap_pairs(docs, k=4, w=5, min_shared=2, max_df=64)


@register(
    "mmr_diverse_topk",
    None,  # greedy argmax selection is inherently iterative (state updates
    # per pick) — not SQL-expressible; exact parity with a pure-Python MMR
    # reference and the diversity property are pinned in
    # tests/test_similarity.py
    doc="Diversity-aware selection (operators/similarity.py:mmr_select, "
    "Carbonell & Goldstein SIGIR'98): retrieval's top-30 cosine "
    "candidates per query (bounded anchors vec_id<5, quantized-exact "
    "brute-force scoring — the registered knn path) re-ranked by greedy "
    "Maximal Marginal Relevance (lambda=0.7) so the kept 10 aren't near-"
    "copies of the best hit — the selection step between ANN retrieval "
    "and training-set assembly. Greedy MMR runs Arrow-batched per query "
    "over the BOUNDED candidate frame only; everything corpus-scale "
    "stays in the retrieval step. Deterministic: id-sorted candidates, "
    "first-argmax tie-break, float64 math.",
)
def q_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        knn_quantized_blas,
        mmr_select,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    cands = knn_quantized_blas(emb, queries, "vec_id", "embedding", k=30)
    with_vecs = cands.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    )
    return mmr_select(with_vecs, k=10, lam=0.7)


@register(
    "hybrid_search_rrf",
    rf"""
    WITH toks AS (
        SELECT doc_id, {_DUCK_TOKS.format(c='text')} AS t FROM documents
    ), stream AS (
        SELECT doc_id, unnest(t) AS term FROM toks
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM stream GROUP BY 1, 2
    ), dl AS (
        SELECT doc_id, term, tf, sum(tf) OVER (PARTITION BY doc_id) AS dl FROM tf
    ), consts AS (
        SELECT (SELECT count(*) FROM documents) AS n_docs,
               (SELECT count(*) FROM stream) AS total_tokens
    ), q(query_id, term) AS (VALUES
        ('scan_filter', 'scan'), ('scan_filter', 'filter'), ('scan_filter', 'column'),
        ('join_key', 'join'), ('join_key', 'merge'), ('join_key', 'key'),
        ('stream_window', 'stream'), ('stream_window', 'window'), ('stream_window', 'order')
    ), cut AS (
        SELECT doc_id, term, tf, dl
        FROM dl JOIN (SELECT DISTINCT term FROM q) USING (term)
    ), dfreq AS (
        SELECT term, count(*) AS df FROM cut GROUP BY 1
    ), hit AS (
        SELECT query_id, doc_id, term, tf, dl FROM cut JOIN q USING (term)
    ), contrib AS (
        SELECT query_id, doc_id,
               cast(floor(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * ((cast(tf AS double) * 2.2)
                      / (cast(tf AS double)
                         + 1.2 * (0.25 + 0.75 * (cast(dl AS double)
                             / (cast(total_tokens AS double) / cast(n_docs AS double))))))
                   * 1048576.0 + 0.5) AS bigint) AS qc
        FROM hit JOIN dfreq USING (term) CROSS JOIN consts
    ), lex AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sum(qc) DESC, doc_id ASC) AS rnk
        FROM contrib GROUP BY query_id, doc_id
        QUALIFY rnk <= 20
    ), qz AS (
        SELECT vec_id, [round(cast(x as double) * 1000000) for x in embedding] AS v
        FROM embeddings
    ), anchors AS (
        SELECT CASE vec_id WHEN 0 THEN 'scan_filter'
                           WHEN 1 THEN 'join_key'
                           ELSE 'stream_window' END AS query_id,
               vec_id AS qid, v AS qv
        FROM qz WHERE vec_id IN (0, 1, 2)
    ), knn AS (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, doc_id ASC) AS rnk
        FROM (
            SELECT a.query_id, c.vec_id AS doc_id,
                   CASE WHEN list_dot_product(a.qv, a.qv) > 0
                             AND list_dot_product(c.v, c.v) > 0
                        THEN list_dot_product(a.qv, c.v)
                             / (sqrt(list_dot_product(a.qv, a.qv))
                                * sqrt(list_dot_product(c.v, c.v)))
                        ELSE 0.0 END AS cosine
            FROM qz c, anchors a WHERE c.vec_id <> a.qid
        ) QUALIFY rnk <= 20
    ), fused AS (
        SELECT coalesce(l.query_id, s.query_id) AS query_id,
               coalesce(l.doc_id, s.doc_id) AS doc_id,
               coalesce(1.0 / (60 + l.rnk), 0.0)
                   + coalesce(1.0 / (60 + s.rnk), 0.0) AS rrf_score
        FROM lex l FULL OUTER JOIN knn s
          ON l.query_id = s.query_id AND l.doc_id = s.doc_id
    )
    SELECT query_id, doc_id, rrf_score, rnk FROM (
        SELECT query_id, doc_id, rrf_score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rrf_score DESC, doc_id ASC) AS rnk
        FROM fused
    ) WHERE rnk <= 10
    """,
    doc="Hybrid search via Reciprocal Rank Fusion (operators/retrieval.py:"
    "rrf_fuse, Cormack et al. SIGIR'09): the lexical BM25 top-20 and the "
    "vector-kNN top-20 (query-by-example anchors vec 0/1/2, "
    "quantized-exact cosine) fuse by summing 1/(60+rank) — the standard "
    "calibration-free combiner of a hybrid retrieval stack (BM25 + ANN + "
    "RRF + MMR diversity, all in-engine). Exact by construction: ranks "
    "are integers, each term one correctly-rounded IEEE division, the "
    "fused score ONE fixed two-term sum (full-outer join + coalesce, "
    "never an order-dependent aggregation), ties on ascending doc id. "
    "Physics: both inputs are already bounded top-N-per-query frames; "
    "the fusion join and final top-k are metadata-scale next to the "
    "retrieval passes.",
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from lakehouse_architecture_for_realestatedata_spark.operators.retrieval import (
        bm25_topk,
        rrf_fuse,
    )
    from lakehouse_architecture_for_realestatedata_spark.operators.similarity import (
        knn_quantized_blas,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lex = bm25_topk(
        docs,
        [
            ("scan_filter", ["scan", "filter", "column"]),
            ("join_key", ["join", "merge", "key"]),
            ("stream_window", ["stream", "window", "order"]),
        ],
        k=20,
    ).select("query_id", "doc_id", "rnk")
    emb = _t(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 3)
    knn = knn_quantized_blas(emb, anchors, "vec_id", "embedding", k=20)
    qmap = (
        F.when(F.col("query_id") == 0, "scan_filter")
        .when(F.col("query_id") == 1, "join_key")
        .otherwise("stream_window")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    sem = (
        knn.withColumn("rnk", F.row_number().over(wr))
        .select(qmap.alias("query_id"), F.col("neighbor_id").alias("doc_id"), "rnk")
    )
    return rrf_fuse(lex, sem, k=10)


@register(
    "mixture_sample_by_lang",
    """
    WITH d AS (SELECT * FROM documents WHERE lang IS NOT NULL),
    per AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
    w AS (SELECT lang, n, sqrt(cast(n AS double)) AS sw FROM per),
    tot AS (SELECT max(cw) AS W FROM (
        SELECT sum(sw) OVER (ORDER BY lang
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS cw FROM w)),
    r AS (SELECT lang,
                 sw * 200.0 / (SELECT W FROM tot) / cast(n AS double) AS rate
          FROM w)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM d JOIN r USING (lang)
    WHERE rate > 0
      AND substr(md5('mix-v1' || cast(doc_id AS varchar)), 1, 8) <
          CASE WHEN rate >= 1.0 THEN 'g'
               ELSE lpad(lower(to_hex(cast(floor(rate * 4294967296.0)
                                           AS bigint))), 8, '0')
          END
    """,
    doc="Temperature-weighted training-mix sampling (operators/"
    "sampling.py:sample_mixture_by_group) — the multilingual rebalance "
    "every large pretraining corpus runs (XLM-R / mC4 style): each "
    "language's sampling budget is proportional to sqrt(n_lang) "
    "(temperature alpha=1/2 — sub-linear, so low-resource languages "
    "are upweighted vs their raw share; the fixture's en:fr skew is "
    "~3.4:1 by count but ~1.8:1 by budget), normalized to 200 expected "
    "rows, kept by the deterministic md5-threshold Bernoulli. "
    "Cross-engine hash-exact: sqrt / mul / div are correctly-rounded "
    "IEEE ops in a pinned left-to-right order, the normalizer is an "
    "ORDERED running sum over the one-row-per-language weight frame, "
    "and the keep decision lives in the proven hex-threshold domain. "
    "Scale: one tiny groupBy + broadcast join + codegen filter — no "
    "full-data shuffle, no UDF. New r11; r12 rotation candidate.",
)
def q_mixture_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.operators.sampling import (
        sample_mixture_by_group,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    out = sample_mixture_by_group(
        docs, "lang", "doc_id", target_total=200.0, salt="mix-v1"
    )
    return out.select("doc_id", "lang", "source", "n_chars")
