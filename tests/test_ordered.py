"""Distributed running totals / sequence packing / token-budget curation
(operators/ordered.py): exact vs a single-window oracle, partition- and
bucket-count-invariant, and plan-pinned to never collapse to one partition."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.ordered import (
    pack_sequences,
    running_total_by_key,
    token_budget_head,
)
from lakehouse_architecture_for_realestatedata_spark.operators.sampling import _hash_hex


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", r"\s+")).alias("n_tokens"))
        .cache()
    )
    df.count()
    return df


def _oracle_running(docs, salt=""):
    """The correct-but-unscalable spelling: one global window."""
    w = (
        Window.orderBy("__h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return {
        r["doc_id"]: r["rb"]
        for r in docs.withColumn("__h", _hash_hex(F.col("doc_id"), salt))
        .withColumn("rb", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .collect()
    }


def test_running_total_matches_global_window(spark, docs):
    want = _oracle_running(docs)
    got = {
        r["doc_id"]: r["running_before"]
        for r in running_total_by_key(docs, "doc_id", "n_tokens").collect()
    }
    assert got == want


@pytest.mark.parametrize("n_buckets", [1, 7, 256, 65536])
def test_running_total_bucket_invariant(spark, docs, n_buckets):
    """Any bucket count gives the same totals — including the non-divisor
    counts where a modulo (instead of range scaling) would fold
    non-contiguous hash ranges together and corrupt the prefix sums."""
    want = _oracle_running(docs)
    got = {
        r["doc_id"]: r["running_before"]
        for r in running_total_by_key(
            docs.repartition(13), "doc_id", "n_tokens", n_buckets=n_buckets
        ).collect()
    }
    assert got == want


def test_many_buckets_use_broadcast_join_not_map_literal(spark):
    """Above LITERAL_OFFSET_CAP observed buckets, the per-bucket offsets must
    arrive via BroadcastHashJoin — a 65536-bucket run would otherwise inline
    a ~131k-element create_map literal into every task's expression tree —
    with results identical to the literal path."""
    from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan

    many = spark.range(20_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 17 + 1).alias("n_tokens")
    )
    big = running_total_by_key(many, "doc_id", "n_tokens", n_buckets=65536)
    plan = physical_plan(big, mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "map_keys" not in plan and "element_at" not in plan, plan
    small = running_total_by_key(many, "doc_id", "n_tokens", n_buckets=256)
    splan = physical_plan(small, mode="simple")
    assert "BroadcastHashJoin" not in splan, splan  # literal path below cap
    got_big = {r["doc_id"]: r["running_before"] for r in big.collect()}
    got_small = {r["doc_id"]: r["running_before"] for r in small.collect()}
    assert got_big == got_small


def test_running_total_no_single_partition_window(spark, docs):
    from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan

    plan = physical_plan(
        running_total_by_key(docs, "doc_id", "n_tokens"), mode="simple"
    )
    assert "SinglePartition" not in plan, plan
    assert "Window" in plan and "hashpartitioning(__rt_b" in plan, plan


def test_pack_sequences_invariants(spark, docs):
    out = pack_sequences(docs, "doc_id", "n_tokens", max_tokens=512).collect()
    assert len(out) == docs.count()
    total = sum(r["n_tokens"] for r in out)
    for r in out:
        assert 0 <= r["seq_offset"] < 512
        span = (r["seq_offset"] + max(r["n_tokens"], 1) - 1) // 512 + 1
        assert r["n_seqs"] == span
    # the stream is gapless: max seq_id is exactly the chunk of the last token
    assert max(r["seq_id"] for r in out) == (total - 1) // 512
    # deterministic under repartitioning
    again = pack_sequences(
        docs.repartition(11), "doc_id", "n_tokens", max_tokens=512
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_token_budget_head_greedy_prefix(spark, docs):
    scored = docs.withColumn(
        "quality", (F.pmod(F.col("doc_id") * 37, F.lit(100)) / 100.0)
    )
    budget = 3000
    kept = token_budget_head(scored, "doc_id", "quality", "n_tokens", budget)
    rows = kept.collect()
    ordered = sorted(
        scored.collect(), key=lambda r: (-r["quality"], r["doc_id"])
    )
    want, acc = [], 0
    for r in ordered:
        if acc < budget:
            want.append(r["doc_id"])
        acc += r["n_tokens"]
    assert sorted(r["doc_id"] for r in rows) == sorted(want)
    # partition-invariant
    again = token_budget_head(
        scored.repartition(9), "doc_id", "quality", "n_tokens", budget
    )
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(want)


def test_duplicated_ngram_stats_planted(spark):
    """Two docs sharing a verbatim 13-gram show it in n_dup_grams; a unique
    doc shows zero."""
    from lakehouse_architecture_for_realestatedata_spark.operators.dedup import duplicated_ngram_stats

    shared = " ".join(f"w{i}" for i in range(13))
    rows = [
        (1, shared + " alpha beta gamma"),
        (2, "delta " + shared + " epsilon"),
        (3, "an entirely different document about nothing shared at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in duplicated_ngram_stats(df, "doc_id", "text").collect()}
    assert got[1]["n_dup_grams"] >= 1 and got[2]["n_dup_grams"] >= 1
    assert got[3]["n_dup_grams"] == 0 and got[3]["dup_fraction"] == 0.0
    # doc 3 has 13-token-windows worth of grams, all unique
    assert got[3]["n_grams"] >= 1


def test_global_row_number_exact_and_partition_invariant(spark, sf_dir):
    """global_row_number must equal the single-partition row_number window
    on a unique total order, for any input partitioning and partition
    count — the distributed two-phase numbering contract."""
    from pyspark.sql import Window, functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        global_row_number,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    order = [F.col("o_totalprice"), F.col("o_orderkey")]
    ref = o.withColumn(
        "rn",
        F.row_number()
        .over(Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")))
        .cast("bigint"),
    ).select("o_orderkey", "rn")
    want = sorted(map(tuple, ref.collect()))
    for src, p in ((o.coalesce(1), 4), (o.repartition(16), 7), (o, None)):
        got = sorted(
            map(
                tuple,
                global_row_number(src, order, partitions=p, descending=True)
                .select("o_orderkey", "rn")
                .collect(),
            )
        )
        assert got == want


def test_interval_join_keyed_and_degenerate(spark):
    """Keyed interval join restricts pairs to matching keys; inverted and
    NULL intervals drop; point intervals (start == end) still match."""
    from lakehouse_architecture_for_realestatedata_spark.operators.temporal import interval_join

    left = spark.createDataFrame(
        [("a", 0, 10), ("a", 50, 60), ("b", 0, 10), ("c", 5, 4), ("c", None, 9)],
        "k string, ls long, le long",
    )
    right = spark.createDataFrame(
        [("a", 8, 12), ("b", 20, 30), ("b", 10, 10)],
        "k string, rs long, re long",
    )
    out = sorted(
        map(tuple, interval_join(left, right, "ls", "le", "rs", "re", on=["k"], bin_width=7)
            .select("k", "ls", "rs").collect())
    )
    # a:[0,10]x[8,12] overlap; b:[0,10]x[10,10] point overlap; b x [20,30] no;
    # c rows dropped (inverted / NULL)
    assert out == [("a", 0, 8), ("b", 0, 10)]


def test_global_running_sum_exact_and_partition_invariant(spark, sf_dir):
    """global_running_sum must equal the single-partition window cumsum on
    a unique total order — exactly (decimal), for any partitioning."""
    from pyspark.sql import Window, functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        global_running_sum,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("rev"))
    )
    order = [F.col("rev"), F.col("o_custkey")]
    w = Window.orderBy(F.col("rev").desc(), F.col("o_custkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = sorted(
        map(tuple, o.select("o_custkey", F.sum("rev").over(w).alias("run")).collect())
    )
    for src, p in ((o.coalesce(1), 3), (o.repartition(16), None)):
        got = sorted(
            map(
                tuple,
                global_running_sum(
                    src, order, "rev", out_col="run", partitions=p, descending=True
                )
                .select("o_custkey", "run")
                .collect(),
            )
        )
        assert got == want


def test_global_running_sum_run_to_run_stable(spark, sf_dir):
    """Round-7 regression: the two-phase primitives must return IDENTICAL
    results across repeated executions of freshly-composed plans (the
    repartitionByRange spelling resampled boundaries per execution and
    silently attached wrong prefix offsets when the exchange wasn't
    reused). Ten fresh compositions on an aggregated input must agree."""
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        global_running_sum,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("rev"))
        .localCheckpoint(eager=True)
    )
    seen = set()
    for _ in range(10):
        got = tuple(
            sorted(
                map(
                    tuple,
                    global_running_sum(
                        o,
                        [F.col("rev"), F.col("o_custkey")],
                        "rev",
                        out_col="run",
                        partitions=4,
                        descending=True,
                    )
                    .select("o_custkey", "run")
                    .collect(),
                )
            )
        )
        seen.add(got)
    assert len(seen) == 1


def test_ntile_closed_form_property(spark):
    """Property check of the distributed ntile's closed-form bucket
    arithmetic against Python's reference partitioning for ~200 random
    (row-count, n-buckets) shapes — covers cnt < n, cnt == n, remainders,
    and the q == 0 guard, without paying a Spark job per case."""
    import random

    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.windows import ntile_buckets

    def ref_ntile(cnt, n):
        q, r = divmod(cnt, n)
        out = []
        for b in range(1, n + 1):
            out.extend([b] * (q + 1 if b <= r else q))
        return out

    rng = random.Random(42)
    cases = [(rng.randint(1, 60), rng.randint(1, 12)) for _ in range(200)]
    cases += [(1, 4), (3, 4), (4, 4), (5, 4), (40, 1)]
    # evaluate the SAME closed form the operator builds, driver-side via a
    # tiny local frame per distinct n (one Spark job total)
    rows = [(cnt, n, rn) for cnt, n in set(cases) for rn in range(1, cnt + 1)]
    df = spark.createDataFrame(rows, "cnt long, n int, rn long")
    q = F.floor(F.col("cnt") / F.col("n")).cast("bigint")
    r = (F.col("cnt") % F.col("n")).cast("bigint")
    threshold = r * (q + 1)
    bucket = F.when(
        F.col("rn") <= threshold, F.floor((F.col("rn") - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((F.col("rn") - threshold - 1) / F.greatest(q, F.lit(1))) + 1)
    got = {
        (x["cnt"], x["n"], x["rn"]): x["b"]
        for x in df.withColumn("b", bucket.cast("int")).collect()
    }
    for cnt, n in set(cases):
        want = ref_ntile(cnt, n)
        for rn in range(1, cnt + 1):
            assert got[(cnt, n, rn)] == want[rn - 1], (cnt, n, rn)


def test_ranked_in_group_null_partition_key(spark):
    """ADVICE r6 (medium): rows whose partition column is NULL form their own
    ranked group — the count join must be null-safe, not silently drop them.
    Oracle: percent_rank's literal definition per group, including NULL."""
    from lakehouse_architecture_for_realestatedata_spark.operators.windows import ranked_in_group

    rows = [
        ("a", 1, 30.0), ("a", 2, 20.0), ("a", 3, 10.0),
        (None, 4, 50.0), (None, 5, 40.0), (None, 6, 40.0),
        ("b", 7, 5.0),
    ]
    df = spark.createDataFrame(rows, "grp string, id int, v double")
    out = ranked_in_group(df, ["grp"], [F.col("v").desc(), F.col("id")])
    got = {(r["grp"], r["id"]): (r["rnk"], r["dense_rnk"], r["pct_rnk"]) for r in out.collect()}
    assert len(got) == 7, "NULL-group rows were dropped"
    assert got[(None, 4)] == (1, 1, 0.0)
    assert got[(None, 5)] == (2, 2, 0.5)
    assert got[(None, 6)] == (3, 3, 1.0)
    assert got[("b", 7)] == (1, 1, 0.0)  # n=1 group -> pct 0.0 convention
    assert got[("a", 1)] == (1, 1, 0.0) and got[("a", 3)] == (3, 3, 1.0)


def test_grouped_row_number_matches_window(spark, sf_dir):
    """grouped_row_number must equal the per-group row_number window on a
    unique total order, asc and desc — the scale-safe low-cardinality
    PARTITION BY spelling (no per-group WindowExec over full data)."""
    from pyspark.sql import Window, functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        grouped_row_number,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for desc in (False, True):
        lead = F.col("o_totalprice").desc() if desc else F.col("o_totalprice")
        w = Window.partitionBy("o_orderpriority").orderBy(lead, F.col("o_orderkey"))
        want = sorted(
            map(
                tuple,
                o.select(
                    "o_orderkey", F.row_number().over(w).cast("bigint").alias("rn")
                ).collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                grouped_row_number(
                    o,
                    ["o_orderpriority"],
                    [F.col("o_totalprice"), F.col("o_orderkey")],
                    partitions=5,
                    descending=desc,
                )
                .select("o_orderkey", "rn")
                .collect(),
            )
        )
        assert got == want


def test_grouped_cume_dist_matches_window(spark, sf_dir):
    """grouped_cume_dist must equal cume_dist() OVER (PARTITION BY g ORDER
    BY v) including tie/peer semantics (duplicated values share cd)."""
    from pyspark.sql import Window, functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        grouped_cume_dist,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") / 10000, 0).alias("band"),  # force ties
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("band").rangeBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority"))
    want = sorted(
        map(
            tuple,
            o.select(
                "o_orderkey",
                (F.count(F.lit(1)).over(w).cast("double") / n).alias("cd"),
            ).collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            grouped_cume_dist(o, ["o_orderpriority"], "band", partitions=6)
            .select("o_orderkey", "cd")
            .collect(),
        )
    )
    assert got == want


def test_global_running_max_exact_exclusive_and_partition_invariant(spark, sf_dir):
    """global_running_max must equal the single-partition window prefix max
    on a unique total order — inclusive and exclusive (strictly-preceding)
    variants — for any input partitioning and partition count."""
    from pyspark.sql import Window, functions as F

    from lakehouse_architecture_for_realestatedata_spark.operators.windows import (
        global_running_max,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("top"))
    )
    order = [F.col("o_custkey")]
    w_inc = Window.orderBy("o_custkey").rowsBetween(Window.unboundedPreceding, 0)
    w_exc = Window.orderBy("o_custkey").rowsBetween(Window.unboundedPreceding, -1)
    want_inc = sorted(
        map(tuple, o.select("o_custkey", F.max("top").over(w_inc).alias("m")).collect())
    )
    want_exc = sorted(
        map(tuple, o.select("o_custkey", F.max("top").over(w_exc).alias("m")).collect())
    )
    # first row of the total order must carry NULL in the exclusive variant
    assert want_exc[0][1] is None
    for src, p in ((o.coalesce(1), 3), (o.repartition(16), None)):
        got_inc = sorted(
            map(
                tuple,
                global_running_max(src, order, "top", out_col="m", partitions=p)
                .select("o_custkey", "m")
                .collect(),
            )
        )
        got_exc = sorted(
            map(
                tuple,
                global_running_max(
                    src, order, "top", out_col="m", partitions=p, exclusive=True
                )
                .select("o_custkey", "m")
                .collect(),
            )
        )
        assert got_inc == want_inc
        assert got_exc == want_exc
