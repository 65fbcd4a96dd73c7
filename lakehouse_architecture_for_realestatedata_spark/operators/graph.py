"""Iterative graph operators: connected components over near-duplicate pairs
— the step that turns pairwise dedup output (MinHash/SimHash/Jaccard PAIRS)
into CLUSTERS, so a pipeline can keep one canonical document per group.

Algorithm: minimum-label propagation. Every node starts labeled with itself;
each round, a node adopts the minimum label among itself and its neighbors;
at fixpoint, every node in a component carries the component's minimum id.
Rounds needed = graph diameter — near-dup clusters are small and dense
(diameter 2-4), so this converges in a handful of rounds even at billions of
nodes; ``max_iterations`` guards pathological chains.

Scale mechanics per round: one join (labels ⋈ edges, both hash-partitioned on
the node — co-partitioned, one shuffle) + one count. Lineage is truncated
every round — without it, round k's plan contains k nested joins and the DAG
(and codegen) blows up exponentially. Truncation uses ``localCheckpoint``
(executor-local blocks, fine on local[*]) unless the SparkContext has a
reliable checkpoint directory configured (``sc.setCheckpointDir``), in which
case ``checkpoint`` is used so a lost executor doesn't kill the job — set one
on a real cluster.

Convergence is detected type-agnostically: a round that changes zero labels
is the fixpoint (labels only ever decrease, so "no change" is stable). The
changed-row count works for string/md5 node ids too — summing labels as a
potential does not (``sum`` over strings is NULL, and ``None == None`` would
declare convergence after one round).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut lineage: reliable checkpoint when a checkpoint dir is set
    (cluster), executor-local otherwise (local mode / tests)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, label) for every node appearing in ``pairs``; ``label`` is the
    minimum node id of its connected component. Node ids may be any orderable
    type (int, string/md5, ...).

    Warns if ``max_iterations`` rounds pass without reaching the fixpoint —
    the returned labels are then an under-merged approximation (some
    components still carry more than one label).
    """
    edges = truncate_lineage(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = truncate_lineage(
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr"))
        )
        stepped = truncate_lineage(
            labels.join(neighbor_min, "node", "left").select(
                "node",
                F.col("label").alias("__old"),
                F.least("label", F.coalesce("nbr", "label")).alias("label"),
            )
        )
        changed = stepped.filter(F.col("label") != F.col("__old")).count()
        labels = stepped.select("node", "label")
        if changed == 0:
            break
    else:
        warnings.warn(
            f"connected_components did not converge in {max_iterations} "
            "rounds; returned labels are under-merged (raise max_iterations "
            "or check for pathological long chains)",
            stacklevel=2,
        )
    return labels


def keep_canonical(
    df: DataFrame, pairs: DataFrame, id_col: str, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Drop every near-duplicate except the minimum-id member of each
    cluster: rows of ``df`` minus non-canonical cluster members (left-anti
    join — never materializes the keep-set)."""
    cc = connected_components(pairs, src, dst)
    losers = cc.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank by fixed-iteration power method over an edge list. Output
    ``(node, rank)`` summing to 1 (dangling mass redistributed uniformly,
    the standard stochastic-completion). Duplicate edges count once.

    Each iteration: contributions ``rank/outdeg`` shuffle once on the edge
    join + once for the dst aggregation; the dangling total is a one-row
    aggregate. Contribution sums go through ``decimal(38,18)`` casts —
    deterministic per-value rounding, exact association — so ranks are
    BIT-IDENTICAL across partitionings (tested), unlike a plain double
    sum; the remaining per-node arithmetic is fixed-order IEEE. Lineage is
    truncated each round (``truncate_lineage``) so the plan doesn't grow
    with iterations — the connected-components discipline.

    Fixed ``n_iters`` (no driver-side convergence loop): 10-20 iterations
    is the standard production budget; error decays as damping^k."""
    if not 0 < damping < 1 or n_iters < 0:
        raise ValueError("need 0 < damping < 1 and n_iters >= 0")
    e = edges.select(F.col(src).alias("__s"), F.col(dst).alias("__d")).distinct()
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct()
    )
    nodes = truncate_lineage(nodes)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    dec = "decimal(38,18)"
    for _ in range(n_iters):
        with_deg = ranks.join(
            outdeg, ranks["node"] == outdeg["__s"], "left"
        ).select("node", "rank", "__deg")
        # Dangling mass stays IN the plan as a one-row broadcast cross join —
        # a driver-blocking collect here would add n_iters synchronous job
        # round-trips; only truncate_lineage materializes each round. The
        # IEEE op order matches the former driver-side arithmetic exactly:
        # ((1-d)/n) + ((d·dm)/n) + d·contrib, so ranks are bit-unchanged.
        dangling = with_deg.filter(F.col("__deg").isNull()).agg(
            F.coalesce(F.sum(F.col("rank").cast(dec)), F.lit(0).cast(dec))
            .cast("double")
            .alias("__dm")
        )
        contribs = (
            with_deg.filter(F.col("__deg").isNotNull())
            .join(e, F.col("node") == F.col("__s"))
            .select(F.col("__d"), (F.col("rank") / F.col("__deg")).alias("__c"))
            .groupBy("__d")
            .agg(F.sum(F.col("__c").cast(dec)).cast("double").alias("__sum"))
        )
        base = F.lit((1.0 - damping) / n) + (F.lit(damping) * F.col("__dm")) / n
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["__d"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (base + F.lit(damping) * F.coalesce(F.col("__sum"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
        ranks = truncate_lineage(ranks)
    return ranks


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count of an undirected graph — one row
    ``(n_triangles)``. Self-loops drop; duplicate / reversed edges count
    once.

    Scale shape — DEGREE ORIENTATION, the standard distributed-triangle
    trick (Suri & Vassilvitskii's MR-friendly variant): orient every edge
    from the (degree, id)-smaller endpoint to the larger, then count
    wedges a→b→c and close them against oriented edges a→c. Every
    triangle is counted exactly once (its orientation is acyclic), and
    the wedge join's fanout is Σ outdeg(v)² where outdeg ≤ O(√m) for
    every vertex — a plain a-b ⋈ b-c join on the unoriented graph instead
    fans out on Σ deg(v)², which one celebrity vertex turns into a
    quadratic straggler. Three hash joins total: two to attach degrees,
    one wedge + one closing equi-join (both on oriented keys)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least(F.col("a"), F.col("b")).alias("a"),
            F.greatest(F.col("a"), F.col("b")).alias("b"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("__db"))
    withdeg = e.join(da, "a").join(db, "b")
    # orient lo→hi by (deg, id): a total order, so orientation is acyclic
    lo_first = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("a") < F.col("b"))
    )
    oriented = withdeg.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
    )
    wedges = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("y")
    ).join(
        oriented.select(F.col("lo").alias("y"), F.col("hi").alias("z")), "y"
    )
    closed = wedges.join(
        oriented.select(F.col("lo").alias("x"), F.col("hi").alias("z")),
        ["x", "z"],
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))
