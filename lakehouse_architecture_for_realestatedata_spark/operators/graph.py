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
the node — co-partitioned, one shuffle) + one min-aggregate. Lineage is
truncated every round with ``localCheckpoint`` — without it, round k's plan
contains k nested joins and the DAG (and codegen) blows up exponentially.
Convergence detection is free: labels only ever DECREASE, so the sum of all
labels is a strictly decreasing potential; equal sums ⇒ fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """(node, label) for every node appearing in ``pairs``; ``label`` is the
    minimum node id of its connected component."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    potential = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select("node", F.least("label", F.coalesce("nbr", "label")).alias("label"))
            .localCheckpoint()
        )
        new_potential = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if new_potential == potential:
            break
        potential = new_potential
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
