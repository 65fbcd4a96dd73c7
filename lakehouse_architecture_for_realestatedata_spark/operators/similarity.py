"""Similarity search over embedding columns — brute-force and LSH-bucketed.

The 100 TB design:
  - ``knn_bruteforce``: queries are BROADCAST (bounded set), corpus streams —
    one scan, no shuffle of the corpus; the top-k is a two-stage aggregate
    (per-partition local cut, then a merge of P×k survivors), never a
    per-query rank window, which would funnel every scored pair through
    #queries reducer tasks. For the moderate query counts typical of eval
    sets this is scan-bound.
  - ``knn_quantized``: same plan over scaled-integer vectors; dot products
    become exact bigint arithmetic (used by the oracle-checked query — float
    summation order can differ between engines, int sums cannot).
  - IVF-style path: assign corpus vectors to the nearest of K sampled
    centroids once (one pass), then probe only matching cells per query —
    ``ivf_assign`` + ``ivf_knn``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.functions.vectors import cosine_similarity, dot


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Global top-k (cosine desc, neighbor_id asc) per query_id WITHOUT the
    per-query window funnel.

    A ``row_number() over (partition by query_id)`` plan shuffles every
    scored (query, neighbor) pair into #queries tasks — with 10 queries and a
    100 TB corpus that is 10 straggler tasks each receiving the whole corpus.
    Instead:
      1. local top-k: group by (query_id, physical partition id) and keep the
         k best candidates of each partition (``array_sort`` over collected
         structs + ``slice`` — complete map-side, since the partition id in
         the key makes every group single-partition);
      2. global top-k: merge the P×k survivors per query (a few KB) and slice
         again.
    The result is partition-invariant: the true top-k survives any local cut.
    Sort key is (-cosine, neighbor_id) so lexicographic ``array_sort`` gives
    cosine desc with the id as deterministic tiebreak; the original cosine
    rides in the struct so no double-negation touches emitted values.
    """
    cand = F.struct(
        (-F.col("cosine")).alias("s"),
        F.col("neighbor_id").alias("n"),
        F.col("cosine").alias("c"),
    )
    local = scored.groupBy("query_id", F.spark_partition_id().alias("__pid")).agg(
        F.slice(F.array_sort(F.collect_list(cand)), 1, k).alias("__top")
    )
    merged = local.groupBy("query_id").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("__top"))), 1, k).alias("__top")
    )
    return merged.select("query_id", F.explode("__top").alias("__t")).select(
        "query_id",
        F.col("__t.n").alias("neighbor_id"),
        F.col("__t.c").alias("cosine"),
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` must be bounded (an eval/query set): it is broadcast so the
    corpus is scanned once with no shuffle; the only shuffle is the final
    per-query top-k merge — #queries × #partitions × k pre-cut candidate
    rows, never the full scored set (see ``_topk_per_query``).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity("__qv", "__cv").alias("cosine"),
        )
    )
    return _topk_per_query(scored, k)


def quantize(vec, scale: int = 1_000_000):
    """float array → bigint array (round(x*scale)): makes dot products exact
    integer sums — engine- and order-independent."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * scale).cast("bigint"))


def knn_quantized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    scale: int = 1_000_000,
) -> DataFrame:
    """Top-k cosine on scaled-integer vectors: bigint dot (exact) / double
    norms — deterministic bit-for-bit across engines and partitionings."""
    qz = quantize(F.col(vec_col), scale)
    q = queries.select(F.col(id_col).alias("query_id"), qz.alias("__qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), qz.alias("__cv"))
    d = F.aggregate(
        F.zip_with("__qv", "__cv", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    nq = F.aggregate(F.col("__qv"), F.lit(0).cast("bigint"), lambda a, v: a + v * v)
    nc = F.aggregate(F.col("__cv"), F.lit(0).cast("bigint"), lambda a, v: a + v * v)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(
                (nq > 0) & (nc > 0),
                d.cast("double") / (F.sqrt(nq.cast("double")) * F.sqrt(nc.cast("double"))),
            )
            .otherwise(F.lit(0.0))
            .alias("cosine"),
        )
    )
    return _topk_per_query(scored, k)


def ivf_assign(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 64,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: sample ``n_cells`` corpus vectors as centroids
    (deterministic hash-ordered sample — no RNG state), broadcast them, and
    assign every corpus vector to its nearest centroid. One corpus pass.

    Returns (assignments, centroids); assignments add a ``cell`` column.
    At 100 TB you would persist both, partitioned by ``cell``, so a probe
    reads only matching partitions (partition pruning on cell).

    Scale shape: centroid sampling is ``orderBy(hash).limit`` —
    TakeOrderedAndProject (per-partition heaps), NOT a row_number window,
    which would funnel the whole corpus through one task. Assignment is a
    map-side-combining ``max_by`` aggregate joined back by id (both sides
    hash-partitioned on the id — co-located), not a per-id sort window.
    """
    centroids = F.broadcast(
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(n_cells)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("__centroid"))
    )
    scored = corpus.select(id_col, vec_col).crossJoin(centroids).select(
        id_col,
        F.col("cell"),
        cosine_similarity(vec_col, "__centroid").alias("__sim"),
    )
    best_cell = scored.groupBy(id_col).agg(
        F.max_by("cell", F.struct(F.col("__sim").alias("s"), (-F.col("cell")).alias("nc"))).alias(
            "cell"
        )
    )
    assignments = corpus.join(best_cell, id_col)
    return assignments, centroids


def ivf_knn(
    assignments: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k: route each query to its ``n_probe`` nearest cells,
    then score only vectors in those cells. The scan touches ~n_probe/n_cells
    of the corpus — the scale path when brute force is too expensive."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    routed = (
        q.crossJoin(F.broadcast(centroids))
        .select("query_id", "__qv", "cell", cosine_similarity("__qv", "__centroid").alias("__sim"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("__sim").desc(), F.col("cell"))
    probes = (
        routed.withColumn("__rn", F.row_number().over(wr))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "__qv", "cell")
    )
    cand = assignments.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"), "cell"
    ).join(F.broadcast(probes), "cell")
    scored = cand.filter(F.col("neighbor_id") != F.col("query_id")).select(
        "query_id", "neighbor_id", cosine_similarity("__qv", "__cv").alias("cosine")
    )
    # dropDuplicates shuffles on (query_id, neighbor_id) — spread across
    # tasks, not per-query — then the bounded two-stage top-k merges.
    return _topk_per_query(scored.dropDuplicates(["query_id", "neighbor_id"]), k)
