"""Stage-by-stage profile of minhash_lsh_dedup at sf0.1 (VERDICT r3 #1).

Times, separately and end-to-end:
  A. sketch kernel: hashed shingles -> fused bucket kernel -> explode (narrow)
  B. bucket groupBy + combos + dropDuplicates (the one shuffle)
  C. verify: semi-join trim + re-shingle + pair joins + exact Jaccard
  E2E variants: persist | checkpoint | none materialization, cold & warm cache.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.functions import sketches
from lakehouse_architecture_for_realestatedata_spark.operators.dedup import (
    _hashed_shingle_sets,
    minhash_lsh_pairs,
)
from lakehouse_architecture_for_realestatedata_spark.queries import _t
from lakehouse_architecture_for_realestatedata_spark.queries_text import _spread
from lakehouse_architecture_for_realestatedata_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(label, fn, n=3):
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{label:55s} {best:7.3f}s (best of {n})")
    return best


def main():
    spark = get_spark("profile")
    spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    # warm python workers
    _identity = F.pandas_udf("long")(lambda s: s)
    spark.range(128, numPartitions=32).select(_identity(F.col("id"))).write.mode(
        "overwrite"
    ).format("noop").save()

    def docs():
        return _spread(spark, _t(spark, SF_DIR, "documents").filter(F.col("doc_id") < 2000))

    d = docs()
    print("input partitions:", d.rdd.getNumPartitions(), "rows:", d.count())

    # Stage A: sketch + banding (narrow)
    def stage_a():
        with_h = _hashed_shingle_sets(docs(), "doc_id", "text", 3)
        buckets = with_h.select(
            "__id", sketches.minhash_buckets(F.col("__h"), 64, 16, seed=42).alias("__bk")
        )
        banded = buckets.select("__id", F.explode_outer("__bk").alias("__bucket"))
        noop(banded)

    timed("A sketch+band (narrow)", stage_a)

    # Stage A+B: + bucket groupBy + combos + dropDuplicates
    def stage_ab():
        with_h = _hashed_shingle_sets(docs(), "doc_id", "text", 3)
        buckets = with_h.select(
            "__id", sketches.minhash_buckets(F.col("__h"), 64, 16, seed=42).alias("__bk")
        )
        banded = buckets.select("__id", F.explode_outer("__bk").alias("__bucket"))
        members = (
            banded.groupBy("__bucket")
            .agg(F.sort_array(F.collect_set("__id")).alias("__ids"))
            .filter(F.size("__ids").between(2, 10_000))
        )
        n = F.size("__ids")
        combos = F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.slice(F.col("__ids"), i + 1, n - i),
                    lambda j: F.struct(
                        F.element_at(F.col("__ids"), i).alias("id_a"), j.alias("id_b")
                    ),
                ),
            )
        )
        cand = (
            members.select(F.explode(combos).alias("__p"))
            .select(F.col("__p.id_a").alias("id_a"), F.col("__p.id_b").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
        noop(cand)

    timed("A+B candidates (no materialize)", stage_ab)

    # E2E variants
    for mode in ("persist", "checkpoint"):
        def e2e(mode=mode):
            spark.catalog.clearCache()
            pairs = minhash_lsh_pairs(
                docs(), "doc_id", "text", k=3, num_hashes=64, bands=16,
                threshold=0.5, materialize=mode,
            )
            noop(pairs)

        timed(f"E2E materialize={mode} (cold cache each run)", e2e)

    # warm-cache persist (bench-like: 3 attempts, cache shared)
    spark.catalog.clearCache()

    def e2e_warm():
        pairs = minhash_lsh_pairs(
            docs(), "doc_id", "text", k=3, num_hashes=64, bands=16, threshold=0.5
        )
        noop(pairs)

    timed("E2E persist, shared cache (bench shape)", e2e_warm)
    spark.catalog.clearCache()

    # how many candidates?
    pairs = minhash_lsh_pairs(docs(), "doc_id", "text", threshold=0.5)
    print("result pairs:", pairs.count())


if __name__ == "__main__":
    main()
