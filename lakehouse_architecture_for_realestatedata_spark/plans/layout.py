"""Physical table layout policy — the 100 TB concerns the reference leaves on
the table: no writer in the reference declares partition columns anywhere
(reference: scripts/load_bronze_to_table.py:158-161 and dbt/dbt_project.yml:26-37
set none), so every downstream date-ranged query scans the full table. This
module is the layout layer SURVEY.md §4 flags as the first extension.

Three levers, in the order they pay off at scale:
  1. **Hive partitioning** (``write_partitioned``) on a low-cardinality,
     always-filtered key (date_key, region): partition PRUNING removes whole
     directories at plan time — the scan never lists them.
  2. **Range clustering + in-file sort** (``cluster_by``): within each
     partition, co-locate rows by the secondary filter keys so parquet
     row-group min/max stats skip pages (data skipping). Range partitioning
     also fixes file-count/size (no 100k tiny files, no 10 GB monsters).
  3. **Z-order interleave** (``z_value``) when TWO columns are filtered
     independently: lexicographic sort favors the leading column only; the
     interleaved-bit value gives both columns locality in the same file set.

All plain parquet + built-in expressions — the same policy applies unchanged
to Delta/Iceberg writers (their OPTIMIZE ZORDER is this, managed).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    sort_within: list[str] | None = None,
) -> None:
    """Write hive-partitioned parquet; optionally sort rows within each task
    so parquet min/max stats are tight for ``sort_within`` columns.

    Partition columns must be low-cardinality (days, regions — NOT ids):
    each distinct value is a directory, and 10M directories is its own
    pathology."""
    out = df
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def z_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Z-order (Morton) value: interleave the low ``bits`` bits of each
    column. Callers pass non-negative integer-valued columns (days since
    epoch, surrogate keys, bucketed doubles). Pure scalar bit ops —
    codegen'd, no UDF, no shuffle of its own.

    bits × len(cols) must fit in 63; 16 bits × 2 cols (65k distinct each) is
    the standard BI sweet spot."""
    cs = [F.col(c).cast("bigint") if isinstance(c, str) else c.cast("bigint") for c in cols]
    n = len(cs)
    if bits * n > 63:
        raise ValueError("bits * len(cols) must be <= 63")
    mask_one = F.lit(1).cast("bigint")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftrightunsigned(c, b).bitwiseAND(mask_one)
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def cluster_by(
    df: DataFrame,
    cols: list[str],
    n_partitions: int | None = None,
    zorder: bool = False,
    bits: int = 16,
) -> DataFrame:
    """Cluster rows for data skipping: range-repartition on the cluster key
    (or its z-value) and sort within each output partition, so every written
    file covers a narrow key range and parquet row-group stats prune reads.

    This is exactly one shuffle — the write-side cost that buys every future
    read. ``n_partitions`` controls output file count (size for ~128 MB-1 GB
    per file at scale)."""
    if zorder:
        key = z_value(cols, bits).alias("__z")
        out = df.withColumn("__z", key)
        parts = [F.col("__z")]
        out = (
            out.repartitionByRange(n_partitions, *parts)
            if n_partitions
            else out.repartitionByRange(*parts)
        )
        return out.sortWithinPartitions("__z").drop("__z")
    parts = [F.col(c) for c in cols]
    out = (
        df.repartitionByRange(n_partitions, *parts)
        if n_partitions
        else df.repartitionByRange(*parts)
    )
    return out.sortWithinPartitions(*cols)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Catalog-registered bucketed table: rows are hash-partitioned into
    ``n_buckets`` files per partition AT WRITE TIME, so a later join or
    aggregation on ``bucket_cols`` between co-bucketed tables needs NO
    exchange — the shuffle was paid once, at write. The lever for a fact
    table joined on the same key by every nightly job. ``sort_cols`` adds
    in-bucket ordering (sort-merge join without the sort)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def partition_stats(
    spark: SparkSession, path: str, partition_cols: list[str] | None = None
) -> DataFrame:
    """Row counts per hive partition (or per file when ``partition_cols`` is
    None) of a written dataset — the skew check: a partition 100× the median
    means the partition key needs salting or a different grain."""
    df = spark.read.parquet(path)
    if partition_cols:
        return df.groupBy(*partition_cols).count()
    return df.groupBy(F.input_file_name().alias("file")).count()
