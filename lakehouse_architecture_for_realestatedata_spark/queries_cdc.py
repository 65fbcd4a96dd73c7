"""CDC query: snapshot-diff changelog between two derived states of the
orders table — the read-side complement of the storage spine's MERGE upsert
(sources/tables.py; reference scripts/normalize_bronze_columns.py:145-148).

The two snapshots are DERIVED deterministically from the shared fixture (no
side-channel files), so the DuckDB oracle replays the identical diff:
  old = orders minus every 7th key            (those keys become inserts)
  new = orders minus keys ≡ 3 (mod 10),       (removed keys become deletes)
        with price doubled on keys ≡ 0 (mod 5)  (those become updates)
Price doubling is an exact IEEE double op (×2 scales the exponent), so the
update-detection comparison is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.operators.cdc import snapshot_diff
from lakehouse_architecture_for_realestatedata_spark.queries import _t, register


@register(
    "cdc_snapshot_diff",
    """
    WITH old AS (
        SELECT * FROM orders WHERE o_orderkey % 7 <> 0
    ), new AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice,
               o_orderdate, o_orderpriority
        FROM orders WHERE o_orderkey % 10 <> 3
    )
    SELECT * FROM (
        SELECT coalesce(n.o_orderkey, o.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    WHEN (n.o_custkey, n.o_orderstatus, n.o_totalprice,
                          n.o_orderdate, n.o_orderpriority) IS DISTINCT FROM
                         (o.o_custkey, o.o_orderstatus, o.o_totalprice,
                          o.o_orderdate, o.o_orderpriority)
                      THEN 'update' END AS change_type,
               CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_custkey
                    ELSE o.o_custkey END AS o_custkey,
               CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_orderstatus
                    ELSE o.o_orderstatus END AS o_orderstatus,
               CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_totalprice
                    ELSE o.o_totalprice END AS o_totalprice,
               CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_orderdate
                    ELSE o.o_orderdate END AS o_orderdate,
               CASE WHEN n.o_orderkey IS NOT NULL THEN n.o_orderpriority
                    ELSE o.o_orderpriority END AS o_orderpriority
        FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    ) WHERE change_type IS NOT NULL
    """,
    doc="Snapshot-diff CDC: insert/update/delete changelog between two "
    "deterministic derivations of orders — ONE full-outer join on the key, "
    "NULL-safe packed-struct comparison, output ∝ churn "
    "(operators/cdc.py:snapshot_diff). Feeds MERGE for log-free "
    "snapshot→incremental replication.",
)
def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 7 != 0)
    new = orders.filter(F.col("o_orderkey") % 10 != 3).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") * 2).otherwise(
            F.col("o_totalprice")
        ),
    )
    return snapshot_diff(old, new, keys=["o_orderkey"])


@register(
    "time_travel_cdc_roundtrip",
    """
    WITH v1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey <= 5000
    ), v2 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey BETWEEN 2000 AND 3000 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 6000
    )
    SELECT * FROM (
        SELECT coalesce(v2.o_orderkey, v1.o_orderkey) AS o_orderkey,
               CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                    WHEN v2.o_orderkey IS NULL THEN 'delete'
                    WHEN v1.o_orderstatus IS DISTINCT FROM v2.o_orderstatus
                      OR v1.o_totalprice IS DISTINCT FROM v2.o_totalprice
                    THEN 'update' END AS change_type,
               coalesce(v2.o_orderstatus, v1.o_orderstatus) AS o_orderstatus,
               coalesce(v2.o_totalprice, v1.o_totalprice) AS o_totalprice
        FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
    WHERE change_type IS NOT NULL
    """,
    doc="Storage time travel + CDC end-to-end as a hard oracle row: write "
    "snapshot v1 to a ParquetTable, overwrite with v2 (deletes keys "
    "<= 1000, updates status on 2000-3000, inserts 5000-6000), then diff "
    "the TIME-TRAVELED v1 read against the current read with "
    "snapshot_diff. The oracle replays both states relationally and diffs "
    "with a full outer join — insert/update/delete semantics, output "
    "proportional to churn. Pins versioned reads, overwrite isolation, "
    "and the CDC operator in one composition "
    "(reference: Delta time travel via spark/spark-defaults.conf:15-16).",
)
def q_time_travel_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.operators.cdc import snapshot_diff
    from lakehouse_architecture_for_realestatedata_spark.queries import _t
    from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v1 = orders.filter(F.col("o_orderkey") <= 5000)
    v2 = orders.filter(
        (F.col("o_orderkey") > 1000) & (F.col("o_orderkey") <= 6000)
    ).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey").between(2000, 3000), F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_tt_cdc_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    t = ParquetTable(spark, f"{root}/orders_tt")
    t.overwrite(v1)
    v1_version = t.version()
    t.overwrite(v2)
    old = t.read(version=v1_version)
    return snapshot_diff(old, t.read(), keys=["o_orderkey"], nullable_keys=False)


@register(
    "change_feed_roundtrip",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey > 800 AND o_orderkey <= 1400
    """,
    doc="Change-data-feed read as a hard oracle row: append batch 1 then "
    "batch 2 to a ParquetTable and read_changes(since=v1) — the rows added "
    "after snapshot v1 are exactly batch 2, recovered as a METADATA diff "
    "of the two manifests (data dirs are immutable, append manifests "
    "strictly additive), scanning O(changed data) never the table "
    "(sources/tables.py:read_changes; Delta CDF analogue for the "
    "append-only case).",
)
def q_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b1 = orders.filter(F.col("o_orderkey") <= 800)
    b2 = orders.filter((F.col("o_orderkey") > 800) & (F.col("o_orderkey") <= 1400))
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_cdf_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    t = ParquetTable(spark, f"{root}/orders_cdf")
    t.overwrite(b1)
    v1 = t.version()
    t.append(b2)
    return t.read_changes(since=v1)


@register(
    "schema_evolution_roundtrip",
    """
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
    FROM orders WHERE o_orderkey <= 800
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderkey > 800 AND o_orderkey <= 1400
    """,
    doc="Schema evolution (S7 mergeSchema) as a hard oracle row: append a "
    "WIDER batch (new o_orderpriority column) to a table written without "
    "it; the "
    "merged read null-fills the old rows — unionByName(allowMissing"
    "Columns) semantics at read time, no rewrite of existing data "
    "(sources/tables.py:append; Delta mergeSchema analogue).",
)
def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable

    orders = _t(spark, sf_dir, "orders")
    b1 = orders.filter(F.col("o_orderkey") <= 800).select("o_orderkey", "o_totalprice")
    b2 = orders.filter(
        (F.col("o_orderkey") > 800) & (F.col("o_orderkey") <= 1400)
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_schevo_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    t = ParquetTable(spark, f"{root}/orders_evo")
    t.overwrite(b1)
    t.append(b2, merge_schema=True)
    return t.read().select("o_orderkey", "o_totalprice", "o_orderpriority")


@register(
    "delta_interop_roundtrip",
    """
    SELECT 'v_initial' AS snapshot, o_orderstatus,
           count(*) AS n,
           cast(sum(cast(o_totalprice AS decimal(30,2))) AS double) AS total
    FROM orders WHERE o_orderkey <= 800
    GROUP BY o_orderstatus
    UNION ALL
    SELECT 'v_latest' AS snapshot, o_orderstatus,
           count(*) AS n,
           cast(sum(cast(o_totalprice AS decimal(30,2))) AS double) AS total
    FROM orders WHERE o_orderkey <= 1400
    GROUP BY o_orderstatus
    """,
    doc="Delta-FORMAT interop as a hard oracle row (sources/delta_lite.py): "
    "overwrite then append batches through the pure-PySpark Delta "
    "transaction-log writer (protocol-spec JSON commits, Hive-style "
    "partition dirs on o_orderstatus, put-if-absent version claims), then "
    "read BOTH the pre-append version (log replay time travel) and the "
    "latest snapshot back through the log reader and aggregate each. The "
    "reference stores every table as Delta (spark/Dockerfile:16, "
    "spark-defaults.conf:15-16); with the jars absent from this sandbox "
    "the open protocol is implemented directly — logs this module writes "
    "are readable by any Delta reader and vice versa (foreign-log pytest).",
)
def q_delta_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_read,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    b1 = orders.filter(F.col("o_orderkey") <= 800)
    b2 = orders.filter((F.col("o_orderkey") > 800) & (F.col("o_orderkey") <= 1400))
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_deltalite_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    path = f"{root}/orders_delta"
    v1 = delta_write(b1, path, mode="overwrite", partition_by=["o_orderstatus"])
    delta_write(b2, path, mode="append")

    def agg(df, tag):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .cast("double")
            .alias("total"),
        ).select(F.lit(tag).alias("snapshot"), "o_orderstatus", "n", "total")

    return agg(delta_read(spark, path, version=v1), "v_initial").unionByName(
        agg(delta_read(spark, path), "v_latest")
    )


@register(
    "keyed_delete_roundtrip",
    """
    SELECT o_orderkey, o_custkey,
           cast(cast(o_totalprice AS decimal(30,2)) AS double) AS o_totalprice
    FROM orders
    WHERE o_orderkey <= 1400
      AND NOT (o_custkey IN (3, 7, 11) OR o_totalprice > 400000)
    """,
    doc="Right-to-be-forgotten / retention delete as a hard oracle row "
    "(sources/tables.py:delete_where): load orders into a versioned "
    "table, DELETE a customer id-list (the GDPR erasure shape, Column "
    "predicate) and then an out-of-range price slice via (col, op, value) "
    "conditions — the zonemap-pruned path that rewrites only data dirs "
    "whose min/max admit a match, O(expired slice) not O(table). The "
    "surviving read must equal the oracle's double-negated predicate.",
)
def q_keyed_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1400).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_totalprice").cast("decimal(30,2)").alias("o_totalprice"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_delete_{os.path.basename(sf_dir.rstrip('/'))}",
    )
    t = ParquetTable(spark, f"{root}/orders_del")
    t.overwrite(orders)
    t.delete_where(F.col("o_custkey").isin(3, 7, 11))
    t.delete_where(("o_totalprice", ">", 400000.0))
    return t.read().select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )
