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
        f"lakehouse_tt_cdc_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
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
        f"lakehouse_cdf_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
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
        f"lakehouse_schevo_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
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
        f"lakehouse_deltalite_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
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
        f"lakehouse_delete_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    t = ParquetTable(spark, f"{root}/orders_del")
    t.overwrite(orders)
    t.delete_where(F.col("o_custkey").isin(3, 7, 11))
    t.delete_where(("o_totalprice", ">", 400000.0))
    return t.read().select(
        "o_orderkey", "o_custkey", F.col("o_totalprice").cast("double").alias("o_totalprice")
    )


# ---------------------------------------------------------------------------
# Column-mapped Delta bronze → silver end-to-end (reader protocol 2)
# ---------------------------------------------------------------------------

#: Logical (reference bronze, Vietnamese) name per normalized fixture column —
#: the inverse of plans.medallion.DEFAULT_RENAME_MAP for the columns the
#: silver model consumes (reference scripts/normalize_bronze_columns.py:11-50).
_COLMAP_RAW_NAMES = {
    "list_id": "list_id",
    "title": "title",
    "price": "price",
    "address": "Địa chỉ",
    "area_raw": "Diện tích",
    "bedrooms_raw": "Số phòng ngủ",
    "bathrooms_raw": "Số phòng vệ sinh",
    "legal_status_raw": "Giấy tờ pháp lý",
    "ward_raw": "Phường, thị xã, thị trấn",
    "district_raw": "Quận, Huyện",
    "province_raw": "Tỉnh, thành phố",
    "file_modification_time": "file_modification_time",
}

#: delta-spark-style physical names (columnMapping.mode=name mints opaque
#: "col-<uuid>" names; fixed hex keeps the fixture deterministic).
_COLMAP_PHYS_NAMES = {
    norm: f"col-{i:02d}a7f3{i:02x}" for i, norm in enumerate(_COLMAP_RAW_NAMES, 1)
}


def _write_colmap_bronze(spark: SparkSession, path: str) -> None:
    """Emulate what the REFERENCE's bronze writer produces
    (load_bronze_to_table.py:93 sets ``columnMapping.mode=name``): parquet
    data files under opaque PHYSICAL column names, Hive-partitioned on the
    physical province column (NULL province included), and a hand-written
    ``_delta_log`` whose metaData carries ``delta.columnMapping.
    physicalName`` annotations, mode=name configuration, and a protocol-2
    reader requirement — a FOREIGN log this module's writer refuses to
    produce, exercised read-only.

    Written DRIVER-SIDE with pyarrow (the checkpoint-writer precedent): a
    7-row local-relation Spark write costs ~0.15 s PER EXECUTOR THREAD in
    empty-task commits on local[32] — five seconds of pure overhead for a
    fixture pyarrow lays out in milliseconds. The Hive dirs, physical
    column names, and percent-encoded log paths are byte-identical to
    what the Spark writer produced."""
    import datetime
    import json
    import os
    import shutil
    from urllib.parse import quote, unquote

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from lakehouse_architecture_for_realestatedata_spark.queries_pipeline import (
        _BRONZE_ROWS,
    )

    shutil.rmtree(path, ignore_errors=True)
    norm_names = list(_COLMAP_RAW_NAMES)  # incl. file_modification_time
    # rows keyed by normalized name; mtime string -> UTC timestamp
    rows = [
        dict(zip(norm_names[:-1], r[:-1]))
        | {
            "file_modification_time": datetime.datetime.strptime(
                r[-1], "%Y-%m-%d %H:%M:%S"
            ).replace(tzinfo=datetime.timezone.utc)
        }
        for r in _BRONZE_ROWS
    ]

    def hive_escape(v: str) -> str:
        # Spark's ExternalCatalogUtils.escapePathName special set
        out = []
        for ch in v:
            if ch in '"#%\'*/:=?\\\x7f{[]^' or ord(ch) < 0x20:
                out.append(f"%{ord(ch):02X}")
            else:
                out.append(ch)
        return "".join(out)

    part_phys = _COLMAP_PHYS_NAMES["province_raw"]
    by_prov: dict[str | None, list[dict]] = {}
    for r in rows:
        by_prov.setdefault(r["province_raw"], []).append(r)
    data_names = [n for n in norm_names if n != "province_raw"]
    for gi, prov in enumerate(sorted(by_prov, key=lambda v: (v is None, v))):
        seg = (
            "__HIVE_DEFAULT_PARTITION__" if prov is None else hive_escape(prov)
        )
        d = os.path.join(path, f"{part_phys}={seg}")
        os.makedirs(d, exist_ok=True)
        grp = by_prov[prov]
        arrays, fields = [], []
        for n in data_names:
            phys = _COLMAP_PHYS_NAMES[n]
            if n == "file_modification_time":
                arrays.append(
                    _pa.array(
                        [r[n] for r in grp], _pa.timestamp("us", tz="UTC")
                    )
                )
                fields.append(_pa.field(phys, _pa.timestamp("us", tz="UTC")))
            else:
                arrays.append(_pa.array([r[n] for r in grp], _pa.string()))
                fields.append(_pa.field(phys, _pa.string()))
        _pq.write_table(
            _pa.table(arrays, schema=_pa.schema(fields)),
            os.path.join(d, f"part-{gi:05d}.parquet"),
        )

    adds = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            fp = os.path.join(root, f)
            if not f.endswith(".parquet"):
                os.unlink(fp)  # _SUCCESS / .crc writer artifacts
                continue
            if _pq.ParquetFile(fp).metadata.num_rows == 0:
                os.unlink(fp)  # single-row local-relation writes can emit empty parts
                continue
            rel = os.path.relpath(fp, path).replace(os.sep, "/")
            pv = {}
            seg = os.path.dirname(rel)
            if seg:
                k, _, v = seg.partition("=")
                pv[unquote(k)] = (
                    None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
                )
            adds.append(
                {
                    "add": {
                        # delta-spark stores the path as a percent-encoded
                        # URI (Path.toUri): the Vietnamese partition dir's
                        # UTF-8 bytes and spaces all encode — the foreign
                        # form our reader must decode
                        "path": quote(rel, safe="/!$&'()*+,;=:@-._~"),
                        "partitionValues": pv,
                        "size": os.path.getsize(fp),
                        "modificationTime": 0,
                        "dataChange": True,
                    }
                }
            )
    fields = []
    for i, (norm, logical) in enumerate(_COLMAP_RAW_NAMES.items(), 1):
        fields.append(
            {
                "name": logical,
                "type": "timestamp" if norm == "file_modification_time" else "string",
                "nullable": True,
                "metadata": {
                    "delta.columnMapping.id": i,
                    "delta.columnMapping.physicalName": _COLMAP_PHYS_NAMES[norm],
                },
            }
        )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {
            "metaData": {
                "id": "colmap-bronze-fixture",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": json.dumps({"type": "struct", "fields": fields}),
                # spec: partitionColumns stay LOGICAL; add.partitionValues
                # key on PHYSICAL names
                "partitionColumns": ["Tỉnh, thành phố"],
                "configuration": {
                    "delta.columnMapping.mode": "name",
                    "delta.columnMapping.maxColumnId": str(len(fields)),
                },
            }
        },
    ] + sorted(adds, key=lambda a: a["add"]["path"])
    log = os.path.join(path, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a, ensure_ascii=False) for a in actions) + "\n")


def _colmap_silver_oracle() -> str:
    from lakehouse_architecture_for_realestatedata_spark.queries_pipeline import (
        _SILVER_CTE,
        _sql_values,
    )

    return f"""
    WITH {_SILVER_CTE.format(values=_sql_values())}
    SELECT property_id, title, updated_at_ts, area, bedrooms, bathrooms,
           price_in_billions, address, ward, district, province, legal_status,
           data_quality_flag
    FROM silver
    """


@register(
    "delta_colmap_bronze_silver",
    _colmap_silver_oracle(),
    doc="Reference-bronze interop end to end (sources/delta_lite.py column "
    "mapping + plans/medallion.py): a FOREIGN column-mapped Delta table — "
    "the exact layout the reference's bronze writer produces "
    "(load_bronze_to_table.py:93, columnMapping.mode=name: opaque physical "
    "parquet column names, delta.columnMapping.physicalName annotations, "
    "minReaderVersion 2, Hive-partitioned on the physical province column "
    "incl. a NULL partition) — is read through the pure-PySpark log "
    "reader, which resolves physical→logical names post-scan, then flows "
    "through the reference's own normalize (Vietnamese→English bulk "
    "rename, scripts/normalize_bronze_columns.py:11-50) into the full "
    "silver staging model. The oracle is the silver model's SQL over the "
    "same VALUES — proving 'reads what the reference stack writes' down "
    "to parsed values and quality flags.",
)
def q_delta_colmap_bronze_silver(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.plans.medallion import (
        normalize_columns,
        silver_properties,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_read,
    )

    path = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_colmap_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
        "bronze_raw_properties",
    )
    _write_colmap_bronze(spark, path)
    raw = delta_read(spark, path)  # logical (Vietnamese) column names
    bronze = normalize_columns(raw)
    silver = silver_properties(
        bronze, created_at=F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    )
    return silver.select(
        "property_id",
        "title",
        "updated_at_ts",
        "area",
        "bedrooms",
        "bathrooms",
        "price_in_billions",
        "address",
        "ward",
        "district",
        "province",
        "legal_status",
        "data_quality_flag",
    )


@register(
    "delta_optimize_skipping_scan",
    """
    SELECT event_type,
           count(*) AS n,
           min(event_id) AS first_event,
           cast(sum(cast(value AS decimal(30,6))) AS double) AS total_value
    FROM events
    WHERE value BETWEEN 50.0 AND 150.0
    GROUP BY event_type
    """,
    doc="Delta OPTIMIZE + data skipping end to end (sources/delta_lite.py): "
    "events land in four interleaved appends (every file spans the full "
    "value range — un-prunable), then one clustered OPTIMIZE rewrite "
    "(range shuffle on value, adds/removes committed dataChange:false per "
    "protocol, per-file min/max stats written into the new add actions "
    "from the parquet footers), then the probe reads through "
    "delta_read(where=value BETWEEN ...), which drops every file whose "
    "stats prove the range empty BEFORE Spark lists it. The oracle is the "
    "same predicate straight over the source parquet — skipping must be "
    "purely a scan reduction, never a row change. This is Delta's "
    "OPTIMIZE ZORDER + stats-skipping loop, the reason a 100 TB table's "
    "log carries per-file stats; pytest pins the file-count reduction "
    "(tests/test_delta_lite.py).",
)
def q_delta_optimize_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_optimize,
        delta_read,
        delta_write,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_deltaopt_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/events_delta"
    # interleaved slices: each append (hence each file) covers the whole
    # value range, so the pre-OPTIMIZE layout cannot prune the probe
    delta_write(ev.filter(F.col("event_id") % 4 == 0), path, mode="overwrite")
    for r in (1, 2, 3):
        delta_write(ev.filter(F.col("event_id") % 4 == r), path, mode="append")
    delta_optimize(spark, path, cluster_cols=["value"], n_files=8)
    probe = delta_read(spark, path, where=[("value", "between", (50.0, 150.0))])
    return probe.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("first_event"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
    )


@register(
    "delta_format_front_door",
    """
    SELECT event_type,
           count(*) AS n,
           min(event_id) AS first_event,
           cast(sum(cast(value AS decimal(30,6))) AS double) AS total_value
    FROM events
    WHERE user_id <= 2000
    GROUP BY event_type
    """,
    doc="Spark-format front door for the open Delta protocol "
    "(sources/delta_source.py, Python Data Source API): events flow "
    "through df.write.format('delta_lite') (task-written parquet files + "
    "per-file stats, driver put-if-absent commit) and come back through "
    "spark.read.format('delta_lite') with a pushed predicate — Spark "
    "hands the filter to pushFilters, the reader prunes files by "
    "add-action stats, Spark re-applies the filter row-level. This is "
    "the surface the reference stack actually calls "
    "(load_bronze_to_table.py:158 uses format('delta'), not a function "
    "API). The oracle is the same predicate straight over the source "
    "parquet.",
)
def q_delta_format_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_source import (
        register_delta_lite_source,
    )

    register_delta_lite_source(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_deltafmt_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/events_delta"
    ev.write.format("delta_lite").mode("overwrite").save(path)
    got = spark.read.format("delta_lite").load(path).filter(F.col("user_id") <= 2000)
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("first_event"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
    )


@register(
    "delta_cdf_merge_changes",
    """
    SELECT 'update_preimage' AS change_type, count(*) AS n,
           cast(sum(cast(o_totalprice AS decimal(30,2))) AS double) AS total
    FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000
    UNION ALL
    SELECT 'update_postimage' AS change_type, count(*) AS n,
           cast(sum(cast(o_totalprice + 1 AS decimal(30,2))) AS double) AS total
    FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 1000
    UNION ALL
    SELECT 'insert' AS change_type, count(*) AS n,
           cast(sum(cast(o_totalprice + 1 AS decimal(30,2))) AS double) AS total
    FROM orders WHERE o_orderkey > 1000 AND o_orderkey <= 1500
    """,
    doc="Change Data Feed on the open Delta format (sources/delta_lite.py): "
    "a CDF-enabled table (delta.enableChangeDataFeed + the "
    "minWriterVersion-4 bump) takes a file-pruned MERGE whose commit "
    "writes precise row-level changes into _change_data (cdc actions, "
    "per protocol: readers of a cdc-bearing commit use ONLY those files); "
    "delta_read_changes replays exactly that commit and the query "
    "aggregates per _change_type. The oracle derives the same "
    "pre/post/insert sets straight from the source table — the feed must "
    "be exact, not approximate. This is how a downstream consumer "
    "incrementally maintains an aggregate off a 100 TB mutable table: "
    "O(changed rows) per sync, never a rescan.",
)
def q_delta_cdf_merge_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_enable_cdf,
        delta_merge,
        delta_read_changes,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_deltacdf_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_cdf"
    if os.path.isdir(path):
        shutil.rmtree(path)  # CDF versions accumulate; rebuild per run
    delta_write(orders.filter(F.col("o_orderkey") <= 1000), path)
    delta_enable_cdf(spark, path)
    src = orders.filter(
        (F.col("o_orderkey") > 500) & (F.col("o_orderkey") <= 1500)
    ).withColumn("o_totalprice", F.col("o_totalprice") + 1)
    v = delta_merge(src, path, key="o_orderkey")
    ch = delta_read_changes(spark, path, v, v)
    return ch.groupBy(F.col("_change_type").alias("change_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .cast("double")
        .alias("total"),
    )


@register(
    "delta_stream_pipe_roundtrip",
    """
    SELECT event_type,
           count(*) AS n,
           cast(sum(cast(value AS decimal(30,6))) AS double) AS total_value
    FROM events
    WHERE event_id % 5 <> 0
    GROUP BY event_type
    """,
    doc="Structured Streaming over the open Delta format end to end "
    "(sources/delta_source.py): events land in a delta_lite table in two "
    "batches; a streaming query tails its transaction log "
    "(readStream.format('delta_lite'), offsets = commit versions), "
    "filters, and writes through the exactly-once streaming sink "
    "(writeStream.format('delta_lite') + txnAppId epoch watermarks) with "
    "Trigger.AvailableNow; the sink table is then aggregated. The oracle "
    "is the same filter+aggregate straight over the source parquet — the "
    "pipe must deliver every committed row exactly once. At scale this "
    "is the bronze->silver continuous pipeline: each micro-batch reads "
    "O(new commits), never the table.",
)
def q_delta_stream_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_write,
        delta_read,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_source import (
        register_delta_lite_source,
    )

    register_delta_lite_source(spark)
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_deltapipe_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if os.path.isdir(root):
        shutil.rmtree(root)  # fresh pipe per run (checkpoint offsets are stateful)
    src, dst, ckpt = f"{root}/src", f"{root}/dst", f"{root}/ckpt"
    delta_write(ev.filter(F.col("event_id") % 2 == 0), src)
    delta_write(ev.filter(F.col("event_id") % 2 == 1), src, mode="append")
    q = (
        spark.readStream.format("delta_lite")
        .load(src)
        .filter(F.col("event_id") % 5 != 0)
        .writeStream.format("delta_lite")
        .option("txnAppId", "pipe")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start(dst)
    )
    q.awaitTermination(300)
    return delta_read(spark, dst).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
    )


@register(
    "delta_colmap_merge_roundtrip",
    """
    SELECT o_orderkey, o_orderstatus,
           cast(cast(o_totalprice AS decimal(30,2))
                + CASE WHEN o_orderkey > 500 THEN 1 ELSE 0 END AS double)
               AS price
    FROM orders
    WHERE o_orderkey <= 1600
    """,
    doc="Two-way column-mapping interop (VERDICT r9 #3, "
    "sources/delta_lite.py): CREATE a Delta table in the reference "
    "bronze writers' own layout — columnMapping.mode=name, protocol "
    "(2,5), col-<uuid> physicalName/id minted per field, maxColumnId in "
    "the table configuration (load_bronze_to_table.py:93) — then APPEND "
    "a second batch and MERGE an overlapping upsert through the "
    "file-pruned rewrite path, every write resolving logical→physical "
    "names before a file lands. The read-back must equal the oracle's "
    "closed-form final state over the source parquet: rows <= 500 "
    "untouched, 500 < k <= 1400 updated (+1), 1400 < k <= 1600 "
    "inserted. Completes the interop delta_colmap_bronze_silver opened: "
    "the engine now CONTINUES the reference's daily bronze pipeline "
    "(normalize_bronze_columns.py:145-148), not just reads it.",
)
def q_delta_colmap_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_merge,
        delta_read,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_colmap_merge_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_cm"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    delta_write(
        orders.filter(F.col("o_orderkey") <= 1000), path, column_mapping="name"
    )
    delta_write(
        orders.filter(
            (F.col("o_orderkey") > 1000) & (F.col("o_orderkey") <= 1400)
        ),
        path,
    )
    src = orders.filter(
        (F.col("o_orderkey") > 500) & (F.col("o_orderkey") <= 1600)
    ).withColumn("price", F.col("price") + F.lit(1).cast("decimal(30,2)"))
    delta_merge(src, path, key="o_orderkey")
    got = delta_read(spark, path)
    return got.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


@register(
    "delta_deletion_vector_read",
    """
    SELECT o_orderkey, o_orderstatus,
           cast(cast(o_totalprice AS decimal(30,2)) AS double) AS price
    FROM (
        SELECT o_orderkey, o_orderstatus, o_totalprice,
               row_number() OVER (ORDER BY o_orderkey) AS rn
        FROM orders WHERE o_orderkey <= 1200
    )
    WHERE rn > 100 AND rn NOT IN (501, 778)
    """,
    doc="Deletion-vector read (VERDICT r9 #7, sources/delta_lite.py "
    "reader protocol 3): orders land as ONE row-ordered parquet file, "
    "then a foreign DELETE commit re-adds that file with an INLINE "
    "deletion vector (storageType 'i': Z85 payload zero-padded to a "
    "4-byte multiple, delta-spark's Base85Codec wire shape; portable "
    "RoaringBitmapArray — a run container for row indexes 0..99 plus two "
    "array-container singletons 500 and 777, mixing container types on "
    "purpose) under a protocol-3 readerFeatures bump. delta_read must "
    "serve exactly the surviving rows — the oracle is the closed-form "
    "row_number complement over the source parquet. This is the read "
    "path a delta-spark 3.x migrant needs: DELETE/MERGE there write DVs "
    "instead of rewriting files.",
)
def q_delta_deletion_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        _claim_version,
        _rbm_array_bytes,
        _z85encode_padded,
        delta_read,
        delta_write,
    )

    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1200)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
        )
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")  # row_index == rank - 1
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_dv_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_dv"
    if os.path.isdir(path):
        shutil.rmtree(path)  # rebuild per run (versions accumulate)
    delta_write(orders, path)
    log = os.path.join(path, "_delta_log")
    acts = [_json.loads(l) for l in open(os.path.join(log, f"{0:020d}.json"))]
    add0 = next(a["add"] for a in acts if "add" in a)
    deleted = list(range(100)) + [500, 777]
    blob = _rbm_array_bytes(deleted)
    v1 = [
        {
            "commitInfo": {
                "timestamp": 1,
                "operation": "DELETE",
                "operationParameters": {},
                "engineInfo": "delta-spark-fixture",
            }
        },
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }
        },
        {"remove": {"path": add0["path"], "deletionTimestamp": 1, "dataChange": True}},
        {
            "add": add0
            | {
                "deletionVector": {
                    "storageType": "i",
                    "pathOrInlineDv": _z85encode_padded(blob),
                    "sizeInBytes": len(blob),
                    "cardinality": len(deleted),
                }
            }
        },
    ]
    _claim_version(log, 1, "\n".join(_json.dumps(a) for a in v1) + "\n")
    got = delta_read(spark, path)
    return got.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


@register(
    "delta_native_front_door",
    """
    SELECT event_type,
           count(*) AS n,
           min(event_id) AS first_event,
           cast(sum(cast(value AS decimal(30,6))) AS double) AS total_value
    FROM events
    WHERE user_id <= 2000
    GROUP BY event_type
    """,
    doc="Native-API twin of delta_format_front_door (VERDICT r9 #8): the "
    "IDENTICAL workload — write events to a Delta table, read back with "
    "a pushed predicate, aggregate — through delta_write/delta_read "
    "instead of the format('delta_lite') Python Data Source. The format "
    "path pays an Arrow hop (JVM -> Python batches) per partition on "
    "read and a Python task writer; the native path scans with Spark's "
    "own JVM parquet reader over the log-pruned file list. BENCH runs "
    "both keys so the compatibility surface's overhead stays quantified "
    "(format-minus-native = the Arrow-hop cost). Same oracle as the "
    "format twin.",
)
def q_delta_native_front_door(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_read,
        delta_write,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_deltanative_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/events_delta"
    delta_write(ev, path, mode="overwrite")
    got = delta_read(spark, path, where=[("user_id", "<=", 2000)])
    return got.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("first_event"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
    )


@register(
    "delta_dv_delete_roundtrip",
    """
    SELECT o_orderkey, o_orderstatus,
           cast(cast(o_totalprice AS decimal(30,2)) AS double) AS price
    FROM orders
    WHERE o_orderkey <= 1500
      AND NOT (o_orderstatus = 'F' AND o_orderkey <= 700)
      AND NOT (o_totalprice > 350000)
    """,
    doc="DV-WRITING DELETE end to end (sources/delta_lite.py "
    "delta_enable_dvs + _delete_with_dvs — delta-spark 3.x DELETE "
    "semantics): orders land in a Delta table, deletion vectors are "
    "enabled (reader 3 / writer 7 feature upgrade), then two predicate "
    "deletes mark rows in per-file roaring bitmaps — the parquet bytes "
    "are never rewritten, each commit re-adds the same files with "
    "CRC-checked DV descriptors, the second delete UNIONS with the "
    "first, and the read applies the bitmaps by parquet row index. "
    "Cost O(matched rows), not O(touched bytes): a 10-row erasure on a "
    "1 GB file writes ~50 bytes. The oracle is the double-negated "
    "predicate over the source parquet.",
)
def q_delta_dv_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_delete_where,
        delta_enable_dvs,
        delta_read,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1500).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_dvdel_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_dvdel"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    delta_write(orders, path)
    delta_enable_dvs(spark, path)
    delta_delete_where(
        spark, path, ("o_orderstatus", "=", "F"), ("o_orderkey", "<=", 700)
    )
    delta_delete_where(spark, path, ("price", ">", 350000.0))
    got = delta_read(spark, path)
    return got.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


@register(
    "delta_alter_columns_roundtrip",
    """
    SELECT o_orderkey,
           cast(cast(o_totalprice AS decimal(30,2))
                + CASE WHEN o_orderkey > 600 THEN 1 ELSE 0 END AS double)
               AS gia,
           CASE WHEN o_orderkey > 600 THEN 'merged' END AS note
    FROM orders
    WHERE o_orderkey <= 900
    """,
    doc="ALTER TABLE column family end to end (sources/delta_lite.py "
    "metadata-only schema evolution under column mapping): orders land "
    "in a colmap table, then RENAME COLUMN price->gia (logical name "
    "changes, physicalName keeps resolving the untouched files), DROP "
    "COLUMN o_orderstatus (bytes stay, invisible), ADD COLUMN note "
    "(fresh physicalName, old files read NULL), and a MERGE through the "
    "altered schema updates gia and fills note on half the keys — zero "
    "data files rewritten by the three ALTERs. The oracle is the "
    "closed-form final state over the source parquet.",
)
def q_delta_alter_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_add_column,
        delta_drop_column,
        delta_merge,
        delta_read,
        delta_rename_column,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 900).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_alter_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_alter"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    delta_write(orders, path, column_mapping="name")
    delta_rename_column(spark, path, "price", "gia")
    delta_drop_column(spark, path, "o_orderstatus")
    delta_add_column(spark, path, "note", "string")
    src = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") > 600) & (F.col("o_orderkey") <= 900))
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(30,2)") + 1).alias("gia"),
            F.lit("merged").alias("note"),
        )
    )
    delta_merge(src, path, key="o_orderkey")
    got = delta_read(spark, path)
    return got.select(
        "o_orderkey", F.col("gia").cast("double").alias("gia"), "note"
    )


@register(
    "delta_clone_divergence",
    """
    SELECT o_orderkey, o_orderstatus,
           cast(cast(o_totalprice AS decimal(30,2))
                + CASE WHEN o_orderkey > 500 THEN 1 ELSE 0 END AS double)
               AS price
    FROM orders
    WHERE o_orderkey <= 1100
      AND NOT (o_orderkey <= 200)
    """,
    doc="SHALLOW CLONE divergence (sources/delta_lite.py delta_clone): "
    "orders land in a source table, a clone's v0 references those files "
    "by absolute file: URI (zero bytes copied), then the CLONE deletes "
    "keys <= 200 and MERGEs a +1 price bump onto keys 500-1100 — "
    "rewrites replacing absolute references with clone-local files — "
    "while the SOURCE stays byte-identical (its untouched read feeds "
    "nothing here but is asserted in pytest). The oracle is the clone's "
    "closed-form final state over the source parquet.",
)
def q_delta_clone_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_clone,
        delta_delete_where,
        delta_merge,
        delta_read,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1100).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_clone_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if os.path.isdir(root):
        shutil.rmtree(root)  # versions accumulate; rebuild per run
    src, dst = f"{root}/orders_src", f"{root}/orders_clone"
    delta_write(orders, src)
    delta_clone(spark, src, dst)
    delta_delete_where(spark, dst, ("o_orderkey", "<=", 200))
    bump = orders.filter(F.col("o_orderkey") > 500).withColumn(
        "price", F.col("price") + 1
    )
    delta_merge(bump, dst, key="o_orderkey")
    got = delta_read(spark, dst)
    return got.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


@register(
    "delta_restore_roundtrip",
    """
    SELECT o_orderkey, o_orderstatus,
           cast(cast(o_totalprice AS decimal(30,2)) AS double) AS price
    FROM orders
    WHERE o_orderkey <= 1000 AND o_orderkey > 300
    """,
    doc="RESTORE TO VERSION AS OF end to end (sources/delta_lite.py "
    "delta_restore:1613 — delta-spark parity): orders land as v0, a "
    "DELETE of keys <= 300 commits v1, a MERGE bumps prices on keys "
    "> 700 as v2, then RESTORE to v1 undoes the merge as a NEW commit — "
    "metadata-only: the v1 files re-add by reference, the v2 files "
    "remove, no data bytes move, and history/time-travel to v2 is "
    "preserved (pytest pins that part). The read after restore must "
    "equal the v1 state exactly — the oracle is that state's closed "
    "form over the source parquet (delete applied, merge absent).",
)
def q_delta_restore_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_delete_where,
        delta_merge,
        delta_read,
        delta_restore,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_restore_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_restore"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    delta_write(orders, path)                                      # v0
    v1 = delta_delete_where(spark, path, ("o_orderkey", "<=", 300))  # v1
    bump = orders.filter(F.col("o_orderkey") > 700).withColumn(
        "price", F.col("price") + 1
    )
    delta_merge(bump, path, key="o_orderkey")                      # v2
    delta_restore(spark, path, v1)                                 # v3 == v1 state
    got = delta_read(spark, path)
    return got.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


@register(
    "delta_generated_columns",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey BETWEEN 400 AND 700 THEN 'merged'
                ELSE o_orderstatus END AS status,
           o_orderkey % 97 AS okey_mod
    FROM orders
    WHERE o_orderkey <= 900
    """,
    doc="GENERATED ALWAYS AS columns end to end (sources/delta_lite.py "
    "_apply_generated:1989): v0 writes keys <= 600 WITH correct "
    "okey_mod values, a raw metadata commit (writer protocol 4, the "
    "shape delta-spark's CREATE TABLE ... GENERATED ALWAYS AS emits) "
    "declares delta.generationExpression = 'o_orderkey % 97' on the "
    "column, then an APPEND of keys 601..900 OMITS the column — the "
    "engine computes it from the stored expression — and a MERGE on "
    "keys 400..700 RECOMPUTES it on the assembled frame (GENERATED "
    "ALWAYS semantics: source values never override the expression). "
    "All-integer arithmetic, so the oracle is the exact closed form.",
)
def q_delta_generated_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        _claim_version,
        delta_merge,
        delta_read,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 900).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        (F.col("o_orderkey") % 97).alias("okey_mod"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_gencol_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_gencol"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    delta_write(orders.filter(F.col("o_orderkey") <= 600), path)   # v0
    schema = {
        "type": "struct",
        "fields": [
            {"name": "o_orderkey", "type": "long", "nullable": True, "metadata": {}},
            {"name": "status", "type": "string", "nullable": True, "metadata": {}},
            {
                "name": "okey_mod",
                "type": "long",
                "nullable": True,
                "metadata": {"delta.generationExpression": "o_orderkey % 97"},
            },
        ],
    }
    acts = [
        {"commitInfo": {"timestamp": 1, "operation": "SET TBLPROPERTIES",
                        "operationParameters": {}, "engineInfo": "fixture"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {"metaData": {
            "id": "gencol-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {},
        }},
    ]
    _claim_version(
        os.path.join(path, "_delta_log"), 1,
        "\n".join(_json.dumps(a) for a in acts) + "\n",
    )
    # append WITHOUT the generated column: computed from the expression
    delta_write(
        orders.filter(F.col("o_orderkey") > 600).select("o_orderkey", "status"),
        path,
        mode="append",
    )
    # merge recomputes the generated column on the assembled frame
    src = (
        orders.filter(F.col("o_orderkey").between(400, 700))
        .select("o_orderkey", F.lit("merged").alias("status"))
    )
    delta_merge(src, path, key="o_orderkey")
    return delta_read(spark, path).select("o_orderkey", "status", "okey_mod")


@register(
    "delta_dv_purge_vacuum",
    """
    SELECT o_orderkey, o_orderstatus,
           cast(cast(o_totalprice AS decimal(30,2)) AS double) AS price
    FROM orders
    WHERE o_orderkey <= 1200
      AND NOT (o_orderstatus = 'F' AND o_orderkey <= 500)
    """,
    doc="DV purge + vacuum end to end (sources/delta_lite.py "
    "delta_optimize:2315 as REORG ... APPLY (PURGE) + "
    "delta_vacuum:3836): a DV-writing DELETE marks rows in per-file "
    "bitmaps, OPTIMIZE then MATERIALIZES through the bitmaps — the "
    "compacted files carry the surviving rows only and NO deletionVector "
    "descriptors — and VACUUM runs its keep-set analysis WITHOUT "
    "over-collecting: every version is still retained here, so the "
    "DV'd history stays time-travelable and the bins survive (the "
    "bin-collection half, after log cleanup unreferences them, is "
    "pinned in test_optimize_purges_dvs_and_vacuum_collects_bins). The "
    "post-vacuum read must equal the DV-applied state — oracle is the "
    "negated predicate's closed form.",
)
def q_delta_dv_purge_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_delete_where,
        delta_enable_dvs,
        delta_optimize,
        delta_read,
        delta_vacuum,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1200).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_dvpurge_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_dvpurge"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    delta_write(orders, path)
    delta_enable_dvs(spark, path)
    delta_delete_where(
        spark, path, ("o_orderstatus", "=", "F"), ("o_orderkey", "<=", 500)
    )
    delta_optimize(spark, path)  # materialize through the bitmaps (PURGE)
    delta_vacuum(spark, path)    # collect superseded parquet + orphaned DV bins
    got = delta_read(spark, path)
    return got.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


@register(
    "delta_colmap_id_read",
    """
    SELECT o_orderkey,
           cast(cast(o_totalprice AS decimal(30,2)) AS double) AS price,
           o_orderstatus
    FROM orders
    WHERE o_orderkey <= 800
    """,
    doc="columnMapping.mode=id READ (sources/delta_lite.py "
    "_physical_struct with_field_ids + Spark's native parquet field-id "
    "resolution, SPARK-38094): the fixture writes the data file under "
    "ALIEN column names in a DIFFERENT order than the schema, with "
    "parquet field ids carrying the real binding (ids declared via "
    "Column.alias metadata; spark.sql.parquet.fieldId.write.enabled). "
    "The foreign log declares mode=id with delta.columnMapping.id per "
    "field — so neither name- nor position-matching can produce these "
    "rows; only field-id resolution can. Since r12 the table is also "
    "WRITABLE (delta_colmap_id_write). Oracle is the direct projection.",
)
def q_delta_colmap_id_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob as _glob
    import json as _json
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        _claim_version,
        delta_read,
    )

    sub = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 800).select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
        "o_orderstatus",
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_colmapid_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if os.path.isdir(root):
        shutil.rmtree(root)
    path = f"{root}/orders_colmap_id"
    stage = f"{root}/stage"
    # data file under alien names, column order REVERSED vs the schema,
    # field ids carrying the real binding
    alien = sub.select(
        F.col("o_orderstatus").alias("zz_c", metadata={"parquet.field.id": 3}),
        F.col("price").alias("zz_b", metadata={"parquet.field.id": 2}),
        F.col("o_orderkey").alias("zz_a", metadata={"parquet.field.id": 1}),
    )
    # scope the field-id write conf to this fixture (code-review r11:
    # leaking it would make later writes in the shared session embed ids
    # whenever a frame's metadata carries parquet.field.id)
    prev = spark.conf.get("spark.sql.parquet.fieldId.write.enabled", None)
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    try:
        alien.coalesce(1).write.mode("overwrite").parquet(stage)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
        else:
            spark.conf.set("spark.sql.parquet.fieldId.write.enabled", prev)
    (part,) = _glob.glob(os.path.join(stage, "part-*.parquet"))
    os.makedirs(path)
    os.replace(part, os.path.join(path, "part-0.parquet"))
    def fld(name, typ, fid):
        return {
            "name": name, "type": typ, "nullable": True,
            "metadata": {
                "delta.columnMapping.id": fid,
                "delta.columnMapping.physicalName": f"col-{fid:08d}",
            },
        }
    schema = {
        "type": "struct",
        "fields": [
            fld("o_orderkey", "long", 1),
            fld("price", "decimal(30,2)", 2),
            fld("o_orderstatus", "string", 3),
        ],
    }
    acts = [
        {"commitInfo": {"timestamp": 1, "operation": "WRITE",
                        "operationParameters": {}, "engineInfo": "fixture"}},
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "colmap-id-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": "id",
                "delta.columnMapping.maxColumnId": "3",
            },
        }},
        {"add": {
            "path": "part-0.parquet",
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(path, "part-0.parquet")),
            "modificationTime": 1,
            "dataChange": True,
        }},
    ]
    os.makedirs(os.path.join(path, "_delta_log"), exist_ok=True)
    _claim_version(
        os.path.join(path, "_delta_log"), 0,
        "\n".join(_json.dumps(a) for a in acts) + "\n",
    )
    got = delta_read(spark, path)
    return got.select(
        "o_orderkey", F.col("price").cast("double").alias("price"), "o_orderstatus"
    )


@register(
    "delta_colmap_id_write",
    """
    SELECT c_custkey, c_name,
           cast(cast(c_acctbal AS decimal(30,2))
                + CASE WHEN c_custkey > 400 AND c_custkey <= 500
                       THEN 10 ELSE 0 END AS double) AS bal
    FROM customer
    WHERE c_custkey <= 1000
    """,
    doc="columnMapping.mode=id WRITE lifecycle (sources/delta_lite.py "
    "_to_physical_frame with_field_ids — closing VERDICT r11 #5, the "
    "last column-mapping asymmetry): delta_write(column_mapping='id') "
    "CREATES the table with minted delta.columnMapping.id/physicalName "
    "annotations and stamps each id into the parquet file schema "
    "(SPARK-38094 field-id write), an append extends it, and a MERGE "
    "updates a key range (+10 on the balance) — every data file binds "
    "by field id on read. The oracle derives the same final state "
    "relationally. At 100 TB the mode matters for interop: id-mapped "
    "tables survive column renames without rewriting a single file.",
)
def q_delta_colmap_id_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_merge,
        delta_read,
        delta_write,
    )

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.col("c_acctbal").cast("decimal(30,2)").alias("bal")
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_colmapidw_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if os.path.isdir(root):
        shutil.rmtree(root)
    path = f"{root}/customer_colmap_id"
    delta_write(
        cust.filter(F.col("c_custkey") <= 700), path, column_mapping="id"
    )
    delta_write(
        cust.filter((F.col("c_custkey") > 700) & (F.col("c_custkey") <= 1000)),
        path,
        mode="append",
    )
    delta_merge(
        cust.filter(
            (F.col("c_custkey") > 400) & (F.col("c_custkey") <= 500)
        ).withColumn("bal", F.col("bal") + F.lit(10).cast("decimal(30,2)")),
        path,
        key="c_custkey",
    )
    got = delta_read(spark, path)
    return got.select(
        "c_custkey", "c_name", F.col("bal").cast("double").alias("bal")
    )


@register(
    "delta_v2_checkpoint_roundtrip",
    """
    SELECT o_orderkey, o_orderstatus,
           cast(cast(o_totalprice AS decimal(30,2)) AS double) AS price
    FROM orders
    WHERE o_orderkey <= 1000 AND NOT (o_orderkey <= 250)
    """,
    doc="v2 checkpoint WRITE + replay-from-checkpoint (sources/"
    "delta_lite.py _write_checkpoint v2 branch + "
    "delta_enable_v2_checkpoints — closing VERDICT r10 missing #3): "
    "orders land as v0, the table upgrades to checkpointPolicy=v2 "
    "(reader 3 / writer 7, v2Checkpoint feature), a DV-writing DELETE "
    "marks keys <= 250, an append triggers nothing special, then a "
    "checkpoint is cut in the UUID-named manifest + _sidecars/ form "
    "(checkpointMetadata action, file actions in the sidecar) and every "
    "pre-checkpoint commit json is DELETED — the read must replay from "
    "the v2 checkpoint alone, DV descriptors included. New r11; "
    "r12 rotation candidate (starts past the driver window; hard oracle "
    "via tests/test_queries_contract.py + the sf0.01 sweep).",
)
def q_delta_v2_checkpoint_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        _write_checkpoint,
        delta_delete_where,
        delta_enable_dvs,
        delta_enable_v2_checkpoints,
        delta_read,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_v2cp_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_v2cp"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    delta_write(orders.filter(F.col("o_orderkey") <= 900), path)    # v0
    delta_enable_v2_checkpoints(spark, path)                        # v1
    delta_enable_dvs(spark, path)                                   # v2
    delta_delete_where(spark, path, ("o_orderkey", "<=", 250))      # v3 (DVs)
    v_cp = delta_write(
        orders.filter(F.col("o_orderkey") > 900), path, mode="append"
    )                                                               # v4
    _write_checkpoint(spark, path, v_cp)
    log = os.path.join(path, "_delta_log")
    for v in range(0, v_cp):  # replay must come from the checkpoint alone
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    got = delta_read(spark, path)
    return got.select(
        "o_orderkey", "o_orderstatus", F.col("price").cast("double").alias("price")
    )


@register(
    "delta_type_widening_write",
    """
    SELECT o_orderkey,
           cast(cast(o_custkey % 100000 AS int) AS bigint)
               + CASE WHEN o_orderkey > 600 THEN 5000000000 ELSE 0 END
               AS cust_wide,
           o_orderstatus
    FROM orders
    WHERE o_orderkey <= 900
    """,
    doc="typeWidening WRITE (sources/delta_lite.py "
    "delta_widen_column_type — the r12 symmetric half of the r11 read "
    "support): orders land with cust as INT (v0), one metadata commit "
    "widens it to BIGINT (delta.typeChanges provenance + the reader-3/"
    "writer-7 typeWidening upgrade; no data file moves), then an append "
    "writes values only a 64-bit column can hold (>2^32). The read must "
    "serve BOTH file generations under the wide schema — the narrow v0 "
    "file through Spark's native parquet widening, the new file "
    "directly. The oracle derives the same final column relationally. "
    "At 100 TB this is how a table outgrows an int key without "
    "rewriting a byte.",
)
def q_delta_type_widening_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_read,
        delta_widen_column_type,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 900)
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_twwrite_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if os.path.isdir(root):
        shutil.rmtree(root)
    path = f"{root}/orders_tw"
    delta_write(
        orders.filter(F.col("o_orderkey") <= 600).select(
            "o_orderkey",
            (F.col("o_custkey") % 100000).cast("int").alias("cust_wide"),
            "o_orderstatus",
        ),
        path,
    )  # v0: narrow INT column
    delta_widen_column_type(spark, path, "cust_wide", "bigint")  # v1
    delta_write(
        orders.filter(F.col("o_orderkey") > 600).select(
            "o_orderkey",
            (
                (F.col("o_custkey") % 100000).cast("bigint")
                + F.lit(5_000_000_000)
            ).alias("cust_wide"),
            "o_orderstatus",
        ),
        path,
        mode="append",
    )  # v2: values only the wide type holds
    return delta_read(spark, path).select(
        "o_orderkey", "cust_wide", "o_orderstatus"
    )


@register(
    "delta_type_widening_read",
    """
    SELECT o_orderkey, cast(o_custkey % 1000000 AS double) AS cust_d,
           o_orderstatus
    FROM orders
    WHERE o_orderkey <= 1000
    """,
    doc="typeWidening READ (sources/delta_lite.py _check_type_widening + "
    "Spark-native parquet widening promotions, SPARK-40876): the fixture "
    "writes orders with o_orderkey as INT32 and cust as FLOAT32, then a "
    "foreign log declares the widened schema (long / double) under the "
    "typeWidening reader feature with the delta.typeChanges provenance "
    "recorded per field — the read must widen the old file's narrower "
    "values exactly (int->long is lossless; float->double of an "
    "integer-valued float is exact). Promotions outside Spark's native "
    "matrix are refused by name (pytest). New r11; r12 rotation "
    "candidate (starts past the driver window; hard oracle via "
    "tests/test_queries_contract.py + the sf0.01 sweep).",
)
def q_delta_type_widening_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        _claim_version,
        delta_read,
    )

    sub = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000).select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),
        # integer-valued float BELOW 2^24, so float->double widening is
        # exact at ANY sf (code-review r11: raw o_custkey exceeds the
        # float32 integer range past sf~112 and the oracle would diverge)
        (F.col("o_custkey") % 1000000).cast("float").alias("cust_d"),
        "o_orderstatus",
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_twread_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if os.path.isdir(root):
        shutil.rmtree(root)
    path = f"{root}/orders_tw"
    stage = f"{root}/stage"
    sub.coalesce(1).write.mode("overwrite").parquet(stage)
    import glob as _glob

    (part,) = _glob.glob(os.path.join(stage, "part-*.parquet"))
    os.makedirs(path)
    os.replace(part, os.path.join(path, "part-0.parquet"))
    fields = [
        {"name": "o_orderkey", "type": "long", "nullable": True,
         "metadata": {"delta.typeChanges": [
             {"fromType": "integer", "toType": "long"}]}},
        {"name": "cust_d", "type": "double", "nullable": True,
         "metadata": {"delta.typeChanges": [
             {"fromType": "float", "toType": "double"}]}},
        {"name": "o_orderstatus", "type": "string", "nullable": True,
         "metadata": {}},
    ]
    acts = [
        {"commitInfo": {"timestamp": 1, "operation": "WRITE",
                        "operationParameters": {}, "engineInfo": "fixture"}},
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening"],
                      "writerFeatures": ["typeWidening"]}},
        {"metaData": {
            "id": "tw-read-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps({"type": "struct", "fields": fields}),
            "partitionColumns": [],
            "configuration": {},
        }},
        {"add": {
            "path": "part-0.parquet",
            "partitionValues": {},
            "size": os.path.getsize(os.path.join(path, "part-0.parquet")),
            "modificationTime": 1,
            "dataChange": True,
        }},
    ]
    os.makedirs(os.path.join(path, "_delta_log"), exist_ok=True)
    _claim_version(
        os.path.join(path, "_delta_log"), 0,
        "\n".join(_json.dumps(a) for a in acts) + "\n",
    )
    return delta_read(spark, path).select("o_orderkey", "cust_d", "o_orderstatus")


@register(
    "delta_identity_append",
    """
    WITH base AS (
        SELECT o_orderkey, o_orderstatus,
               row_number() OVER (ORDER BY o_orderkey) AS rn,
               count(*) OVER () AS n1
        FROM orders WHERE o_orderkey <= 600
    ), b2 AS (
        SELECT o_orderkey, o_orderstatus,
               row_number() OVER (ORDER BY o_orderkey) AS rn
        FROM orders WHERE o_orderkey > 600 AND o_orderkey <= 900
    )
    SELECT cast(1000 + 5 * (rn - 1) AS bigint) AS rid,
           o_orderkey, o_orderstatus
    FROM base
    UNION ALL
    SELECT cast(1000 + 5 * ((SELECT max(n1) FROM base) + rn - 1) AS bigint),
           o_orderkey, o_orderstatus
    FROM b2
    """,
    doc="IDENTITY column minting on append (sources/delta_lite.py "
    "_apply_identity, writer feature v6 — delta-spark's GENERATED ALWAYS "
    "AS IDENTITY): a foreign log declares rid with start=1000/step=5, "
    "two appends OMIT the column and the engine mints base + step*rank "
    "over each batch, stamping delta.identity.highWaterMark into the "
    "same commit so the second append continues exactly past the first. "
    "The fixture appends are SORTED and single-partition, so the mint "
    "rank equals file row order and the whole surface has a hard closed-"
    "form oracle (identity generally promises uniqueness + direction, "
    "not density — the pytest covers multi-partition mints, explicit-"
    "insert rules, and the non-append refusals). New r11; r12 rotation "
    "candidate.",
)
def q_delta_identity_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        _claim_version,
        delta_read,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_ident_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_ident"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    schema = {
        "type": "struct",
        "fields": [
            {"name": "rid", "type": "long", "nullable": True,
             "metadata": {"delta.identity.start": 1000,
                          "delta.identity.step": 5,
                          "delta.identity.allowExplicitInsert": False}},
            {"name": "o_orderkey", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "o_orderstatus", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    }
    acts = [
        {"commitInfo": {"timestamp": 1, "operation": "CREATE TABLE",
                        "operationParameters": {}, "engineInfo": "fixture"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 6}},
        {"metaData": {
            "id": "ident-append-fixture",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _json.dumps(schema),
            "partitionColumns": [],
            "configuration": {},
        }},
    ]
    os.makedirs(os.path.join(path, "_delta_log"), exist_ok=True)
    _claim_version(
        os.path.join(path, "_delta_log"), 0,
        "\n".join(_json.dumps(a) for a in acts) + "\n",
    )
    b1 = (
        orders.filter(F.col("o_orderkey") <= 600)
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")
    )
    delta_write(b1, path, mode="append")
    b2 = (
        orders.filter((F.col("o_orderkey") > 600) & (F.col("o_orderkey") <= 900))
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")
    )
    delta_write(b2, path, mode="append")
    return delta_read(spark, path).select("rid", "o_orderkey", "o_orderstatus")


@register(
    "delta_row_tracking_ids",
    """
    WITH b1 AS (
        SELECT o_orderkey,
               row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        FROM orders WHERE o_orderkey <= 500
    ), b2 AS (
        SELECT o_orderkey,
               (SELECT count(*) FROM b1)
               + row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 800
    )
    SELECT o_orderkey, cast(rid AS bigint) AS row_id,
           cast(1 AS bigint) AS row_commit_version
    FROM b1 WHERE o_orderkey NOT BETWEEN 100 AND 200
    UNION ALL
    SELECT o_orderkey, cast(rid AS bigint) AS row_id,
           cast(2 AS bigint) AS row_commit_version
    FROM b2
    """,
    doc="Row tracking end to end (sources/delta_lite.py "
    "delta_enable_row_tracking / _stamp_row_ids / _scan_files_rowids — "
    "PROTOCOL.md Row Tracking): orders keys <= 500 land as v0 in ONE "
    "ordered file, enablement (v1) backfills baseRowId 0..n1-1 onto it "
    "from its stats' numRecords, an ordered append of keys 501..800 "
    "(v2) mints the next range, a deletion-vector DELETE of keys "
    "100..200 (v4) marks rows without moving survivors, and OPTIMIZE "
    "(v5) compacts everything into one file while MATERIALIZING the ids "
    "— the read's coalesce(materialized, baseRowId + row_index) must "
    "return the SAME ids as before the rewrite. Ordered single-file "
    "batches make the assignment closed-form: row_id = rank of the key "
    "within its batch (+ batch offset), row_commit_version = the "
    "stamping commit (1 backfill, 2 append).",
)
def q_delta_row_tracking_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_delete_where,
        delta_enable_dvs,
        delta_enable_row_tracking,
        delta_optimize,
        delta_read,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 800).select(
        "o_orderkey"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_rowtrack_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_rowtrack"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    b1 = (
        orders.filter(F.col("o_orderkey") <= 500)
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")
    )
    delta_write(b1, path)                                          # v0
    delta_enable_row_tracking(spark, path)                         # v1 backfill
    b2 = (
        orders.filter(F.col("o_orderkey") > 500)
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")
    )
    delta_write(b2, path, mode="append")                           # v2
    delta_enable_dvs(spark, path)                                  # v3
    delta_delete_where(spark, path, ("o_orderkey", "between", (100, 200)))  # v4
    delta_optimize(spark, path, n_files=1)                         # v5
    got = delta_read(spark, path, with_row_ids=True)
    return got.select(
        "o_orderkey",
        F.col("_row_id").alias("row_id"),
        F.col("_row_commit_version").alias("row_commit_version"),
    )


@register(
    "delta_clustered_optimize_read",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           cast(sum(cast(o_totalprice AS decimal(30,2))) AS double) AS revenue
    FROM orders
    WHERE o_orderkey BETWEEN 1000 AND 5000
    GROUP BY o_orderpriority
    """,
    doc="Clustered table end to end (sources/delta_lite.py "
    "delta_set_clustering / delta_optimize — PROTOCOL.md Clustered "
    "Table): orders land scattered across 8 files, ALTER TABLE CLUSTER "
    "BY (o_orderpriority, o_orderkey) records the key in the "
    "delta.clustering domain with the writer-7 upgrade, and OPTIMIZE "
    "with NO explicit key reads the domain and z-orders by it — the "
    "compacted files cover narrow key ranges, so the subsequent "
    "delta_read(where=o_orderkey BETWEEN ...) prunes files by stats "
    "before Spark lists them. The oracle is the plain filtered "
    "aggregate; the clustering is the physical half (file-count and "
    "stats-tightness pinned in pytest).",
)
def q_delta_clustered_optimize_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.queries import cached_fixture
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_optimize,
        delta_read,
        delta_set_clustering,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    # The clustered table (v0-v2) builds once per sf and caches (VERDICT
    # r13 #4, the liquid sibling's pattern): the bench row should time the
    # STATS-PRUNED READ — the feature's whole point — not re-clustering.
    # Read-only after the build, so no per-call work copy is needed.
    cache = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_clustered_v2_{os.path.basename(sf_dir.rstrip('/'))}",
    )

    def _build(b: str) -> None:
        p = f"{b}/orders_clustered"
        delta_write(orders.repartition(8), p)                            # v0
        delta_set_clustering(
            spark, p, ["o_orderpriority", "o_orderkey"]
        )                                                                # v1
        delta_optimize(spark, p, n_files=6)                              # v2

    cached_fixture(cache, _build)
    got = delta_read(
        spark,
        f"{cache}/orders_clustered",
        where=[("o_orderkey", "between", (1000, 5000))],
    )
    return got.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("price").cast("double").alias("revenue"),
    )


@register(
    "delta_log_cleanup_roundtrip",
    """
    SELECT o_orderkey, 6 AS n_cleaned
    FROM orders WHERE o_orderkey > 0 AND o_orderkey <= 800
    """,
    doc="Expired-log metadata cleanup end to end (sources/delta_lite.py "
    "delta_cleanup_metadata — delta-spark's logRetentionDuration "
    "cleanup): eight appends land with checkpoints at v3 and v6, the "
    "commits below v5 are aged past the retention window, and cleanup "
    "deletes EXACTLY the prefix ending at the newest eligible "
    "checkpoint — JSONs 0..2 plus their three <version>.crc "
    "VersionChecksums (r12: checksums ride their commit's fate), with "
    "checkpoint 3 anchoring everything above (n_cleaned pins the "
    "count). The post-cleanup read must still see every row (replay "
    "from the checkpoint + surviving tail); time travel below the cut "
    "fails per Delta's retention contract (pinned in pytest).",
)
def q_delta_log_cleanup_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_cleanup_metadata,
        delta_read,
        delta_write,
    )

    from lakehouse_architecture_for_realestatedata_spark.queries import (
        cached_fixture,
        fixture_work_dir,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 800).select(
        "o_orderkey"
    )
    # The 8-commit aged log (v0..v7, checkpoints at v3/v6, mtimes pushed
    # past retention) builds once per sf and caches — the operator under
    # test is CLEANUP OF AN EXISTING LOG + the post-cleanup replay read,
    # not eight append commits (the liquid/mview fixture pattern; r14
    # opt). copytree preserves the aged mtimes (copy2); each call cleans
    # a process-unique work copy, so every invocation still runs the real
    # deletion + replay from its own on-disk log.
    cache = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_logclean_v2_{os.path.basename(sf_dir.rstrip('/'))}",
    )

    def _build(b: str) -> None:
        p = f"{b}/orders_logclean"
        for i in range(8):  # v0..v7, checkpoints at v3 and v6
            delta_write(
                orders.filter(
                    (F.col("o_orderkey") > i * 100)
                    & (F.col("o_orderkey") <= (i + 1) * 100)
                ),
                p,
                mode="append",
                checkpoint_interval=3,
            )
        log = os.path.join(p, "_delta_log")
        aged = 1_000_000_000  # far past any retention window
        for f in os.listdir(log):
            if f[0].isdigit() and int(f.split(".")[0]) < 5:
                os.utime(os.path.join(log, f), (aged, aged))

    cached_fixture(cache, _build)
    path = os.path.join(fixture_work_dir(cache), "orders_logclean")
    shutil.copytree(f"{cache}/orders_logclean", path)
    # Re-touch the NON-aged log files (version >= 5) to now: copytree
    # preserves the cache's build-time mtimes, so once the cache is older
    # than the retention window the v5..v7 files would ALSO look expired
    # and cleanup would delete 13 files instead of the pinned 6 (ADVICE
    # r14, verified: fresh copy -> 6, >24h-old copy -> 13). Touching only
    # >= 5 restores the build-time state exactly: v0..v4 stay aged.
    work_log = os.path.join(path, "_delta_log")
    for f in os.listdir(work_log):
        if f[0].isdigit() and int(f.split(".")[0]) >= 5:
            os.utime(os.path.join(work_log, f), None)
    deleted = delta_cleanup_metadata(
        spark, path, retention_millis=86_400_000
    )
    return delta_read(spark, path).select(
        "o_orderkey", F.lit(len(deleted)).alias("n_cleaned")
    )


@register(
    "delta_row_tracking_format_read",
    """
    WITH b1 AS (
        SELECT o_orderkey,
               row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        FROM orders WHERE o_orderkey <= 500
    ), b2 AS (
        SELECT o_orderkey,
               (SELECT count(*) FROM b1)
               + row_number() OVER (ORDER BY o_orderkey) - 1 AS rid
        FROM orders WHERE o_orderkey > 500 AND o_orderkey <= 800
    )
    SELECT o_orderkey, cast(rid AS bigint) AS row_id,
           cast(1 AS bigint) AS row_commit_version
    FROM b1 WHERE o_orderkey NOT BETWEEN 100 AND 200
    UNION ALL
    SELECT o_orderkey, cast(rid AS bigint) AS row_id,
           cast(2 AS bigint) AS row_commit_version
    FROM b2
    """,
    doc="The FORMAT-path twin of delta_row_tracking_ids "
    "(sources/delta_source.py option('withRowIds') — per-file Arrow-side "
    "coalesce(materialized, baseRowId + pre-DV row index)): the same "
    "backfill → append → DV delete → OPTIMIZE fixture read through "
    "spark.read.format('delta_lite') instead of the native scan, against "
    "the identical closed-form oracle — the two front doors must hand "
    "back the same stable ids bit-for-bit.",
)
def q_delta_row_tracking_format_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_delete_where,
        delta_enable_dvs,
        delta_enable_row_tracking,
        delta_optimize,
        delta_write,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_source import (
        register_delta_lite_source,
    )

    register_delta_lite_source(spark)
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 800).select(
        "o_orderkey"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_rowtrackfmt_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    path = f"{root}/orders_rowtrack_fmt"
    if os.path.isdir(path):
        shutil.rmtree(path)  # versions accumulate; rebuild per run
    b1 = (
        orders.filter(F.col("o_orderkey") <= 500)
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")
    )
    delta_write(b1, path)                                          # v0
    delta_enable_row_tracking(spark, path)                         # v1 backfill
    b2 = (
        orders.filter(F.col("o_orderkey") > 500)
        .coalesce(1)
        .sortWithinPartitions("o_orderkey")
    )
    delta_write(b2, path, mode="append")                           # v2
    delta_enable_dvs(spark, path)                                  # v3
    delta_delete_where(spark, path, ("o_orderkey", "between", (100, 200)))  # v4
    delta_optimize(spark, path, n_files=1)                         # v5
    got = (
        spark.read.format("delta_lite")
        .option("withRowIds", "true")
        .load(path)
    )
    return got.select(
        "o_orderkey",
        F.col("_row_id").alias("row_id"),
        F.col("_row_commit_version").alias("row_commit_version"),
    )


@register(
    "delta_log_profile",
    """
    SELECT count(*) AS n_rows,
           min(user_id) AS min_user_id, max(user_id) AS max_user_id,
           min(cast(value AS double)) AS min_value,
           max(cast(value AS double)) AS max_value
    FROM events
    WHERE user_id <= 4000
    """,
    doc="Metadata-ONLY Delta profile (sources/delta_lite.py:delta_profile): "
    "events land in three appends, then n_rows + per-column min/max fold "
    "from the active add actions' stats alone — zero data-file IO, not "
    "even a footer; the log is why a 100 TB Delta table answers 'how "
    "many rows / what key range' in milliseconds. Exactness contract: "
    "numRecords sums are exact (DV cardinalities subtracted), stats "
    "min/max are exact while no DV is active (refused otherwise unless "
    "bounds_ok), string/timestamp columns refuse by name (foreign "
    "writers truncate those stats), statless files refuse rather than "
    "silently skew. The oracle is the plain aggregate over the same "
    "source rows.",
)
def q_delta_log_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.queries import (
        _events,
        cached_fixture,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_profile,
        delta_write,
    )

    ev = _events(spark, sf_dir).filter(F.col("user_id") <= 4000).select(
        "event_id", "user_id", F.col("value").cast("double").alias("value")
    )
    # The 3-commit table builds once per sf and caches (review r13: the
    # bench row should show the near-zero METADATA-ONLY cost — a per-call
    # rebuild would time fixture construction and mask regressions in the
    # profile path itself). cached_fixture = build-then-rename, safe under
    # concurrent bench/pytest (ADVICE r13).
    cache = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_logprof_v3_{os.path.basename(sf_dir.rstrip('/'))}",
    )

    def _build(b: str) -> None:
        p = f"{b}/events_delta"
        delta_write(ev.filter(F.col("event_id") % 3 == 0), p)
        for r in (1, 2):
            delta_write(
                ev.filter(F.col("event_id") % 3 == r), p, mode="append"
            )

    cached_fixture(cache, _build)
    return delta_profile(spark, f"{cache}/events_delta", ["user_id", "value"])


@register(
    "delta_incremental_liquid_optimize",
    """
    SELECT o_orderpriority,
           count(*) AS n,
           cast(sum(cast(o_totalprice AS decimal(30,2))) AS double) AS revenue
    FROM orders
    WHERE o_orderkey BETWEEN 2000 AND 9000
    GROUP BY o_orderpriority
    """,
    doc="INCREMENTAL liquid-clustering OPTIMIZE end to end "
    "(sources/delta_lite.py delta_optimize(incremental=True) — "
    "delta-spark incremental liquid clustering): half the orders land "
    "and a clustering OPTIMIZE stamps its adds with the Clustered Table "
    "spec's clusteringProvider marker; the other half appends later and "
    "incremental OPTIMIZE rewrites ONLY those unmarked files into a "
    "second Hilbert-clustered island — the already-clustered files' "
    "paths never move, so a daily OPTIMIZE on a 100 TB table costs "
    "O(today's data). The pruned read then skips by stats across BOTH "
    "islands. Oracle = the plain filtered aggregate; the only-new-files "
    "physics is pinned in pytest (test_delta_lite.py).",
)
def q_delta_incremental_liquid_optimize(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.queries import (
        cached_fixture,
        fixture_work_dir,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_optimize,
        delta_read,
        delta_set_clustering,
        delta_write,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(30,2)").alias("price"),
    )
    # The clustered FIRST island (v0-v2) builds once per sf and caches
    # (the ivf_cdc_sync bench-fixture pattern: the row should time the
    # INCREMENTAL maintenance — append + incremental OPTIMIZE + pruned
    # read — not the initial build). Each call copies the small cached
    # table into a process-unique work dir and runs the incremental day
    # on the copy; cached_fixture = build-then-rename, safe under
    # concurrent bench/pytest (ADVICE r13).
    cache = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_liquid_v3_{os.path.basename(sf_dir.rstrip('/'))}",
    )

    def _build(b: str) -> None:
        p = f"{b}/orders_liquid"
        half = orders.filter(F.col("o_orderkey") % 2 == 0)
        delta_write(half.repartition(4), p)                              # v0
        delta_set_clustering(
            spark, p, ["o_orderpriority", "o_orderkey"]
        )                                                                # v1
        delta_optimize(spark, p, n_files=4)                              # v2

    cached_fixture(cache, _build)
    path = os.path.join(fixture_work_dir(cache), "orders_liquid")
    shutil.copytree(f"{cache}/orders_liquid", path)
    delta_write(
        orders.filter(F.col("o_orderkey") % 2 == 1), path, mode="append"
    )                                                                   # v3
    delta_optimize(spark, path, n_files=4, incremental=True)            # v4
    got = delta_read(
        spark, path, where=[("o_orderkey", "between", (2000, 9000))]
    )
    return got.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("price").cast("double").alias("revenue"),
    )
