"""End-to-end ingest spine (S1/S2/S5/S6 + P3): the reference's flagship entry
path (SURVEY §3.1 steps 3-4) as one flow over messy Vietnamese-keyed JSONL:

    crawl JSONL (Vietnamese/spaced keys)
      → read_json (single-pass schema)
      → with_file_provenance (_metadata mtime + path)
      → ManifestIngest (exactly-once file discovery; re-run = 0 new files)
      → bronze ParquetTable.append (file-additive)
      → normalize_columns (rename map + sanitizer + keep-latest dedup)
      → silver_properties

reference: scripts/load_bronze_to_table.py:37-161,
scripts/normalize_bronze_columns.py:82-130.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.plans.medallion import (
    csv_backfill,
    normalize_columns,
    silver_properties,
)
from lakehouse_architecture_for_realestatedata_spark.sources.manifest import ManifestIngest
from lakehouse_architecture_for_realestatedata_spark.sources.readers import (
    read_csv,
    read_json,
    with_file_provenance,
)
from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable

# Raw crawl records exactly as the reference's flattener emits them: open
# schema, Vietnamese labels with spaces/commas/² (normalize_bronze_columns.py:11-50).
_CRAWL_1 = [
    {
        "list_id": "P1",
        "title": "Nhà Q1",
        "price": "5,2 tỷ",
        "Diện tích": "100 m²",
        "Giấy tờ pháp lý": "Sổ đỏ",
        "Địa chỉ": "12 lê lợi, quận 1",
        "Tỉnh, thành phố": "Hồ Chí Minh",
        "images": ["a.jpg"],
    },
    {
        "list_id": "P2",
        "title": "Nhà HN",
        "price": "850 triệu",
        "Diện tích": "85,5",
        "Địa chỉ": "5 tràng tiền",
        "Tỉnh, thành phố": "Hà Nội",
    },
]
_CRAWL_2 = [
    # same listing re-crawled with a new price — keep-latest must pick this
    {
        "list_id": "P1",
        "title": "Nhà Q1 update",
        "price": "5,5 tỷ",
        "Diện tích": "100 m²",
        "Giấy tờ pháp lý": "Sổ đỏ",
        "Địa chỉ": "12 lê lợi, quận 1",
        "Tỉnh, thành phố": "Hồ Chí Minh",
        # schema drift: a key the first crawl never saw
        "Số phòng ngủ": "3",
    },
    {"list_id": "P3", "title": "Đất ĐN", "price": "Thỏa thuận", "Tỉnh, thành phố": "Đà Nẵng"},
]


def _write_jsonl(path: str, rows: list[dict], mtime: float) -> str:
    with open(path, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r, ensure_ascii=False) + "\n")
    os.utime(path, (mtime, mtime))
    return path


def _ingest(spark, ingest: ManifestIngest, bronze: ParquetTable, files: list[str]) -> int:
    def reader(todo):
        df = with_file_provenance(read_json(spark, todo))
        return df.withColumnRenamed("_file_mtime", "file_modification_time")

    return ingest.ingest(files, reader, lambda df: bronze.append(df))


def test_jsonl_ingest_spine_end_to_end(spark, tmp_path):
    src = tmp_path / "json"
    src.mkdir()
    f1 = _write_jsonl(str(src / "crawl_1.jsonl"), _CRAWL_1, mtime=1_700_000_000)
    bronze = ParquetTable(spark, str(tmp_path / "bronze"))
    ingest = ManifestIngest(spark, str(tmp_path / "state" / "processed.txt"))

    # run 1: one file, two listings
    assert _ingest(spark, ingest, bronze, [f1]) == 1
    assert bronze.read().count() == 2
    v1 = bronze.version()

    # idempotent re-run: same file set ⇒ 0 new files, table untouched (S6)
    assert _ingest(spark, ingest, bronze, [f1]) == 0
    assert bronze.version() == v1 and bronze.read().count() == 2

    # run 2: a later crawl with a re-listed id and schema drift
    f2 = _write_jsonl(str(src / "crawl_2.jsonl"), _CRAWL_2, mtime=1_700_086_400)
    assert _ingest(spark, ingest, bronze, [f1, f2]) == 1  # only the new file
    raw = bronze.read()
    assert raw.count() == 4
    # provenance columns present (S5) and drift column null-filled (S7)
    assert {"_input_file", "file_modification_time", "Số phòng ngủ"} <= set(raw.columns)
    assert raw.filter(F.col("list_id") == "P2").select("Số phòng ngủ").collect()[0][0] is None

    # normalize: Vietnamese keys → engine names, keep-latest per list_id (P1/P2/W1)
    normalized = normalize_columns(raw, skip=["_input_file"])
    assert {"list_id", "area_raw", "legal_status_raw", "address", "province_raw"} <= set(
        normalized.columns
    )
    assert normalized.count() == 3  # P1 deduped to its latest crawl
    p1 = normalized.filter(F.col("list_id") == "P1").collect()[0]
    assert p1["title"] == "Nhà Q1 update" and p1["price"] == "5,5 tỷ"

    # silver over normalized bronze: typed parse + quality flag
    silver_in = normalized.select(
        "list_id",
        "title",
        "price",
        F.col("address"),
        F.col("area_raw"),
        F.lit(None).cast("string").alias("bedrooms_raw"),
        F.lit(None).cast("string").alias("bathrooms_raw"),
        F.col("legal_status_raw"),
        F.lit(None).cast("string").alias("ward_raw"),
        F.lit(None).cast("string").alias("district_raw"),
        F.col("province_raw"),
        "file_modification_time",
    )
    silver = silver_properties(silver_in, created_at=F.to_timestamp(F.lit("2024-06-01")))
    rows = {r["property_id"]: r for r in silver.collect()}
    assert rows["P1"]["price_in_billions"] == 5.5
    assert abs(rows["P2"]["price_in_billions"] - 0.85) < 1e-9
    assert rows["P3"]["data_quality_flag"] == "MISSING_PRICE"


def test_manifest_provenance_double_guard(spark, tmp_path):
    """P3: rows from an already-processed file are filtered even if the file
    sneaks back into the reader's batch (the reference's belt-and-braces
    ~isin guard, load_bronze_to_table.py:136-137)."""
    src = tmp_path / "json"
    src.mkdir()
    f1 = _write_jsonl(str(src / "a.jsonl"), _CRAWL_1, mtime=1_700_000_000)
    f2 = _write_jsonl(str(src / "b.jsonl"), _CRAWL_2, mtime=1_700_086_400)
    ingest = ManifestIngest(spark, str(tmp_path / "m.txt"))
    ingest._record([f1])  # f1 already marked processed out-of-band

    seen: list[int] = []

    def reader(todo):
        df = with_file_provenance(read_json(spark, [f1, f2]))  # over-reads both
        return df

    ingest.ingest([f1, f2], reader, lambda df: seen.append(df.count()))
    # only f2's rows survive the provenance filter
    assert seen == [len(_CRAWL_2)]


def test_csv_backfill_into_bronze_spine(spark, tmp_path):
    """S2 + the composed backfill model: CSV → bronze-shaped rows → append →
    normalize joins the same spine as crawled JSONL (normalize_csv.py:45-109)."""
    csv_path = str(tmp_path / "housing.csv")
    with open(csv_path, "w", encoding="utf-8") as fh:
        fh.write("Address,Price,Area,Frontage,Floors,Bedrooms,Bathrooms,Legal status\n")
        fh.write('"12 lê lợi, quận 1, Hồ Chí Minh","5,2 tỷ",100,5,3,3,2,Sổ đỏ\n')
        fh.write('"5 tràng tiền, Hà Nội","850 triệu","85,5",,2,2,1,Sổ hồng\n')

    raw = read_csv(
        spark,
        csv_path,
        schema="`Address` string, `Price` string, `Area` string, `Frontage` string, "
        "`Floors` string, `Bedrooms` string, `Bathrooms` string, `Legal status` string",
    )
    shaped = csv_backfill(raw, mtime=F.to_timestamp(F.lit("2024-05-01")))
    # images column is a typed null array (unions cleanly with crawled bronze)
    assert dict(shaped.dtypes)["images"] == "array<string>"
    assert shaped.select("source_origin").distinct().collect()[0][0] == "csv_import"

    bronze = ParquetTable(spark, str(tmp_path / "bronze"))
    bronze.append(shaped)
    normalized = normalize_columns(bronze.read())
    got = {r["list_id"]: r for r in normalized.collect()}
    assert len(got) == 2
    for r in got.values():
        assert r["province_raw"] in ("Hồ Chí Minh", "Hà Nội")
        assert r["address"] is not None and r["area_raw"] is not None
    # content-hash ids: re-importing the identical CSV produces identical ids
    shaped2 = csv_backfill(raw, mtime=F.to_timestamp(F.lit("2024-05-02")))
    ids2 = {r["list_id"] for r in shaped2.select("list_id").collect()}
    assert set(got) == ids2


def test_footer_profile_pushes_aggregation(spark, sf_dir):
    """footer_profile (r13): the profile must be served from parquet
    footer stats — require_pushdown=True guarantees the plan carries
    PushedAggregation — match the plain aggregate exactly, refuse
    non-stats-pushable types BY NAME, and leave the session confs
    (aggregatePushdown, useV1SourceList) untouched."""
    import pytest
    from pyspark.sql import functions as F

    from lakehouse_architecture_for_realestatedata_spark.sources.readers import footer_profile

    before = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.parquet.aggregatePushdown",
            "spark.sql.sources.useV1SourceList",
        )
    }
    path = f"{sf_dir}/lineitem.parquet"
    got = footer_profile(
        spark, path, ["l_orderkey", "l_quantity"], require_pushdown=True
    ).first()
    after = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.parquet.aggregatePushdown",
            "spark.sql.sources.useV1SourceList",
        )
    }
    assert before == after  # conf window restored
    li = spark.read.parquet(path)
    exact = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_orderkey").alias("a"),
        F.max("l_orderkey").alias("b"),
        F.min("l_quantity").alias("c"),
        F.max("l_quantity").alias("d"),
    ).first()
    assert got["n_rows"] == exact["n"]
    assert (got["min_l_orderkey"], got["max_l_orderkey"]) == (exact["a"], exact["b"])
    assert (got["min_l_quantity"], got["max_l_quantity"]) == (exact["c"], exact["d"])
    # refusals by name — never a silent full scan
    with pytest.raises(TypeError, match="l_returnflag"):
        footer_profile(spark, path, ["l_returnflag"])
    with pytest.raises(KeyError, match="nope"):
        footer_profile(spark, path, ["nope"])
