"""Medallion-pipeline parity queries: the silver/gold model semantics run on
a deterministic inline bronze fixture (identical VALUES clause on both
engines), so the driver's oracle gate covers the reference's dbt models
end-to-end — parse → flag → dedup → dims → star join → measures.

DuckDB lacks ``initcap``; the oracles emulate Spark's semantics
(first-letter-upper, rest-lower, space-separated words) with a list
comprehension — verified equivalent on Vietnamese text in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.plans.medallion import (
    dim_legal_status,
    dim_locations,
    dim_properties,
    fct_properties,
    silver_properties,
)
from lakehouse_architecture_for_realestatedata_spark.queries import register

# Bronze fixture: dup list_ids across "files" (L1), tỷ/triệu/thỏa-thuận
# prices, comma-decimal areas, NULL/blank addresses, an out-of-range price
# (L5: 2500 ≥ 1000 outlier cut), an out-of-range area (L6).
_BRONZE_ROWS = [
    ("L1", "Nhà Q1 cũ", "5,2 tỷ", "12  lê lợi, quận 1", "100 m²", "3", "2", "Sổ đỏ", "phường bến thành", "quận 1", "Hồ Chí Minh", "2024-01-01 00:00:00"),
    ("L1", "Nhà Q1 mới", "5,5 tỷ", "12  lê lợi, quận 1", "100 m²", "3", "2", "Sổ đỏ", "phường bến thành", "quận 1", "Hồ Chí Minh", "2024-01-02 00:00:00"),
    ("L2", "Nhà HN", "850 triệu", "5 tràng tiền", "85,5", "2 phòng", "1", "Sổ hồng riêng", "hàng bài", "hoàn kiếm", "Hà Nội", "2024-01-01 00:00:00"),
    ("L3", "Đất nền ĐN", "Thỏa thuận", "khu x", "200", None, None, "Đang chờ sổ", None, "liên chiểu", "Đà Nẵng", "2024-01-01 00:00:00"),
    ("L4", "Không địa chỉ", "2 tỷ", None, "50", "1", "1", None, None, None, None, "2024-01-02 00:00:00"),
    ("L5", "Giá thô to", "2500", "1 nơi nào đó", "60", "2", "2", "Giấy tay", None, None, "Nowhere", "2024-01-02 00:00:00"),
    ("L6", "Đất quá to", "3 tỷ", "2 chỗ kia", "25000", None, None, "Sổ đỏ", None, None, "Long An", "2024-01-03 00:00:00"),
    ("L7", "Căn hộ HCM", "1,75 tỷ", "9 nguyễn huệ, quận 1", "55,5 m²", "1", "1", "Sổ hồng", None, "quận 1", "Hồ Chí Minh", "2024-01-03 00:00:00"),
]

_BRONZE_SCHEMA = (
    "list_id string, title string, price string, address string, area_raw string, "
    "bedrooms_raw string, bathrooms_raw string, legal_status_raw string, ward_raw string, "
    "district_raw string, province_raw string, mtime string"
)


def _bronze_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(_BRONZE_ROWS, _BRONZE_SCHEMA).select(
        "*", F.to_timestamp("mtime").alias("file_modification_time")
    )


def _sql_values() -> str:
    rows = []
    for r in _BRONZE_ROWS:
        vals = ", ".join("NULL" if v is None else "'" + v.replace("'", "''") + "'" for v in r)
        rows.append(f"({vals})")
    cols = (
        "list_id, title, price, address, area_raw, bedrooms_raw, bathrooms_raw, "
        "legal_status_raw, ward_raw, district_raw, province_raw, mtime"
    )
    return "(VALUES\n    " + ",\n    ".join(rows) + f"\n) AS bronze({cols})"


# DuckDB emulations of the Spark built-ins used by the silver model
_INITCAP = (
    "array_to_string([upper(w[1]) || lower(w[2:]) for w in "
    "string_split(trim(regexp_replace({c}, '\\s+', ' ', 'g')), ' ')], ' ')"
)
_NUM = "cast(replace(regexp_extract({c}, '([0-9,.]+)', 1), ',', '.') as double)"
_INT = "cast(regexp_extract({c}, '([0-9]+)', 1) as int)"
_PRICE = f"""CASE
      WHEN lower(price) LIKE '%tỷ%' THEN {_NUM.format(c='price')}
      WHEN lower(price) LIKE '%triệu%' THEN {_NUM.format(c='price')} / 1000
      WHEN lower(price) LIKE '%thỏa thuận%' OR lower(price) LIKE '%liên hệ%' THEN NULL
      ELSE {_NUM.format(c='price')}
    END"""
_FLAG = """CASE
      WHEN price IS NULL OR lower(price) LIKE '%thỏa thuận%' OR lower(price) LIKE '%liên hệ%'
        THEN 'MISSING_PRICE'
      WHEN address IS NULL OR trim(address) = '' THEN 'MISSING_ADDRESS'
      ELSE 'VALID'
    END"""

# Spark initcap(trim(x)) — no whitespace collapse (used for legal_status,
# reference stg_properties.sql:93-94)
_INITCAP_PLAIN = (
    "array_to_string([upper(w[1]) || lower(w[2:]) for w in "
    "string_split(trim({c}), ' ')], ' ')"
)

# silver model over the fixture, as a reusable DuckDB CTE body
_SILVER_CTE = f"""
    deduped AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY list_id
                ORDER BY cast(mtime as timestamp) DESC, list_id) AS rn
            FROM {{values}}
        ) WHERE rn = 1
    ),
    silver AS (
        SELECT
            list_id AS property_id,
            title,
            cast(mtime as timestamp) AS updated_at_ts,
            {_NUM.format(c='area_raw')} AS area,
            {_INT.format(c='bedrooms_raw')} AS bedrooms,
            {_INT.format(c='bathrooms_raw')} AS bathrooms,
            {_PRICE} AS price_in_billions,
            CASE WHEN address IS NULL THEN NULL ELSE {_INITCAP.format(c='address')} END AS address,
            CASE WHEN ward_raw IS NULL THEN NULL ELSE {_INITCAP.format(c='ward_raw')} END AS ward,
            CASE WHEN district_raw IS NULL THEN NULL ELSE {_INITCAP.format(c='district_raw')} END AS district,
            CASE WHEN province_raw IS NULL THEN NULL ELSE {_INITCAP.format(c='province_raw')} END AS province,
            CASE WHEN legal_status_raw IS NULL THEN NULL
                 ELSE {_INITCAP_PLAIN.format(c='legal_status_raw')} END AS legal_status,
            {_FLAG} AS data_quality_flag
        FROM deduped
    )
"""


def _silver(spark: SparkSession) -> DataFrame:
    return silver_properties(
        _bronze_df(spark), created_at=F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    )


@register(
    "silver_model",
    f"""
    WITH {_SILVER_CTE.format(values=_sql_values())}
    SELECT property_id, title, updated_at_ts, area, bedrooms, bathrooms,
           price_in_billions, address, ward, district, province, legal_status,
           data_quality_flag
    FROM silver
    """,
    doc="The full silver staging model (stg_properties.sql:9-107) on an "
    "inline bronze fixture: W1 dedup, F1-F20 parsing, quality flag.",
)
def q_silver_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _silver(spark).select(
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
    "dim_locations_model",
    f"""
    WITH {_SILVER_CTE.format(values=_sql_values())},
    loc AS (
        SELECT DISTINCT
            coalesce(address, 'Unknown') AS full_address,
            coalesce(ward, 'Unknown') AS ward,
            coalesce(district, 'Unknown') AS district,
            coalesce(province, 'Unknown') AS province
        FROM silver WHERE data_quality_flag = 'VALID'
    )
    SELECT full_address, ward, district, province,
           CASE WHEN province = 'Unknown' THEN 'Unknown'
                WHEN province IN ('Hồ Chí Minh','Bình Dương','Đồng Nai','Bà Rịa - Vũng Tàu','Long An',
                                  'Tiền Giang','Bến Tre','Trà Vinh','Vĩnh Long','Đồng Tháp','An Giang',
                                  'Kiên Giang','Cần Thơ','Hậu Giang','Sóc Trăng','Bạc Liêu','Cà Mau',
                                  'Tây Ninh','Bình Phước') THEN 'Miền Nam'
                WHEN province IN ('Hà Nội','Hải Phòng','Quảng Ninh','Bắc Ninh','Hải Dương','Hưng Yên',
                                  'Vĩnh Phúc','Thái Nguyên','Bắc Giang','Phú Thọ','Lào Cai','Yên Bái',
                                  'Tuyên Quang','Hà Giang','Cao Bằng','Bắc Kạn','Lạng Sơn','Thái Bình',
                                  'Nam Định','Hà Nam','Ninh Bình','Hòa Bình','Sơn La','Điện Biên','Lai Châu')
                     THEN 'Miền Bắc'
                WHEN province IN ('Đà Nẵng','Thừa Thiên Huế','Quảng Nam','Quảng Ngãi','Bình Định',
                                  'Phú Yên','Khánh Hòa','Ninh Thuận','Bình Thuận','Thanh Hóa','Nghệ An',
                                  'Hà Tĩnh','Quảng Bình','Quảng Trị','Kon Tum','Gia Lai','Đắk Lắk',
                                  'Đắk Nông','Lâm Đồng') THEN 'Miền Trung'
                ELSE 'Khác'
           END AS region
    FROM loc
    """,
    doc="dim_locations (dim_locations.sql:12-71): Unknown-coalesce, "
    "group-distinct, region bucketing. location_id (Murmur3) excluded from "
    "the oracle projection; its invariants are pinned in tests/test_functions.py.",
)
def q_dim_locations_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dim_locations(_silver(spark)).select(
        "full_address", "ward", "district", "province", "region"
    )


@register(
    "dim_legal_status_model",
    f"""
    WITH {_SILVER_CTE.format(values=_sql_values())},
    statuses AS (
        SELECT coalesce(legal_status, 'Không xác định') AS legal_status
        FROM silver WHERE data_quality_flag = 'VALID'
        UNION
        SELECT 'Không xác định'
    )
    SELECT legal_status,
           CASE WHEN lower(legal_status) LIKE '%sổ đỏ%' OR lower(legal_status) LIKE '%sổ hồng%'
                  THEN 'Có sổ đỏ/hồng'
                WHEN lower(legal_status) LIKE '%sổ riêng%' THEN 'Có sổ riêng'
                WHEN lower(legal_status) LIKE '%đang chờ%' OR lower(legal_status) LIKE '%chưa có%'
                  THEN 'Chưa có sổ'
                ELSE 'Khác'
           END AS legal_status_category
    FROM statuses
    """,
    doc="dim_legal_status (dim_legal_status.sql:12-41): distinct ∪ default "
    "row (U1), Vietnamese LIKE categorization (F9).",
)
def q_dim_legal_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dim_legal_status(_silver(spark)).select("legal_status", "legal_status_category")


@register(
    "fct_properties_model",
    f"""
    WITH {_SILVER_CTE.format(values=_sql_values())},
    filtered AS (
        SELECT * FROM silver
        WHERE data_quality_flag = 'VALID'
          AND property_id IS NOT NULL AND title IS NOT NULL AND address IS NOT NULL
          AND price_in_billions IS NOT NULL AND price_in_billions > 0 AND price_in_billions < 1000
          AND (area IS NULL OR (area > 0 AND area < 10000))
    )
    SELECT property_id,
           cast(date_trunc('day', updated_at_ts) as date) AS date_key,
           price_in_billions, area,
           price_in_billions * 1000 / area AS price_per_m2_millions,
           coalesce(legal_status, 'Không xác định') AS legal_status_key
    FROM filtered
    """,
    doc="fct_properties semantics (fct_properties.sql:12-94): the P5 "
    "validity+range block, date_key derivation, price/m² measure, and the "
    "J2 null-defaulting legal-status key. Star-join FK resolution itself is "
    "covered by star_join_revenue + the medallion pytest suite (Murmur3 ids "
    "not reproducible in SQL).",
)
def q_fct_properties_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    stg = _silver(spark)
    fct = fct_properties(stg, dim_locations(stg), dim_legal_status(stg))
    legal = dim_legal_status(stg).select(
        F.col("legal_status_id"), F.col("legal_status").alias("legal_status_key")
    )
    return (
        fct.join(F.broadcast(legal), "legal_status_id")
        .select(
            "property_id",
            "date_key",
            "price_in_billions",
            "area",
            (F.col("price_in_billions") * 1000 / F.col("area")).alias("price_per_m2_millions"),
            "legal_status_key",
        )
    )


@register(
    "scd_current_properties",
    f"""
    WITH {_SILVER_CTE.format(values=_sql_values())},
    latest AS (
        SELECT *, row_number() OVER (
            PARTITION BY property_id
            ORDER BY updated_at_ts DESC, property_id) AS rn2
        FROM silver
        WHERE data_quality_flag = 'VALID' AND property_id IS NOT NULL AND title IS NOT NULL
    )
    SELECT property_id, title, area, bedrooms, bathrooms, legal_status,
           updated_at_ts AS valid_from, true AS is_current
    FROM latest WHERE rn2 = 1
    """,
    doc="dim_properties SCD shape (dim_properties.sql:12-74): VALID filter, "
    "keep-latest W2, valid_from/is_current columns.",
)
def q_scd_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dim_properties(_silver(spark)).select(
        "property_id",
        "title",
        "area",
        "bedrooms",
        "bathrooms",
        "legal_status",
        "valid_from",
        "is_current",
    )


# CSV backfill fixture: stringly-typed (header-only CSV read), addresses with
# 3/2/1 comma segments, a NULL address, NULL price/area — every branch of
# normalize_csv.py's projection. The "House direction" column is deliberately
# absent to exercise the missing-column typed-null path.
_CSV_ROWS = [
    ("12 lê lợi, phường bến thành, quận 1, Hồ Chí Minh", "5,2 tỷ", "100", "5", "3", "3", "2", "Sổ đỏ"),
    ("5 tràng tiền, Hà Nội", "850 triệu", "85,5", None, "2", "2", "1", "Sổ hồng"),
    ("Đà Nẵng", "Thỏa thuận", "200", None, None, None, None, None),
    (None, "2 tỷ", "50", "4", "1", "1", "1", "Giấy tay"),
    ("9 nguyễn huệ, quận 1, Hồ Chí Minh", None, None, None, None, "1", "1", "Sổ hồng"),
]
_CSV_SCHEMA = (
    'Address string, Price string, Area string, Frontage string, Floors string, '
    'Bedrooms string, Bathrooms string, `Legal status` string'
)
_CSV_MTIME = "2024-05-01 00:00:00"


def _csv_values() -> str:
    rows = []
    for r in _CSV_ROWS:
        vals = ", ".join("NULL" if v is None else "'" + v.replace("'", "''") + "'" for v in r)
        rows.append(f"({vals})")
    cols = 'Address, Price, Area, Frontage, Floors, Bedrooms, Bathrooms, "Legal status"'
    return "(VALUES\n    " + ",\n    ".join(rows) + f"\n) AS csv({cols})"


@register(
    "csv_backfill_model",
    f"""
    SELECT
        md5(concat(coalesce(Address, ''), coalesce(Price, ''), coalesce(Area, ''))) AS list_id,
        Address AS "Địa chỉ",
        Address AS title,
        cast('{_CSV_MTIME}' as timestamp) AS file_modification_time,
        'csv_import' AS source_origin,
        Frontage AS "Chiều ngang",
        Floors AS "Tổng số tầng",
        Bedrooms AS "Số phòng ngủ",
        Bathrooms AS "Số phòng vệ sinh",
        "Legal status" AS "Giấy tờ pháp lý",
        cast(NULL as varchar) AS "Hướng cửa chính",
        Price AS price,
        trim(string_split(Address, ',')[-1]) AS "Tỉnh, thành phố",
        CASE WHEN len(string_split(Address, ',')) >= 2
             THEN trim(string_split(Address, ',')[-2]) END AS "Quận, Huyện",
        CASE WHEN len(string_split(Address, ',')) >= 3
             THEN trim(string_split(Address, ',')[-3]) END AS "Phường, thị xã, thị trấn",
        Area AS "Diện tích",
        Area AS "Diện tích đất",
        cast(NULL as varchar) AS "Diện tích sử dụng"
    FROM {_csv_values()}
    """,
    doc="The composed CSV backfill model (normalize_csv.py:45-109): F13 md5 "
    "content id, F14 negative-index address split, F19 provenance tag + "
    "typed nulls, stringly-typed bronze attribute mapping — one narrow "
    "projection, appendable to bronze at O(batch) cost. The 'House "
    "direction' column is absent from the fixture, exercising the "
    "missing-column null fill; images (typed-null array) is excluded from "
    "the compare projection only because the oracle's NULL list type "
    "differs, and is pinned in tests/test_medallion.py.",
)
def q_csv_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.plans.medallion import csv_backfill

    raw = spark.createDataFrame(_CSV_ROWS, _CSV_SCHEMA)
    out = csv_backfill(raw, mtime=F.to_timestamp(F.lit(_CSV_MTIME)))
    return out.drop("images")


@register(
    "merge_upsert_roundtrip",
    """
    WITH b1 AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey <= 4000
    ), b2 AS (
        SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey BETWEEN 2000 AND 8000
    )
    SELECT * FROM b1 WHERE o_orderkey NOT IN (SELECT o_orderkey FROM b2)
    UNION ALL
    SELECT * FROM b2
    """,
    doc="S7/S9/J3 storage spine as a driver oracle row (VERDICT r3 #3): "
    "materialize batch 1 of orders to a ParquetTable in TWO appends (split "
    "at key 2000, so the merge's zonemap pruning carries the non-"
    "overlapping dir by reference), MERGE batch 2 (updates for keys "
    "2000-4000, inserts for 4000-8000) keyed on o_orderkey, and return the "
    "final table. The oracle replays the upsert relationally: batch-1 rows "
    "whose key has no batch-2 match, plus every batch-2 row — the "
    "declarative definition of update-all/insert-all "
    "(reference: scripts/normalize_bronze_columns.py:145-148).",
)
def q_merge_upsert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.queries import _t
    from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    b1 = orders.filter(F.col("o_orderkey") <= 4000)
    b2 = orders.filter(F.col("o_orderkey").between(2000, 8000)).withColumn(
        "o_orderstatus", F.lit("U")
    )
    # deterministic per-SF scratch root; overwrite makes re-runs idempotent
    # (ParquetTable auto-vacuums old versions, so the dir stays small)
    root = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_merge_rt_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    t = ParquetTable(spark, f"{root}/orders_t")
    t.overwrite(b1.filter(F.col("o_orderkey") < 2000))
    t.append(b1.filter(F.col("o_orderkey") >= 2000))
    t.merge(b2, "o_orderkey")
    return t.read()


@register(
    "dq_schema_tests_report",
    """
    SELECT 'orders.o_orderkey' AS target, 'unique' AS test,
           (SELECT count(*) FROM (
               SELECT o_orderkey FROM orders
               GROUP BY o_orderkey HAVING count(*) > 1)) AS violations
    UNION ALL
    SELECT 'orders.o_orderkey', 'not_null',
           (SELECT count(*) FROM orders WHERE o_orderkey IS NULL)
    UNION ALL
    SELECT 'orders.o_custkey', 'not_null',
           (SELECT count(*) FROM orders WHERE o_custkey IS NULL)
    UNION ALL
    SELECT 'orders.o_orderstatus', 'accepted_values',
           (SELECT count(*) FROM orders
            WHERE o_orderstatus IS NOT NULL
              AND o_orderstatus NOT IN ('O', 'F', 'P'))
    """,
    doc="dbt-style schema tests as a read-side report — unique / not_null / "
    "accepted_values per target column with violation counts (reference: "
    "dbt/models/staging/schema.yml tests: unique + not_null on "
    "property_id; write-time twin: ParquetTable CHECK constraints). Each "
    "check is one narrow aggregate; the unique check is a groupBy-HAVING "
    "on the key — the declarative dedup-audit shape. A pipeline gates "
    "promotion on violations == 0, exactly like dbt test.",
)
def q_dq_schema_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.queries import _t

    orders = _t(spark, sf_dir, "orders")
    dup = (
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("orders.o_orderkey").alias("target"),
            F.lit("unique").alias("test"),
            "violations",
        )
    )
    nn_key = orders.filter(F.col("o_orderkey").isNull()).agg(
        F.count(F.lit(1)).alias("violations")
    ).select(
        F.lit("orders.o_orderkey").alias("target"),
        F.lit("not_null").alias("test"),
        "violations",
    )
    nn_cust = orders.filter(F.col("o_custkey").isNull()).agg(
        F.count(F.lit(1)).alias("violations")
    ).select(
        F.lit("orders.o_custkey").alias("target"),
        F.lit("not_null").alias("test"),
        "violations",
    )
    accepted = orders.filter(
        F.col("o_orderstatus").isNotNull()
        & ~F.col("o_orderstatus").isin("O", "F", "P")
    ).agg(F.count(F.lit(1)).alias("violations")).select(
        F.lit("orders.o_orderstatus").alias("target"),
        F.lit("accepted_values").alias("test"),
        "violations",
    )
    return dup.unionByName(nn_key).unionByName(nn_cust).unionByName(accepted)


@register(
    "incremental_summary_refresh",
    """
    SELECT date_trunc('day', ts)::date AS day,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           cast(sum(cast(value AS decimal(30,6))) AS double) AS sum_value
    FROM events
    GROUP BY 1
    """,
    doc="Incremental materialized-view maintenance as a hard oracle row "
    "(plans/mviews.py:refresh_daily_summary): load events in two batches "
    "(split at Jan 16), full-build the daily summary after batch 1, then "
    "refresh INCREMENTALLY after batch 2 — the change feed names the "
    "touched days (metadata diff), whole touched days re-aggregate from a "
    "zonemap-pruned span scan, and the recomputed rows MERGE keyed on day. "
    "The oracle is the ONE-SHOT aggregate over all events: equality proves "
    "incremental ≡ full, count-distinct included (which an additive "
    "delta-merge could not maintain). Replaces the reference's rebuild-"
    "every-run (dbt fct_daily_summary full rebuild).",
)
def q_incremental_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.plans.mviews import (
        refresh_daily_summary,
    )
    from lakehouse_architecture_for_realestatedata_spark.queries import (
        _events,
        cached_fixture,
        fixture_work_dir,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable

    ev = _events(spark, sf_dir).select("ts", "user_id", "value")
    cutoff = "2024-01-16"
    # Batch-1 state (base table + full-built summary at v1) builds once
    # per sf and caches (the ivf_cdc_sync bench-fixture pattern, VERDICT
    # r12 #5 applied here too: the row should time the INCREMENTAL
    # refresh — append + touched-day recompute + keyed MERGE — not the
    # initial build). Each call copies the versioned tables into a
    # process-unique work dir and runs the incremental day on the copy;
    # cached_fixture = build-then-rename, safe under concurrent
    # bench/pytest (ADVICE r13).
    cache = os.path.join(
        tempfile.gettempdir(),
        f"lakehouse_mview_v3_{os.path.basename(sf_dir.rstrip('/'))}",
    )

    def _build(b: str) -> str:
        base0 = ParquetTable(spark, f"{b}/events_base")
        summary0 = ParquetTable(spark, f"{b}/daily_summary")
        base0.overwrite(ev.filter(F.col("ts") < cutoff))
        return json.dumps({"v1": refresh_daily_summary(base0, summary0)})

    v1 = json.loads(cached_fixture(cache, _build))["v1"]
    work = fixture_work_dir(cache)
    shutil.copytree(f"{cache}/events_base", f"{work}/events_base")
    shutil.copytree(f"{cache}/daily_summary", f"{work}/daily_summary")
    base = ParquetTable(spark, f"{work}/events_base")
    summary = ParquetTable(spark, f"{work}/daily_summary")
    base.append(ev.filter(F.col("ts") >= cutoff))
    refresh_daily_summary(base, summary, since_version=v1)
    return summary.read().select("day", "n_events", "n_users", "sum_value")


@register(
    "medallion_two_batch_pipeline",
    f"""
    WITH {_SILVER_CTE.format(values=_sql_values())},
    filtered AS (
        SELECT * FROM silver
        WHERE data_quality_flag = 'VALID'
          AND property_id IS NOT NULL AND title IS NOT NULL AND address IS NOT NULL
          AND price_in_billions IS NOT NULL AND price_in_billions > 0 AND price_in_billions < 1000
          AND (area IS NULL OR (area > 0 AND area < 10000))
    ),
    fct AS (
        SELECT property_id,
               cast(date_trunc('day', updated_at_ts) as date) AS date_key,
               price_in_billions, area,
               round(price_in_billions * 1000 / area, 3) AS price_per_m2_millions,
               bedrooms, bathrooms
        FROM filtered
    )
    SELECT date_key,
           count(DISTINCT property_id) AS total_listings,
           round(sum(price_in_billions), 2) AS total_value_billions,
           round(avg(price_in_billions), 2) AS avg_price_billions,
           round(min(price_in_billions), 2) AS min_price_billions,
           round(max(price_in_billions), 2) AS max_price_billions,
           round(avg(price_per_m2_millions), 2) AS avg_price_per_m2,
           round(avg(area), 1) AS avg_area_m2,
           round(avg(cast(bedrooms as double)), 1) AS avg_bedrooms,
           round(avg(cast(bathrooms as double)), 1) AS avg_bathrooms,
           count(bedrooms) AS listings_with_bedrooms,
           count(bathrooms) AS listings_with_bathrooms,
           count(area) AS listings_with_area
    FROM fct GROUP BY date_key
    """,
    doc="VERDICT r5 #6 — the full MedallionPipeline orchestrator "
    "(plans/medallion.py MedallionPipeline.run) as a hard oracle row: "
    "ingest the bronze fixture in TWO mtime-split batches, run() the whole "
    "bronze→silver→gold chain after each (high-water-mark silver MERGE, "
    "dim MERGEs, fct MERGE on property_id, summary rebuild), then emit the "
    "gold fct_daily_summary table. The oracle is the ONE-SHOT chain in "
    "DuckDB over the same fixture — equality proves the incremental "
    "orchestration (watermark filter + keyed MERGEs across two cycles, "
    "including the L1 re-list whose date_key MOVES between batches) "
    "converges to the full rebuild.",
)
def q_medallion_two_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from lakehouse_architecture_for_realestatedata_spark.plans.medallion import MedallionPipeline

    bronze = _bronze_df(spark)
    b1 = bronze.filter(F.col("file_modification_time") <= "2024-01-01 00:00:00")
    b2 = bronze.filter(F.col("file_modification_time") > "2024-01-01 00:00:00")
    # per-evaluation unique root (mkdtemp): a fixed shared path raced when
    # two evaluations (parallel pytest + driver) ran concurrently on the
    # same fixture and rmtree'd each other's live lakehouse (ADVICE r6)
    root = tempfile.mkdtemp(
        prefix=f"lakehouse_medallion2b_{os.path.basename(sf_dir.rstrip('/'))}_"
    )
    pipe = MedallionPipeline(spark, root)
    created = F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    pipe.ingest_bronze(b1)
    pipe.run(created_at=created)
    pipe.ingest_bronze(b2)
    pipe.run(created_at=created)
    out = pipe.gold_fct_daily.read().select(
        "date_key",
        "total_listings",
        "total_value_billions",
        "avg_price_billions",
        "min_price_billions",
        "max_price_billions",
        "avg_price_per_m2",
        "avg_area_m2",
        "avg_bedrooms",
        "avg_bathrooms",
        "listings_with_bedrooms",
        "listings_with_bathrooms",
        "listings_with_area",
    )
    # gold summary is metadata-scale (one row per day): pin it off the temp
    # lakehouse (localCheckpoint detaches lineage from the files) so the
    # unique root can be removed before the caller collects
    out = out.localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "footer_profile_lineitem",
    """
    SELECT count(*) AS n_rows,
           min(l_orderkey) AS min_l_orderkey,
           max(l_orderkey) AS max_l_orderkey,
           min(l_linenumber) AS min_l_linenumber,
           max(l_linenumber) AS max_l_linenumber,
           min(l_quantity) AS min_l_quantity,
           max(l_quantity) AS max_l_quantity,
           min(l_extendedprice) AS min_l_extendedprice,
           max(l_extendedprice) AS max_l_extendedprice
    FROM lineitem
    """,
    doc="Metadata-scale table profile (sources/readers.py:footer_profile): "
    "n_rows + per-column min/max served from PARQUET FOOTER STATS — the "
    "V2 scan plans PushedAggregation: [COUNT(*), MIN(..), MAX(..)] and "
    "never reads a data page (require_pushdown=True makes that a runtime "
    "guarantee, not a hope). At 100 TB this is the seconds-long 'what "
    "landed today' pass a lakehouse runs before anything heavier; "
    "non-stats-pushable types (string/timestamp/decimal) are refused BY "
    "NAME so the metadata-scale claim can never silently degrade into "
    "the full scan it exists to avoid. Footer min/max are exact, so the "
    "oracle is the plain aggregate over the same parquet.",
)
def q_footer_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from lakehouse_architecture_for_realestatedata_spark.sources.readers import (
        footer_profile,
    )

    return footer_profile(
        spark,
        f"{sf_dir}/lineitem.parquet",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        require_pushdown=True,
    )
