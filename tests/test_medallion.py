"""End-to-end medallion pipeline tests on a deterministic bronze fixture
shaped like the reference's raw crawl data (FIXTURES.md §1): Vietnamese
columns, duplicate list_ids across files, price/area free text, NULL
addresses, schema drift."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.plans.checks import Check, run_checks
from lakehouse_architecture_for_realestatedata_spark.plans.medallion import (
    MedallionPipeline,
    dim_legal_status,
    dim_locations,
    dim_properties,
    fct_daily_summary,
    fct_properties,
    normalize_columns,
    silver_properties,
)

RAW_SCHEMA = (
    "list_id string, title string, price string, address string, "
    "`Diện tích` string, `Số phòng ngủ` string, `Giấy tờ pháp lý` string, "
    "`Tỉnh, thành phố` string, file_modification_time timestamp"
)


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def bronze(spark):
    rows = [
        # dup list_id across files: file2 must win
        ("L1", "Nhà Q1 cũ", "5,2 tỷ", "12 Lê Lợi, Quận 1", "100 m²", "3", "Sổ đỏ", "Hồ Chí Minh", _ts("2024-01-01T00:00:00")),
        ("L1", "Nhà Q1 mới", "5,5 tỷ", "12 Lê Lợi, Quận 1", "100 m²", "3", "Sổ đỏ", "Hồ Chí Minh", _ts("2024-01-02T00:00:00")),
        ("L2", "Nhà HN", "850 triệu", "5 Tràng Tiền, Hoàn Kiếm", "85,5", "2 phòng", "Sổ hồng riêng", "Hà Nội", _ts("2024-01-01T00:00:00")),
        ("L3", "Đất nền", "Thỏa thuận", "Khu X, Đà Nẵng", "200", None, "Đang chờ sổ", "Đà Nẵng", _ts("2024-01-01T00:00:00")),
        ("L4", "Nhà không địa chỉ", "2 tỷ", None, "50", "1", None, None, _ts("2024-01-02T00:00:00")),
        ("L5", "Giá thô", "2500", "1 Nơi Nào Đó", None, None, "Giấy tay", "Nowhere Province", _ts("2024-01-02T00:00:00")),
    ]
    return spark.createDataFrame(rows, RAW_SCHEMA)


def test_normalize_columns_rename_sanitize_dedup(spark, bronze):
    out = normalize_columns(bronze)
    assert "area_raw" in out.columns and "province_raw" in out.columns
    assert "Diện tích" not in out.columns
    # dedup kept the later file's row for L1
    l1 = out.filter(F.col("list_id") == "L1").collect()
    assert len(l1) == 1 and l1[0]["title"] == "Nhà Q1 mới"


def test_normalize_skip_and_firstwins(spark):
    df = spark.createDataFrame([("a", "b", "c")], "`X Y` string, `x_y` string, drop_me string")
    out = normalize_columns(df, mapping={}, skip=["drop_me"], dedup_key="nope")
    # 'X Y' sanitizes to x_y; the existing x_y column is dropped (first wins)
    assert out.columns == ["x_y"]
    assert out.collect()[0]["x_y"] == "a"


@pytest.fixture(scope="module")
def stg(spark, bronze):
    return silver_properties(
        normalize_columns(bronze), created_at=F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    )


def test_silver_parsing(stg):
    rows = {r["property_id"]: r for r in stg.collect()}
    assert rows["L1"]["price_in_billions"] == 5.5
    assert rows["L1"]["area"] == 100.0
    assert rows["L2"]["price_in_billions"] == 0.85
    assert rows["L2"]["area"] == 85.5
    assert rows["L2"]["bedrooms"] == 2
    assert rows["L3"]["price_in_billions"] is None
    assert rows["L3"]["data_quality_flag"] == "MISSING_PRICE"
    assert rows["L4"]["data_quality_flag"] == "MISSING_ADDRESS"
    assert rows["L5"]["price_in_billions"] == 2500.0
    assert rows["L1"]["data_quality_flag"] == "VALID"
    assert rows["L1"]["province"] == "Hồ Chí Minh"


def test_dims(stg):
    locs = {r["full_address"]: r for r in dim_locations(stg).collect()}
    assert locs["12 Lê Lợi, Quận 1"]["region"] == "Miền Nam"
    assert locs["5 Tràng Tiền, Hoàn Kiếm"]["region"] == "Miền Bắc"
    assert locs["1 Nơi Nào Đó"]["region"] == "Khác"
    legal = {r["legal_status"]: r for r in dim_legal_status(stg).collect()}
    assert "Không xác định" in legal  # injected default row (U1)
    assert legal["Sổ Đỏ"]["legal_status_category"] == "Có sổ đỏ/hồng"
    dp = dim_properties(stg)
    assert dp.filter(F.col("is_current")).count() == dp.count()


def test_fct_properties_joins_and_measures(stg):
    fct = fct_properties(stg, dim_locations(stg), dim_legal_status(stg))
    rows = {r["property_id"]: r for r in fct.collect()}
    # L3 (MISSING_PRICE), L4 (MISSING_ADDRESS) excluded; L5 price 2500 ≥ 1000 excluded
    assert set(rows) == {"L1", "L2"}
    assert rows["L1"]["price_per_m2_millions"] == 55.0  # 5.5 *1000 / 100
    # NULL legal_status would route to the default dim row (J2)
    assert rows["L1"]["location_id"] is not None
    summary = fct_daily_summary(fct).collect()
    assert summary[0]["total_listings"] >= 1


def test_pipeline_end_to_end_and_incremental_idempotence(spark, bronze, tmp_path):
    pipe = MedallionPipeline(spark, str(tmp_path / "lake"))
    pipe.ingest_bronze(normalize_columns(bronze))
    created = F.to_timestamp(F.lit("2024-02-01 00:00:00"))
    pipe.run(created_at=created)
    first = sorted(map(tuple, pipe.gold_fct_properties.read().collect()))
    n_silver = pipe.silver.read().count()

    # re-run with no new data: nothing changes (idempotence — the property
    # the reference's design implies but never asserts, SURVEY §5)
    pipe.run(created_at=created)
    assert sorted(map(tuple, pipe.gold_fct_properties.read().collect())) == first
    assert pipe.silver.read().count() == n_silver

    # late-arriving update for L2: merge updates in place, no dup PK
    update = spark.createDataFrame(
        [("L2", "Nhà HN sửa", "900 triệu", "5 Tràng Tiền, Hoàn Kiếm", "85,5", "2",
          "Sổ hồng riêng", "Hà Nội", _ts("2024-01-05T00:00:00"))],
        RAW_SCHEMA,
    )
    pipe.ingest_bronze(normalize_columns(update))
    pipe.run(created_at=created)
    l2 = pipe.silver.read().filter(F.col("property_id") == "L2").collect()
    assert len(l2) == 1 and l2[0]["price_in_billions"] == 0.9
    fct_l2 = pipe.gold_fct_properties.read().filter(F.col("property_id") == "L2").collect()
    assert len(fct_l2) == 1 and fct_l2[0]["price_in_billions"] == 0.9

    # dbt-style checks over the final tables
    report = run_checks(
        pipe.silver.read(),
        [
            Check("pk_unique", "unique", "property_id"),
            Check("pk_not_null", "not_null", "property_id"),
            Check(
                "flag_domain",
                "accepted_values",
                "data_quality_flag",
                ("VALID", "INVALID_AREA", "MISSING_PRICE", "MISSING_ADDRESS"),
            ),
        ],
    )
    assert all(r["passed"] for r in report), report


def test_standalone_expect_checks(spark):
    """The single-check entry points must agree with the fused run_checks
    path (they are the API a user calls to LIST violating rows, not just
    count them)."""
    from lakehouse_architecture_for_realestatedata_spark.plans.checks import (
        expect_accepted_values,
        expect_not_null,
        expect_unique,
    )

    df = spark.createDataFrame(
        [(1, "ok"), (2, None), (2, "bad"), (3, "ok")], "id int, status string"
    )
    assert [r["id"] for r in expect_not_null(df, "status").collect()] == [2]
    assert expect_unique(df, "id").collect()[0]["id"] == 2
    viol = expect_accepted_values(df, "status", ["ok"]).collect()
    assert [r["status"] for r in viol] == ["bad"]  # NULLs pass (dbt semantics)


def test_completeness_report_single_pass(spark):
    from lakehouse_architecture_for_realestatedata_spark.operators.aggregates import (
        completeness_report,
    )
    from lakehouse_architecture_for_realestatedata_spark.plans.explain import physical_plan

    df = spark.createDataFrame(
        [(1, "a", None), (2, None, None), (3, "c", "x"), (4, "d", None)],
        "id int, s string, t string",
    )
    rep = completeness_report(df, ["id", "s", "t"])
    got = {r["column_name"]: (r["non_null_count"], r["fill_rate"]) for r in rep.collect()}
    assert got == {"id": (4, 1.0), "s": (3, 0.75), "t": (1, 0.25)}
    # single scan: one aggregate pass feeds the unpivot (static plan, before
    # AQE rewrites the string with query-stage scaffolding)
    fresh = physical_plan(completeness_report(df, ["id", "s", "t"]), mode="simple")
    assert fresh.count("Scan") == 1, fresh


def test_profile_columns_hostile_column_names(spark):
    """ADVICE r6: names with backticks/quotes must profile cleanly — the
    unpivot is built from DataFrame API with ordinal-derived aliases, not
    interpolated SQL text."""
    from lakehouse_architecture_for_realestatedata_spark.plans.checks import profile_columns

    df = (
        spark.range(5)
        .withColumnRenamed("id", "we`ird")
        .withColumn("o'k", F.col("`we``ird`") * 2)
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    assert set(rows) == {"we`ird", "o'k"}
    assert rows["we`ird"]["n_rows"] == 5
    assert rows["we`ird"]["n_null"] == 0
    assert rows["o'k"]["n_distinct"] == 5
    assert rows["o'k"]["max_value"] == "8"
