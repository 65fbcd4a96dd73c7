"""Domain parsing functions (SURVEY §2.8 F1-F20), as composable Column exprs.

Each function takes/returns ``pyspark.sql.Column`` so they compose inside a
single select and stay inside whole-stage codegen. Reference citations mark
the dbt/PySpark code whose semantics each reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# First run of digits/commas/dots in a free-text measure ("120 m²", "5,2 tỷ").
# reference: dbt/models/staging/stg_properties.sql:45 — r'([\d,.]+)'
_NUMERIC_TOKEN = r"([\d,.]+)"


def parse_numeric(col: Column | str) -> Column:
    """F1+F2+F4: extract first numeric token, Vietnamese decimal-comma → dot,
    cast to double. NULL when no token. ``try_cast`` (not ``cast``) so the
    NULL-on-malformed semantics hold under ANY session ANSI setting — the
    extracted token is '' when the regex misses, which plain cast would
    reject under ANSI mode. reference: dbt/models/staging/stg_properties.sql:45-55."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_extract(c, _NUMERIC_TOKEN, 1), ",", "."
    ).try_cast("double")


def parse_int(col: Column | str) -> Column:
    """First digit run as int (floors/bedrooms/bathrooms: "2 phòng" → 2).
    try_cast: '' (no digit run) → NULL under ANSI too.
    reference: dbt/models/staging/stg_properties.sql:57-59."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, r"(\d+)", 1).try_cast("int")


def parse_price_vnd(col: Column | str) -> Column:
    """F6: normalize Vietnamese price text to billions of VND.

    "5,2 tỷ" → 5.2 · "850 triệu" → 0.85 · "Thỏa thuận"/"Liên hệ" → NULL
    (negotiable) · otherwise parse the raw number as billions.
    reference: dbt/models/staging/stg_properties.sql:62-85.
    """
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    num = parse_numeric(c)
    return (
        F.when(low.like("%tỷ%"), num)
        .when(low.like("%triệu%"), num / 1000)
        .when(low.like("%thỏa thuận%") | low.like("%liên hệ%"), F.lit(None).cast("double"))
        .otherwise(num)
    )


def norm_text(col: Column | str) -> Column:
    """F3+F10: collapse whitespace, trim, proper-case.
    reference: dbt/models/staging/stg_properties.sql:88-95."""
    c = F.col(col) if isinstance(col, str) else col
    return F.initcap(F.trim(F.regexp_replace(c, r"\s+", " ")))


def quality_flag(price: Column | str, address: Column | str) -> Column:
    """F7: data-quality classification over the *raw* columns.
    MISSING_PRICE ≻ MISSING_ADDRESS ≻ VALID (first-match-wins order matters).
    reference: dbt/models/staging/stg_properties.sql:98-102."""
    p = F.col(price) if isinstance(price, str) else price
    a = F.col(address) if isinstance(address, str) else address
    low_p = F.lower(p)
    return (
        F.when(
            p.isNull() | low_p.like("%thỏa thuận%") | low_p.like("%liên hệ%"), F.lit("MISSING_PRICE")
        )
        .when(a.isNull() | (F.trim(a) == ""), F.lit("MISSING_ADDRESS"))
        .otherwise(F.lit("VALID"))
    )


def stable_id(col: Column | str) -> Column:
    """F12: stable int surrogate key from a natural key —
    ``abs(hash(x)) % 2147483647`` (Murmur3). Chosen by the reference over
    row_number precisely because it is stable across runs/partitionings —
    the property that matters at 100 TB where a global row_number would be a
    single-partition sort. reference: dbt/models/marts/dim_locations.sql:46."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.abs(F.hash(c)) % F.lit(2147483647)).cast("int")


def md5_id(*cols: Column | str) -> Column:
    """F13: deterministic string id for rows lacking a natural key —
    md5(concat(coalesce(col,'') ...)).
    reference: scripts/normalize_csv.py:60-65."""
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.md5(F.concat(*parts))


def split_address(col: Column | str) -> dict[str, Column]:
    """F14: province/district/ward from a comma-separated address by negative
    indexing from the end (province is last).
    reference: scripts/normalize_csv.py:81-83."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ",")
    return {
        "province": F.trim(F.element_at(parts, -1)),
        "district": F.when(F.size(parts) >= 2, F.trim(F.element_at(parts, -2))),
        "ward": F.when(F.size(parts) >= 3, F.trim(F.element_at(parts, -3))),
    }


# Province → region bucketing (F8). The reference enumerates 63 provinces in
# three 20+-way IN lists (reference: dbt/models/marts/dim_locations.sql:53-71).
_REGION_SOUTH = [
    "Hồ Chí Minh", "Bình Dương", "Đồng Nai", "Bà Rịa - Vũng Tàu", "Long An",
    "Tiền Giang", "Bến Tre", "Trà Vinh", "Vĩnh Long", "Đồng Tháp", "An Giang",
    "Kiên Giang", "Cần Thơ", "Hậu Giang", "Sóc Trăng", "Bạc Liêu", "Cà Mau",
    "Tây Ninh", "Bình Phước",
]
_REGION_NORTH = [
    "Hà Nội", "Hải Phòng", "Quảng Ninh", "Bắc Ninh", "Hải Dương", "Hưng Yên",
    "Vĩnh Phúc", "Thái Nguyên", "Bắc Giang", "Phú Thọ", "Lào Cai", "Yên Bái",
    "Tuyên Quang", "Hà Giang", "Cao Bằng", "Bắc Kạn", "Lạng Sơn", "Thái Bình",
    "Nam Định", "Hà Nam", "Ninh Bình", "Hòa Bình", "Sơn La", "Điện Biên",
    "Lai Châu",
]
_REGION_CENTRAL = [
    "Đà Nẵng", "Thừa Thiên Huế", "Quảng Nam", "Quảng Ngãi", "Bình Định",
    "Phú Yên", "Khánh Hòa", "Ninh Thuận", "Bình Thuận", "Thanh Hóa",
    "Nghệ An", "Hà Tĩnh", "Quảng Bình", "Quảng Trị", "Kon Tum", "Gia Lai",
    "Đắk Lắk", "Đắk Nông", "Lâm Đồng",
]


def region_bucket(province: Column | str) -> Column:
    """F8: province → Miền Nam / Miền Bắc / Miền Trung / Khác / Unknown.
    reference: dbt/models/marts/dim_locations.sql:53-71."""
    p = F.col(province) if isinstance(province, str) else province
    return (
        F.when(p.isNull(), F.lit("Unknown"))
        .when(p.isin(_REGION_SOUTH), F.lit("Miền Nam"))
        .when(p.isin(_REGION_NORTH), F.lit("Miền Bắc"))
        .when(p.isin(_REGION_CENTRAL), F.lit("Miền Trung"))
        .otherwise(F.lit("Khác"))
    )
