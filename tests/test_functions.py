"""Unit tests for the scalar function layer — including the Vietnamese-text
behaviors that are kept out of the hash-compared oracle queries
(SURVEY §7.4 risk 1: unicode initcap/lower/like differences across engines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.functions.parsing import (
    md5_id,
    norm_text,
    parse_int,
    parse_numeric,
    parse_price_vnd,
    quality_flag,
    region_bucket,
    split_address,
    stable_id,
)
from lakehouse_architecture_for_realestatedata_spark.functions.text import (
    doc_fingerprint,
    duplicate_line_ratio,
    lang_id,
    mean_word_length,
    pii_count,
    redact_pii,
    shingles,
    token_count,
    tokens,
)


def _one(spark, expr, value, schema="s string"):
    return spark.createDataFrame([(value,)], schema).select(expr.alias("x")).collect()[0]["x"]


def test_parse_numeric_vietnamese(spark):
    assert _one(spark, parse_numeric("s"), "120 m²") == 120.0
    assert _one(spark, parse_numeric("s"), "85,5") == 85.5
    assert _one(spark, parse_numeric("s"), "4.5 m") == 4.5
    assert _one(spark, parse_numeric("s"), "no digits") is None
    assert _one(spark, parse_numeric("s"), None) is None


def test_parse_int(spark):
    assert _one(spark, parse_int("s"), "2 phòng") == 2
    assert _one(spark, parse_int("s"), "tầng 12") == 12
    assert _one(spark, parse_int("s"), "x") is None


def test_parse_price_vnd(spark):
    assert _one(spark, parse_price_vnd("s"), "5,2 tỷ") == 5.2
    assert _one(spark, parse_price_vnd("s"), "850 triệu") == 0.85
    assert _one(spark, parse_price_vnd("s"), "Thỏa thuận") is None
    assert _one(spark, parse_price_vnd("s"), "Liên hệ") is None
    assert _one(spark, parse_price_vnd("s"), "2500") == 2500.0
    assert _one(spark, parse_price_vnd("s"), None) is None


def test_norm_text_whitespace_and_case(spark):
    assert _one(spark, norm_text("s"), "  hà   NỘI  city ") == "Hà Nội City"


def test_quality_flag_priority(spark):
    df = spark.createDataFrame(
        [("Thỏa thuận", None), (None, "addr"), ("5 tỷ", None), ("5 tỷ", "  "), ("5 tỷ", "ok")],
        "price string, address string",
    )
    flags = [r["f"] for r in df.select(quality_flag("price", "address").alias("f")).collect()]
    # MISSING_PRICE outranks MISSING_ADDRESS (first-match-wins CASE order)
    assert flags == [
        "MISSING_PRICE",
        "MISSING_PRICE",
        "MISSING_ADDRESS",
        "MISSING_ADDRESS",
        "VALID",
    ]


def test_stable_id_is_stable_and_in_range(spark):
    a = _one(spark, stable_id("s"), "123 Lê Lợi, Quận 1")
    b = _one(spark, stable_id("s"), "123 Lê Lợi, Quận 1")
    assert a == b and 0 <= a < 2147483647


def test_md5_id_null_safe(spark):
    df = spark.createDataFrame([("a", None), ("a", "")], "x string, y string")
    vals = [r["k"] for r in df.select(md5_id("x", "y").alias("k")).collect()]
    assert vals[0] == vals[1]  # coalesce(NULL,'') == ''


def test_split_address_negative_indexing(spark):
    parts = split_address("s")
    df = spark.createDataFrame(
        [("12 Phố Huế, Phường Bến Thành, Quận 1, Hồ Chí Minh",), ("chỉ tỉnh",)], "s string"
    ).select(
        parts["province"].alias("p"), parts["district"].alias("d"), parts["ward"].alias("w")
    )
    rows = df.collect()
    assert (rows[0]["p"], rows[0]["d"], rows[0]["w"]) == ("Hồ Chí Minh", "Quận 1", "Phường Bến Thành")
    assert rows[1]["p"] == "chỉ tỉnh" and rows[1]["d"] is None and rows[1]["w"] is None


def test_region_bucket(spark):
    cases = {
        "Hồ Chí Minh": "Miền Nam",
        "Hà Nội": "Miền Bắc",
        "Đà Nẵng": "Miền Trung",
        "Somewhere Else": "Khác",
        None: "Unknown",
    }
    df = spark.createDataFrame([(k,) for k in cases], "s string")
    out = {r["s"]: r["r"] for r in df.select("s", region_bucket("s").alias("r")).collect()}
    assert out == cases


def test_tokens_and_shingles(spark):
    assert _one(spark, tokens("s"), "Hello, World! 42") == ["hello", "world", "42"]
    assert _one(spark, token_count("s"), "a b  c") == 3
    assert _one(spark, shingles("s", 2), "a b c") == ["a b", "b c"]
    assert _one(spark, shingles("s", 5), "a b c") == ["a b c"]  # short-doc fallback


def test_bpe_ish_token_count(spark):
    from lakehouse_architecture_for_realestatedata_spark.functions.text import bpe_ish_token_count

    # letter runs + digit runs + each punctuation char as its own piece:
    # don't → don, ', t; 3.14 → 3, ., 14; trailing ! is one piece
    assert _one(spark, bpe_ish_token_count("s"), "don't pay 3.14!") == 8
    assert _one(spark, bpe_ish_token_count("s"), "") == 0
    assert _one(spark, bpe_ish_token_count("s"), "   ") == 0
    # always >= the whitespace token count on word-y text
    assert _one(spark, bpe_ish_token_count("s"), "plain words only") == 3


def test_doc_fingerprint_order_insensitive(spark):
    a = _one(spark, doc_fingerprint("s"), "alpha beta gamma")
    b = _one(spark, doc_fingerprint("s"), "gamma alpha beta")
    c = _one(spark, doc_fingerprint("s"), "alpha beta delta")
    assert a == b and a != c


def test_lang_id_profiles(spark):
    assert _one(spark, lang_id("s"), "the cat sat on the mat and it is fine") == "en"
    assert _one(spark, lang_id("s"), "der hund ist nicht da und die katze") == "de"
    assert _one(spark, lang_id("s"), "xyzzy qwerty") == "und"


def test_duplicate_line_ratio(spark):
    assert _one(spark, duplicate_line_ratio("s"), "a\nb\na\n\n  \na") == 0.5  # 4 lines, 2 dups
    assert _one(spark, duplicate_line_ratio("s"), "only one line") == 0.0
    assert _one(spark, duplicate_line_ratio("s"), "") == 0.0


def test_mean_word_length(spark):
    assert _one(spark, mean_word_length("s"), "ab cdef") == 3.0
    assert _one(spark, mean_word_length("s"), "...") == 0.0


def test_redact_pii(spark):
    s = "mail a.b+c@ex-ample.co.uk or call +84-909-123-456 now"
    out = _one(spark, redact_pii("s"), s)
    assert out == "mail <EMAIL> or call <PHONE> now"
    assert _one(spark, pii_count("s"), s) == 2
    # phone pattern must not eat digits inside an email's domain
    assert _one(spark, redact_pii("s"), "x9@y99.com") == "<EMAIL>"
    # bare long numbers without + prefix are NOT phones (avoid false redaction)
    assert _one(spark, redact_pii("s"), "id 123456789012") == "id 123456789012"


def test_filter_top_quantile(spark):
    from lakehouse_architecture_for_realestatedata_spark.functions.text import filter_top_quantile

    rows = [(i, "a" if i < 10 else "b", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, grp string, score double")
    # global: keep top 50% → scores >= exact p50 (9.5) → ids 10..19
    kept = filter_top_quantile(df, "score", 0.5, exact=True)
    assert sorted(r["id"] for r in kept.collect()) == list(range(10, 20))
    # per-group: top 40% of each group's own distribution
    per = filter_top_quantile(df, "score", 0.4, by="grp", exact=True, threshold_col="thr")
    got = {r["grp"]: sorted(x["id"] for x in per.filter(F.col("grp") == r["grp"]).collect())
           for r in per.select("grp").distinct().collect()}
    assert got["a"] == [6, 7, 8, 9] and got["b"] == [16, 17, 18, 19]
    assert "thr" in per.columns
    # approx path: the sketch returns an actual member (9.0), not the
    # interpolated 9.5, so the kept set is the exact set plus the boundary row
    ap = filter_top_quantile(df, "score", 0.5, exact=False)
    assert sorted(r["id"] for r in ap.collect()) == list(range(9, 20))


def test_filter_top_quantile_null_stratum_survives(spark):
    """A NULL group value ('unknown language') is a real stratum: keep_frac
    1.0 must keep its rows, not silently drop them at the join."""
    from lakehouse_architecture_for_realestatedata_spark.functions.text import filter_top_quantile

    df = spark.createDataFrame(
        [(1, None, 5.0), (2, None, 1.0), (3, "en", 2.0)],
        "id long, grp string, score double",
    )
    kept = filter_top_quantile(df, "score", 1.0, by="grp", exact=True)
    assert sorted(r["id"] for r in kept.collect()) == [1, 2, 3]
