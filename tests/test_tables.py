"""ParquetTable: Delta-semantics (append/overwrite/merge/snapshot) tests —
the invariants the reference relies on but never asserts (SURVEY §5):
PK uniqueness post-MERGE, idempotent re-runs, schema evolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable


def _df(spark, rows, schema="id int, val string, ts timestamp"):
    return spark.createDataFrame(rows, schema)


def test_overwrite_and_read(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t1"))
    t.overwrite(_df(spark, [(1, "a", None), (2, "b", None)]))
    assert t.read().count() == 2
    t.overwrite(_df(spark, [(3, "c", None)]))
    assert t.read().count() == 1
    assert t.version() == 1


def test_append_with_schema_merge(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t2"))
    t.append(spark.createDataFrame([(1, "a")], "id int, val string"))
    t.append(spark.createDataFrame([(2, "b", 9.5)], "id int, val string, extra double"))
    out = t.read()
    assert set(out.columns) == {"id", "val", "extra"}
    row = {r["id"]: r for r in out.collect()}
    assert row[1]["extra"] is None and row[2]["extra"] == 9.5


def _parquet_files(d):
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = (os.path.getsize(p), os.path.getmtime(p))
    return out


def test_append_is_file_additive(spark, tmp_path):
    """The 100 TB contract: appending N rows costs O(N) I/O — the prior
    snapshot's files are referenced by the new manifest byte-identical,
    never read, copied, or rewritten."""
    t = ParquetTable(spark, str(tmp_path / "t10"))
    t.overwrite(spark.range(1000).select(F.col("id"), F.lit("base").alias("val")))
    base_files = _parquet_files(t.data_dirs()[0])
    assert base_files

    t.append(spark.range(1000, 1010).select(F.col("id"), F.lit("inc").alias("val")))
    dirs = t.data_dirs()
    assert len(dirs) == 2  # one prior dir referenced + one new dir written
    # prior files untouched: same paths, sizes, mtimes (reused, not copied)
    assert _parquet_files(dirs[0]) == base_files
    # the new dir holds only the increment
    inc_rows = spark.read.parquet(dirs[1]).count()
    assert inc_rows == 10
    assert t.read().count() == 1010


def test_append_empty_increment_keeps_snapshot(spark, tmp_path):
    """A zero-row append (idempotent ingest re-run) must not add unreadable
    dirs or change the data."""
    t = ParquetTable(spark, str(tmp_path / "t11"))
    t.overwrite(spark.createDataFrame([(1, "a")], "id int, val string"))
    t.append(spark.createDataFrame([], "id int, val string"))
    assert len(t.data_dirs()) == 1
    assert t.read().count() == 1


def test_append_schema_mismatch_raises_without_merge(spark, tmp_path):
    import pytest

    t = ParquetTable(spark, str(tmp_path / "t12"))
    t.overwrite(spark.createDataFrame([(1, "a")], "id int, val string"))
    with pytest.raises(ValueError, match="schema mismatch"):
        t.append(
            spark.createDataFrame([(2, "b", 1.0)], "id int, val string, extra double"),
            merge_schema=False,
        )


def test_merge_upsert_update_and_insert(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t3"))
    t.overwrite(spark.createDataFrame([(1, "old"), (2, "keep")], "id int, val string"))
    t.merge(spark.createDataFrame([(1, "new"), (3, "ins")], "id int, val string"), key="id")
    rows = {r["id"]: r["val"] for r in t.read().collect()}
    assert rows == {1: "new", 2: "keep", 3: "ins"}
    # PK stays unique after merge (the invariant the reference's dbt tests assert)
    assert t.read().groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_merge_idempotent(spark, tmp_path):
    """Re-running the same merge must not change table state (SURVEY §5)."""
    t = ParquetTable(spark, str(tmp_path / "t4"))
    src = spark.createDataFrame([(1, "x"), (2, "y")], "id int, val string")
    t.merge(src, key="id")
    first = sorted(map(tuple, t.read().collect()))
    t.merge(src, key="id")
    assert sorted(map(tuple, t.read().collect())) == first


def test_merge_insert_only(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t5"))
    t.overwrite(spark.createDataFrame([(1, "orig")], "id int, val string"))
    t.merge(
        spark.createDataFrame([(1, "clobber"), (2, "new")], "id int, val string"),
        key="id",
        when_matched="keep_target",
    )
    rows = {r["id"]: r["val"] for r in t.read().collect()}
    assert rows == {1: "orig", 2: "new"}


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t6"))
    t.overwrite(spark.createDataFrame([(1, "v0")], "id int, val string"))
    old = t.version()
    t.overwrite(spark.createDataFrame([(1, "v1")], "id int, val string"))
    assert t.read(old).collect()[0]["val"] == "v0"
    assert t.read().collect()[0]["val"] == "v1"


def test_compact_binpacks_small_files(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t8"))
    t.overwrite(spark.range(10000).repartition(16).select(F.col("id"), (F.col("id") % 7).alias("g")))
    before = t.file_stats()
    assert before["n_files"] == 16
    data_before = sorted(map(tuple, t.read().collect()))
    after = t.compact(target_bytes=1 << 30)  # everything fits one file
    assert after["n_files"] == 1
    assert after["version"] == before["version"] + 1
    assert sorted(map(tuple, t.read().collect())) == data_before


def test_compact_preserves_partition_layout(spark, tmp_path):
    import os

    t = ParquetTable(spark, str(tmp_path / "t9"), partition_by=["g"])
    t.overwrite(
        spark.range(2000).repartition(8).select(F.col("id"), (F.col("id") % 3).alias("g"))
    )
    assert t.file_stats()["n_files"] > 3  # several files per partition dir
    t.compact(target_bytes=1 << 30)
    (snap,) = t.data_dirs()  # compaction re-merges to one data dir
    dirs = sorted(d for d in os.listdir(snap) if d.startswith("g="))
    assert dirs == ["g=0", "g=1", "g=2"]  # pruning layout survives compaction
    assert t.read().count() == 2000


def test_high_water_mark(spark, tmp_path):
    t = ParquetTable(spark, str(tmp_path / "t7"))
    t.overwrite(
        spark.createDataFrame(
            [(1, "a", "2024-03-01 10:00:00")], "id int, val string, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))
    )
    df = spark.range(1).select(t.high_water_mark("ts").alias("hwm"))
    assert str(df.collect()[0]["hwm"]) == "2024-03-01 10:00:00"


# ---------------------------------------------------------------- concurrency
# Optimistic CAS (hard-link-exclusive manifest claim). The interleaved writer
# is injected between _write_data and _commit — the exact race window.


def _race(table, spark, root, racing_df):
    """Monkeypatch ``table`` so a competing writer commits an append in the
    middle of ``table``'s next write transaction."""
    orig = table._write_data

    def write_then_lose_race(df):
        rel = orig(df)
        ParquetTable(spark, root).append(racing_df)
        table._write_data = orig  # race once, not on the rebase retry
        return rel

    table._write_data = write_then_lose_race


def test_append_race_rebases_and_keeps_both(spark, tmp_path):
    root = str(tmp_path / "race1")
    t = ParquetTable(spark, root)
    t.overwrite(_df(spark, [(1, "base", None)]))
    _race(t, spark, root, _df(spark, [(2, "racer", None)]))
    t.append(_df(spark, [(3, "mine", None)]))
    vals = {r["val"] for r in t.read().collect()}
    assert vals == {"base", "racer", "mine"}  # nobody's write was lost


def test_merge_race_aborts_not_clobbers(spark, tmp_path):
    import pytest

    from lakehouse_architecture_for_realestatedata_spark.sources.tables import (
        ConcurrentCommitError,
    )

    root = str(tmp_path / "race2")
    t = ParquetTable(spark, root)
    t.overwrite(_df(spark, [(1, "base", None)]))
    _race(t, spark, root, _df(spark, [(2, "racer", None)]))
    with pytest.raises(ConcurrentCommitError):
        t.merge(_df(spark, [(1, "merged", None)]), key="id")
    # the interleaved append survives; the stale merge output never landed
    vals = {r["val"] for r in t.read().collect()}
    assert vals == {"base", "racer"}


def test_crashed_claim_is_skipped(spark, tmp_path):
    """A manifest linked by a writer that died before the pointer swap must
    not wedge the table: the next commit claims the slot after it."""
    import json
    import os

    root = str(tmp_path / "race3")
    t = ParquetTable(spark, root)
    t.overwrite(_df(spark, [(1, "a", None)]))
    with open(t._manifest_path(0)) as fh:
        m = json.load(fh)
    with open(t._manifest_path(1), "w") as fh:  # orphan claim, pointer still 0
        json.dump(m, fh)
    assert t.version() == 0
    t.append(_df(spark, [(2, "b", None)]))
    assert t.version() == 2  # skipped the orphaned v=1
    assert t.read().count() == 2
