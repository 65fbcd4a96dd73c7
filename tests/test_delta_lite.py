"""Delta transaction-log interop (sources/delta_lite.py): append/overwrite
roundtrips, time travel by version replay, partitioned layout recovery,
checkpoint-based replay, put-if-absent commit claims, protocol refusal, and
reading a FOREIGN log hand-written per the public protocol spec (proving
the reader consumes logs this module did not produce)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
    ConcurrentDeltaCommitError,
    DeltaProtocolError,
    delta_history,
    delta_read,
    delta_versions,
    delta_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id bigint, city string, price double")


def test_append_overwrite_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    v0 = delta_write(_df(spark, [(1, "hanoi", 1.5), (2, "hue", 2.0)]), t)
    v1 = delta_write(_df(spark, [(3, "danang", 3.0)]), t, mode="append")
    v2 = delta_write(_df(spark, [(9, "hcmc", 9.0)]), t, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)
    assert delta_versions(t) == [0, 1, 2]
    assert sorted(r["id"] for r in delta_read(spark, t).collect()) == [9]
    assert sorted(r["id"] for r in delta_read(spark, t, version=1).collect()) == [1, 2, 3]
    assert sorted(r["id"] for r in delta_read(spark, t, version=0).collect()) == [1, 2]
    ops = [h["operation"] for h in delta_history(t)]
    assert ops == ["WRITE", "WRITE", "WRITE"]
    with pytest.raises(ValueError):
        delta_read(spark, t, version=7)


def test_partitioned_layout_and_recovery(spark, tmp_path):
    t = str(tmp_path / "p")
    df = spark.createDataFrame(
        [(1, "north", 10.0), (2, "north", 11.0), (3, "south", 5.0)],
        "id bigint, zone string, price double",
    )
    delta_write(df, t, partition_by=["zone"])
    # physical layout is Hive-style partition dirs with the column elided
    assert os.path.isdir(os.path.join(t, "zone=north"))
    got = delta_read(spark, t)
    assert dict(got.dtypes)["zone"] == "string"
    assert sorted(map(tuple, got.select("id", "zone").collect())) == [
        (1, "north"), (2, "north"), (3, "south"),
    ]
    # appends must keep the table's partitioning (and reject a mismatch)
    delta_write(
        spark.createDataFrame([(4, "south", 6.0)], df.schema), t, mode="append"
    )
    assert sorted(r["id"] for r in delta_read(spark, t).collect()) == [1, 2, 3, 4]
    with pytest.raises(ValueError):
        delta_write(df, t, mode="append", partition_by=["price"])


def test_checkpoint_replay(spark, tmp_path):
    t = str(tmp_path / "cp")
    for i in range(6):
        delta_write(
            _df(spark, [(i, f"c{i}", float(i))]), t, checkpoint_interval=5
        )
    log = os.path.join(t, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{5:020d}.checkpoint.parquet"))
    assert json.load(open(os.path.join(log, "_last_checkpoint")))["version"] == 5
    # prove the checkpoint is USED: drop the pre-checkpoint JSON commits —
    # replay must still reconstruct versions ≥ 5 from the checkpoint alone
    for v in range(5):
        os.unlink(os.path.join(log, f"{v:020d}.json"))
    assert sorted(r["id"] for r in delta_read(spark, t).collect()) == list(range(6))
    assert sorted(r["id"] for r in delta_read(spark, t, version=5).collect()) == list(
        range(6)
    )


def test_commit_claim_is_put_if_absent(spark, tmp_path):
    t = str(tmp_path / "race")
    delta_write(_df(spark, [(1, "a", 1.0)]), t)
    # simulate a racing writer that already claimed version 1
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "WRITE"}}) + "\n")
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import _claim_version

    with pytest.raises(ConcurrentDeltaCommitError):
        _claim_version(log, 1, "{}")


def test_protocol_refusal(spark, tmp_path):
    t = str(tmp_path / "v3")
    delta_write(_df(spark, [(1, "a", 1.0)]), t)
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 3}}) + "\n")
    with pytest.raises(DeltaProtocolError):
        delta_read(spark, t)


def test_reads_foreign_log(spark, tmp_path):
    """Hand-craft a Delta table per the PUBLIC protocol spec — parquet data
    file via pyarrow, _delta_log JSON written directly — and read it. This
    pins interop with logs produced by OTHER engines, not roundtripping."""
    t = str(tmp_path / "foreign")
    os.makedirs(os.path.join(t, "_delta_log"))
    pq.write_table(
        pa.table({"id": pa.array([10, 11], pa.int64()), "v": ["x", "y"]}),
        os.path.join(t, "part-00000-foreign.parquet"),
    )
    schema_string = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "foreign-table",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {},
            }
        },
        {
            "add": {
                "path": "part-00000-foreign.parquet",
                "partitionValues": {},
                "size": os.path.getsize(
                    os.path.join(t, "part-00000-foreign.parquet")
                ),
                "modificationTime": 0,
                "dataChange": True,
            }
        },
    ]
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    got = delta_read(spark, t)
    assert sorted(map(tuple, got.collect())) == [(10, "x"), (11, "y")]
    # and our writer can extend the foreign table
    delta_write(
        spark.createDataFrame([(12, "z")], "id bigint, v string"), t, mode="append"
    )
    assert sorted(r["id"] for r in delta_read(spark, t).collect()) == [10, 11, 12]


def test_remove_action_drops_files(spark, tmp_path):
    """A remove action from any writer hides the file at later versions
    while keeping earlier versions readable (logical delete contract)."""
    t = str(tmp_path / "rm")
    delta_write(_df(spark, [(1, "a", 1.0)]), t)
    delta_write(_df(spark, [(2, "b", 2.0)]), t, mode="append")
    # hand-write a remove of version 0's data file (foreign-writer style),
    # taking the path from the log itself
    with open(os.path.join(t, "_delta_log", f"{0:020d}.json")) as fh:
        v0_path = next(
            json.loads(l)["add"]["path"] for l in fh if '"add"' in l
        )
    with open(os.path.join(t, "_delta_log", f"{2:020d}.json"), "w") as fh:
        fh.write(
            json.dumps(
                {
                    "remove": {
                        "path": v0_path,
                        "deletionTimestamp": 1,
                        "dataChange": True,
                    }
                }
            )
            + "\n"
        )
    latest_ids = {r["id"] for r in delta_read(spark, t).collect()}
    v1_ids = {r["id"] for r in delta_read(spark, t, version=1).collect()}
    assert v1_ids == {1, 2}
    assert latest_ids == {2}


def test_vacuum_and_migration_bridges(spark, tmp_path):
    """VACUUM deletes only unreferenced files (orphans from crashed
    writers); the ParquetTable bridges roundtrip a snapshot both ways."""
    from lakehouse_architecture_for_realestatedata_spark.sources.delta_lite import (
        delta_vacuum,
        export_table_to_delta,
        import_delta_to_table,
    )
    from lakehouse_architecture_for_realestatedata_spark.sources.tables import ParquetTable

    t = str(tmp_path / "v")
    delta_write(_df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), t)
    # plant an orphan (crashed-writer leftover, never referenced)
    with open(os.path.join(t, "part-orphan.parquet"), "wb") as fh:
        fh.write(b"not really parquet")
    deleted = delta_vacuum(spark, t)
    assert deleted == ["part-orphan.parquet"]
    assert sorted(r["id"] for r in delta_read(spark, t).collect()) == [1, 2]
    # referenced-by-any-version files survive vacuum even after overwrite
    delta_write(_df(spark, [(3, "c", 3.0)]), t, mode="overwrite")
    assert delta_vacuum(spark, t) == []
    assert sorted(r["id"] for r in delta_read(spark, t, version=0).collect()) == [1, 2]

    pt = ParquetTable(spark, str(tmp_path / "pt"))
    import_delta_to_table(spark, t, pt)
    assert sorted(r["id"] for r in pt.read().collect()) == [3]
    out = str(tmp_path / "exported")
    export_table_to_delta(pt, out)
    assert sorted(r["id"] for r in delta_read(spark, out).collect()) == [3]


def test_concurrent_appends_all_commit(spark, tmp_path):
    """Six threads append simultaneously: the put-if-absent claim
    serializes them, losing appends auto-rebase (metadata-only recommit —
    data files written once), every row lands, and version history shows
    one commit per writer. Losing OVERWRITES must raise instead (their
    remove set is stale)."""
    import threading

    t = str(tmp_path / "conc")
    delta_write(_df(spark, [(0, "seed", 0.0)]), t)
    errs = []

    def _append(i):
        try:
            delta_write(_df(spark, [(i, f"w{i}", float(i))]), t, mode="append")
        except Exception as e:  # noqa: BLE001
            errs.append((i, e))

    threads = [threading.Thread(target=_append, args=(i,)) for i in range(1, 7)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errs == []
    assert sorted(r["id"] for r in delta_read(spark, t).collect()) == list(range(7))
    assert delta_versions(t) == list(range(7))
