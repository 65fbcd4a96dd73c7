"""Fixture schema contract: one focused failure when the driver regenerates
/root/testdata with a different shape (r2 lost a third of its correctness
rows to a silent ts-encoding change — see test_fixture_drift.py for the
encodings we tolerate). Column SETS are pinned; types are pinned only where
queries depend on them, with the known-variable ts encodings allowed."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
    "orders": {
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    },
    "lineitem": {
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}


@pytest.mark.parametrize("table", sorted(EXPECTED_COLUMNS))
def test_fixture_columns(sf_dir, table):
    schema = pq.read_schema(f"{sf_dir}/{table}.parquet")
    got = set(schema.names) - {"__index_level_0__"}
    assert got == EXPECTED_COLUMNS[table], (
        f"{table}.parquet columns drifted: fixture has {sorted(got)}, queries "
        f"expect {sorted(EXPECTED_COLUMNS[table])} — the driver regenerated "
        "the testdata with a new shape; audit every query touching this table"
    )


def test_events_ts_encoding_is_known(sf_dir):
    """_events dispatches on the ts dtype; fail loudly if a THIRD encoding
    appears (then extend _events and test_fixture_drift together)."""
    t = str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)
    assert t in {"int64", "timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]"}, (
        f"events.ts has NEW encoding {t!r}: teach queries._events this "
        "encoding and add it to tests/test_fixture_drift.py"
    )


def test_embedding_is_float_list(sf_dir):
    t = pq.read_schema(f"{sf_dir}/embeddings.parquet").field("embedding").type
    assert str(t) in {"list<item: float>", "list<element: float>", "fixed_size_list<item: float>[64]"}, (
        f"embeddings.embedding drifted to {t}: the quantized kNN oracle and "
        "BLAS scorer assume float32 input"
    )


def test_cached_fixture_build_rename_protocol(tmp_path):
    """cached_fixture (ADVICE r13): the shared cache path is only ever
    CREATED by os.rename of a fully-built process-unique dir — so it either
    doesn't exist or carries its _complete marker; a rename loser discards
    its build and reads the winner's; a markerless (crashed/legacy) dir is
    cleared and rebuilt; payloads round-trip through the marker."""
    import os

    from lakehouse_architecture_for_realestatedata_spark.queries import (
        cached_fixture,
        fixture_work_dir,
    )

    cache = str(tmp_path / "fix")
    calls = []

    def build(b):
        calls.append(b)
        assert b == f"{cache}.build-{os.getpid()}"  # never the shared path
        with open(os.path.join(b, "data.txt"), "w") as fh:
            fh.write("payload-bytes")
        return "v=7"

    assert cached_fixture(cache, build) == "v=7"
    assert len(calls) == 1
    assert os.path.isfile(os.path.join(cache, "_complete"))
    assert os.path.isfile(os.path.join(cache, "data.txt"))
    assert not os.path.isdir(f"{cache}.build-{os.getpid()}")
    # second call: marker present, build not invoked, payload re-read
    assert cached_fixture(cache, build) == "v=7"
    assert len(calls) == 1
    # rename-race loser: the winner's cache appears AFTER this process
    # decided to build — os.rename fails, the loser falls back cleanly
    cache2 = str(tmp_path / "fix2")

    def racing_build(b):
        os.makedirs(cache2)
        with open(os.path.join(cache2, "_complete"), "w") as fh:
            fh.write("winner")
        return "loser"

    assert cached_fixture(cache2, racing_build) == "winner"
    assert not os.path.isdir(f"{cache2}.build-{os.getpid()}")
    # markerless stale dir (crashed pre-protocol build): cleared + rebuilt
    cache3 = str(tmp_path / "fix3")
    os.makedirs(cache3)
    with open(os.path.join(cache3, "junk"), "w") as fh:
        fh.write("partial")
    assert cached_fixture(cache3, lambda b: None) == "ok"
    assert not os.path.exists(os.path.join(cache3, "junk"))
    # work dirs are process-unique siblings, cleared on reuse
    w = fixture_work_dir(cache)
    assert w == f"{cache}.work-{os.getpid()}"
    os.makedirs(os.path.join(w, "old"))
    assert not os.path.isdir(os.path.join(fixture_work_dir(cache), "old"))
