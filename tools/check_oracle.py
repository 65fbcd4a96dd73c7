"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, rows sorted,
values canonicalized to strings with float rounding).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style float canonicalization: repr of a 12-significant-digit round
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, list[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    import hashlib

    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, lines


def main() -> int:
    import duckdb
    from __spark_entry__ import oracle_sql, queries
    from lakehouse_architecture_for_realestatedata_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = queries(), oracle_sql()
    results, failed = {}, []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:500]}
            failed.append(name)
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(srows)}
            continue
        try:
            rel = con.execute(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:500]}
            failed.append(name)
            continue
        sh, slines = table_hash(scols, srows)
        oh, olines = table_hash(ocols, orows)
        ok = (
            len(srows) == len(orows)
            and sorted(scols) == sorted(ocols)
            and sh == oh
        )
        results[name] = {
            "status": "MATCH" if ok else "MISMATCH",
            "rows": (len(srows), len(orows)),
            "cols_match": sorted(scols) == sorted(ocols),
            "hash": (sh, oh),
            "sec": round(time.time() - t0, 2),
        }
        if not ok:
            failed.append(name)
            diff_s = [l for l in slines if l not in set(olines)][:3]
            diff_o = [l for l in olines if l not in set(slines)][:3]
            results[name]["spark_only"] = diff_s
            results[name]["oracle_only"] = diff_o
            if sorted(scols) != sorted(ocols):
                results[name]["cols"] = (sorted(scols), sorted(ocols))

    print(json.dumps(results, indent=1, default=str))
    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    print(
        f"\n{n_match}/{len(results)} MATCH, "
        f"{sum(1 for r in results.values() if r['status']=='ROWS_ONLY')} rows-only, "
        f"{len(failed)} failed: {failed}",
        file=sys.stderr,
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
