"""Run every registered query TWICE (two fresh plan compositions, two
physical executions) and compare order-insensitive value hashes — the
direct guard against the round-7 bug class, where a doubly-consumed
``repartitionByRange`` produced five different answers in five runs while
the DuckDB oracle sweep stayed green by exchange-reuse luck.

A cross-engine oracle catches wrong-everywhere; THIS catches
wrong-sometimes: any operator whose result depends on execution accidents
(boundary resampling, unstable sampling seeds, partition-order-dependent
float sums, rand() leakage) shows up as a hash mismatch between two runs
on identical input.

Usage: python tools/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from tools.check_oracle import table_hash  # noqa: E402  (canonicalizer reuse)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = set(sys.argv[2:])

#: Queries whose output is TIME-dependent by contract (ingest timestamps
#: etc.) — a second run legitimately differs. Keep this list justified.
EXPECTED_VARYING: dict[str, str] = {}


def main() -> int:
    from __spark_entry__ import queries
    from lakehouse_architecture_for_realestatedata_spark.session import get_spark

    spark = get_spark("determinism-check")
    results, failed = {}, []
    for name, fn in queries().items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        hashes = []
        try:
            for _ in range(2):
                sdf = fn(spark, SF_DIR)  # fresh composition each time
                rows = [tuple(r) for r in sdf.collect()]
                hashes.append(table_hash(sdf.columns, rows)[0] + f"/{len(rows)}")
        except Exception as e:  # noqa: BLE001
            results[name] = {"status": "ERROR", "error": str(e)[:300]}
            failed.append(name)
            continue
        same = hashes[0] == hashes[1]
        if not same and name in EXPECTED_VARYING:
            results[name] = {
                "status": "VARIES_BY_CONTRACT",
                "why": EXPECTED_VARYING[name],
            }
        else:
            results[name] = {
                "status": "STABLE" if same else "NONDETERMINISTIC",
                "hashes": hashes,
                "sec": round(time.time() - t0, 2),
            }
            if not same:
                failed.append(name)
    print(json.dumps(results, indent=1))
    n_ok = sum(1 for r in results.values() if r["status"] == "STABLE")
    print(
        f"\n{n_ok}/{len(results)} stable, {len(failed)} failed: {failed}",
        file=sys.stderr,
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
