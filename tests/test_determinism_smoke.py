"""Run-twice determinism smoke (the round-7 bug class): the queries built
on global ordering / bucketing / sampling primitives must hash identically
across two fresh plan compositions and executions. The full registry gets
the same check from tools/check_determinism.py (221/221 stable, r14 —
run after the ANSI-on flip, the two rows-only→oracle conversions
(frozen-centroid IVF, planted-PNG multimodal features), and the new
semantic_dedup_embeddings registration, so the count covers every r14
change; re-run it over the whole registry at every round close and
refresh this note); this pytest keeps the most at-risk family guarded on every run,
and test_full_registry_determinism_note_is_current makes a stale count
FAIL instead of drifting silently (it hit 167 in r8 and 184 in r9)."""

from __future__ import annotations

import hashlib
import math

import pytest

from lakehouse_architecture_for_realestatedata_spark.queries import registry

AT_RISK = [
    "pareto_customer_revenue",      # global_running_sum (desc lead key)
    "auc_value_vs_purchase",        # distinct-score prefix sum
    "ntile_customer_quartiles",     # ntile_buckets
    "equi_depth_bands_events",      # ntile_buckets n=8
    "percent_rank_event_values",    # grouped_row_number
    "cume_dist_event_values",       # grouped_cume_dist
    "deterministic_sample",         # md5-keyed sampling
    "weighted_doc_sample",          # weighted hex-threshold sampling
    "skyline_cheap_large_parts",    # global_running_max two-phase (r8)
    "training_order_shuffle",       # global_row_number over md5 order (r8)
    "minhash_lsh_verified_md5",     # salted-md5 LSH buckets + verify (r9)
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.12g}"
    return str(v)


def _result_hash(df):
    rows = [tuple(r) for r in df.collect()]
    order = sorted(range(len(df.columns)), key=lambda i: df.columns[i])
    lines = sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest(), len(rows)


@pytest.mark.parametrize("name", AT_RISK)
def test_two_executions_agree(name, spark, sf_dir):
    spec = registry()[name]
    first = _result_hash(spec.spark_fn(spark, sf_dir))
    second = _result_hash(spec.spark_fn(spark, sf_dir))
    assert first == second, f"{name} is execution-dependent: {first} != {second}"


def test_full_registry_determinism_note_is_current():
    """The docstring's 'N/N stable' claim must track the registry size
    (VERDICT r9 #5 — it went stale at 167 in r8 and 184 in r9). After
    registering a query, re-run tools/check_determinism.py over the FULL
    registry and refresh the note; until then this fails loudly."""
    import re
    import sys

    m = re.search(r"(\d+)/(\d+) stable", sys.modules[__name__].__doc__)
    assert m, "determinism note missing from module docstring"
    assert int(m.group(1)) == int(m.group(2)), "note records instability"
    assert int(m.group(2)) == len(registry()), (
        f"determinism note says {m.group(2)} queries but the registry has "
        f"{len(registry())} — re-run tools/check_determinism.py over the "
        "full registry and refresh the docstring note"
    )
