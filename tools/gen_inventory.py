"""Generate INVENTORY.md: every registered query with its oracle status,
driver-window position, bench membership, and implementation pointer —
the audit index tying SURVEY §2 / §2.11 rows to runnable artifacts.

    python tools/gen_inventory.py > INVENTORY.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


#: Why each rows-only query is rows-only BY DESIGN (VERDICT r12 #6): either
#: the output is approximate (so a value-hash against an exact oracle is the
#: wrong check and the pytest pins the right one — recall/accuracy vs the
#: exact twin), or the computation is not SQL-expressible in DuckDB (hash
#: incompatibility, iterative fits, float-log scores). Every entry names the
#: pytest that carries the correctness burden instead.
ROWS_ONLY_WHY: dict[str, str] = {
    "minhash_lsh_dedup": "Spark xxhash64 shingle hashes are not reproducible "
    "in DuckDB; the md5-keyed twin `minhash_lsh_verified_md5` IS "
    "hash-checked, and tests/test_dedup.py pins planted-pair recall here.",
    "simhash_dedup": "same xxhash64 gap; `simhash_pairs_md5` is the "
    "hash-checked md5 twin, tests/test_dedup.py pins recall.",
    # knn_cosine_ivf and multimodal_features left this map in r14 (VERDICT
    # r13 #5): frozen planted centroids / planted-PNG pixel features made
    # both hard DuckDB-oracle rows.
    "knn_pq_adc": "k-means codebooks are an iterative argmin fit with no "
    "SQL twin, and ADC scores are approximate by construction; "
    "tests/test_similarity.py pins numpy code/score parity + planted "
    "recall >= 0.9.",
    "image_dhash_dedup_pairs": "xxhash64-seeded synthetic blobs (not DuckDB-"
    "reproducible); the planted-LCG twin `image_dhash_planted_pairs` is "
    "hash-checked through the SAME decode->dHash->banded path.",
    "knn_cosine_pca_prefilter": "approximate candidate cut (PCA-space L2) — "
    "recall vs exact kNN pinned in tests/test_similarity.py.",
    "semdedup_embedding_prune": "centroid-seeded greedy prune is "
    "order-dependent and approximate; planted-cluster behavior pinned in "
    "tests/test_dedup.py, and since r14 the deterministic sibling "
    "`semantic_dedup_embeddings` (frozen centroids, keep-lowest-id) IS "
    "oracle-hashed end to end.",
    "approx_sketches_by_type": "approx_count_distinct/percentile_approx are "
    "sketch estimates — DuckDB's sketches differ by construction; error "
    "bounds vs exact pinned in pytest, and the EXACT quantile/HLL/CMS "
    "family (quantile_sketch_weekly, hll/cms rollups) is oracle-hashed.",
    "corpus_prep_funnel": "end-to-end pipeline whose dedup stage keeps one "
    "doc per near-dup cluster (tie-broken, approximate LSH) — stage-exact "
    "twins are oracle-checked individually; the funnel's invariants "
    "(idempotence, counts) are pytest-pinned.",
    "decontaminate_eval_overlap": "MinHash near-dup overlap (xxhash64 + "
    "approximate); the verbatim 13-gram rule `decontaminate_ngram_verbatim` "
    "is the hash-checked twin.",
    "pca_embeddings_projection": "eigenvector SIGN is arbitrary and eigh is "
    "an iterative LAPACK fit — no SQL twin; partition-invariance "
    "(bit-for-bit under any layout) and reconstruction quality are "
    "pytest-pinned.",
    "approx_users_weekly_rollup": "HLL estimate by design (the point is the "
    "mergeable sketch); the EXACT distinct rollup twin is oracle-checked, "
    "pytest pins merge == direct-build bit-equality.",
    "pagerank_event_graph": "fixed-iteration power method — iterative, no "
    "SQL twin; decimal-exact contributions make it partition-invariant, "
    "pinned against a pure-python reference in tests/test_dedup.py.",
    "doc_perplexity_bigram": "float log-prob sums (libm log, not "
    "correctly-rounded cross-engine); quantized-exact log-sum identity and "
    "pure-python parity pinned in tests/test_textprep.py.",
    "weighted_exact_n_per_lang": "Efraimidis-Spirakis keys are "
    "float pow(u, 1/w) — cross-engine float pow differs; exactly-n and "
    "weight-proportionality are pytest-pinned.",
    "weighted_exact_n_docs": "same E-S float-key reason as the per-lang "
    "variant.",
    "vocab_bpe_merges": "iterative pair-merge training (argmax per round) — "
    "not SQL-expressible; pinned against a pure-python BPE reference.",
    "encode_documents_bpe": "depends on the learned merge table above; "
    "encode == min-rank-first proof pinned in tests/test_bpe.py.",
    "quality_classifier_scores": "logistic-regression training is an "
    "iterative gradient fit; quantized-exact gradients make weights "
    "bit-identical under any partitioning (tests/test_mlprep.py), but no "
    "SQL twin exists.",
    "mmr_diverse_topk": "greedy re-rank whose argmax ties break on float "
    "marginal-relevance scores; pinned against a pure-python MMR reference "
    "in tests/test_retrieval.py.",
}


def main() -> None:
    from bench import HEADLINE
    from lakehouse_architecture_for_realestatedata_spark.queries import registry

    reg = registry()
    bench = set(HEADLINE)
    print("# INVENTORY — registered queries (generated by tools/gen_inventory.py)")
    print()
    print(
        f"{len(reg)} queries: "
        f"{sum(1 for s in reg.values() if s.oracle is not None)} DuckDB-oracle-backed, "
        f"{sum(1 for s in reg.values() if s.oracle is None)} rows-only (non-SQL-expressible "
        f"by design, each with pytest accuracy/recall contracts). The driver hash-verifies "
        f"positions 1-50 each round; deferred oracle rows get the identical check from "
        f"tests/test_queries_contract.py (sf0.001) and tools/check_oracle.py (sf0.01), and "
        f"rotate through the window across rounds (queries.registry)."
    )
    print()
    print("| # | query | oracle | bench | implementation |")
    print("|---|---|---|---|---|")
    for i, (name, spec) in enumerate(reg.items(), 1):
        kind = "DuckDB" if spec.oracle is not None else "rows-only"
        # first operators/functions/plans/sources/streaming pointer in the doc
        m = re.search(
            r"((?:operators|functions|plans|sources|streaming)/\w+\.py(?::\w+)?)",
            spec.doc or "",
        )
        impl = f"`{m.group(1)}`" if m else "`queries*.py`"
        window = "window" if i <= 50 else "deferred"
        print(
            f"| {i} | `{name}` | {kind} ({window}) | "
            f"{'yes' if name in bench else ''} | {impl} |"
        )
    rows_only = [n for n, s in reg.items() if s.oracle is None]
    undocumented = [n for n in rows_only if n not in ROWS_ONLY_WHY]
    print()
    print("## Rows-only rationale (correct-by-design, VERDICT r12 #6)")
    print()
    print(
        "Each rows-only query is rows-only for a stated reason — an "
        "approximate output where hash-equality against an exact oracle "
        "would be the wrong check, or a computation DuckDB cannot express "
        "(hash incompatibility, iterative fits, float transcendentals). "
        "The named pytest carries the correctness burden; where an exact "
        "twin exists, that twin IS oracle-hashed."
    )
    print()
    for n in rows_only:
        why = ROWS_ONLY_WHY.get(n, "UNDOCUMENTED — add a rationale")
        print(f"- `{n}` — {why}")
    if undocumented:
        print()
        print(f"**UNDOCUMENTED rows-only queries: {undocumented}**")


if __name__ == "__main__":
    main()
