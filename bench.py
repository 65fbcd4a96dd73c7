"""Benchmark runner — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes end-to-end via the noop sink (full plan execution, no
driver-side collect overhead in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the relational spine + the extension operators that matter at
# scale. Keys must exist in the registry.
HEADLINE = [
    "pricing_summary",
    "daily_summary",
    "dedup_latest_events",
    "quality_report",
    "star_join_revenue",
    "topk_orders_per_priority",
    "anti_join_inactive_customers",
    "dedup_exact_documents",
    "minhash_lsh_dedup",
    "knn_cosine_bruteforce",
    "token_stats",
    "asof_click_attribution",
    "range_join_signup_windows",
    "rollup_revenue",
    "doc_repetition_signals",
    "pii_redaction_scrub",
    # r4 additions: the new operator families stay perf-accountable
    "resample_locf_daily",
    "scd2_user_event_history",
    "cdc_snapshot_diff",
    "tfidf_keywords",
    "heavy_hitters_users",
    # r5 additions: chunking (zero-shuffle explode), boilerplate strip
    # (line-freq + broadcast anti-join + reassembly), single-scan funnel,
    # MAD outliers (two medians on one exchange)
    "chunk_documents_fixed",
    "remove_boilerplate",
    "funnel_view_click_purchase",
    "mad_outlier_events",
    # tokenize→vocab→encode loop + bigram LM: the corpus-tokenization
    # pipeline stays perf-accountable end-to-end
    "encode_documents_vocab",
    "token_bigram_lm",
    # storage + behavior pipelines: incremental MV maintenance (two table
    # builds + change-feed refresh) and the five-consumer basket analysis
    "incremental_summary_refresh",
    "session_association_rules",
    # r6 additions: distributed ntile over the raw fact table, binned
    # interval-interval join, PCA (one metadata-scale co-moment reduction
    # + narrow projection)
    "equi_depth_bands_events",
    "user_span_campaign_overlap",
    "pca_embeddings_projection",
    "ngram_jaccard_pairs_prefix",
    "doc_perplexity_bigram",
    # r7 additions: Q10/Q14 relational shapes, the Benford audit's
    # single-aggregate + 9-row expectation join, and the dHash image-dedup
    # pass (Arrow codec batch → 8-byte sigs → banded Hamming LSH)
    "returned_item_customers_q10",
    "promo_revenue_q14",
    "benford_price_audit",
    "image_dhash_dedup_pairs",
    # r8 additions: the deepest join chain (Q7), disjunctive cross-side
    # pushdown (Q19), the literal-boundary two-phase prefix sum (Pareto),
    # and the Delta-log interop write→replay→read cycle
    "volume_shipping_q7",
    "disjunctive_revenue_q19",
    "pareto_customer_revenue",
    "delta_interop_roundtrip",
    # r8 late additions: the single-exchange Q21 waiting-supplier chain
    # (groupBy + three chained per-order window counts on one shuffle)
    # and the two-phase global shuffle order (literal-boundary
    # global_row_number over an md5 total order)
    "waiting_suppliers_q21",
    "training_order_shuffle",
    # r8 retrieval + sketch flagships: the one-shuffle BM25 index, the
    # zero-shuffle winnowing fingerprint pass feeding the overlap join,
    # and the mergeable quantile-sketch rollup
    "bm25_search_topk",
    "winnow_plagiarism_pairs",
    "quantile_sketch_weekly",
    "ohlc_daily_bars",
    "hybrid_search_rrf",
    "mmr_diverse_topk",
    # r9 additions: the column-mapped Delta bronze → silver interop cycle
    # (foreign log build + physical-name scan + rename + full silver model)
    # and the two cross-engine-exact fuzzy-dedup paths (salted-md5 MinHash
    # LSH + verify; md5-parsed 60-bit SimHash, wide-agg fingerprints)
    "delta_colmap_bronze_silver",
    "minhash_lsh_verified_md5",
    "simhash_pairs_md5",
    # r9 late additions: the stats-skipping loop (interleaved appends →
    # clustered OPTIMIZE rewrite → pruned where= probe) and the Python
    # Data Source front door (format write w/ task commits → format read
    # w/ pushFilters file pruning → Arrow hop)
    "delta_optimize_skipping_scan",
    "delta_format_front_door",
    # r10 additions: the native-API twin of the format front door (the
    # format-minus-native gap IS the Python Data Source's Arrow-hop cost,
    # tracked per VERDICT r9 #8), the HiveServer2 wire path (catalog build
    # + thrift SQL through the bundled beeline JDBC client), the colmap
    # write interop cycle (create in the reference bronze layout + append
    # + file-pruned MERGE), and the deletion-vector read (inline roaring
    # bitmap anti-filter on a row-indexed scan)
    "delta_native_front_door",
    "thrift_front_door_revenue",
    "delta_colmap_merge_roundtrip",
    "delta_deletion_vector_read",
    # DV-WRITING delete: mark rows in per-file roaring bitmaps instead of
    # rewriting files — O(matched rows); the flagship delete economics
    "delta_dv_delete_roundtrip",
    # metadata-only schema evolution under column mapping (rename/drop/
    # add + merge through the altered schema; zero files rewritten)
    "delta_alter_columns_roundtrip",
    # shallow-clone divergence (absolute-URI v0, clone-local rewrites)
    "delta_clone_divergence",
    # r11 additions: RESTORE undoing a merge by reference (metadata-only),
    # GENERATED ALWAYS AS evaluate/validate/recompute through append+merge,
    # the DV lifecycle close (DV delete → OPTIMIZE materializes through
    # bitmaps → VACUUM collects superseded parquet + orphaned DV bins), and
    # the columnMapping.mode=id read (Spark-native parquet field-id binding)
    "delta_restore_roundtrip",
    "delta_generated_columns",
    "delta_dv_purge_vacuum",
    "delta_colmap_id_read",
    # v2 checkpoint WRITE: UUID manifest + _sidecars/, replayed from the
    # checkpoint alone after the pre-checkpoint commits are deleted
    "delta_v2_checkpoint_roundtrip",
    # typeWidening read: int32/float32 file through the widened long/double
    # schema via Spark-native parquet promotions
    "delta_type_widening_read",
    # alpha=1/2 temperature training-mix rebalance (sqrt-budget per lang,
    # md5-threshold Bernoulli keep — tiny groupBy + broadcast + filter)
    "mixture_sample_by_lang",
    # IDENTITY minting on append (writer v6): two appends, the second
    # continues past the first's committed high-water mark
    "delta_identity_append",
    # row tracking: enable+backfill, append, DV delete, OPTIMIZE
    # materializing the ids — stable _row_id surface end to end
    "delta_row_tracking_ids",
    # clustered table: ALTER CLUSTER BY domain -> OPTIMIZE z-orders by it,
    # then a stats-pruned range read
    "delta_clustered_optimize_read",
    # expired-log cleanup: prefix-to-checkpoint deletion, then a full
    # replay from the surviving checkpoint + tail
    "delta_log_cleanup_roundtrip",
    # real WAV synth -> RIFF decode -> integer-exact features (the
    # multimodal family's hard-oracle row)
    "audio_features_wav",
    # audio near-dup: energy-gradient fingerprints through the shared
    # banded-Hamming LSH (third modality on the 8-byte dedup engine)
    "audio_dedup_pairs",
    # format-path twin of the row-tracking read (Arrow-side row ids)
    "delta_row_tracking_format_read",
    # r12 additions: mode=id write lifecycle (field-id-stamped files),
    # CDC-maintained IVF index (O(changed rows) per sync), and the image
    # family's hard-oracle dedup (real PNG codec -> banded Hamming)
    "delta_colmap_id_write",
    "ivf_cdc_sync_maintenance",
    "image_dhash_planted_pairs",
    # real RIFF/AVI decode + sampled-frame dHash (the last modality)
    "video_frame_dhash_sampled",
    # XOR-of-frame-dHash video sketches through the shared banded engine
    "video_dedup_pairs_planted",
    # type widening WRITE half: metadata-only column widen + mixed-
    # generation read (narrow v0 file + wide append)
    "delta_type_widening_write",
    # r13 additions: the rotation's new driver families stay
    # perf-accountable — per-anchor top-k different-label mining (bounded
    # candidates, broadcast anchors), the conversion-window funnel
    # (max-anchor DP on one exchange), the sqrt-temperature stratified
    # sample (tiny groupBy + broadcast + md5 filter), and the per-group
    # percent-rank normalization (literal-boundary two-phase ranks)
    "hard_negative_mining",
    "funnel_within_hour",
    "stratified_sample_by_lang",
    "percent_rank_event_values",
    # late-r13 additions: the metadata-scale profiles (footer-stats
    # pushdown / log-stats fold — both should stay near-zero, that being
    # the point) and the incremental liquid-clustering OPTIMIZE cycle
    "footer_profile_lineitem",
    "delta_log_profile",
    "delta_incremental_liquid_optimize",
    # r14 additions: the SemDeDup semantic dedup (cell-bounded pairs +
    # anti-join survivors — the new extension flagship), and the two
    # rows-only→hard-oracle conversions (frozen-centroid IVF probe;
    # planted-PNG decode→pixel-feature extraction) staying
    # perf-accountable in their oracle-checked forms
    "semantic_dedup_embeddings",
    "knn_cosine_ivf",
    "multimodal_features",
]

# Solo re-capture support (VERDICT r11 #3): SPARK_GRAFT_ONLY=a,b,c narrows
# the run to those queries with the IDENTICAL warmup + interleaved best-of-3
# methodology, so a regression suspect can be re-measured on an idle box
# without a 70-query pass diluting the attempts.
_ONLY = os.environ.get("SPARK_GRAFT_ONLY")
if _ONLY:
    _keep = {n.strip() for n in _ONLY.split(",") if n.strip()}
    _unknown = _keep - set(HEADLINE)
    if _unknown:
        # a typo'd name must fail loudly — silently measuring nothing
        # defeats the whole point of a solo re-capture
        raise SystemExit(
            f"SPARK_GRAFT_ONLY names not in HEADLINE: {sorted(_unknown)}"
        )
    HEADLINE = [n for n in HEADLINE if n in _keep]


def main() -> None:
    from lakehouse_architecture_for_realestatedata_spark.queries import registry
    from lakehouse_architecture_for_realestatedata_spark.session import get_spark

    spark = get_spark("bench")
    reg = registry()
    # warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()
    # warm the Python-UDF worker pool (fork + numpy/pandas import in each
    # worker is a one-time ~10 s session cost, not a per-query cost)
    from pyspark.sql import functions as F

    _identity = F.pandas_udf("long")(lambda s: s)
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(n_workers * 4, numPartitions=n_workers).select(
        _identity(F.col("id"))
    ).write.mode("overwrite").format("noop").save()
    # JIT/codegen warmup: run each headline plan once at the smallest SF
    # (~1/100 of the measured data). The JVM compiles the generated code and
    # the expression interpreter paths on this pass, so the measured pass
    # times steady-state query execution, not first-invocation compilation —
    # standard warm-run benchmark methodology.
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        spec = reg.get(name)
        if spec is None:
            continue
        try:
            spec.spark_fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
        except Exception:
            pass

    # Best-of-3 with INTERLEAVED passes (run the whole list, three times,
    # min per query). The host steals CPU in multi-second bursts (observed:
    # identical plans swinging 1.2 s ↔ 16 s, and back-to-back best-of-2
    # reporting 24 s for a 1.8 s query when a burst spanned both attempts);
    # interleaving puts a query's attempts minutes apart so a localized
    # burst can contaminate at most one of them.
    # Per-query error isolation (VERDICT r2 "wrong" #2): one broken query
    # must never zero the whole artifact — emit {"err": ...} for that query
    # and keep timing the rest, so the driver always gets partial numbers.
    # Every attempt still runs (a transient failure must neither discard an
    # already-measured good timing nor forfeit later attempts).
    attempts: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for _ in range(3):
        for name in HEADLINE:
            spec = reg.get(name)
            if spec is None:
                errors.setdefault(name, "not in registry")
                continue
            t0 = time.time()
            try:
                df = spec.spark_fn(spark, SF_DIR)
                df.write.mode("overwrite").format("noop").save()
            except Exception as exc:  # noqa: BLE001 — isolate, report, move on
                errors.setdefault(name, f"{type(exc).__name__}: {exc}"[:300])
                continue
            attempts.setdefault(name, []).append(time.time() - t0)
    per_query = {k: min(v) for k, v in attempts.items()}
    # a successful timing wins over a transient error; {"err"} only when the
    # query never completed once
    queries_out: dict[str, object] = {k: round(v, 3) for k, v in per_query.items()}
    for name, msg in errors.items():
        if name not in per_query:
            queries_out[name] = {"err": msg}
    # Attempt-variance (VERDICT r3 #5): [min, median, max] of the attempts per
    # query, so regression-vs-host-noise arguments are data — the host steals
    # CPU in multi-second bursts, and a wide spread on an otherwise-flat query
    # is the burst's fingerprint (`value` keeps its best-of-sum meaning).
    spread = {
        k: [round(min(v), 3), round(sorted(v)[len(v) // 2], 3), round(max(v), 3)]
        for k, v in attempts.items()
    }
    # Contention marker (VERDICT r12 #7): max/min attempt ratio per query —
    # a loaded capture box shows up as fat ratios on queries whose code did
    # not change, so the judge can separate drift from load in one glance.
    # The summary counts queries whose worst attempt was ≥2× their best.
    ratios = {
        k: round(max(v) / min(v), 2) if min(v) > 0 else None
        for k, v in attempts.items()
    }
    rvals = sorted(r for r in ratios.values() if r is not None)
    contention = {
        "per_query_max_over_min": ratios,
        "n_queries": len(rvals),
        "n_over_2x": sum(1 for r in rvals if r >= 2.0),
        "median_ratio": rvals[len(rvals) // 2] if rvals else None,
        "max_ratio": rvals[-1] if rvals else None,
    }

    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    total = round(sum(per_query.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": queries_out,
        "sf": sf,
    }
    n_failed = sum(1 for name in errors if name not in per_query)
    if n_failed:
        out["errors"] = n_failed
    # Attempt spreads go to STDERR (and BENCH_attempts.json) — BENCH_r05 was
    # recorded `parsed: null` because the 29-query spread dict pushed the
    # stdout JSON line past the driver's ~4 KB tail capture. The headline
    # line must be compact (< ~2 KB) and LAST on stdout.
    print(json.dumps({"attempts": spread}), file=sys.stderr)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_attempts.json"), "w") as fh:
            json.dump(
                {"attempts": spread, "contention": contention, "sf": sf}, fh
            )
        # The FULL headline object also lands on disk (VERDICT r14 #2): the
        # r13→r14 PERF diff was lost to a truncated stdout capture, so the
        # next round's comparison must never depend on the pipe alone.
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH.json"), "w") as fh:
            json.dump(out, fh)
    except OSError:
        pass
    line = json.dumps(out)
    # The driver captures the last ~4 KB of stdout and the headline line is
    # the ONLY stdout line (attempts go to stderr + BENCH_attempts.json), so
    # anything comfortably under 4 KB survives intact. 61 queries ≈ 2.1 KB;
    # the old 2 KB guard started silently dropping per-query detail in r10.
    if len(line) > 3500:
        # degrade gracefully: drop per-query detail before risking truncation
        slim = dict(out)
        slim["queries"] = {k: queries_out[k] for k in sorted(queries_out)[:20]}
        slim["queries_truncated"] = True
        line = json.dumps(slim)
    print(line)


if __name__ == "__main__":
    main()
