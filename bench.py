#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the JVM-side ``noop`` datasource write so
every result row is fully computed without paying Python row serialization
or driver-side collection — the engine's cost, nothing else.

CI contract (what a consumer must check — rc alone is NOT enough):

- exit code: 0 unless more than half the battery failed (a broad collapse;
  the round driver treats rc != 0 as a TOTAL bench abort, so single-query
  failures never flip it);
- stdout: exactly one JSON line. Fields: ``value`` = total wall seconds
  over successful queries only; ``n_ok`` / ``n_err`` = success/failure
  counts — **a consumer must fail its check if ``n_err`` > 0**;
  ``queries`` maps each name to seconds (float, success) or
  ``{"err": "..."}`` (failure);
- stderr: one ``bench: ERROR <name>: <err>`` line per failed query, plus a
  final ``bench: SUMMARY ...`` line whenever n_err > 0.

Position isolation (round 7): operator memo caches and the Spark session
cache are cleared BETWEEN queries, so a timing never depends on what ran
before it (r06's uniform ~1.5x sweep-position drift).

Position randomization (round 13): the timed passes run in per-pass
deterministic hash-permuted order (md5(pass_idx:name)) and the per-query
MIN is reported — sweep position no longer tracks registry insertion
order (r12's registry reorder moved UNTOUCHED queries 1.15x median), and
each query is timed against three different neighborhoods.

Quiet-window re-timing (round 8): the r07 warm10 control re-timed 7 of
the 10 slowest queries 20-30% BELOW their sweep minima — the sweep's
timed windows still carried ambient inflation (the between-queries
System.gc() returns before the async ContextCleaner thread finishes
releasing shuffle files/broadcasts, so cleanup lands inside the NEXT
query's timed window; the same mechanism explains the one outlier that
re-timed 66% ABOVE, ccnet_pipeline, whose window absorbed a full
concurrent cleanup pass). Fix: after the sweep, the slowest QUIET_N
queries are re-timed min-of-3 in a settled window (isolate, then sleep
so the cleaner drains BEFORE the clock starts) and that replaces the
sweep number. The ``warm10`` field is one further settled re-time of
the 10 slowest — the drift control; warm10 ≈ primary means isolation
holds.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_streaming_etl_spark import api  # noqa: E402
from flink_streaming_etl_spark.operators._cache import (  # noqa: E402
    clear_operator_caches,
)
from flink_streaming_etl_spark.session import get_spark  # noqa: E402

#: Headline queries: the reference-parity pipeline + the scale-critical
#: training-data ops. (Cheap projections are excluded — they measure parquet
#: IO, not the engine.)
HEADLINE = [
    "pricing_summary",
    "order_enrich_join",
    "user_day_stats",
    "day_stats",
    "product_stats",
    "listagg_items",
    "latest_event_per_user",
    "region_rollup",
    "scalar_battery",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "embedding_neardup",
    "embedding_dedup_apply",
    "ann_lsh_bucketed",
    "ann_ivf",
    "neardup_drop_list",
    "windowed_event_stats",
    "hopping_event_stats",
    "session_windows",
    "top_quality_per_lang",
    "latest_order_asof",
    "vocab_top_tokens",
    "dedup_apply",
    "neardup_clusters",
    "stratified_sample",
    "curated_corpus",
    "length_percentiles",
    "source_mix_report",
    "lang_id",
    "token_count",
    "quality_score",
    "doc_fingerprint",
    "media_metadata",
    "media_dedup",
    "media_features",
    "revenue_rollup",
    "window_battery",
    "customers_without_orders",
    "customer_cohort_setops",
    "order_priority_pivot",
    "clicks_before_purchase",
    "tfidf_top_terms",
    "bigram_top",
    "segment_spend_correlation",
    "sketch_profile",
    "chunk_documents",
    "redact_pii",
    "rolling_spend_7d",
    "value_histogram",
    "orders_snapshot_diff",
    "training_corpus_chunks",
    "profile_orders",
    "contamination_check",
    "weighted_sample",
    "mixture_sample",
    "repetition_score",
    "quality_tier_report",
    "shipping_priority",
    "local_supplier_volume",
    "bloom_incremental_dedup",
    "normalize_text",
    "funnel_stages",
    "cohort_retention",
    "pack_sequences",
    "winsorize_values",
    "rolling_wau",
    # round-4 driver-hashable twins / scale-default variants
    "collect_items_flat",
    "kmeans_assign_pinned",
    "standardize_by_label_stats",
    "profile_orders_hll",
    # round-4 training-pipeline additions
    "gopher_quality",
    "span_dedup",
    "ngram_novelty",
    "cumulate_event_stats",
    "hopping_event_stats_decomposed",
    "curated_corpus_v2",
    "quantize_embeddings",
    "heavy_hitter_tokens",
    "repetition_battery",
    "source_mixture_weights",
    "pq_encode",
    "ann_ivf_pq",
    "ann_recall_report",
    "neardup_keep_best",
    "minhash_error_report",
    # round-6 training-pipeline additions
    "clicks_before_purchase_banded",
    "bm25_top_terms",
    "semdedup_drop",
    "cluster_balance_report",
    "packing_efficiency",
    "unigram_logprob_score",
    "tokenizer_fertility",
    "gap_fill_daily",
    "key_skew_report",
    "pq_encode_residual",
    "ann_ivf_pq_residual",
    "ann_lsh_multiprobe",
    "dsir_importance_weights",
    "source_kl_report",
    "time_decay_engagement",
    "knn_graph",
    "cross_source_dup_matrix",
    "small_quantity_revenue",
    "cheapest_supplier_per_part",
    "perplexity_buckets",
    "filtered_ann",
    "entropy_filter",
    "ann_int8_topk",
    "forecast_revenue_change",
    "customer_order_histogram",
    "promo_revenue_share",
    "late_order_priority_check",
    "large_volume_customers",
    "pack_sequences_ffd_stats",
    "containment_pairs",
    "dedup_stats_report",
    "filter_stack",
    "bigram_logprob_score",
    "train_val_test_split",
    # round-7 additions
    "nation_trade_volume",
    "market_share_report",
    "product_type_profit",
    "returned_item_report",
    "important_parts_share",
    "top_supplier_revenue",
    "part_supplier_variety",
    "disjunctive_promo_revenue",
    "dominant_part_suppliers",
    "waiting_orders_suppliers",
    "idle_rich_customers",
    "jm_fluency",
    "token_budget_plan",
    "heaps_law_report",
    "prefix_dup_drop",
    "lang_confidence",
    "hybrid_rrf_search",
    "minhash_band_tuning_report",
    "dedup_cluster_size_histogram",
    "ccnet_pipeline",
    "ann_hamming_topk",
    "bpe_first_merges",
    "hashed_bow_sparse",
    "media_chunk_dedup",
    "pmi_top_pairs",
    "bigram_entropy_report",
    "anomaly_zscore_daily",
    "winnow_fingerprints",
    "winnow_dup_pairs",
    "tfidf_cosine_pairs",
    "zipf_fit_report",
    "doclen_percentile_report",
    "embedding_covariance",
    "media_simhash_pairs",
    "tokenizer_vocab_coverage",
    "embedding_norm_report",
    "event_rollup_report",
    "event_type_pivot_daily",
    "bpe_train_merges",
    "linear_quality_classifier",
    "knn_label_eval",
    "winnow_containment_pairs",
    "heldout_perplexity_report",
    "media_neardup_drop",
    "media_dedup_apply",
    "vocab_growth_curve",
    # round-8 additions
    "substring_dup_spans",
    "substring_dedup_cut",
    "kneser_ney_fluency",
    "kmv_distinct_report",
    "whitening_identity_report",
    "quality_calibration_report",
    "bpe_encode_pinned",
    "substring_dup_rate_report",
    "nearest_neighbor_report",
    # round-10 additions
    "blocklist_filter_report",
    "distinct_ngram_report",
    "quality_ensemble_report",
    "dedup_tier_agreement_report",
    "hard_negative_mining",
    # round-9 additions
    "ann_pq_rerank",
    "kmeans_update_pinned",
    "semantic_contamination_check",
    "decontaminate_apply",
    "media_dup_rate_report",
    "event_transition_report",
    "basket_lift_pairs",
    "diverse_sample_report",
    "fuzzy_prefix_pairs",
    "moore_lewis_selection",
    # round-10 wave-2/3 additions
    "pagerank_pinned",
    "rfm_segmentation",
    "softdedup_weights",
    "burstiness_report",
    "pca_power_pinned",
    "knn_outlier_report",
    "label_centroid_confusion",
    "top_event_paths",
    "ann_graph_expand",
    "graph_clustering_report",
    "data_quality_report",
    "k_anonymity_report",
    "cep_funnel_matches",
    "cep_greedy_matches",
    "cep_timeout_report",
    "cep_relaxed_matches",
    "cep_quantified_matches",
    "cep_vshape_matches",
    "cusum_changepoints",
    "l_diversity_report",
    "cep_alternation_matches",
    "dynamic_rule_hits",
    "cep_relaxed_timeout_report",
    "cep_quantified_timeout_report",
    # round-13 additions
    "cep_backtrack_matches",
    "cep_nfa_backtrack_matches",
    "media_resize",
    "media_frames",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("flink-streaming-etl-spark-bench")
    qs = api.queries()

    def materialize(df) -> None:
        # noop v2 sink: full computation, zero driver transfer. Measured
        # materialization alternatives on identical warm plans: collect()
        # adds Python Row construction (+2-3 s on nested/row-heavy
        # results), toPandas() hides work for operators that execute
        # eagerly inside their builder; the noop write carries a ~0.5 s
        # constant write-path planning cost — uniform, engine-side, and
        # amortized at cluster scale.
        df.write.format("noop").mode("overwrite").save()

    def isolate(spark) -> None:
        # Position isolation (r6 verdict #2): a sweep this long in one JVM
        # accumulates memoized operator relations + CacheManager entries,
        # and late queries pay for early queries' state — r06 measured a
        # uniform ~1.5x ambient drift across a 126-query sweep. Clearing
        # the operator memo LRUs and the session cache between queries
        # makes each timing position-independent: every query pays its own
        # tokenize/persist, none rides or suffers a neighbor's cache.
        clear_operator_caches()
        spark.catalog.clearCache()
        # Release PYTHON references BEFORE the JVM GC (round 9): py4j only
        # drops its JVM handles when the Python wrapper objects are
        # collected, and the localCheckpoint()ed DataFrames inside
        # iterative operators (connected components, Lloyd loops) sit in
        # Python reference cycles after their query ends. Without this,
        # their RDD blocks survive every System.gc() and ACCUMULATE across
        # the sweep — measured: 8 isolated runs of neardup_keep_best grew
        # standing storage RDDs 10 → 21 and run time 7.5 → 10.1 s
        # ("Block rdd_N already exists" warnings); with gc.collect()
        # first, standing RDDs stay flat at 9-10 and times improve
        # monotonically. This was the r8-unexplained warm-control upward
        # outlier class (r9 warm10: dedup_stats_report 5.7 → 14.9 s,
        # neardup_keep_best 5.7 → 24.7 s at sweep end — fresh-session
        # min-of-3 confirmed ~4-5 s, i.e. the inflation was bench state,
        # not the operators).
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    # JMH-style warmup: run every headline query once at the smallest scale
    # factor first. This compiles the whole-stage-codegen classes, spins up
    # the Arrow/Python worker pool, and JITs the hot paths, so the timed
    # pass below measures steady-state engine throughput at the target SF
    # rather than one-time JVM compilation (first executions measured 2-4x
    # slower than every subsequent run of the same plan).
    warmup_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    for name in HEADLINE:
        try:
            materialize(qs[name](spark, warmup_dir))
        except Exception:
            pass  # warmup is best-effort; the timed run surfaces real errors
        isolate(spark)

    # Three timed passes, per-query minimum, each pass in a DIFFERENT
    # deterministic position-randomized order (round 13, r12 verdict #4):
    # the r12 registry reorder shifted every query's position in the
    # shared-JVM sweep and moved UNTOUCHED queries by up to 1.15x median
    # — the fixed registry order made every timing a function of its
    # neighbors. Ordering each pass by md5(pass_idx:name) (a) decouples
    # the sweep position from registry insertion order, so adding a
    # query no longer shifts the whole battery, and (b) gives each query
    # three different neighborhoods, so the per-query min is the timing
    # with its LEAST-interfering neighbors — a far tighter steady-state
    # estimate than min-of-2 at one fixed position. Deterministic (no
    # RNG state): reruns see identical orders.
    # The builder runs INSIDE the timed region so operators that execute
    # eagerly (iterative CC, codebook training) are measured honestly.
    # Per-query failure isolation: one broken query must never zero the
    # round's whole perf signal. Failures are recorded as {"err": "..."}
    # entries and the sweep continues; exit code is 0 as long as most of
    # the battery produced a timing.
    import hashlib

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for pass_idx in range(3):
        order = sorted(
            HEADLINE,
            key=lambda n: hashlib.md5(f"{pass_idx}:{n}".encode()).hexdigest(),
        )
        for name in order:
            if name in errors:
                continue
            t0 = time.perf_counter()
            try:
                materialize(qs[name](spark, sf_dir))
            except Exception as exc:  # noqa: BLE001 — isolate, record, move on
                errors[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:300]}"
                timings.pop(name, None)
                continue
            el = round(time.perf_counter() - t0, 3)
            if name not in timings or el < timings[name]:
                timings[name] = el
            isolate(spark)

    def settle(seconds: float = 1.0) -> None:
        # Let the async ContextCleaner drain AFTER the forced GC and
        # BEFORE the next clock starts: System.gc() enqueues the cleanup
        # work but returns immediately, so without this pause the freeing
        # of the previous query's shuffle files/broadcasts lands inside
        # the next timed window (r07: 20-30% inflation on the slow tail,
        # one +66% outlier that absorbed a full cleanup pass).
        time.sleep(seconds)

    def quiet_min3(name: str) -> float | None:
        """Settled min-of-3: isolate, let the cleaner drain, then time."""
        isolate(spark)
        settle()
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            try:
                materialize(qs[name](spark, sf_dir))
            except Exception:
                break
            el = round(time.perf_counter() - t0, 3)
            best = el if best is None else min(best, el)
            isolate(spark)
            settle(0.4)
        return best

    # Quiet-window re-timing: the slowest QUIET_N queries get a settled
    # min-of-3 that REPLACES their sweep number — these dominate the total
    # and were exactly the ones the r07 control showed inflated. Cheap
    # queries keep their sweep min (inflation there is bounded by the
    # same ~1s cleanup cost that the slow tail amortizes poorly). The
    # replaced sweep minima are kept in the ``sweep_tail`` field: the
    # sweep-vs-quiet gap IS the in-sweep drift measurement.
    QUIET_N = 15
    sweep_tail: dict[str, float] = {}
    for name in sorted(timings, key=timings.get, reverse=True)[:QUIET_N]:
        best = quiet_min3(name)
        if best is not None:
            sweep_tail[name] = timings[name]
            # MIN over both phases, not replacement (round 9): the r9 run
            # showed the quiet phase itself can catch a transient host/GC
            # window (quality_calibration_report sweep 5.44 s -> quiet
            # 16.43 s while the immediately-following warm10 control read
            # 6.13 s). Every phase is a legitimate execution of the same
            # warm plan, so the minimum over {2 sweep passes, 3 quiet
            # passes} is the least-upward-biased steady-state estimate;
            # replacement would adopt whichever phase was unlucky.
            timings[name] = min(timings[name], best)

    # Sweep-end control: an INDEPENDENT settled min-of-3 of the 10
    # slowest — same estimator as the primary, different moment, so the
    # comparison isolates residual session-state drift from single-run
    # right-tail noise (a lone re-time ran +20-57% above min-of-3 on the
    # slow tail). warm10 ≈ primary (±10%) means isolation holds.
    warm10: dict[str, float] = {}
    for name in sorted(timings, key=timings.get, reverse=True)[:10]:
        best = quiet_min3(name)
        if best is not None:
            warm10[name] = best

    payload, rc, stderr_lines = summarize(timings, errors, len(HEADLINE), sf)
    payload["warm10"] = warm10
    payload["sweep_tail"] = sweep_tail
    for line in stderr_lines:
        print(line, file=sys.stderr)
    print(json.dumps(payload))
    if rc:
        sys.exit(rc)


def summarize(
    timings: dict[str, float],
    errors: dict[str, str],
    n_headline: int,
    sf: str,
) -> tuple[dict, int, list[str]]:
    """Pure reporting policy, unit-tested in tests/test_bench_contract.py.

    Returns (stdout JSON payload, exit code, stderr lines). Errors must be
    loud even when the exit code stays 0 (the driver treats nonzero as a
    total bench abort, so rc != 0 is reserved for broad collapse — more
    than half the battery failing): each failure gets its own stderr line
    and a final SUMMARY line carries the count for CI consumers that only
    tail stderr."""
    queries: dict[str, object] = dict(timings)
    stderr_lines = []
    for name, err in errors.items():
        queries[name] = {"err": err}
        stderr_lines.append(f"bench: ERROR {name}: {err}")
    if errors:
        stderr_lines.append(
            f"bench: SUMMARY n_err={len(errors)} of {n_headline} headline "
            "queries failed (rc stays 0 below the collapse threshold — CI "
            "must check the JSON n_err field, not just the exit code)"
        )
    payload = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": queries,
        "n_ok": len(timings),
        "n_err": len(errors),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    rc = 1 if len(timings) < n_headline // 2 else 0
    return payload, rc, stderr_lines


if __name__ == "__main__":
    main()
