"""Scale probe: measure headline operators at sf0.1 and a synthesized 10x
corpus (~sf1) to verify near-linear scaling of the sub-quadratic paths.

Builds /tmp/spark_graft_sf1 once by unioning 10 key-offset copies of the
driver's sf0.1 tables (multi-file parquet → real scan parallelism), then
times a representative operator set at both scales. Quadratic kernels
(blocked GEMM) are intentionally excluded — their scale path is LSH/IVF
candidate pruning, which IS measured. Results land in SCALE.md §"Measured
scaling"; rerun: `python scale_probe.py`.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from flink_streaming_etl_spark import api
from flink_streaming_etl_spark.catalog import TABLES, load_tables
from flink_streaming_etl_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_sf1")
COPIES = 10

#: operator → key columns to offset per copy (keeps keys globally unique)
OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "nation": [],
    "region": [],
}

PROBES = [
    "pricing_summary",
    "user_day_stats",
    "order_enrich_join",
    "latest_event_per_user",
    "windowed_event_stats",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ann_lsh_bucketed",
    "chunk_documents",
    "tfidf_top_terms",
    "profile_orders",
    "window_battery",
    "shipping_priority",
    "local_supplier_volume",
    "bloom_incremental_dedup",
    "funnel_stages",
    "cohort_retention",
    "normalize_text",
    # round-4 additions
    "profile_orders_hll",
    "vocab_top_tokens",
    "gopher_quality",
    "span_dedup",
    "ngram_novelty",
    "cumulate_event_stats",
    "hopping_event_stats_decomposed",
    "curated_corpus_v2",
    "quantize_embeddings",
    "heavy_hitter_tokens",
    # round-5 additions
    "repetition_battery",
    "source_mixture_weights",
    "pq_encode",
    # round-6 additions
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
    "pca_top_component",
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
    # round-10 additions
    "blocklist_filter_report",
    "distinct_ngram_report",
    "quality_ensemble_report",
    "dedup_tier_agreement_report",
    "hard_negative_mining",
    # round-10 wave 2
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
    # round-11 additions
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
    # round-12 addition
    "cep_define_peak_matches",
    # round-13 additions
    "cep_backtrack_matches",
    "cep_nfa_backtrack_matches",
    "media_features",
    "media_resize",
    "media_frames",
]


def build_sf1(spark) -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        return
    src = load_tables(spark, SRC, register=False)
    for name in TABLES:
        if name not in src:
            continue
        df = src[name]
        key_max = {
            c: (df.agg(F.max(c)).collect()[0][0] or 0) + 1 for c in OFFSETS.get(name, [])
        }
        parts = []
        for i in range(COPIES if OFFSETS.get(name) else 1):
            part = df
            for c, m in key_max.items():
                part = part.withColumn(c, (F.col(c) + F.lit(i * m)).cast(df.schema[c].dataType))
            parts.append(part)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(DST, f"{name}.parquet"))
    with open(os.path.join(DST, "_DONE"), "w") as f:
        f.write("ok")


def _ann_dialed(spark, sf_dir):
    """ann_lsh_bucketed with its corpus-growth dial APPLIED (p=6→9 for the
    10x corpus, per the operator's own docstring). The fixed-dial cliff was
    measured once: p=6 at 10x → 262x runtime (in-bucket pairs grow (n/2^p)²);
    the probe demonstrates the documented operating procedure instead of
    re-measuring the cliff every run."""
    from flink_streaming_etl_spark.operators import similarity

    emb = load_tables(spark, sf_dir, register=False)["embeddings"]
    return similarity.ann_lsh_bucketed(emb, n_planes=9)


def _semdedup_dialed(spark, sf_dir):
    """semdedup_drop with the centroid dial APPLIED (C grows linearly with
    the corpus, similarity.centroids_for_corpus): fixed C=16 at 10x was
    measured at 8.0x runtime (within-cell pairs grow n^2/C); C=n/100 keeps
    cells at ~100 vectors and within-cell work linear."""
    from flink_streaming_etl_spark.operators import similarity

    emb = load_tables(spark, sf_dir, register=False)["embeddings"]
    n = emb.count()
    return similarity.semdedup_drop(
        emb, n_centroids=similarity.centroids_for_corpus(n)
    )


def _knn_dialed(spark, sf_dir):
    """knn_graph with the plane dial APPLIED (p = planes_for_corpus(n),
    the same logarithmic rule as ann_lsh_bucketed): fixed p=6 at 10x was
    measured at 4.4x (in-bucket candidates grow (n/2^p)^2 per bucket)."""
    from flink_streaming_etl_spark.operators import similarity

    emb = load_tables(spark, sf_dir, register=False)["embeddings"]
    n = emb.count()
    return similarity.knn_graph(emb, n_planes=similarity.planes_for_corpus(n))


def _knn_label_eval_dialed(spark, sf_dir):
    """knn_label_eval with knn_graph's plane dial applied (p =
    planes_for_corpus(n)) — the eval inherits the graph's documented
    scale procedure."""
    from flink_streaming_etl_spark.operators import similarity

    emb = load_tables(spark, sf_dir, register=False)["embeddings"]
    n = emb.count()
    return similarity.knn_label_eval(
        emb, n_planes=similarity.planes_for_corpus(n)
    )


def _sem_contam_dialed(spark, sf_dir):
    """semantic_contamination_check with the plane dial APPLIED (p =
    planes_for_corpus(n)) — same cliff class as ann_lsh_bucketed: at fixed
    p the per-bucket eval x train candidate volume grows quadratically."""
    from flink_streaming_etl_spark.operators import similarity

    emb = load_tables(spark, sf_dir, register=False)["embeddings"]
    n = emb.count()
    return similarity.semantic_contamination_check(
        emb, n_planes=similarity.planes_for_corpus(n)
    )


#: (probe, scale-label) → replacement callable: operators whose documented
#: scale procedure changes a dial with corpus size.
OVERRIDES = {
    ("ann_lsh_bucketed", "sf1"): _ann_dialed,
    ("semdedup_drop", "sf1"): _semdedup_dialed,
    ("knn_graph", "sf1"): _knn_dialed,
    ("knn_label_eval", "sf1"): _knn_label_eval_dialed,
    ("semantic_contamination_check", "sf1"): _sem_contam_dialed,
}


def fold_cost_dedup(spark) -> None:
    """r14 fold-cost probe (r13 verdict #1 'Done' condition): per-fold
    wall time of a FIXED 1k-doc batch against the text-dedup
    accumulator pair at state:batch ratios 10x / 100x / 1000x —
    the foreachBatch twin (anti∪union re-materializes the full owner
    relation per fold, O(|state|)) vs the GroupState twin
    (executor-resident keyed state, O(batch) point updates + the
    engine's delta-file maintenance). Results → SCALE.md.

    Run: ``python scale_probe.py fold_cost_dedup``."""
    import shutil
    import tempfile

    from flink_streaming_etl_spark.streaming.text_dedup import (
        BloomTextDedupAccumulator,
        StatefulBloomTextDedup,
    )

    BATCH = 1_000
    RATIOS = [10, 100, 1000]

    def docs(start, n, tag):
        return (
            spark.range(start, start + n)
            .select(
                F.col("id").alias("doc_id"),
                F.concat_ws(
                    " ",
                    F.lit(tag),
                    F.md5(F.col("id").cast("string")),
                    F.md5((F.col("id") + 1).cast("string")),
                )
                .alias("text"),
            )
            .withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("probe"))
            .withColumn("n_chars", F.length("text"))
        )

    out = {}
    for ratio in RATIOS:
        state_n = BATCH * ratio
        # -- foreachBatch twin: seed one big fold, then time small folds
        acc = BloomTextDedupAccumulator()
        acc.add_batch(docs(0, state_n, "seed"), batch_id=0)
        times = []
        for i in range(3):
            b = docs(10_000_000 + i * BATCH, BATCH, "fold")
            t0 = time.perf_counter()
            acc.add_batch(b, batch_id=i + 1)
            times.append(time.perf_counter() - t0)
        fb = round(min(times), 3)
        # -- GroupState twin: same seed + folds through a parquet stream
        root = tempfile.mkdtemp(prefix="foldcost_")
        src, ckpt = os.path.join(root, "src"), os.path.join(root, "ckpt")
        os.makedirs(src)
        schema = "doc_id long, text string, lang string, source string, n_chars long"
        docs(0, state_n, "seed").coalesce(4).write.parquet(
            os.path.join(src, "b000")
        )
        st = StatefulBloomTextDedup()
        q = st.attach(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*"),
            checkpointLocation=ckpt,
        )
        q.processAllAvailable()  # seed fold
        gs_times = []
        for i in range(3):
            docs(20_000_000 + i * BATCH, BATCH, "fold").coalesce(1).write.parquet(
                os.path.join(src, f"b{i + 1:03d}")
            )
            t0 = time.perf_counter()
            q.processAllAvailable()
            gs_times.append(time.perf_counter() - t0)
        q.stop()
        shutil.rmtree(root, ignore_errors=True)
        gs = round(min(gs_times), 3)
        out[f"{ratio}x"] = {"foreachBatch": fb, "groupState": gs}
        print(json.dumps({f"state_{state_n}": out[f"{ratio}x"]}))
    print(json.dumps({"fold_cost_dedup": out}))


def fold_cost_media(spark) -> None:
    """Companion of :func:`fold_cost_dedup` for the MEDIA pair (r13
    verdict #1 covers both corpus-scale accumulators): per-fold wall
    time of a FIXED 250-doc batch (~4 chunks each) vs the chunk-dedup
    accumulator pair at state:batch ratios 10x / 100x.

    Run: ``python scale_probe.py fold_cost_media``."""
    import shutil
    import tempfile

    from flink_streaming_etl_spark.streaming.media_dedup import (
        MediaChunkDedupAccumulator,
        StatefulMediaChunkDedup,
    )

    BATCH = 250
    RATIOS = [10, 100]

    def docs(start, n, tag):
        # ~256-byte unique payloads → 4 aligned 64-byte chunks each
        body = F.concat_ws(
            "|",
            F.lit(tag),
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") + 1).cast("string")),
            F.md5((F.col("id") + 2).cast("string")),
            F.md5((F.col("id") + 3).cast("string")),
            F.md5((F.col("id") + 4).cast("string")),
            F.md5((F.col("id") + 5).cast("string")),
            F.md5((F.col("id") + 6).cast("string")),
        )
        return (
            spark.range(start, start + n)
            .select(F.col("id").alias("doc_id"), body.alias("text"))
            .withColumn("lang", F.lit("en"))
            .withColumn("source", F.lit("probe"))
            .withColumn("n_chars", F.length("text"))
        )

    out = {}
    for ratio in RATIOS:
        state_n = BATCH * ratio
        acc = MediaChunkDedupAccumulator()
        acc.add_batch(docs(0, state_n, "seed"), batch_id=0)
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            acc.add_batch(docs(10_000_000 + i * BATCH, BATCH, "fold"), i + 1)
            times.append(time.perf_counter() - t0)
        fb = round(min(times), 3)

        root = tempfile.mkdtemp(prefix="foldcost_media_")
        src, ckpt = os.path.join(root, "src"), os.path.join(root, "ckpt")
        os.makedirs(src)
        schema = "doc_id long, text string, lang string, source string, n_chars long"
        docs(0, state_n, "seed").coalesce(4).write.parquet(
            os.path.join(src, "b000")
        )
        st = StatefulMediaChunkDedup()
        q = st.attach(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*"),
            checkpointLocation=ckpt,
        )
        q.processAllAvailable()
        gs_times = []
        for i in range(3):
            docs(20_000_000 + i * BATCH, BATCH, "fold").coalesce(1).write.parquet(
                os.path.join(src, f"b{i + 1:03d}")
            )
            t0 = time.perf_counter()
            q.processAllAvailable()
            gs_times.append(time.perf_counter() - t0)
        q.stop()
        shutil.rmtree(root, ignore_errors=True)
        gs = round(min(gs_times), 3)
        out[f"{ratio}x"] = {"foreachBatch": fb, "groupState": gs}
        print(json.dumps({f"state_{state_n}": out[f"{ratio}x"]}))
    print(json.dumps({"fold_cost_media": out}))


def nfa_scan_probe() -> None:
    """r14 NFA worst-case probe (r13 verdict #4 'Done' condition): one
    pathological key — s all-true '+' steps + impossible tail — scanned
    at n and 2n rows. Memoized scan is polynomial (expect ~4x at 2n for
    the quadratic bound); the pre-r14 scan was O(n^s). Also times the
    within-prune mode, whose per-start work is horizon-bounded.

    Run: ``python scale_probe.py nfa_scan_probe``."""
    from flink_streaming_etl_spark.operators.cep import _nfa_scan

    out = {}
    for n in (400, 800):
        flags = [[True] * n for _ in range(5)] + [[False] * n]
        quants = ["+"] * 5 + ["1"]
        t0 = time.perf_counter()
        _nfa_scan(flags, quants)
        full = round(time.perf_counter() - t0, 3)
        # prune mode: hourly rows, 50 h horizon → ≤50-row windows
        uss = [i * 3_600_000_000 for i in range(n)]
        t0 = time.perf_counter()
        _nfa_scan(flags, quants, uss=uss, within_us=50 * 3_600_000_000)
        pruned = round(time.perf_counter() - t0, 3)
        out[str(n)] = {"memoized_full": full, "within_prune_50h": pruned}
        print(json.dumps({f"n_{n}": out[str(n)]}))
    print(json.dumps({"nfa_scan_probe": out}))


def main() -> None:
    import sys

    if "fold_cost_dedup" in sys.argv[1:]:
        fold_cost_dedup(get_spark("fold-cost-probe"))
        return
    if "fold_cost_media" in sys.argv[1:]:
        fold_cost_media(get_spark("fold-cost-probe"))
        return
    if "nfa_scan_probe" in sys.argv[1:]:
        nfa_scan_probe()
        return
    # optional argv filter: `python scale_probe.py name1 name2` probes only
    # the named entries (used for the per-round delta probes; the full
    # sweep stays the default).
    selected = [n for n in sys.argv[1:] if n in set(PROBES)]
    probes = selected or PROBES
    spark = get_spark("scale-probe")
    build_sf1(spark)
    qs = api.queries()

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    results = {}
    for name in probes:
        row = {}
        for label, sf_dir in [("sf0.1", SRC), ("sf1", DST)]:
            fn = OVERRIDES.get((name, label), qs[name])
            materialize(fn(spark, sf_dir))  # warm this plan shape
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                materialize(fn(spark, sf_dir))
                el = time.perf_counter() - t0
                best = el if best is None or el < best else best
            row[label] = round(best, 3)
        row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 1)
        results[name] = row
        print(json.dumps({name: row}))
    print(json.dumps({"scale_probe": results}))


if __name__ == "__main__":
    main()
