"""Property tests for the beyond-reference extensions: ANN recall and
event-time windowing (batch ≡ streaming-with-watermark)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_etl_spark.catalog import load_tables
from flink_streaming_etl_spark.operators import similarity, windows
from tests.conftest import SF_SMOKE


def _load(spark, name):
    return load_tables(spark, SF_SMOKE, register=False)[name]


def test_ann_ivf_recall(spark):
    """IVF probes a fraction of the corpus; its top-k must still recover a
    decent share of the exact top-k (sanity floor, not a tuned benchmark)."""
    emb = _load(spark, "embeddings")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]) for r in similarity.ann_ivf(emb).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    # and IVF must return k rows per query (enough candidates in probed cells)
    per_q = similarity.ann_ivf(emb).groupBy("query_id").count().collect()
    assert all(r["count"] == similarity.TOP_K for r in per_q)


def test_ann_lsh_subset_of_exact(spark):
    """Bucketed LSH pairs are a strict subset of the exact all-pairs
    relation at the same threshold (it only prunes, never invents)."""
    emb = _load(spark, "embeddings")
    exact = {
        (r["a_id"], r["b_id"])
        for r in similarity.embedding_neardup(emb, threshold=0.1).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"])
        for r in similarity.ann_lsh_bucketed(emb, threshold=0.1).collect()
    }
    assert lsh <= exact
    assert lsh, "LSH found nothing at a threshold where exact pairs exist"


def test_windowed_stats_streaming_equals_batch(spark, tmp_path):
    """The watermarked streaming aggregation emits exactly the batch result
    once the source is exhausted (availableNow drains everything)."""
    events = _load(spark, "events").limit(2000).cache()
    src_dir = tmp_path / "events_json"
    events.select(
        F.col("event_id"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "event_type",
        "value",
    ).coalesce(1).write.json(str(src_dir))

    schema = "event_id long, ts string, event_type string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src_dir))
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .withWatermark("ts", "10 minutes")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(windows.DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windows.windowed_event_stats(events).collect()
    }
    # Append mode holds back windows the watermark hasn't passed; with
    # availableNow + in-order-ish data that's at most the trailing window(s).
    assert got, "streaming emitted nothing"
    assert set(got) <= set(want)
    for key, val in got.items():
        assert val == want[key], key
    assert len(got) >= len(want) - 2 * len({k[1] for k in want})


def test_multimodal_resize_contract(spark):
    from flink_streaming_etl_spark.operators import multimodal

    docs = _load(spark, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.documents_as_media(docs)
    out = multimodal.resize_images(media, width=8, height=4).collect()
    n_images = media.filter(F.col("media_type") == "image").count()
    assert len(out) == n_images > 0
    assert all(r["n_bytes"] == 32 and len(r["payload"]) == 32 for r in out)
    assert all(r["width"] == 8 and r["height"] == 4 for r in out)


def test_multimodal_frame_sampling(spark):
    from flink_streaming_etl_spark.operators import multimodal

    docs = _load(spark, "documents").filter(F.col("doc_id") < 200)
    media = multimodal.documents_as_media(docs)
    frames = multimodal.sample_frames(media, every_n=2, max_frames=3)
    rows = frames.collect()
    assert rows
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in per_media.items():
        assert len(idxs) <= 3
        assert sorted(idxs) == idxs == [2 * i for i in range(len(idxs))]
    assert all(len(r["frame"]) <= 64 for r in rows)

    # payload column prunes away for metadata-only consumers of the same
    # media relation (scan-level pruning contract)
    from flink_streaming_etl_spark.plans import plan_text
    meta_plan = plan_text(multimodal.media_metadata(docs))
    assert "payload" not in meta_plan


def test_neardup_clusters_transitive(spark):
    """Clusters collapse transitive near-dups: if (a,b) and (b,c) are pairs
    then a, b, c share one cluster id = min of the component."""
    from flink_streaming_etl_spark.operators import dedup

    docs = _load(spark, "documents")
    pairs = [
        (r["a_id"], r["b_id"])
        for r in dedup.minhash_lsh_pairs(docs).select("a_id", "b_id").collect()
    ]
    clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.neardup_clusters(docs).collect()
    }
    # union-find ground truth over the pair list
    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert clusters == want


def test_kmeans_assign_properties(spark):
    """Lloyd iterations must not decrease assignment quality: mean best-
    cosine with 5 iterations >= with 0 iterations (init centroids)."""
    from flink_streaming_etl_spark.operators import similarity

    emb = _load(spark, "embeddings")
    a0 = similarity.kmeans_assign(emb, n_iter=0)
    a5 = similarity.kmeans_assign(emb, n_iter=5)
    m0 = a0.agg(F.avg("cosine")).collect()[0][0]
    m5 = a5.agg(F.avg("cosine")).collect()[0][0]
    assert a5.count() == emb.count()
    assert a5.select("centroid_idx").distinct().count() > 1
    assert m5 >= m0 - 1e-9, (m0, m5)


def test_standardize_by_label(spark):
    from flink_streaming_etl_spark.operators import similarity
    import numpy as np

    emb = _load(spark, "embeddings")
    out = similarity.standardize_by_label(emb)
    assert out.count() == emb.count()
    rows = out.filter(F.col("label") == out.select("label").first()[0]).collect()
    Z = np.stack([np.asarray(r["z"]) for r in rows])
    assert np.abs(Z.mean(axis=0)).max() < 1e-9  # per-dim mean ~ 0 per group


def test_stratified_sample_balances_strata(spark):
    """Hash-rate sampling must keep ~per_stratum docs per lang (exactly
    min(n, per_stratum) in expectation; the integer-rate bound guarantees
    kept <= ceil(per_stratum/MOD * MOD) per stratum scaled) and be a
    subset of the corpus, deterministic across invocations."""
    from flink_streaming_etl_spark.operators import text

    docs = _load(spark, "documents")
    per = 50
    s = text.stratified_sample(docs, per_stratum=per)
    kept = {r["lang"]: r["n"] for r in s.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in kept.items():
        cap = totals[lang]
        # a stratum smaller than the target is kept whole; larger strata
        # land near the target (hash variance: generous 3x bound)
        if cap <= per:
            assert n == cap, (lang, n, cap)
        else:
            assert n <= 3 * per, (lang, n)
    # deterministic: second invocation identical
    s2 = text.stratified_sample(docs, per_stratum=per)
    assert s.exceptAll(s2).count() == 0 and s2.exceptAll(s).count() == 0


def test_curated_corpus_excludes_drops_and_low_quality(spark):
    from flink_streaming_etl_spark.operators import dedup, text

    docs = _load(spark, "documents")
    cur = text.curated_corpus(docs)
    assert cur.count() > 0
    # no kept doc may be in the near-dup drop list
    drops = dedup.neardup_drop_list(docs)
    assert cur.join(drops, "doc_id").count() == 0
    # every kept doc passes the quality filter
    q = text.quality_score(docs).select("doc_id", "keep")
    assert cur.join(q, "doc_id").filter(~F.col("keep")).count() == 0


def test_planes_for_corpus_dial():
    from flink_streaming_etl_spark.operators.similarity import planes_for_corpus

    assert planes_for_corpus(100) == 1          # degenerate: one split still
    assert planes_for_corpus(6400) == 6         # the sf0.1 default regime
    assert planes_for_corpus(64000) == 10       # 10x corpus → p += ceil(log2 10)
    # invariant: doubling the corpus never adds more than one plane
    for n in [1000, 5000, 20000, 100000]:
        assert planes_for_corpus(2 * n) <= planes_for_corpus(n) + 1


def test_span_dedup_identity_when_no_sharing(spark):
    """With min_docs above the corpus size nothing is boilerplate: every
    document reconstructs exactly (span reassembly is lossless — the
    whitespace-normalized original text)."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.text import span_dedup
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register=False)["documents"]
    out = span_dedup(docs, span_tokens=4, min_docs=10**9)
    norm = docs.select(
        "doc_id", F.regexp_replace(F.trim("text"), r"\s+", " ").alias("norm")
    )
    bad = (
        out.join(norm, "doc_id")
        .filter((F.col("clean_text") != F.col("norm")) | (F.col("n_spans_dropped") != 0))
        .count()
    )
    assert bad == 0


def test_ngram_novelty_bounds_and_first_doc(spark):
    """The earliest document owns all its shingles (novelty 1.0); novelty
    is always within [0, 1]; n_seen_before never exceeds n_shingles."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.dedup import ngram_novelty
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register=False)["documents"]
    nov = ngram_novelty(docs).cache()
    first_id = docs.agg(F.min("doc_id")).collect()[0][0]
    first = nov.filter(F.col("doc_id") == first_id).collect()[0]
    assert first["novelty"] == 1.0 and first["n_seen_before"] == 0
    assert nov.filter((F.col("novelty") < 0) | (F.col("novelty") > 1)).count() == 0
    assert nov.filter(F.col("n_seen_before") > F.col("n_shingles")).count() == 0


def test_gopher_quality_keep_consistent_with_metrics(spark):
    """`keep` must be exactly the conjunction of the published thresholds
    over the returned metric columns — no hidden state."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.text import gopher_quality
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register=False)["documents"]
    g = gopher_quality(docs)
    recomputed = (
        F.col("n_tokens").between(30, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("top_token_frac") < 0.20)
    )
    assert g.filter(F.col("keep") != recomputed).count() == 0


def test_span_dedup_removes_shared_span_only(spark):
    """Constructed case: two docs share one exact 4-token span; all other
    spans are unique. The shared span must vanish from BOTH docs; every
    unique span must survive verbatim."""
    from flink_streaming_etl_spark.operators.text import span_dedup

    shared = "alpha beta gamma delta"
    rows = [
        (1, f"{shared} one two three four", "en", "s", 0),
        (2, f"five six seven eight {shared}", "en", "s", 0),
        (3, "nine ten eleven twelve", "en", "s", 0),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r for r in span_dedup(docs, span_tokens=4, min_docs=2).collect()}
    assert out[1]["clean_text"] == "one two three four"
    assert out[2]["clean_text"] == "five six seven eight"
    assert out[1]["n_spans_dropped"] == 1 and out[2]["n_spans_dropped"] == 1
    assert out[3]["clean_text"] == "nine ten eleven twelve"
    assert out[3]["n_spans_dropped"] == 0


def test_cumulate_slices_monotone(spark):
    """Within one (hour, event_type) the growing windows are cumulative:
    n_events is nondecreasing in window_end."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators import windows as W
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as SW
    from tests.conftest import SF_SMOKE

    events = load_tables(spark, SF_SMOKE, register=False)["events"]
    cum = W.cumulate_event_stats(events)
    w = SW.partitionBy("window_start", "event_type").orderBy("window_end")
    bad = (
        cum.withColumn("prev_n", F.lag("n_events").over(w))
        .filter(F.col("prev_n").isNotNull() & (F.col("n_events") < F.col("prev_n")))
        .count()
    )
    assert bad == 0


def test_heavy_hitters_equal_bruteforce_any_partitioning(spark):
    """The MG candidate pass must not lose a true heavy hitter under ANY
    partitioning: compare against the brute-force answer with the corpus
    deliberately repartitioned several ways (the theorem says candidates
    are a superset; the exact-verify stage makes the final result equal)."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.text import heavy_hitter_tokens
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register=False)["documents"]
    toks = docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
    total = toks.count()
    k = 50
    want = {
        (r["token"], r["n"])
        for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") * k > total).collect()
    }
    assert want, "fixture has no heavy hitters at this k"
    for arrangement in (docs, docs.repartition(1), docs.repartition(13, "doc_id"),
                        docs.repartition(40)):
        got = {(r["token"], r["n"]) for r in heavy_hitter_tokens(arrangement, k).collect()}
        assert got == want


def test_heavy_hitter_builder_is_lazy_and_two_pass(spark):
    """Building the heavy-hitter DataFrame must trigger NO Spark job (the
    registry builder contract is lazy); the former implementation ran an
    eager toks.count() third corpus pass at build time."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.text import heavy_hitter_tokens
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register=False)["documents"]
    sc = spark.sparkContext
    group = "hh-lazy-check"
    sc.setJobGroup(group, "heavy_hitter_tokens builder must not run jobs")
    try:
        df = heavy_hitter_tokens(docs)
    finally:
        sc.setJobGroup("hh-lazy-check-done", "")
    assert list(sc.statusTracker().getJobIdsForGroup(group)) == []
    # and the result is still non-trivial when actually executed
    assert df.count() > 0


def test_pq_encode_centroids_self_code_and_range(spark):
    """Pinned-codebook PQ invariants: every code word is in [0, k); each
    codebook vector encodes to its own centroid index in every subspace
    (own distance is exactly 0 and ties break on index)."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.similarity import (
        N_CENTROIDS,
        N_QUERIES,
        PQ_M,
        pq_encode,
    )
    from tests.conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, register=False)["embeddings"]
    rows = {r["vec_id"]: r for r in pq_encode(emb).collect()}
    assert len(rows) == emb.count()
    for r in rows.values():
        for s in range(PQ_M):
            assert 0 <= r[f"code_{s}"] < N_CENTROIDS
    for c in range(N_CENTROIDS):
        r = rows[N_QUERIES + c]
        assert all(r[f"code_{s}"] == c for s in range(PQ_M)), r


def test_source_mixture_weights_flatten_distribution(spark):
    """Temperature scaling must up-weight under-represented sources and
    down-weight over-represented ones, with the alpha distribution still
    summing to 1."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.text import source_mixture_weights
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register=False)["documents"]
    rows = source_mixture_weights(docs).collect()
    assert abs(sum(r["alpha_frac"] for r in rows) - 1.0) < 1e-4
    mean_nat = 1.0 / len(rows)
    for r in rows:
        if r["nat_frac"] < mean_nat * 0.5:
            assert r["weight"] > 1.0, r
        if r["nat_frac"] > mean_nat * 2.0:
            assert r["weight"] < 1.0, r


def test_ann_recall_report_bounds_and_perfect_recall_on_small_corpus(spark):
    """Recall values are in [0,1] with n_hits <= k; every probe vector gets
    a row even at zero hits."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        ann_recall_report,
    )
    from tests.conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, register=False)["embeddings"]
    rows = ann_recall_report(emb).collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r["n_hits"] <= TOP_K
        assert 0.0 <= r["recall"] <= 1.0
        assert abs(r["recall"] - r["n_hits"] / TOP_K) < 1e-6


def test_neardup_keep_best_one_winner_per_cluster_highest_quality(spark):
    """Exactly one survivor per near-dup cluster, and it is the
    highest-quality member (doc_id tiebreak); unclustered docs all survive."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.dedup import (
        neardup_clusters,
        neardup_keep_best,
    )
    from flink_streaming_etl_spark.operators.text import quality_score
    from tests.conftest import SF_SMOKE

    docs = load_tables(spark, SF_SMOKE, register=False)["documents"]
    kept = {r["doc_id"] for r in neardup_keep_best(docs).collect()}
    clusters = {}
    for r in neardup_clusters(docs).collect():
        clusters.setdefault(r["cluster_id"], []).append(r["doc_id"])
    quality = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    clustered = {d for members in clusters.values() for d in members}
    for members in clusters.values():
        winners = [d for d in members if d in kept]
        best = min(members, key=lambda d: (-quality[d], d))
        assert winners == [best], (winners, best)
    n_docs = docs.count()
    assert len(kept) == n_docs - len(clustered) + len(clusters)


def test_sorted_run_fold_matches_python_reference_on_adversarial_docs(spark):
    """gopher_quality / repetition_battery rest on the sorted-run fold
    (longest equal run = top n-gram count, run starts = distinct count).
    Pin it against a plain-Python Counter reference over adversarial
    synthetic docs: single token, all-identical tokens, alternating pairs,
    long runs, and random mixes."""
    import random
    from collections import Counter

    from flink_streaming_etl_spark.operators.text import gopher_quality, repetition_battery

    rng = random.Random(7)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    docs = [
        (0, "x"),                          # single token
        (1, "a a a a a a"),                # one token repeated
        (2, "a bb a bb a bb"),             # alternating
        (3, " ".join(["a"] * 50 + ["bb"] * 3)),  # long run + tail
    ]
    for i in range(4, 120):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60)))))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    for doc_id, text in docs:
        toks = text.strip().split()
        c = Counter(toks)
        assert got[doc_id]["n_distinct_tokens"] == len(c), doc_id
        top_frac = got[doc_id]["top_token_frac"]
        import math
        want = math.floor(max(c.values()) / len(toks) * 1e6) / 1e6
        assert abs(top_frac - want) < 1e-9, (doc_id, top_frac, want)

    rep = {r["doc_id"]: r for r in repetition_battery(df).collect()}
    for doc_id, text in docs:
        toks = text.strip().split()
        n = len(toks)
        bigrams = [" ".join(toks[i:i + 2]) for i in range(max(n - 1, 1))]
        c2 = Counter(bigrams)
        import math
        want2 = math.floor(max(c2.values()) * 2 / n * 1e6) / 1e6
        assert abs(rep[doc_id]["top_bigram_frac"] - want2) < 1e-9, doc_id
        spans = [" ".join(toks[i:i + 4]) for i in range(0, n, 4)]
        want_dup = math.floor((1.0 - len(set(spans)) / len(spans)) * 1e6) / 1e6
        assert abs(rep[doc_id]["dup_span_frac"] - want_dup) < 1e-9, doc_id


def test_ann_ivf_pq_quality_and_determinism(spark):
    """IVF-PQ sanity: results deterministic across runs, codes/cells prune
    honestly (every neighbor comes from a probed cell), and the ADC ranking
    has real retrieval power — measured as recall overlap with the exact
    top-k well above random."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators.similarity import (
        TOP_K,
        ann_ivf_pq,
        cosine_topk,
    )
    from tests.conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, register=False)["embeddings"]
    r1 = sorted(map(tuple, ann_ivf_pq(emb).collect()))
    r2 = sorted(map(tuple, ann_ivf_pq(emb).collect()))
    assert r1 == r2 and r1
    approx = {}
    for q, n, _ in r1:
        approx.setdefault(q, set()).add(n)
    exact = {}
    for r in cosine_topk(emb).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    n_total = emb.count()
    hits = sum(len(approx[q] & exact[q]) for q in exact if q in approx)
    possible = sum(len(v) for v in exact.values())
    recall = hits / possible
    # random top-k would land ~ TOP_K/n_total (1% here). The synthetic
    # embeddings are near-uniform random (no cluster structure), the worst
    # case for IVF cells and PQ codes alike — measured recall ~8x random;
    # require comfortably above 4x so a real ranking regression still trips.
    assert recall > 4 * TOP_K / n_total, recall


def test_curated_corpus_token_cache_memoized(spark):
    """Repeat curated_corpus_v2 invocations in one session must reuse ONE
    persisted token relation (per input plan), not stack a new CacheManager
    entry per call; the LRU unpersists the oldest entry on overflow."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators import text as tx
    from tests.conftest import SF_SMOKE

    from flink_streaming_etl_spark.operators import _cache

    _cache.clear_operator_caches()
    docs = load_tables(spark, SF_SMOKE, register=False)["documents"]
    a = tx._shared_token_relation(docs)
    b = tx._shared_token_relation(docs)
    assert a is b  # same persisted DataFrame, not a second pinned copy
    assert _cache.cache_stats()["shared_tokens"] == 1
    # two full builds share the one cached relation and stay correct
    n1 = tx.curated_corpus_v2(docs).count()
    n2 = tx.curated_corpus_v2(docs).count()
    assert n1 == n2 and _cache.cache_stats()["shared_tokens"] == 1
    # LRU eviction unpersists the oldest once capacity is exceeded
    for i in range(_cache.DEFAULT_MAX_ENTRIES):
        tx._shared_token_relation(docs.limit(10 + i))
    assert _cache.cache_stats()["shared_tokens"] == _cache.DEFAULT_MAX_ENTRIES
    assert a.storageLevel.useMemory is False  # evicted entry was unpersisted
    # clear_operator_caches releases everything (the bench isolation hook)
    _cache.clear_operator_caches()
    assert _cache.cache_stats() == {}


def test_banded_interval_join_equals_direct(spark):
    """clicks_before_purchase_banded is a PLAN variant: identical relation
    to the direct inequality-join formulation on the same input."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators import analytics as an
    from tests.conftest import SF_SMOKE

    events = load_tables(spark, SF_SMOKE, register=False)["events"]
    direct = {(r["purchase_id"], r["user_id"], r["clicks_1h_before"])
              for r in an.clicks_before_purchase(events).collect()}
    banded = {(r["purchase_id"], r["user_id"], r["clicks_1h_before"])
              for r in an.clicks_before_purchase_banded(events).collect()}
    assert banded == direct and direct


def test_semdedup_drop_rule_properties(spark):
    """Deterministic SemDeDup drop rule: the lowest vec_id in every cell is
    never dropped, and every dropped vector has a lower-id same-cell
    witness with q6-cosine >= threshold."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators import similarity as sim
    from tests.conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, register=False)["embeddings"]
    rows = sim.semdedup_drop(emb).collect()
    by_cell: dict = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    assert sum(r["dropped"] for r in rows) > 0  # threshold actually bites
    for cell, members in by_cell.items():
        keeper = min(m["vec_id"] for m in members)
        assert not [m for m in members if m["vec_id"] == keeper][0]["dropped"]


def test_gap_fill_daily_forward_fill(spark):
    """Crafted frame: a 3-day hole carries the last observed day_value
    forward, flags the gap days, and the spine covers exactly
    [first_day, last_day]."""
    from pyspark.sql import functions as F

    from flink_streaming_etl_spark.operators import windows as wn

    events = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 7, "click", 10.0, "{}"),
            (2, "2024-01-01 11:00:00", 7, "click", 5.0, "{}"),
            (3, "2024-01-05 09:00:00", 7, "view", 2.5, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    rows = {r["day"]: r for r in wn.gap_fill_daily(events).collect()}
    assert sorted(rows) == [f"2024-01-0{d}" for d in range(1, 6)]
    assert rows["2024-01-01"]["n_events"] == 2 and rows["2024-01-01"]["is_gap"] == 0
    assert rows["2024-01-01"]["day_value"] == 15.0
    for d in ("2024-01-02", "2024-01-03", "2024-01-04"):
        assert rows[d]["is_gap"] == 1 and rows[d]["n_events"] == 0
        assert rows[d]["day_value"] is None and rows[d]["filled_value"] == 15.0
    assert rows["2024-01-05"]["filled_value"] == 2.5


def test_key_skew_report_crafted(spark):
    """10 keys with 1 row each + 1 hot key with 90 rows: exact percentile,
    share, and hottest-key fields."""
    from flink_streaming_etl_spark.operators import analytics as an

    rows = [(i, "2024-01-01 00:00:00", 100 + i, "click", 1.0, "{}") for i in range(10)]
    rows += [(100 + j, "2024-01-01 00:00:00", 999, "click", 1.0, "{}") for j in range(90)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    )
    r = an.key_skew_report(events).collect()[0]
    assert r["n_keys"] == 11 and r["n_rows"] == 100 and r["max_rows"] == 90
    assert r["hottest_key"] == 999
    assert r["p50_rows"] == 1 and r["p99_rows"] == 90
    assert r["max_share_ppm"] == 900000


def test_unigram_logprob_known_values(spark):
    """Hand-computed MLE: corpus = 'aa aa bb' + 'aa' → p(aa)=3/4, p(bb)=1/4;
    doc 1 mean = (2·ln .75 + ln .25)/3, doc 2 mean = ln .75."""
    import math

    from flink_streaming_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "aa aa bb", "en", "s", 8), (2, "aa", "en", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {r["doc_id"]: r for r in tx.unigram_logprob_score(docs).collect()}
    exp1 = (2 * math.log(0.75) + math.log(0.25)) / 3
    assert abs(got[1]["avg_logprob"] - round(exp1, 4)) < 1e-9
    assert abs(got[2]["avg_logprob"] - round(math.log(0.75), 4)) < 1e-9
    assert got[1]["n_scored_tokens"] == 3 and got[2]["n_scored_tokens"] == 1
    assert got[2]["is_fluent"] == 1  # ln .75 ≈ -0.29 >= -5.0


def test_tokenizer_fertility_exact(spark):
    """'ab cd' → 2 whitespace tokens, 2 BPE pre-tokens, 5 chars."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "ab cd", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = tx.tokenizer_fertility(docs).collect()[0]
    assert r["ws_tokens"] == 2 and r["bpe_tokens"] == 2
    assert r["fertility"] == 1.0 and r["chars_per_bpe_token"] == 2.5


def test_residual_codebook_self_encoding(spark):
    """Every pinned codebook vector's residual must PQ-encode to its own
    code index in every subspace (distance exactly 0 to itself)."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators import similarity as sim
    from tests.conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, register=False)["embeddings"]
    cb_lo = sim.N_QUERIES + sim.N_CENTROIDS
    rows = (
        sim.pq_encode_residual(emb)
        .filter(f"vec_id >= {cb_lo} AND vec_id < {cb_lo + sim.PQ_RESIDUAL_CODES}")
        .collect()
    )
    assert len(rows) == sim.PQ_RESIDUAL_CODES
    for r in rows:
        expect = r["vec_id"] - cb_lo
        for s in range(sim.PQ_M):
            assert r[f"code_{s}"] == expect, (r["vec_id"], s)


def test_multiprobe_recall_dominates_single_probe(spark):
    """n_flip extra probes can only ADD candidates: hits vs the exact
    top-k must be >= the single-bucket (n_flip=0) hits, per query."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators import similarity as sim
    from tests.conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, register=False)["embeddings"]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(emb).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ann_lsh_multiprobe(emb, n_flip=0).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ann_lsh_multiprobe(emb).collect()
    }
    assert len(multi & exact) >= len(single & exact)
    # and the multiprobe candidate set is a strict superset scenario:
    # every single-probe result neighbor must still be reachable
    assert {q for q, _ in single} <= {q for q, _ in multi} or not single


def test_dsir_weights_target_docs_score_higher(spark):
    """Construct a corpus where the target source has a distinctive token
    distribution: target documents must receive a higher average log-ratio
    than raw documents, and every returned score must be finite."""
    from flink_streaming_etl_spark.operators import text as tx

    rows = (
        [(i, "alpha beta alpha beta gamma", "en", "tgt", 27) for i in range(20)]
        + [(i + 100, "zeta eta theta iota kappa", "en", "raw", 25) for i in range(20)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = {r["doc_id"]: r for r in tx.dsir_importance_weights(docs, target_source="tgt").collect()}
    tgt = [out[i]["avg_log_ratio"] for i in range(20)]
    raw = [out[i + 100]["avg_log_ratio"] for i in range(20)]
    assert min(tgt) > max(raw)
    assert all(out[k]["is_target_like"] in (0, 1) for k in out)
    # identical text within a side → identical score (pure projection)
    assert len(set(tgt)) == 1 and len(set(raw)) == 1


def test_source_kl_report_uniform_source_near_zero(spark):
    """A source whose token distribution matches the corpus marginal has
    KL ≈ 0; a disjoint-vocabulary source has strictly larger KL."""
    from flink_streaming_etl_spark.operators import text as tx

    same = [(i, "a b c d", "en", f"s{i % 2}", 7) for i in range(40)]
    diff = [(100 + i, "qq rr ss tt", "en", "weird", 11) for i in range(10)]
    docs = spark.createDataFrame(
        same + diff, "doc_id long, text string, lang string, source string, n_chars long"
    )
    kl = {r["source"]: r["kl_divergence"] for r in tx.source_kl_report(docs).collect()}
    assert kl["weird"] > kl["s0"] and kl["weird"] > kl["s1"]
    # s0/s1 share the corpus-dominant distribution: small but nonnegative-ish
    assert abs(kl["s0"] - kl["s1"]) < 1e-9


def test_time_decay_engagement_monotone_in_recency(spark):
    """Same value, fresher event → strictly larger contribution; totals are
    exact integer micro-units."""
    from flink_streaming_etl_spark.operators import analytics as an

    rows = [
        (1, "2024-01-10 00:00:00", 1, "click", 10.0, "{}"),
        (2, "2024-01-01 00:00:00", 2, "click", 10.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["user_id"]: r for r in an.time_decay_engagement(ev).collect()}
    # ref date = 2024-01-10 → user 1 age 0 (full 10.0), user 2 age 9 (10/10)
    assert out[1]["engagement_micro"] == 10_000_000
    assert out[2]["engagement_micro"] == 1_000_000
    assert out[1]["engagement"] == 10.0 and out[2]["engagement"] == 1.0


def test_knn_graph_ranks_and_bucket_locality(spark):
    """Every vector gets ≤ k neighbors, ranks are 1..k without gaps, and
    each (vec, neighbor) pair shares a sign-LSH bucket by construction."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _load(spark, "embeddings")
    out = sim.knn_graph(emb, k=3).collect()
    by_vec: dict[int, list] = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], []).append(r)
    for vid, rows in by_vec.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["neighbor_id"] != vid for r in rows)


def test_cross_source_dup_matrix_accounts_every_pair(spark):
    """Matrix pair counts sum to the verified LSH pair-relation size, and
    src_a ≤ src_b in every row."""
    from flink_streaming_etl_spark.operators import dedup as dd

    docs = _load(spark, "documents")
    pairs_n = dd.minhash_lsh_pairs(docs).count()
    m = dd.cross_source_dup_matrix(docs).collect()
    assert sum(r["n_pairs"] for r in m) == pairs_n
    assert all(r["src_a"] <= r["src_b"] for r in m)
    assert all(0.0 <= r["mean_jaccard"] <= 1.0 for r in m)


def test_perplexity_buckets_shares_and_partition(spark):
    """Per-lang shares sum to 1 (q6 rounding aside), every bucket label is
    one of head/middle/tail, and doc counts per lang match the corpus."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = _load(spark, "documents")
    out = tx.perplexity_buckets(docs).collect()
    assert {r["bucket"] for r in out} <= {"head", "middle", "tail"}
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    n_by_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, rows in by_lang.items():
        assert sum(r["n_docs"] for r in rows) == n_by_lang[lang]
        assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4


def test_filtered_ann_respects_label_predicate(spark):
    """Every returned neighbor carries the query's label; ranks contiguous
    from 1; cosine non-increasing within a query."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _load(spark, "embeddings")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    out = sim.filtered_ann(emb, k=4).collect()
    by_q: dict[int, list] = {}
    for r in out:
        assert labels[r["neighbor_id"]] == labels[r["query_id"]] == r["label"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        cs = [r["cosine"] for r in rows]
        assert cs == sorted(cs, reverse=True)


def test_entropy_filter_known_values(spark):
    """'aaaa' → 0 bits; 'abab' → 1 bit; 'abcd' → 2 bits."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "aaaa", "en", "s", 4), (2, "abab", "en", "s", 4), (3, "abcd", "en", "s", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in tx.entropy_filter(docs).collect()}
    assert out[1]["char_entropy"] == 0.0 and out[1]["is_low_entropy"] == 1
    assert out[2]["char_entropy"] == 1.0 and out[2]["is_low_entropy"] == 1
    assert out[3]["char_entropy"] == 2.0 and out[3]["is_low_entropy"] == 0


def test_ann_int8_topk_agrees_with_exact_on_separated_corpus(spark):
    """Quantized integer-dot ranking must keep ranks contiguous and, on
    the well-separated test corpus, overlap the exact cosine top-k
    substantially (SQ8 is a rescoring-free approximation, not exact)."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _load(spark, "embeddings")
    got = sim.ann_int8_topk(emb, k=5).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r)
    exact = {(r["query_id"], r["neighbor_id"]) for r in sim.cosine_topk(emb, k=5).collect()}
    overlap = sum(1 for r in got if (r["query_id"], r["neighbor_id"]) in exact)
    for q, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
    assert overlap >= len(got) * 0.5, f"{overlap}/{len(got)}"


def test_pack_sequences_ffd_capacity_determinism_and_waste(spark):
    """FFD invariants: no bin exceeds seq_len (except single oversized
    docs, which sit alone), the assignment is identical under different
    input partitioning, and total padding waste is no worse than the
    concat-and-chunk packer's bin count on the same corpus."""
    import math

    from flink_streaming_etl_spark.operators import text as tx

    docs = _load(spark, "documents")
    cap = tx.PACK_SEQ_LEN
    out = tx.pack_sequences_ffd(docs).collect()
    by_bin: dict[tuple, list] = {}
    for r in out:
        by_bin.setdefault((r["lang"], r["shard"], r["bin_id"]), []).append(r)
    for key, rows in by_bin.items():
        fill = sum(r["n_tokens"] for r in rows)
        assert fill == rows[0]["bin_fill"], key
        if len(rows) > 1:
            assert fill <= cap, (key, fill)
    # determinism under repartitioning
    out2 = tx.pack_sequences_ffd(docs.repartition(7)).collect()
    key = lambda r: (r["doc_id"], r["bin_id"], r["bin_fill"])  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, out2))
    # FFD bins must not exceed what chunking (which splits docs!) would
    # produce by more than the no-split overhead bound: bins <= 2x optimal
    # lower bound (classic FFD guarantee is 11/9 OPT + 1 per group).
    total_tokens = sum(r["n_tokens"] for r in out)
    n_bins = len(by_bin)
    lower_bound = math.ceil(total_tokens / cap)
    assert n_bins <= 2 * lower_bound + len({(r["lang"], r["shard"]) for r in out})


def test_containment_invariants_and_subset_flag(spark):
    """Containment ≥ Jaccard on every scored pair (A∩B/|A| ≥ A∩B/|A∪B|),
    both containments in (0, 1], and the subset flag fires exactly when
    either direction reaches 0.9. A doc whose shingle set embeds another's
    (text repeated twice: same bigram set + one boundary bigram) must
    score containment_a = 1 while jaccard < 1."""
    from flink_streaming_etl_spark.operators import dedup as dd

    docs = _load(spark, "documents")
    rows = dd.containment_pairs(docs).collect()
    assert rows, "no verified pairs to score"
    for r in rows:
        assert r["containment_a"] >= r["jaccard"] - 1e-9
        assert r["containment_b"] >= r["jaccard"] - 1e-9
        assert 0 < r["containment_a"] <= 1 and 0 < r["containment_b"] <= 1
        assert r["is_subset"] == int(
            r["containment_a"] >= 0.9 or r["containment_b"] >= 0.9
        )
    short = "alpha beta gamma delta epsilon zeta"
    crafted = spark.createDataFrame(
        [(1, short, "en", "s", 1), (2, short + " " + short, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = dd.containment_pairs(crafted, threshold=0.5).collect()
    if out:  # LSH banding is probabilistic for non-identical sets
        r = out[0]
        assert r["containment_a"] == 1.0
        assert r["jaccard"] < 1.0
        assert r["is_subset"] == 1


def test_dedup_stats_report_consistency(spark):
    """Dashboard numbers must agree with the relations they summarize."""
    from flink_streaming_etl_spark.operators import dedup as dd

    docs = _load(spark, "documents")
    r = dd.dedup_stats_report(docs).collect()[0]
    assert r["n_docs"] == docs.count()
    assert r["n_neardup_pairs"] == dd.minhash_lsh_pairs(docs).count()
    assert r["n_dropped"] == dd.neardup_drop_list(docs).count()
    assert r["n_survivors"] == r["n_docs"] - r["n_dropped"]
    assert 0.0 <= r["survivor_rate"] <= 1.0


def test_train_val_test_split_deterministic_and_complete(spark):
    """Split counts must cover every document, be stable across calls and
    partitioning, and land near the 80/10/10 target."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = _load(spark, "documents")
    a = {(r["lang"], r["split"]): (r["n_docs"], r["n_tokens"])
         for r in tx.train_val_test_split(docs).collect()}
    b = {(r["lang"], r["split"]): (r["n_docs"], r["n_tokens"])
         for r in tx.train_val_test_split(docs.repartition(7)).collect()}
    assert a == b
    total = sum(v[0] for v in a.values())
    assert total == docs.count()
    train = sum(v[0] for k, v in a.items() if k[1] == "train")
    assert 0.6 <= train / total <= 0.95


def test_bigram_logprob_orders_scrambled_below_natural(spark):
    """A corpus of repeated natural phrases vs one scrambled doc: the
    scrambled doc's conditional bigram logprob must be lower."""
    from flink_streaming_etl_spark.operators import text as tx

    natural = "the quick brown fox jumps over the lazy dog"
    rows = [(i, natural, "en", "s", 1) for i in range(20)]
    rows.append((100, "dog the over quick lazy brown jumps fox the", "en", "s", 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: r["avg_bigram_logprob"] for r in tx.bigram_logprob_score(docs).collect()}
    assert out[100] < out[0]
