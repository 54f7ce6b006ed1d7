"""Round-7 additions: TPC-H shape plan contracts + behavior invariants
for the new training-pipeline operators. Value correctness is covered by
tests/test_oracle_parity.py (every oracle entry, every run)."""

from __future__ import annotations

from tests.test_plans import _tables, plan_of


def test_round7_tpch_plan_shapes(spark):
    from flink_streaming_etl_spark.operators import analytics as an

    t = _tables(spark)
    # Q7: supplier + corridor-filtered nation dims broadcast; ship-date
    # range pushed to the lineitem scan; no cartesian anywhere.
    p = plan_of(
        an.nation_trade_volume(
            t["lineitem"], t["orders"], t["customer"], t["supplier"], t["nation"]
        )
    )
    assert "BroadcastHashJoin" in p, p
    assert "GreaterThanOrEqual(l_shipdate" in p, p
    assert "CartesianProduct" not in p, p
    # Q19: the quantity envelope must reach the parquet scan as pushed
    # min/max filters (raw double compares — a decimal cast would block
    # pushdown); part is broadcast, never sort-merge.
    p = plan_of(an.disjunctive_promo_revenue(t["lineitem"], t["part"]))
    assert "GreaterThanOrEqual(l_quantity" in p, p
    assert "LessThanOrEqual(l_quantity" in p, p
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p, p
    # Q22: NOT EXISTS decorrelates to a left-anti equi join.
    p = plan_of(an.idle_rich_customers(t["customer"], t["orders"]))
    assert "LeftAnti" in p, p
    # Q15: "= max" via broadcast scalar — no window over the fact side.
    p = plan_of(an.top_supplier_revenue(t["lineitem"], t["supplier"]))
    assert "Window" not in p, p
    assert p.count("HashAggregate") >= 4, p  # partial+final on both aggs
    # Q16: NOT IN (negative-balance suppliers) as a broadcast anti join.
    p = plan_of(an.part_supplier_variety(t["lineitem"], t["part"], t["supplier"]))
    assert "LeftAnti" in p, p
    assert "CartesianProduct" not in p, p
    # Q21: the exists/not-exists pair decorrelates to orderkey-keyed
    # aggregations — no correlated re-scan, no nested-loop pair blowup.
    p = plan_of(
        an.waiting_orders_suppliers(t["orders"], t["lineitem"], t["supplier"])
    )
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p
    # Q20: semi join into the part filter, exact-integer dominance test.
    p = plan_of(
        an.dominant_part_suppliers(t["lineitem"], t["part"], t["supplier"])
    )
    assert "LeftSemi" in p, p
    assert "CartesianProduct" not in p, p


def test_round7_text_plan_shapes(spark):
    from flink_streaming_etl_spark.operators import text as tx

    t = _tables(spark)
    # lang_confidence: pure per-row codegen — no join/agg/key exchange.
    p = plan_of(tx.lang_confidence(t["documents"]))
    assert "Join" not in p and "HashAggregate" not in p, p
    assert "hashpartitioning" not in p, p
    # prefix_dup_drop: one prefix-keyed agg + one equi join, no pairs.
    p = plan_of(tx.prefix_dup_drop(t["documents"]))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_token_budget_plan_invariants(spark):
    from flink_streaming_etl_spark.operators import text as tx

    docs = _tables(spark)["documents"]
    rows = tx.token_budget_plan(docs, budget=100_000, max_epochs=4.0).collect()
    assert rows
    total_planned = sum(r["planned_tokens"] for r in rows)
    assert total_planned <= 100_000 + 1e-6  # Σ min(B·p, cap) ≤ B·Σp = B
    for r in rows:
        assert r["epochs"] <= 4.0 + 1e-9, r
        assert 0.0 <= r["mix_p"] <= 1.0, r


def test_prefix_dup_drop_keeps_min_doc(spark):
    from flink_streaming_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "Terms of   service apply to all users of this site " + "x" * 40, "en", "a", 90),
            (5, "terms of service APPLY to all users of this site " + "x" * 40, "en", "b", 90),
            (9, "terms of service apply to all users of this site " + "x" * 40, "en", "c", 90),
            (3, "a completely different document body with its own words", "en", "a", 55),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = tx.prefix_dup_drop(docs).collect()
    dropped = {r["doc_id"] for r in out}
    assert dropped == {5, 9}
    assert all(r["kept_doc_id"] == 1 for r in out)


def test_lang_confidence_consistent_with_lang_id(spark):
    from flink_streaming_etl_spark.operators import text as tx

    docs = _tables(spark)["documents"]
    conf = {r["doc_id"]: r for r in tx.lang_confidence(docs).collect()}
    pred = {r["doc_id"]: r["predicted_lang"] for r in tx.lang_id(docs).collect()}
    assert set(conf) == set(pred)
    for d, r in conf.items():
        assert r["predicted_lang"] == pred[d]
        assert r["margin"] >= 0
        assert 0.0 <= r["confidence"] < 1.0


def test_shards_for_corpus_dial():
    from flink_streaming_etl_spark.operators import text as tx

    # floor at the static default for small corpora
    assert tx.shards_for_corpus(0) == tx.PACK_FFD_SHARDS
    assert tx.shards_for_corpus(500) == tx.PACK_FFD_SHARDS
    # linear growth: group size stays ~constant as the corpus grows
    n = 10_000_000
    shards = tx.shards_for_corpus(n)
    assert n / shards <= tx.PACK_FFD_TARGET_GROUP_ROWS
    assert tx.shards_for_corpus(10 * n) >= 9 * shards  # ~linear in n


def test_heaps_beta_in_natural_range(spark):
    from flink_streaming_etl_spark.operators import text as tx

    rows = tx.heaps_law_report(_tables(spark)["documents"]).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["heaps_beta"] < 1.0, r


def test_sq8_constant_dim_decodes_exactly(spark):
    """A constant dimension must reconstruct to its exact value (mn), not
    mn + 0.5 — the r7 ADVICE fix. With dim2 constant at 0.0 and dim1
    positive, every pair is exactly collinear, so cosine_sq8 must be
    exactly 1.0; the old +0.5 decode injected a fake dim2 component that
    pulled cosines below 1."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(i, [float(i + 1), 0.0], i % 2) for i in range(40)],
        "vec_id long, embedding array<float>, label int",
    )
    got = sim.ann_int8_topk(emb, k=3, n_queries=5).collect()
    assert got
    for r in got:
        assert r["cosine_sq8"] == 1.0, r


def test_ann_hamming_matches_sign_agreement(spark):
    """Hamming distance over packed sign codes must equal the direct
    count of sign disagreements, and identical vectors must rank first."""
    from flink_streaming_etl_spark.operators import similarity as sim

    rows = []
    base = [1.0 if (i * 7) % 3 else -1.0 for i in range(64)]
    rows.append((0, base, 0))
    rows.append((1, base, 0))                      # identical signs → ham 0
    flip3 = list(base); flip3[5], flip3[17], flip3[40] = -flip3[5], -flip3[17], -flip3[40]
    rows.append((2, flip3, 0))                     # exactly 3 disagreements
    rows.append((3, [-x for x in base], 0))        # all 64 flipped
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    got = {(r["query_id"], r["neighbor_id"]): r["hamming"]
           for r in sim.ann_hamming_topk(emb, k=3, n_queries=1).collect()}
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == 3
    assert got[(0, 3)] == 64


def test_bpe_first_merges_known_corpus(spark):
    """'aaab aaab ab' → pair 'aa' count 4 (2 per 'aaab' x freq 2),
    'ab' count 3 (one per word occurrence)."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab", "en", "s", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["pair"]: r["n"] for r in tx.bpe_first_merges(docs, k=5).collect()}
    assert out == {"aa": 4, "ab": 3}


def test_hashed_bow_sparse_weights_are_tf_sums(spark):
    """Total weight mass equals the corpus token count; buckets in [0, D)."""
    from pyspark.sql import functions as F

    from flink_streaming_etl_spark.operators import text as tx

    docs = _tables(spark)["documents"]
    sp = tx.hashed_bow_sparse(docs)
    agg = sp.agg(F.sum("weight").alias("w"), F.max("bucket").alias("mx"),
                 F.min("bucket").alias("mn")).collect()[0]
    n_tokens = (
        docs.select(F.explode(F.filter(F.split(F.lower("text"), "[^a-z]+"),
                                       lambda t: t != "")).alias("t")).count()
    )
    assert agg["w"] == n_tokens
    assert 0 <= agg["mn"] and agg["mx"] < tx.HASHED_BOW_DIM


def test_media_chunk_dedup_shared_chunks_and_hot_cap(spark):
    """Docs sharing aligned 64-byte chunks pair with the exact shared
    count; a chunk owned by more than owner_cap media (container
    boilerplate) must not create pairs."""
    from flink_streaming_etl_spark.operators import multimodal as mm

    c1, c2, c3, c4 = ("A" * 64, "B" * 64, "C" * 64, "D" * 64)
    rows = [
        (1, c1 + c2 + c3),        # shares c1+c2 with doc 2 → pair (1,2)=2
        (2, c1 + c2 + c4),
        (3, c3 + c4),             # shares only 1 chunk with each → no pair
    ]
    hot = "H" * 64               # owned by 4 docs > owner_cap=3 → excluded
    rows += [(10 + i, hot + chr(69 + i) * 64) for i in range(4)]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {(r["a_id"], r["b_id"]): r["shared_chunks"]
           for r in mm.media_chunk_dedup(docs, owner_cap=3).collect()}
    assert got == {(1, 2): 2}


def test_pmi_top_pairs_known_cooccurrence(spark):
    """alpha+beta always co-occur (df12=df1=df2=6, N=8): PMI=ln(8/6);
    gamma co-occurs with alpha in 5 of alpha's 6 docs: lower PMI."""
    import math

    from flink_streaming_etl_spark.operators import text as tx

    rows = [(i, "alpha beta" + (" gamma" if i < 5 else "")) for i in range(6)]
    rows += [(6, "gamma delta"), (7, "delta epsilon")]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {(r["t1"], r["t2"]): r for r in tx.pmi_top_pairs(docs, min_pair_df=5).collect()}
    ab = out[("alpha", "beta")]
    assert ab["df12"] == 6
    assert abs(ab["pmi"] - round(math.log(8 * 6 / 36), 4)) < 1e-9
    assert ab["rank"] == 1
    ag = out[("alpha", "gamma")]
    assert ag["df12"] == 5
    assert ag["pmi"] < ab["pmi"]


def test_bigram_entropy_fully_deterministic_corpus(spark):
    """'a b a b a b': every w1 determines w2, so H(W2|W1)=0, H(W)=ln 2,
    and the mutual-information gap equals the full unigram entropy."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(1, "a b a b a b", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = tx.bigram_entropy_report(docs).collect()[0]
    assert r["n_tokens"] == 6 and r["n_bigrams"] == 5
    assert r["h_cond_nats"] == 0.0
    assert r["h_unigram_nats"] == 0.6931
    assert r["mutual_info_nats"] == 0.6931


def test_anomaly_zscore_flags_spike_only(spark):
    """Flat history then one spike: the first 7 days have no window
    (zscore null), steady days z=0, and only the spike is flagged."""
    import datetime as dt

    from flink_streaming_etl_spark.operators import analytics as an

    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(12):
        v = 1000.0 if d == 10 else 5.0 + (d % 2)  # alternating 5/6, spike d10
        rows.append((d, base + dt.timedelta(days=d), 1, "click", v, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["day"]: r for r in an.anomaly_zscore_daily(ev).collect()}
    assert len(out) == 12
    for d in range(7):  # incomplete trailing window → unscored
        assert out[f"2024-01-{d + 1:02d}"]["zscore"] is None
    assert out["2024-01-11"]["is_anomaly"] == 1      # the spike
    assert out["2024-01-09"]["is_anomaly"] == 0      # steady day
    flagged = [d for d, r in out.items() if r["is_anomaly"] == 1]
    # the day after the spike isn't flagged: the spike inflates both the
    # trailing mean and the trailing stddev, shrinking |z| below threshold
    assert flagged == ["2024-01-11"]


def test_winnow_guarantee_shared_substring_detected(spark):
    """Winnowing's core guarantee (Schleimer et al.): any shared substring
    of length >= w + k - 1 yields at least one shared fingerprint — even
    when the copy is SHIFTED, which breaks fixed-boundary chunking."""
    from flink_streaming_etl_spark.operators import text as tx

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, "AAA " + shared + " tail one", "en", "s", 80),
            (2, "a totally different and much longer preamble here " + shared, "en", "s", 120),
            (3, "nothing in common with either of those two documents at all", "en", "s", 60),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    fps = tx.winnow_fingerprints(docs).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shifted shared substring must share a fingerprint"
    pairs = {(r["a_id"], r["b_id"]): r["shared_fps"]
             for r in tx.winnow_dup_pairs(docs, min_shared=2).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnow_density_bound(spark):
    """Selected fingerprints are a subset of windows: count <= number of
    k-gram positions, and every selected pos is a real k-gram start."""
    from pyspark.sql import functions as F

    from flink_streaming_etl_spark.operators import text as tx

    docs = _tables(spark)["documents"]
    fps = tx.winnow_fingerprints(docs)
    norm = docs.select(
        "doc_id",
        F.length(F.regexp_replace(F.lower("text"), "[^a-z]", "")).alias("nlen"),
    )
    joined = (
        fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fp"),
                                  F.max("pos").alias("max_pos"))
        .join(norm, "doc_id")
    ).collect()
    assert joined
    for r in joined:
        n_positions = r["nlen"] - tx.WINNOW_K + 1
        assert r["n_fp"] <= n_positions, r
        assert r["max_pos"] <= n_positions, r


def test_tfidf_cosine_identical_docs_score_one(spark):
    """Two token-identical docs have cosine exactly 1.0 in the capped
    space; the ubiquitous term (df > cap) is excluded from vectors."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "common alpha beta gamma alpha", "en", "s", 30),
            (2, "common alpha beta gamma alpha", "en", "s", 30),
            (3, "common delta epsilon zeta", "en", "s", 26),
            (4, "common unrelated words here", "en", "s", 28),
            (5, "common more filler text", "en", "s", 24),
            (6, "common yet another doc", "en", "s", 23),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # 'common' has df=6 > cap=floor(0.5*6)=3 → dropped from every vector
    out = {(r["a_id"], r["b_id"]): r["cosine"]
           for r in tx.tfidf_cosine_pairs(docs, df_frac_cap=0.5, threshold=0.1).collect()}
    assert out[(1, 2)] == 1.0
    assert all(k == (1, 2) for k in out), out


def test_zipf_fit_on_corpus_is_negative_slope(spark):
    from flink_streaming_etl_spark.operators import text as tx

    r = tx.zipf_fit_report(_tables(spark)["documents"]).collect()[0]
    assert r["zipf_slope"] < 0, r
    assert 0.0 < r["r_squared"] <= 1.0, r
    assert r["n_ranks"] <= tx.ZIPF_TOP_R


def test_doclen_percentiles_nearest_rank(spark):
    """10 docs of 1..10 tokens: nearest-rank p25=value@3, p50=@5, p75=@8,
    p95=@10 of the sorted order."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * i), "en", "s", 2 * i) for i in range(1, 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = tx.doclen_percentile_report(docs).collect()[0]
    assert (r["p25_tokens"], r["p50_tokens"], r["p75_tokens"], r["p95_tokens"]) == (3, 5, 8, 10)
    assert r["n_docs"] == 10
    assert r["mean_tokens"] == 5.5


def test_embedding_covariance_matches_numpy(spark):
    """The distributed integer-Gram covariance must equal numpy's
    covariance of the quantized vectors to ~1e-12 (exact sums, one
    closed-form double expression)."""
    import numpy as np

    from flink_streaming_etl_spark.operators import similarity as sim
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    got = {(r["dim_i"], r["dim_j"]): r["cov"]
           for r in sim.embedding_covariance(emb).collect()}
    x = np.vstack(emb.toPandas()["embedding"].to_numpy()).astype(np.float64)
    xq = np.sign(x * sim.COV_QUANT) * np.floor(np.abs(x * sim.COV_QUANT) + 0.5)
    ref = np.cov(xq, rowvar=False) / (sim.COV_QUANT**2)
    d = x.shape[1]
    assert len(got) == d * (d + 1) // 2
    for (i, j), v in got.items():
        assert abs(v - ref[i, j]) < 1e-10, (i, j, v, ref[i, j])


def test_pca_top_component_matches_eigh(spark):
    """Power iteration on the collected covariance must agree with
    numpy.linalg.eigh: same top eigenvalue, |loading| within 1e-5."""
    import numpy as np

    from flink_streaming_etl_spark.operators import similarity as sim
    from tests.conftest import SF_SMOKE

    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    rows = sim.pca_top_component(emb).collect()
    d = len(rows)
    v = np.zeros(d)
    for r in rows:
        v[r["dim"]] = r["loading"]
    cov = {(r["dim_i"], r["dim_j"]): r["cov"]
           for r in sim.embedding_covariance(emb).collect()}
    c = np.zeros((d, d))
    for (i, j), val in cov.items():
        c[i, j] = c[j, i] = val
    w, vecs = np.linalg.eigh(c)
    top = vecs[:, -1]
    if top[int(np.argmax(np.abs(top)))] < 0:
        top = -top
    assert abs(rows[0]["eigenvalue"] - w[-1]) < 1e-8
    assert float(np.abs(np.dot(v, top))) > 1 - 1e-5
    assert all(0.0 < r["explained_ratio"] <= 1.0 for r in rows)


def test_media_simhash_finds_small_byte_edit(spark):
    """A payload with one small mid-stream edit keeps a near-identical
    SimHash (found as a pair); unrelated payloads do not pair."""
    from flink_streaming_etl_spark.operators import multimodal as mm

    base = ("the same media byte stream content repeated " * 20).strip()
    edited = base[:300] + "X" + base[301:]  # single-byte substitution
    docs = spark.createDataFrame(
        [
            (1, base, "en", "s", len(base)),
            (2, edited, "en", "s", len(edited)),
            (3, "completely different payload bytes " * 25, "en", "s", 875),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    pairs = {(r["a_id"], r["b_id"]): r["hamming"]
             for r in mm.media_simhash_pairs(docs, max_hamming=5).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)] <= 5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_tokenizer_vocab_coverage_full_and_partial(spark):
    """vocab_k big enough → coverage 1.0 / zero OOV; vocab_k=1 → only the
    most frequent term is covered."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            (1, "aa aa aa bb", "en", "s", 11),
            (2, "aa bb cc", "en", "s", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    full = tx.tokenizer_vocab_coverage(docs, vocab_k=10).collect()[0]
    assert full["coverage"] == 1.0 and full["oov_terms"] == 0
    one = tx.tokenizer_vocab_coverage(docs, vocab_k=1).collect()[0]
    # 'aa' covers 4 of 7 occurrences; bb + cc are OOV
    assert one["n_tokens"] == 7
    assert one["covered_tokens"] == 4
    assert one["oov_terms"] == 2
    assert one["oov_rate"] == round(3 / 7, 4)


def test_embedding_norm_report_exact_percentiles(spark):
    """Unit vectors → p50_norm 1.0 exactly (integer quantization of
    axis-aligned unit vectors is exact); a zero vector drags min to 0."""
    from flink_streaming_etl_spark.operators import similarity as sim

    rows = [(i, [1.0 if j == i % 4 else 0.0 for j in range(4)], 0) for i in range(9)]
    rows.append((9, [0.0, 0.0, 0.0, 0.0], 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    r = sim.embedding_norm_report(emb).collect()[0]
    q2 = int(sim.COV_QUANT) ** 2
    assert r["n_vectors"] == 10
    assert r["min_normsq"] == 0
    assert r["max_normsq"] == q2
    assert r["p50_normsq"] == q2  # rank ceil(0.5*10)=5 of [0, q2 x9] = q2
    assert r["p50_norm"] == 1.0


def test_round7_new_op_plan_shapes(spark):
    """Scale-critical plan contracts for the wave 4-6 operators: pair
    generation is always an equi-join (never cartesian / nested-loop),
    small relations broadcast, per-doc windows are keyed."""
    from flink_streaming_etl_spark.operators import multimodal as mm
    from flink_streaming_etl_spark.operators import similarity as sim
    from flink_streaming_etl_spark.operators import text as tx

    t = _tables(spark)
    docs, emb = t["documents"], t["embeddings"]
    for df in (
        tx.winnow_fingerprints(docs),
        tx.winnow_dup_pairs(docs),
        tx.tfidf_cosine_pairs(docs),
        mm.media_chunk_dedup(docs),
        mm.media_simhash_pairs(docs),
        tx.pmi_top_pairs(docs),
    ):
        p = plan_of(df)
        assert "CartesianProduct" not in p, p
        assert "BroadcastNestedLoopJoin" not in p, p
    # pmi: the top-V vocabulary must broadcast into the posting restriction
    p = plan_of(tx.pmi_top_pairs(docs))
    assert "BroadcastHashJoin" in p, p
    # winnowing window is doc_id-keyed — never a global single-partition sort
    p = plan_of(tx.winnow_fingerprints(docs))
    assert "hashpartitioning(doc_id" in p, p
    # covariance assembly: marginals broadcast into the d^2-bounded join
    p = plan_of(sim.embedding_covariance(emb))
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p, p
    # norm report / length percentiles: label- and source-keyed windows
    p = plan_of(sim.embedding_norm_report(emb))
    assert "hashpartitioning(label" in p, p
    p = plan_of(tx.doclen_percentile_report(docs))
    assert "hashpartitioning(source" in p, p


def test_bpe_train_merges_sennrich_example(spark):
    """Sennrich et al.'s worked example: vocabulary {low:5, lower:2,
    newest:6, widest:3}. First merges: (e,s)->es 9, (es,t)->est 9,
    (l,o)->lo 7, (lo,w)->low 7 ... deterministic given the count-desc /
    pair-lexicographic tie-break."""
    from flink_streaming_etl_spark.operators import text as tx

    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    docs = spark.createDataFrame(
        [(1, " ".join(words), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = [(r["rank"], r["left"], r["right"], r["n"])
           for r in tx.bpe_train_merges(docs, n_merges=4).collect()]
    assert got[0] == (1, "e", "s", 9)
    assert got[1] == (2, "es", "t", 9)
    assert got[2] == (3, "l", "o", 7)
    assert got[3] == (4, "lo", "w", 7)


def test_bpe_train_first_round_equals_first_merges(spark):
    """Round 1 of the iterative trainer must pick exactly the top pair
    bpe_first_merges reports (same counts, same tie-break)."""
    from flink_streaming_etl_spark.operators import text as tx
    from tests.conftest import SF_SMOKE

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    first = tx.bpe_first_merges(docs, k=1).collect()[0]
    trained = tx.bpe_train_merges(docs, n_merges=1).collect()[0]
    assert trained["left"] + trained["right"] == first["pair"]
    assert trained["n"] == first["n"]


def test_event_rollup_gid_levels(spark):
    """gid 0 = detail, 1 = per-type subtotal, 3 = grand total; the grand
    total must equal the sum of subtotals which must equal the detail."""
    from flink_streaming_etl_spark.operators import analytics as an
    from tests.conftest import SF_SMOKE

    from flink_streaming_etl_spark.catalog import load_tables

    ev = load_tables(spark, SF_SMOKE, register=False)["events"]
    rows = an.event_rollup_report(ev).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 3}
    total = [r for r in by_gid[3]]
    assert len(total) == 1 and total[0]["event_type"] == "(all)"
    assert total[0]["n_events"] == sum(r["n_events"] for r in by_gid[0])
    assert total[0]["n_events"] == sum(r["n_events"] for r in by_gid[1])


def test_linear_classifier_total_and_sigmoid_range(spark):
    """Every doc is scored (total operator), probabilities live in (0,1),
    and raw_milli is the exact integer dot product."""
    from flink_streaming_etl_spark.operators import text as tx

    docs = _tables(spark)["documents"]
    rows = tx.linear_quality_classifier(docs).collect()
    assert len(rows) == docs.count()  # TOTAL: token-less docs score 0.5
    for r in rows:
        assert 0.0 < r["prob_keep"] < 1.0, r
        assert r["keep"] == (1 if r["prob_keep"] >= 0.5 else 0), r


def test_knn_label_eval_perfect_when_clusters_are_tight(spark):
    """Two well-separated axis clusters: every vector's neighbors share
    its label, so per-label accuracy must be 1.0."""
    from flink_streaming_etl_spark.operators import similarity as sim

    rows = []
    for i in range(12):
        base = [0.0] * 8
        base[0 if i % 2 == 0 else 4] = 1.0
        # strictly positive jitter: every sign bit stays +, so all vectors
        # share one LSH bucket and the in-bucket top-k sees the full set
        jitter = [(0.01 * ((i * 7 + j) % 5 + 1)) for j in range(8)]
        v = [b + je for b, je in zip(base, jitter)]
        rows.append((i, v, i % 2))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v], l) for i, v, l in rows],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["label"]: r for r in sim.knn_label_eval(emb, k=3).collect()}
    for lbl, r in out.items():
        assert r["accuracy"] == 1.0, (lbl, r)


def test_wave78_plan_shapes(spark):
    """ROLLUP lowers to ONE Expand+Aggregate pass (never three unioned
    aggregations); explicit-list pivot is a single Aggregate with no
    distinct-values pre-job; classifier weights broadcast."""
    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators import analytics as an
    from flink_streaming_etl_spark.operators import text as tx
    from tests.conftest import SF_SMOKE

    ev = load_tables(spark, SF_SMOKE, register=False)["events"]
    p = plan_of(an.event_rollup_report(ev))
    assert p.count("Expand") >= 1, p
    assert "Union" not in p, p
    p = plan_of(an.event_type_pivot_daily(ev))
    assert "Union" not in p and "CartesianProduct" not in p, p
    docs = _tables(spark)["documents"]
    p = plan_of(tx.linear_quality_classifier(docs))
    # the 64-row weight vector must broadcast; the doc_id totality join
    # (documents ⟕ scores, both corpus-sized) legitimately shuffles
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p


def test_winnow_containment_short_in_long(spark):
    """A short doc fully embedded in a much longer one scores containment
    ~1.0 even though plain resemblance would be diluted by the long
    side's size."""
    from flink_streaming_etl_spark.operators import text as tx

    short = "the exact same embedded passage appears fully inside the larger document"
    long_doc = ("lots of unrelated framing text before it. " * 8) + short + (
        " and plenty of trailing material after the embedded span too. " * 8)
    docs = spark.createDataFrame(
        [
            (1, short, "en", "s", len(short)),
            (2, long_doc, "en", "s", len(long_doc)),
            (3, "completely unrelated content with its own words entirely", "en", "s", 56),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {(r["a_id"], r["b_id"]): r["containment"]
           for r in tx.winnow_containment_pairs(docs, min_containment=0.3).collect()}
    assert (1, 2) in out
    # interior-window fingerprints of the embedded span all match; only
    # the short doc's boundary windows (whose minima depend on context
    # outside the span) differ — containment lands well above the noise
    # floor but below 1.0 by construction
    assert out[(1, 2)] >= 0.5
    assert (1, 3) not in out and (2, 3) not in out


def test_heldout_perplexity_sane_and_leakage_free(spark):
    """Both held-out splits appear, perplexity > 1, and an OOV-heavy val
    doc raises NLL above a train-identical one (the Laplace floor)."""
    from flink_streaming_etl_spark.operators import text as tx

    rows = {r["split"]: r
            for r in tx.heldout_perplexity_report(_tables(spark)["documents"]).collect()}
    assert set(rows) == {"val", "test"}
    for r in rows.values():
        assert r["perplexity"] > 1.0, r
        assert r["avg_nll"] > 0.0, r
        assert abs(r["perplexity"] - round(2.718281828459045 ** r["avg_nll"], 1)) < \
            max(0.05 * r["perplexity"], 0.5)  # ppl ≈ e^nll (rounding slack)


def test_media_dedup_apply_removes_exactly_drop_list(spark):
    from flink_streaming_etl_spark.operators import multimodal as mm

    docs = _tables(spark)["documents"]
    total = docs.count()
    drops = mm.media_neardup_drop(docs).count()
    kept = mm.media_dedup_apply(docs).count()
    assert kept == total - drops


def test_vocab_growth_curve_monotone_and_total(spark):
    """Cumulative curve: 10 rows, monotone non-decreasing, final decile
    equals the corpus totals (all docs, full vocabulary)."""
    from pyspark.sql import functions as F

    from flink_streaming_etl_spark.operators import text as tx

    docs = _tables(spark)["documents"]
    rows = sorted(tx.vocab_growth_curve(docs).collect(), key=lambda r: r["decile"])
    assert [r["decile"] for r in rows] == list(range(1, 11))
    for a, b in zip(rows, rows[1:]):
        assert b["n_docs"] >= a["n_docs"] and b["vocab"] >= a["vocab"]
    full_vocab = (
        docs.select(F.explode(F.filter(F.split(F.lower("text"), "[^a-z]+"),
                                       lambda t: t != "")).alias("t"))
        .agg(F.count_distinct("t")).collect()[0][0]
    )
    assert rows[-1]["n_docs"] == docs.count()
    assert rows[-1]["vocab"] == full_vocab
