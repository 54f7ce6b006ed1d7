"""Round-10 additions: scan-economy + robustness fixes from the r9
verdict/advice, the IncrementalJoin -> IncrementalSumCount composition,
and earned oracles for previously rows-only entries."""

import math

from flink_streaming_etl_spark.catalog import load_tables
from flink_streaming_etl_spark.plans import plan_text
from tests.conftest import SF_SMOKE


def _tables(spark):
    return load_tables(spark, SF_SMOKE, register=False)


# ---------------------------------------------------------------------------
# moore_lewis_selection scan economy (r9 verdict #1)


def test_moore_lewis_rides_memoized_substrates(spark):
    """The r9 shape re-tokenized the corpus up to 4x (inline `toks`
    consumed by two total-actions plus the scoring job). The fix routes
    every relation through the two memoized substrates the sibling LM
    operators share (families ``lm_tf`` and ``source_term``), so the
    final plan reads InMemoryRelations and tokenizes the corpus at most
    TWICE: at most two scan nodes read the heavy `text` column (one
    inside each substrate's build plan). The only other scan allowed is
    the totality left-join's doc_id-pruned universe scan — one thin
    column, not a corpus pass."""
    import re

    from flink_streaming_etl_spark.operators import _cache
    from flink_streaming_etl_spark.operators import text as t

    _cache.clear_operator_caches()
    try:
        p = plan_text(t.moore_lewis_selection(_tables(spark)["documents"]))
        schemas = re.findall(r"ReadSchema: (\S+)", p)
        text_scans = [s for s in schemas if "text" in s]
        assert len(text_scans) <= 2, f"text-reading scans {text_scans}\n{p}"
        assert len(schemas) <= 3, f"{len(schemas)} parquet scan nodes\n{p}"
        for s in schemas:
            if "text" not in s:  # the universe scan must stay pruned
                assert s == "struct<doc_id:bigint>", s
        assert "InMemoryTableScan" in p, p
    finally:
        _cache.clear_operator_caches()


def test_moore_lewis_empty_in_domain_slice(spark):
    """ADVICE r9 (low): with NO in-domain docs the Spark side coalesces
    the totals to denom 1 and emits finite scores; the SQL twin must do
    the same (COALESCE over the empty SUM) instead of propagating NULL.
    Here: every term unseen in-domain scores ln(1/1) - ln((c+1)/denom_gen)
    > 0, so docs are still ranked by general-model surprisal."""
    from flink_streaming_etl_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha", "en", "srcX", 15),
            (1, "zeta", "en", "srcY", 4),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["doc_id"]: r for r in t.moore_lewis_selection(docs, "src0").collect()}
    assert rows[0]["ml_score"] is not None and rows[1]["ml_score"] is not None
    # oracle twin agrees (exercises the SQL COALESCE path)
    import duckdb

    con = duckdb.connect()
    pdf = docs.toPandas()
    con.register("documents", pdf)
    got = con.execute(t.moore_lewis_selection_sql("src0")).fetchdf()
    sql_rows = {int(r.doc_id): r for r in got.itertuples()}
    for d in (0, 1):
        assert sql_rows[d].ml_score is not None and not math.isnan(
            sql_rows[d].ml_score
        ), sql_rows[d]
        assert abs(sql_rows[d].ml_score - rows[d]["ml_score"]) < 1e-9


# ---------------------------------------------------------------------------
# IncrementalJoin: multiplicity-exact fold under PK-less projections
# (r9 verdict #2 / ADVICE r9)


def _rows(df):
    if df is None:
        return []
    return sorted(tuple(r) for r in df.collect())


def test_incremental_join_pkless_projection_keeps_multiplicity(spark):
    """Projections that drop a side's primary key can make two DISTINCT
    state rows produce IDENTICAL output rows. The fold must store the
    net multiplicity, so retracting ONE of them removes one logical row,
    not both. Pinned fold == recompute (as multisets) after every
    prefix, including the prefix right after the partial retraction."""
    from flink_streaming_etl_spark.streaming.incremental_join import IncrementalJoin
    from tests.test_cdc import env, order

    from tests.test_round9 import _join_scenario

    L, R, _ = _join_scenario(spark)
    inc = IncrementalJoin(
        left_pk="id",
        right_pk="id",
        left_key="user_id",
        right_key="id",
        # drops the order PK: o1/o2 below become indistinguishable outputs
        left_project={"user_id": "user_id", "amount": "amount"},
        right_project={"id": "id", "name": "name"},
    )
    batches = [
        (None, [env("c", {"id": "u1", "name": "ann", "area": "EU"}, ts=1)]),
        # two orders with IDENTICAL projected images
        ([env("c", order("o1", "u1", 100.0, "payed"), ts=2),
          env("c", order("o2", "u1", 100.0, "payed"), ts=3)], None),
        # retract ONE of them — exactly one logical join row must survive
        ([env("d", before=order("o1", "u1", 100.0, "payed"), ts=4)], None),
        # retract the other — now zero
        ([env("d", before=order("o2", "u1", 100.0, "payed"), ts=5)], None),
    ]
    for i, (ll, rr) in enumerate(batches):
        inc.apply(L(ll), R(rr), batch_id=i)
        assert _rows(inc.result()) == _rows(inc.recompute()), f"batch {i}"
    assert _rows(inc.result()) == []
    # and the intermediate state after batch 2 really held TWO identical
    # logical rows (the collapse bug returned 1)
    inc2 = IncrementalJoin(
        left_pk="id", right_pk="id", left_key="user_id", right_key="id",
        left_project={"user_id": "user_id", "amount": "amount"},
        right_project={"id": "id", "name": "name"},
    )
    for i, (ll, rr) in enumerate(batches[:2]):
        inc2.apply(L(ll), R(rr), batch_id=i)
    assert len(_rows(inc2.result())) == 2


# ---------------------------------------------------------------------------
# LM-family broadcast size guard (r9 verdict #3)


def test_lm_vocab_broadcast_guard_both_regimes(spark, monkeypatch):
    """Below VOCAB_BROADCAST_MAX_ROWS the scoring joins stay pinned
    broadcast (the r7/r8 contract); above it the hint is WITHHELD so the
    plan degrades to a vocab-keyed shuffle join instead of shipping a
    web-scale bigram vocabulary to the driver. Values must be identical
    in both regimes."""
    from flink_streaming_etl_spark.operators import text as t

    docs = _tables(spark)["documents"]
    scorers = (t.bigram_logprob_score, t.jm_fluency, t.kneser_ney_fluency)

    # regime 1: vocabulary fits -> broadcast pinned, no shuffle join
    for build in scorers:
        p = plan_text(build(docs))
        assert "BroadcastHashJoin" in p, (build.__name__, p)
        assert "SortMergeJoin" not in p, (build.__name__, p)
    baseline = {r["doc_id"]: r for r in scorers[0](docs).collect()}

    # regime 2: synthesize "oversized" vocabulary by zeroing the cap;
    # disable planner auto-broadcast so a fallback must be a genuine
    # shuffle join (at test scale AQE would otherwise re-broadcast the
    # tiny relation and mask a missing guard)
    monkeypatch.setattr(t, "VOCAB_BROADCAST_MAX_ROWS", 0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for build in scorers:
            p = plan_text(build(docs))
            assert "BroadcastHashJoin" not in p, (build.__name__, p)
            assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, (
                build.__name__,
                p,
            )
        fallback = {r["doc_id"]: r for r in scorers[0](docs).collect()}
        assert fallback == baseline
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------------------
# basket_lift_pairs basket-size cap (r9 verdict #4)


def test_basket_lift_caps_mega_baskets(spark):
    """One pathological mega-order must contribute ZERO pairs (dropped
    wholesale before counting) instead of C(n,2) — and it must not count
    in the order total either, so lifts among normal baskets are
    unchanged by its presence."""
    from flink_streaming_etl_spark.operators import analytics as a

    normal = [(ok, pk) for ok in (1, 2, 3) for pk in (10, 20)]
    mega = [(99, pk) for pk in range(1000, 1050)]  # 50 items > cap of 10
    li = spark.createDataFrame(
        [(ok, pk, 1.0) for ok, pk in normal + mega],
        "l_orderkey long, l_partkey long, l_quantity double",
    )
    out = a.basket_lift_pairs(li, min_pair=2, max_basket=10).collect()
    got = {(r["part_a"], r["part_b"]): r for r in out}
    assert set(got) == {(10, 20)}
    r = got[(10, 20)]
    # 3 capped orders, pair present in all 3 -> support 1, lift 1/1... :
    # n_pair=3, n_a=n_b=3, _n=3 -> lift = 3*3/(3*3) = 1
    assert r["n_pair"] == 3 and r["n_a"] == 3 and r["n_b"] == 3
    assert r["support"] == 1.0 and r["lift"] == 1.0
    # oracle twin mirrors the cap
    import duckdb

    con = duckdb.connect()
    con.register("lineitem", li.toPandas())
    odf = con.execute(a.basket_lift_pairs_sql(2, 10)).fetchdf()
    assert len(odf) == 1 and int(odf.n_pair[0]) == 3


# ---------------------------------------------------------------------------
# IncrementalJoinAgg: the reference's user_order_stats (join feeding an
# aggregate) in TRUE ±delta mode (r9 verdict #7)


def _user_order_stats_agg(inc=None):
    from pyspark.sql import functions as F

    from flink_streaming_etl_spark.streaming.incremental_join import (
        IncrementalJoin,
        IncrementalJoinAgg,
    )

    join = inc or IncrementalJoin(
        left_pk="id", right_pk="id", left_key="user_id", right_key="id"
    )
    return IncrementalJoinAgg(
        join,
        group_cols={
            "user_id": "user_id",
            "cday": F.substring(F.col("ctime"), 1, 10),
        },
        amount="amount",
        predicate=F.col("status") != "closed",
    )


def test_incremental_join_agg_equals_recompute_after_every_prefix(spark):
    """The full reference chain — order⋈user join deltas feeding the
    per-user/day SUM/COUNT with the status<>'closed' filter — must equal
    the recompute twin after EVERY changelog prefix, including prefixes
    where updates retract join rows and groups net to zero."""
    from tests.test_round9 import _join_scenario

    L, R, batches = _join_scenario(spark)
    agg = _user_order_stats_agg()
    for i, (ll, rr) in enumerate(batches):
        agg.apply(L(ll), R(rr), batch_id=i)
        got = _rows(agg.result())
        want = _rows(agg.recompute())
        assert got == want, f"batch {i}: {got} != {want}"
    # final sanity: o1 (120, payed) for u1 plus o4 (70) same user/day;
    # o2 deleted, o3's customer deleted
    final = {(r["user_id"], r["cday"]): (float(r["amount"]), r["cnt"])
             for r in agg.result().collect()}
    assert final == {("u1", "2020-07-30"): (190.0, 2)}


def test_incremental_join_agg_status_filter_retracts(spark):
    """An update flipping status to 'closed' must RETRACT the order from
    the aggregate (predicate over signed rows), mirroring the reference's
    retraction requirement on order_stats."""
    from tests.test_cdc import env, order
    from tests.test_round9 import _join_scenario

    L, R, _ = _join_scenario(spark)
    agg = _user_order_stats_agg()
    agg.apply(None, R([env("c", {"id": "u1", "name": "ann", "area": "EU"}, ts=1)]),
              batch_id=0)
    agg.apply(L([env("c", order("o1", "u1", 100.0, "payed"), ts=2)]), None,
              batch_id=1)
    agg.apply(
        L([env("u", order("o1", "u1", 100.0, "closed"),
               before=order("o1", "u1", 100.0, "payed"), ts=3)]),
        None,
        batch_id=2,
    )
    assert _rows(agg.result()) == _rows(agg.recompute()) == []


def test_incremental_join_agg_foreachbatch_attach(spark, tmp_path):
    """Drive both changelog sides through attach() (one streaming query
    per topic, like the reference's per-table Kafka consumers); the final
    aggregate equals recompute, and a full no-checkpoint re-attach (every
    batch id replays from 0) is a no-op — effectively-once (T6)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from flink_streaming_etl_spark.sources.cdc import CdcSource
    from tests.test_cdc import ORDER_SCHEMA, env, order

    cust_schema = StructType(
        [
            StructField("id", StringType()),
            StructField("name", StringType()),
            StructField("area", StringType()),
        ]
    )
    ldir, rdir = tmp_path / "orders", tmp_path / "users"
    ldir.mkdir(), rdir.mkdir()
    (rdir / "b0.jsonl").write_text(
        "\n".join([env("c", {"id": "u1", "name": "ann", "area": "EU"}, ts=1),
                   env("c", {"id": "u2", "name": "bob", "area": "US"}, ts=2)])
    )
    (ldir / "b0.jsonl").write_text(
        "\n".join([env("c", order("o1", "u1", 100.0, "payed"), ts=3),
                   env("c", order("o2", "u2", 50.0, "payed"), ts=4)])
    )
    (ldir / "b1.jsonl").write_text(
        "\n".join([env("u", order("o1", "u1", 120.0, "payed"),
                       before=order("o1", "u1", 100.0, "payed"), ts=5),
                   env("d", before=order("o2", "u2", 50.0, "payed"), ts=6)])
    )
    lsrc = CdcSource("orders", ORDER_SCHEMA, "id")
    rsrc = CdcSource("customers", cust_schema, "id")
    agg = _user_order_stats_agg()
    # dimension side first so the fact batches join against live state
    for q in agg.attach(
        right_stream=rsrc.stream_changelog(spark, str(rdir)),
        checkpoint_root=str(tmp_path / "ckpt_r"),
    ):
        q.awaitTermination(120)
    for q in agg.attach(
        left_stream=lsrc.stream_changelog(spark, str(ldir)),
        checkpoint_root=str(tmp_path / "ckpt_l"),
    ):
        q.awaitTermination(120)
    assert _rows(agg.result()) == _rows(agg.recompute())
    final = {(r["user_id"], r["cday"]): (float(r["amount"]), r["cnt"])
             for r in agg.result().collect()}
    assert final == {("u1", "2020-07-30"): (120.0, 1)}
    before = _rows(agg.result())
    # replay everything with NO checkpoint: batch ids restart at 0 and the
    # per-side guard must make every delivery a no-op
    for q in agg.attach(
        left_stream=lsrc.stream_changelog(spark, str(ldir)),
        right_stream=rsrc.stream_changelog(spark, str(rdir)),
    ):
        q.awaitTermination(120)
    assert _rows(agg.result()) == before


# ---------------------------------------------------------------------------
# Earned oracles for previously rows-only entries (r9 verdict #8)


def test_bpe_encode_pinned_worked_example(spark):
    """The pinned-merge closed form (len - non-overlapping pair counts)
    must equal the REAL encoder on cascade-bearing words: 'ther' merges
    th then er (4 chars -> 2 tokens), 'onon' merges both 'on's in one
    pass, 'thon' both pairs."""
    from flink_streaming_etl_spark.operators import text as t

    docs = spark.createDataFrame(
        [(0, "ther onon thon xyz", "en", "src0", 18),
         (1, "alal erer", "en", "src0", 9),
         (2, "12345", "en", "src0", 5)],  # zero a-z words
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["doc_id"]: r for r in t.bpe_encode_pinned(docs).collect()}
    # ther->2, onon->2, thon->2, xyz->3  => 9 tokens / 4 words / 15 chars
    assert (rows[0]["n_words"], rows[0]["n_chars"], rows[0]["n_bpe_tokens"]) == (4, 15, 9)
    # alal->2, erer->2 => 4 tokens / 2 words / 8 chars
    assert (rows[1]["n_words"], rows[1]["n_chars"], rows[1]["n_bpe_tokens"]) == (2, 8, 4)
    assert rows[2]["n_words"] == 0 and rows[2]["fertility"] is None
    # oracle twin agrees on the same micro-corpus
    import duckdb

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    odf = con.execute(t.bpe_encode_pinned_sql()).fetchdf().sort_values("doc_id")
    assert list(odf.n_bpe_tokens) == [9, 4, 0]


# ---------------------------------------------------------------------------
# round-10 operator wave


def test_blocklist_filter_semantics(spark):
    """Exact-token matching only: a doc containing 'slowly' must NOT hit
    the 'slow' entry; hits count token occurrences and distinct terms."""
    from flink_streaming_etl_spark.operators import text as t

    docs = spark.createDataFrame(
        [(0, "slow query slow join", "en", "s", 20),
         (1, "slowly but surely", "en", "s", 17),
         (2, "broken deadlock slow", "en", "s", 20),
         (3, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["doc_id"]: r for r in t.blocklist_filter_report(docs).collect()}
    assert (rows[0]["n_blocked_tokens"], rows[0]["n_blocked_terms"]) == (2, 1)
    assert rows[0]["keep"] is False
    assert rows[1]["n_blocked_tokens"] == 0 and rows[1]["keep"] is True
    assert (rows[2]["n_blocked_tokens"], rows[2]["n_blocked_terms"]) == (3, 3)
    assert rows[3]["keep"] is True


def test_blocklist_filter_plan_broadcasts(spark):
    from flink_streaming_etl_spark.operators import text as t

    p = plan_text(t.blocklist_filter_report(_tables(spark)["documents"]))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_distinct_ngram_flags_templated_source(spark):
    """A source that repeats one sentence must score lower distinct-2
    than a source of distinct sentences."""
    from flink_streaming_etl_spark.operators import text as t

    rep = [(i, "the quick brown fox jumps", "en", "templ", 25) for i in range(5)]
    div = [(10, "alpha beta gamma delta", "en", "varied", 22),
           (11, "epsilon zeta eta theta", "en", "varied", 22),
           (12, "iota kappa lambda mu", "en", "varied", 20)]
    docs = spark.createDataFrame(
        rep + div,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["source"]: r for r in t.distinct_ngram_report(docs).collect()}
    assert rows["templ"]["distinct_2"] < rows["varied"]["distinct_2"]
    assert rows["varied"]["distinct_1"] == 1.0  # no repeated unigrams


def test_quality_ensemble_census_is_total(spark):
    """The vote-pattern census partitions the corpus: n_docs sums to the
    corpus size and keep_majority == (votes >= 2) in every cell."""
    from flink_streaming_etl_spark.operators import text as t

    docs = _tables(spark)["documents"]
    rows = t.quality_ensemble_report(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        votes = r["v_gopher"] + r["v_entropy"] + r["v_lm"]
        assert r["keep_majority"] == (votes >= 2), r


def test_dedup_tier_agreement_invariants(spark):
    """Set identities: n_both <= min(|A|, |B|) and
    n_union = |A| + |B| - n_both; tier_jaccard consistent."""
    from flink_streaming_etl_spark.operators import dedup as d

    r = d.dedup_tier_agreement_report(_tables(spark)["documents"]).collect()[0]
    assert r["n_both"] <= min(r["n_lsh_pairs"], r["n_simhash_pairs"])
    assert r["n_union"] == r["n_lsh_pairs"] + r["n_simhash_pairs"] - r["n_both"]
    if r["n_union"]:
        assert abs(r["tier_jaccard"] - r["n_both"] / r["n_union"]) < 1e-6


def test_hard_negative_mining_band_and_rank(spark):
    """Negatives never include probe vectors, every cosine sits inside
    [lo, hi), and ranks are contiguous from 1 per query."""
    from flink_streaming_etl_spark.operators import similarity as sim

    out = sim.hard_negative_mining(_tables(spark)["embeddings"]).collect()
    assert out, "expected at least one mined negative at smoke scale"
    by_q = {}
    for r in out:
        assert r["neg_id"] >= sim.N_QUERIES
        assert sim.NEG_COS_LO <= r["cosine"] < sim.NEG_COS_HI
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (q, ranks)
    p = plan_text(sim.hard_negative_mining(_tables(spark)["embeddings"]))
    assert "CartesianProduct" not in p


def test_whitening_identity_report_scalars(spark):
    """The one-row report must agree with the element-level whitening
    relation: deviations quantize to 0.0 at 1e-3 and identity_ok holds;
    n_pairs/d match the relation's own shape."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    rep = sim.whitening_identity_report(emb).collect()
    assert len(rep) == 1
    r = rep[0]
    rel = sim.embedding_whitening_check(emb).collect()
    d = max(x["dim_j"] for x in rel) + 1
    assert r["d"] == d and r["n_pairs"] == d * (d + 1) // 2 == len(rel)
    assert r["max_abs_offdiag_q3"] == 0.0 and r["max_diag_dev_q3"] == 0.0
    assert r["identity_ok"] is True


# ---------------------------------------------------------------------------
# round-10 wave 2: pagerank_pinned / rfm_segmentation / softdedup_weights
# (cross-engine value equality for all three runs in test_oracle_parity;
# these pin the semantics on structured inputs)


def test_pagerank_pinned_mass_and_floor(spark):
    """Rank floor: every node receives at least the (1-d) base mass
    (150_000 micro-units); total mass never exceeds the initial n·SCALE
    (truncating division + dangling nodes only LEAK mass); a node with
    incoming edges ends strictly above the floor."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    out = sim.pagerank_pinned(emb).collect()
    n = emb.count()
    assert len(out) == n
    base = sim.PR_SCALE - sim.PR_SCALE * sim.PR_DAMP_NUM // sim.PR_DAMP_DEN
    assert all(r["pagerank_u"] >= base for r in out)
    assert sum(r["pagerank_u"] for r in out) <= n * sim.PR_SCALE
    assert max(r["pagerank_u"] for r in out) > base  # graph is non-empty

    # in-degree-0 nodes sit exactly on the floor
    edges = sim.knn_graph(emb).select("neighbor_id").distinct()
    with_in = {r["neighbor_id"] for r in edges.collect()}
    floor_ids = {r["vec_id"] for r in out if r["pagerank_u"] == base}
    assert floor_ids == {r["vec_id"] for r in out} - with_in


def test_pagerank_pinned_star_graph(spark):
    """4-node star in one LSH bucket: the hub (nearest neighbor of every
    spoke) must out-rank every spoke after 2 iterations."""
    import math

    from flink_streaming_etl_spark.operators import similarity as sim

    dim = 8
    hub = [1.0] + [0.0] * (dim - 1)

    def spoke(i):
        v = list(hub)
        v[1 + i] = 0.2  # same bucket (all coords >= 0), close to hub
        return [x / math.sqrt(1 + 0.04) for x in v]

    rows = [(0, hub, "a")] + [(i, spoke(i - 1), "a") for i in (1, 2, 3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    # k=1: each spoke's single nearest neighbor is the hub (cos ≈ 0.98
    # vs spoke-spoke ≈ 0.96), so the hub collects every spoke's
    # contribution while only spoke 1 gets the hub's single edge. An
    # ODD iteration count (3) keeps the hub on the receiving half-phase
    # of the hub↔spoke1 2-cycle (even T parks the slosh on the spoke —
    # the textbook oscillation a convergence run damps out).
    out = {r["vec_id"]: r["pagerank_u"]
           for r in sim.pagerank_pinned(emb, k=1, iters=3).collect()}
    assert out[0] > max(out[i] for i in (1, 2, 3))
    assert out[2] == out[3] == 150_000  # in-degree-0 spokes sit on the floor


def test_rfm_segmentation_quartiles(spark):
    """Quartile scores stay in 1..4; within one segment, the customer
    with the most orders carries f_q=4 and the biggest spender m_q=4;
    rfm_score composes digits."""
    t = _tables(spark)
    from flink_streaming_etl_spark.operators import analytics as an

    out = an.rfm_segmentation(t["orders"], t["customer"]).collect()
    assert out
    for r in out:
        for c in ("r_q", "f_q", "m_q"):
            assert 1 <= r[c] <= 4, (c, r)
        assert r["rfm_score"] == r["r_q"] * 100 + r["f_q"] * 10 + r["m_q"]
        assert r["recency_days"] >= 0
    seg = out[0]["c_mktsegment"]
    rows = [r for r in out if r["c_mktsegment"] == seg]
    assert max(rows, key=lambda r: (r["frequency"], r["c_custkey"]))["f_q"] == 4
    assert max(rows, key=lambda r: (r["monetary"], r["c_custkey"]))["m_q"] == 4
    assert min(rows, key=lambda r: (r["recency_days"], r["c_custkey"]))["r_q"] == 4


def test_softdedup_weights_partition_of_unity(spark):
    """weight · cluster_size == 1 exactly per row; every doc appears
    exactly once; summed weights count one unit per component (clustered
    docs share their component's unit, singletons keep their own); the
    component relation agrees with neardup_clusters."""
    from flink_streaming_etl_spark.operators import dedup as dd

    docs = _tables(spark)["documents"]
    out = dd.softdedup_weights(docs).collect()
    assert len(out) == docs.count()
    assert len({r["doc_id"] for r in out}) == len(out)
    for r in out:
        assert r["weight"] * r["cluster_size"] == 1.0
    n_components = len({r["cluster_id"] for r in out})
    assert abs(sum(r["weight"] for r in out) - n_components) < 1e-9

    clustered = {r["doc_id"]: r["cluster_id"] for r in dd.neardup_clusters(docs).collect()}
    for r in out:
        assert r["cluster_id"] == clustered.get(r["doc_id"], r["doc_id"])


# ---------------------------------------------------------------------------
# IncrementalTopK — Flink retractable Top-N parity (per-group ORDER BY
# amount DESC LIMIT k over a changelog, touched-group-bounded work)


def _topk_scenario(spark):
    from flink_streaming_etl_spark.sources.cdc import CdcSource
    from tests.test_cdc import ORDER_SCHEMA, env, order, raw_df

    src = CdcSource("orders", ORDER_SCHEMA, "id")

    def B(lines):
        return src.parse(raw_df(spark, lines))

    batches = [
        # 1: two groups appear
        [env("c", order("o1", "u1", 100.0, "payed"), ts=1),
         env("c", order("o2", "u2", 80.0, "payed"), ts=2),
         env("c", order("o3", "u3", 60.0, "payed"), ts=3),
         env("c", order("o4", "u4", 50.0, "created"), ts=4)],
        # 2: below-buffer insert (payed rank 4) + new top row (created)
        [env("c", order("o5", "u5", 10.0, "payed"), ts=5),
         env("c", order("o6", "u6", 70.0, "created"), ts=6)],
        # 3: cross-group MOVE: o1 (payed #1) flips to created — both
        # groups' buffers change in one envelope
        [env("u", order("o1", "u1", 100.0, "created"),
             before=order("o1", "u1", 100.0, "payed"), ts=7)],
        # 4: buffer EVICTION: delete created's current #1 (o1) — the
        # refill must come from full state, not the old buffer
        [env("d", before=order("o1", "u1", 100.0, "created"), ts=8)],
        # 5: value update INSIDE the buffer reorders it
        [env("u", order("o3", "u3", 90.0, "payed"),
             before=order("o3", "u3", 60.0, "payed"), ts=9)],
    ]
    return B, batches


def _topk_rows(df):
    return sorted(
        tuple(r[c] for c in ("status", "rank", "id", "amount")) for r in df.collect()
    )


def test_incremental_topk_equals_recompute_after_every_prefix(spark):
    from flink_streaming_etl_spark.streaming.topk import IncrementalTopK

    B, batches = _topk_scenario(spark)
    inc = IncrementalTopK(pk="id", group_cols=["status"], order_col="amount", k=2)
    for i, lines in enumerate(batches):
        inc.apply(B(lines), batch_id=i)
        assert _topk_rows(inc.result()) == _topk_rows(inc.recompute()), f"batch {i}"
    final = _topk_rows(inc.result())
    # payed: o3 (90) then o2 (80); created: o6 (70) then o4 (50)
    assert [(s, r, i) for s, r, i, _ in final] == [
        ("created", 1, "o6"), ("created", 2, "o4"),
        ("payed", 1, "o3"), ("payed", 2, "o2"),
    ]


def test_incremental_topk_replay_and_untouched_groups(spark):
    from flink_streaming_etl_spark.streaming.topk import IncrementalTopK

    B, batches = _topk_scenario(spark)
    inc = IncrementalTopK(pk="id", group_cols=["status"], order_col="amount", k=2)
    inc.apply(B(batches[0]), batch_id=0)
    # batch 2 touches only payed+created via o5/o6; returned refresh
    # must cover exactly the touched groups
    refreshed = inc.apply(B(batches[1]), batch_id=1)
    assert {r["status"] for r in refreshed.collect()} == {"payed", "created"}
    before = _topk_rows(inc.result())
    assert inc.apply(B(batches[1]), batch_id=1) is None  # replay no-op
    assert _topk_rows(inc.result()) == before
    # a batch touching ONLY 'created' leaves payed's buffer rows intact
    from tests.test_cdc import env, order
    inc.apply(B([env("c", order("o7", "u7", 65.0, "created"), ts=10)]), batch_id=2)
    after = _topk_rows(inc.result())
    assert [t for t in after if t[0] == "payed"] == [t for t in before if t[0] == "payed"]
    assert ("created", 2, "o7", 65.0) in after
    assert _topk_rows(inc.result()) == _topk_rows(inc.recompute())


def test_burstiness_report_poisson_vs_bursty(spark):
    """A perfectly uniform daily series has fano == 0 (no variance); one
    hot day drives fano and peak_ratio up; arithmetic stays exact
    single-division int/int."""
    from datetime import datetime

    from flink_streaming_etl_spark.operators import analytics as an

    rows = []
    eid = 0
    for d in range(1, 11):  # uniform: 5/day for 10 days
        for _ in range(5):
            rows.append((eid, datetime(2024, 1, d, 12, 0), 1, "steady", 0.0, "{}"))
            eid += 1
    for d in range(1, 11):  # bursty: 1/day, but 41 on day 10 (total 50)
        n = 41 if d == 10 else 1
        for _ in range(n):
            rows.append((eid, datetime(2024, 1, d, 12, 0), 1, "bursty", 0.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["event_type"]: r for r in an.burstiness_report(ev).collect()}
    s, b = out["steady"], out["bursty"]
    assert s["fano"] == 0.0 and s["peak_ratio"] == 1.0 and s["mean_daily"] == 5.0
    assert b["total"] == 50 and b["peak"] == 41
    # var = (10*1690 - 2500)/100 = 144; fano = 144/5 = 28.8; peak_ratio 8.2
    assert b["fano"] == 28.8 and b["peak_ratio"] == 8.2


# ---------------------------------------------------------------------------
# IncrementalDistinctCount — Flink's retractable COUNT(DISTINCT) (per-
# (group,value) reference counts + 0-crossing folds)


def test_incremental_distinct_count_equals_recompute(spark):
    from pyspark.sql import functions as F

    from flink_streaming_etl_spark.sources.cdc import CdcSource, apply_changelog
    from flink_streaming_etl_spark.streaming.incremental import (
        IncrementalDistinctCount,
    )
    from tests.test_cdc import ORDER_SCHEMA, env, order, raw_df

    src = CdcSource("orders", ORDER_SCHEMA, "id")
    B = lambda lines: src.parse(raw_df(spark, lines))  # noqa: E731

    batches = [
        # status 'payed': users u1,u1,u2 → 2 distinct; 'created': u3 → 1
        [env("c", order("o1", "u1", 10.0, "payed"), ts=1),
         env("c", order("o2", "u1", 20.0, "payed"), ts=2),
         env("c", order("o3", "u2", 30.0, "payed"), ts=3),
         env("c", order("o4", "u3", 40.0, "created"), ts=4)],
        # delete ONE of u1's payed orders: refcount 2→1, distinct stays 2
        [env("d", before=order("o1", "u1", 10.0, "payed"), ts=5)],
        # delete the OTHER: refcount 1→0, distinct drops to 1
        [env("d", before=order("o2", "u1", 20.0, "payed"), ts=6)],
        # u: o4 moves created→payed (u3 leaves created entirely — the
        # group itself must vanish; payed gains u3 → distinct 2)
        [env("u", order("o4", "u3", 40.0, "payed"),
             before=order("o4", "u3", 40.0, "created"), ts=7)],
        # same-batch churn: insert + delete of the same pair nets to 0
        [env("c", order("o5", "u4", 5.0, "payed"), ts=8),
         env("d", before=order("o5", "u4", 5.0, "payed"), ts=9)],
    ]

    inc = IncrementalDistinctCount(
        key_exprs=lambda img: [img["status"]], value=lambda img: img["user_id"]
    )
    state = None
    for i, lines in enumerate(batches):
        chunk = B(lines)
        inc.apply(chunk, batch_id=i)
        state = apply_changelog(state, chunk, "id")
        # pin 1: crossing-folded counts == COUNT(DISTINCT) over ref tier
        got = sorted((r["k0"], r["distinct_cnt"]) for r in inc.result().collect())
        tier1 = sorted(
            (r["k0"], r["distinct_cnt"]) for r in inc.recompute().collect()
        )
        assert got == tier1, f"batch {i}"
        # pin 2: both tiers == an INDEPENDENT recompute from latest state
        truth = sorted(
            (r["status"], r["d"])
            for r in state.groupBy("status")
            .agg(F.count_distinct("user_id").alias("d"))
            .collect()
        )
        assert got == truth, f"batch {i}: {got} != {truth}"
    assert got == [("payed", 2)]
    # replay no-op
    assert inc.apply(B(batches[-1]), batch_id=len(batches) - 1) is None


# ---------------------------------------------------------------------------
# pca_power_pinned — oracle-backed PCA (identical fixed-order arithmetic
# in both engines; value parity runs in test_oracle_parity)


def test_pca_power_pinned_invariants(spark):
    """Unit-norm loadings (up to q6), PSD Rayleigh bounds (mean-variance
    <= eigenvalue <= trace — the quotient is monotone non-decreasing
    over power steps from the uniform start), ratio consistency."""
    import numpy as np

    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    rows = sorted(sim.pca_power_pinned(emb).collect(), key=lambda r: r["dim"])
    v = np.array([r["loading"] for r in rows])
    assert abs(float(v @ v) - 1.0) < 1e-4  # q6 per-coord quantization
    lam = rows[0]["eigenvalue"]
    ratio = rows[0]["explained_ratio"]
    cov = sim.embedding_covariance(emb).collect()
    trace = sum(r["cov"] for r in cov if r["dim_i"] == r["dim_j"])
    d = max(r["dim_j"] for r in cov) + 1
    assert trace / d - 1e-6 <= lam <= trace + 1e-6
    assert abs(ratio - lam / trace) < 1e-4
    # the pinned component agrees with the converged pca_top_component
    # direction (same covariance, same start, more iterations there)
    top = sorted(sim.pca_top_component(emb).collect(), key=lambda r: r["dim"])
    t = np.array([r["loading"] for r in top])
    assert abs(float(v @ t)) > 0.98


def test_wave2_entries_survive_empty_corpus(spark, tmp_path):
    """The empty-corpus hardening contract for every wave-2 entry (the
    module-scoped sweep in test_empty_inputs covers them too; this keeps
    the guarantee local to the round)."""
    from flink_streaming_etl_spark import api
    from flink_streaming_etl_spark.catalog import load_tables

    src = load_tables(spark, SF_SMOKE, register=False)
    for name, df in src.items():
        df.limit(0).write.mode("overwrite").parquet(str(tmp_path / f"{name}.parquet"))
    for name in ("pagerank_pinned", "rfm_segmentation", "softdedup_weights",
                 "burstiness_report", "pca_power_pinned", "knn_outlier_report",
                 "label_centroid_confusion", "top_event_paths",
                 "ann_graph_expand", "graph_clustering_report",
                 "data_quality_report"):
        api.queries()[name](spark, str(tmp_path)).collect()


def test_incremental_topk_and_distinct_foreachbatch_attach(spark, tmp_path):
    """Drive both new accumulators through attach() (file-replay
    changelog stream, availableNow) — final state equals recompute, and
    a no-checkpoint re-attach (batch ids restart at 0) is a no-op."""
    from pyspark.sql import functions as F

    from flink_streaming_etl_spark.sources.cdc import CdcSource
    from flink_streaming_etl_spark.streaming.incremental import (
        IncrementalDistinctCount,
    )
    from flink_streaming_etl_spark.streaming.topk import IncrementalTopK
    from tests.test_cdc import ORDER_SCHEMA, env, order

    d = tmp_path / "orders"
    d.mkdir()
    (d / "b0.jsonl").write_text(
        "\n".join([env("c", order("o1", "u1", 100.0, "payed"), ts=1),
                   env("c", order("o2", "u1", 80.0, "payed"), ts=2),
                   env("c", order("o3", "u2", 60.0, "payed"), ts=3)])
    )
    (d / "b1.jsonl").write_text(
        "\n".join([env("d", before=order("o1", "u1", 100.0, "payed"), ts=4),
                   env("c", order("o4", "u3", 50.0, "created"), ts=5)])
    )
    src = CdcSource("orders", ORDER_SCHEMA, "id")

    topk = IncrementalTopK(pk="id", group_cols=["status"], order_col="amount", k=2)
    topk.attach(
        src.stream_changelog(spark, str(d)),
        checkpoint_root=str(tmp_path / "ck_t"),
    ).awaitTermination(120)
    assert _topk_rows(topk.result()) == _topk_rows(topk.recompute())
    assert [(s, r, i) for s, r, i, _ in _topk_rows(topk.result())] == [
        ("created", 1, "o4"), ("payed", 1, "o2"), ("payed", 2, "o3"),
    ]

    dc = IncrementalDistinctCount(
        key_exprs=lambda img: [img["status"]], value=lambda img: img["user_id"]
    )
    dc.attach(
        src.stream_changelog(spark, str(d)),
        checkpoint_root=str(tmp_path / "ck_d"),
    ).awaitTermination(120)
    got = sorted((r["k0"], r["distinct_cnt"]) for r in dc.result().collect())
    assert got == [("created", 1), ("payed", 2)]

    # replay with no checkpoint: batch ids restart at 0 — both guards
    # must no-op every delivery
    t_before = _topk_rows(topk.result())
    topk.attach(src.stream_changelog(spark, str(d))).awaitTermination(120)
    assert _topk_rows(topk.result()) == t_before
    dc.attach(src.stream_changelog(spark, str(d))).awaitTermination(120)
    assert sorted((r["k0"], r["distinct_cnt"]) for r in dc.result().collect()) == got


def test_knn_outlier_report_isolates_far_vector(spark):
    """A vector alone in its LSH bucket is isolated with NULL mean; a
    tight clique reports high mean neighbor cosine and no flag."""
    import math

    from flink_streaming_etl_spark.operators import similarity as sim

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)

    def near(i):
        v = list(base)
        v[1 + i] = 0.1
        return [x / math.sqrt(1.01) for x in v]

    lone = [0.0] * dim
    lone[1] = -1.0  # negative coord 2 → unique bucket
    rows = [(0, base, "a"), (1, near(0), "a"), (2, near(1), "a"), (3, lone, "a")]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r["vec_id"]: r for r in sim.knn_outlier_report(emb, k=2).collect()}
    assert out[3]["isolated"] and out[3]["k_found"] == 0
    assert out[3]["mean_neighbor_cos"] is None
    for i in (0, 1, 2):
        assert not out[i]["isolated"] and out[i]["k_found"] == 2
        assert out[i]["mean_neighbor_cos"] > 0.9


def test_accumulator_state_survives_restart(spark, tmp_path):
    """Durable-state round trip: with a PERSISTENT streaming checkpoint a
    restarted stream skips committed batches, so the accumulator must
    come back with the state those batches built (state_store.py). Drive
    b0 with checkpoint+state_dir, discard the accumulator (the restart),
    restore a fresh one from state_dir, deliver b1 through the SAME
    checkpoint — only b1 is processed, and the result equals recompute
    over the full changelog."""
    from flink_streaming_etl_spark.sources.cdc import CdcSource
    from flink_streaming_etl_spark.streaming.incremental import (
        IncrementalDistinctCount,
    )
    from flink_streaming_etl_spark.streaming.topk import IncrementalTopK
    from tests.test_cdc import ORDER_SCHEMA, env, order

    d = tmp_path / "orders"
    d.mkdir()
    (d / "b0.jsonl").write_text(
        "\n".join([env("c", order("o1", "u1", 100.0, "payed"), ts=1),
                   env("c", order("o2", "u2", 80.0, "payed"), ts=2)])
    )
    src = CdcSource("orders", ORDER_SCHEMA, "id")
    ck = str(tmp_path / "ck")

    t1 = IncrementalTopK(pk="id", group_cols=["status"], order_col="amount",
                         k=2, state_dir=str(tmp_path / "st_t"))
    t1.attach(src.stream_changelog(spark, str(d)), checkpoint_root=ck).awaitTermination(120)
    d1 = IncrementalDistinctCount(
        key_exprs=lambda img: [img["status"]], value=lambda img: img["user_id"],
        state_dir=str(tmp_path / "st_d"),
    )
    ckd = str(tmp_path / "ckd")
    d1.attach(src.stream_changelog(spark, str(d)), checkpoint_root=ckd).awaitTermination(120)
    del t1, d1  # the restart: in-memory state gone

    # new data arrives while "down"; a delete exercises retraction across
    # the restart boundary (needs the restored ref-counts to net to 0)
    (d / "b1.jsonl").write_text(
        "\n".join([env("d", before=order("o1", "u1", 100.0, "payed"), ts=3),
                   env("c", order("o3", "u3", 90.0, "created"), ts=4)])
    )

    t2 = IncrementalTopK(pk="id", group_cols=["status"], order_col="amount",
                         k=2, state_dir=str(tmp_path / "st_t"))
    assert t2.restore(spark)
    assert t2.last_batch_id == 0  # b0 was committed pre-restart
    t2.attach(src.stream_changelog(spark, str(d)), checkpoint_root=ck).awaitTermination(120)
    assert _topk_rows(t2.result()) == _topk_rows(t2.recompute())
    assert [(s, r, i) for s, r, i, _ in _topk_rows(t2.result())] == [
        ("created", 1, "o3"), ("payed", 1, "o2"),
    ]

    d2 = IncrementalDistinctCount(
        key_exprs=lambda img: [img["status"]], value=lambda img: img["user_id"],
        state_dir=str(tmp_path / "st_d"),
    )
    assert d2.restore(spark)
    d2.attach(src.stream_changelog(spark, str(d)), checkpoint_root=ckd).awaitTermination(120)
    got = sorted((r["k0"], r["distinct_cnt"]) for r in d2.result().collect())
    assert got == [("created", 1), ("payed", 1)]

    # a fresh accumulator WITHOUT restore on the same checkpoint would
    # have seen only b1 — the failure mode the store exists to prevent
    t3 = IncrementalTopK(pk="id", group_cols=["status"], order_col="amount", k=2)
    t3.attach(src.stream_changelog(spark, str(d)), checkpoint_root=ck).awaitTermination(120)
    assert t3.result() is None or _topk_rows(t3.result()) != _topk_rows(t2.result())


def test_incremental_join_agg_state_survives_restart(spark, tmp_path):
    """The composed join→agg chain under a real restart: fold prefix
    batches with state_dirs, discard both objects, restore fresh ones,
    fold the remaining batches (including a fact-side update whose
    retraction must hit the RESTORED join state), pin against recompute
    and against a never-restarted run."""
    from flink_streaming_etl_spark.streaming.incremental_join import (
        IncrementalJoin,
        IncrementalJoinAgg,
    )
    from tests.test_round9 import _join_scenario

    from pyspark.sql import functions as F

    def mk(state_root=None):
        join = IncrementalJoin(
            left_pk="id", right_pk="id", left_key="user_id", right_key="id",
            state_dir=None if state_root is None else f"{state_root}/join",
        )
        agg = IncrementalJoinAgg(
            join,
            group_cols={"user_id": "user_id",
                        "cday": F.substring("ctime", 1, 10)},
            amount=F.col("amount"),
            predicate=F.col("status") != "closed",
            state_dir=None if state_root is None else f"{state_root}/agg",
        )
        return join, agg

    L, R, batches = _join_scenario(spark)
    root = str(tmp_path / "state")

    _, agg1 = mk(root)
    for i, (ll, rr) in enumerate(batches[:2]):
        agg1.apply(L(ll), R(rr), batch_id=i)
    del agg1  # restart: in-memory state gone

    join2, agg2 = mk(root)
    assert join2.restore(spark)
    assert agg2.restore(spark)
    for i, (ll, rr) in enumerate(batches[2:], start=2):
        agg2.apply(L(ll), R(rr), batch_id=i)
    assert _rows(agg2.result()) == _rows(agg2.recompute())

    # equals the never-restarted run
    _, agg3 = mk(None)
    for i, (ll, rr) in enumerate(batches):
        agg3.apply(L(ll), R(rr), batch_id=i)
    assert _rows(agg2.result()) == _rows(agg3.result())


def test_label_centroid_confusion_semantics(spark):
    """Two tight same-direction labels report cosine ~1; an orthogonal
    third reports ~0; n_a/n_b count members; pairs are a < b exactly
    once."""
    rows = []
    for i in range(4):   # label "a": along e0
        v = [0.0] * 8; v[0] = 1.0; v[1] = 0.01 * i
        rows.append((i, v, "a"))
    for i in range(3):   # label "b": same direction as a
        v = [0.0] * 8; v[0] = 2.0; v[2] = 0.01 * i
        rows.append((10 + i, v, "b"))
    for i in range(2):   # label "c": orthogonal (e3)
        v = [0.0] * 8; v[3] = 1.0
        rows.append((20 + i, v, "c"))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    from flink_streaming_etl_spark.operators import similarity as sim

    out = {(r["label_a"], r["label_b"]): r
           for r in sim.label_centroid_confusion(emb).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")]["n_a"] == 4 and out[("a", "b")]["n_b"] == 3
    assert out[("a", "b")]["cosine"] > 0.99
    assert abs(out[("a", "c")]["cosine"]) < 0.05
    assert abs(out[("b", "c")]["cosine"]) < 0.05


def test_top_event_paths_sessionizes_and_truncates(spark):
    """Events 10 min apart share a session (path joins in ts order);
    a >30-min gap splits; paths truncate at max_steps."""
    from datetime import datetime

    from flink_streaming_etl_spark.operators import analytics as an

    base = datetime(2024, 3, 1, 12, 0)
    rows = [
        # u1 session 1: view > click > purchase (10-min spacing)
        (1, datetime(2024, 3, 1, 12, 0), 1, "view", 0.0, "{}"),
        (2, datetime(2024, 3, 1, 12, 10), 1, "click", 0.0, "{}"),
        (3, datetime(2024, 3, 1, 12, 20), 1, "purchase", 0.0, "{}"),
        # u1 session 2 (2 h later): view alone
        (4, datetime(2024, 3, 1, 14, 30), 1, "view", 0.0, "{}"),
        # u2: 7 rapid events → truncated to the first 5
        *[(10 + i, datetime(2024, 3, 1, 12, i), 2, t, 0.0, "{}")
          for i, t in enumerate(["a", "b", "c", "d", "e", "f", "g"])],
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["path"]: r["n_sessions"] for r in an.top_event_paths(ev).collect()}
    assert got == {"view>click>purchase": 1, "view": 1, "a>b>c>d>e": 1}


def test_ann_graph_expand_recall_dominates_bucket_tier(spark):
    """The expanded candidate set is a superset of the bucket tier, so
    recall vs brute-force top-k can only improve — measured on the gate
    embeddings: expanded recall >= bucket recall, and the expansion
    genuinely adds at least one true neighbor the bucket tier missed
    (guards against an expansion that joins nothing)."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    truth = {}
    for r in sim.cosine_topk(emb).collect():  # brute-force ground truth
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
        total = sum(len(t) for t in truth.values())
        return hits / total, got

    # plain bucket tier, reranked to the same top-k shape via multiprobe
    # with zero flips == pure bucket candidates
    r_bucket, got_b = recall(sim.ann_lsh_multiprobe(emb, n_flip=0))
    r_exp, got_e = recall(sim.ann_graph_expand(emb))
    assert r_exp >= r_bucket, (r_exp, r_bucket)
    gained = sum(
        len((got_e.get(q, set()) - got_b.get(q, set())) & t)
        for q, t in truth.items()
    )
    assert gained > 0, "expansion never added a true neighbor"


def test_graph_clustering_report_on_known_graph(spark):
    """A 4-clique in one orthant: every node has degree 3, wedges 3,
    triangles C(3,2)=3, coefficient 1.0; an isolated pair has degree 1
    and NULL coefficient."""
    import math

    dim = 8

    def vec(i, eps):
        v = [1.0] + [0.0] * (dim - 1)
        v[1 + i] = eps
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [(i, vec(i, 0.1), "a") for i in range(4)]  # clique bucket
    lone = [0.0] * dim
    lone[1] = -1.0
    lone2 = list(lone); lone2[2] = 0.1
    rows += [(10, lone, "b"), (11, lone2, "b")]  # a far 2-node bucket
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    from flink_streaming_etl_spark.operators import similarity as sim

    out = {r["node_id"]: r for r in sim.graph_clustering_report(emb, k=3).collect()}
    for i in range(4):
        r = out[i]
        assert (r["degree"], r["wedges"], r["triangles"]) == (3, 3, 3)
        assert r["clustering_coeff"] == 1.0
    for i in (10, 11):
        assert out[i]["degree"] == 1 and out[i]["triangles"] == 0
        assert out[i]["clustering_coeff"] is None


def test_event_path_accumulator_equals_batch(spark):
    """EventPathAccumulator over ANY batch-monotone split of the events
    table equals the batch operator's full path frequencies — including
    sessions that span batch boundaries (stitching) and the trailing
    open sessions."""
    from flink_streaming_etl_spark.operators import analytics as an
    from flink_streaming_etl_spark.streaming.paths import EventPathAccumulator

    ev = _tables(spark)["events"]
    # batch operator, un-limited head = ground truth
    want = sorted(
        (r["path"], r["n_sessions"])
        for r in an.top_event_paths(ev, top_n=10**9).collect()
    )

    # batch-monotone split: thirds by event time
    ordered = ev.orderBy("ts", "event_id").collect()
    n = len(ordered)
    cuts = [ordered[: n // 3], ordered[n // 3 : 2 * n // 3], ordered[2 * n // 3 :]]
    acc = EventPathAccumulator()
    for i, rows in enumerate(cuts):
        batch = spark.createDataFrame(rows, ev.schema)
        acc.add_batch(batch, batch_id=i)
    got = sorted(tuple(r) for r in acc.result(spark).collect())
    assert got == want

    # replay no-op
    acc.add_batch(spark.createDataFrame(cuts[-1], ev.schema), batch_id=2)
    assert sorted(tuple(r) for r in acc.result(spark).collect()) == want


def test_event_path_accumulator_stitch_and_retention(spark):
    """A session spanning the batch boundary stitches into one path; an
    idle user's open session is CLOSED (not dropped) by retention."""
    from datetime import datetime

    from flink_streaming_etl_spark.streaming.paths import EventPathAccumulator

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    b0 = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 12, 0), 1, "view", 0.0, "{}"),
         (2, datetime(2024, 1, 1, 12, 10), 1, "click", 0.0, "{}")], schema)
    # 12:25 is within the 30-min gap of 12:10 → same session
    b1 = spark.createDataFrame(
        [(3, datetime(2024, 1, 1, 12, 25), 1, "purchase", 0.0, "{}")], schema)
    acc = EventPathAccumulator(retention_batches=2)
    acc.add_batch(b0, batch_id=0)
    acc.add_batch(b1, batch_id=1)
    got = {r["path"]: r["n_sessions"] for r in acc.result(spark).collect()}
    assert got == {"view>click>purchase": 1}

    # two idle batches later the open session closes into the counts
    empty = spark.createDataFrame([], schema)
    acc.add_batch(empty, batch_id=2)
    acc.add_batch(empty, batch_id=3)
    assert acc.open == {}
    closed = {r["path"]: r["n_sessions"]
              for r in acc.result(spark, include_open=False).collect()}
    assert closed == {"view>click>purchase": 1}


def test_data_quality_report_catches_violations(spark):
    """Inject one violation of each class and check the counts: a
    duplicate key, a NULL custkey, an orphan custkey, a non-positive
    price, an out-of-range date, an unknown status."""
    from datetime import datetime

    from flink_streaming_etl_spark.operators import analytics as an

    schema = ("o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    ok = (1, 10, "O", 100.0, datetime(1995, 6, 1), "1-URGENT")
    rows = [
        ok,
        (1, 10, "O", 50.0, datetime(1995, 6, 2), "1-URGENT"),      # dup key
        (3, None, "O", 50.0, datetime(1995, 6, 2), "1-URGENT"),    # null custkey
        (4, 999, "O", 50.0, datetime(1995, 6, 2), "1-URGENT"),     # orphan
        (5, 10, "O", 0.0, datetime(1995, 6, 2), "1-URGENT"),       # non-positive
        (6, 10, "O", 50.0, datetime(2010, 1, 1), "1-URGENT"),      # date range
        (7, 10, "X", 50.0, datetime(1995, 6, 2), "1-URGENT"),      # bad status
    ]
    orders = spark.createDataFrame(rows, schema)
    customer = spark.createDataFrame(
        [(10, "a", 1, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double, c_mktsegment string",
    )
    got = {r["check_name"]: r for r in an.data_quality_report(orders, customer).collect()}
    exp = {
        "orderkey_unique": 1,
        "custkey_complete": 1,
        "custkey_references_customer": 1,
        "totalprice_positive": 1,
        "orderdate_in_range": 1,
        "status_in_domain": 1,
    }
    for name, v in exp.items():
        assert got[name]["n_violations"] == v, (name, got[name])
        assert got[name]["passed"] is False
        assert got[name]["n_checked"] == 7


def test_data_quality_accumulator_equals_batch(spark):
    """DataQualityAccumulator over any batch split of orders equals the
    batch operator on the union — including a cross-batch duplicate key
    (invisible to either batch alone) and replay no-ops."""
    from flink_streaming_etl_spark.operators import analytics as an
    from flink_streaming_etl_spark.streaming.data_quality import (
        DataQualityAccumulator,
    )

    t = _tables(spark)
    orders, customer = t["orders"], t["customer"]
    dim = {r["c_custkey"] for r in customer.select("c_custkey").collect()}

    rows = orders.orderBy("o_orderkey").collect()
    n = len(rows)
    # duplicate one key ACROSS the split boundary
    dup = rows[0]
    batches = [rows[: n // 2], rows[n // 2 :] + [dup]]
    acc = DataQualityAccumulator(dim_keys=dim)
    for i, rs in enumerate(batches):
        acc.add_batch(spark.createDataFrame(rs, orders.schema), batch_id=i)

    union = spark.createDataFrame(rows + [dup], orders.schema)
    want = sorted(tuple(r) for r in an.data_quality_report(union, customer).collect())
    got = sorted(tuple(r) for r in acc.result(spark).collect())
    assert got == want
    assert acc.violations["orderkey_unique"] == 1  # the cross-batch dup

    before = got
    acc.add_batch(spark.createDataFrame(batches[-1], orders.schema), batch_id=1)
    assert sorted(tuple(r) for r in acc.result(spark).collect()) == before


def test_state_store_crash_mid_save_keeps_previous_version(spark, tmp_path):
    """The data-then-pointer protocol: relation files for a NEWER
    version on disk without a meta flip (a crash mid-save) must be
    invisible — load() returns the last complete version; the next
    successful save supersedes and prunes."""
    import os

    from flink_streaming_etl_spark.streaming.state_store import (
        AccumulatorStateStore,
    )

    store = AccumulatorStateStore(str(tmp_path / "st"))
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    store.save(1, {"rel": df1}, extra={"tag": "v1"})

    # crash mid-save of v2: relations written, meta NOT flipped
    df2 = spark.createDataFrame([(2, "b")], "k long, v string")
    df2.write.mode("overwrite").parquet(
        os.path.join(store.root, "b2", "rel.parquet")
    )

    bid, rels, extra = store.load(spark)
    assert bid == 1 and extra == {"tag": "v1"}
    assert [tuple(r) for r in rels["rel"].collect()] == [(1, "a")]

    # a SUCCESSFUL v2 save flips the pointer and prunes v1
    store.save(2, {"rel": df2}, extra={"tag": "v2"})
    bid, rels, extra = store.load(spark)
    assert bid == 2 and extra == {"tag": "v2"}
    assert [tuple(r) for r in rels["rel"].collect()] == [(2, "b")]
    assert not os.path.exists(os.path.join(store.root, "b1"))
