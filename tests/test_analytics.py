"""Behavioral + plan + error-bound tests for the analytics extension battery
(operators/analytics.py). Oracle parity is covered by test_oracle_parity.py;
these pin semantics the hash-compare can't see: plan shapes (semi/anti join
strategy, single window shuffle, no cartesian in the range join) and sketch
error bounds vs exact answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_etl_spark.catalog import load_tables
from flink_streaming_etl_spark.operators import analytics
from flink_streaming_etl_spark.plans import plan_text
from tests.conftest import SF_SMOKE


def _tables(spark):
    return load_tables(spark, SF_SMOKE, register=False)


def test_semi_anti_join_plans(spark):
    t = _tables(spark)
    anti = plan_text(analytics.customers_without_orders(t["customer"], t["orders"]))
    semi = plan_text(analytics.big_spender_customers(t["customer"], t["orders"]))
    # Planned as true semi/anti joins (no row duplication, keys-only build),
    # not rewritten through an aggregate+outer-join.
    assert "LeftAnti" in anti, anti
    assert "LeftSemi" in semi, semi


def test_window_battery_single_shuffle_for_main_spec(spark):
    t = _tables(spark)
    p = plan_text(analytics.window_battery(t["orders"]))
    # Two partition specs (custkey/date and custkey/price) must reuse ONE
    # exchange on o_custkey: same hash partitioning, only re-sort differs.
    assert p.count("hashpartitioning(o_custkey") == 1, p
    assert p.count("Window") >= 2, p


def test_range_join_is_not_cartesian(spark):
    t = _tables(spark)
    p = plan_text(analytics.clicks_before_purchase(t["events"]))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p or "user_id" not in p.split(
        "BroadcastNestedLoopJoin"
    )[0], p


def test_rollup_levels_are_consistent(spark):
    t = _tables(spark)
    rows = analytics.revenue_rollup(t["customer"], t["nation"], t["region"]).collect()
    by_lvl = {}
    for r in rows:
        by_lvl.setdefault(r["lvl"], []).append(r)
    # lvl 0 = leaf, 1 = per-region subtotal, 3 = grand total; each level's
    # customer count must re-aggregate to the same grand total.
    assert set(by_lvl) == {0, 1, 3}
    grand = by_lvl[3][0]["n_customers"]
    assert sum(r["n_customers"] for r in by_lvl[0]) == grand
    assert sum(r["n_customers"] for r in by_lvl[1]) == grand
    assert len(by_lvl[3]) == 1


def test_pivot_counts_sum_to_group_totals(spark):
    t = _tables(spark)
    piv = analytics.order_priority_pivot(t["orders"]).collect()
    totals = {
        r["o_orderstatus"]: r["cnt"]
        for r in t["orders"].groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for r in piv:
        row_sum = sum(r[f"p{i}_cnt"] for i in range(1, 6))
        assert row_sum == totals[r["o_orderstatus"]]


def test_sketch_profile_error_bounds(spark):
    t = _tables(spark)
    approx = {r["event_type"]: r for r in analytics.sketch_profile(t["events"]).collect()}
    exact = {
        r["event_type"]: r
        for r in t["events"]
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        assert abs(a["approx_users"] - e["users"]) <= max(2, 0.05 * e["users"]), et
        # percentile_approx with accuracy=10000 on ~1e3 rows per group is
        # exact up to rank error 0; allow a loose value tolerance anyway.
        assert abs(a["value_p50"] - e["p50"]) <= 0.05 * max(1.0, abs(e["p50"])), et
        assert a["n_events"] == e["n"]


def test_tfidf_scores_rank_rare_terms_above_common(spark):
    t = _tables(spark)
    scored = analytics.tfidf_top_terms(t["documents"], k=3)
    rows = scored.limit(200).collect()
    assert rows, "tfidf produced no rows"
    # rank is dense per doc and scores are non-increasing within a doc
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in per_doc.values():
        doc_rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in doc_rows] == list(range(1, len(doc_rows) + 1))
        scores = [r["score"] for r in doc_rows]
        assert scores == sorted(scores, reverse=True)


def test_redact_pii_scrubs_injected_pii(spark):
    from flink_streaming_etl_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "contact me at alice.smith+x@example.co.uk or 555-867-5309 x"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.org and phone +1 415.555.2671 end"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_ops.redact_pii(df).collect()}
    assert "[EMAIL]" in rows[1]["clean_text"] and "[PHONE]" in rows[1]["clean_text"]
    assert "@" not in rows[1]["clean_text"]
    assert rows[1]["n_emails"] == 1 and rows[1]["n_phones"] == 1
    assert rows[2]["clean_text"] == "no pii here at all"
    assert rows[2]["n_emails"] == 0 and rows[2]["n_phones"] == 0
    assert rows[3]["n_emails"] == 2 and rows[3]["n_phones"] == 1


def test_chunk_documents_covers_and_overlaps(spark):
    from flink_streaming_etl_spark.operators import text as text_ops

    t = _tables(spark)
    docs = t["documents"].limit(50).cache()
    chunks = text_ops.chunk_documents(docs, chunk=32, stride=24).collect()
    toks = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n")
        ).collect()
    }
    per_doc = {}
    for r in chunks:
        per_doc.setdefault(r["doc_id"], []).append(r)
    assert set(per_doc) == set(toks)
    for doc_id, rs in per_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        # contiguous chunk indexes from 0, all tokens covered, every chunk
        # bounded by the window size, stride-overlap reconstruction exact
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        assert all(1 <= r["n_tokens"] <= 32 for r in rs)
        covered = 24 * (len(rs) - 1) + rs[-1]["n_tokens"]
        assert covered == toks[doc_id]


def test_lsh_bucket_cap_semantics(spark):
    from flink_streaming_etl_spark.operators import dedup

    docs = _tables(spark)["documents"].limit(200).cache()
    base = {
        (r["a_id"], r["b_id"]) for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    # A cap larger than any bucket changes nothing.
    loose = {
        (r["a_id"], r["b_id"])
        for r in dedup.minhash_lsh_pairs(docs, max_bucket=10**6).collect()
    }
    assert loose == base
    # max_bucket=1 kills every candidate (a pairing bucket has >= 2 docs).
    assert dedup.minhash_lsh_pairs(docs, max_bucket=1).count() == 0
    # Intermediate caps only ever remove pairs, never invent them.
    capped = {
        (r["a_id"], r["b_id"])
        for r in dedup.minhash_lsh_pairs(docs, max_bucket=3).collect()
    }
    assert capped <= base


def test_ann_plane_count_dial(spark):
    from flink_streaming_etl_spark.operators import similarity

    emb = load_tables(spark, SF_SMOKE, register=False)["embeddings"]
    base = similarity.ann_lsh_bucketed(emb, n_planes=6)
    finer = similarity.ann_lsh_bucketed(emb, n_planes=9)
    base_pairs = {(r["a_id"], r["b_id"]) for r in base.collect()}
    finer_pairs = {(r["a_id"], r["b_id"]) for r in finer.collect()}
    # More planes → strictly fewer-or-equal candidates (buckets refine:
    # a 9-bit bucket match implies the 6-bit prefix matched).
    assert finer_pairs <= base_pairs
    assert len(finer_pairs) < len(base_pairs)


def test_mixture_sample_hits_target_shares(spark):
    from flink_streaming_etl_spark.operators import text as text_ops

    docs = load_tables(spark, "/root/testdata/sf0.01", register=False)["documents"]
    total = docs.count()
    target = 0.03
    out = text_ops.mixture_sample(docs, target_share=target)
    got = {r["source"]: r["cnt"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    src = {r["source"]: r["cnt"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for s, n in src.items():
        want = min(n, target * total)
        # hash-Bernoulli: binomial noise around the target share
        assert abs(got.get(s, 0) - want) <= max(10, 0.35 * want), (s, got.get(s), want)


def test_weighted_sample_prefers_high_quality(spark):
    from flink_streaming_etl_spark.operators import text as text_ops

    docs = load_tables(spark, "/root/testdata/sf0.01", register=False)["documents"]
    q = text_ops.quality_score(docs).select("doc_id", "quality")
    kept = text_ops.weighted_sample(docs).select("doc_id").withColumn("kept", F.lit(1))
    joined = q.join(kept, "doc_id", "left").fillna(0, ["kept"])
    rows = joined.groupBy((F.col("quality") > 0.7).alias("hi")).agg(
        F.avg("kept").alias("keep_rate")
    ).collect()
    rates = {r["hi"]: r["keep_rate"] for r in rows}
    assert rates.get(True, 0) > rates.get(False, 1), rates


def test_salted_join_equals_plain_join(spark):
    """Salting is a physical rewrite only: result set identical to the
    plain equi-join, on a synthetically hot-keyed fact table (half the
    rows share one key)."""
    from flink_streaming_etl_spark.operators.relational import salted_join

    t = load_tables(spark, SF_SMOKE, register=False)
    # skew: fold half the user_ids onto one hot key
    fact = t["events"].select(
        "event_id",
        F.when(F.col("user_id") % 2 == 0, F.lit(7)).otherwise(F.col("user_id")).alias("user_id"),
        "value",
    )
    dim = fact.select("user_id").distinct().withColumn("attr", F.col("user_id") * 10)

    plain = fact.join(dim, "user_id")
    salted = salted_join(fact, dim, "user_id", n_salts=8)
    assert salted.count() == plain.count()
    a = plain.agg(F.sum("event_id"), F.sum("attr")).collect()
    b = salted.agg(F.sum("event_id"), F.sum("attr")).collect()
    assert a == b


def test_small_quantity_revenue_crafted(spark):
    """Part 1: avg qty 10 → threshold 2; only the qty-1 line is small.
    Exact cross-multiplied comparison (no division) must match."""
    from flink_streaming_etl_spark.operators import analytics as an

    rows = [
        # (orderkey, partkey, suppkey, linenumber, qty, extprice)
        (1, 1, 1, 1, 1.0, 700.0),    # small: 1*5*3=15 < 29
        (2, 1, 1, 1, 14.0, 10.0),
        (3, 1, 1, 1, 14.0, 10.0),
        (4, 2, 1, 1, 5.0, 99.0),     # sole line: 5*5*1=25 >= 5 → not small
    ]
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double",
    )
    out = an.small_quantity_revenue(li).collect()[0]
    assert out["n_small_lines"] == 1
    assert out["avg_yearly"] == 100.0


def test_cheapest_supplier_argmin_tiebreak(spark):
    """Equal unit prices → the LOWEST suppkey wins (struct-min tie-break)."""
    from flink_streaming_etl_spark.operators import analytics as an

    li = spark.createDataFrame(
        [
            (1, 1, 7, 1, 2.0, 20.0),  # price 10, supp 7
            (2, 1, 3, 1, 4.0, 40.0),  # price 10, supp 3 → wins
            (3, 1, 9, 1, 1.0, 50.0),  # price 50
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long, "
        "l_quantity double, l_extendedprice double",
    )
    supp = spark.createDataFrame(
        [(3, "S3", 0, 0.0), (7, "S7", 0, 0.0), (9, "S9", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    out = an.cheapest_supplier_per_part(li, supp).collect()
    assert len(out) == 1
    assert out[0]["s_suppkey"] == 3 and out[0]["s_name"] == "S3"
    assert out[0]["unit_price"] == 10.0


def test_cusum_detects_level_shift(spark):
    """Hand-built series: 10 flat days at 100, then 10 at 200 — the
    upward CUSUM must alarm shortly after the shift and the downward
    side must stay quiet; before the shift both stay under threshold."""
    from datetime import date, timedelta

    from flink_streaming_etl_spark.operators.analytics import cusum_changepoints

    d0 = date(2024, 1, 1)
    rows = []
    for i in range(20):
        price = 100.0 if i < 10 else 200.0
        rows.append((i + 1, 7, "P", price, d0 + timedelta(days=i)))
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderpriority string, "
        "o_totalprice double, o_orderdate date",
    )
    out = {
        r["day"]: (r["alarm_up"], r["alarm_down"])
        for r in cusum_changepoints(orders).collect()
    }
    assert len(out) == 20
    # mean day = 150: days 1-10 accumulate downward drift of 50/day ->
    # with the virtual zero prefix P_0=0 in the extremum the DOWNWARD
    # cusum is 50/150=0.33 mean-days after day 1 and crosses
    # half-a-mean-day (0.5) by day 2; after the shift the upward side
    # accumulates +50/day from the clamped running min and crosses by
    # day 12
    assert out["2024-01-01"] == (False, False)
    assert out["2024-01-02"][1] is True       # persistent low regime
    assert out["2024-01-12"][0] is True       # upward shift detected
    assert out["2024-01-20"][0] is True       # and it stays alarmed
