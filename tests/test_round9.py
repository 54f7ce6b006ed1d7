"""Round-9 additions: two-stage PQ rerank, the pinned Lloyd UPDATE step,
semantic decontamination, the shingle-decontamination APPLY stage, the
media duplication-rate report, and the event transition matrix. Value
correctness for the oracle-backed entries is covered every run by
tests/test_oracle_parity.py; these tests pin the definitional invariants
and the plan shapes that carry to 100 TB."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
from pyspark.sql import functions as F

from flink_streaming_etl_spark.catalog import load_tables
from flink_streaming_etl_spark.plans import plan_text
from tests.conftest import SF_SMOKE


def _tables(spark):
    return load_tables(spark, SF_SMOKE, register=False)


def _q6(x: float) -> float:
    return math.floor(x * 1000000.0) / 1000000.0


# ---------------------------------------------------------------------------
# ann_pq_rerank


def test_pq_rerank_is_exact_topk_of_shortlist(spark):
    """Definitional: the reranked result must equal the exact-q6-cosine
    top-k of the ADC shortlist, computed independently with numpy here."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    short = sim.ann_ivf_pq(emb, k=sim.RERANK_SHORTLIST).collect()
    got = sim.ann_pq_rerank(emb).collect()

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        # left-associated fold, same as vec_dot / list_dot_product
        dot = na = nb = 0.0
        for j in range(len(va)):
            dot += va[j] * vb[j]
            na += va[j] * va[j]
            nb += vb[j] * vb[j]
        return _q6(dot / (math.sqrt(na) * math.sqrt(nb)))

    by_query: dict[int, list[int]] = {}
    for r in short:
        by_query.setdefault(r["query_id"], []).append(r["neighbor_id"])
    want = {}
    for q, cands in by_query.items():
        ranked = sorted(cands, key=lambda n: (-cos(q, n), n))[: sim.TOP_K]
        want[q] = [(n, cos(q, n)) for n in ranked]

    got_by_q: dict[int, list[tuple[int, float]]] = {}
    for r in sorted(got, key=lambda r: (r["query_id"], -r["cosine"], r["neighbor_id"])):
        got_by_q.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["cosine"])
        )
    assert got_by_q == want


def test_pq_rerank_recall_at_least_adc_only(spark):
    """The reason the stage exists: exact rescoring of a 4x shortlist must
    not lose recall vs trusting the ADC order for the final k."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.cosine_topk(emb).collect()
    }
    adc = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ann_ivf_pq(emb).collect()
    }
    rer = {
        (r["query_id"], r["neighbor_id"])
        for r in sim.ann_pq_rerank(emb).collect()
    }
    assert len(rer & exact) >= len(adc & exact)


def test_pq_rerank_corpus_side_not_shuffled(spark):
    """Scale pin: the rescoring stage must BROADCAST the shortlist and the
    query vectors — relative to the shortlist generation (whose internal
    corpus-keyed joins legitimately sort-merge), the rerank adds ZERO
    sort-merge joins and at least two broadcast joins."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    base = plan_text(sim.ann_ivf_pq(emb, k=sim.RERANK_SHORTLIST))
    full = plan_text(sim.ann_pq_rerank(emb))
    assert full.count("SortMergeJoin") == base.count("SortMergeJoin"), full
    assert full.count("BroadcastHashJoin") >= base.count("BroadcastHashJoin") + 2


# ---------------------------------------------------------------------------
# kmeans_update_pinned


def test_kmeans_update_matches_numpy(spark):
    """The per-(cell, dim) means must equal an independent numpy
    recomputation of the same quantized-integer fold."""
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    assign = {
        r["vec_id"]: r["centroid_idx"]
        for r in sim.kmeans_assign_pinned(emb).collect()
    }
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    sums: dict[tuple[int, int], int] = {}
    counts: dict[int, int] = {}
    for vid, cell in assign.items():
        counts[cell] = counts.get(cell, 0) + 1
        for j, x in enumerate(vecs[vid]):
            key = (cell, j)
            sums[key] = sums.get(key, 0) + math.floor(float(x) * 10000.0)
    got = {
        (r["centroid_idx"], r["dim"]): (r["n_members"], r["mean_coord"])
        for r in sim.kmeans_update_pinned(emb).collect()
    }
    assert set(got) == set(sums)
    for (cell, j), (n, mean) in got.items():
        assert n == counts[cell]
        assert mean == _q6(sums[(cell, j)] / (counts[cell] * 10000.0))


def test_kmeans_update_partial_aggregation(spark):
    """Scale pin: the (cell, dim) fold must be a partial+final hash
    aggregation (map-side combine), so the exploded n·d rows never cross
    an exchange unreduced."""
    from flink_streaming_etl_spark.operators import similarity as sim

    p = plan_text(sim.kmeans_update_pinned(_tables(spark)["embeddings"]))
    assert p.count("HashAggregate") >= 2, p


# ---------------------------------------------------------------------------
# semantic_contamination_check


def test_semantic_contamination_total_and_consistent(spark):
    """Every eval vector appears exactly once; flags are consistent with
    counts; candidate counts are bucket-bounded (<= train bucket size)."""
    from flink_streaming_etl_spark.functions import md5_int
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    out = sim.semantic_contamination_check(emb).collect()
    n_eval = emb.filter(
        F.pmod(
            md5_int(F.col("vec_id").cast("string"), salt="semsplit"),
            F.lit(sim.SEM_CONTAM_EVAL_BUCKETS),
        )
        == 0
    ).count()
    assert len(out) == n_eval
    assert len({r["vec_id"] for r in out}) == n_eval
    for r in out:
        assert 0 <= r["n_hits"] <= r["n_candidates"]
        assert r["is_contaminated"] == (r["n_hits"] > 0)
        if r["n_candidates"] == 0:
            assert r["max_cosine"] is None


def test_semantic_contamination_finds_planted_dup(spark):
    """A train vector identical to an eval vector (same orthant by
    construction) must flag that eval vector."""
    from flink_streaming_etl_spark.functions import md5_int
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    # find one eval vec_id, plant an identical train vector with a fresh id
    is_eval = (
        F.pmod(
            md5_int(F.col("vec_id").cast("string"), salt="semsplit"),
            F.lit(sim.SEM_CONTAM_EVAL_BUCKETS),
        )
        == 0
    )
    ev_row = emb.filter(is_eval).orderBy("vec_id").first()
    clone_id = 1_000_003  # md5('semsplit:1000003') % 10 != 0 → lands in train
    clone = emb.sparkSession.createDataFrame(
        [(clone_id, ev_row["embedding"], ev_row["label"])], emb.schema
    )
    out = sim.semantic_contamination_check(emb.unionByName(clone))
    hit = out.filter(F.col("vec_id") == ev_row["vec_id"]).first()
    assert hit["is_contaminated"]
    assert hit["max_cosine"] >= 0.999999


# ---------------------------------------------------------------------------
# decontaminate_apply


def test_decontaminate_apply_drops_leaked_train_doc(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon", "en", "src0", 30),
            (1, "alpha beta gamma delta epsilon", "en", "src1", 30),  # leaked
            (2, "zeta eta theta iota kappa", "en", "src1", 25),  # clean
            (3, "alpha beta completely different tail", "en", "src2", 35),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from flink_streaming_etl_spark.operators import dedup

    kept = {r["doc_id"] for r in dedup.decontaminate_apply(docs).collect()}
    assert 1 not in kept  # 100% shingle overlap with eval
    assert 2 in kept  # zero overlap
    # doc 3 shares 1 of 4 shingles ('alpha beta') = 0.25 >= 0.2 → dropped
    assert 3 not in kept
    assert 0 not in kept  # eval docs are never part of the train output


def test_decontaminate_apply_partitions_train(spark):
    """kept ∪ dropped = train corpus: the apply stage only ever removes."""
    from flink_streaming_etl_spark.operators import dedup

    docs = _tables(spark)["documents"]
    kept = dedup.decontaminate_apply(docs)
    train_n = docs.filter(F.col("source") != "src0").count()
    kept_n = kept.count()
    assert kept_n <= train_n
    # kept ids must be a subset of train ids
    bad = kept.join(
        docs.filter(F.col("source") != "src0").select("doc_id"),
        "doc_id",
        "left_anti",
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# media_dup_rate_report


def test_media_dup_rate_all_row_is_sum_of_types(spark):
    from flink_streaming_etl_spark.operators import multimodal as mm

    rows = {r["media_type"]: r for r in mm.media_dup_rate_report(
        _tables(spark)["documents"]
    ).collect()}
    assert set(rows) == {"image", "audio", "video", "(all)"}
    per_type = [rows[t] for t in ("image", "audio", "video")]
    assert rows["(all)"]["n_media"] == sum(r["n_media"] for r in per_type)
    assert rows["(all)"]["n_chunks"] == sum(r["n_chunks"] for r in per_type)
    assert rows["(all)"]["n_dup_chunks"] == sum(
        r["n_dup_chunks"] for r in per_type
    )
    for r in rows.values():
        assert 0.0 <= r["dup_chunk_fraction"] <= 1.0
        assert r["n_affected_media"] <= r["n_media"]


def test_media_dup_rate_counts_planted_dup(spark):
    """Two payload-identical media must both count as affected, and all
    their chunks as duplicated."""
    from flink_streaming_etl_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [
            (0, "x " * 200, "en", "src0", 400),
            (3, "x " * 200, "en", "src0", 400),  # same type (both % 3 == 0)
            (6, "completely different payload body", "en", "src0", 33),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["media_type"]: r for r in mm.media_dup_rate_report(docs).collect()}
    img = rows["image"]
    assert img["n_affected_media"] == 2
    assert img["n_dup_chunks"] > 0


# ---------------------------------------------------------------------------
# event_transition_report


def test_event_transitions_count_and_probabilities(spark):
    from flink_streaming_etl_spark.operators import analytics as an

    ev = _tables(spark)["events"]
    out = an.event_transition_report(ev).collect()
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in out) == n_events - n_users
    by_from: dict[str, float] = {}
    for r in out:
        by_from[r["from_type"]] = by_from.get(r["from_type"], 0.0) + r["p_transition"]
    for s in by_from.values():
        # q6 floors each term, so the sum is <= 1 and within 5 ulp·rows
        assert 1.0 - 5e-5 <= s <= 1.0 + 1e-9


def test_event_transitions_deterministic_tiebreak(spark):
    """Two events at the SAME timestamp must order by event_id."""
    from flink_streaming_etl_spark.operators import analytics as an

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    ev = spark.createDataFrame(
        [
            (1, t, 7, "view", 1.0, "{}"),
            (2, t, 7, "click", 1.0, "{}"),  # same ts: event_id orders it 2nd
            (3, t + dt.timedelta(seconds=5), 7, "purchase", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in an.event_transition_report(ev).collect()
    }
    assert got == {("view", "click"): 1, ("click", "purchase"): 1}


# ---------------------------------------------------------------------------
# IncrementalJoin (streaming/incremental_join.py)

CUSTOMER_SCHEMA_SRC = None  # built lazily (StructType import lives in test_cdc)


def _cust(cid, name, area):
    return {"id": cid, "name": name, "area": area}


def _join_scenario(spark):
    from pyspark.sql.types import StringType, StructField, StructType

    from flink_streaming_etl_spark.sources.cdc import CdcSource
    from tests.test_cdc import ORDER_SCHEMA, env, order, raw_df

    cust_schema = StructType(
        [
            StructField("id", StringType()),
            StructField("name", StringType()),
            StructField("area", StringType()),
        ]
    )
    lsrc = CdcSource("orders", ORDER_SCHEMA, "id")
    rsrc = CdcSource("customers", cust_schema, "id")

    def L(lines):
        return lsrc.parse(raw_df(spark, lines)) if lines else None

    def R(lines):
        return rsrc.parse(raw_df(spark, lines)) if lines else None

    batches = [
        # 1: dimension side first — no join rows yet
        (None, [env("c", _cust("u1", "ann", "EU"), ts=1),
                env("c", _cust("u2", "bob", "US"), ts=2)]),
        # 2: facts arrive; o3 references a customer that doesn't exist yet
        ([env("c", order("o1", "u1", 100.0, "payed"), ts=3),
          env("c", order("o2", "u2", 50.0, "payed"), ts=4),
          env("c", order("o3", "u3", 30.0, "created"), ts=5)], None),
        # 3: BOTH sides in one batch — u3 appears (o3 starts joining),
        # u1 renamed (o1's join row updates), o4 inserted same batch as
        # the rename (exercises the ΔL⋈ΔR term)
        ([env("c", order("o4", "u1", 70.0, "payed"), ts=6)],
         [env("c", _cust("u3", "eve", "APAC"), ts=7),
          env("u", _cust("u1", "ann-marie", "EU"),
              before=_cust("u1", "ann", "EU"), ts=8)]),
        # 4: fact-side update + delete
        ([env("u", order("o1", "u1", 120.0, "payed"),
              before=order("o1", "u1", 100.0, "payed"), ts=9),
          env("d", before=order("o2", "u2", 50.0, "payed"), ts=10)], None),
        # 5: dimension delete — every remaining u3 join row retracts
        (None, [env("d", before=_cust("u3", "eve", "APAC"), ts=11)]),
    ]
    return L, R, batches


def _rows(df):
    if df is None:
        return []
    return sorted(tuple(r) for r in df.collect())


def test_incremental_join_equals_recompute_after_every_batch(spark):
    from flink_streaming_etl_spark.streaming.incremental_join import IncrementalJoin

    L, R, batches = _join_scenario(spark)
    inc = IncrementalJoin(left_pk="id", right_pk="id",
                          left_key="user_id", right_key="id")
    for i, (llines, rlines) in enumerate(batches):
        inc.apply(L(llines), R(rlines), batch_id=i)
        assert _rows(inc.result()) == _rows(inc.recompute()), f"batch {i}"
    # final state sanity: o1 (updated amount, renamed customer), o3 gone
    # (customer deleted), o2 gone (order deleted), o4 alive
    final = {r["id"]: r for r in inc.result().collect()}
    assert set(final) == {"o1", "o4"}
    assert final["o1"]["amount"] == 120.0
    assert final["o1"]["name"] == "ann-marie"


def test_incremental_join_replay_is_noop(spark):
    from flink_streaming_etl_spark.streaming.incremental_join import IncrementalJoin

    L, R, batches = _join_scenario(spark)
    inc = IncrementalJoin(left_pk="id", right_pk="id",
                          left_key="user_id", right_key="id")
    for i, (llines, rlines) in enumerate(batches[:3]):
        inc.apply(L(llines), R(rlines), batch_id=i)
    before = _rows(inc.result())
    # redeliver batch 2 under its old id — must not double-apply
    llines, rlines = batches[2]
    out = inc.apply(L(llines), R(rlines), batch_id=2)
    assert out is None
    assert _rows(inc.result()) == before


def test_incremental_join_emits_signed_deltas(spark):
    """The emitted delta relation must carry the retraction (-1 old) and
    the addition (+1 new) for an update on either side."""
    from flink_streaming_etl_spark.sources.cdc import CdcSource
    from flink_streaming_etl_spark.streaming.incremental_join import IncrementalJoin
    from tests.test_cdc import ORDER_SCHEMA, env, order, raw_df

    L, R, batches = _join_scenario(spark)
    inc = IncrementalJoin(left_pk="id", right_pk="id",
                          left_key="user_id", right_key="id")
    inc.apply(L(batches[0][0]), R(batches[0][1]), batch_id=0)
    inc.apply(L(batches[1][0]), R(batches[1][1]), batch_id=1)
    deltas = inc.apply(
        L([env("u", order("o1", "u1", 999.0, "payed"),
               before=order("o1", "u1", 100.0, "payed"), ts=99)]),
        None,
        batch_id=2,
    )
    got = {(r["id"], r["amount"], r["_sign"]) for r in deltas.collect()}
    assert got == {("o1", 100.0, -1), ("o1", 999.0, 1)}


# ---------------------------------------------------------------------------
# BloomTextDedupAccumulator (streaming/text_dedup.py)


def test_streaming_text_dedup_first_owner_semantics(spark):
    """Fed the corpus split (even ids) then the incoming split (odd ids)
    in id-ordered batches, the accumulator keeps exactly the docs that are
    the FIRST owner of their prefix fingerprint in arrival order — and its
    kept set over the odd split is a subset of the batch operator's
    (equal when no odd-odd-only fp collisions exist)."""
    from flink_streaming_etl_spark.operators.dedup import (
        _prefix_fp,
        bloom_incremental_dedup,
    )
    from flink_streaming_etl_spark.streaming.text_dedup import (
        BloomTextDedupAccumulator,
    )

    docs = _tables(spark)["documents"]
    acc = BloomTextDedupAccumulator()
    even = docs.filter(F.col("doc_id") % 2 == 0)
    odd = docs.filter(F.col("doc_id") % 2 == 1)
    # corpus first (two batches), then incoming (two batches), id-ordered
    n = docs.count()
    acc.add_batch(even.filter(F.col("doc_id") < n // 2), batch_id=0)
    acc.add_batch(even.filter(F.col("doc_id") >= n // 2), batch_id=1)
    acc.add_batch(odd.filter(F.col("doc_id") < n // 2), batch_id=2)
    acc.add_batch(odd.filter(F.col("doc_id") >= n // 2), batch_id=3)

    odd_ids = {r["doc_id"] for r in odd.select("doc_id").collect()}
    got = {r["doc_id"] for r in acc.kept_ids(spark, only=odd_ids).collect()}

    # exact first-owner oracle: corpus-first arrival = any even owner
    # precedes every odd; within the odd split, lower id arrived first
    fps = docs.select("doc_id", _prefix_fp(F.col("text")).alias("fp")).collect()
    by_fp: dict[str, list[int]] = {}
    for r in fps:
        by_fp.setdefault(r["fp"], []).append(r["doc_id"])
    want = set()
    for fp, ids in by_fp.items():
        evens = [i for i in ids if i % 2 == 0]
        odds = sorted(i for i in ids if i % 2 == 1)
        if not evens and odds:
            want.add(odds[0])
        # odd docs with an even owner: all dropped
    assert got == want

    batch_kept = {
        r["doc_id"] for r in bloom_incremental_dedup(docs).collect()
    }
    assert got <= batch_kept


def test_streaming_text_dedup_replay_and_retention(spark):
    from flink_streaming_etl_spark.streaming.text_dedup import (
        BloomTextDedupAccumulator,
    )

    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    acc = BloomTextDedupAccumulator(retention_batches=1)
    b0 = mk([(0, "the same exact prefix text here", "en", "s", 30)])
    b1 = mk([(1, "the same exact prefix text here", "en", "s", 30)])
    acc.add_batch(b0, batch_id=0)
    acc.add_batch(b1, batch_id=1)
    assert acc.kept[0] and not acc.kept[1]  # dup within retention window
    # replay of batch 1 is a no-op
    acc.add_batch(b1, batch_id=1)
    assert acc.last_batch_id == 1
    # two idle batches later the fp is evicted from the exact tier: a
    # re-arrival is kept again (retention trade-off, T5 discipline)
    acc.add_batch(mk([(10, "filler unrelated body", "en", "s", 20)]), batch_id=2)
    acc.add_batch(mk([(11, "other filler body two", "en", "s", 20)]), batch_id=3)
    b4 = mk([(5, "the same exact prefix text here", "en", "s", 30)])
    acc.add_batch(b4, batch_id=4)
    assert acc.kept[5]


# ---------------------------------------------------------------------------
# basket_lift_pairs


def test_basket_lift_on_known_baskets(spark):
    from flink_streaming_etl_spark.operators import analytics as an

    li = spark.createDataFrame(
        # baskets: {1,2} x2, {1,3} x1, {2} alone x1  → 4 orders
        [
            (10, 1), (10, 2),
            (11, 1), (11, 2),
            (12, 1), (12, 3),
            (13, 2),
        ],
        "l_orderkey long, l_partkey long",
    ).selectExpr(
        "l_orderkey", "l_partkey", "1 AS l_suppkey", "1 AS l_linenumber",
        "1.0 AS l_quantity", "1.0 AS l_extendedprice", "0.0 AS l_discount",
        "0.0 AS l_tax", "'N' AS l_returnflag", "'O' AS l_linestatus",
        "DATE '2020-01-01' AS l_shipdate",
    )
    rows = {(r["part_a"], r["part_b"]): r for r in an.basket_lift_pairs(li).collect()}
    assert set(rows) == {(1, 2)}  # only pair with count >= 2
    r = rows[(1, 2)]
    assert r["n_pair"] == 2 and r["n_a"] == 3 and r["n_b"] == 3
    assert r["support"] == _q6(2 / 4)
    # lift = (2 * 4) / (3 * 3)
    assert r["lift"] == _q6(8.0 / 9.0)


def test_basket_lift_pair_volume_is_basket_bounded(spark):
    """Scale pin: the self-join must key on the order (pair volume
    Σ C(basket,2)) — the plan has no cartesian/broadcast-nested-loop."""
    from flink_streaming_etl_spark.operators import analytics as an

    p = plan_text(an.basket_lift_pairs(_tables(spark)["lineitem"]))
    assert "CartesianProduct" not in p
    # exactly one nested-loop node: the broadcast of the 1-row totals
    # scalar (formatted plans print each node twice — tree + detail)
    assert p.count("BroadcastNestedLoopJoin") <= 2, p


# ---------------------------------------------------------------------------
# diverse_sample_report


def test_diverse_sample_one_exemplar_per_cell(spark):
    from flink_streaming_etl_spark.operators import similarity as sim

    emb = _tables(spark)["embeddings"]
    assigned = sim.kmeans_assign_pinned(emb).collect()
    by_cell: dict[int, list] = {}
    for r in assigned:
        by_cell.setdefault(r["centroid_idx"], []).append(r)
    got = {r["centroid_idx"]: r for r in sim.diverse_sample_report(emb).collect()}
    assert set(got) == set(by_cell)
    for cell, members in by_cell.items():
        want = sorted(members, key=lambda r: (-r["cosine"], r["vec_id"]))[0]
        assert got[cell]["vec_id"] == want["vec_id"]
        assert got[cell]["cosine"] == want["cosine"]
        assert got[cell]["cell_size"] == len(members)


def test_diverse_sample_is_partial_agg_not_window(spark):
    """Scale pin: the per-cell argmax folds as partial+final aggregation —
    no corpus-wide window sort in the selection stage."""
    from flink_streaming_etl_spark.operators import similarity as sim

    p = plan_text(sim.diverse_sample_report(_tables(spark)["embeddings"]))
    # exactly the assignment kernel's one window (its row_number);
    # the exemplar selection adds none
    base = plan_text(sim.kmeans_assign_pinned(_tables(spark)["embeddings"]))
    assert p.count("Window") == base.count("Window"), p


# ---------------------------------------------------------------------------
# EventTransitionAccumulator (streaming/transitions.py)


def test_streaming_transitions_equal_batch(spark):
    """Fed a batch-monotone split of the events table (by day), the
    accumulated matrix equals the batch operator on the full table."""
    from flink_streaming_etl_spark.operators.analytics import (
        event_transition_report,
    )
    from flink_streaming_etl_spark.streaming.transitions import (
        EventTransitionAccumulator,
    )

    ev = _tables(spark)["events"]
    # batch-monotone split: exact global (ts, event_id) thirds — every
    # user's batch-N events precede their batch-N+1 events in the batch
    # operator's own ordering
    keys = sorted(
        (r["ts"], r["event_id"]) for r in ev.select("ts", "event_id").collect()
    )
    c1, c2 = keys[len(keys) // 3], keys[2 * len(keys) // 3]

    def upto(cut):
        return (F.col("ts") < F.lit(cut[0])) | (
            (F.col("ts") == F.lit(cut[0])) & (F.col("event_id") <= F.lit(cut[1]))
        )

    acc = EventTransitionAccumulator()
    acc.add_batch(ev.filter(upto(c1)), batch_id=0)
    acc.add_batch(ev.filter(~upto(c1) & upto(c2)), batch_id=1)
    acc.add_batch(ev.filter(~upto(c2)), batch_id=2)

    want = sorted(tuple(r) for r in event_transition_report(ev).collect())
    got = sorted(tuple(r) for r in acc.result(spark).collect())
    assert got == want


def test_streaming_transitions_replay_and_boundary(spark):
    import datetime as dt

    from flink_streaming_etl_spark.streaming.transitions import (
        EventTransitionAccumulator,
    )

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    mk = lambda rows: spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    acc = EventTransitionAccumulator()
    acc.add_batch(mk([(1, t0, 7, "view", 1.0, "{}")]), batch_id=0)
    # boundary: stored last (view) chains to this batch's first (click)
    acc.add_batch(
        mk([(2, t0 + dt.timedelta(minutes=1), 7, "click", 1.0, "{}")]),
        batch_id=1,
    )
    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in acc.result(spark).collect()
    }
    assert got == {("view", "click"): 1}
    # replay batch 1 → no double count
    acc.add_batch(
        mk([(2, t0 + dt.timedelta(minutes=1), 7, "click", 1.0, "{}")]),
        batch_id=1,
    )
    got2 = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in acc.result(spark).collect()
    }
    assert got2 == got


def test_reference_order_view_in_delta_mode(spark):
    """Reference parity in TRUE incremental mode: the reference's
    enrichment join (flink-ddl.sql:179-190, orders ⋈ users on user_id =
    users.id) maintained by IncrementalJoin ±deltas — with per-side
    projections disambiguating the clashing ctime/utime names — equals
    the recompute join after every batch of the README seed + golden
    status-flip scenario, including a dimension-side rename and a
    fact-side delete."""
    from flink_streaming_etl_spark.streaming.incremental_join import IncrementalJoin
    from flink_streaming_etl_spark.streaming.reference_pipeline import sources
    from tests.test_reference_pipeline import env

    srcs = sources()

    def parse(name, lines):
        return srcs[name].parse(
            spark.createDataFrame([(l,) for l in lines], "value string")
        )

    t = "2020-07-30 10:08:22"
    inc = IncrementalJoin(
        left_pk="id", right_pk="id", left_key="user_id", right_key="id",
        left_project={
            "id": "id", "user_id": "user_id", "amount": "amount",
            "status": "status", "channel": "channel",
            "ctime": "ctime", "utime": "utime",
        },
        right_project={"id": "id", "uname": "name", "age": "age"},
    )
    batches = [
        (None, parse("users", [
            env("c", {"id": "0001", "name": "Jark", "age": 22, "ctime": t, "utime": t}, ts=1),
            env("c", {"id": "0002", "name": "Sabella", "age": 23, "ctime": t, "utime": t}, ts=1),
        ])),
        (parse("orders", [
            env("c", {"id": "o001", "user_id": "0001", "amount": 100.0,
                      "status": "closed", "channel": "app", "ctime": t, "utime": t}, ts=2),
            env("c", {"id": "o002", "user_id": "0002", "amount": 50.0,
                      "status": "payed", "channel": "web", "ctime": t, "utime": t}, ts=3),
        ]), None),
        # golden changelog status flip (sample/cdc.orders.change-log:123,131)
        (parse("orders", [
            env("u", {"id": "o001", "user_id": "0001", "amount": 100.0,
                      "status": "payed", "channel": "app", "ctime": t, "utime": t},
                before={"id": "o001", "user_id": "0001", "amount": 100.0,
                        "status": "closed", "channel": "app", "ctime": t, "utime": t}, ts=4),
        ]), None),
        # dimension-side rename: every o001 join row must update
        (None, parse("users", [
            env("u", {"id": "0001", "name": "Jark Wu", "age": 22, "ctime": t, "utime": t},
                before={"id": "0001", "name": "Jark", "age": 22, "ctime": t, "utime": t}, ts=5),
        ])),
        (parse("orders", [
            env("d", before={"id": "o002", "user_id": "0002", "amount": 50.0,
                             "status": "payed", "channel": "web", "ctime": t, "utime": t}, ts=6),
        ]), None),
    ]
    for i, (lo, ru) in enumerate(batches):
        inc.apply(lo, ru, batch_id=i)
        assert _rows(inc.result()) == _rows(inc.recompute()), f"batch {i}"
    final = {r["id"]: r for r in inc.result().collect()}
    assert set(final) == {"o001"}
    assert final["o001"]["uname"] == "Jark Wu"
    assert final["o001"]["status"] == "payed"


# ---------------------------------------------------------------------------
# fuzzy_prefix_pairs


def test_fuzzy_prefix_finds_planted_typo(spark):
    from flink_streaming_etl_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (0, "hello world this is a doc", "en", "s", 25),
            (2, "hxllo world this is a doc", "en", "s", 25),  # substitution
            (3, "completely different body", "en", "s", 25),
            (4, "hello world this is another", "en", "s", 27),  # same prefix
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r["a_id"], r["b_id"]): r["dist"]
        for r in dedup.fuzzy_prefix_pairs(docs).collect()
    }
    assert got == {(0, 2): 1, (0, 4): 0, (2, 4): 1}


def test_fuzzy_prefix_hot_variant_capped(spark):
    """A prefix shared by more docs than owner_cap is boilerplate — its
    pairs must be excised, exactly like hot LSH buckets."""
    from flink_streaming_etl_spark.operators import dedup

    n = 10
    docs = spark.createDataFrame(
        [(i, "the same boilerplate prefix body", "en", "s", 32) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assert dedup.fuzzy_prefix_pairs(docs, owner_cap=5).count() == 0
    # under the cap the full pair set appears
    assert (
        dedup.fuzzy_prefix_pairs(docs, owner_cap=50).count() == n * (n - 1) // 2
    )


# ---------------------------------------------------------------------------
# moore_lewis_selection


def test_moore_lewis_prefers_in_domain_docs(spark):
    """A doc made of in-domain-only vocabulary must outscore a doc made of
    out-of-domain vocabulary; totality: token-less docs appear unselected."""
    from flink_streaming_etl_spark.operators import text as t

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha beta gamma", "en", "src0", 27),
            (1, "alpha beta gamma alpha", "en", "src1", 22),  # in-domain-ish
            (2, "zeta eta theta zeta eta", "en", "src1", 23),  # out-of-domain
            (3, "12345 67890", "en", "src1", 11),  # no a-z tokens
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["doc_id"]: r for r in t.moore_lewis_selection(docs).collect()}
    assert set(rows) == {0, 1, 2, 3}
    assert rows[1]["ml_score"] > rows[2]["ml_score"]
    assert rows[1]["selected"] and not rows[2]["selected"]
    assert rows[3]["n_tokens"] == 0 and rows[3]["ml_score"] is None
    assert rows[3]["selected"] is False


def test_moore_lewis_lm_joins_broadcast(spark):
    """Scale pin (r7 verdict #4 discipline): both vocabulary-side LM joins
    must broadcast — the corpus-sized doc-term relation never shuffles for
    them."""
    from flink_streaming_etl_spark.operators import text as t

    p = plan_text(t.moore_lewis_selection(_tables(spark)["documents"]))
    assert "SortMergeJoin" not in p, p
    assert p.count("BroadcastHashJoin") >= 2
