"""Round-8 additions: advisor-fix regression tests (anomaly s2 decimal
fold, winnow position cap, covariance single-pass, session-keyed memo
safety) plus new-operator invariants. Value correctness for oracle-backed
entries is covered by tests/test_oracle_parity.py every run."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_anomaly_zscore_survives_large_daily_totals(spark):
    """ADVICE r7 (medium): SUM(long x * long x) silently wraps int64 once
    |x| > sqrt(2^63/7) ≈ 1.15e9 milli-units. The s2 fold is now exact
    decimal(38,0); z-scores at |x| ≈ 3e9 must equal the exact-arithmetic
    reference (computed here with Python bigints, the streaming twin's
    path), and no is_anomaly flag may flip from overflow wraparound."""
    from flink_streaming_etl_spark.operators import analytics as an

    base = dt.datetime(2024, 1, 1)
    # daily values around 3e6 units → x ≈ 3e9 milli-units per day: the
    # exact magnitude the old long*long fold wrapped on (7·(3e9)² ≈ 6.3e19
    # > 2^63).
    vals = [3.0e6, 3.1e6, 2.9e6, 3.05e6, 2.95e6, 3.2e6, 2.8e6, 3.0e6, 9.9e6]
    rows = [
        (i, base + dt.timedelta(days=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["day"]: r for r in an.anomaly_zscore_daily(ev).collect()}

    # exact reference via Python bigints (identical to streaming twin)
    x = [round(v * 1000) for v in vals]
    for idx in (7, 8):
        win = x[idx - 7 : idx]
        s1, s2 = sum(win), sum(v * v for v in win)
        n = 7.0
        mean = float(s1) / n
        var = (float(s2) - float(s1) * float(s1) / n) / (n - 1)
        zref = round((x[idx] - mean) / var**0.5, 4)
        day = f"2024-01-{idx + 1:02d}"
        assert out[day]["zscore"] == zref, (day, out[day]["zscore"], zref)
    assert out["2024-01-08"]["is_anomaly"] == 0
    assert out["2024-01-09"]["is_anomaly"] == 1  # the 9.9e6 spike


def test_anomaly_zscore_streaming_twin_large_totals(spark):
    """The streaming accumulator must equal the (fixed) batch operator at
    the same overflow-prone magnitudes."""
    from flink_streaming_etl_spark.operators.analytics import anomaly_zscore_daily
    from flink_streaming_etl_spark.streaming.anomaly import AnomalyZScoreAccumulator

    base = dt.datetime(2024, 1, 1)
    vals = [3.0e6, 3.1e6, 2.9e6, 3.05e6, 2.95e6, 3.2e6, 2.8e6, 3.0e6, 9.9e6]
    rows = [
        (i, base + dt.timedelta(days=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    acc = AnomalyZScoreAccumulator()
    acc.add_batch(ev.filter(F.col("event_id") < 5), batch_id=0)
    acc.add_batch(ev.filter(F.col("event_id") >= 5), batch_id=1)
    got = {r["day"]: r for r in acc.result(spark).collect()}
    want = {r["day"]: r for r in anomaly_zscore_daily(ev).collect()}
    assert set(got) == set(want)
    for day in want:
        assert got[day]["zscore"] == want[day]["zscore"], day
        assert got[day]["is_anomaly"] == want[day]["is_anomaly"], day


def test_winnow_decode_exact_roundtrip(spark):
    """The fp/pos decode must be EXACT integer arithmetic: combined values
    fill 63 bits (40-bit hash · 2^23 + pos), beyond double's 53-bit
    mantissa — the old `floor(wmin / m)` double-division decode silently
    corrupted hashes in BOTH engines (parity held while both were wrong).
    Verify Spark's selected fingerprints equal a bigint-exact Python
    winnow of the same k-gram hash stream."""
    import hashlib

    from flink_streaming_etl_spark.operators import text as tx

    text = (
        "the quick brown fox jumps over the lazy dog while the clever cat "
        "watches from a branch and plots something entirely different today"
    )
    docs = spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    k, w = tx.WINNOW_K, tx.WINNOW_W
    m = 1 << tx._WINNOW_POS_BITS
    s = "".join(c for c in text.lower() if "a" <= c <= "z")
    combined = [
        (int(hashlib.md5(s[p - 1 : p - 1 + k].encode()).hexdigest()[:10], 16) * m)
        + (m - 1 - p)
        for p in range(1, len(s) - k + 2)
    ]
    want = set()
    for i in range(len(combined) - w + 1):
        wmin = min(combined[i : i + w])
        want.add((wmin >> tx._WINNOW_POS_BITS, m - 1 - wmin % m))
    got = {
        (r["fp"], r["pos"])
        for r in tx.winnow_fingerprints(docs).collect()
    }
    assert got == want


def test_winnow_pos_cap_raises_loudly(spark, monkeypatch):
    """Docs beyond the 2^POS_BITS normalized-char cap must ERROR, not
    silently saturate positions (ADVICE r7). Shrink the cap to make the
    path testable."""
    import pytest

    from flink_streaming_etl_spark.operators import text as tx

    monkeypatch.setattr(tx, "_WINNOW_POS_BITS", 6)  # cap = 64 chars
    docs = spark.createDataFrame(
        [(1, "abcdefghij" * 20, "en", "s", 200)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(Exception, match="winnow_fingerprints"):
        tx.winnow_fingerprints(docs).collect()


def test_memo_persist_rejects_recycled_session_id(spark):
    """ADVICE r7: id(session) can be recycled by CPython after a stopped
    session is collected; a hit must prove the weakref still points at the
    caller's live session. Simulate the recycled-id collision by planting
    a dead-referent entry under the exact key memo_persist will compute."""
    import weakref

    from flink_streaming_etl_spark.operators import _cache

    df = spark.range(3).toDF("n")
    key = (id(spark), df.semanticHash())

    class _Ghost:
        pass

    ghost = _Ghost()
    decoy = spark.range(99).toDF("n")
    _cache._FAMILIES.setdefault("r8_test", {})[key] = (weakref.ref(ghost), decoy)
    del ghost  # referent dies; the entry now has a dead weakref

    got = _cache.memo_persist("r8_test", df)
    assert got is not decoy  # stale entry was treated as a miss
    assert got.count() == 3
    # and a genuine repeat call is a hit on the fresh entry
    again = _cache.memo_persist("r8_test", df)
    assert again is got
    _cache.clear_operator_caches()


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_substring_dup_spans_catches_shifted_copy(spark):
    """Lee et al. semantics: an exact >=L-token run duplicated at a
    DIFFERENT offset in another doc is found (fixed-boundary chunking
    misses shifted copies), and adjacent duplicated positions merge
    into one maximal span."""
    from flink_streaming_etl_spark.operators import text as tx

    run = " ".join(f"tok{i}" for i in range(20))  # 20-token shared run
    a = "alpha beta " + run + " gamma"
    b = "one two three four five " + run + " six"
    c = "entirely different words without any repetition at all here now"
    out = tx.substring_dup_spans(_docs(spark, [(1, a), (2, b), (3, c)]), 15)
    spans = {r["doc_id"]: r for r in out.collect()}
    assert set(spans) == {1, 2}
    # doc 1: run occupies tokens 3..22; shingle starts 3..8 → span 3..22
    assert spans[1]["start_pos"] == 3 and spans[1]["end_pos"] == 22
    assert spans[1]["span_tokens"] == 20
    # doc 2: run occupies tokens 6..25 (shifted offset)
    assert spans[2]["start_pos"] == 6 and spans[2]["end_pos"] == 25
    assert spans[2]["span_tokens"] == 20


def test_substring_dedup_cut_first_occurrence_survives(spark):
    """The cut stage keeps the globally FIRST occurrence (min doc_id,
    pos) intact and removes the duplicated token range from every other
    occurrence; untouched docs pass through whitespace-normalized."""
    from pyspark.sql import functions as F

    from flink_streaming_etl_spark.operators import text as tx

    run = " ".join(f"tok{i}" for i in range(15))
    a = "alpha " + run + " omega"
    b = "pre " + run + " post"
    c = "no duplication in this one at all whatsoever truly none here"
    out = {
        r["doc_id"]: r
        for r in tx.substring_dedup_cut(
            _docs(spark, [(1, a), (2, b), (3, c)]), 15
        ).collect()
    }
    assert out[1]["removed_tokens"] == 0 and out[1]["clean_text"] == a
    assert out[2]["removed_tokens"] == 15
    assert out[2]["clean_text"] == "pre post"
    assert out[3]["removed_tokens"] == 0 and out[3]["clean_text"] == c


def test_streaming_media_chunk_handover(spark):
    """Streaming twin of media_chunk_dedup: fed the corpus in ordered
    micro-batches (with a replay no-op), the accumulated pair relation
    equals the batch operator on the full corpus."""
    from flink_streaming_etl_spark.operators.multimodal import media_chunk_dedup
    from flink_streaming_etl_spark.streaming.media_dedup import (
        MediaChunkDedupAccumulator,
    )

    # chunking is offset-based (64-byte slices from payload start), so
    # dup docs share a VARIED 256-byte PREFIX: 4 aligned distinct chunks
    # each (constant filler would md5-collapse to one distinct chash)
    blk_a = "".join(f"a{i:03d}" for i in range(64))  # 256 varied bytes
    blk_b = "".join(f"b{i:03d}" for i in range(64))
    rows = [
        (1, blk_a + "tail-one"),
        (2, blk_b + "two-suffix"),
        (3, blk_a + "tail-three"),            # dups 1 (cross-batch)
        (4, "other content entirely " * 10),
        (5, blk_b + "trailer-five"),           # dups 2 (cross-batch)
        (6, blk_a + "tail-six"),               # dups 1 AND 3
        (7, blk_a + "tail-seven"),             # intra-batch dup of 6
    ]
    full = _docs(spark, rows)

    acc = MediaChunkDedupAccumulator()
    batches = [rows[:2], rows[2:5], rows[5:]]
    for bid, chunk in enumerate(batches):
        acc.add_batch(_docs(spark, chunk), batch_id=bid)
    acc.add_batch(_docs(spark, batches[-1]), batch_id=2)  # replay: no-op

    got = {(r["a_id"], r["b_id"]): r["shared_chunks"]
           for r in acc.result(spark).collect()}
    want = {(r["a_id"], r["b_id"]): r["shared_chunks"]
            for r in media_chunk_dedup(full).collect()}
    assert got == want
    assert got, "test corpus must actually contain duplicate pairs"


def test_streaming_media_chunk_retention_evicts(spark):
    """T5 idle-state retention: with retention_batches=1, chunks idle for
    a full batch are evicted, so a later duplicate of an evicted media is
    NOT flagged — and state stays bounded by the active window."""
    from flink_streaming_etl_spark.streaming.media_dedup import (
        MediaChunkDedupAccumulator,
    )

    blk = "".join(f"z{i:03d}" for i in range(64))  # 4 distinct chunks
    acc = MediaChunkDedupAccumulator(retention_batches=1)
    acc.add_batch(_docs(spark, [(1, blk + "one")]), batch_id=0)
    acc.add_batch(_docs(spark, [(2, "unrelated filler " * 20)]), batch_id=1)
    # doc 1's chunks were idle through batch 1 → evicted
    acc.add_batch(_docs(spark, [(3, blk + "three")]), batch_id=2)
    assert acc.result(spark).count() == 0
    assert all(b > 1 for b in acc.last_seen.values())
    # control: WITHOUT retention the same replay flags the (1, 3) pair
    acc2 = MediaChunkDedupAccumulator()
    acc2.add_batch(_docs(spark, [(1, blk + "one")]), batch_id=0)
    acc2.add_batch(_docs(spark, [(2, "unrelated filler " * 20)]), batch_id=1)
    acc2.add_batch(_docs(spark, [(3, blk + "three")]), batch_id=2)
    assert {(r["a_id"], r["b_id"]) for r in acc2.result(spark).collect()} == {(1, 3)}


def test_kneser_ney_worked_example(spark):
    """Pin the interpolated-KN arithmetic on a corpus small enough to
    check by hand: p(w2|w1) = (c12-D)/c1 + (D·Nr(w1)/c1)·(Nl(w2)/T)."""
    import math

    from flink_streaming_etl_spark.operators import text as tx

    # corpus: "a b a b" + "a c" → bigrams: (a,b)x2, (b,a)x1, (a,c)x1
    docs = _docs(spark, [(1, "a b a b"), (2, "a c")])
    out = {r["doc_id"]: r for r in tx.kneser_ney_fluency(docs).collect()}
    # c2: (a,b)=2 (b,a)=1 (a,c)=1; c1: a=3 (nr=2), b=1 (nr=1)
    # nl: b=1, a=1, c=1; T=3; D=0.75
    T, D = 3.0, 0.75
    p_ab = (2 - D) / 3 + (D * 2 / 3) * (1 / T)
    p_ba = (1 - D) / 1 + (D * 1 / 1) * (1 / T)
    p_ac = (1 - D) / 3 + (D * 2 / 3) * (1 / T)
    want1 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 4)
    want2 = round(math.log(p_ac), 4)
    assert out[1]["n_bigrams"] == 3 and out[1]["avg_kn_logprob"] == want1
    assert out[2]["n_bigrams"] == 1 and out[2]["avg_kn_logprob"] == want2


def test_kmv_sketch_merges_and_bounds_error(spark):
    """The '(all)' row must equal the KMV estimate over the UNION
    vocabulary (mergeability), the estimator is exact below k, and the
    relative error stays inside the 3/sqrt(k) concentration bound."""
    from flink_streaming_etl_spark.operators import text as tx

    # alphabetic-only terms (the tokenizer strips digits): 40 unique
    # words per doc, 10 docs, source = doc parity → 200 distinct each
    a = "abcdefghij"
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(f"{a[i]}x{a[j // 10]}{a[j % 10]}" for j in range(40)),
                "en",
                f"s{i % 2}",
                1,
            )
            for i in range(10)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["source"]: r for r in tx.kmv_distinct_report(docs, k=16).collect()}
    assert set(out) == {"s0", "s1", "(all)"}
    for src, exact in (("s0", 200), ("s1", 200), ("(all)", 400)):
        r = out[src]
        assert r["exact_distinct"] == exact
        assert r["rel_error"] <= 3 / (16 ** 0.5), (src, r["rel_error"])
    # below-k path is exact
    tiny = _docs(spark, [(1, "x y z")])
    r = tx.kmv_distinct_report(tiny, k=16).collect()
    assert all(row["kmv_estimate"] == row["exact_distinct"] for row in r)


def test_embedding_whitening_check_is_identity(spark):
    """The whitened covariance must be the identity to within the 1e-4
    quantization floor of the covariance estimate."""
    import numpy as np

    from flink_streaming_etl_spark.catalog import load_tables
    from flink_streaming_etl_spark.operators import similarity as sim
    from tests.conftest import SF_SMOKE

    emb = load_tables(spark, SF_SMOKE, register=False)["embeddings"]
    rows = sim.embedding_whitening_check(emb).collect()
    d = max(r["dim_j"] for r in rows) + 1
    assert len(rows) == d * (d + 1) // 2
    m = np.zeros((d, d))
    for r in rows:
        m[r["dim_i"], r["dim_j"]] = r["cov"]
        m[r["dim_j"], r["dim_i"]] = r["cov"]
    assert np.abs(np.diag(m) - 1).max() < 1e-3
    assert np.abs(m - np.diag(np.diag(m))).max() < 1e-3


def test_streaming_value_histogram_handover(spark):
    """Streaming histogram twin: out-of-order batches (with a replay
    no-op) must equal the batch value_histogram exactly, and the
    standing-state percentile must match one computed from the batch
    histogram."""
    import datetime as dtm

    from flink_streaming_etl_spark.operators.analytics import value_histogram
    from flink_streaming_etl_spark.streaming.histogram import (
        ValueHistogramAccumulator,
    )

    base = dtm.datetime(2024, 5, 1)
    rows = [
        (i, base + dtm.timedelta(hours=i), 1,
         "click" if i % 3 else "buy", float((i * 37) % 520) - 5.0, "{}")
        for i in range(300)
    ]
    schema = ("event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    full = spark.createDataFrame(rows, schema)

    acc = ValueHistogramAccumulator()
    chunks = [rows[100:200], rows[0:100], rows[200:]]  # out of order
    for bid, chunk in enumerate(chunks):
        acc.add_batch(spark.createDataFrame(chunk, schema), batch_id=bid)
    acc.add_batch(spark.createDataFrame(chunks[-1], schema), batch_id=2)  # replay

    got = {(r["event_type"], r["bin"]): (r["bin_lo"], r["n"])
           for r in acc.result(spark).collect()}
    want = {(r["event_type"], r["bin"]): (r["bin_lo"], r["n"])
            for r in value_histogram(full).collect()}
    assert got == want

    # percentile from standing state == percentile from batch histogram
    series = sorted((b, n) for (et, b), (_, n) in want.items() if et == "click")
    total = sum(n for _, n in series)
    run, p95 = 0, None
    for b, n in series:
        run += n
        if run >= 0.95 * total:
            p95 = 0.0 + b * 50.0
            break
    assert acc.percentile("click", 0.95) == p95
    assert acc.percentile("nope", 0.5) is None


def test_load_tables_rebinds_views_on_cache_hit(spark):
    """Order-dependence regression (caught by the full-suite sf0.01 gate
    running after sf0.001 tests): a cached register=True load_tables call
    must RE-REGISTER its temp views — a later load at a different sf_dir
    overwrites them, and the old cache-hit path returned without
    rebinding, leaving spark.sql() reading the other corpus."""
    from flink_streaming_etl_spark.catalog import load_tables
    from tests.conftest import SF_CORRECT, SF_SMOKE

    small = load_tables(spark, SF_SMOKE, register=True)["lineitem"].count()
    big = load_tables(spark, SF_CORRECT, register=True)["lineitem"].count()
    assert big > small
    assert spark.table("lineitem").count() == big
    # cache HIT for the smoke dir must rebind the views back
    load_tables(spark, SF_SMOKE, register=True)
    assert spark.table("lineitem").count() == small


def test_streaming_kmv_handover(spark):
    """KMV streaming twin: out-of-order batches (with a replay no-op)
    must reproduce the batch kmv_distinct_report estimates exactly —
    k-min sets merge exactly, hashes are deterministic md5."""
    from flink_streaming_etl_spark.operators import text as tx
    from flink_streaming_etl_spark.streaming.kmv import KmvDistinctAccumulator

    a = "abcdefghij"
    rows = [
        (
            i,
            " ".join(f"{a[i]}x{a[j // 10]}{a[j % 10]}" for j in range(40)),
            "en",
            f"s{i % 2}",
            1,
        )
        for i in range(10)
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    full = spark.createDataFrame(rows, schema)

    acc = KmvDistinctAccumulator(k=16)
    chunks = [rows[4:7], rows[0:4], rows[7:]]  # out of order
    for bid, chunk in enumerate(chunks):
        acc.add_batch(spark.createDataFrame(chunk, schema), batch_id=bid)
    acc.add_batch(spark.createDataFrame(chunks[-1], schema), batch_id=2)  # replay

    got = {r["source"]: r["kmv_estimate"] for r in acc.result(spark).collect()}
    want = {r["source"]: r["kmv_estimate"]
            for r in tx.kmv_distinct_report(full, k=16).collect()}
    assert got == want
    assert set(got) == {"s0", "s1", "(all)"}
    # state is bounded by k per source
    assert all(len(h) <= 16 for h in acc.kmin.values())


def test_bpe_encode_worked_example(spark):
    """Sennrich-style worked example: with merges learned from a corpus
    dominated by 'low/lower/newest/widest', encoding must apply merges
    lowest-rank-first and reproduce the training loop's final symbol
    counts for every training word; unseen words with no applicable
    merges stay character-segmented."""
    from flink_streaming_etl_spark.operators import text as tx

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = _docs(spark, [(1, corpus), (2, "xyzq low newest")])
    merges = [
        (r["rank"], r["left"], r["right"])
        for r in tx.bpe_train_merges(docs, n_merges=10).collect()
    ]
    assert merges, "training must learn merges"
    out = {r["doc_id"]: r for r in tx.bpe_encode_report(docs, 10).collect()}

    # reproduce training's final vocab symbol counts in pure Python
    def encode(word):
        rank_of = {(a, b): k for k, a, b in merges}
        syms = list(word)
        while len(syms) > 1:
            cands = [(rank_of[p], i) for i, p in enumerate(zip(syms, syms[1:]))
                     if p in rank_of]
            if not cands:
                break
            _, i = min(cands)
            a, b = syms[i], syms[i + 1]
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b); j += 2
                else:
                    out.append(syms[j]); j += 1
            syms = out
        return syms

    words1 = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    assert out[1]["n_words"] == 16
    assert out[1]["n_bpe_tokens"] == sum(len(encode(w)) for w in words1)
    # 'low' and 'newest' fully merged into one symbol each after training
    assert len(encode("low")) == 1 and len(encode("newest")) == 1
    # doc 2: 'xyzq' has no learned merges → stays 4 chars
    assert out[2]["n_bpe_tokens"] == 4 + len(encode("low")) + len(encode("newest"))
    # fertility = q6(n_bpe_tokens / n_words) — floor-quantized to 6 dp
    assert out[2]["fertility"] == 2.0  # (4 + 1 + 1) / 3


def test_substring_dedup_cut_full_duplicate_emptied(spark):
    """Code-review regression: a FULL exact duplicate (every token
    covered by victim spans) must emit empty text with all tokens
    removed — the old coalesce fallback silently passed it through
    unchanged, and the oracle shared the bug so parity never saw it."""
    from flink_streaming_etl_spark.operators import text as tx

    run = " ".join(f"tok{i}" for i in range(15))
    out = {
        r["doc_id"]: r
        for r in tx.substring_dedup_cut(
            _docs(spark, [(1, run), (2, run)]), 15
        ).collect()
    }
    assert out[1]["removed_tokens"] == 0 and out[1]["clean_text"] == run
    assert out[2]["removed_tokens"] == 15 and out[2]["clean_text"] == ""


def test_substring_dedup_cut_protects_canonical_spans(spark):
    """Canonical spans are inviolate: when a victim range overlaps the
    canonical first occurrence of a DIFFERENT hash in the same doc, the
    overlap is trimmed around the canonical span instead of deleting
    canonical content from every copy in the corpus."""
    from flink_streaming_etl_spark.operators import text as tx

    runY = " ".join(f"y{i}" for i in range(15))
    runP = " ".join(f"p{i}" for i in range(15))
    # doc1: Y's canonical; doc2: P's canonical, followed by a victim copy
    # of Y whose range would otherwise begin inside... place P then Y:
    # doc2 = P + Y → Y-copy victims cover Y's tokens; P protected.
    # doc3: a victim copy of P — P must survive in doc2 (canonical).
    docs = _docs(
        spark,
        [(1, runY), (2, runP + " " + runY), (3, runP)],
    )
    out = {r["doc_id"]: r for r in tx.substring_dedup_cut(docs, 15).collect()}
    # doc2 keeps its canonical P, loses the victim Y copy
    assert out[2]["clean_text"] == runP
    assert out[2]["removed_tokens"] == 15
    # doc3's P copy is a victim of doc2's canonical → emptied
    assert out[3]["clean_text"] == "" and out[3]["removed_tokens"] == 15
    # doc1's canonical Y untouched
    assert out[1]["clean_text"] == runY and out[1]["removed_tokens"] == 0


def test_substring_dedup_cut_trims_around_canonical_overlap(spark):
    """The genuinely hard case: a victim range OVERLAPPING a canonical
    span in the same doc is trimmed around it — only the non-protected
    part is cut."""
    from flink_streaming_etl_spark.operators import text as tx

    y = [f"t{i}" for i in range(15)]
    p = ["a", "b", "c", "d", "e"] + y[:10]  # 15 tokens sharing y's head
    doc0 = " ".join(y)            # canonical Y
    doc2 = " ".join(p + y[10:])   # canonical P; victim Y at offset 6
    doc3 = " ".join(p)            # victim P
    out = {
        r["doc_id"]: r
        for r in tx.substring_dedup_cut(
            _docs(spark, [(0, doc0), (2, doc2), (3, doc3)]), 15
        ).collect()
    }
    assert out[0]["clean_text"] == doc0 and out[0]["removed_tokens"] == 0
    # doc2: Y's victim range (tokens 6..20) overlaps P's canonical span
    # (tokens 1..15) → only tokens 16..20 (t10..t14) are cut
    assert out[2]["clean_text"] == " ".join(p)
    assert out[2]["removed_tokens"] == 5
    assert out[3]["clean_text"] == "" and out[3]["removed_tokens"] == 15


def test_streaming_media_chunk_orientation_and_redelivery(spark):
    """Code-review regressions: (a) out-of-id-order arrival across
    batches must still emit a_id < b_id (orientation-normalized); (b) a
    media_id re-delivered under a NEW batch id must neither self-pair
    nor double-register its chunks."""
    from flink_streaming_etl_spark.operators.multimodal import media_chunk_dedup
    from flink_streaming_etl_spark.streaming.media_dedup import (
        MediaChunkDedupAccumulator,
    )

    blk = "".join(f"m{i:03d}" for i in range(64))
    rows = [(5, blk + "five"), (3, blk + "three")]
    acc = MediaChunkDedupAccumulator()
    # id 5 arrives BEFORE id 3 (separate batches), then 3 re-delivered
    acc.add_batch(_docs(spark, rows[:1]), batch_id=0)
    acc.add_batch(_docs(spark, rows[1:]), batch_id=1)
    acc.add_batch(_docs(spark, rows[1:]), batch_id=2)  # re-delivery, new bid
    got = {(r["a_id"], r["b_id"]): r["shared_chunks"]
           for r in acc.result(spark).collect()}
    want = {(r["a_id"], r["b_id"]): r["shared_chunks"]
            for r in media_chunk_dedup(_docs(spark, rows)).collect()}
    assert got == want  # (3, 5) orientation, no (3, 3) self-pair
    assert all(a < b for a, b in got)
    # chunks registered once per media despite re-delivery
    assert all(len(set(o)) == len(o) for o in acc.owners.values())


def test_streaming_histogram_null_values(spark):
    """NULL event values: both engines' greatest() IGNORES nulls, so a
    NULL value folds into bin 0 identically in Spark, DuckDB, and the
    accumulator — pin that agreement and that the stream doesn't crash
    (the review's int(None) scenario cannot occur, but the twin is
    defensive about a null bin anyway)."""
    import datetime as dtm

    from flink_streaming_etl_spark.operators.analytics import value_histogram
    from flink_streaming_etl_spark.streaming.histogram import (
        ValueHistogramAccumulator,
    )

    schema = ("event_id long, ts timestamp, user_id long, event_type string,"
              " value double, props string")
    rows = [
        (1, dtm.datetime(2024, 5, 1), 1, "click", 42.0, "{}"),
        (2, dtm.datetime(2024, 5, 2), 1, "click", None, "{}"),
    ]
    full = spark.createDataFrame(rows, schema)
    acc = ValueHistogramAccumulator()
    acc.add_batch(full, batch_id=0)
    got = {(r["event_type"], r["bin"]): (r["bin_lo"], r["n"])
           for r in acc.result(spark).collect()}
    want = {(r["event_type"], r["bin"]): (r["bin_lo"], r["n"])
            for r in value_histogram(full).collect()}
    assert got == want
    assert got[("click", 0)][1] == 2  # NULL folded into bin 0 (greatest)
    assert acc.percentile("click", 0.5) == 0.0


def test_substring_dup_rate_report_totals(spark):
    """Corpus dup-rate: totals must be consistent — dup tokens bounded by
    totals, affected-docs counted once, fraction = ratio of the sums."""
    from flink_streaming_etl_spark.operators import text as tx

    run = " ".join(f"tok{i}" for i in range(15))
    docs = _docs(spark, [(1, run), (2, run), (3, "all fresh words here only now")])
    r = tx.substring_dup_rate_report(docs, 15).collect()[0]
    assert r["n_docs"] == 3 and r["n_docs_with_dups"] == 2
    assert r["n_tokens"] == 36 and r["n_dup_tokens"] == 30
    assert abs(r["dup_token_frac"] - 30 / 36) < 1e-6  # q6 floor-quantized
