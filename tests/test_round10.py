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
