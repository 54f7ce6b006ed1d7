"""Analysis-time smoke over the WHOLE registry under driver-like configs.

Round-3 lesson: `session_windows` passed every local test yet broke in the
driver because the driver's Spark 4.1 session inferred the testdata's
timestamp[us] parquet as TIMESTAMP_NTZ and `unix_micros` rejects NTZ at
analysis time — an analysis-only failure no oracle run had surfaced in-round.
This test analyzes (schema resolution — no execution) every registry entry on
the real sf0.01 schemas under BOTH parquet timestamp inferences, so any
analysis-time break surfaces here first.
"""

from __future__ import annotations

import pytest

from flink_streaming_etl_spark import api
from tests.conftest import SF_CORRECT, SF_SMOKE

ALL_NAMES = sorted(api.queries())

#: Builders that do eager work (train codebooks, iterate to convergence,
#: collect broadcast tables) before returning — they execute, not just
#: analyze, so they are exercised by the oracle/rows-only tests instead of
#: this schema-only pass at the bigger SF.
_EAGER = {
    "ann_ivf",
    "neardup_clusters",
    "neardup_drop_list",
    "dedup_apply",
    "embedding_dedup_apply",
    "bloom_incremental_dedup",
    "contamination_check",
    "weighted_sample",
    "mixture_sample",
    "stratified_sample",
    "curated_corpus",
    "training_corpus_chunks",
}


@pytest.mark.parametrize("name", ALL_NAMES)
def test_registry_entry_analyzes_sf001(spark, name):
    """Every entry must at least resolve its plan on the real schemas.
    Eager builders (they execute during construction) run on the tiny SF to
    keep this pass fast; pure-lazy builders analyze at the gate SF."""
    df = api.queries()[name](spark, SF_SMOKE if name in _EAGER else SF_CORRECT)
    assert df.schema.fieldNames(), name


def test_timestamp_operators_survive_ntz_inference(spark):
    """Directly feed TIMESTAMP_NTZ inputs (what a Spark 4.x session with
    default parquet inference produces from the testdata) to every
    timestamp-touching operator. `tune_session` pins the inference off for
    driver-owned sessions, but the operators themselves must not depend on
    that pin."""
    from flink_streaming_etl_spark.operators import relational, windows

    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        events = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
        orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
        assert dict(events.dtypes)["ts"] == "timestamp_ntz"
        for df in (
            windows.session_windows(events),
            windows.windowed_event_stats(events),
            windows.hopping_event_stats(events),
            relational.latest_order_asof(events, orders),
        ):
            assert df.schema.fieldNames()
        # execution smoke on the one analysis-fragile operator
        assert windows.session_windows(events).limit(5).count() >= 0
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)
