"""The local twin of the driver's CORRECTNESS gate: every oracle-checked
queries() entry must match its DuckDB oracle at sf0.001 (and the full gate
runs at sf0.01 — see test_oracle_parity_sf001's marker note)."""

from __future__ import annotations

import os

import pytest

from flink_streaming_etl_spark import api
from tests.conftest import SF_SMOKE
from tests.oracle import compare, duck_connection

ORACLE_NAMES = sorted(api.oracle_sql())


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity_sf001(spark, duck, name):
    fn = api.queries()[name]
    sql = api.oracle_sql()[name]
    ok, msg = compare(fn(spark, SF_SMOKE), duck, sql)
    assert ok, f"{name}: {msg}"


def test_rows_only_queries_run(spark):
    """Entries without oracle SQL still must run and have a stable schema."""
    for name, fn in api.queries().items():
        if name in ORACLE_NAMES:
            continue
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
        assert df.columns, name


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_FULL_GATE"),
    reason="driver-scale gate simulation (sf0.01, ~4 min): set SPARK_GRAFT_FULL_GATE=1",
)
def test_oracle_parity_at_gate_scale(spark):
    """The driver's correctness gate runs at sf0.01, not the sf0.001 the
    fast suite uses — ties, value ranges, and overflow behave differently
    with 10x data, so simulate the real gate on demand."""
    from tests.conftest import SF_CORRECT

    duck = duck_connection(SF_CORRECT)
    bad = {}
    for name, sql in api.oracle_sql().items():
        ok, msg = compare(api.queries()[name](spark, SF_CORRECT), duck, sql)
        if not ok:
            bad[name] = msg[:140]
    assert not bad, bad
