"""Degenerate-input hardening: every registry entry must run (not crash) on
an empty corpus with the production schemas. Iterative operators must
terminate (zero-edge CC, empty k-means sample), blocked kernels must handle
zero blocks, and eager builders must not divide by zero on counts."""

from __future__ import annotations

import os

import pytest

from flink_streaming_etl_spark import api
from flink_streaming_etl_spark.catalog import load_tables


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    src = load_tables(spark, "/root/testdata/sf0.001", register=False)
    tmp = tmp_path_factory.mktemp("empty_sf")
    for name, df in src.items():
        df.limit(0).write.mode("overwrite").parquet(str(tmp / f"{name}.parquet"))
    return str(tmp)


def test_every_query_survives_empty_corpus(spark, empty_sf_dir):
    failures = {}
    for name, fn in api.queries().items():
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as e:  # noqa: BLE001 — collecting the full report
            failures[name] = str(e).splitlines()[0][:120]
    assert not failures, failures
