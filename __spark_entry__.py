"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``flink_streaming_etl_spark`` (see SURVEY.md §2 for
the operator inventory each entry maps to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_streaming_etl_spark import api  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary rollup) on /root/testdata/sf0.001."""
    return api.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return api.queries()


def oracle_sql() -> dict[str, str]:
    return api.oracle_sql()
