#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r15/<q>_<tag>.txt.

Usage: python plans/r15/capture_plans.py before q1 q2 ...
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, "..", ".."))

from flink_streaming_etl_spark import api  # noqa: E402
from flink_streaming_etl_spark.operators._cache import (  # noqa: E402
    clear_operator_caches,
)
from flink_streaming_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-plans")
    qs = api.queries()
    for name in names:
        clear_operator_caches()
        spark.catalog.clearCache()
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(HERE, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
