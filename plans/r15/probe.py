#!/usr/bin/env python
"""r15 A/B probe: settled min-of-3 timing + Spark JOB COUNT per query,
replicating bench.py's isolate+settle methodology on a named subset.

Usage: python plans/r15/probe.py q1 q2 ... [--sf /root/testdata/sf0.1]
Prints one JSON line: {name: {"sec": min3, "jobs": n_jobs_of_min_run}}.

Job counting uses a per-run job group: every Spark job the query's build
+ noop materialization triggers lands in the group, so the count is the
§1.2 "driver actions / jobs per query" metric the r14/r15 verdicts ask
to shrink.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from flink_streaming_etl_spark import api  # noqa: E402
from flink_streaming_etl_spark.operators._cache import (  # noqa: E402
    clear_operator_caches,
)
from flink_streaming_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
    warmup_dir = "/root/testdata/sf0.001"
    spark = get_spark("r15-probe")
    sc = spark.sparkContext
    qs = api.queries()

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    def isolate():
        clear_operator_caches()
        spark.catalog.clearCache()
        gc.collect()
        sc._jvm.System.gc()

    out = {}
    for name in args:
        # warmup (codegen/JIT) at the small SF
        try:
            materialize(qs[name](spark, warmup_dir))
        except Exception as exc:
            out[name] = {"err": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        isolate()
        time.sleep(1.0)
        best, best_jobs = None, None
        for i in range(3):
            group = f"{name}-{i}"
            sc.setJobGroup(group, name)
            tracker = sc.statusTracker()
            before = set(tracker.getJobIdsForGroup(group))
            t0 = time.perf_counter()
            materialize(qs[name](spark, sf_dir))
            el = time.perf_counter() - t0
            jobs = len(set(tracker.getJobIdsForGroup(group)) - before)
            sc.setJobGroup(None, None)
            if best is None or el < best:
                best, best_jobs = el, jobs
            isolate()
            time.sleep(0.4)
        out[name] = {"sec": round(best, 3), "jobs": best_jobs}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
