#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the JVM-side ``noop`` datasource write so
every result row is fully computed without paying Python row serialization
or driver-side collection — the engine's cost, nothing else.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_streaming_etl_spark import api  # noqa: E402
from flink_streaming_etl_spark.session import get_spark  # noqa: E402

#: Headline queries: the reference-parity pipeline + the scale-critical
#: training-data ops. (Cheap projections are excluded — they measure parquet
#: IO, not the engine.)
HEADLINE = [
    "pricing_summary",
    "order_enrich_join",
    "user_day_stats",
    "day_stats",
    "product_stats",
    "listagg_items",
    "collect_items",
    "latest_event_per_user",
    "region_rollup",
    "scalar_battery",
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "embedding_neardup",
    "ann_lsh_bucketed",
    "ann_ivf",
    "neardup_drop_list",
    "windowed_event_stats",
    "hopping_event_stats",
    "session_windows",
    "top_quality_per_lang",
    "lang_id",
    "token_count",
    "quality_score",
    "doc_fingerprint",
    "media_metadata",
    "media_features",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("flink-streaming-etl-spark-bench")
    qs = api.queries()

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # Warm the JVM/codegen once on the smallest query so the first measured
    # query doesn't pay session startup.
    materialize(qs["region_rollup"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
