"""Streaming data-quality gate: the constraint battery of
:func:`~flink_streaming_etl_spark.operators.analytics.data_quality_report`
maintained across micro-batches of an append stream — violations are
found the batch they arrive, not at the next full-table audit.

Per micro-batch the HEAVY work stays distributed: one batch-sized agg
computes the batch's additive violation counts (completeness, domain,
range, non-positive — pure sums, exact under any batching), the
referential check anti-joins the batch against the dimension key set
(the TtlDimensionCache discipline: a broadcast-sized key relation,
refreshed by the caller on its own TTL), and cross-batch KEY UNIQUENESS
— the one check that is NOT additive — uses the two-tier seen-key state
of the bloom dedup accumulators: the batch job emits the batch's
distinct keys (collect bounded by batch size), the driver folds them
into a seen-set (at 100 TB: the bloom bit tier + exact verify join,
exactly streaming/text_dedup.py's design; the counting rule is
unchanged by that swap).

Equality pin (tests/test_round10.py): after any batch split of the
orders table, ``result()`` equals the batch operator on the replayed
union. Replays are idempotent by batch id.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_etl_spark.operators.analytics import DQ_ALLOWED_STATUS


class DataQualityAccumulator:
    """Incremental constraint-violation counting over an append stream."""

    CHECKS = (
        "orderkey_unique",
        "custkey_complete",
        "custkey_references_customer",
        "totalprice_positive",
        "orderdate_in_range",
        "status_in_domain",
    )

    def __init__(self, dim_keys: set | None = None):
        #: customer key set for the referential check (broadcast-sized,
        #: the TTL dimension cache contract; None disables the check)
        self.dim_keys = dim_keys
        self.n_rows = 0
        self.violations: dict[str, int] = defaultdict(int)
        self.seen_keys: set = set()
        self.last_batch_id: int | None = None

    def add_batch(self, batch_orders: DataFrame, batch_id: int | None = None) -> None:
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return  # replay — already folded
            self.last_batch_id = int(batch_id)

        agg = batch_orders.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v_null"),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v_pos"),
            F.sum(
                F.when(
                    (F.col("o_orderdate") < F.lit("1992-01-01"))
                    | (F.col("o_orderdate") >= F.lit("2005-01-01")),
                    1,
                ).otherwise(0)
            ).alias("v_date"),
            F.sum(
                F.when(~F.col("o_orderstatus").isin(*DQ_ALLOWED_STATUS), 1).otherwise(0)
            ).alias("v_status"),
        ).first()
        z = lambda v: 0 if v is None else int(v)  # noqa: E731
        self.n_rows += z(agg["n"])
        self.violations["custkey_complete"] += z(agg["v_null"])
        self.violations["totalprice_positive"] += z(agg["v_pos"])
        self.violations["orderdate_in_range"] += z(agg["v_date"])
        self.violations["status_in_domain"] += z(agg["v_status"])

        if self.dim_keys is not None:
            orphans = (
                batch_orders.filter(F.col("o_custkey").isNotNull())
                .select("o_custkey")
                .groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()  # batch-bounded distinct keys
            )
            self.violations["custkey_references_customer"] += sum(
                r["n"] for r in orphans if r["o_custkey"] not in self.dim_keys
            )

        # cross-batch uniqueness: per-key counts of THIS batch (bounded
        # collect), folded against the seen-key state
        keys = (
            batch_orders.groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        for r in keys:
            k, n = r["o_orderkey"], r["n"]
            dups = n - 1 if k not in self.seen_keys else n
            self.violations["orderkey_unique"] += dups
            self.seen_keys.add(k)

    def result(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                c,
                self.n_rows,
                self.violations.get(c, 0),
                self.violations.get(c, 0) == 0,
            )
            for c in self.CHECKS
            if not (c == "custkey_references_customer" and self.dim_keys is None)
        ]
        return spark.createDataFrame(
            rows, "check_name string, n_checked long, n_violations long, passed boolean"
        )
