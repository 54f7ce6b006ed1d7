"""Plan inspection & audit — the tooling behind the scale contract.

``audit(df)`` extracts the physical-plan properties that decide whether a
query survives a 100× scale-up (SURVEY.md §4): did filters reach the scan,
which join strategies got picked, is aggregation partial+final, how much of
the plan is inside whole-stage codegen. tests/test_plans.py asserts on
these for the headline queries; ``report`` prints the audit for every
registry query (a human review tool).
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@dataclass
class PlanAudit:
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    n_hash_aggregates: int = 0
    n_exchanges: int = 0
    #: codegen ids only appear pre-execution for non-adaptive plans; under
    #: AQE the final (codegen'd) plan materializes at runtime.
    has_codegen: bool = False
    adaptive: bool = False
    cartesian: bool = False
    text: str = ""


def audit(df: DataFrame) -> PlanAudit:
    p = plan_text(df)
    return PlanAudit(
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", p),
        read_schemas=re.findall(r"ReadSchema: (\S+)", p),
        joins=sorted(
            set(
                re.findall(
                    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                    r"BroadcastNestedLoopJoin|CartesianProduct)",
                    p,
                )
            )
        ),
        n_hash_aggregates=p.count("HashAggregate"),
        n_exchanges=p.count("Exchange"),
        has_codegen="codegen id" in p,
        adaptive="AdaptiveSparkPlan" in p,
        cartesian="CartesianProduct" in p,
        text=p,
    )


def report(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, PlanAudit]:
    """Audit every (or the named) registry queries — review with e.g.
    ``for n, a in report(spark, sf).items(): print(n, a.joins, a.n_exchanges)``."""
    from flink_streaming_etl_spark import api

    qs = api.queries()
    out: dict[str, PlanAudit] = {}
    for name in names or sorted(qs):
        out[name] = audit(qs[name](spark, sf_dir))
    return out
