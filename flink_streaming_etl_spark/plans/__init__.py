"""Physical-plan introspection helpers: assert the plan we *want* (pushdown,
broadcast, codegen), not just the answer. Used by tests/test_plans.py and the
bench loop to keep operators honest at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().toString()  # type: ignore[attr-defined]


def has_pushed_filters(df: DataFrame) -> bool:
    """True when the parquet scan received pushed-down predicates."""
    plan = formatted_plan(df)
    return "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def scan_read_schema(df: DataFrame) -> list[str]:
    """Columns each scan actually reads (ReadSchema) — column-pruning check."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line.split("ReadSchema:", 1)[1].strip())
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def codegen_stage_count(df: DataFrame) -> int:
    return formatted_plan(df).count("WholeStageCodegen")
