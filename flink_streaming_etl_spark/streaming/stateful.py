"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's idle-state knobs (min/max-idle-state-retention,
sql-client-conf.yaml:33-34, set to unlimited) map to Spark's GroupState
timeouts (SURVEY.md §2.5 T5): ``running_user_stats`` keeps one small state
record per user and expires it after ``idle_timeout_ms`` of inactivity
(0 = never, the reference's configuration).

Scale shape: state lives in the state store partitioned by the group key —
the same keyed-state layout Flink uses; each micro-batch touches only the
keys present in the batch plus timed-out ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def discard_distributed(df: DataFrame) -> None:
    """Fully process a foreachBatch DataFrame and throw the rows away
    (noop datasource — every partition scans, nothing materializes).
    Required as the no-sink default downstream of stateful transforms:
    a foreachBatch body that ignores its batch leaves the state-store
    partitions uncommitted and Spark fails the epoch
    (STATE_STORE_COMMIT_VALIDATION_FAILED)."""
    df.write.format("noop").mode("overwrite").save()


def running_user_stats(events: DataFrame, idle_timeout_ms: int = 0) -> DataFrame:
    """Continuously-updated per-user totals over an event stream: emits the
    new running (count, sum) for every user seen in each micro-batch.

    ``events`` must be a streaming DataFrame with (user_id, value). With
    ``idle_timeout_ms > 0`` a user's state is dropped after that much
    processing-time inactivity (their next event restarts from zero) — the
    state-TTL analog of the reference's idle-state retention."""
    timeout = "ProcessingTimeTimeout" if idle_timeout_ms > 0 else "NoTimeout"

    # Self-contained closure: workers can't import this package when the
    # driver session comes from outside the repo (see similarity._vec_helpers).
    def update(key, pdfs, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return iter(())
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        if idle_timeout_ms > 0:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", timeout
        )
    )
