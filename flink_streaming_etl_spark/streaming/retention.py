"""Idle-state retention for the group-keyed ±delta accumulators — the
T5 discipline (Flink's ``table.exec.state.ttl`` / idle state retention:
state for a key that hasn't been touched within the retention horizon is
dropped, trading completeness on dormant keys for bounded state; a key
that reappears later starts FRESH, exactly Flink's documented TTL
semantics).

The accumulators keep their state as group-partitioned relations, so the
timer wheel becomes a tiny bookkeeping relation: (group_cols...,
_last_batch), group-bounded (one row per live group, never per state
row). Per batch: the touched groups bump their stamp; groups whose stamp
falls past the horizon are returned for the caller to anti-join out of
ITS state relations — eviction removes a group from state AND result
together, so the accumulator's result() == recompute() equality pin
keeps holding on the retained groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_match(left: DataFrame, right: DataFrame, cols: list[str]):
    """Null-safe group-key equality (a NULL group is a real group)."""
    cond = None
    for c in cols:
        e = left[c].eqNullSafe(right[c])
        cond = e if cond is None else cond & e
    return cond


class GroupRetention:
    """Last-touched-batch bookkeeping per group key."""

    def __init__(self, group_cols: list[str], retention_batches: int):
        self.group_cols = list(group_cols)
        self.retention_batches = int(retention_batches)
        self.touch: DataFrame | None = None  # group_cols + _last_batch
        self.n_batches = 0

    def tick(self, touched: DataFrame) -> DataFrame | None:
        """Advance the batch clock, stamp the touched groups, and return
        the groups that just became idle (or None). The returned relation
        is group-bounded; callers anti-join it out of their state."""
        self.n_batches += 1
        marked = touched.select(*self.group_cols).withColumn(
            "_last_batch", F.lit(self.n_batches)
        )
        if self.touch is None:
            self.touch = marked.localCheckpoint(eager=True)
        else:
            kept = self.touch.join(
                touched, group_match(self.touch, touched, self.group_cols), "anti"
            )
            self.touch = kept.unionByName(marked).localCheckpoint(eager=True)
        horizon = self.n_batches - self.retention_batches
        if horizon <= 0:
            return None
        idle = self.touch.filter(F.col("_last_batch") <= horizon).select(
            *self.group_cols
        )
        if not idle.take(1):  # group-bounded relation, cheap action
            return None
        idle = idle.localCheckpoint(eager=True)
        self.touch = self.touch.filter(
            F.col("_last_batch") > horizon
        ).localCheckpoint(eager=True)
        return idle

    # -- durability (composes into the owner's AccumulatorStateStore save)

    def relations(self) -> dict:
        return {"retention_touch": self.touch}

    def extra(self) -> dict:
        return {"retention_n_batches": self.n_batches}

    def restore(self, rels: dict, extra: dict) -> None:
        if "retention_touch" in rels:
            self.touch = rels["retention_touch"]
        if extra.get("retention_n_batches") is not None:
            self.n_batches = int(extra["retention_n_batches"])


def evict(state: DataFrame | None, idle: DataFrame, cols: list[str]) -> DataFrame | None:
    """Anti-join a state relation against the idle groups (null-safe)."""
    if state is None:
        return None
    return state.join(
        F.broadcast(idle), group_match(state, idle, cols), "anti"
    ).localCheckpoint(eager=True)
