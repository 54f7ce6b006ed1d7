"""Incremental maintenance of an inner equi-join over two changelogs —
the join twin of :class:`~flink_streaming_etl_spark.streaming.incremental
.IncrementalSumCount` (SURVEY.md §2.2 P3/P5: the reference's order⋈customer
join updates when EITHER side's CDC stream changes).

The materialize-then-recompute loop (pipeline.py) re-joins the full latest
states every micro-batch — always correct, cost grows with state. This is
the exact ±delta form instead, the algebra inside Flink's streaming join
operator: with L' = L + ΔL and R' = R + ΔR (signed multisets, retractions
carrying sign −1),

    J' − J  =  ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR

so each micro-batch emits a SIGNED join-delta relation built from three
joins whose left inputs are batch-sized (ΔL against the old right state,
the old left state against ΔR, ΔL against ΔR). Per-batch shuffle cost is
the deltas plus one key-partitioned probe of each state table — on a real
cluster the state sides live pre-partitioned on the join key (bucketed
state store / Delta table), so only the deltas move. This is the
difference between a bounded streaming join and an unbounded recompute at
100 TB of accumulated state.

Contract (same as IncrementalSumCount): per-key exactly-once, in-order
delivery with faithful before-images — Debezium topics keyed by PK (S6).
The equality pin (tests/test_round9.py::test_incremental_join_*): the
signed deltas, net-accumulated, equal the batch inner join of the two
latest-state tables after every prefix of the changelog.

Reference parity: flink-ddl.sql's `insert into order_view select ... from
orders o join customers c on o.customer_id = c.id` is exactly this
operator with left_key="customer_id", right_key="id" (cited for semantics,
re-expressed Spark-first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_streaming_etl_spark.sources.cdc import apply_changelog
from flink_streaming_etl_spark.streaming.incremental import changelog_deltas


def _signed_images(chunk: DataFrame) -> DataFrame:
    """Envelope chunk → flattened signed row images (img.*, _sign)."""
    return changelog_deltas(chunk, None).select("img.*", F.col("sign").alias("_sign"))


class IncrementalJoin:
    """Exact incremental INNER equi-join of two changelog-maintained tables.

    ``left_key`` / ``right_key`` name the equi-join columns; ``left_pk`` /
    ``right_pk`` the primary keys that key each side's latest state.
    Output columns are the union of both sides' columns (names must be
    disjoint apart from the join columns, which are emitted once under the
    left name — the reference's views follow the same discipline)."""

    def __init__(
        self,
        left_pk: str,
        right_pk: str,
        left_key: str,
        right_key: str,
        left_project: dict[str, str] | None = None,
        right_project: dict[str, str] | None = None,
    ):
        self.left_pk = left_pk
        self.right_pk = right_pk
        self.left_key = left_key
        self.right_key = right_key
        #: optional out_name -> source_column renames applied to each side
        #: before the join (disambiguates clashing names, e.g. the
        #: reference's orders.ctime vs users.ctime). The join columns must
        #: survive under their own names; PK-keyed state stays full-schema.
        self.left_project = left_project
        self.right_project = right_project
        if left_project is not None:
            assert left_project.get(left_key) == left_key, (
                "left_project must keep the join key under its own name"
            )
        if right_project is not None:
            assert right_project.get(right_key) == right_key, (
                "right_project must keep the join key under its own name"
            )
        self.left_state: DataFrame | None = None
        self.right_state: DataFrame | None = None
        self.join_state: DataFrame | None = None
        self.last_batch_id: int | None = None

    @staticmethod
    def _proj(df: DataFrame, proj: dict[str, str] | None) -> DataFrame:
        if df is None or proj is None:
            return df
        cols = [F.col(src).alias(out) for out, src in proj.items()]
        if "_sign" in df.columns:
            cols.append(F.col("_sign"))
        return df.select(*cols)

    # -- delta algebra ------------------------------------------------------

    def _join_delta(self, dl: DataFrame | None, dr: DataFrame | None) -> DataFrame | None:
        """ΔJ = ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR as one signed relation."""
        lk, rk = self.left_key, self.right_key
        parts: list[DataFrame] = []

        def emit(left: DataFrame, right: DataFrame, sign_expr) -> DataFrame:
            right_cols = [c for c in right.columns if c not in ("_sign", rk)]
            left_cols = [c for c in left.columns if c != "_sign"]
            clash = set(left_cols) & set(right_cols)
            if clash:
                raise ValueError(
                    f"join sides share column names {sorted(clash)} beyond the "
                    f"join key — disambiguate with left_project/right_project"
                )
            return (
                left.join(right, left[lk] == right[rk])
                .select(*[left[c] for c in left_cols],
                        *[right[c] for c in right_cols],
                        sign_expr.alias("_sign"))
            )

        dl = self._proj(dl, self.left_project)
        dr = self._proj(dr, self.right_project)
        rs = (
            self._proj(self.right_state, self.right_project)
            if self.right_state is not None
            else None
        )
        ls = (
            self._proj(self.left_state, self.left_project)
            if self.left_state is not None
            else None
        )
        if dl is not None and rs is not None:
            parts.append(emit(dl, rs.withColumn("_sign", F.lit(1)), dl["_sign"]))
        if dr is not None and ls is not None:
            parts.append(emit(ls.withColumn("_sign", F.lit(1)), dr, dr["_sign"]))
        if dl is not None and dr is not None:
            parts.append(emit(dl, dr, dl["_sign"] * dr["_sign"]))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- per-batch hook -----------------------------------------------------

    def apply(
        self,
        left_chunk: DataFrame | None = None,
        right_chunk: DataFrame | None = None,
        batch_id: int | None = None,
    ) -> DataFrame | None:
        """Fold one micro-batch (either or both sides) into state and
        return this batch's SIGNED join deltas (output columns + _sign;
        None when the batch produces no join change). Replays by batch id
        are no-ops (effectively-once, T6)."""
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return None
            self.last_batch_id = int(batch_id)

        dl = _signed_images(left_chunk) if left_chunk is not None else None
        dr = _signed_images(right_chunk) if right_chunk is not None else None
        deltas = self._join_delta(dl, dr)

        # advance the two latest-state tables AFTER the delta join (the
        # algebra needs the OLD states on the mixed terms)
        if left_chunk is not None:
            self.left_state = apply_changelog(
                self.left_state, left_chunk, self.left_pk
            ).localCheckpoint(eager=True)
        if right_chunk is not None:
            self.right_state = apply_changelog(
                self.right_state, right_chunk, self.right_pk
            ).localCheckpoint(eager=True)

        if deltas is not None:
            deltas = deltas.localCheckpoint(eager=True)
            self._fold_result(deltas)
        return deltas

    def _fold_result(self, deltas: DataFrame) -> None:
        """Net-accumulate signed deltas into the maintained join result:
        group by every output column, rows with net sign <= 0 vanish (an
        update's −before cancels the stored row; its +after survives)."""
        signed = (
            deltas
            if self.join_state is None
            else self.join_state.withColumn("_sign", F.lit(1)).unionByName(deltas)
        )
        cols = [c for c in signed.columns if c != "_sign"]
        self.join_state = (
            signed.groupBy(*cols)
            .agg(F.sum("_sign").alias("_net"))
            .filter(F.col("_net") > 0)
            .drop("_net")
            .localCheckpoint(eager=True)
        )

    # -- query side ---------------------------------------------------------

    def result(self) -> DataFrame | None:
        """The maintained join table (must equal the batch inner join of
        the two latest states after any changelog prefix)."""
        return self.join_state

    def recompute(self) -> DataFrame | None:
        """The recompute twin: batch inner join of the current latest
        states — the equality oracle for tests."""
        if self.left_state is None or self.right_state is None:
            return None
        ls = self._proj(self.left_state, self.left_project)
        r = self._proj(self.right_state, self.right_project)
        right_cols = [c for c in r.columns if c != self.right_key]
        return ls.join(r, ls[self.left_key] == r[self.right_key]).select(
            *[ls[c] for c in ls.columns],
            *[r[c] for c in right_cols],
        )
