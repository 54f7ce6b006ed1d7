"""Durable accumulator state — parquet-backed save/restore for the
±delta accumulators (IncrementalTopK, IncrementalDistinctCount, …).

Why: the accumulators keep their state as localCheckpoint'd DataFrames —
session-local. With a PERSISTENT Structured Streaming checkpoint, a
restarted stream resumes from the last committed batch id, so a fresh
accumulator (empty state, empty replay guard) would silently fold only
the NEW batches onto nothing — wrong answers, not a crash. Durable state
must therefore travel WITH the streaming checkpoint: save after every
folded batch, restore before re-attach.

Layout (one root per accumulator):

    <root>/b<id>/<relation>.parquet   state relations as of batch <id>
    <root>/meta.json                  {"last_batch_id": id, "relations": [...]}

Write protocol: relations first into a NEW b<id> directory, meta.json
last (atomic rename) — a crash mid-save leaves the previous meta
pointing at the previous complete version, never a torn state. Older
version directories are pruned best-effort after the meta flip. On a
cluster the same protocol targets an object store / DBFS path; a
transactional table format (Delta/Iceberg) would subsume the manual
version flip, but the two-phase "data then pointer" shape is the same.

Save cost per batch is proportional to STATE size, not batch size — the
standard trade of externalized state (Flink's aligned checkpoints pay
the same; its incremental RocksDB checkpoints are the optimization this
deliberately doesn't reimplement). For the k-bounded top-k relation the
state is tiny; for reference-count state it is the live-pair relation.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class AccumulatorStateStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _meta_path(self) -> str:
        return os.path.join(self.root, "meta.json")

    def save(
        self,
        batch_id: int,
        relations: dict[str, DataFrame | None],
        extra: dict | None = None,
    ) -> None:
        vdir = os.path.join(self.root, f"b{batch_id}")
        names = []
        for name, df in relations.items():
            if df is None:
                continue
            df.write.mode("overwrite").parquet(os.path.join(vdir, f"{name}.parquet"))
            names.append(name)
        tmp = self._meta_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"last_batch_id": int(batch_id), "relations": names,
                 "extra": extra or {}},
                f,
            )
        os.replace(tmp, self._meta_path())  # the atomic pointer flip
        # prune superseded versions (best-effort; failures leave garbage,
        # never a bad pointer)
        for d in os.listdir(self.root):
            if d.startswith("b") and d != f"b{batch_id}":
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)

    def load(
        self, spark: SparkSession
    ) -> tuple[int, dict[str, DataFrame], dict] | None:
        """Return (last_batch_id, {name: relation}, extra) or None if
        never saved."""
        if not os.path.exists(self._meta_path()):
            return None
        with open(self._meta_path()) as f:
            meta = json.load(f)
        bid = int(meta["last_batch_id"])
        vdir = os.path.join(self.root, f"b{bid}")
        rels = {
            name: spark.read.parquet(os.path.join(vdir, f"{name}.parquet"))
            # localCheckpoint: detach from the files so a later save's
            # prune can't invalidate the in-memory state
            .localCheckpoint(eager=True)
            for name in meta["relations"]
        }
        return bid, rels, meta.get("extra", {})
