"""Iceberg-shaped crawl checkpointing: snapshot-per-round with atomic
manifest commit, per-partition lineage, and bit-identical resume.

The reference has no durability at all (a crash loses the in-memory queue,
map_reduce.rb:11-15); the Sesame repository's timestamped contexts
(repository.rb:25-32) are its only persistent state. Here every round
commits four table deltas + a manifest:

    <root>/frontier/round=K/   full frontier snapshot after round K
    <root>/seen/round=K/       seen-set delta (items first enqueued in K)
    <root>/order/round=K/      crawl-order delta (items popped in K)
    <root>/triples/round=K/    extraction delta
    <root>/manifests/K.json    commit record: row counts, per-partition
                               lineage, next_seq, config hash

A round is visible iff its manifest exists; the manifest is written via
tmp-file + atomic rename, so a killed run resumes from the last complete
round and replays deterministically (round outputs are pure functions of
round inputs — no wall clock, no partition-layout dependence).

This layer is deliberately Iceberg-shaped (append-only deltas + snapshot
manifests): on a cluster with the Iceberg runtime jar, swap the
parquet-directory writes for ``writeTo(...).append()`` on an Iceberg table
and keep the same manifest bookkeeping; the sandbox has no Iceberg jar, so
the parquet implementation is the tested path.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame, SparkSession

TABLES = ("seen", "order", "triples")


class CrawlStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)

    # -- manifest bookkeeping -------------------------------------------
    def last_round(self) -> int | None:
        """Highest round with a committed manifest, or None."""
        rounds = [
            int(f[: -len(".json")])
            for f in os.listdir(os.path.join(self.root, "manifests"))
            if f.endswith(".json")
        ]
        return max(rounds) if rounds else None

    def manifest(self, rnd: int) -> dict[str, Any]:
        with open(os.path.join(self.root, "manifests", f"{rnd}.json")) as f:
            return json.load(f)

    def commit(self, rnd: int, meta: dict[str, Any]) -> None:
        """Atomic manifest write — the commit point for round ``rnd``."""
        path = os.path.join(self.root, "manifests", f"{rnd}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        os.replace(tmp, path)

    def rollback_incomplete(self) -> None:
        """Drop any table deltas from rounds after the last manifest
        (a crash mid-round leaves orphan parquet dirs — remove them)."""
        last = self.last_round()
        for t in TABLES:
            tdir = os.path.join(self.root, t)
            if not os.path.isdir(tdir):
                continue
            for d in os.listdir(tdir):
                if d.startswith("round="):
                    k = int(d.split("=", 1)[1])
                    if last is None or k > last:
                        shutil.rmtree(os.path.join(tdir, d))

    # -- table IO --------------------------------------------------------
    def _dir(self, table: str, rnd: int) -> str:
        return os.path.join(self.root, table, f"round={rnd}")

    def write_delta(
        self, table: str, rnd: int, df: DataFrame, max_files: int = 8
    ) -> dict[str, Any]:
        """Write one round's delta; returns lineage (per-partition counts).

        Deltas are coalesced to at most ``max_files`` files — per-round
        deltas are small relative to the cluster, and one file per task
        partition would drown the store in tiny files (at cluster scale
        this is the Iceberg write.target-file-size knob).

        Per-partition lineage (the north rule's 'per-partition lineage +
        metrics') is read back from the written parquet footers — one file
        per write partition — so it costs zero extra Spark jobs.
        """
        path = self._dir(table, rnd)
        df.coalesce(max_files).write.mode("overwrite").parquet(path)
        import pyarrow.parquet as pq

        part_counts: dict[str, int] = {}
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                part_counts[f.split("-")[1]] = pq.read_metadata(
                    os.path.join(path, f)
                ).num_rows
        return {"rows": sum(part_counts.values()), "partitions": part_counts}

    def read_round(self, spark: SparkSession, table: str, rnd: int) -> DataFrame:
        return spark.read.parquet(self._dir(table, rnd))

    def read_all(self, spark: SparkSession, table: str, upto: int | None = None) -> DataFrame | None:
        """Union of all committed deltas (≤ upto) for an append table."""
        last = self.last_round() if upto is None else upto
        if last is None:
            return None
        dirs = [
            self._dir(table, k)
            for k in range(last + 1)
            if os.path.isdir(self._dir(table, k))
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)
