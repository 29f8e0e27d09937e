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

Seen-store compaction (the 10^10-frontier read path): the per-round seen
deltas are periodically compacted into a BASE snapshot partitioned by hash
bucket ``b = pmod(h, n_buckets)`` (map_reduce.rb:40-42 is the semantic;
the layout is the Iceberg bucket-transform shape). ``read_seen`` then
returns base ∪ tail-deltas, so the per-round read cost is O(tail) instead
of O(rounds × seen), and a bucket list (``buckets=``) prunes the base scan
to only the parquet partitions a suspect set can possibly live in. The
base version is flipped via an atomic ``seen_base.json`` marker, so a
crash mid-compaction is invisible (rollback removes unreferenced
versions; deltas are only deleted after the marker commit). At cluster
scale compaction is bucket-incremental (rewrite only buckets the tail
touches); here the tail is small enough that a full rewrite per
compaction is the simpler, equally-correct choice.

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
from pyspark.sql import functions as F

TABLES = ("seen", "order", "triples")


class CrawlStore:
    def __init__(self, root: str, seen_buckets: int = 64):
        self.root = root
        self.seen_buckets = seen_buckets
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
        (a crash mid-round leaves orphan parquet dirs — remove them), plus
        seen-base versions not referenced by the marker (a crash
        mid-compaction) and seen deltas already folded into the base (a
        crash between marker commit and delta cleanup)."""
        last = self.last_round()
        base = self.seen_base()
        base_upto = -1 if base is None else base["upto"]
        for t in TABLES:
            tdir = os.path.join(self.root, t)
            if not os.path.isdir(tdir):
                continue
            for d in os.listdir(tdir):
                if d.startswith("round="):
                    k = int(d.split("=", 1)[1])
                    stale = last is None or k > last
                    if t == "seen" and k <= base_upto:
                        stale = True
                    if stale:
                        shutil.rmtree(os.path.join(tdir, d))
        bdir = os.path.join(self.root, "seen_base")
        if os.path.isdir(bdir):
            for d in os.listdir(bdir):
                if base is None or d != f"v{base['upto']}":
                    shutil.rmtree(os.path.join(bdir, d))

    # -- seen-store compaction --------------------------------------------
    def seen_base(self) -> dict[str, Any] | None:
        """Marker of the current compacted base, or None."""
        path = os.path.join(self.root, "seen_base.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def compact_seen(self, spark: SparkSession, upto: int) -> dict[str, Any]:
        """Fold base + deltas ≤ ``upto`` into a new bucketed base snapshot
        (partitioned by ``b = pmod(h, seen_buckets)``), flip the marker
        atomically, then drop superseded versions and deltas."""
        df = self.read_seen(spark, upto=upto)
        old = self.seen_base()
        dest = os.path.join(self.root, "seen_base", f"v{upto}")
        (
            df.withColumn("b", F.pmod(F.col("h"), F.lit(self.seen_buckets)))
            .repartition(self.seen_buckets, "b")
            .write.mode("overwrite")
            .partitionBy("b")
            .parquet(dest)
        )
        marker = {"upto": upto, "buckets": self.seen_buckets}
        path = os.path.join(self.root, "seen_base.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, path)  # commit point — readers switch here
        if old is not None:
            shutil.rmtree(
                os.path.join(self.root, "seen_base", f"v{old['upto']}"),
                ignore_errors=True,
            )
        sdir = os.path.join(self.root, "seen")
        if os.path.isdir(sdir):
            for d in os.listdir(sdir):
                if d.startswith("round=") and int(d.split("=", 1)[1]) <= upto:
                    shutil.rmtree(os.path.join(sdir, d))
        return marker

    def read_seen(
        self,
        spark: SparkSession,
        upto: int | None = None,
        buckets: list[int] | None = None,
    ) -> DataFrame | None:
        """Seen set ≤ ``upto``: compacted base ∪ tail deltas. ``buckets``
        prunes the base scan to those hash buckets (partition pruning on
        the bucket dirs — only valid for membership probes whose keys all
        hash into ``buckets``; tail deltas are always read in full)."""
        last = self.last_round() if upto is None else upto
        if last is None:
            return None
        base = self.seen_base()
        parts: list[DataFrame] = []
        start = 0
        if base is not None:
            if base["upto"] > last:
                raise ValueError(
                    f"seen base (upto={base['upto']}) is newer than the "
                    f"requested snapshot (upto={last})"
                )
            bdf = spark.read.parquet(
                os.path.join(self.root, "seen_base", f"v{base['upto']}")
            )
            if buckets is not None:
                bdf = bdf.where(F.col("b").isin([int(x) for x in buckets]))
            parts.append(bdf.drop("b"))
            start = base["upto"] + 1
        dirs = [
            self._dir("seen", k)
            for k in range(start, last + 1)
            if os.path.isdir(self._dir("seen", k))
        ]
        if dirs:
            tail = spark.read.parquet(*dirs)
            parts.append(tail if not parts else tail.select(parts[0].columns))
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

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

    def read_delta_range(
        self, spark: SparkSession, table: str, frm: int, upto: int
    ) -> DataFrame | None:
        """Union of delta dirs in [frm, upto], or None if none exist —
        the seen TAIL read (rounds newer than the compacted base)."""
        dirs = [
            self._dir(table, k)
            for k in range(frm, upto + 1)
            if os.path.isdir(self._dir(table, k))
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def read_all(self, spark: SparkSession, table: str, upto: int | None = None) -> DataFrame | None:
        """Union of all committed deltas (≤ upto) for an append table.
        The seen table routes through ``read_seen`` — after compaction its
        old deltas no longer exist as round dirs."""
        if table == "seen":
            return self.read_seen(spark, upto=upto)
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
