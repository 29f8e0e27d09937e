"""Opt-in Iceberg-backed CrawlStore.

The sandbox has no Iceberg runtime jar, so the default store is the
Iceberg-SHAPED parquet layout in checkpoint.py (the tested path). On a
cluster with the jar, this class flips the same bookkeeping onto real
Iceberg tables — the "one-flag flip" the parquet store's docstring
promises:

  * one Iceberg table per logical table (``seen`` / ``order`` /
    ``triples``), partitioned by ``round`` (identity transform); ``seen``
    additionally by ``bucket(B, h)`` — the declarative version of the
    parquet store's ``pmod(h, B)`` base layout, with bucket pruning done
    by Iceberg metadata instead of directory names;
  * the commit protocol is UNCHANGED: round manifests stay JSON files
    written via atomic rename (checkpoint.py), so kill-resume replay
    logic is identical across store kinds and a round is visible iff its
    manifest exists — Iceberg snapshots add per-file stats on top;
  * ``rollback_incomplete`` = ``DELETE WHERE round > last`` (an atomic
    Iceberg delete) instead of rmtree;
  * ``compact_seen`` only advances the base marker: physical compaction
    of an Iceberg table is table maintenance (``rewrite_data_files``),
    and the bucketed layout is declared at CREATE time rather than
    rewritten per compaction. The marker still drives the crawler's
    base-cache/tail split, so the round loop behaves identically.

Activation::

    spark = get_spark(extra_conf={
        "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.local.type": "hadoop",
        "spark.sql.catalog.local.warehouse": "/path/warehouse",
    })
    store = IcebergCrawlStore(spark, root, "local.crawl")
    Crawler(spark, docs, root, cfg, store=store)

Guarded by a skip-if-no-jar test (tests/test_iceberg_store.py) that runs
the full store contract whenever an Iceberg catalog can actually be
instantiated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import CrawlStore

_SCHEMAS = {
    "seen": "uri string, depth int, seq long, host string, h long",
    "order": "seq long, uri string, depth int, round int",
    "triples": (
        "s string, p string, o string, is_literal boolean, "
        "src_uri string, src_seq long"
    ),
}


class IcebergCrawlStore(CrawlStore):
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        namespace: str = "local.crawl",
        seen_buckets: int = 64,
    ):
        super().__init__(root, seen_buckets=seen_buckets)
        self.spark = spark
        self.ns = namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {namespace}")
        for t, schema in _SCHEMAS.items():
            cols = schema if t == "order" else schema + ", round int"
            part = (
                f"round, bucket({seen_buckets}, h)" if t == "seen" else "round"
            )
            spark.sql(
                f"CREATE TABLE IF NOT EXISTS {self._tbl(t)} ({cols}) "
                f"USING iceberg PARTITIONED BY ({part})"
            )

    def _tbl(self, table: str) -> str:
        return f"{self.ns}.crawl_{table}"

    # -- overridden IO (manifest bookkeeping inherited unchanged) ---------
    def write_delta(self, table: str, rnd: int, df: DataFrame, max_files: int = 8):
        if table != "order":
            df = df.withColumn("round", F.lit(rnd))
        # row count from OUR DataFrame, not from the table's latest
        # snapshot (ADVICE r2): a concurrent writer on the same table can
        # interleave commits, and misattributed added-records would
        # corrupt the manifest seen_rows/frontier_rows used for resume.
        # Persist the delta so count and append see the SAME rows
        # (ADVICE r3: if an upstream intermediate is not actually cached,
        # the two executions of a non-deterministic lineage could
        # diverge — the exact corruption the count-our-own-rows change
        # was meant to prevent). The snapshot id recorded for lineage is
        # best-effort.
        df = df.persist()
        try:
            rows = df.count()
            df.writeTo(self._tbl(table)).append()
        finally:
            df.unpersist()
        snap = (
            self.spark.sql(
                f"SELECT snapshot_id FROM {self._tbl(table)}.snapshots "
                "ORDER BY committed_at DESC LIMIT 1"
            ).collect()[0]
        )
        return {
            "rows": rows,
            "partitions": {"snapshot": str(snap["snapshot_id"])},
        }

    def _read(self, table: str) -> DataFrame:
        return self.spark.table(self._tbl(table))

    def read_round(self, spark, table, rnd):
        df = self._read(table).where(F.col("round") == rnd)
        return df if table == "order" else df.drop("round")

    def read_delta_range(self, spark, table, frm, upto):
        df = self._read(table).where(
            (F.col("round") >= frm) & (F.col("round") <= upto)
        )
        return df if table == "order" else df.drop("round")

    def read_all(self, spark, table, upto=None):
        last = self.last_round() if upto is None else upto
        if last is None:
            return None
        return self.read_delta_range(spark, table, 0, last)

    def read_seen(self, spark, upto=None, buckets=None):
        df = self.read_all(spark, "seen", upto=upto)
        if df is not None and buckets is not None:
            # bucket probe: Iceberg prunes bucket(h) partitions from h
            # equality predicates; a pmod filter keeps semantics identical
            # to the parquet store even where pruning can't kick in
            df = df.where(
                F.pmod(F.col("h"), F.lit(self.seen_buckets)).isin(
                    [int(b) for b in buckets]
                )
            )
        return df

    def compact_seen(self, spark, upto):
        # physical compaction = Iceberg table maintenance
        # (rewrite_data_files); the marker still drives the crawler's
        # cached-base/tail split
        import json
        import os

        marker = {"upto": upto, "buckets": self.seen_buckets}
        path = os.path.join(self.root, "seen_base.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(marker, f)
        os.replace(tmp, path)
        return marker

    def rollback_incomplete(self):
        last = self.last_round()
        bound = -1 if last is None else last
        for t in _SCHEMAS:
            self.spark.sql(
                f"DELETE FROM {self._tbl(t)} WHERE round > {bound}"
            )
