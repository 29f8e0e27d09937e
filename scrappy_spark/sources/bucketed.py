"""Bucketed documents table — the cluster-side fetch-join layout.

PLANS.md's fetch-join note says "on a real cluster the documents table is
bucketed by doc_id and the fetch is a co-located join"; this makes that
claim executable. `write_bucketed_documents` persists the web table
bucketed by `doc_id` (Spark bucketed table in the session catalog —
Iceberg's `bucket(doc_id)` transform is the same declaration on a real
lakehouse), and a fetch join against `spark.table(name)` then needs NO
exchange on the documents side: only the (small) popped slice shuffles to
the bucket layout. Verified by a plan test
(tests/test_bucketed_join.py).

Crawler integration is zero-code: pass `spark.table(name)` as the
`documents` DataFrame — when the popped side exceeds the broadcast bound
the sort-merge join reuses the table's bucketing instead of shuffling
the web table every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int, path: str | None
) -> None:
    """The ONE bucketed-write contract (overwrite, bucketBy+sortBy on the
    join key, parquet, optional external path) — both persisted layouts
    go through it so the write recipe cannot drift between them."""
    w = (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_bucketed_documents(
    docs: DataFrame, table: str, buckets: int = 64, path: str | None = None
) -> None:
    """Persist (doc_id, spans) bucketed+sorted by doc_id. One-time cost;
    every subsequent fetch join reads the layout for free. ``path`` makes
    it an external table (storage outside the warehouse dir)."""
    _write_bucketed(docs, table, "doc_id", buckets, path)


def read_documents_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def write_bucketed_int8_store(
    store: DataFrame, table: str, buckets: int = 64, path: str | None = None
) -> None:
    """Persist the int8 embedding store (vec_id, q, nq —
    operators/similarity.int8_quantized) bucketed+sorted by vec_id: the
    ANN serving layout. Candidate lists from any generator (LSH buckets,
    IVF cells, delta joins) re-rank by joining the store on vec_id —
    against this table the store side needs NO exchange (only the small
    candidate list moves), and the store being int8 makes the scan it
    does pay 4× smaller than float32. Plan-asserted in
    tests/test_bucketed_join.py."""
    _write_bucketed(store, table, "vec_id", buckets, path)
