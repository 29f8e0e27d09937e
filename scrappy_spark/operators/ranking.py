"""Exact corpus-wide ranking and quantile bucketing without a
single-reducer window.

The CCNet recipe every LM-data pipeline reuses: score each document
with a language-model quality signal, rank the whole corpus, and keep/
route documents by quantile bucket (head/middle/tail). The naive Spark
spelling — ``row_number() OVER (ORDER BY score)`` — plans an
``Exchange SinglePartition``: the entire corpus flows through ONE
reducer, which is exactly the operator shape that dies first at 100 TB.

This module implements the standard distributed exact-rank recipe
instead:

1. ``repartitionByRange(score, doc_id)`` + ``sortWithinPartitions`` —
   a range shuffle, so partition p holds a contiguous, sorted slice of
   the global order (the tie-break column makes the order total, hence
   deterministic regardless of physical scheduling);
2. one cheap pass counts rows per partition (P rows to the driver — a
   partition-count-sized collect, the same bounded pattern as IVF's
   sampled centroids);
3. a second pass over the SAME persisted partitions adds
   ``rank = offset[partition] + local_row_number`` via ``mapInPandas``
   (Arrow-batched; the persist pins the range boundaries so both
   passes see identical partitioning — range sampling is otherwise
   free to re-draw).

Bucket assignment is pure integer math on the rank —
``bucket = ((rank-1) * k) div N`` — so the oracle mirrors it exactly;
no float quantile cutoffs exist anywhere (interpolated-percentile
cutoffs are the other classic cross-engine mismatch).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import textstats

BUCKETS = 3
BUCKET_LABELS = ("head", "middle", "tail")  # low → high surprisal

# exact discrete quantiles as rationals — the target rank is the pure
# integer ceil(num/den * N), so both engines compute it identically
QUANTILES = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))

HEAVY_K = 50


def exact_rank(
    df: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> DataFrame:
    """Append an exact 1-based global ``rank`` ordered by
    ``order_cols`` (which must be a total order — include a unique
    tie-break column) without ever collapsing to one partition.

    Returns the input columns plus ``rank``. The input is persisted for
    the duration of the two passes and unpersisted before returning;
    the result is localCheckpoint-ed so callers never re-trigger the
    range shuffle.
    """
    ranked, _ = exact_rank_with_total(df, order_cols, num_partitions)
    return ranked


def exact_rank_with_total(
    df: DataFrame, order_cols: list[str], num_partitions: int | None = None
) -> tuple[DataFrame, int]:
    """``exact_rank`` plus the total row count, which the offset pass
    computes anyway — callers that need N (quantile targets, bucket
    splits) must not pay a second count() action for it."""
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(p, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = parted.drop("_pid").schema.add("rank", "long")

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for b in batches:
            if len(b) == 0:
                continue
            off = offsets[int(b["_pid"].iloc[0])]
            b = b.drop(columns=["_pid"])
            b["rank"] = range(off + seen + 1, off + seen + 1 + len(b))
            seen += len(b)
            yield b

    ranked = parted.mapInPandas(add_rank, schema=out_schema).localCheckpoint()
    parted.unpersist()
    return ranked, acc


def surprisal_buckets(
    spark: SparkSession, sf_dir: str, k: int = BUCKETS
) -> DataFrame:
    """CCNet-style quality buckets: rank every document by mean unigram
    surprisal (low = head = fluent/common text, high = tail) and assign
    quantile bucket ``(rank-1)*k div N``. Columns
    (doc_id, mean_surprisal, rank, bucket)."""
    scored = textstats.unigram_logprob(spark, sf_dir).select(
        "doc_id", "mean_surprisal"
    )
    ranked, n_docs = exact_rank_with_total(scored, ["mean_surprisal", "doc_id"])
    labels = F.array(*[F.lit(x) for x in BUCKET_LABELS[:k]])
    return (
        ranked.select(
            "doc_id",
            "mean_surprisal",
            "rank",
            F.expr(f"((rank - 1) * {k}) div {n_docs}").alias("_b"),
        )
        .select(
            "doc_id",
            "mean_surprisal",
            "rank",
            F.element_at(labels, F.col("_b").cast("int") + 1).alias("bucket"),
        )
    )


def token_count_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete corpus quantiles (p50/p90/p99 of per-document
    token counts) without a single-reducer sort: the same
    ``exact_rank`` range-shuffle recipe, then a broadcast join of the
    three target ranks. The quantile definition is purely integral —
    target rank = ceil(q·N) on the (n_tokens, doc_id) total order — so
    the DuckDB mirror is the identical integer expression (no
    interpolated-percentile cross-engine hazard, the classic failure
    mode of approx_percentile-style oracles). Columns (quantile,
    target_rank, n_tokens).

    Scale shape: one range Exchange + one bounded partition-count
    collect (inside exact_rank) + a 3-row broadcast join. The count()
    action is a partial-agg count, not a materialization.
    """
    scored = textstats.token_count(spark, sf_dir)
    ranked, n = exact_rank_with_total(scored, ["n_tokens", "doc_id"])
    targets = spark.createDataFrame(
        [(label, (num * n + den - 1) // den) for label, num, den in QUANTILES],
        "quantile string, target_rank long",
    )
    return (
        ranked.join(
            F.broadcast(targets), ranked["rank"] == targets["target_rank"]
        )
        .select("quantile", "target_rank", "n_tokens")
    )


def heavy_hitters(spark: SparkSession, sf_dir: str, k: int = HEAVY_K) -> DataFrame:
    """Exact corpus-wide top-k tokens (count desc, token asc — a total
    order, so ties cannot flap between engines). Columns (token,
    n_occurrences, rk).

    Scale shape: explode → two-phase hash aggregate (map-side partial
    combine collapses the token stream to the vocabulary before the
    one Exchange) → ``TakeOrderedAndProject`` for the top-k: every
    partition keeps only its k best, the driver merges P·k rows —
    never a global sort, never an Exchange SinglePartition (plan
    test pins this). The rk column is assigned driver-free by ranking
    the already-k-sized result with a tiny window."""
    from pyspark.sql import Window

    from .text import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = (
        docs.select(F.explode(tokens_col(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return counts.withColumn("rk", F.row_number().over(w))


def lang_token_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact discrete quantiles of token counts — the
    grouped counterpart of ``token_count_quantiles``. Grouped quantiles
    are the EASY case at scale: a window partitioned by the group key
    shuffles once and sorts per group (no single-reducer hazard — that
    only exists for the global order, which exact_rank handles).
    Columns (lang, quantile, target_rank, n_tokens)."""
    from pyspark.sql import Window

    from .text import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.select(
        "doc_id", "lang", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )
    w = Window.partitionBy("lang")
    ranked = scored.select(
        "lang",
        "n_tokens",
        F.row_number()
        .over(w.orderBy("n_tokens", "doc_id"))
        .alias("rank"),
        F.count("*").over(w).alias("c"),
    )
    targets = spark.createDataFrame(
        [(q, num, den) for q, num, den in QUANTILES],
        "quantile string, num int, den int",
    )
    return (
        ranked.crossJoin(F.broadcast(targets))
        .where(
            F.col("rank")
            == F.expr("(num * c + den - 1) div den").cast("long")
        )
        .select(
            "lang",
            "quantile",
            F.col("rank").alias("target_rank"),
            "n_tokens",
        )
    )
