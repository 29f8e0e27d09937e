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
    grouped counterpart of ``token_count_quantiles``, built on the
    grouped exact-rank recipe so a dominant language spans many range
    partitions instead of serializing through one keyed-window task
    (#languages is driver-bounded, the recipe's precondition).
    Targets are the same integral ceil(q·c) per group. Columns
    (lang, quantile, target_rank, n_tokens)."""
    from .text import tokens_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = docs.select(
        "doc_id", "lang", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )
    ranked, totals = grouped_exact_rank_with_totals(
        scored, ["lang"], ["n_tokens", "doc_id"]
    )
    targets = spark.createDataFrame(
        [
            (lang, q, (num * c + den - 1) // den)
            for (lang,), c in totals.items()
            for q, num, den in QUANTILES
        ],
        "lang string, quantile string, target_rank long",
    )
    return (
        ranked.join(
            F.broadcast(targets),
            (ranked["lang"] == targets["lang"])
            & (ranked["rank"] == targets["target_rank"]),
        )
        .select(
            ranked["lang"],
            "quantile",
            F.col("target_rank").cast("int").alias("target_rank"),
            "n_tokens",
        )
    )


def grouped_exact_rank_with_totals(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Exact 1-based rank WITHIN each group, plus per-group totals —
    the grouped generalization of ``exact_rank``. A plain
    ``row_number() OVER (PARTITION BY group)`` serializes each group
    through one task, which is fine for many small groups but is the
    straggler/OOM shape when one group holds most of the corpus (a
    dominant language, a mega-domain). Here the range shuffle runs on
    (group, order) jointly, so a huge group spans MANY contiguous
    partitions and no task ever holds more than a partition's worth of
    it; ranks are stitched with per-(partition, group) offsets.

    Driver-side state is the (partitions × distinct groups) count
    table — callers must have a driver-bounded group cardinality
    (languages, sources after quotas, shard ids …). For unbounded group
    keys use the keyed window: with many small groups it is the right
    plan, and with unbounded LARGE groups no exact per-group total
    order is cheap.

    Returns (ranked df with a ``rank`` column, {group key tuple →
    group size}). Order columns must total-order rows within a group.
    """
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    allc = [*group_cols, *order_cols]
    parted = (
        df.repartitionByRange(p, *allc)
        .sortWithinPartitions(*allc)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    rows = (
        parted.groupBy("_pid", *group_cols)
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    totals: dict = {}
    offsets: dict = {}
    for r in sorted(rows, key=lambda r: r["_pid"]):
        key = tuple(r[c] for c in group_cols)
        offsets[(r["_pid"], key)] = totals.get(key, 0)
        totals[key] = totals.get(key, 0) + r["cnt"]

    out_schema = parted.drop("_pid").schema.add("rank", "long")

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen: dict = {}
        for b in batches:
            if len(b) == 0:
                continue
            pid = int(b["_pid"].iloc[0])
            b = b.drop(columns=["_pid"])
            ranks = []
            for key in zip(*[b[c] for c in group_cols]):
                s = seen.get(key, 0) + 1
                seen[key] = s
                ranks.append(offsets[(pid, key)] + s)
            b["rank"] = ranks
            yield b

    ranked = parted.mapInPandas(add_rank, schema=out_schema).localCheckpoint()
    parted.unpersist()
    return ranked, totals
