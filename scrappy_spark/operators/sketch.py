"""KMV (k-minimum-values) cardinality sketch — the distributed
distinct-count estimator that, unlike HyperLogLog, is bit-exactly
reproducible across engines.

Why this exists: at 100 TB, ``COUNT(DISTINCT x)`` over a
billions-cardinality column is a full shuffle of the distinct set.
Spark's built-in answer is ``approx_count_distinct`` (HLL++), but its
estimate depends on engine-internal hashing and register layout — it
can never be value-oracled against another system, and two Spark
versions can disagree. KMV has the same one-pass, bounded-memory
profile (keep the k smallest distinct hash values; estimate
``(k-1) * H / h_k`` where ``h_k`` is the k-th minimum and ``H`` the
hash space) but is a pure function of the hash — and the engine's
``hash60`` primitive is already mirrored in DuckDB, so the sketch, the
k-th minimum, and the estimate are all exactly checkable. Standard
construction: Bar-Yossef et al. 2002 ("Counting distinct elements in a
data stream"), the same estimator family the theta sketch generalizes.

Scale shape: one ``mapInPandas`` pass keeps ≤k distinct hashes per
partition (O(k) memory, no shuffle), the surviving ≤P·k rows collapse
through a tiny distinct + TakeOrdered(k) — the full distinct set is
never materialized and never shuffled. The global k smallest distinct
hashes are a deterministic set (any global top-k member survives its
partition's top-k), so partitioning cannot change the answer.

The driver entry also emits the exact distinct count (a real shuffle —
affordable at bench scale) so the oracle checks estimator arithmetic
AND the estimate's input against ground truth in one row.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import hash60_col, tokens_col

KMV_K = 256
HASH_SPACE = float(1 << 60)  # exact in double; (k-1)*HASH_SPACE < 2^68 but
# the product is computed in double where 255 * 2^60 is exactly
# representable (255 < 2^53), so both engines round identically


def kmv_min_hashes(df: DataFrame, col: Column, k: int = KMV_K) -> DataFrame:
    """The k smallest distinct ``hash60`` values of ``col`` as a
    single-column DataFrame ``h`` — the sketch itself."""
    hashed = df.select(hash60_col(col.cast("string")).alias("h"))

    def partition_kmin(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: set[int] = set()
        cap = float("inf")
        for b in batches:
            for h in b["h"]:
                h = int(h)
                if h < cap and h not in best:
                    best.add(h)
                    if len(best) > k:
                        best.remove(max(best))
                    if len(best) == k:
                        cap = max(best)
        yield pd.DataFrame({"h": sorted(best)})

    survivors = hashed.mapInPandas(partition_kmin, schema="h long")
    return survivors.distinct().orderBy("h").limit(k)


def kmv_estimate(min_hashes: DataFrame, k: int = KMV_K) -> DataFrame:
    """One row (k, kth_min_hash, est_distinct) from a sketch. If fewer
    than k distinct values exist the sketch IS the distinct set and the
    estimate is the exact count (the standard small-cardinality
    fallback)."""
    agg = min_hashes.agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth_min_hash")
    )
    return agg.select(
        F.lit(k).alias("k"),
        "kth_min_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth_min_hash")
        )
        .alias("est_distinct"),
    )


def distinct_tokens_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: KMV estimate of the corpus' distinct-token count,
    side by side with the exact count. Columns (k, kth_min_hash,
    est_distinct, exact_distinct)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("t"))
    sketch = kmv_estimate(kmv_min_hashes(toks, F.col("t")))
    exact = toks.agg(F.countDistinct("t").alias("exact_distinct"))
    return sketch.crossJoin(F.broadcast(exact))
