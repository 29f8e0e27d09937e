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


# ------------------------------------------------------------ HyperLogLog
#
# The register-based sibling of KMV (Flajolet et al. 2007), built on the
# same oracle-reproducible hash60 primitive. Where KMV keeps the k
# smallest DISTINCT hashes (O(k) memory but a per-partition distinct
# set), HLL keeps only max(rho) per register — duplicate-insensitive by
# construction, so the plan never computes a distinct set at all: ONE
# partial-max groupBy whose output is <= HLL_M rows PER PARTITION and
# HLL_M rows after the (tiny) shuffle. At 100 TB that is the cheapest
# possible cardinality plan: map-only over the corpus, a 256-row
# exchange, no state proportional to cardinality anywhere.
#
# Exactness contract: hash60 yields 60 bits; the top HLL_P=8 bits pick
# the register, the low 52 bits form the word w; rho = (leading zeros of
# w within 52 bits) + 1 = 53 - bit_length(w) (w=0 -> 53), computed via
# length(bin(w)) which both engines define identically (leading zeros
# stripped, bin(0)='0'). The indicator sum is kept SCALED BY 2^53 so it
# is an exact BIGINT: S = sum over all m registers of 2^(53 - M[j])
# (empty register: M=0, term 2^53); max S = 256 * 2^53 = 2^61 < 2^63.
# The raw estimate alpha_m * m^2 / Z with Z = S / 2^53 reduces to ONE
# IEEE double division NUMER / S where NUMER = alpha_m * m^2 * 2^53 is
# a Python-computed double embedded as the same literal in both engines
# — no libm anywhere (the standard small-range linear-counting
# correction needs ln(), which is NOT IEEE-pinned across engines, so
# this operator reports the raw estimator plus the zeros count and
# leaves the correction to the consumer; at the bench cardinalities
# n >> 2.5m the raw estimator is the right regime anyway).

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers
HLL_W_BITS = 52  # 60-bit hash minus the 8 register bits
_W_SPACE = 1 << HLL_W_BITS
# alpha_256 per Flajolet et al. 2007 (m >= 128 branch); computed once in
# Python and embedded as the identical repr() literal in the DuckDB
# mirror, so both engines start from the same double
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W_BITS + 1))


def hll_register_maxes(df: DataFrame, col: Column) -> DataFrame:
    """(reg, m_j): per-register max rho over ``col`` — the sketch state.
    Only registers that received at least one value appear (the
    estimator treats absent registers as M=0)."""
    h = hash60_col(F.concat(F.lit("hll:"), col.cast("string"))).alias("h")
    hashed = df.select(h)
    return (
        hashed.select(
            F.expr(f"h div {_W_SPACE}").alias("reg"),
            (F.col("h") % _W_SPACE).alias("w"),
        )
        .select(
            "reg",
            F.when(F.col("w") == 0, F.lit(HLL_W_BITS + 1))
            .otherwise(F.lit(HLL_W_BITS + 1) - F.length(F.bin(F.col("w"))))
            .cast("int")
            .alias("rho"),
        )
        .groupBy("reg")
        .agg(F.max("rho").alias("m_j"))
    )


def hll_estimate(maxes: DataFrame, spark: SparkSession) -> DataFrame:
    """One row (m, registers_hit, zeros, s_scaled, est_raw) from the
    sketch state. ``s_scaled`` is the exact BIGINT indicator sum
    (scaled by 2^53); ``est_raw`` the raw HLL estimate."""
    all_regs = spark.range(HLL_M).select(F.col("id").alias("reg"))
    filled = all_regs.join(maxes, "reg", "left").select(
        F.coalesce("m_j", F.lit(0)).alias("m_j")
    )
    agg = filled.agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W_BITS + 1} - m_j)")
        ).alias("s_scaled"),
        F.sum(F.when(F.col("m_j") == 0, 1).otherwise(0)).alias("zeros"),
    )
    return agg.select(
        F.lit(HLL_M).alias("m"),
        (F.lit(HLL_M) - F.col("zeros")).cast("long").alias("registers_hit"),
        F.col("zeros").cast("long").alias("zeros"),
        "s_scaled",
        (F.lit(HLL_NUMER) / F.col("s_scaled").cast("double")).alias("est_raw"),
    )


def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: raw-HLL estimate of the corpus' distinct-token
    count next to the exact count — columns (m, registers_hit, zeros,
    s_scaled, est_raw, exact_distinct). The exact count is a real
    distinct shuffle, affordable at bench scale, so the oracle checks
    the register state AND the estimator's input against ground truth
    in one row (the same protocol as the KMV entry)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("t"))
    est = hll_estimate(hll_register_maxes(toks, F.col("t")), spark)
    exact = toks.agg(F.countDistinct("t").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact))
