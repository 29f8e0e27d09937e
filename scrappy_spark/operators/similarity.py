"""Similarity search over an embedding column (array<float>).

Three paths:
  * brute-force cosine top-k — exact baseline, native expressions only
    (zip_with dot product inside whole-stage codegen).
  * LSH-bucketed ANN — random-hyperplane signs with md5-derived
    deterministic "random" planes; candidates only within matching sign
    buckets (multi-probe over B tables). At 100 TB the bucket groupBy is
    the only shuffle and each bucket is small; recall is tested against
    the brute-force baseline (tests/test_similarity.py).
  * IVF ANN — k-means coarse quantizer (trained driver-side on a bounded
    deterministic sample, the standard IVF recipe), cells assigned by one
    vectorized pandas pass; queries probe their ``nprobe`` nearest cells
    and re-rank exactly inside them. At scale the assignment is the only
    full pass and candidate generation is an equi-join on cell id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        "label",
    )


def _cosine(lv: str, rv: str):
    dot = F.aggregate(
        F.zip_with(lv, rv, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    n = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return dot / (n(lv) * n(rv))


def cosine_topk(
    spark: SparkSession, sf_dir: str, k: int = 5, n_queries: int = 5
) -> DataFrame:
    """Exact top-k neighbours for the first ``n_queries`` vec_ids.
    Rank on (rounded score desc, vec_id) so order is fp-stable."""
    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("q"))
        .select(
            "q",
            "vec_id",
            F.round(_cosine("qv", "v"), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("q", "vec_id", "cosine", "rk")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes (fixed seed → same buckets
    on every run and every cluster size)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_sign_buckets(
    spark: SparkSession,
    sf_dir: str,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, table, bucket): sign-bit bucket per hash table, computed in
    one vectorized pandas UDF (matrix multiply per Arrow batch)."""
    return lsh_sign_buckets_from(
        spark, _emb(spark, sf_dir), n_planes, n_tables, seed
    )


def lsh_sign_buckets_from(
    spark: SparkSession,
    emb: DataFrame,
    n_planes: int = 4,
    n_tables: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The bucket kernel over any (vec_id, v) DataFrame — separated so the
    near-dup path (dedup.embedding_near_pairs) and planted-vector tests
    reuse the exact same bucketing."""
    dim = len(emb.select("v").first()["v"])
    planes = [
        _hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)
    ]
    bc = spark.sparkContext.broadcast(planes)

    @F.pandas_udf("array<int>")
    def buckets(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())  # (batch, dim)
        out = []
        bits_all = [
            ((mat @ p.T) > 0).astype(np.int64) for p in bc.value
        ]  # each (batch, n_planes)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        codes = [b @ weights for b in bits_all]  # (batch,) per table
        for i in range(len(mat)):
            out.append([int(c[i]) for c in codes])
        return pd.Series(out)

    return emb.select(
        "vec_id", F.posexplode(buckets(F.col("v"))).alias("table", "bucket")
    )


def _train_centroids(
    sample: np.ndarray, n_cells: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic mini k-means (seeded init, fixed iterations) on a
    driver-side sample — the IVF coarse quantizer. Sample size is bounded
    by the caller; full-data training is never required for IVF."""
    rng = np.random.RandomState(seed)
    cents = sample[rng.choice(len(sample), size=n_cells, replace=False)].copy()
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def ivf_cells(emb: DataFrame, centroids: np.ndarray, spark: SparkSession) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment, one vectorized pandas
    pass (matrix distance per Arrow batch) — the only full-data pass IVF
    needs."""
    bc = spark.sparkContext.broadcast(centroids)

    @F.pandas_udf("int")
    def cell_of(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy())
        c = bc.value
        d = (mat**2).sum(1)[:, None] - 2 * mat @ c.T + (c**2).sum(1)[None, :]
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return emb.select("vec_id", cell_of(F.col("v")).alias("cell"))


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    train_sample: int = 10_000,
) -> DataFrame:
    """IVF approximate top-k: train a coarse quantizer on a deterministic
    bounded sample, assign every vector to its nearest cell, probe the
    ``nprobe`` cells nearest each query, exact-cosine re-rank inside the
    probed cells only. Recall is tested against the brute-force baseline
    (tests); the driver check is rows-only (inherently approximate)."""
    emb = _emb(spark, sf_dir)
    sample = np.array(
        [
            r["v"]
            for r in emb.orderBy("vec_id").limit(train_sample).collect()
        ],
        dtype=np.float64,
    )
    cents = _train_centroids(sample, min(n_cells, len(sample)))
    cells = ivf_cells(emb, cents, spark)

    # queries probe their nprobe nearest centroids (tiny, driver-side)
    qrows = emb.where(F.col("vec_id") < n_queries).orderBy("vec_id").collect()
    probe_rows = []
    for r in qrows:
        qv = np.array(r["v"], dtype=np.float64)
        d = ((cents - qv[None, :]) ** 2).sum(axis=1)
        for c in np.argsort(d)[:nprobe]:
            probe_rows.append((r["vec_id"], int(c)))
    probes = F.broadcast(
        spark.createDataFrame(probe_rows, "q long, cell int")
    )

    cand = (
        cells.join(probes, "cell")
        .where(F.col("vec_id") != F.col("q"))
        .select("q", "vec_id")
    )
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q"), F.col("v").alias("qv")
    )
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(queries), "q")
        .select("q", "vec_id", F.round(_cosine("qv", "v"), 6).alias("cosine"))
    )
    w = Window.partitionBy("q").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("q", "vec_id", "cosine", "rk")
    )


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    n_queries: int = 5,
    n_planes: int = 4,
    n_tables: int = 16,
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any (table, bucket)
    with the query; exact cosine re-rank on candidates only."""
    emb = _emb(spark, sf_dir)
    b = lsh_sign_buckets(spark, sf_dir, n_planes, n_tables).persist()
    qb = b.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q"), "table", "bucket"
    )
    cand = (
        b.join(F.broadcast(qb), ["table", "bucket"])
        .where(F.col("vec_id") != F.col("q"))
        .select("q", "vec_id")
        .distinct()
    )
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q"), F.col("v").alias("qv")
    )
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(queries), "q")
        .select("q", "vec_id", F.round(_cosine("qv", "v"), 6).alias("cosine"))
    )
    w = Window.partitionBy("q").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("q", "vec_id", "cosine", "rk")
    )
