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


def md5_planes(dim: int, n_planes: int, n_tables: int) -> np.ndarray:
    """Hyperplane components derived from md5 — reproducible ANYWHERE
    (numpy, DuckDB SQL, any future engine): component (t, p, j) =
    (hash60(f"{t}:{p}:{j}") / 2^60) * 2 - 1 ∈ [-1, 1), hash60 being the
    same 60-bit md5 prefix the text operators mirror in DuckDB (text.py).
    Uniform-per-coordinate rather than Gaussian — fine for sign-LSH
    (the exact-verify step carries correctness; planes only shape
    recall, which the planted-cluster tests measure)."""
    import hashlib

    c = np.empty((n_tables * n_planes, dim), dtype=np.float64)
    for t in range(n_tables):
        for p in range(n_planes):
            for j in range(dim):
                h = int(
                    hashlib.md5(f"{t}:{p}:{j}".encode()).hexdigest()[:15], 16
                )
                c[t * n_planes + p, j] = (h / 2**60) * 2 - 1
    return c


def lsh_sign_buckets_md5_from(
    spark: SparkSession, emb: DataFrame, n_planes: int, n_tables: int
) -> DataFrame:
    """(vec_id, table, bucket) with md5-derived planes AND a
    dimension-sequential float64 dot fold — bit-identical sign decisions
    to a DuckDB mirror (list_dot_product folds sequentially), so bucket
    membership itself is oracle-checkable, not just the exact verify.
    The Gaussian/BLAS kernel above stays the ANN top-k path (faster;
    ANN needs no SQL mirror)."""
    dim = len(emb.select("v").first()["v"])
    bc = spark.sparkContext.broadcast(md5_planes(dim, n_planes, n_tables))
    nt, npl = n_tables, n_planes

    @F.pandas_udf("array<int>")
    def buckets(v: pd.Series) -> pd.Series:
        C = bc.value  # (n_tables*n_planes, dim)
        mat = np.stack(v.to_numpy())
        acc = np.zeros((len(mat), C.shape[0]))
        for j in range(C.shape[1]):  # sequential fold (oracle parity)
            acc = acc + mat[:, j : j + 1] * C[:, j]
        bits = (acc >= 0.0).astype(np.int64)
        weights = 1 << np.arange(npl, dtype=np.int64)
        codes = bits.reshape(len(mat), nt, npl) @ weights  # exact int math
        return pd.Series([[int(x) for x in row] for row in codes])

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
    with the query; exact cosine re-rank on candidates only. Buckets and
    cosines are both DuckDB-reproducible (md5 planes, sequential folds),
    so even this *approximate* operator carries a full value oracle
    (`sim_ann_lsh_topk`) — the oracle mirrors candidate generation, not
    just the re-rank."""
    emb = _emb(spark, sf_dir)
    b = lsh_sign_buckets_md5_from(spark, emb, n_planes, n_tables).persist()
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
