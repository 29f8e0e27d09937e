"""Deduplication operators over the `documents` table — the training-data
pipeline layer the engine adds beyond the reference (a crawl engine at
100 TB feeds a dedup stage before anything else).

All fingerprints derive from md5 (see text.py) so the DuckDB oracles in
__spark_entry__.py reproduce every value exactly.

Scale design:
  * exact dedup — hash-groupBy; the shuffle key is the fingerprint, so
    skew only occurs on *actual* duplicate explosions.
  * minhash+LSH — shingle→signature→band-bucket join; candidate pairs are
    generated per-bucket (never an all-pairs product). Bands/rows tune the
    S-curve; at 100 TB the band-bucket groupBy is the only shuffle.
  * simhash — 32-bit fingerprint via per-bit majority; near-dup = hamming
    distance on the fingerprint (bit_count(xor)), prefiltered by 16-bit
    halves (pigeonhole: hamming ≤ 3 ⇒ one half within 1...we use exact
    half-match blocking for distance ≤ k with 2 blocks when k ≤ 1 per
    half; the pair query below blocks on either half matching exactly).
  * n-gram Jaccard — exact verification layer: explode distinct shingles,
    self-join per shingle, count → Jaccard; pairs sharing no shingle never
    materialize.
  * embedding cosine — brute force here (correctness baseline); the
    LSH-bucketed scale path lives in similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import hash60_col, shingles_expr, tokens_col

MINHASH_K = 8
LSH_BANDS = 4  # 4 bands × 2 rows
SHINGLE_N = 3
JACCARD_T = 0.4


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: md5(text) → (fingerprint, keeper, n)."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n"))
    )


def _shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh): distinct n-token shingles per doc."""
    return (
        _docs(spark, sf_dir)
        .withColumn("toks", tokens_col(F.col("text")))
        .where(F.size("toks") >= SHINGLE_N)
        .select(
            "doc_id",
            F.explode(F.expr(shingles_expr("toks", SHINGLE_N))).alias("sh"),
        )
        .distinct()
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h0..h{K-1}): minhash signature, K independent hashes via
    salted md5 (Kirsch-Mitzenmacher not needed — md5 salting is cheap and
    oracle-reproducible)."""
    sh = _shingle_df(spark, sf_dir)
    aggs = [
        F.min(hash60_col(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
        for i in range(MINHASH_K)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs: equal (band, sig-slice) bucket join.
    Output (a, b) with a < b, distinct."""
    sig = minhash_signatures(spark, sf_dir)
    rows_per_band = MINHASH_K // LSH_BANDS
    bands = None
    for b in range(LSH_BANDS):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band = sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat_ws("_", *[c.cast("string") for c in cols]).alias("bucket"),
        )
        bands = band if bands is None else bands.unionAll(band)
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): 32-bit simhash over tokens (with multiplicity)."""
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(tokens_col(F.col("text"))).alias("tok"))
        .withColumn("h", hash60_col(F.col("tok")))
    )
    weights = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
            ).alias(f"w{b}")
            for b in range(32)
        ]
    )
    bit_terms = [
        F.when(F.col(f"w{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        for b in range(32)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return weights.select("doc_id", total.cast("long").alias("simhash"))


def simhash_near_pairs(
    spark: SparkSession, sf_dir: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, blocked on exact match
    of either 16-bit half (pigeonhole over 2 blocks covers distance ≤ 1
    per half; with max_hamming=3 one half has ≤ 1 differing bit — we
    block on exact half match, which is guaranteed when the 3 diffs land
    in one half; remaining pairs are a recall trade documented here)."""
    fp = simhash_fingerprints(spark, sf_dir)
    lo = (F.col("simhash").bitwiseAND(F.lit(0xFFFF))).alias("lo")
    hi = F.shiftright(F.col("simhash"), 16).alias("hi")
    fp2 = fp.select("doc_id", "simhash", lo, hi)
    pairs = None
    for block in ("lo", "hi"):
        l, r = fp2.alias("l"), fp2.alias("r")
        p = l.join(
            r,
            (F.col(f"l.{block}") == F.col(f"r.{block}"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        ).select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.bit_count(
                F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))
            ).alias("hamming"),
        )
        pairs = p if pairs is None else pairs.unionAll(p)
    return pairs.where(F.col("hamming") <= max_hamming).distinct()


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = JACCARD_T
) -> DataFrame:
    """Exact n-gram Jaccard similarity for every pair sharing ≥1 shingle.
    Output (a, b, jaccard) with jaccard ≥ threshold."""
    sh = _shingle_df(spark, sf_dir).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    l, r = sh.alias("l"), sh.alias("r")
    common = (
        l.join(
            r,
            (F.col("l.sh") == F.col("r.sh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("szb"))
    out = (
        common.join(F.broadcast(sa), "a")
        .join(F.broadcast(sb), "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("common")
                / (F.col("sza") + F.col("szb") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def embedding_cosine_pairs(
    spark: SparkSession, sf_dir: str, threshold: float = 0.99
) -> DataFrame:
    """Embedding near-dup pairs by exact cosine ≥ threshold (brute force —
    the correctness baseline; similarity.ann_lsh is the scale path)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    l, r = emb.alias("l"), emb.alias("r")
    dot = F.aggregate(
        F.zip_with("l.v", "r.v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(f"{side}.v", F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        l.join(r, F.col("l.vec_id") < F.col("r.vec_id"))
        .select(
            F.col("l.vec_id").alias("a"),
            F.col("r.vec_id").alias("b"),
            F.round(dot / (norm("l") * norm("r")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
