"""KMV cardinality sketch: python-mirror exactness, partitioning
invariance, small-cardinality fallback."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from scrappy_spark.operators import sketch
from scrappy_spark.operators.text import hash60_py, tokens_py


def _py_kmv(values, k=sketch.KMV_K):
    hashes = sorted({hash60_py(str(v)) for v in values})
    kept = hashes[:k]
    if len(kept) < k:
        return kept, float(len(kept))
    return kept, (k - 1) * sketch.HASH_SPACE / kept[-1]


def test_kmv_matches_python_mirror_on_corpus(spark, sf_dir):
    toks = []
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        toks.extend(tokens_py(r["text"]) or [])
    kept, est = _py_kmv(toks)
    row = sketch.distinct_tokens_sketch(spark, sf_dir).collect()[0]
    assert row["kth_min_hash"] == kept[-1]
    assert row["est_distinct"] == est
    assert row["exact_distinct"] == len({hash60_py(str(t)) for t in toks})
    # the estimator is within a plausible band of truth (k=256 → ~6% rse)
    assert 0.6 * row["exact_distinct"] < est < 1.6 * row["exact_distinct"]


def test_kmv_partitioning_invariant(spark):
    df = spark.range(0, 5000).select(F.col("id").alias("v"))
    a = sorted(
        r["h"] for r in sketch.kmv_min_hashes(df, F.col("v")).collect()
    )
    b = sorted(
        r["h"]
        for r in sketch.kmv_min_hashes(df.repartition(7), F.col("v")).collect()
    )
    kept, _ = _py_kmv(range(5000))
    assert a == b == kept


def test_kmv_small_cardinality_is_exact(spark):
    df = spark.createDataFrame([Row(v=i % 10) for i in range(1000)])
    got = sketch.kmv_estimate(sketch.kmv_min_hashes(df, F.col("v"))).collect()[0]
    assert got["est_distinct"] == 10.0
    assert got["kth_min_hash"] == max(sorted({hash60_py(str(i)) for i in range(10)}))
