"""Extraction-quality metrics — the reference's correctness machinery
(optimizer.rb:326-343, admin.rb:183-228) as DataFrame operators. These are
both a user-facing operator (evaluate a KB against golden samples) and the
engine's own test harness (SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEY = ["s", "p", "o"]


def prf(golden: DataFrame, extracted: DataFrame) -> DataFrame:
    """Precision/recall/F over two triple sets (optimizer.rb:326-343):
    right = |golden| - |golden - extracted|; P = right/|extracted|,
    R = right/|golden| (empty -> 1.0), F = 2PR/(P+R)."""
    g = golden.select(*TRIPLE_KEY).distinct()
    e = extracted.select(*TRIPLE_KEY).distinct()
    right = g.join(e, TRIPLE_KEY, "inner").count()
    n_g, n_e = g.count(), e.count()
    p = right / n_e if n_e else 1.0
    r = right / n_g if n_g else 1.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    spark = golden.sparkSession
    return spark.createDataFrame(
        [(float(p), float(r), float(f), right, n_g, n_e)],
        "precision double, recall double, fscore double, "
        "right long, n_golden long, n_extracted long",
    )


def prf_by_predicate(golden: DataFrame, extracted: DataFrame) -> DataFrame:
    """Per-predicate grouped P/R/F (admin.rb:183-228): a full-outer
    grouped-join metric — one shuffle on the triple key, one on p."""
    g = golden.select(*TRIPLE_KEY).distinct().withColumn("in_g", F.lit(1))
    e = extracted.select(*TRIPLE_KEY).distinct().withColumn("in_e", F.lit(1))
    both = g.join(e, TRIPLE_KEY, "full_outer").select(
        "p",
        F.coalesce("in_g", F.lit(0)).alias("in_g"),
        F.coalesce("in_e", F.lit(0)).alias("in_e"),
    )
    agg = both.groupBy("p").agg(
        F.sum(F.col("in_g") * F.col("in_e")).alias("right"),
        F.sum("in_g").alias("n_golden"),
        F.sum("in_e").alias("n_extracted"),
    )
    p_ = F.when(F.col("n_extracted") > 0, F.col("right") / F.col("n_extracted")).otherwise(
        F.lit(1.0)
    )
    r_ = F.when(F.col("n_golden") > 0, F.col("right") / F.col("n_golden")).otherwise(
        F.lit(1.0)
    )
    return agg.select(
        "p",
        "right",
        "n_golden",
        "n_extracted",
        p_.alias("precision"),
        r_.alias("recall"),
        F.when(
            (p_ + r_) > 0, 2 * p_ * r_ / (p_ + r_)
        ).otherwise(F.lit(0.0)).alias("fscore"),
    )


def missing_and_wrong(golden: DataFrame, extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The explicit diff lists the admin UI shows (admin.rb:219-220):
    (golden - extracted, extracted - golden)."""
    g = golden.select(*TRIPLE_KEY).distinct()
    e = extracted.select(*TRIPLE_KEY).distinct()
    return g.exceptAll(e), e.exceptAll(g)
