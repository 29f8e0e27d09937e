"""Intra-document repetition signals and benchmark decontamination.

Two operators every production training-data pipeline runs that the
engine did not yet cover:

- ``repetition_stats``: the Gopher-style repetition quality signals —
  per document, the fraction of word-2-gram occurrences claimed by the
  single most frequent 2-gram, and the fraction of word-3-gram
  occurrences that belong to any repeated 3-gram. High values mark
  boilerplate-ish / degenerate documents (nav soup, keyword stuffing)
  that survive naive length gates. (Rae et al., "Scaling Language
  Models: Methods, Analysis & Insights from Training Gopher", §A1.1 —
  public paper; thresholds are caller policy, the operator emits the
  raw signals.)

- ``decontaminate``: eval-set decontamination — remove from the corpus
  every document sharing any k-token n-gram with a benchmark set (the
  standard GPT-3/PaLM-style 8–13-gram overlap rule). The benchmark
  split is derived deterministically from doc_id so tests and oracles
  need no external data.

Both are pure native-function compositions (whole-stage codegen, no
Python in the hot path) with exact DuckDB mirrors in
``__spark_entry__``.

100 TB shape:
- repetition_stats: scan → explode grams → two partial-agg shuffles
  keyed (doc_id, n, gram) then (doc_id). Keys are near-unique per doc,
  so partial aggregation collapses almost everything map-side and no
  key can skew beyond a single document's gram count.
- decontaminate: the benchmark n-gram set (eval suites) is tiny versus
  the corpus, so it is distinct-ed, hashed to 60-bit ints (8 bytes per
  gram instead of a ~60-byte string) and BROADCAST; the corpus side is
  then a map-only explode + broadcast-hash left-semi probe — the only
  corpus-side shuffle is the distinct over the (small) matched doc_id
  set. No large-table shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import hash60_col, shingles_expr, tokens_col

# n-gram widths for the repetition signals (Gopher reports 2..4-gram
# top fractions and 5..10-gram dup fractions; one of each suffices for
# the operator shape — widths are parameters of the helper)
TOP_N = 2
DUP_N = 3

# decontamination: overlap n-gram width and the deterministic
# benchmark split (doc_id % BENCH_MOD == 0 plays the eval set)
CONTAM_K = 8
BENCH_MOD = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats_from(_docs(spark, sf_dir))


def repetition_stats_from(docs: DataFrame) -> DataFrame:
    """Per-document repetition signals over word n-grams.

    Output: ``doc_id``, ``top_2gram_frac`` (occurrences of the most
    frequent 2-gram / all 2-gram occurrences), ``dup_3gram_frac``
    (occurrences belonging to 3-grams seen more than once / all 3-gram
    occurrences), both rounded to 6 decimals. Documents shorter than
    ``DUP_N`` tokens are excluded (no 3-gram is defined on them).

    One scan: both gram widths are fanned out in a single explode of
    tagged structs, so the tokenize subtree is computed once.
    """
    d = docs.withColumn("toks", tokens_col(F.col("text"))).filter(
        F.size("toks") >= DUP_N
    )
    tag = lambda n: F.transform(  # noqa: E731
        F.expr(shingles_expr("toks", n)),
        lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
    )
    grams = d.select(
        "doc_id", F.explode(F.concat(tag(TOP_N), tag(DUP_N))).alias("x")
    ).select("doc_id", F.col("x.n").alias("n"), F.col("x.g").alias("g"))
    counts = grams.groupBy("doc_id", "n", "g").agg(F.count("*").alias("c"))
    is_top = F.col("n") == TOP_N
    is_dup = F.col("n") == DUP_N
    return (
        counts.groupBy("doc_id")
        .agg(
            F.max(F.when(is_top, F.col("c"))).alias("top_c"),
            F.sum(F.when(is_top, F.col("c")).otherwise(0)).alias("top_tot"),
            F.sum(F.when(is_dup & (F.col("c") > 1), F.col("c")).otherwise(0)).alias(
                "dup_c"
            ),
            F.sum(F.when(is_dup, F.col("c")).otherwise(0)).alias("dup_tot"),
        )
        .select(
            "doc_id",
            F.round(F.col("top_c") / F.col("top_tot"), 6).alias("top_2gram_frac"),
            F.round(F.col("dup_c") / F.col("dup_tot"), 6).alias("dup_3gram_frac"),
        )
    )


def decontaminate(
    spark: SparkSession,
    sf_dir: str,
    k: int = CONTAM_K,
    bench_mod: int = BENCH_MOD,
) -> DataFrame:
    return decontaminate_from(_docs(spark, sf_dir), k=k, bench_mod=bench_mod)


def decontaminate_from(
    docs: DataFrame, k: int = CONTAM_K, bench_mod: int = BENCH_MOD
) -> DataFrame:
    """Benchmark decontamination by shared k-token n-grams.

    The benchmark set is ``doc_id % bench_mod == 0`` (deterministic, no
    external data); the corpus is everything else. Output: one row per
    corpus document — ``doc_id``, ``contaminated`` (1 when the document
    shares at least one k-gram with any benchmark document, else 0).
    Callers drop the 1s; the flag output keeps the oracle non-vacuous
    in both directions.

    n-grams are compacted to 60-bit md5-derived hashes on BOTH sides
    (8 bytes per gram in the broadcast instead of the gram string); the
    DuckDB mirror reproduces the same hashes, so a hash collision —
    cosmically unlikely at 60 bits — would be reproduced, not diverged
    from.
    """
    d = docs.withColumn("toks", tokens_col(F.col("text")))
    gram_hashes = F.transform(
        F.expr(shingles_expr("toks", k)), lambda g: hash60_col(g)
    )
    bench = (
        d.filter((F.col("doc_id") % bench_mod) == 0)
        .filter(F.size("toks") >= k)
        .select(F.explode(gram_hashes).alias("h"))
        .distinct()
    )
    corpus = d.filter((F.col("doc_id") % bench_mod) != 0)
    hits = (
        corpus.filter(F.size("toks") >= k)
        .select("doc_id", F.explode(gram_hashes).alias("h"))
        .join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return (
        corpus.select("doc_id")
        .join(hits.withColumn("hit", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("hit"), F.lit(0)).cast("int").alias("contaminated")
        )
    )


def bench_gram_hashes(
    docs: DataFrame, k: int = CONTAM_K, bench_mod: int = BENCH_MOD
) -> list[int]:
    """Collect the benchmark k-gram hash set driver-side. Eval suites
    are small by definition, so this is a bounded collect (the same
    contract as the IVF centroid sample) — it exists so the set can ride
    into a STREAMING plan as a literal, where the batch operator's
    build-from-the-same-table join cannot."""
    d = docs.withColumn("toks", tokens_col(F.col("text")))
    rows = (
        d.filter((F.col("doc_id") % bench_mod) == 0)
        .filter(F.size("toks") >= k)
        .select(
            F.explode(
                F.transform(F.expr(shingles_expr("toks", k)), lambda g: hash60_col(g))
            ).alias("h")
        )
        .distinct()
        .collect()
    )
    return sorted(r["h"] for r in rows)


def decontaminate_stream(
    corpus: DataFrame, bench_hashes: list[int], k: int = CONTAM_K
) -> DataFrame:
    """Contamination flag for a STREAMING corpus: per row, hash the
    document's k-grams and test overlap against the literal benchmark
    hash array — a pure map-side expression (no join, no shuffle, no
    state), so it runs unchanged under Structured Streaming and flags
    each micro-batch's documents exactly as the batch operator would.
    Documents shorter than k tokens are clean by definition."""
    toks = tokens_col(F.col("text"))
    grams = F.when(
        F.size(toks) >= k,
        F.transform(F.expr(shingles_expr("toks", k)), lambda g: hash60_col(g)),
    ).otherwise(F.array().cast("array<bigint>"))
    hit = F.arrays_overlap(
        grams, F.lit([int(h) for h in bench_hashes]).cast("array<bigint>")
    )
    return corpus.withColumn("toks", toks).select(
        "doc_id", hit.cast("int").alias("contaminated")
    )
