"""Composed training-data pipeline over the `documents` table.

The individual operators (language ID, quality scoring, dedup pair
generation, duplicate-cluster resolution) are each oracle-checked on
their own; this module composes them into the end-to-end corpus filter a
real 100 TB training-data pipeline runs, and the driver oracle checks
the COMPOSITION value-for-value (the SQL mirror nests the same three
sub-queries). Beyond-the-reference layer — see COVERAGE.md; the crawl
engine (frontier/crawler.py) produces the documents this consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import boilerplate, dedup, repetition, textstats

MIN_TOKENS = 20  # drop stubs (the driver corpus' 25th percentile is 32)
KEEP_LANG = "en"
# v4 repetition gate: keep docs whose top 2-gram claims at most this
# fraction of 2-gram occurrences (the corpus' ~93rd percentile — drops
# the repetitive tail without gutting the corpus)
MAX_TOP2_FRAC = 0.08


def training_corpus(
    spark: SparkSession,
    sf_dir: str,
    keep_lang: str = KEEP_LANG,
    min_tokens: int = MIN_TOKENS,
) -> DataFrame:
    """One-pass training-corpus filter: keep documents that are
    (1) identified as ``keep_lang`` by the marker language ID,
    (2) at least ``min_tokens`` whitespace tokens (quality gate), and
    (3) the canonical survivor of their near-dup cluster
        (``doc_id == canonical_id`` from minhash_components).

    Plan shape at scale: three equi-joins on doc_id — langid and quality
    are embarrassingly-parallel scans, components is the (much smaller)
    label-propagation output; Catalyst pushes the lang/token filters
    below the joins, so non-English stubs never reach the join shuffle.
    """
    lang = textstats.marker_langid(spark, sf_dir)
    quality = textstats.quality_score(spark, sf_dir)
    comp = dedup.minhash_components(spark, sf_dir)
    return (
        quality.join(lang, "doc_id")
        .join(comp, "doc_id")
        .where(
            (F.col("pred_lang") == keep_lang)
            & (F.col("n_tokens") >= min_tokens)
            & (F.col("doc_id") == F.col("canonical_id"))
        )
        .select("doc_id", "n_tokens", "alpha_ratio", "pred_lang")
    )


def training_corpus_v2(
    spark: SparkSession,
    sf_dir: str,
    keep_lang: str = KEEP_LANG,
    min_tokens: int = MIN_TOKENS,
) -> DataFrame:
    """training_corpus + sequence-level boilerplate removal (round 4):
    documents are first rebuilt without their boilerplate segments
    (boilerplate.boilerplate_clean), then the quality gate runs on the
    CLEANED token count — a page that is mostly nav-bar shrinks below
    ``min_tokens`` and drops out even though its raw length passed v1.
    Language ID and survivor selection still act on the original text
    (boilerplate removal must not flip a document's language or its
    near-dup cluster membership).

    Output: (doc_id, n_tokens_clean, pred_lang, n_dropped). The driver
    oracle nests the boilerplate mirror inside the v1 mirrors, so the
    four-operator COMPOSITION is value-checked end-to-end."""
    lang = textstats.marker_langid(spark, sf_dir)
    clean = boilerplate.boilerplate_clean(spark, sf_dir)
    comp = dedup.minhash_components(spark, sf_dir)
    n_clean = F.size(
        F.split(F.trim(F.col("clean_text")), r"\s+")
    ).alias("n_tokens_clean")
    return (
        clean.select("doc_id", "clean_text", "n_dropped")
        .join(lang, "doc_id")
        .join(comp, "doc_id")
        .select("doc_id", n_clean, "pred_lang", "n_dropped", "canonical_id")
        .where(
            (F.col("pred_lang") == keep_lang)
            & (F.col("n_tokens_clean") >= min_tokens)
            & (F.col("doc_id") == F.col("canonical_id"))
        )
        .select("doc_id", "n_tokens_clean", "pred_lang", "n_dropped")
    )


def training_corpus_v3(
    spark: SparkSession,
    sf_dir: str,
    keep_lang: str = KEEP_LANG,
    min_tokens: int = MIN_TOKENS,
) -> DataFrame:
    """v2 + CHAINED text rewrites (round 4): boilerplate segments are
    dropped first, then duplicated passages are removed from the
    boilerplate-cleaned text (duplicate_passage_clean_from over the
    rewrite's output — rewrites compose like any other DataFrame), and
    the quality gate runs on the FINAL token count. Language ID and
    survivor selection still act on the original text.

    Output: (doc_id, n_tokens_final, pred_lang, n_removed) where
    n_removed counts passage-removed tokens (post-boilerplate). The
    oracle nests FIVE mirrors — the passages mirror parameterized over
    the boilerplate mirror's output — checking that the SQL mirrors
    compose exactly like the Spark kernels do."""
    lang = textstats.marker_langid(spark, sf_dir)
    bp = boilerplate.boilerplate_clean(spark, sf_dir)
    pp = boilerplate.duplicate_passage_clean_from(
        bp.select("doc_id", F.col("clean_text").alias("text"))
    )
    comp = dedup.minhash_components(spark, sf_dir)
    n_final = F.size(
        F.split(F.trim(F.col("clean_text")), r"\s+")
    ).alias("n_tokens_final")
    return (
        pp.select("doc_id", "clean_text", "n_removed")
        .join(lang, "doc_id")
        .join(comp, "doc_id")
        .select("doc_id", n_final, "pred_lang", "n_removed", "canonical_id")
        .where(
            (F.col("pred_lang") == keep_lang)
            & (F.col("n_tokens_final") >= min_tokens)
            & (F.col("doc_id") == F.col("canonical_id"))
        )
        .select("doc_id", "n_tokens_final", "pred_lang", "n_removed")
    )


def training_corpus_v4(
    spark: SparkSession,
    sf_dir: str,
    keep_lang: str = KEEP_LANG,
    min_tokens: int = MIN_TOKENS,
    max_top2: float = MAX_TOP2_FRAC,
) -> DataFrame:
    """v3 + the round-4 gates: benchmark decontamination and the
    repetition signal. On top of the chained rewrites, a document must
    also (4) not share any 8-gram with the benchmark split — and must
    not BE a benchmark document (the inner join on the decontamination
    output, which covers only corpus docs, removes eval members from
    the training set) — and (5) keep its top-2-gram occupancy at or
    under ``max_top2``. Contamination and repetition act on the
    ORIGINAL text: what a document shared with an eval set, or how
    degenerate it was, is a property of the crawled page, not of the
    rewrite.

    Output: (doc_id, n_tokens_final, pred_lang, top_2gram_frac). The
    oracle nests SEVEN mirrors — v3's five plus the decontamination and
    repetition mirrors."""
    lang = textstats.marker_langid(spark, sf_dir)
    bp = boilerplate.boilerplate_clean(spark, sf_dir)
    pp = boilerplate.duplicate_passage_clean_from(
        bp.select("doc_id", F.col("clean_text").alias("text"))
    )
    comp = dedup.minhash_components(spark, sf_dir)
    rep = repetition.repetition_stats(spark, sf_dir)
    dc = repetition.decontaminate(spark, sf_dir)
    n_final = F.size(
        F.split(F.trim(F.col("clean_text")), r"\s+")
    ).alias("n_tokens_final")
    return (
        pp.select("doc_id", "clean_text")
        .join(lang, "doc_id")
        .join(comp, "doc_id")
        .join(rep.select("doc_id", "top_2gram_frac"), "doc_id")
        .join(dc, "doc_id")
        .select(
            "doc_id", n_final, "pred_lang", "top_2gram_frac",
            "canonical_id", "contaminated",
        )
        .where(
            (F.col("pred_lang") == keep_lang)
            & (F.col("n_tokens_final") >= min_tokens)
            & (F.col("doc_id") == F.col("canonical_id"))
            & (F.col("contaminated") == 0)
            & (F.col("top_2gram_frac") <= max_top2)
        )
        .select("doc_id", "n_tokens_final", "pred_lang", "top_2gram_frac")
    )
