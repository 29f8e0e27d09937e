"""Text-analysis operators: token counting, quality scoring, document
fingerprinting, language ID. All except ngram_langid are expressed with
native functions only (whole-stage codegen) and have exact DuckDB oracles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokens_col

STOPWORDS = ("the", "a", "and", "of", "to", "in")
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "la"),
    "es": ("el", "los", "y"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword heuristics (the standard crawl
    quality gates, computed as pure expressions)."""
    d = _docs(spark, sf_dir).withColumn("toks", tokens_col(F.col("text")))
    n_tok = F.size("toks")
    n_char = F.length("text")
    alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    stop = F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(alpha / n_char, 6).alias("alpha_ratio"),
        F.round(stop / n_tok, 6).alias("stopword_ratio"),
        F.round(n_char / n_tok, 6).alias("mean_token_len"),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("fp"),
    )


def marker_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID — deterministic argmax with fixed
    priority (en > de > fr > es), 'und' when no marker hits."""
    d = _docs(spark, sf_dir).withColumn("toks", tokens_col(F.col("text")))
    def marker_count(markers):
        # one-arg lambda: F.filter introspects the signature, so extra
        # (default) params would be bound to lambda variables
        return F.size(F.filter("toks", lambda t: t.isin(*markers)))

    scores = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    pred = F.lit("und")
    # build argmax via reverse-priority folds: later (higher-priority)
    # languages override on strict >
    best = F.lit(0)
    for lang in ("es", "fr", "de", "en"):
        s = scores[lang]
        pred = F.when(s >= best, F.when(s > 0, F.lit(lang)).otherwise(pred)).otherwise(pred)
        best = F.when(s >= best, s).otherwise(best)
    return d.select("doc_id", pred.alias("pred_lang"))


def ngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram-profile language ID (the real heuristic): cosine
    over hashed char-3-gram counts against tiny built-in profiles, in one
    vectorized pandas UDF. No SQL oracle (rows-only check) — accuracy is
    asserted in tests against the table's lang column where separable."""
    import zlib

    import numpy as np
    import pandas as pd

    def _h(s: str) -> int:
        # crc32, NOT hash(): Python string hash is process-salted and
        # would differ between driver and executors
        return zlib.crc32(s.encode()) & 0xFFF

    profiles = {
        "en": "the and ing ion tio ent for ati ter ers",
        "de": "der und sch die ein ich den gen ung cht",
        "fr": "les de la tion ent des que une eur ait",
        "es": "de la que el los ion cion ado par ent",
    }
    langs = sorted(profiles)
    prof_vecs = {}
    for lang, words in profiles.items():
        v = np.zeros(1 << 12)
        for w in words.split():
            for i in range(len(w) - 2):
                v[_h(w[i : i + 3])] += 1.0
        n = np.linalg.norm(v)
        prof_vecs[lang] = v / (n or 1.0)

    @F.pandas_udf("string")
    def classify(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            v = np.zeros(1 << 12)
            t = (t or "").lower()
            for i in range(len(t) - 2):
                v[_h(t[i : i + 3])] += 1.0
            n = np.linalg.norm(v)
            if n == 0:
                out.append("und")
                continue
            v /= n
            scores = [(float(v @ prof_vecs[lang]), lang) for lang in langs]
            best_score, best_lang = max(scores)
            out.append(best_lang if best_score > 0 else "und")
        return pd.Series(out)

    return _docs(spark, sf_dir).select(
        "doc_id", classify(F.col("text")).alias("pred_lang")
    )
