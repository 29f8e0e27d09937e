"""PII scrubbing: detect and redact emails / IPv4 addresses / phone
numbers in document text — the C4/RefinedWeb-style cleanup gate every
published web-training-data pipeline runs before release.

Everything is JVM-side regexp (regexp_extract_all / regexp_replace) —
no Python in the hot path. Regex parity notes, because the oracle runs
the same patterns under DuckDB's RE2 while Spark uses java.util.regex:

- only ASCII character classes are spelled out (``[0-9]``, never
  ``\\d``) so Unicode-class defaults can't diverge;
- no alternation and no lazy quantifiers: greedy repeats of disjoint
  character classes match identical spans under RE2's leftmost-longest
  and Java's leftmost-first backtracking;
- replacements are chained in a fixed order (email → ip → phone) on
  both sides, so overlapping candidates resolve identically.

The driver entry augments each document with deterministic synthetic
PII derived from doc_id (the same derived-input pattern as
retrieval.bm25_topk's doc_id%50 queries): the testdata corpus is
PII-free, and a 0-redactions oracle would be vacuous.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IP_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PHONE_RE = "\\+[0-9]{7,15}"

EMAIL_TAG = "<EMAIL>"
IP_TAG = "<IP>"
PHONE_TAG = "<PHONE>"


def scrub_cols(text: Column) -> list[Column]:
    """The four scrub columns over a text column: match counts per PII
    class and the md5 fingerprint of the fully redacted text."""
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, EMAIL_TAG), IP_RE, IP_TAG
        ),
        PHONE_RE,
        PHONE_TAG,
    )
    return [
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(IP_RE), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0)).alias("n_phones"),
        F.md5(redacted).alias("scrub_fp"),
    ]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Generic scrub over any (doc_id, text) DataFrame — map-only, no
    shuffle; at 100 TB this is a pure scan-transform stage that fuses
    into whole-stage codegen with whatever filter follows it."""
    return df.select("doc_id", *scrub_cols(F.col(text_col)))


def _augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.org or 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 3) % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit(" tel +15550"),
        (F.lit(100) + F.col("doc_id") % 100).cast("string"),
    )
    return docs.select("doc_id", synth.alias("text"))


def doc_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: scrub the deterministically PII-augmented corpus.
    Columns (doc_id, n_emails, n_ips, n_phones, scrub_fp)."""
    return pii_scrub(_augmented(spark, sf_dir))
