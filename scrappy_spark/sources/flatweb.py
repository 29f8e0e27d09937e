"""Adapter: driver's flat documents table → interleaved-spans web.

The driver testdata's `documents.parquet` is flat (doc_id, text, lang,
source, n_chars); the engine's input shape (BASELINE.json input_hint) is
(doc_id:string, spans:array<struct<...>>). This adapter derives a
deterministic crawlable web from the flat table with NATIVE expressions
only: each doc gets a URL, a heading span, its text span, and link spans
to hash-derived neighbour docs — so `entry()` can run the real crawl
engine over driver-provided data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HOSTS = 23
OUT_DEGREE = 4


def url_expr(doc_id):
    return F.concat(
        F.lit("http://d"),
        F.lpad((doc_id % N_HOSTS).cast("string"), 2, "0"),
        F.lit(".example.org/doc"),
        doc_id.cast("string"),
    )


def spans_web(flat_docs: DataFrame) -> DataFrame:
    """(doc_id:string, spans:...) — links target (doc_id*k+j) % n_docs."""
    n_docs = flat_docs.count()
    d = F.col("doc_id")
    span_structs = [
        F.struct(
            F.lit("heading").alias("kind"),
            F.col("lang").alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            F.col("text").alias("text"),
            F.lit("").alias("media_ref"),
            F.lit(1).alias("offset"),
        ),
    ]
    for j in range(OUT_DEGREE):
        target = (d * 7 + j * 13 + 1) % n_docs
        span_structs.append(
            F.struct(
                F.lit("link").alias("kind"),
                F.concat(F.lit("to "), target.cast("string")).alias("text"),
                url_expr(target).alias("media_ref"),
                F.lit(2 + j).alias("offset"),
            )
        )
    return flat_docs.select(
        url_expr(d).alias("doc_id"), F.array(*span_structs).alias("spans")
    )
