"""WARC (ISO 28500) record parsing — the Common Crawl ingestion shape.

The reference fetches live HTML (agent.rb); a 100 TB training-data crawl
consumes WARC archives. This module parses a TABLE OF RECORDS — one WARC
record string per row — entirely with native expressions (no UDF): the
header block ends at the first CRLF CRLF, named headers come out with
case-insensitive anchored regexes, and the payload is `substr` bounded
by Content-Length, which is WARC's actual framing rule (a payload may
itself contain blank lines, so "split on blank line" is wrong by spec —
the trailing-garbage test pins this).

Record SPLITTING is the reader's concern, deliberately out of this
module: .warc.gz members are not splittable by Spark, so at scale the
archive is either stored as one gzip member per record (how Common Crawl
indexes point into WARCs), pre-exploded to a record table by a map-only
pass, or read via a custom datasource. Once records are rows, everything
here is map-only whole-stage codegen — the plan is a scan + project, no
shuffle at all until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF2 = "\r\n\r\n"


def _header(rec: Column) -> Column:
    pos = F.locate(_CRLF2, rec)
    return F.when(pos > 0, F.substring(rec, F.lit(1), pos - 1)).otherwise(
        F.lit(None).cast("string")
    )


def _field(header: Column, name: str) -> Column:
    # (?im): case-insensitive, per-line anchors — WARC header names are
    # case-insensitive by spec (ISO 28500 §4)
    c = F.regexp_extract(header, rf"(?im)^{name}: *([^\r\n]*)", 1)
    return F.when(c == "", F.lit(None).cast("string")).otherwise(c)


def parse_warc_records(df: DataFrame, rec_col: str = "rec") -> DataFrame:
    """(…, rec) → one parsed row per VALID record:
    (record_type, target_uri, warc_date, content_length, payload).

    Valid = starts with the WARC/1.0 magic, has a header terminator and
    a parseable Content-Length. The payload is truncated to EXACTLY
    Content-Length characters — trailing bytes after the payload (the
    record separator, or garbage) never leak in."""
    rec = F.col(rec_col)
    header = _header(rec)
    clen = _field(header, "Content-Length").cast("int")
    pos = F.locate(_CRLF2, rec)
    out = df.select(
        F.lower(_field(header, "WARC-Type")).alias("record_type"),
        _field(header, "WARC-Target-URI").alias("target_uri"),
        _field(header, "WARC-Date").alias("warc_date"),
        clen.alias("content_length"),
        F.when(
            clen.isNotNull(), F.substring(rec, pos + 4, clen)
        ).alias("payload"),
        rec.startswith("WARC/1.0\r\n").alias("_magic"),
    )
    return out.where(
        F.col("_magic")
        & F.col("record_type").isNotNull()
        & F.col("content_length").isNotNull()
    ).drop("_magic")


def synth_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WARC record corpus from the documents table: type
    cycles response/request/metadata/resource with doc_id%4, the payload
    is a doc_id-dependent prefix of the text, every record carries
    TRAILING GARBAGE after its payload (so Content-Length truncation is
    load-bearing), lower-cased header names every third record (spec
    case-insensitivity), and doc_id%17==0 records drop the WARC/1.0
    magic (must be rejected)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    ds = d.cast("string")
    wtype = (
        F.when(d % 4 == 0, "response")
        .when(d % 4 == 1, "request")
        .when(d % 4 == 2, "metadata")
        .otherwise("resource")
    )
    payload = F.substring(F.col("text"), 1, 50)
    magic = F.when(d % 17 == 0, F.lit("GARC/9.9\r\n")).otherwise(
        F.lit("WARC/1.0\r\n")
    )
    tname = F.when(d % 3 == 0, F.lit("warc-type")).otherwise(F.lit("WARC-Type"))
    rec = F.concat(
        magic,
        tname,
        F.lit(": "),
        wtype,
        F.lit("\r\nWARC-Target-URI: http://"),
        F.col("source"),
        F.lit("/d/"),
        ds,
        F.lit("\r\nWARC-Date: 2026-01-"),
        F.lpad((d % 28 + 1).cast("string"), 2, "0"),
        F.lit("T00:00:00Z\r\nContent-Length: "),
        F.length(payload).cast("string"),
        F.lit(_CRLF2),
        payload,
        F.lit("\r\n\r\ntrailing-garbage-"),
        ds,
    )
    return docs.select(d.alias("doc_id"), rec.alias("rec"))


def warc_responses_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: synthesize records, parse, keep response records —
    (target_uri, warc_date, content_length, payload_fp). The payload
    travels as md5 so the compared values stay small while still pinning
    every payload character (incl. the truncation boundary)."""
    parsed = parse_warc_records(synth_warc_records(spark, sf_dir))
    return parsed.where(F.col("record_type") == "response").select(
        "target_uri",
        "warc_date",
        "content_length",
        F.md5("payload").alias("payload_fp"),
    )
