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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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
    record separator, or garbage) never leak in.

    ``try_cast``, not ``cast`` (review r5): this session runs ANSI mode
    and a plain cast makes ONE malformed Content-Length ('12abc', or a
    value past int range — unframeable anyway, a JVM string is < 2 GiB)
    abort the whole parse job; the module exists to ingest dirty
    archives, so a bad header is an expected input that must reject the
    RECORD, which is exactly what the content_length-NULL filter below
    does."""
    rec = F.col(rec_col)
    header = _header(rec)
    clen = _field(header, "Content-Length").try_cast("int")
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


def digest_dedup(
    responses: DataFrame,
    uri: str = "target_uri",
    date: str = "warc_date",
    digest: str = "digest",
) -> DataFrame:
    """Payload-digest deduplication — the WARC *revisit* record rule
    (ISO 28500 §6.7.2; Heritrix and Common Crawl both apply it): within
    an archiving window, only the FIRST capture of each payload digest
    is stored as a full ``response``; every later identical capture
    becomes a ``revisit`` record that refers back to the original.

    Input: one row per capture with a payload digest column. Output:
    the same rows plus ``record_type`` (response | revisit) and
    ``original_uri`` — the first capture's URI (itself on originals,
    the revisit target otherwise; never NULL, so it joins directly).
    First = min (date, uri) within the digest group; captures sharing
    BOTH date and uri are the caller's dedup bug, not an ordering this
    kernel invents.

    Plan: ONE hash Exchange on the digest plus an in-partition sort —
    the same shape as sessionize. At 100 TB the digest space is the
    payload space, so groups are tiny (mean ≈ the corpus duplication
    factor) and nothing skews; storage saved is the whole point of the
    rule (CC stores ~25% revisits)."""
    w = Window.partitionBy(digest).orderBy(F.col(date).asc(), F.col(uri).asc())
    rn = F.row_number().over(w)
    first_uri = F.first(uri).over(w)  # default frame: unbounded→current
    # withColumn, not select('*', ...): the natural caller feeds
    # parse_warc_records output, which ALREADY has a record_type column
    # — select('*', alias) would emit two record_type columns and break
    # every downstream reference (review r5). Replacing it is the ISO
    # semantic: the revisit rule REWRITES the record type of later
    # identical captures.
    return responses.withColumn(
        "record_type",
        F.when(rn == 1, F.lit("response")).otherwise(F.lit("revisit")),
    ).withColumn("original_uri", first_uri)


def warc_revisit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry for digest_dedup: captures derived from documents
    with POOLED payloads — capture d's payload is the 40-char text
    prefix of doc ``d - d%5`` (a self-join), so up-to-5 consecutive
    captures share one digest and revisit groups actually occur
    (singleton tails where the pool anchor id is absent drop out of the
    inner join identically in both engines). Columns
    (target_uri, warc_date, digest, record_type, original_uri)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") - F.col("doc_id") % 5).alias("pool_id"),
    )
    pool = docs.select(
        F.col("doc_id").alias("pool_id"),
        F.substring("text", 1, 40).alias("payload"),
    )
    caps = d.join(pool, "pool_id").select(
        F.concat(
            F.lit("http://"),
            F.col("source"),
            F.lit("/d/"),
            F.col("doc_id").cast("string"),
        ).alias("target_uri"),
        F.concat(
            F.lit("2026-01-"),
            F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"),
            F.lit("T00:00:00Z"),
        ).alias("warc_date"),
        F.md5("payload").alias("digest"),
    )
    return digest_dedup(caps)


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
