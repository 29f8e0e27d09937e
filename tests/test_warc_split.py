"""WARC record parsing edge cases + host-disjoint split properties."""

from pyspark.sql import functions as F

from scrappy_spark.operators.sampling import host_split
from scrappy_spark.sources.warc import parse_warc_records


def _rec(
    body: str,
    wtype: str = "response",
    magic: str = "WARC/1.0",
    clen: int | None = None,
    type_header: str = "WARC-Type",
) -> str:
    clen = len(body) if clen is None else clen
    return (
        f"{magic}\r\n{type_header}: {wtype}\r\n"
        f"WARC-Target-URI: http://h/x\r\n"
        f"Content-Length: {clen}\r\n\r\n{body}\r\n\r\ntrailer"
    )


def test_warc_content_length_frames_payload(spark):
    # the payload CONTAINS a blank line — blank-line splitting would
    # truncate it; Content-Length framing must keep it whole and still
    # exclude the trailer
    body = "first\r\n\r\nsecond"
    df = spark.createDataFrame([(_rec(body),)], "rec string")
    row = parse_warc_records(df).collect()[0]
    assert row["payload"] == body
    assert row["content_length"] == len(body)
    assert row["target_uri"] == "http://h/x"


def test_warc_header_case_insensitive_and_type_lowered(spark):
    df = spark.createDataFrame(
        [(_rec("x", wtype="RESPONSE", type_header="warc-type"),)],
        "rec string",
    )
    row = parse_warc_records(df).collect()[0]
    assert row["record_type"] == "response"


def test_warc_rejects_bad_magic_and_missing_length(spark):
    bad_magic = _rec("x", magic="GARC/9.9")
    no_len = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        "WARC-Target-URI: http://h/x\r\n\r\npayload"
    )
    df = spark.createDataFrame([(bad_magic,), (no_len,)], "rec string")
    assert parse_warc_records(df).count() == 0


def test_warc_short_payload_respects_declared_length(spark):
    # declared length shorter than the body: spec says the record ends
    # there — the parser must not read past it
    df = spark.createDataFrame([(_rec("abcdef", clen=3),)], "rec string")
    assert parse_warc_records(df).collect()[0]["payload"] == "abc"


def test_host_split_is_host_disjoint_and_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    split = host_split(docs)
    # every source maps to exactly one split
    per_host = split.groupBy("source").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_host.where("k > 1").count() == 0
    # both splits exist, and re-running gives the identical assignment
    sides = {r["split"] for r in split.select("split").distinct().collect()}
    assert sides == {"train", "val"}
    again = {
        (r["doc_id"], r["split"]) for r in host_split(docs).collect()
    }
    assert again == {(r["doc_id"], r["split"]) for r in split.collect()}
