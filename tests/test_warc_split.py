"""WARC record parsing edge cases + host-disjoint split properties."""

from pyspark.sql import functions as F

from scrappy_spark.operators.sampling import host_split
from scrappy_spark.sources.cdx import surt_key
from scrappy_spark.sources.warc import digest_dedup, parse_warc_records


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


def test_digest_dedup_revisit_rule(spark):
    # three captures of one payload (distinct dates) + one singleton:
    # first-by-date stays a response, later ones become revisits that
    # point at the FIRST capture's uri; the singleton refers to itself
    caps = spark.createDataFrame(
        [
            ("http://h/b", "2026-01-02", "dgA"),
            ("http://h/a", "2026-01-01", "dgA"),
            ("http://h/c", "2026-01-03", "dgA"),
            ("http://h/z", "2026-01-01", "dgB"),
        ],
        "target_uri string, warc_date string, digest string",
    )
    out = {
        r["target_uri"]: (r["record_type"], r["original_uri"])
        for r in digest_dedup(caps).collect()
    }
    assert out["http://h/a"] == ("response", "http://h/a")
    assert out["http://h/b"] == ("revisit", "http://h/a")
    assert out["http://h/c"] == ("revisit", "http://h/a")
    assert out["http://h/z"] == ("response", "http://h/z")


def test_digest_dedup_tiebreak_is_uri(spark):
    # equal dates: the lexicographically smaller uri is the original
    caps = spark.createDataFrame(
        [
            ("http://h/y", "2026-01-01", "dg"),
            ("http://h/x", "2026-01-01", "dg"),
        ],
        "target_uri string, warc_date string, digest string",
    )
    out = {
        r["target_uri"]: r["record_type"] for r in digest_dedup(caps).collect()
    }
    assert out == {"http://h/x": "response", "http://h/y": "revisit"}


def test_surt_key_transform(spark):
    cases = [
        # host lowercased + reversed, default port stripped, frag dropped
        ("http://A.Example.COM:80/d/1?q=2#x", "com,example,a)/d/1?q=2"),
        ("https://WWW.site.example.com:443/a/7", "com,example,site,www)/a/7"),
        # non-default port rides between host and ')'
        ("http://x.y:8080/p", "y,x:8080)/p"),
        # bare host → '/'
        ("http://news.example.com", "com,example,news)/"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["surt"]
        for r in df.select("url", surt_key(F.col("url")).alias("surt")).collect()
    }
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


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


def test_warc_malformed_content_length_rejects_record(spark):
    """A malformed Content-Length rejects the RECORD, never the job —
    ANSI cast would abort the whole parse on one dirty header
    (review r5)."""
    good = _rec("okbody")
    df = spark.createDataFrame(
        [(good,), (_rec("x", clen=None).replace(
            "Content-Length: 1", "Content-Length: 12abc"),)],
        "rec string",
    )
    out = parse_warc_records(df).collect()
    assert len(out) == 1
    assert out[0]["payload"] == "okbody"


def test_digest_dedup_rewrites_existing_record_type(spark):
    """Feeding parse_warc_records output (which already carries
    record_type) must not create a duplicate column; the revisit rule
    REWRITES the type in place (review r5)."""
    df = spark.createDataFrame(
        [(_rec("same"),), (_rec("same").replace("http://h/x", "http://h/y"),)],
        "rec string",
    )
    parsed = parse_warc_records(df).where(F.col("record_type") == "response")
    out = digest_dedup(parsed.withColumn("digest", F.md5("payload")))
    assert out.columns.count("record_type") == 1
    types = sorted(r["record_type"] for r in out.collect())
    assert types == ["response", "revisit"]


def test_surt_key_scheme_aware_ports_and_query_only_path(spark):
    cases = [
        # :443 on http is NOT default — a distinct origin, port kept
        ("http://h.example.com:443/p", "com,example,h:443)/p"),
        # :80 on https likewise
        ("https://h.example.com:80/p", "com,example,h:80)/p"),
        # each scheme's own default still strips
        ("https://h.example.com:443/p", "com,example,h)/p"),
        # query with no path gets the '/' so it stays in the host range
        ("http://h.example.com?q=1", "com,example,h)/?q=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["surt"]
        for r in df.select("url", surt_key(F.col("url")).alias("surt")).collect()
    }
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)
