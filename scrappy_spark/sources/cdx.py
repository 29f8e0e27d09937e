"""CDX-style URL index keys — the SURT transform over a capture table.

Web archives index captures by SURT (Sort-friendly URI Reordering
Transform): the host's labels reversed and comma-joined, then ')' and
the path+query — so one domain's subtree is one contiguous key range.
Common Crawl's public URL index (the cdx-*.gz files its per-crawl
indexes ship as) is exactly a sorted table of these keys; range-scanning
``com,example)/`` lists every capture under example.com, which is why
the transform exists.

Subset implemented (documented, deliberately): scheme dropped, host
lower-cased, the scheme's OWN default port stripped (:80 for http, :443
for https — never cross-scheme), fragment dropped, path+query preserved
byte-for-byte, empty or query-only path → '/'-prefixed. Full SURT also
strips userinfo and 'www.' under some canonicalization profiles; those are
canonicalization policy (frontier/urlnorm.py territory), not the index
transform, and are left to the caller's canonicalizer.

Everything is native expressions — regexp_extract / split / reverse /
array_join — so the plan is a map-only project with no shuffle; the
index build's only Exchange is the final range sort, which at 100 TB is
the write-side repartitionByRange the sorted CDX shards come from.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEME = r"^[A-Za-z][A-Za-z0-9+.-]*://"


def surt_key(url: Column) -> Column:
    """SURT key of an absolute http(s)-style URL (subset above).
    'http://A.Example.COM:80/d/1?q=2#x' → 'com,example,a)/d/1?q=2';
    a non-default port rides between host and ')' —
    'http://x.y:8080/p' → 'y,x:8080)/p'.

    Port stripping is PER-SCHEME (review r5): :80 is default only for
    http and :443 only for https — 'http://h:443/p' is a distinct
    origin and keeps its port (a scheme-blind strip collapsed it onto
    'http://h/p', conflating two origins in one key range). A URL with
    a query but no path ('http://h?q=1') gets the '/' the empty-path
    rule promises ('com,h)/?q=1'), keeping every key inside the
    domain's contiguous 'host)/' range — '?' sorts outside it."""
    hostport = F.lower(F.regexp_extract(url, _SCHEME + r"([^/?#]+)", 1))
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_extract(hostport, r"^([^:]*)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    pathq = F.regexp_extract(url, _SCHEME + r"[^/?#]*([^#]*)", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(
        rev,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.lit(")"),
        F.when(pathq.startswith("/"), pathq).otherwise(
            F.concat(F.lit("/"), pathq)  # '' → '/', '?q=1' → '/?q=1'
        ),
    )


def cdx_index(captures: DataFrame, url: str = "url") -> DataFrame:
    """Capture table → the same rows keyed by ``surt`` (map-only)."""
    return captures.select(surt_key(F.col(url)).alias("surt"), "*")


def cdx_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: SURT keys over a four-variant synthetic capture
    set from documents — mixed-case hosts (lowercased), a :443 default
    port (stripped), a :8080 non-default port (preserved), a query
    string (preserved), a fragment (dropped), and a bare-host URL
    (path → '/'). Columns (url, surt)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    ds = d.cast("string")
    url = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("http://"), F.col("source"), F.lit(".Example.COM/d/"), ds
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit("https://WWW."),
                F.col("source"),
                F.lit(".example.com:443/a/"),
                ds,
                F.lit("?q="),
                (d % 7).cast("string"),
            ),
        )
        .when(
            d % 4 == 2,
            F.concat(
                F.lit("http://"),
                F.col("source"),
                F.lit(".example.com:8080/idx#frag"),
            ),
        )
        .otherwise(
            F.concat(F.lit("http://"), F.col("source"), F.lit(".example.com"))
        )
    )
    caps = docs.select(url.alias("url")).distinct()
    return cdx_index(caps)
