"""Spider-trap detection — flag hosts whose URL space explodes.

The reference crawls whatever it finds (its only guards are depth and the
seen set); at web scale a frontier needs TRAP detection: calendar pages,
session-ID parameters, and infinite pagination generate unbounded URL
families that a depth budget alone discovers too late. The standard
signal (used by production crawlers) is URL-template cardinality: map
each URL to a template (digit runs → ``D``, query values → ``V``), then
per host compare how many DISTINCT URLs collapse into one template — a
host where one template covers hundreds of URLs is generating them.

Everything is native expressions: two regexp_replace passes for the
template, then two aggregations (per-(host, template) distinct-URL
counts, per-host rollup) — map-side partial aggs, two shuffles, no UDFs.
Output feeds the frontier as a host-level gate (join-and-filter, same
shape as the robots rules table) or a budget demotion via
``CrawlConfig.host_budgets``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one template covering >= this many distinct URLs on a host marks a trap
TRAP_TEMPLATE_URLS = 15


def url_template_expr(uri) -> Column:
    """URL → template: query values → ``=V`` (before digit folding, so
    value text never leaks into the template), digit runs → ``D``. The
    scheme/authority is dropped — templates describe a host's path+query
    space and the caller groups by host. The authority boundary is
    ``[/?#]`` (not just ``/``): a canonical path-less query URL like
    ``http://h?sid=1`` must template as ``?sid=V``, not swallow the query
    into the host — that is exactly the session-id family this module
    exists to catch.

    The value fold applies to the QUERY part only (review r5): an
    unanchored ``=[^&#]*`` also matches ``=`` inside a path segment
    (matrix params, ``/filter=red/page``) and — since the class crosses
    ``/`` — swallows the rest of the path, collapsing structurally
    distinct URLs into one template and falsely flagging the host. The
    path part gets digit folding only; the fragment (client-side, not a
    URL-space axis) is dropped from the template."""
    tail = F.regexp_extract(uri, r"^[^:]+://[^/?#]*(.*)$", 1)
    tail = F.when(tail == "", "/").otherwise(tail)
    path = F.regexp_extract(tail, r"^([^?#]*)", 1)
    query = F.regexp_extract(tail, r"^[^?#]*(\?[^#]*)", 1)  # '' if none
    return F.concat(
        F.regexp_replace(path, r"[0-9]+", "D"),
        F.regexp_replace(
            F.regexp_replace(query, r"=[^&#]*", "=V"), r"[0-9]+", "D"
        ),
    )


def trap_stats(
    uris: DataFrame, uri_col: str = "uri", threshold: int = TRAP_TEMPLATE_URLS
) -> DataFrame:
    """(…, uri) → per-host (host, n_urls, n_templates, max_template_urls,
    trap). ``max_template_urls`` = the largest DISTINCT-URL count any one
    template covers on that host; ``trap`` = that count ≥ threshold.

    The host key is ``urlnorm.host_col`` — the SAME form as the
    frontier's ``host`` column (port stripped, stops at ``/?#``) — so the
    output joins straight onto the frontier as a gate and its flagged
    hosts are valid ``CrawlConfig.host_budgets`` keys (a budget demotion
    keyed on ``host:port`` would silently never match; the robots
    delay-translation learned the same lesson)."""
    from ..urlnorm import host_col

    host = host_col(F.col(uri_col))
    per_template = (
        uris.select(
            host.alias("host"),
            url_template_expr(F.col(uri_col)).alias("template"),
            F.col(uri_col).alias("uri"),
        )
        .groupBy("host", "template")
        .agg(F.countDistinct("uri").alias("t_urls"))
    )
    return (
        per_template.groupBy("host")
        .agg(
            F.sum("t_urls").cast("long").alias("n_urls"),
            F.count("*").cast("long").alias("n_templates"),
            F.max("t_urls").cast("long").alias("max_template_urls"),
        )
        .withColumn("trap", F.col("max_template_urls") >= threshold)
    )


# ---------------------------------------------------------------------------
# driver-contract query: deterministic synthetic URL families from the
# documents table. doc_ids within a source are congruent mod 20, so
# source % 5 (== doc_id % 5 for every member) picks ONE family per host:
#   s%5 == 0 → calendar pages  /cal/2026-01-<1+d%27> (one template; 27 is
#              COPRIME with the mod-20 id stride, so days really vary
#              within a host — d%28 collapses to 7 distinct, below the
#              threshold: measured before this fix)
#   s%5 == 1 → session ids     /page?sid=<doc_id>   (one template, all urls)
#   else     → small catalog   /article/<d%9>/v     (one template, ≤ 9 urls)
# The first two exceed TRAP_TEMPLATE_URLS, the catalog never does — the
# flag discriminates by construction at every sf.
# ---------------------------------------------------------------------------


def trap_stats_query(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    path = (
        F.when(
            d % 5 == 0,
            F.concat(
                F.lit("/cal/2026-01-"),
                F.lpad((1 + d % 27).cast("string"), 2, "0"),
            ),
        )
        .when(d % 5 == 1, F.concat(F.lit("/page?sid="), d.cast("string")))
        .otherwise(
            F.concat(F.lit("/article/"), (d % 9).cast("string"), F.lit("/v"))
        )
    )
    uris = docs.select(
        F.concat(F.lit("http://"), "source", path).alias("uri")
    )
    return trap_stats(uris)
