"""Sitemap layer — sitemap.xml / sitemap-index parsing → frontier seeds.

The reference discovers URLs purely by link-following (`agent.rb:64-91`;
no sitemap handling anywhere in lib/); the north rule's tier-crawl frame
makes sitemap-driven discovery first-class, so this layer implements the
sitemaps.org protocol subset natively: ``<url><loc>``/``<lastmod>``
extraction, one level of ``<sitemapindex>`` indirection (the protocol
forbids index→index nesting), the same-host location constraint, and a
lastmod recency filter feeding either ``Crawler.run`` seeds or an
incremental re-crawl frontier.

All parsing is regexp_extract_all / explode native expressions — per-host
embarrassingly parallel, and the protocol caps a sitemap at 50k URLs /
50 MB, so a single document's block explode never skews a partition. At
web scale the sitemap corpus is ~one or a few documents per authority: a
broadcast-sized side table next to the frontier, same shape as the robots
rules table. The index expansion is one equi-join on the child URL —
hash-partition-friendly, never a theta join.

Supported subset (documented here, mirrored exactly by the DuckDB oracles
in ``__spark_entry__.py``):

  * ``<url>`` blocks: ``<loc>`` required (kept only if an absolute
    http/https URL), ``<lastmod>`` optional — kept VERBATIM as an
    ISO-8601 string; ISO strings compare lexicographically, so recency
    filters need no date parsing (and no timezone semantics sneak in)
  * ``<sitemapindex>``: ``<sitemap><loc>`` children resolved against the
    docs table by exact URL and expanded ONE level
  * location constraint (sitemaps.org "location"): a sitemap may only
    name URLs on its own host — cross-host locs (and cross-host index
    children) are dropped
  * surrounding whitespace inside tag values is tolerated; attributes,
    namespaces, and CDATA are not (conservative subset)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .robots import span_text_expr

SITEMAP_SUFFIX = "/sitemap.xml"
INDEX_SUFFIX = "/sitemap_index.xml"

_URL_BLOCK_RE = r"(?s)<url>(.*?)</url>"
_INDEX_BLOCK_RE = r"(?s)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"<loc>\s*([^<\s]+)\s*</loc>"
_LASTMOD_RE = r"<lastmod>\s*([^<\s]+)\s*</lastmod>"


def _host_expr(uri) -> Column:
    return F.regexp_extract(uri, r"^[^:]+://([^/]*)", 1)


def texts_from_spans(
    docs: DataFrame, suffix: str = SITEMAP_SUFFIX, passthrough: tuple = ()
) -> DataFrame:
    """(doc_id, spans) → (host, text) for the sitemap (or index) documents
    living in the interleaved-spans web, one row per document.
    ``passthrough`` carries extra columns (the streaming path's
    event_time) so the stream shares THIS host/text derivation instead
    of re-spelling the host regex (review r5)."""
    return docs.where(F.col("doc_id").endswith(suffix)).select(
        _host_expr(F.col("doc_id")).alias("host"),
        span_text_expr().alias("text"),
        *[F.col(c) for c in passthrough],
    )


def doc_texts_from_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) → (doc_id, text) for index-child resolution."""
    return docs.select("doc_id", span_text_expr().alias("text"))


def parse_sitemaps(texts: DataFrame, passthrough: tuple = ()) -> DataFrame:
    """(host, text) → (host, loc, lastmod) URL entries.

    Blocks are extracted with one regexp_extract_all + explode; loc must be
    an absolute http/https URL on the SAME host (location constraint);
    lastmod is null when the tag is absent. ``passthrough`` columns of the
    input (e.g. an event_time for the streaming path) are carried onto
    every emitted entry — the parse itself is MAP-ONLY, so it is directly
    usable on an unbounded stream."""
    blocks = texts.select(
        "host",
        *passthrough,
        F.explode(
            F.regexp_extract_all("text", F.lit(_URL_BLOCK_RE), 1)
        ).alias("block"),
    )
    loc = F.regexp_extract("block", _LOC_RE, 1)
    lastmod = F.regexp_extract("block", _LASTMOD_RE, 1)
    return (
        blocks.select(
            "host",
            *passthrough,
            loc.alias("loc"),
            F.when(lastmod == "", None).otherwise(lastmod).alias("lastmod"),
        )
        .where(
            (F.col("loc").startswith("http://") | F.col("loc").startswith("https://"))
            & (_host_expr(F.col("loc")) == F.col("host"))
        )
    )


def expand_index(index_texts: DataFrame, doc_texts: DataFrame) -> DataFrame:
    """One level of sitemapindex indirection: (host, text) index documents
    → (host, text) of their child sitemaps, resolved by exact child URL
    against a (doc_id, text) table. Cross-host children are dropped BEFORE
    the join (location constraint), so the join key set is bounded by the
    index fan-out, not the corpus."""
    children = index_texts.select(
        "host",
        F.explode(
            F.regexp_extract_all("text", F.lit(_INDEX_BLOCK_RE), 1)
        ).alias("block"),
    ).select("host", F.regexp_extract("block", _LOC_RE, 1).alias("child"))
    children = children.where(
        (F.col("child") != "") & (_host_expr(F.col("child")) == F.col("host"))
    )
    return children.join(
        doc_texts, children["child"] == doc_texts["doc_id"]
    ).select("host", "text")


def sitemap_seeds(
    docs: DataFrame, since: str | None = None
) -> DataFrame:
    """Full discovery pipeline over a spans web: direct sitemaps plus one
    level of index expansion → distinct (uri, lastmod) seed rows.

    ``since`` (ISO-8601 string) keeps only entries with lastmod >= since —
    entries WITHOUT a lastmod are dropped under a recency filter (unknown
    recency is not recent), the incremental re-crawl contract."""
    direct = parse_sitemaps(texts_from_spans(docs, SITEMAP_SUFFIX))
    via_index = parse_sitemaps(
        expand_index(
            texts_from_spans(docs, INDEX_SUFFIX), doc_texts_from_spans(docs)
        )
    )
    out = direct.unionByName(via_index).select(
        F.col("loc").alias("uri"), "lastmod"
    )
    if since is not None:
        out = out.where(F.col("lastmod") >= since)
    return out.distinct()


# ---------------------------------------------------------------------------
# driver-contract queries: a synthetic sitemap corpus derived
# DETERMINISTICALLY from the documents table (doc_id, source) — host =
# source, one <url> block per document, plus per-source index documents.
# Construction and parse are both mirrored in DuckDB (__spark_entry__.py).
# Non-vacuity by construction: doc_id % 11 == 0 rows inject a CROSS-HOST
# loc (dropped by the location constraint) and doc_id % 5 == 0 rows omit
# <lastmod> (dropped by a recency filter).
# ---------------------------------------------------------------------------


def _synth_blocks(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    loc_host = F.when(d % 11 == 0, F.lit("evil.example.com")).otherwise(
        F.col("source")
    )
    loc = F.concat(
        F.lit("http://"),
        loc_host,
        F.lit("/p"),
        (d % 7).cast("string"),
        F.lit("/x"),
        d.cast("string"),
    )
    lastmod = F.concat(
        F.lit("2026-01-"), F.lpad((1 + d % 28).cast("string"), 2, "0")
    )
    block = F.concat(
        F.lit("<url>\n  <loc> "),
        loc,
        F.lit(" </loc>\n"),
        F.when(d % 5 == 0, F.lit("")).otherwise(
            F.concat(F.lit("  <lastmod>"), lastmod, F.lit("</lastmod>\n"))
        ),
        F.lit("</url>"),
    )
    return docs.select(
        F.col("source").alias("host"), "doc_id", block.alias("block")
    )


def synth_sitemap_texts(spark, sf_dir: str) -> DataFrame:
    """(host, text): one sitemap document per source."""
    blocks = _synth_blocks(spark, sf_dir)
    ordered = F.array_sort(F.collect_list(F.struct("doc_id", "block")))
    body = F.concat_ws("\n", F.transform(ordered, lambda x: x["block"]))
    return blocks.groupBy("host").agg(
        F.concat(
            F.lit("<urlset>\n"), body, F.lit("\n</urlset>")
        ).alias("text")
    )


def parse_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: parse the synthetic corpus → (host, loc, lastmod)."""
    return parse_sitemaps(synth_sitemap_texts(spark, sf_dir))


def recent_seeds_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: recency-filtered distinct seeds (uri, lastmod) with
    since = 2026-01-15 — exercises the lastmod gate incl. null drops."""
    parsed = parse_sitemaps(synth_sitemap_texts(spark, sf_dir))
    return (
        parsed.select(F.col("loc").alias("uri"), "lastmod")
        .where(F.col("lastmod") >= "2026-01-15")
        .distinct()
    )


def index_expand_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: per-source <sitemapindex> documents (one legitimate
    same-host child + one cross-host child that the location constraint
    must drop) resolved against a (doc_id, text) child table, then parsed
    — proves the one-level indirection join end-to-end."""
    texts = synth_sitemap_texts(spark, sf_dir)
    child_docs = texts.select(
        F.concat(F.lit("http://"), "host", F.lit(SITEMAP_SUFFIX)).alias(
            "doc_id"
        ),
        "text",
    )
    index_texts = texts.select(
        "host",
        F.concat(
            F.lit("<sitemapindex>\n<sitemap><loc>http://"),
            F.col("host"),
            F.lit(SITEMAP_SUFFIX),
            F.lit("</loc></sitemap>\n"),
            F.lit(
                "<sitemap><loc>http://evil.example.com/sitemap.xml"
                "</loc></sitemap>\n</sitemapindex>"
            ),
        ).alias("text"),
    )
    return parse_sitemaps(expand_index(index_texts, child_docs))
