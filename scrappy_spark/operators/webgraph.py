"""Web-graph rollups — anchor-text profiles and the host graph.

Two classic link-graph operators a crawl-derived corpus ships with
(the reference emits the link triples — agent.rb:61-91 via
semantics.link_triples — these are the standard aggregations OVER that
output):

* **Anchor-text aggregation** (``anchor_topk``): for every link target,
  the top-k anchor strings by in-link count — the signal search engines
  have indexed since Google's first crawl (Brin & Page 1998 §2.2 treats
  anchor text as a first-class description of the TARGET page). Shape:
  one map-side explode of the link table, a partial-agg shuffle to
  (dst, anchor) counts, then a per-dst window over the collapsed counts.
  The window input is #distinct-anchors per target, not #in-links — the
  partial agg already absorbed the in-link skew (a hot page with 10^9
  in-links but 10^4 distinct anchors sorts 10^4 rows).

* **Host-graph rollup** (``host_graph``): collapse the page-level edge
  list to weighted host→host edges (intra-host edges dropped), the
  aggregation behind the public hostgraph datasets (Common Crawl's
  host-level webgraph releases are exactly this rollup). One partial-agg
  shuffle on (src_host, dst_host); distinct-page counts ride the same
  Exchange via count_distinct partial aggregation.

Driver entries derive links deterministically from the documents table
with the SAME generator as graph.doc_link_edges (LINK_MULT/STRIDE/MAXDEG)
plus a (src, j)-dependent anchor id, so both operators are value-oracled
end-to-end against full SQL mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .graph import doc_link_edges

# synthetic anchor-id space for the driver entry. 3, not larger: the
# edge derivation makes src a FUNCTION of (dst, j), so any per-(src, j)
# anchor is injective per target and every count degenerates to 1; a
# 3-value space pigeonholes the up-to-4 in-links of a target into
# repeating anchors (measured count histogram 1/2/3 = 268/299/128 at
# sf0.001 — the top-k rank is non-vacuous)
ANCHOR_MOD = 3
ANCHOR_TOPK = 3
HOST_MOD = 7  # synthetic host grouping (same choice as prioritized pop)


# ------------------------------------------------------- mirror hosts
#
# Whole-HOST mirror detection — host pairs whose rare content-
# fingerprint sets overlap heavily. The site-level sibling of the DUST
# layer (frontier/dust.py: URL-level aliasing within a host) and the
# classical crawl-hygiene dedup one level above it: a mirrored site
# serves thousands of byte-identical pages under a second hostname, and
# a crawler that detects the pair crawls one and maps the other
# (Bharat & Broder, "Mirror, mirror on the Web", WWW 1999 — public
# paper). The reference has no site-level dedup (its cache is exact-URI,
# `agent.rb` — our S-10); crawl-hygiene mandate territory.
#
# Same discipline as interleaved.media_mirror_from with (doc, ref) →
# (host, fp): distinct observations checkpointed ONCE (feeds the df
# filter AND per-host counts); fingerprints on > max_df hosts dropped
# BEFORE any pair exists (boilerplate pages — 404 bodies, login walls —
# are simultaneously the semantic noise and the skew; one cap handles
# both, bounding per-fp fan-out at max_df²/2); pair generation map-side
# from per-fp sorted host arrays; pair counts and the two size joins are
# small-key shuffles under AQE skew-split. Jaccard over the RARE set
# sizes on both sides, exact integer ppm.

MIRROR_HOST_MAX_DF = 8
MIRROR_HOST_MIN_SHARED = 5
MIRROR_HOST_MIN_PPM = 250_000


def mirror_hosts(
    pages: DataFrame,
    max_df: int = MIRROR_HOST_MAX_DF,
    min_shared: int = MIRROR_HOST_MIN_SHARED,
    min_ppm: int = MIRROR_HOST_MIN_PPM,
) -> DataFrame:
    """Host pairs from ``(host, fingerprint)`` page observations with
    ≥ min_shared shared rare fingerprints and exact-integer Jaccard ≥
    min_ppm ppm; output (host_a, host_b, shared, n_a, n_b,
    jaccard_ppm), host_a < host_b."""
    hf = pages.select("host", "fingerprint").distinct().localCheckpoint()
    dfc = hf.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("_df"))
    rare = (
        hf.join(dfc, "fingerprint")
        .where(F.col("_df") <= max_df)
        .drop("_df")
        .localCheckpoint()  # fan-out: pair generation + per-host counts
    )
    counts = rare.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    hosts_per_fp = rare.groupBy("fingerprint").agg(
        F.array_sort(F.collect_list("host")).alias("hs")
    )
    pairs = hosts_per_fp.select(
        F.explode(
            F.expr(
                "flatten(transform(hs, (a, i) -> "
                "transform(slice(hs, i + 2, size(hs)), "
                "b -> struct(a AS host_a, b AS host_b))))"
            )
        ).alias("p")
    ).select("p.host_a", "p.host_b")
    shared = pairs.groupBy("host_a", "host_b").agg(
        F.count(F.lit(1)).alias("shared")
    )
    ca = counts.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    out = (
        shared.join(ca, "host_a")
        .join(cb, "host_b")
        .withColumn(
            "jaccard_ppm",
            F.expr("1000000 * shared div (n_a + n_b - shared)"),
        )
    )
    return out.where(
        (F.col("shared") >= min_shared) & (F.col("jaccard_ppm") >= min_ppm)
    ).select("host_a", "host_b", "shared", "n_a", "n_b", "jaccard_ppm")


# synthetic mirror structure for the driver entry: every doc lives on
# host w{d%8}; every third doc is ALSO served by that host's mirror
# w{d%8}m (a partial mirror, Jaccard ≈ 1/3); a boilerplate fingerprint
# (-1) appears on every host and must die at the df cap, never in pairs
MIRROR_HOST_MOD = 8


def mirror_hosts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: mirror-host pairs over the synthetic observation
    table; columns (host_a, host_b, shared, n_a, n_b, jaccard_ppm)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    w = F.concat(F.lit("w"), (d % MIRROR_HOST_MOD).cast("string"))
    obs = (
        docs.select(w.alias("host"), d.alias("fingerprint"))
        .unionAll(
            docs.where(d % 3 == 0).select(
                F.concat(w, F.lit("m")).alias("host"),
                d.alias("fingerprint"),
            )
        )
        .unionAll(
            docs.select(
                w.alias("host"), F.lit(-1).cast("bigint").alias("fingerprint")
            )
        )
        .unionAll(
            # the boilerplate fp lives on the mirror hosts too: 16
            # distinct hosts > max_df 8, so the cap drops it whole
            docs.where(d % 3 == 0).select(
                F.concat(w, F.lit("m")).alias("host"),
                F.lit(-1).cast("bigint").alias("fingerprint"),
            )
        )
    )
    return mirror_hosts(obs)


def anchor_topk(links: DataFrame, k: int = ANCHOR_TOPK) -> DataFrame:
    """(src, dst, anchor) → per-target top-k anchors:
    (dst, anchor, n, rk, inlinks). Rank by (count desc, anchor asc) so
    order is total; ``inlinks`` = the target's whole in-link count, a
    window sum over the already-collapsed per-anchor counts (no second
    pass over the raw edges)."""
    per = links.groupBy("dst", "anchor").agg(F.count(F.lit(1)).alias("n"))
    wd = Window.partitionBy("dst")
    w = wd.orderBy(F.col("n").desc(), F.col("anchor").asc())
    return (
        per.withColumn("inlinks", F.sum("n").over(wd))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("dst", "anchor", "n", "rk", "inlinks")
    )


def host_graph(links: DataFrame) -> DataFrame:
    """(src, dst, src_host, dst_host) → weighted host graph:
    (src_host, dst_host, n_links, n_src_pages, n_dst_pages), intra-host
    edges dropped."""
    return (
        links.where(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("src").alias("n_src_pages"),
            F.countDistinct("dst").alias("n_dst_pages"),
        )
    )


def _doc_links_with_anchors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph.doc_link_edges (the SAME generator object, keep_index=True
    — not a copy; review r5) plus anchor id (src + j) mod ANCHOR_MOD."""
    edges = doc_link_edges(spark, sf_dir, keep_index=True)
    return edges.select(
        "src",
        "dst",
        F.concat(
            F.lit("a"), ((F.col("src") + F.col("j")) % ANCHOR_MOD).cast("string")
        ).alias("anchor"),
    )


def anchor_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: top-3 anchors per link target over the synthetic
    doc link graph. Columns (dst, anchor, n, rk, inlinks)."""
    return anchor_topk(_doc_links_with_anchors(spark, sf_dir))


def host_graph_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: weighted host graph over the synthetic doc link
    graph, hosts = 'h' || (doc_id % HOST_MOD) (the prioritized-pop
    grouping — mixes the mod-20 residue classes, so host pairs get real
    weight variance). Columns
    (src_host, dst_host, n_links, n_src_pages, n_dst_pages)."""
    links = _doc_links_with_anchors(spark, sf_dir).select(
        "src",
        "dst",
        F.concat(F.lit("h"), (F.col("src") % HOST_MOD).cast("string")).alias(
            "src_host"
        ),
        F.concat(F.lit("h"), (F.col("dst") % HOST_MOD).cast("string")).alias(
            "dst_host"
        ),
    )
    return host_graph(links)
