"""Integration: the interleaved analytics cores (`operators/interleaved
*_from`) over the REAL crawl corpus span sequences (`corpus.py`),
restricted to pages an actual `Crawler.run` fetched — the two halves of
the graft (crawl engine + interleaved analytics) on the same payload.

The crawl corpus differs from the oracle-derived table in exactly the
ways the `_from` cores must be general over: kind='media' (not
image/video), LINK spans carrying hrefs in media_ref, string doc_ids
(URLs), and per-document-unique media refs."""

import os
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrappy_spark.corpus import CorpusConfig, generate_df, seeds_for  # noqa: E402
from scrappy_spark.frontier import Crawler, CrawlConfig  # noqa: E402
from scrappy_spark.operators import interleaved as il  # noqa: E402
from scrappy_spark.urlnorm import host_col  # noqa: E402

CFG = CorpusConfig(n_docs=300)


def _crawled_spans(spark):
    """Crawl the corpus web, then flatten the FETCHED pages' spans."""
    web = generate_df(spark, CFG, partitions=4).persist()
    store = tempfile.mkdtemp(prefix="il_crawl_")
    crawler = Crawler(
        spark, web, store, CrawlConfig(depth=2, per_host_budget=4, max_rounds=4)
    )
    crawler.run(seeds_for(CFG, 2))
    fetched = crawler.order_df().select(F.col("uri").alias("doc_id")).distinct()
    spans = (
        web.join(fetched, "doc_id")
        .select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")
    )
    return web, spans.persist()


def test_interleaved_cores_on_crawled_pages(spark):
    web, spans = _crawled_spans(spark)
    try:
        n_media = spans.where(F.col("kind") == "media").count()

        # --- media_stats_from keyed by page host ---------------------
        stats = il.media_stats_from(
            spans.withColumn("source", host_col(F.col("doc_id")))
        ).cache()
        agg = stats.agg(
            F.sum("n_media").alias("m"), F.sum("n_spans").alias("s")
        ).first()
        assert agg["m"] == n_media
        # link hrefs must NOT have been counted as refs: every media ref
        # lives on cdn.example.com, so distinct_refs ≤ media span count
        assert stats.where(F.col("distinct_refs") > F.col("n_media")).count() == 0
        stats.unpersist()

        # --- caption_pairs_from: one pair per media span, neighbors
        # are the literal offset±1 span texts ------------------------
        pairs = il.caption_pairs_from(spans).cache()
        assert pairs.count() == n_media
        neigh = spans.select(
            "doc_id",
            F.col("offset").alias("o"),
            F.col("text").alias("t"),
        )
        p = pairs.select(
            "doc_id", (F.col("offset") - 1).alias("o"), "before_text"
        )
        before = p.join(neigh, ["doc_id", "o"], "left").where(
            F.coalesce(F.col("t"), F.lit("")) != F.col("before_text")
        )
        assert before.count() == 0
        pairs.unpersist()

        # --- fetch_once_from: corpus media refs are per-document-unique
        # by construction (img{i}_{j}), so the shared-ref report is
        # exactly empty — a meaningful corpus invariant, not a vacuity:
        # the same core returns 211 shared refs on the derived table ---
        shared = il.fetch_once_from(spans, F.length("media_ref") * 10)
        assert shared.count() == 0

        # --- media_pop_from: all refs on one CDN host; string seq ----
        seq = F.min(
            F.concat_ws(
                "#",
                F.col("doc_id"),
                F.lpad(F.col("offset").cast("string"), 6, "0"),
            )
        ).alias("seq")
        popped = il.media_pop_from(spans, seq, per_host_budget=5).cache()
        assert popped.where(F.col("host") != "cdn.example.com").count() == 0
        assert 0 < popped.count() <= 5
        popped.unpersist()

        # --- pack_multimodal_from: kind='media' costs IMG_TOKENS; every
        # fetched doc appears exactly once and cost ≥ its text tokens --
        layout = il.pack_multimodal_from(spans).cache()
        assert layout.count() == spans.select("doc_id").distinct().count()
        text_tok = spans.where(F.col("kind") != "media").groupBy(
            "doc_id"
        ).agg(F.sum(F.size(F.split("text", " "))).alias("tt"))
        # exact per-doc check: cost == text tokens + 64 * media spans
        media_n = spans.where(F.col("kind") == "media").groupBy(
            "doc_id"
        ).agg(F.count("*").alias("nm"))
        exact = (
            layout.join(text_tok, "doc_id")
            .join(media_n, "doc_id", "left")
            .withColumn("nm", F.coalesce("nm", F.lit(0)))
            .where(
                F.col("cost")
                != F.col("tt") + F.lit(il.IMG_TOKENS) * F.col("nm")
            )
        )
        assert exact.count() == 0
        layout.unpersist()
    finally:
        spans.unpersist()
        web.unpersist()
