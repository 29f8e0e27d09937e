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


def test_sixth_wave_cores_on_crawled_pages(spark):
    """The sixth-wave cores over REAL crawled span sequences: weights,
    mirrors, galleries, and context windows must be general over
    kind='media', URL doc_ids, link spans, and per-document-unique refs."""
    web, spans = _crawled_spans(spark)
    try:
        n_docs = spans.select("doc_id").distinct().count()

        # --- template_downweight_from: one weight per fetched doc,
        # exact integer ppm consistent with the group size -----------
        w = il.template_downweight_from(spans).cache()
        assert w.count() == n_docs
        bad = w.where(
            F.col("weight_ppm") != F.expr("1000000 div n_docs")
        )
        assert bad.count() == 0
        assert w.where(
            (F.col("weight_ppm") <= 0) | (F.col("weight_ppm") > 1_000_000)
        ).count() == 0
        w.unpersist()

        # --- media_mirror_from / media_mirror_delta_from: corpus media
        # refs are per-document-unique (img{i}_{j}) so NO pair shares a
        # ref — both mirror reports are exactly empty, the same corpus
        # invariant fetch_once asserts (the derived table returns 800+
        # pairs through the same cores) ------------------------------
        assert il.media_mirror_from(spans).count() == 0
        assert il.media_mirror_delta_from(
            spans.withColumn(
                "doc_id", F.abs(F.hash("doc_id")).cast("long")
            )
        ).count() == 0  # delta split needs numeric ids; still ref-unique

        # --- media_gallery_from: per-doc-unique refs mean every
        # unordered ref pair co-occurs in exactly ONE doc — below
        # COOCCUR_MIN_DOCS — so the gallery map is all singletons ------
        gal = il.media_gallery_from(spans).cache()
        n_refs = (
            spans.where(
                F.col("kind").isin(*il.MEDIA_KINDS)
                & F.col("media_ref").isNotNull()
            )
            .select("media_ref")
            .distinct()
            .count()
        )
        assert gal.count() == n_refs
        assert gal.where(F.col("gallery_id") != F.col("media_ref")).count() == 0
        gal.unpersist()

        # --- context_windows_from: per-doc window costs sum to the
        # pack_multimodal cost (cross-kernel arithmetic consistency),
        # window ids are contiguous from 0, span counts conserve ------
        ctx = il.context_windows_from(spans).cache()
        per_doc = ctx.groupBy("doc_id").agg(
            F.sum("cost").alias("wcost"),
            F.sum("n_spans").alias("wspans"),
            F.max("window_id").alias("mw"),
            F.count("*").alias("nw"),
        )
        pack = il.pack_multimodal_from(spans).select("doc_id", "cost")
        span_n = spans.groupBy("doc_id").agg(F.count("*").alias("sn"))
        joined = per_doc.join(pack, "doc_id").join(span_n, "doc_id")
        assert joined.where(F.col("wcost") != F.col("cost")).count() == 0
        assert joined.where(F.col("wspans") != F.col("sn")).count() == 0
        assert joined.where(F.col("mw") != F.col("nw") - 1).count() == 0
        ctx.unpersist()
    finally:
        spans.unpersist()
        web.unpersist()
