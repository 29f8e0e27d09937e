"""Integration capstone: the engine's two halves compose. A real crawl
produces the corpus; the training-data pipeline operators consume it —
distributed plain-text rendering, boilerplate cleaning, repetition
signals, BM25 retrieval, and packed-layout conservation, all over
documents the crawler actually fetched."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from scrappy_spark.corpus import CorpusConfig, generate_df, seeds_for
from scrappy_spark.extractor.formats import render_plain
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.operators import boilerplate, packing, repetition, retrieval
from scrappy_spark.operators.text import tokens_col


def test_crawled_corpus_feeds_training_pipeline(spark, tmp_path):
    cfg = CorpusConfig(n_docs=120)
    web = generate_df(spark, cfg, partitions=2).persist()
    crawler = Crawler(
        spark, web, str(tmp_path / "store"), CrawlConfig(depth=2)
    )
    crawler.run(seeds_for(cfg, 2))
    fetched = crawler.order_df().select(
        F.col("uri").alias("doc_id")
    ).distinct()

    # corpus = fetched pages rendered to plain text, fully distributed:
    # the native expression mirrors extractor.formats.render_plain
    # (non-media spans' visible text, document order, ws-normalized)
    corpus = (
        web.join(fetched, "doc_id", "left_semi")
        .select(
            "doc_id",
            F.trim(
                F.regexp_replace(
                    F.array_join(
                        F.transform(
                            F.filter(
                                "spans",
                                lambda s: (s["kind"] != "media")
                                & (s["text"] != ""),
                            ),
                            lambda s: s["text"],
                        ),
                        " ",
                    ),
                    r"\s+",
                    " ",
                )
            ).alias("text"),
        )
    )
    # popped ⊇ resolved: the frontier legitimately pops dangling links
    # (404s in the synthetic web); the corpus is the pages that resolved
    n_fetched = corpus.count()
    assert 20 < n_fetched <= fetched.count()

    # the native rendering equals the python renderer on every page
    sample = web.join(fetched, "doc_id", "left_semi").collect()
    py = {
        r["doc_id"]: render_plain([s.asDict() for s in r["spans"]])
        for r in sample
    }
    for r in corpus.collect():
        assert r["text"] == py[r["doc_id"]], r["doc_id"]

    # dense numeric ids (the pipeline operators key on numeric doc_id)
    dense = corpus.withColumn(
        "doc_id_num",
        F.row_number().over(Window.orderBy("doc_id")) - 1,
    ).select(F.col("doc_id_num").alias("doc_id"), "text")

    # boilerplate-clean, then repetition signals on the cleaned corpus
    cleaned = boilerplate.boilerplate_clean_from(dense).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    assert cleaned.count() == n_fetched
    rep = repetition.repetition_stats_from(cleaned).collect()
    assert len(rep) > 0
    for r in rep:
        assert 0.0 <= r["top_2gram_frac"] <= 1.0
        assert 0.0 <= r["dup_3gram_frac"] <= 1.0

    # BM25 over the CLEANED corpus (the chain continues on the rewrite):
    # ranks contiguous, scores non-increasing, and every query doc
    # appears among its own candidates (it contains all its query terms)
    hits = {}
    for r in retrieval.bm25_topk_from(cleaned).collect():
        hits.setdefault(r["q"], []).append((r["rk"], r["doc_id"], r["bm25"]))
    assert hits
    from scrappy_spark.operators.text import tokens_py

    texts = {r["doc_id"]: r["text"] for r in cleaned.collect()}
    for q, rows in hits.items():
        rows.sort()
        assert [rk for rk, _, _ in rows] == list(range(1, len(rows) + 1))
        scores = [s for _, _, s in rows]
        assert scores == sorted(scores, reverse=True)
        # every candidate really shares a query term with q's raw text
        qterms = set(tokens_py(texts[q])[: retrieval.QUERY_TERMS])
        for _, d, _ in rows:
            assert qterms & set(tokens_py(texts[d])), (q, d)

    # packed layout of the cleaned corpus conserves its tokens exactly
    layout = packing.pack_sequences_from(cleaned)
    total_layout = layout.agg(F.sum("n_tokens")).first()[0]
    total_corpus = cleaned.select(
        F.sum(F.size(tokens_col(F.col("text"))))
    ).first()[0]
    assert total_layout == total_corpus
    web.unpersist()
