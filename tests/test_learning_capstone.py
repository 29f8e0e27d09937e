"""Capstone: train → compose → crawl. A KB induced from annotated
samples (A-9) composes with the link KB and drives the DISTRIBUTED
crawler via FragmentExtractor, reproducing the pure-Python oracle's
crawl order, seen set, and triple set exactly — trained artifacts are
first-class extractors, not a side path."""

from scrappy_spark import learning
from scrappy_spark.corpus import CorpusConfig, generate_df, generate_local, seeds_for
from scrappy_spark.extractor.extract import FragmentExtractor
from scrappy_spark.extractor.formats import clean
from scrappy_spark.extractor.interp import kb_extract_fn
from scrappy_spark.extractor.kb import link_kb
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.oracle import oracle_crawl

CFG = CorpusConfig(n_docs=150)


def test_trained_kb_crawl_matches_oracle(spark, tmp_path):
    docs = generate_local(CFG)

    # annotate three documents that have headings: title = first heading
    samples = []
    for uri, spans in sorted(docs.items()):
        headings = [s for s in spans if s["kind"] == "heading"]
        if headings:
            samples.append((uri, spans, [("ex:title", clean(headings[0]["text"]))]))
        if len(samples) == 3:
            break
    assert len(samples) == 3

    trained = learning.train_kb(samples)
    assert trained and trained[0].subfragments  # ex:title was induced
    kb = link_kb() + trained  # follow links AND extract trained literals

    seeds = seeds_for(CFG, 2)
    golden = oracle_crawl(docs, seeds, depth=2, extract=kb_extract_fn(kb))

    df = generate_df(spark, CFG, partitions=2)
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=2),
        extractor=FragmentExtractor(kb),
    )
    crawler.run(seeds)

    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    seen = {(r["uri"], r["depth"]) for r in crawler.seen_df().collect()}
    triples = {
        (r["s"], r["p"], r["o"], r["is_literal"])
        for r in crawler.clean_triples_df().collect()
    }
    assert order == golden.order
    assert seen == golden.seen
    assert triples == golden.triples
    # the trained predicate actually fired during the crawl
    assert any(p == "ex:title" for _, p, _, _ in triples)
