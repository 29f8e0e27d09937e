"""M1 golden tests: engine crawl order / seen set / triples must match the
pure-Python oracle EXACTLY (north rule: crawl-order + URL-seen-set exact
match under same seed list + politeness budget)."""

import pytest

from scrappy_spark import semantics
from scrappy_spark.corpus import CorpusConfig, generate_df, generate_local, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.oracle import oracle_crawl

CFG = CorpusConfig(n_docs=400)


@pytest.fixture(scope="module")
def docs_local():
    return generate_local(CFG)


@pytest.fixture(scope="module")
def docs_df(spark):
    df = generate_df(spark, CFG, partitions=4).persist()
    df.count()
    return df


def _run_engine(spark, docs_df, tmp_path, seeds, **cfg_kw):
    crawler = Crawler(
        spark, docs_df, str(tmp_path / "store"), CrawlConfig(**cfg_kw)
    )
    crawler.run(seeds)
    # pop order = (round, seq): within a round pops proceed in seq order;
    # budget-deferred items pop in a later round despite a smaller seq
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    seen = {(r["uri"], r["depth"]) for r in crawler.seen_df().collect()}
    triples = {
        (r["s"], r["p"], r["o"], r["is_literal"])
        for r in crawler.clean_triples_df().collect()
    }
    return order, seen, triples, crawler


def test_distributed_corpus_matches_local(spark, docs_local, docs_df):
    """Per-row span-sequence equality (kind, text, media_ref, order) —
    the input_hint invariant, engine web vs oracle web."""
    rows = docs_df.collect()
    assert len(rows) == len(docs_local)
    for r in rows:
        spans = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        golden = [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in docs_local[r["doc_id"]]
        ]
        assert spans == golden, r["doc_id"]


@pytest.mark.parametrize("depth,bloom_min", [(2, 0), (3, 50_000)])
def test_fifo_exact_match(spark, docs_local, docs_df, tmp_path, depth, bloom_min):
    """bloom_min=0 forces the bloom-prefilter path (exactness must be
    unaffected — bloom only short-circuits definite misses)."""
    seeds = seeds_for(CFG, 2)
    golden = oracle_crawl(docs_local, seeds, depth=depth)
    order, seen, triples, _ = _run_engine(
        spark, docs_df, tmp_path, seeds, depth=depth, use_bloom=True,
        bloom_min_seen=bloom_min,
    )
    assert order == golden.order
    assert seen == golden.seen
    assert triples == golden.triples


def test_budgeted_politeness_exact_match(spark, tmp_path):
    small = CorpusConfig(n_docs=120)
    docs_small = generate_local(small)
    df = generate_df(spark, small, partitions=2)
    seeds = seeds_for(small, 2)
    golden = oracle_crawl(docs_small, seeds, depth=2, per_host_budget=2)
    order, seen, triples, crawler = _run_engine(
        spark,
        df,
        tmp_path,
        seeds,
        depth=2,
        per_host_budget=2,
        repartition_by_host=True,
        host_salt_k=4,
    )
    assert order == golden.order
    assert seen == golden.seen
    assert triples == golden.triples
    # politeness actually throttled: more rounds than the unbudgeted crawl
    assert crawler.store.last_round() >= golden.rounds


def test_infinite_depth_terminates(spark, docs_local, docs_df, tmp_path):
    small = CorpusConfig(n_docs=60)
    docs_small = generate_local(small)
    df = generate_df(spark, small, partitions=2)
    seeds = seeds_for(small, 1)
    golden = oracle_crawl(docs_small, seeds, depth=-1)
    order, seen, _, _ = _run_engine(spark, df, tmp_path, seeds, depth=-1)
    assert order == golden.order
    assert seen == golden.seen


def test_fetch_once_per_uri(spark, docs_local, docs_df, tmp_path):
    """Seen-vs-cache layering (SURVEY §7.4): a URI revisited at another
    depth re-enters the order log but is fetched once (agent.rb:42-48)."""
    seeds = seeds_for(CFG, 2)
    golden = oracle_crawl(docs_local, seeds, depth=3)
    order, _, _, _ = _run_engine(spark, docs_df, tmp_path, seeds, depth=3)
    uris = [u for _, u, _ in order]
    assert {u: 1 for u in set(uris)} == golden.fetches
    assert len(uris) >= len(set(uris))


def test_per_doc_extraction_matches_spec(spark, docs_df, docs_local):
    """Engine's vectorized link extraction == semantics.link_triples for
    every document (the per-document spec the oracle runs)."""
    from pyspark.sql import functions as F

    from scrappy_spark.frontier.crawler import LinkExtractor

    fetched = docs_df.select(
        F.col("doc_id").alias("uri"),
        F.lit(3).alias("depth"),
        F.xxhash64("doc_id").alias("seq"),
        "spans",
    )
    triples, candidates = LinkExtractor().extract(fetched)
    got = {}
    for r in triples.collect():
        got.setdefault(r["src_uri"], set()).add((r["s"], r["p"], r["o"], r["is_literal"]))
    for url, spans in docs_local.items():
        expect = set(semantics.link_triples(url, spans))
        assert got.get(url, set()) == expect, url


def test_nonpositive_budgets_rejected(spark, docs_df, tmp_path):
    """Review r5: a 0/negative effective budget would make every round
    pop nothing and spin the run() loop forever on a non-empty frontier
    — Crawler fails loudly at construction instead."""
    with pytest.raises(ValueError, match="per_host_budget"):
        Crawler(
            spark, docs_df, str(tmp_path / "s1"),
            CrawlConfig(depth=1, per_host_budget=0),
        )
    with pytest.raises(ValueError, match="host_budgets"):
        Crawler(
            spark, docs_df, str(tmp_path / "s2"),
            CrawlConfig(depth=1, per_host_budget=2, host_budgets=(("h", 0),)),
        )
