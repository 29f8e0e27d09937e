"""Capstone: every crawl feature at once must still match the oracle
exactly — politeness budget + salted host repartition + robots + redirects
+ fragment-interpreter KB + sharded-cuckoo prefilter + seen-store
compaction + priority expression + forced multi-partition seq path, plus
duplicate/disallowed seeds, and a kill-resume on top of all of it."""

from scrappy_spark.corpus import CorpusConfig, generate_df, generate_local, seeds_for, url_of_index
from scrappy_spark.extractor import FragmentExtractor
from scrappy_spark.extractor.interp import kb_extract_fn
from scrappy_spark.extractor.kb import link_kb
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.oracle import oracle_crawl

CFG = CorpusConfig(n_docs=120)


def test_all_features_combined_exact_match(spark, tmp_path):
    docs = generate_local(CFG)
    df = generate_df(spark, CFG, partitions=2)
    base_seeds = seeds_for(CFG, 3)
    seeds = base_seeds + [base_seeds[0], "h999.example.com/disallowed"]
    robots = [("h999.example.com", "/"), ("h000.example.com", "/p0?page=")]
    redirects = {
        url_of_index(5, CFG): url_of_index(9, CFG),
    }

    kb = link_kb()
    golden = oracle_crawl(
        docs,
        seeds,
        depth=2,
        per_host_budget=2,
        extract=kb_extract_fn(kb),
        robots=robots,
        redirects=redirects,
    )
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(
            depth=2,
            per_host_budget=2,
            repartition_by_host=True,
            host_salt_k=3,
            robots=tuple(robots),
            redirects=tuple(redirects.items()),
            seen_filter="cuckoo",
            bloom_min_seen=0,
            compact_every=2,  # bucketed-base compaction mid-crawl
        ),
        extractor=FragmentExtractor(kb),
    )
    crawler.run(seeds)
    assert crawler.store.seen_base() is not None  # compaction really ran

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
    assert len(order) > 10
    # robots actually bit: the disallowed seed and prefix never appear
    assert not any(u.startswith("http://h999") for u, _ in seen)
    assert not any("h000.example.com/p0?page=" in u for u, _ in seen)

    # kill-resume with the SAME everything-at-once config (incl. cuckoo
    # restore + compacted-base reads) must land on the identical order
    cfg_kw = dict(
        depth=2,
        per_host_budget=2,
        repartition_by_host=True,
        host_salt_k=3,
        robots=tuple(robots),
        redirects=tuple(redirects.items()),
        seen_filter="cuckoo",
        bloom_min_seen=0,
        compact_every=2,
    )
    part_dir = str(tmp_path / "part")
    c1 = Crawler(
        spark, df, part_dir, CrawlConfig(max_rounds=3, **cfg_kw),
        extractor=FragmentExtractor(kb),
    )
    c1.run(seeds)
    c2 = Crawler(
        spark, df, part_dir, CrawlConfig(**cfg_kw),
        extractor=FragmentExtractor(kb),
    )
    c2.run()
    order2 = [
        (r["seq"], r["uri"], r["depth"])
        for r in c2.order_df().orderBy("round", "seq").collect()
    ]
    assert order2 == golden.order
