"""Kill-resume: a crawl stopped after k rounds and restarted from the
checkpoint store must reproduce the uninterrupted run bit-identically
(north rule; SURVEY.md §5.2.5). Also covers mid-round crash cleanup."""

import os
import shutil

from scrappy_spark.corpus import CorpusConfig, generate_df, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.frontier.checkpoint import CrawlStore

CFG = CorpusConfig(n_docs=150)


def _snapshot(crawler):
    order = [
        (r["seq"], r["uri"], r["depth"], r["round"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    seen = sorted(
        (r["uri"], r["depth"], r["h"]) for r in crawler.seen_df().collect()
    )
    triples = sorted(
        (r["s"], r["p"], r["o"]) for r in crawler.clean_triples_df().collect()
    )
    return order, seen, triples


def test_resume_bit_identical(spark, tmp_path):
    df = generate_df(spark, CFG, partitions=2).persist()
    df.count()
    seeds = seeds_for(CFG, 2)

    full = Crawler(spark, df, str(tmp_path / "full"), CrawlConfig(depth=2))
    full.run(seeds)
    want = _snapshot(full)
    total_rounds = full.store.last_round()
    assert total_rounds >= 3

    # interrupted run: stop after 2 rounds, then resume with a NEW crawler
    part_dir = str(tmp_path / "part")
    c1 = Crawler(spark, df, part_dir, CrawlConfig(depth=2, max_rounds=2))
    c1.run(seeds)
    assert c1.store.last_round() == 2

    c2 = Crawler(spark, df, part_dir, CrawlConfig(depth=2))
    c2.run()  # no seeds: resumes from checkpoint
    assert _snapshot(c2) == want
    assert c2.store.last_round() == total_rounds


def test_mid_round_crash_rolls_back(spark, tmp_path):
    df = generate_df(spark, CFG, partitions=2)
    seeds = seeds_for(CFG, 2)
    part_dir = str(tmp_path / "crash")
    c1 = Crawler(spark, df, part_dir, CrawlConfig(depth=1, max_rounds=2))
    c1.run(seeds)

    # simulate a crash mid-round-3: orphan delta dirs without a manifest
    store = CrawlStore(part_dir)
    orphan = os.path.join(part_dir, "order", "round=3")
    shutil.copytree(os.path.join(part_dir, "order", "round=2"), orphan)
    assert store.last_round() == 2

    c2 = Crawler(spark, df, part_dir, CrawlConfig(depth=1))
    c2.run()
    assert not os.path.isdir(orphan) or store.last_round() >= 3

    # the resumed result equals a clean run
    full = Crawler(spark, df, str(tmp_path / "clean"), CrawlConfig(depth=1))
    full.run(seeds)
    assert _snapshot(c2) == _snapshot(full)
