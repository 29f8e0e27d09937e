"""Cuckoo seen-filter: no false negatives, deletion, saturation safety,
and exact crawl parity when used as the prefilter."""

import numpy as np
import pytest

from scrappy_spark.corpus import CorpusConfig, generate_df, generate_local, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.frontier.cuckoo import CuckooFilter
from scrappy_spark.oracle import oracle_crawl


def _hashes(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**63, size=n, dtype=np.int64).view(np.uint64)


def test_no_false_negatives_and_fpp():
    f = CuckooFilter(n_buckets=1 << 12)  # capacity ~16k
    ins = _hashes(8000)
    assert f.insert_many(ins) == 8000 and not f.saturated
    assert f.might_contain(ins).all()  # zero false negatives
    other = _hashes(8000, seed=99)
    fpp = f.might_contain(other).mean()
    assert fpp < 0.05, fpp


def test_delete_restores_negatives():
    f = CuckooFilter(n_buckets=1 << 10)
    h = _hashes(1000)
    f.insert_many(h)
    assert f.might_contain(h[:100]).all()
    removed = f.delete_many(h[:100])
    assert removed == 100
    # deleted items may still collide with survivors' fingerprints, but
    # the bulk must now test negative
    assert f.might_contain(h[:100]).mean() < 0.2
    # survivors untouched — still zero false negatives
    assert f.might_contain(h[100:]).all()


def test_saturation_degrades_safely():
    f = CuckooFilter(n_buckets=1 << 4)  # tiny: 64 slots
    h = _hashes(500)
    f.insert_many(h)
    if f.saturated:
        # saturated filter returns all-True: prefilter disabled, anti-join
        # still exact — never a false negative
        assert f.might_contain(_hashes(100, seed=3)).all()
    assert f.might_contain(h[: f.count]).all()


def test_cuckoo_crawl_exact_match(spark, tmp_path):
    cfg = CorpusConfig(n_docs=200)
    docs = generate_local(cfg)
    df = generate_df(spark, cfg, partitions=2)
    seeds = seeds_for(cfg, 2)
    golden = oracle_crawl(docs, seeds, depth=2)
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=2, seen_filter="cuckoo", bloom_min_seen=0),
    )
    crawler.run(seeds)
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    seen = {(r["uri"], r["depth"]) for r in crawler.seen_df().collect()}
    assert order == golden.order
    assert seen == golden.seen
    # the cuckoo was actually engaged
    assert crawler._bloom is not None and crawler._bloom.count > 0

    # re-running the SAME instance (finished crawl: restore, no new work)
    # must not double-insert the seen set into a rebuilt filter
    # (ADVICE r2: _restore reused the stale _bloom as a merge target)
    count_after_first = crawler._bloom.count
    crawler.run(seeds)
    assert crawler._bloom.count == count_after_first
    assert [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ] == golden.order


def test_cuckoo_saturation_triggers_growth_rebuild(spark, tmp_path):
    """A deliberately undersized cuckoo (1 shard x 64 buckets = 256
    slots, vs ~350+ seen entries) must saturate mid-crawl, then be
    REBUILT at a larger geometry from the committed seen set (round 4:
    previously a saturated shard stayed all-True — safe but a dead
    prefilter — for the rest of the crawl). Crawl results stay exact
    throughout (the filter only short-circuits definite misses)."""
    cfg = CorpusConfig(n_docs=200)
    docs = generate_local(cfg)
    df = generate_df(spark, cfg, partitions=2)
    seeds = seeds_for(cfg, 2)
    golden = oracle_crawl(docs, seeds, depth=2)
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(
            depth=2,
            seen_filter="cuckoo",
            bloom_min_seen=0,
            cuckoo_shards=1,
            cuckoo_buckets=64,
        ),
    )
    crawler.run(seeds)
    f = crawler._bloom
    assert f is not None and f.count > 256  # really outgrew the start size
    assert f.buckets_per_shard > 64  # geometry grew
    assert f.saturated_shards == 0  # prefilter selectivity restored
    # capacity headroom: the rebuilt table fits the seen set under the
    # ~95% cuckoo fill ceiling
    assert f.count <= 0.95 * f.n_shards * f.buckets_per_shard * 4
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    assert order == golden.order


def test_cuckoo_resume_builds_adequately_sized_filter(spark, tmp_path):
    """Kill-resume over a seen set that has outgrown the static config:
    the INITIAL post-resume build must size from the actual seen count
    (review r4) — not the config floor — so the restored filter is
    usable immediately (no saturated shards), and the resumed crawl
    stays exact."""
    cfg = CorpusConfig(n_docs=200)
    docs = generate_local(cfg)
    df = generate_df(spark, cfg, partitions=2)
    seeds = seeds_for(cfg, 2)
    golden = oracle_crawl(docs, seeds, depth=2)
    store = str(tmp_path / "store")
    crawl_cfg = CrawlConfig(
        depth=2,
        seen_filter="cuckoo",
        bloom_min_seen=0,
        cuckoo_shards=1,
        cuckoo_buckets=64,  # 256 slots — far below the final seen count
    )
    Crawler(spark, df, store, crawl_cfg).run(seeds)

    # fresh instance on the same store = kill-resume; its first
    # _update_bloom is an initial FULL build over the grown seen set
    resumed = Crawler(spark, df, store, crawl_cfg)
    resumed.run(seeds)  # restore; no new work
    f = resumed._bloom
    assert f is not None and f.count > 256
    assert f.saturated_shards == 0
    assert f.buckets_per_shard > 64
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in resumed.order_df().orderBy("round", "seq").collect()
    ]
    assert order == golden.order
