"""Round-2 scale fixes for the seen store and seen filters:

* compaction folds seen deltas into a bucketed base (pmod(h, B) layout)
  without changing any crawl result, prunes folded delta dirs, and
  survives kill-resume;
* the bloom auto-sizes from the seen count and REBUILDS larger once the
  seen set crosses its design capacity (a fixed bloom degenerates to
  FPP≈1 exactly when the prefilter matters);
* the sharded cuckoo builds distributively (no raw-hash collect) and
  per-round deltas merge via (bucket, fp) pairs;
* robots rules bind to the full authority (host:port) identically in the
  Spark gate and the oracle.
"""

import os

import numpy as np
from pyspark.sql import functions as F

from scrappy_spark.corpus import (
    DOCUMENTS_SCHEMA,
    CorpusConfig,
    generate_df,
    seeds_for,
)
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.frontier import bloom as bloom_mod
from scrappy_spark.frontier.cuckoo import ShardedCuckoo, build_sharded
from scrappy_spark.oracle import oracle_crawl

CFG = CorpusConfig(n_docs=200)


def _order(c):
    return [
        (r["seq"], r["uri"], r["depth"])
        for r in c.order_df().orderBy("round", "seq").collect()
    ]


def _seen(c):
    return sorted((r["uri"], r["depth"], r["h"]) for r in c.seen_df().collect())


def _rand_hashes(n, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**63, size=n, dtype=np.int64).view(np.uint64)


# ---------------------------------------------------------- compaction


def test_compaction_bit_identical_and_prunes(spark, tmp_path):
    df = generate_df(spark, CFG, partitions=2).persist()
    df.count()
    seeds = seeds_for(CFG, 2)
    plain = Crawler(
        spark,
        df,
        str(tmp_path / "plain"),
        CrawlConfig(depth=2, compact_every=10_000, bloom_min_seen=0),
    )
    plain.run(seeds)
    comp = Crawler(
        spark,
        df,
        str(tmp_path / "comp"),
        CrawlConfig(depth=2, compact_every=2, bloom_min_seen=0),
    )
    comp.run(seeds)
    assert _order(comp) == _order(plain)
    assert _seen(comp) == _seen(plain)

    # compaction actually ran: a bucketed base exists …
    marker = comp.store.seen_base()
    assert marker is not None and marker["buckets"] == comp.cfg.seen_buckets
    base_dir = os.path.join(comp.store.root, "seen_base", f"v{marker['upto']}")
    assert any(d.startswith("b=") for d in os.listdir(base_dir))
    # … folded deltas are gone (per-round read is base + short tail) …
    for k in range(marker["upto"] + 1):
        assert not os.path.isdir(
            os.path.join(comp.store.root, "seen", f"round={k}")
        )
    # … and the manifest records filter health (kind, measured FPP)
    m = comp.store.manifest(comp.store.last_round())
    assert m["filter"]["kind"] == "bloom"
    assert 0.0 <= m["filter"]["est_fpp"] < 0.5
    df.unpersist()


def test_resume_after_compaction(spark, tmp_path):
    cfg = CorpusConfig(n_docs=150)
    df = generate_df(spark, cfg, partitions=2).persist()
    df.count()
    seeds = seeds_for(cfg, 2)
    full = Crawler(
        spark, df, str(tmp_path / "full"), CrawlConfig(depth=2, compact_every=2)
    )
    full.run(seeds)
    want = (_order(full), _seen(full))

    part_dir = str(tmp_path / "part")
    c1 = Crawler(
        spark, df, part_dir, CrawlConfig(depth=2, compact_every=2, max_rounds=3)
    )
    c1.run(seeds)
    assert c1.store.seen_base() is not None  # killed AFTER a compaction

    c2 = Crawler(spark, df, part_dir, CrawlConfig(depth=2, compact_every=2))
    c2.run()
    assert (_order(c2), _seen(c2)) == want
    df.unpersist()


def test_parallel_seq_path_exact(spark, tmp_path, monkeypatch):
    """Force every round through the multi-partition range path
    (threshold 0 ⇒ n_parts = shuffle partitions, driver prefix-sum):
    crawl order must still match the oracle exactly — the seq mapping may
    not depend on partition boundaries."""
    from scrappy_spark.corpus import generate_local
    from scrappy_spark.frontier.crawler import Crawler as C

    monkeypatch.setattr(C, "_SEQ_RANGE_THRESHOLD", 0)
    df = generate_df(spark, CFG, partitions=2)
    seeds = seeds_for(CFG, 2)
    golden = oracle_crawl(generate_local(CFG), seeds, depth=2)
    c = Crawler(spark, df, str(tmp_path / "s"), CrawlConfig(depth=2))
    c.run(seeds)
    assert _order(c) == golden.order


def test_bucket_pruned_base_read(spark, tmp_path):
    """read_seen(buckets=…) must (a) return exactly the rows whose hash
    lands in those buckets and (b) push a partition filter on `b` into the
    base scan — the directory-pruning evidence behind the 'bucketed seen
    store' claim."""
    df = generate_df(spark, CFG, partitions=2)
    seeds = seeds_for(CFG, 2)
    c = Crawler(
        spark, df, str(tmp_path / "s"), CrawlConfig(depth=2, compact_every=2)
    )
    c.run(seeds)
    store = c.store
    marker = store.seen_base()
    assert marker is not None
    b = marker["buckets"]
    full = store.read_seen(spark, upto=store.last_round())
    want = {
        r["h"]
        for r in full.where(F.pmod(F.col("h"), F.lit(b)).isin([3, 7])).collect()
    }
    pruned = store.read_seen(spark, upto=store.last_round(), buckets=[3, 7])
    got = {r["h"] for r in pruned.collect()}
    # tail rows are always read in full, so pruned ⊇ bucket-matching base
    # rows and ⊆ bucket rows ∪ tail rows; on the BASE portion it is exact
    assert want <= got
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "b#" in plan


# ------------------------------------------------------- bloom sizing


def test_bloom_autosize_and_rebuild(spark, tmp_path):
    """Crawl-state simulation: write seen deltas, drive _update_bloom, and
    assert (a) bits are sized from seen_rows, (b) crossing the design
    capacity rebuilds a LARGER bloom, (c) measured FPP stays bounded
    instead of walking to 1 (VERDICT r1 #3)."""
    crawler = Crawler(
        spark,
        None,
        str(tmp_path / "s"),
        CrawlConfig(bloom_min_seen=0, bloom_growth=1.0),
    )
    store = crawler.store

    def write_seen(rnd, lo, hi):
        d = spark.range(lo, hi).select(
            F.concat(F.lit("http://h/"), F.col("id")).alias("uri"),
            F.lit(0).alias("depth"),
            F.col("id").alias("seq"),
            F.lit("h").alias("host"),
            F.xxhash64("id").alias("h"),
        )
        store.write_delta("seen", rnd, d)

    write_seen(0, 0, 3000)
    crawler._seen_rows = 3000
    crawler._update_bloom(None, upto_round=0)
    b1 = crawler._bloom
    assert b1 is not None
    assert bloom_mod.design_capacity(b1.n_bits, b1.k) >= 3000
    assert b1.est_fpp() < 0.2

    # delta update ORs in without a rebuild
    write_seen(1, 3000, 3500)
    crawler._seen_rows = 3500
    crawler._update_bloom(store.read_round(spark, "seen", 1), upto_round=1)
    assert crawler._bloom is b1  # same bitmap object, grown in place
    hv = np.array(
        [r["h"] for r in store.read_round(spark, "seen", 1).select("h").collect()],
        dtype=np.int64,
    ).view(np.uint64)
    assert b1.might_contain(hv).all()

    # crossing the design capacity triggers a LARGER rebuild
    n2 = crawler._bloom_capacity + 5000
    write_seen(2, 3500, n2)
    crawler._seen_rows = n2
    crawler._update_bloom(None, upto_round=2)
    b2 = crawler._bloom
    assert b2 is not b1 and b2.n_bits > b1.n_bits
    assert bloom_mod.design_capacity(b2.n_bits, b2.k) >= n2
    assert b2.est_fpp() < 0.2
    crawler._filter_bc.destroy()


# ------------------------------------------------------ sharded cuckoo


def test_sharded_cuckoo_distributed_build(spark):
    hashes = spark.range(20_000).select(F.xxhash64("id").alias("h"))
    sc = build_sharded(hashes, n_shards=8, buckets_per_shard=1 << 10)
    hv = np.array(
        [r["h"] for r in hashes.collect()], dtype=np.int64
    ).view(np.uint64)
    assert sc.count == 20_000 and sc.saturated_shards == 0
    assert sc.might_contain(hv).all()  # zero false negatives
    assert sc.might_contain(_rand_hashes(10_000)).mean() < 0.05


def test_sharded_merge_equals_full_build(spark):
    base = spark.range(8_000).select(F.xxhash64("id").alias("h"))
    delta = spark.range(8_000, 12_000).select(F.xxhash64("id").alias("h"))
    both = spark.range(12_000).select(F.xxhash64("id").alias("h"))
    merged = build_sharded(base, 4, 1 << 10)
    merged.merge(build_sharded(delta, 4, 1 << 10))
    full = build_sharded(both, 4, 1 << 10)
    hv = np.array([r["h"] for r in both.collect()], dtype=np.int64).view(
        np.uint64
    )
    assert merged.count == full.count == 12_000
    assert merged.might_contain(hv).all()


def test_sharded_saturation_is_per_shard():
    sc = ShardedCuckoo(n_shards=4, buckets_per_shard=16)  # 256 slots total
    h = _rand_hashes(2_000)
    sc.insert_many(h)
    assert sc.saturated_shards > 0
    # inserted OR saturated ⇒ never a false negative
    assert sc.might_contain(h).all()


# ------------------------------------------------------- robots ports


def _sp(kind, text="", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def test_robots_binds_to_full_authority(spark, tmp_path):
    """A rule keyed on an explicit non-default port must disallow exactly
    that authority — and the portless twin must stay crawlable — in BOTH
    the engine and the oracle (ADVICE r1: the two previously diverged)."""
    root = "http://a.example.com/"
    docs = {
        root: [
            _sp("link", "p", "http://a.example.com:8080/x", 0),
            _sp("link", "q", "http://a.example.com/x", 1),
        ],
        "http://a.example.com:8080/x": [_sp("text", "pay", "", 0)],
        "http://a.example.com/x": [_sp("text", "free", "", 0)],
    }
    robots = [("a.example.com:8080", "/")]
    golden = oracle_crawl(docs, [root], depth=2, robots=robots)
    df = spark.createDataFrame(
        [
            (k, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in v])
            for k, v in docs.items()
        ],
        DOCUMENTS_SCHEMA,
    )
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=2, robots=tuple(robots)),
    )
    crawler.run([root])
    order = _order(crawler)
    seen = {(u, d) for u, d, _ in _seen(crawler)}
    assert order == golden.order
    assert seen == golden.seen
    assert all("8080" not in u for u, _ in seen)
    assert ("http://a.example.com/x", 1) in seen
