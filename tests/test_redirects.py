"""Redirect-chain resolution: pointer-jumping collapse vs a pure-Python
walk, fail-loud contracts (multi-edge src, cycles), and the integration
contract: a collapsed multi-hop map drives a crawl that matches the oracle
under the same (requested → final) config."""

import pytest

from scrappy_spark.corpus import CorpusConfig, generate_df, generate_local, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.frontier import redirects as RD
from scrappy_spark.oracle import oracle_crawl


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _py_resolve(pairs):
    nxt = dict(pairs)
    out = {}
    for s in nxt:
        cur, hops = s, 0
        while cur in nxt:
            cur = nxt[cur]
            hops += 1
        out[s] = (cur, hops)
    return out


def test_resolve_matches_python_walk(spark):
    # two chains (lengths 4 and 1) sharing a terminal, plus an isolated edge
    pairs = [
        ("a", "b"),
        ("b", "c"),
        ("c", "d"),
        ("d", "end"),
        ("x", "end"),
        ("lone", "t2"),
    ]
    got = {
        r["src"]: (r["final_uri"], r["hops"])
        for r in RD.resolve_chains(_edges(spark, pairs)).collect()
    }
    assert got == _py_resolve(pairs)


def test_long_chain_needs_doubling(spark):
    # 15-hop chain: 1 iteration resolves <=2 hops, so correctness here
    # proves the doubling composition (4 iterations), not a single join
    pairs = [(f"u{i}", f"u{i + 1}") for i in range(15)]
    got = {
        r["src"]: (r["final_uri"], r["hops"])
        for r in RD.resolve_chains(_edges(spark, pairs)).collect()
    }
    assert got == _py_resolve(pairs)
    assert got["u0"] == ("u15", 15)


def test_multi_target_raises_but_duplicate_rows_ok(spark):
    with pytest.raises(ValueError, match="multiple distinct"):
        RD.resolve_chains(_edges(spark, [("a", "b"), ("a", "c")]))
    # the same observed 3xx twice is NOT a violation (fetch-log reality)
    got = {
        r["src"]: (r["final_uri"], r["hops"])
        for r in RD.resolve_chains(
            _edges(spark, [("a", "b"), ("a", "b"), ("b", "c")])
        ).collect()
    }
    assert got == {"a": ("c", 2), "b": ("c", 1)}


def test_cycle_raises(spark):
    with pytest.raises(RuntimeError, match="cycle or chain"):
        RD.resolve_chains(
            _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")]), max_hops=8
        )


def test_collapsed_map_crawl_exact_match(spark, tmp_path):
    """Multi-hop chains collapsed by resolve_chains feed CrawlConfig
    .redirects; crawl order + seen set match the oracle under the same
    collapsed map, and the chain head resolves to the chain END's page."""
    cfg = CorpusConfig(n_docs=150)
    docs = generate_local(cfg)
    df = generate_df(spark, cfg, partitions=2)
    seeds = seeds_for(cfg, 2)
    real = sorted(u for u in dict(docs) if u.startswith("http://h001."))[:1][0]
    # hop1 -> hop2 -> real page (neither hop is a document itself)
    pairs = [
        ("http://h001.example.com/hop1", "http://h001.example.com/hop2"),
        ("http://h001.example.com/hop2", real),
    ]
    collapsed = RD.collapse_for_config(_edges(spark, pairs))
    assert dict(collapsed)["http://h001.example.com/hop1"] == real

    seeds = ["http://h001.example.com/hop1", *seeds]
    golden = oracle_crawl(
        dict(docs), seeds, depth=1, per_host_budget=2, redirects=dict(collapsed)
    )
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=1, per_host_budget=2, redirects=collapsed),
    )
    crawler.run(seeds)
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    assert order == golden.order
    assert {
        (r["uri"], r["depth"]) for r in crawler.seen_df().collect()
    } == golden.seen
    # the chain head was fetched as the REAL page: its links were emitted
    # (seen contains some depth-0 children of the real page iff it has any)
    assert golden.fetches.get(real, 0) >= 1



def test_chain_over_max_hops_raises_even_when_doubling_covers_it(spark):
    """The doubling count rounds max_hops up to a power of two, so a
    6-hop chain CONVERGES under max_hops=5 (3 doublings cover 8 hops) —
    the explicit hop-cap check must still raise (review r5), and the
    exact boundary (max_hops=6) must still resolve."""
    pairs = [(f"u{i}", f"u{i + 1}") for i in range(6)]
    with pytest.raises(RuntimeError, match="longer than max_hops"):
        RD.resolve_chains(_edges(spark, pairs), max_hops=5)
    got = {
        r["src"]: (r["final_uri"], r["hops"])
        for r in RD.resolve_chains(_edges(spark, pairs), max_hops=6).collect()
    }
    assert got["u0"] == ("u6", 6)
