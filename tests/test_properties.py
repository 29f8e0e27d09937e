"""Property tests (SURVEY.md §5.2.6) + redirect accounting (F-16)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from scrappy_spark import semantics
from scrappy_spark.corpus import CorpusConfig, generate_df, generate_local, seeds_for, url_of_index
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.oracle import oracle_crawl

CFG = CorpusConfig(n_docs=150)


def _triple_strategy():
    node = st.one_of(
        st.just("http://a.com/x"),
        st.just("http://b.com/y"),
        st.just("_:b1"),
        st.text(min_size=1, max_size=8),
    )
    pred = st.sampled_from(["rdf:type", "sc:references", "dc:title"])
    obj = st.one_of(
        node, st.sampled_from(["sc:Page", "sc:Index", "sc:NewUri", "sc:Thing"])
    )
    lit = st.booleans()
    return st.lists(st.tuples(node, pred, obj, lit), max_size=30)


@settings(max_examples=200, deadline=None)
@given(_triple_strategy(), st.integers(min_value=-1, max_value=3))
def test_emit_links_invariants(triples, depth):
    items = semantics.emit_links("http://self.com/", depth, triples)
    uris = [u for u, _ in items]
    depths = [d for _, d in items]
    # no bnode ever enqueued (agent.rb:82)
    assert not any(u.startswith("_:") for u in uris)
    # only http(s) resources
    assert all(u.startswith(("http://", "https://")) for u in uris)
    # depth monotone: children at depth or depth-1, clamped at -1
    assert all(d in (max(-1, depth), max(-1, depth - 1)) for d in depths)
    # self never followed as a plain uri
    nofollow = {
        s for s, p, o, _ in triples if p == "rdf:type" and o == "sc:NewUri"
    }
    assert not any(u in nofollow for u in uris)
    # first-wins: no duplicate items
    assert len(items) == len(set(items))
    # idempotence: emitting twice yields the same list
    assert items == semantics.emit_links("http://self.com/", depth, triples)


@settings(max_examples=200, deadline=None)
@given(_triple_strategy())
def test_clean_removes_exactly_bookkeeping(triples):
    cleaned = semantics.clean(triples)
    # removed rows are exactly rdf:type->{Index,Page,NewUri} (agent.rb:161)
    removed = [t for t in triples if t not in cleaned]
    assert all(
        p == "rdf:type" and o in semantics.BOOKKEEPING_TYPES
        for _, p, o, _ in removed
    )
    assert not any(
        p == "rdf:type" and o in semantics.BOOKKEEPING_TYPES
        for _, p, o, _ in cleaned
    )
    # idempotent
    assert semantics.clean(cleaned) == cleaned


def test_oracle_dedup_idempotence():
    docs = generate_local(CFG)
    seeds = seeds_for(CFG, 2)
    r1 = oracle_crawl(docs, seeds, depth=2)
    r2 = oracle_crawl(docs, seeds, depth=2)
    assert r1.order == r2.order and r1.seen == r2.seen
    # every order entry unique on (uri, depth); seen == set(order items)
    items = [(u, d) for _, u, d in r1.order]
    assert len(items) == len(set(items))
    assert r1.seen == set(items)


def test_redirects_exact_match(spark, tmp_path):
    """F-16: requested vs final URI — order logs the requested URI,
    extraction runs under the final one; engine == oracle exactly."""
    docs = generate_local(CFG)
    df = generate_df(spark, CFG, partitions=2)
    seeds = seeds_for(CFG, 2)
    # redirect two dangling URLs onto real documents
    dangling = sorted(
        {
            s["media_ref"]
            for spans in docs.values()
            for s in spans
            if s["kind"] == "link"
            and "missing" in s["media_ref"]
            and s["media_ref"].startswith("http")
        }
    )[:3]
    targets = [url_of_index(i * 17, CFG) for i in (1, 2, 3)]
    redirects = dict(zip(dangling, targets))
    assert redirects

    golden = oracle_crawl(docs, seeds, depth=2, redirects=redirects)
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=2, redirects=tuple(redirects.items())),
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
    # the redirected-to docs actually contributed triples
    assert any(s in targets for s, _, _, _ in triples)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400),
    st.sampled_from([1, 2, 4, 8]),
)
def test_sharded_cuckoo_never_false_negative(hashes, n_shards):
    """Prefilter exactness contract (F-3): for ANY inserted hash set and
    shard count, might_contain is True for every inserted hash —
    saturation degrades to all-True, never to a false negative."""
    import numpy as np

    from scrappy_spark.frontier.cuckoo import ShardedCuckoo

    h = np.array(hashes, dtype=np.int64).view(np.uint64)
    sc = ShardedCuckoo(n_shards=n_shards, buckets_per_shard=64)
    sc.insert_many(h)
    if len(h):
        assert sc.might_contain(h).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**60 - 1), min_size=2, max_size=24))
def test_simhash_block_recall_property(fps):
    """Pigeonhole recall, independent of any corpus: for ANY 60-bit
    fingerprints, every pair at hamming ≤ 3 shares at least one exact
    15-bit block — the equi-join blocking can never miss a qualifying
    pair (a 2-block half-split scheme fails this property)."""
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            x = fps[i] ^ fps[j]
            if bin(x).count("1") <= 3:
                assert any(
                    (x >> (15 * b)) & 0x7FFF == 0 for b in range(4)
                ), f"no shared block for {fps[i]:015x}/{fps[j]:015x}"
