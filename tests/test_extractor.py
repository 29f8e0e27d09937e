"""Extraction algebra: selector unit semantics (each cites the reference
behavior it reproduces), link-KB parity with the M1 spec, and end-to-end
crawl equality oracle-vs-engine under a rich KB."""

import pytest

from scrappy_spark import semantics
from scrappy_spark.corpus import CorpusConfig, generate_df, generate_local, seeds_for
from scrappy_spark.extractor import Fragment, FragmentExtractor, Selector
from scrappy_spark.extractor.interp import extract_document, kb_extract_fn, select, _State, _ctx
from scrappy_spark.extractor.kb import link_kb
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.oracle import oracle_crawl

URI = "http://h.example.com/p1"
SPANS = [
    {"kind": "heading", "text": "Intro", "media_ref": "", "offset": 0},
    {"kind": "text", "text": "hello  world", "media_ref": "", "offset": 1},
    {"kind": "link", "text": "next page", "media_ref": "/p1?page=2", "offset": 2},
    {"kind": "heading", "text": "Details", "media_ref": "", "offset": 3},
    {"kind": "text", "text": "price: 40", "media_ref": "", "offset": 4},
    {"kind": "link", "text": "other", "media_ref": "http://o.com/x", "offset": 5},
    {"kind": "media", "text": "", "media_ref": "http://cdn/x.jpg", "offset": 6},
]


def _sel(sel, uri=URI, spans=SPANS):
    st = _State(uri)
    return select(sel, _ctx(uri, spans), st)


def test_span_selector_kind_index_keyword_attribute():
    # xpath.rb:3-23 semantics over spans
    assert [c["value"] for c in _sel(Selector(type="span", kind="heading"))] == [
        "Intro",
        "Details",
    ]
    assert [c["value"] for c in _sel(Selector(type="span", kind="heading", index=1))] == [
        "Details"
    ]
    assert [
        c["value"]
        for c in _sel(Selector(type="span", kind="link", keyword="next"))
    ] == ["next page"]
    assert [
        c["value"]
        for c in _sel(Selector(type="span", kind="link", attribute="media_ref"))
    ] == ["/p1?page=2", "http://o.com/x"]


def test_uri_gates():
    # uri.rb:4-9 (query stripped), uri_pattern.rb:4-9 (glob)
    assert _sel(Selector(type="uri", values=(URI,)))
    assert not _sel(Selector(type="uri", values=("http://other/",)))
    assert _sel(Selector(type="uri_pattern", values=("http://h.example.com/*",)))
    assert not _sel(Selector(type="uri_pattern", values=("http://x.com/*",)))


def test_base_uri_root_section():
    assert [c["value"] for c in _sel(Selector(type="base_uri"))] == [URI]
    root = _sel(Selector(type="root"))
    assert root[0]["value"] == "Intro hello world next page Details price: 40 other"
    sec = _sel(Selector(type="section", values=("details",)))
    assert [c["value"] for c in sec] == ["price: 40 other"]


def test_slice_and_nesting():
    # slice.rb:3-10 composed under a section (selector.rb:70-75 chaining)
    sel = Selector(
        type="section",
        values=("details",),
        children=(Selector(type="slice", separator=" ", indexes=(1,)),),
    )
    assert [c["value"] for c in _sel(sel)] == ["40"]


def test_postproc_boolean_normalize_nonempty():
    spans = [
        {"kind": "text", "text": "yes", "media_ref": "", "offset": 0},
        {"kind": "text", "text": "maybe", "media_ref": "", "offset": 1},
        {"kind": "text", "text": "no", "media_ref": "", "offset": 2},
    ]
    vals = [
        c["value"]
        for c in _sel(Selector(type="span", kind="text", boolean=True), spans=spans)
    ]
    assert vals == ["true", "false"]  # unknown dropped, selector.rb:24-40
    nspans = [{"kind": "text", "text": "50", "media_ref": "", "offset": 0}]
    vals = [
        c["value"]
        for c in _sel(
            Selector(type="span", kind="text", norm_min=0.0, norm_max=100.0),
            spans=nspans,
        )
    ]
    assert vals == ["0.5"]


def test_new_uri_sequence_and_nofollow():
    # new_uri.rb:3-38: wikify + prefix + per-(doc,prefix) sequence counter
    st = _State(URI)
    sel = Selector(type="new_uri", prefix="http://wiki/", transform="wikify")
    out = select(sel, _ctx(URI, [], value="hello  world"), st)
    assert out[0]["value"] == "http://wiki/HelloWorld"
    assert out[0]["nofollow"] is True
    seq = Selector(type="new_uri", prefix="http://s/", sequence=True)
    v1 = select(seq, _ctx(URI, [], value="a"), st)[0]["value"]
    v2 = select(seq, _ctx(URI, [], value="b"), st)[0]["value"]
    assert (v1, v2) == ("http://s/1", "http://s/2")


def test_range_selector():
    out = _sel(Selector(type="range", min_offset=3, max_offset=5, kinds=("text", "link")))
    assert [c["value"] for c in out] == ["price: 40", "other"]


def test_cardinality_drop():
    # fragment.rb:37-44: parent node dropped when child count violates
    kb = (
        Fragment(
            fid="doc",
            selectors=(Selector(type="base_uri"),),
            identifier=(Selector(type="base_uri"),),
            rdf_type="sc:Doc",
            subfragments=(
                Fragment(
                    fid="heads",
                    selectors=(Selector(type="span", kind="heading"),),
                    rdf_type="rdf:Literal",
                    relation="sc:heading",
                    min_card=5,  # impossible -> drop parent
                ),
            ),
        ),
    )
    assert extract_document(kb, URI, SPANS) == []
    kb_ok = (
        Fragment(
            fid="doc",
            selectors=(Selector(type="base_uri"),),
            identifier=(Selector(type="base_uri"),),
            rdf_type="sc:Doc",
            subfragments=(
                Fragment(
                    fid="heads",
                    selectors=(Selector(type="span", kind="heading"),),
                    rdf_type="rdf:Literal",
                    relation="sc:heading",
                    min_card=1,
                    max_card=5,
                ),
            ),
        ),
    )
    triples = extract_document(kb_ok, URI, SPANS)
    assert (URI + "", "sc:heading", "Intro", True) in [
        (s, p, o, l) for s, p, o, l in triples
    ]


def test_link_kb_matches_m1_spec():
    """Interpreter under link_kb == semantics.link_triples (triple set AND
    emission order) for every corpus document."""
    cfg = CorpusConfig(n_docs=200)
    docs = generate_local(cfg)
    fn = kb_extract_fn(link_kb())
    for url, spans in docs.items():
        got = fn(url, spans)
        want = semantics.link_triples(url, spans)
        assert set(got) == set(want), url
        assert semantics.emit_links(url, 3, got) == semantics.emit_links(
            url, 3, want
        ), url


RICH_KB = (
    Fragment(
        fid="doc",
        selectors=(Selector(type="uri_pattern", values=("http://*",)),),
        identifier=(Selector(type="base_uri"),),
        rdf_type="sc:WebPage",
        subfragments=(
            Fragment(
                fid="links",
                selectors=(Selector(type="span", kind="link"),),
                identifier=(
                    Selector(type="span", kind="link", attribute="media_ref"),
                ),
                relation="sc:references",
            ),
            Fragment(
                fid="pages",
                selectors=(
                    Selector(
                        type="span",
                        kind="link",
                        pattern=r"\?page=",
                        pattern_on="media_ref",
                    ),
                ),
                identifier=(
                    Selector(
                        type="span",
                        kind="link",
                        pattern=r"\?page=",
                        pattern_on="media_ref",
                        attribute="media_ref",
                    ),
                ),
                rdf_type="sc:Page",
            ),
            Fragment(
                fid="headings",
                selectors=(Selector(type="span", kind="heading", nonempty=True),),
                rdf_type="rdf:Literal",
                relation="sc:heading",
            ),
            Fragment(
                fid="prices",
                selectors=(
                    Selector(
                        type="span",
                        kind="text",
                        pattern=r"price: ",
                        children=(
                            Selector(type="slice", separator="price: ", indexes=(1,)),
                        ),
                    ),
                ),
                rdf_type="rdf:Literal",
                relation="sc:price",
            ),
            Fragment(
                fid="wikis",
                selectors=(
                    Selector(
                        type="span",
                        kind="heading",
                        children=(
                            Selector(
                                type="new_uri",
                                prefix="http://wiki.example.com/",
                                transform="wikify",
                            ),
                        ),
                    ),
                ),
                relation="sc:topic",
                rdf_type="sc:Topic",
            ),
        ),
    ),
)


def test_rich_kb_crawl_exact_match(spark, tmp_path):
    """End-to-end: oracle(kb interpreter) == engine(FragmentExtractor) —
    order, seen set, and clean triple set, under a KB with literals,
    slices, constructed (nofollow) URIs, and pagination typing."""
    cfg = CorpusConfig(n_docs=150)
    docs = generate_local(cfg)
    df = generate_df(spark, cfg, partitions=2)
    seeds = seeds_for(cfg, 2)
    golden = oracle_crawl(docs, seeds, depth=2, extract=kb_extract_fn(RICH_KB))

    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=2),
        extractor=FragmentExtractor(RICH_KB),
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
    # the rich KB actually extracted literals and constructed URIs
    assert any(p == "sc:price" for _, p, _, _ in triples)
    assert any(p == "sc:topic" for _, p, _, _ in triples)
    # nofollow honored: no wiki.example.com URI was ever crawled
    assert not any("wiki.example.com" in u for u, _ in seen)


def test_referenceable_provenance_graph():
    """-r output shape (fragment.rb:84-93, 138-171 analog, round 4):
    referenceable mode ADDS an sc:source → sc:selector
    (sc:UnivocalSelector with span-axis path/tag) + sc:presentation
    graph per node; base triples and link emission are bit-unchanged."""
    kb = link_kb()
    plain = extract_document(kb, URI, SPANS)
    ref = extract_document(kb, URI, SPANS, referenceable=True)

    # the plain triples are a subset, order-preserved
    assert [t for t in ref if t in plain] == plain
    extra = [t for t in ref if t not in plain]
    preds = {p for _, p, _, _ in extra}
    assert {"sc:source", "sc:selector", "sc:path", "sc:document",
            "sc:presentation", "sc:text"} <= preds
    # one UnivocalSelector per extracted node, each typed, documented,
    # and carrying the span-axis path
    sels = [s for s, p, o, _ in extra
            if p == "rdf:type" and o == "sc:UnivocalSelector"]
    n_sources = sum(1 for _, p, _, _ in extra if p == "sc:source")
    assert len(sels) == n_sources > 0
    for sel in sels:
        assert (sel, "sc:document", URI, False) in extra
        assert any(s == sel and p == "sc:path" and o.startswith("span:")
                   for s, p, o, _ in extra)
    # provenance bnodes never change link emission
    assert semantics.emit_links(URI, 2, ref) == semantics.emit_links(
        URI, 2, plain
    )


def test_referenceable_crawl_matches_plain_order(spark, tmp_path):
    """A crawl with a referenceable FragmentExtractor produces the SAME
    crawl order/seen set as the plain one (provenance is additive)."""
    cfg = CorpusConfig(n_docs=60)
    df = generate_df(spark, cfg, partitions=2)
    seeds = seeds_for(cfg, 2)
    orders = []
    for referenceable in (False, True):
        c = Crawler(
            spark,
            df,
            str(tmp_path / f"store_{referenceable}"),
            CrawlConfig(depth=2),
            extractor=FragmentExtractor(link_kb(), referenceable),
        )
        c.run(seeds)
        orders.append(
            [
                (r["seq"], r["uri"], r["depth"])
                for r in c.order_df().orderBy("round", "seq").collect()
            ]
        )
        if referenceable:
            trips = c.triples_df()
            assert trips.where("p = 'sc:source'").count() > 0
            assert (
                trips.where("o = 'sc:UnivocalSelector'").count()
                == trips.where("p = 'sc:source'").count()
            )
    assert orders[0] == orders[1]
