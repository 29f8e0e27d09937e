"""Sitemap layer: sitemaps.org-subset parser (native expressions), location
constraint, lastmod recency, one-level index expansion, and the integration
contract: sitemap-derived seeds drive a crawl that matches the oracle."""

from scrappy_spark.corpus import (
    DOCUMENTS_SCHEMA,
    CorpusConfig,
    generate_df,
    generate_local,
)
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.frontier import sitemaps as SM
from scrappy_spark.oracle import oracle_crawl

SITEMAP_A = (
    "<urlset>\n"
    "<url><loc>  http://a.example.com/keep  </loc>"
    "<lastmod> 2026-02-03 </lastmod></url>\n"
    "<url>\n  <loc>http://a.example.com/nolastmod</loc>\n</url>\n"
    "<url><loc>https://a.example.com/https-ok</loc></url>\n"
    "<url><loc>http://other.example.com/cross-host</loc></url>\n"
    "<url><loc>/relative/dropped</loc></url>\n"
    "<url><lastmod>2026-01-01</lastmod></url>\n"  # no loc -> dropped
)


def _texts(spark, pairs):
    return spark.createDataFrame(pairs, "host string, text string")


def test_parse_subset(spark):
    got = {
        (r["loc"], r["lastmod"])
        for r in SM.parse_sitemaps(
            _texts(spark, [("a.example.com", SITEMAP_A)])
        ).collect()
    }
    assert got == {
        ("http://a.example.com/keep", "2026-02-03"),  # whitespace trimmed
        ("http://a.example.com/nolastmod", None),
        ("https://a.example.com/https-ok", None),  # https kept, host matches
        # cross-host, relative, and loc-less entries all dropped
    }


def test_index_expansion_one_level(spark):
    child = (
        "<urlset><url><loc>http://b.example.com/from-child</loc>"
        "<lastmod>2026-03-01</lastmod></url></urlset>"
    )
    # an index child that is ITSELF an index: resolves, but contains no
    # <url> blocks, so it contributes nothing (one-level contract)
    nested_index = (
        "<sitemapindex><sitemap>"
        "<loc>http://b.example.com/sitemap.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    index = (
        "<sitemapindex>\n"
        "<sitemap><loc>http://b.example.com/sitemap.xml</loc></sitemap>\n"
        "<sitemap><loc>http://b.example.com/nested_index.xml</loc></sitemap>\n"
        "<sitemap><loc>http://evil.example.com/sitemap.xml</loc></sitemap>\n"
        "</sitemapindex>"
    )
    doc_texts = spark.createDataFrame(
        [
            ("http://b.example.com/sitemap.xml", child),
            ("http://b.example.com/nested_index.xml", nested_index),
            ("http://evil.example.com/sitemap.xml", child),
        ],
        "doc_id string, text string",
    )
    out = SM.parse_sitemaps(
        SM.expand_index(_texts(spark, [("b.example.com", index)]), doc_texts)
    ).collect()
    # evil child dropped BEFORE the join; nested index yields no urls;
    # note the child's entries keep the INDEX host (they pass the
    # constraint because child host == index host)
    assert [(r["host"], r["loc"], r["lastmod"]) for r in out] == [
        ("b.example.com", "http://b.example.com/from-child", "2026-03-01")
    ]


def test_texts_from_spans_and_suffixes(spark):
    docs = {
        "http://c.example.com/sitemap.xml": [
            {"kind": "text", "text": "</url>", "media_ref": "", "offset": 1},
            {"kind": "media", "text": "", "media_ref": "m", "offset": 2},
            {
                "kind": "text",
                "text": "<url><loc>http://c.example.com/z</loc>",
                "media_ref": "",
                "offset": 0,
            },
        ],
        "http://c.example.com/page": [
            {"kind": "text", "text": "not a sitemap", "media_ref": "", "offset": 0}
        ],
    }
    df = spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)
    texts = SM.texts_from_spans(df).collect()
    assert len(texts) == 1 and texts[0]["host"] == "c.example.com"
    # spans concatenated in offset order -> the <url> block spans the join
    parsed = SM.parse_sitemaps(SM.texts_from_spans(df)).collect()
    assert [(r["loc"], r["lastmod"]) for r in parsed] == [
        ("http://c.example.com/z", None)
    ]


def test_sitemap_seeds_recency(spark):
    text = (
        "<urlset>"
        "<url><loc>http://d.example.com/new</loc>"
        "<lastmod>2026-02-01</lastmod></url>"
        "<url><loc>http://d.example.com/old</loc>"
        "<lastmod>2025-01-01</lastmod></url>"
        "<url><loc>http://d.example.com/unknown</loc></url>"
        "</urlset>"
    )
    docs = {
        "http://d.example.com/sitemap.xml": [
            {"kind": "text", "text": text, "media_ref": "", "offset": 0}
        ]
    }
    df = spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)
    all_seeds = {r["uri"] for r in SM.sitemap_seeds(df).collect()}
    assert all_seeds == {
        "http://d.example.com/new",
        "http://d.example.com/old",
        "http://d.example.com/unknown",
    }
    recent = {r["uri"] for r in SM.sitemap_seeds(df, since="2026-01-15").collect()}
    # old (stale) and unknown (no lastmod) both excluded under a cutoff
    assert recent == {"http://d.example.com/new"}


def test_sitemap_seeded_crawl_exact_match(spark, tmp_path):
    """Capstone: a sitemap living IN the spans web names real corpus URLs
    (+ a cross-host one that must be dropped); the derived seeds drive a
    crawl that matches the oracle crawl on the same seed list."""
    cfg = CorpusConfig(n_docs=150)
    docs = dict(generate_local(cfg))
    host = "h001.example.com"
    listed = sorted(u for u in docs if u.startswith(f"http://{host}/"))[:3]
    text = "<urlset>" + "".join(
        f"<url><loc>{u}</loc><lastmod>2026-01-0{i + 1}</lastmod></url>"
        for i, u in enumerate(listed)
    ) + "<url><loc>http://h000.example.com/p0</loc></url></urlset>"
    docs[f"http://{host}/sitemap.xml"] = [
        {"kind": "text", "text": text, "media_ref": "", "offset": 0}
    ]
    df = spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)

    seed_rows = SM.sitemap_seeds(df).collect()
    seeds = sorted(r["uri"] for r in seed_rows)
    assert seeds == listed  # cross-host loc never became a seed

    golden = oracle_crawl(docs, seeds, depth=1, per_host_budget=2)
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=1, per_host_budget=2),
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
