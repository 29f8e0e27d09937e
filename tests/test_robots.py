"""robots.txt layer: RFC-9309-subset parser (native expressions), group
selection, longest-match gate, crawl-delay → per-host budgets, and the
golden crawl contract with Allow-overrides and budget overrides."""

import pytest

from scrappy_spark.corpus import (
    DOCUMENTS_SCHEMA,
    CorpusConfig,
    generate_df,
    generate_local,
    seeds_for,
)
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.frontier import robots as R
from scrappy_spark.oracle import oracle_crawl, robots_disallowed

ROBOTS_A = (
    "# comment line\r\n"
    "User-Agent: *\r\n"
    "Disallow: /private\n"
    "Allow: /private/ok   \n"
    "crawl-delay: 2\n"
    "Disallow:\n"  # empty value -> allow-everything -> dropped
    "Disallow: nope\n"  # no leading / -> dropped
    "Disallow: /wild*card\n"  # RFC wildcard -> dropped conservatively
    "noise without colon\n"
    "Sitemap: http://a.example.com/sitemap.xml\n"  # unknown directive
)
ROBOTS_B = (
    "User-agent: googlebot\n"
    "User-agent: SCRAPPY\n"  # consecutive UA lines share one group
    "Disallow: /only-scrappy\n"
    "Crawl-delay: 0.5\n"
    "User-agent: *\n"  # UA after a rule line -> NEW group
    "Disallow: /star-group\n"
    "Crawl-delay: 9\n"
)
ROBOTS_C = (
    "Disallow: /before-any-ua\n"  # invalid: no group yet -> dropped
    "User-agent: otherbot\n"
    "Disallow: /\n"
)


def _texts(spark, pairs):
    return spark.createDataFrame(pairs, "host string, text string")


def test_parse_groups_validation_and_agent_selection(spark):
    texts = _texts(
        spark,
        [
            ("a.example.com", ROBOTS_A),
            ("b.example.com", ROBOTS_B),
            ("c.example.com", ROBOTS_C),
        ],
    )
    rules = {
        (r["host"], r["prefix"], r["allow"])
        for r in R.parse_robots(texts, agent="scrappy").collect()
    }
    assert rules == {
        ("a.example.com", "/private", False),
        ("a.example.com", "/private/ok", True),
        # b: the exact-agent group SHADOWS the * group (RFC most-specific)
        ("b.example.com", "/only-scrappy", False),
        # c: no scrappy group, no * group -> no rules at all
    }
    delays = {
        (r["host"], r["crawl_delay"])
        for r in R.parse_crawl_delays(texts, agent="scrappy").collect()
    }
    assert delays == {("a.example.com", 2.0), ("b.example.com", 0.5)}


def test_parse_star_fallback_for_unknown_agent(spark):
    texts = _texts(spark, [("b.example.com", ROBOTS_B)])
    rules = {
        (r["prefix"], r["allow"])
        for r in R.parse_robots(texts, agent="nobody").collect()
    }
    assert rules == {("/star-group", False)}
    delays = R.parse_crawl_delays(texts, agent="nobody").collect()
    assert [(r["host"], r["crawl_delay"]) for r in delays] == [
        ("b.example.com", 9.0)
    ]


def test_texts_from_spans(spark):
    docs = {
        "http://a.example.com/robots.txt": [
            # out-of-offset-order spans + a media span to be ignored
            {"kind": "text", "text": "Disallow: /x", "media_ref": "", "offset": 1},
            {"kind": "media", "text": "", "media_ref": "m.png", "offset": 2},
            {"kind": "text", "text": "User-agent: *", "media_ref": "", "offset": 0},
        ],
        "http://a.example.com/page": [
            {"kind": "text", "text": "not robots", "media_ref": "", "offset": 0}
        ],
    }
    df = spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)
    got = R.robots_texts_from_spans(df).collect()
    assert len(got) == 1
    assert got[0]["host"] == "a.example.com"
    assert got[0]["text"] == "User-agent: *\nDisallow: /x"
    rules = R.parse_robots(R.robots_texts_from_spans(df)).collect()
    assert [(r["prefix"], r["allow"]) for r in rules] == [("/x", False)]


def test_texts_from_spans_root_anchor_and_one_per_host(spark):
    span = lambda t: [{"kind": "text", "text": t, "media_ref": "", "offset": 0}]
    docs = {
        # NOT robots files: robots.txt below the root
        "http://a.example.com/blog/robots.txt": span("Disallow: /decoy"),
        # two genuine robots docs for one host (http + https) -> the
        # min-doc_id one wins deterministically, never an interleaving
        "http://b.example.com/robots.txt": span("User-agent: *\nDisallow: /h"),
        "https://b.example.com/robots.txt": span("User-agent: *\nDisallow: /s"),
    }
    df = spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)
    got = {r["host"]: r["text"] for r in R.robots_texts_from_spans(df).collect()}
    assert got == {"b.example.com": "User-agent: *\nDisallow: /h"}


def test_longest_match_spec():
    rules = [
        ("h.example.com", "/p", False),
        ("h.example.com", "/p/ok", True),
        ("h.example.com", "/tie", False),
        ("h.example.com", "/tie", True),
    ]
    assert robots_disallowed("http://h.example.com/p/x", rules)
    assert not robots_disallowed("http://h.example.com/p/ok/x", rules)
    # tie at equal length -> allow wins
    assert not robots_disallowed("http://h.example.com/tie/x", rules)
    # no matching rule / other host -> allowed
    assert not robots_disallowed("http://h.example.com/other", rules)
    assert not robots_disallowed("http://z.example.com/p/x", rules)
    # legacy 2-tuples still mean disallow
    assert robots_disallowed("http://h.example.com/old", [("h.example.com", "/old")])
    # empty path normalizes to '/'
    assert robots_disallowed("http://h.example.com", [("h.example.com", "/", False)])


def test_gate_table_path_matches_expr_path(spark):
    rules = [
        ("h0.example.com", "/p", False),
        ("h0.example.com", "/p/ok", True),
        ("h1.example.com", "/", False),
    ]
    uris = [
        "http://h0.example.com/p/x",
        "http://h0.example.com/p/ok/y",
        "http://h0.example.com/q",
        "http://h1.example.com/anything",
        "http://h2.example.com/free",
        "http://h0.example.com",
    ]
    df = spark.createDataFrame([(u,) for u in uris], "uri string")
    rules_df = spark.createDataFrame(
        [(h, a, p) for h, p, a in rules], "host string, allow boolean, prefix string"
    )
    via_table = {r["uri"] for r in R.gate(df, "uri", rules_df).collect()}
    expected = {u for u in uris if not robots_disallowed(u, rules)}
    assert via_table == expected


def test_delays_to_budgets_and_rules_tuples(spark):
    delays = spark.createDataFrame(
        [("a", 2.0), ("b", 0.5), ("c", 1000.0)],
        "host string, crawl_delay double",
    )
    assert R.delays_to_budgets(delays, round_seconds=10.0) == (
        ("a", 5),
        ("b", 20),
        ("c", 1),  # liveness floor
    )
    assert R.delays_to_budgets(delays, round_seconds=10.0, base_budget=4) == (
        ("a", 4),
        ("b", 4),
        ("c", 1),
    )
    # Crawl-delay: 0 = "no delay" -> NO override (base applies), not a
    # ZeroDivisionError; port-bearing authorities normalize to the
    # frontier's port-stripped host, smallest budget winning on collision
    edge = spark.createDataFrame(
        [("z", 0.0), ("p.example.com:8080", 5.0), ("p.example.com", 2.0)],
        "host string, crawl_delay double",
    )
    assert R.delays_to_budgets(edge, round_seconds=10.0) == (
        ("p.example.com", 2),  # min(10//5=2, 10//2=5)
    )
    rules = spark.createDataFrame(
        [("h", True, "/ok"), ("h", False, "/")],
        "host string, allow boolean, prefix string",
    )
    assert R.rules_tuples(rules) == (("h", "/", False), ("h", "/ok", True))


CFG = CorpusConfig(n_docs=150)


def _crawl_both(spark, tmp_path, docs, df, seeds, *, robots=None, **kw):
    golden = oracle_crawl(docs, seeds, robots=robots, **kw)
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(robots=tuple(robots or ()), **kw),
    )
    crawler.run(seeds)
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    seen = {(r["uri"], r["depth"]) for r in crawler.seen_df().collect()}
    assert order == golden.order
    assert seen == golden.seen
    return golden


def test_allow_override_crawl_exact_match(spark, tmp_path):
    """Longest-match Allow re-opens a subtree under a Disallow — engine and
    oracle agree on order + seen set; the pagination chain under the
    allowed prefix IS crawled while its siblings are not."""
    docs = generate_local(CFG)
    df = generate_df(spark, CFG, partitions=2)
    seeds = seeds_for(CFG, 3)
    # allow exactly the first seed's own path under a host-wide disallow:
    # the seed is guaranteed enqueued, so the Allow assertion below is
    # non-vacuous by construction
    from scrappy_spark.urlnorm import canonicalize

    seed0 = canonicalize(seeds[0])
    host = seed0.split("://", 1)[1].split("/", 1)[0]
    allowed_prefix = seed0.split(host, 1)[1] or "/"
    robots = [(host, "/", False), (host, allowed_prefix, True)]
    golden = _crawl_both(
        spark, tmp_path, docs, df, seeds, robots=robots, depth=2
    )
    crawled_host_paths = {
        u.split(host, 1)[1] for u, _ in golden.seen if host in u
    }
    assert crawled_host_paths  # the Allow really re-opened something
    assert all(p.startswith(allowed_prefix) for p in crawled_host_paths)


def test_host_budget_overrides_exact_match(spark, tmp_path):
    docs = generate_local(CFG)
    df = generate_df(spark, CFG, partitions=2)
    seeds = seeds_for(CFG, 4)
    hb = {"h000.example.com": 1, "h001.example.com": 3}
    golden = oracle_crawl(
        docs, seeds, depth=2, per_host_budget=2, host_budgets=hb
    )
    base = oracle_crawl(docs, seeds, depth=2, per_host_budget=2)
    assert golden.order != base.order  # the override actually bit
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=2, per_host_budget=2, host_budgets=tuple(sorted(hb.items()))),
    )
    crawler.run(seeds)
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    assert order == golden.order
    assert {(r["uri"], r["depth"]) for r in crawler.seen_df().collect()} == golden.seen


def test_host_budgets_without_base_budget(spark, tmp_path):
    """host_budgets alone: listed hosts capped, others pop whole-frontier."""
    docs = generate_local(CFG)
    df = generate_df(spark, CFG, partitions=2)
    seeds = seeds_for(CFG, 3)
    hb = {"h000.example.com": 1}
    golden = oracle_crawl(docs, seeds, depth=2, host_budgets=hb)
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=2, host_budgets=tuple(hb.items())),
    )
    crawler.run(seeds)
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    assert order == golden.order


def test_robots_end_to_end_from_spans(spark, tmp_path):
    """Capstone: robots.txt documents live IN the interleaved-spans web;
    parse → rules + delay-budgets → crawl must match the oracle under the
    same derived config, and the disallowed subtree is never seen."""
    docs = dict(generate_local(CFG))
    host = "h001.example.com"
    robots_txt = (
        "User-agent: *\n"
        f"Disallow: /\n"
        "User-agent: scrappy\n"
        f"Disallow: /p\n"
        f"Allow: /p4\n"
        "Crawl-delay: 30\n"
    )
    docs[f"http://{host}/robots.txt"] = [
        {"kind": "text", "text": robots_txt, "media_ref": "", "offset": 0}
    ]
    df = spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)
    texts = R.robots_texts_from_spans(df)
    rules = R.rules_tuples(R.parse_robots(texts, agent="scrappy"))
    assert set(rules) == {(host, "/p", False), (host, "/p4", True)}
    budgets = R.delays_to_budgets(
        R.parse_crawl_delays(texts, agent="scrappy"), round_seconds=60.0
    )
    assert budgets == ((host, 2),)

    seeds = seeds_for(CFG, 4)
    golden = oracle_crawl(
        docs,
        seeds,
        depth=2,
        per_host_budget=3,
        robots=list(rules),
        host_budgets=dict(budgets),
    )
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(
            depth=2, per_host_budget=3, robots=rules, host_budgets=budgets
        ),
    )
    crawler.run(seeds)
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    seen = {(r["uri"], r["depth"]) for r in crawler.seen_df().collect()}
    assert order == golden.order
    assert seen == golden.seen
    blocked = [
        u
        for u, _ in seen
        if u.startswith(f"http://{host}/p") and not u.startswith(f"http://{host}/p4")
    ]
    assert blocked == []
