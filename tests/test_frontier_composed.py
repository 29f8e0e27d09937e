"""Composed adversarial frontier-hygiene golden (VERDICT r4 #5).

Each hygiene layer has its own golden; this test exercises ALL FOUR in
one ``Crawler.run`` against the pure-Python oracle under the same derived
config: sitemap-derived seeds, a robots-denied branch (plus a Crawl-delay
budget), a multi-hop redirect chain that lands INSIDE a trap-flagged
host, and a trap-stats budget demotion of that host. The crawl order and
seen set must match the oracle exactly, and every layer is asserted
non-vacuous (removing it changes the crawl).
"""

from scrappy_spark.corpus import (
    DOCUMENTS_SCHEMA,
    CorpusConfig,
    generate_local,
)
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.frontier import redirects as RD
from scrappy_spark.frontier import robots as R
from scrappy_spark.frontier import sitemaps as SM
from scrappy_spark.frontier import traps as TP
from scrappy_spark.oracle import oracle_crawl

CFG = CorpusConfig(n_docs=150)
GOOD_HOST = "h001.example.com"
TRAP_HOST = "trap.example.com"


def _span(kind, text="", href="", off=0):
    return {"kind": kind, "text": text, "media_ref": href, "offset": off}


def _build_docs():
    """Base corpus + trap calendar family + robots.txt + sitemap.xml,
    all living IN the spans web (both engines see the same documents)."""
    docs = dict(generate_local(CFG))

    # 20 calendar pages on the trap host, one URL template
    # (/cal?d=V after value folding), each linking two days ahead —
    # an unbounded-family shape that trap_stats flags by construction
    trap_urls = [
        f"http://{TRAP_HOST}/cal?d=2026-01-{d:02d}" for d in range(1, 21)
    ]
    for i, u in enumerate(trap_urls):
        spans = [_span("text", f"calendar day {i}")]
        for j, nxt in enumerate(trap_urls[i + 1 : i + 3]):
            spans.append(_span("link", "next day", nxt, off=1 + j))
        docs[u] = spans

    # robots.txt on the seed host: deny the /p1 branch for our agent,
    # Crawl-delay 30 (→ budget 2 at 60 s rounds)
    robots_txt = (
        "User-agent: scrappy\n"
        "Disallow: /p1\n"
        "Crawl-delay: 30\n"
    )
    docs[f"http://{GOOD_HOST}/robots.txt"] = [_span("text", robots_txt)]

    # sitemap on the seed host: two real (non-denied) pages, the redirect
    # chain head, and a cross-host loc that must be dropped
    listed = sorted(
        u
        for u in docs
        if u.startswith(f"http://{GOOD_HOST}/")
        and not u.startswith(f"http://{GOOD_HOST}/p1")
        and not u.endswith("robots.txt")
    )[:2]
    hop1 = f"http://{GOOD_HOST}/hop1"
    locs = listed + [hop1, "http://h000.example.com/p0"]
    sitemap = (
        "<urlset>"
        + "".join(f"<url><loc>{u}</loc></url>" for u in locs)
        + "</urlset>"
    )
    docs[f"http://{GOOD_HOST}/sitemap.xml"] = [_span("text", sitemap)]
    return docs, trap_urls, listed, hop1


def test_composed_hygiene_crawl_exact_match(spark, tmp_path):
    docs, trap_urls, listed, hop1 = _build_docs()
    df = spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)

    # --- layer derivation, all from the spans web itself ---------------
    seeds = sorted(r["uri"] for r in SM.sitemap_seeds(df).collect())
    assert seeds == sorted(listed + [hop1])  # cross-host loc dropped

    texts = R.robots_texts_from_spans(df)
    rules = R.rules_tuples(R.parse_robots(texts, agent="scrappy"))
    assert (GOOD_HOST, "/p1", False) in rules
    delay_budgets = dict(
        R.delays_to_budgets(
            R.parse_crawl_delays(texts, agent="scrappy"), round_seconds=60.0
        )
    )
    assert delay_budgets == {GOOD_HOST: 2}

    hop2 = f"http://{GOOD_HOST}/hop2"
    collapsed = RD.collapse_for_config(
        spark.createDataFrame(
            [(hop1, hop2), (hop2, trap_urls[0])], "src string, dst string"
        )
    )
    assert dict(collapsed)[hop1] == trap_urls[0]  # multi-hop collapsed

    # trap stats over the discovered-URL log (here: the known URL space);
    # every flagged host is demoted to 1 pop/round
    stats = TP.trap_stats(
        spark.createDataFrame([(u,) for u in docs], "uri string")
    )
    flagged = sorted(r["host"] for r in stats.where("trap").collect())
    assert TRAP_HOST in flagged
    budgets = dict(delay_budgets)
    for h in flagged:
        budgets[h] = min(budgets.get(h, 1), 1)

    # --- one crawl under ALL layers vs the oracle -----------------------
    kw = dict(depth=2, per_host_budget=3)
    golden = oracle_crawl(
        docs,
        seeds,
        robots=list(rules),
        redirects=dict(collapsed),
        host_budgets=budgets,
        **kw,
    )
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(
            robots=rules,
            redirects=collapsed,
            host_budgets=tuple(sorted(budgets.items())),
            **kw,
        ),
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

    # --- every layer bit (non-vacuity, via the cheap oracle) ------------
    # redirect: the chain head really landed on the trap host's first page
    assert golden.fetches.get(trap_urls[0], 0) >= 1
    # robots: removing the rules changes the crawl, and nothing under the
    # denied branch was ever seen
    assert (
        oracle_crawl(
            docs,
            seeds,
            redirects=dict(collapsed),
            host_budgets=budgets,
            **kw,
        ).order
        != golden.order
    )
    assert not any(
        u.startswith(f"http://{GOOD_HOST}/p1") for u, _ in golden.seen
    )
    # trap demotion: a politeness budget DEFERS pops (the seen set is
    # depth-bound and invariant), so the bite signal is sequencing — the
    # undemoted crawl orders differently, and under demotion the engine
    # never pops more than one trap URL in any round
    undemoted = dict(budgets)
    undemoted[TRAP_HOST] = 10**6
    golden_undemoted = oracle_crawl(
        docs,
        seeds,
        robots=list(rules),
        redirects=dict(collapsed),
        host_budgets=undemoted,
        **kw,
    )
    assert golden_undemoted.order != golden.order
    assert golden_undemoted.seen == golden.seen  # deferral, not drop
    assert any(TRAP_HOST in u for _, u, _ in golden.order)
    rounds = {}
    for r in crawler.order_df().collect():
        if TRAP_HOST in r["uri"]:
            rounds[r["round"]] = rounds.get(r["round"], 0) + 1
    assert rounds and max(rounds.values()) == 1
    # ...and the undemoted crawl really would have popped >1 per round:
    # the first two trap pops' seqs are adjacent in the undemoted order
    trap_seqs = sorted(
        s for s, u, _ in golden_undemoted.order if TRAP_HOST in u
    )
    demoted_seqs = sorted(s for s, u, _ in golden.order if TRAP_HOST in u)
    assert trap_seqs != demoted_seqs
