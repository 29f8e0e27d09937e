"""Capstone for the yield-telemetry layer: the full feedback loop
probe crawl → per-host yield telemetry → ``adaptive_budget`` →
``CrawlConfig.host_budgets`` → re-crawl, with the re-crawl matched
EXACTLY against the pure-Python oracle under the derived budgets.

Web shape: a high-yield hub host (every popped page opens fresh
children) and a low-yield dud host (two leaf children, nothing below) —
the budget map must come out of the real probe crawl's order, give the
hub the ceiling and the dud the floor, and the enforced re-crawl must
saturate the hub's budget while the dud idles at one pop per round.
"""

from pyspark.sql import functions as F  # noqa: F401

from scrappy_spark.corpus import DOCUMENTS_SCHEMA
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.frontier.yieldstats import adaptive_budget
from scrappy_spark.oracle import oracle_crawl

HUB = "hub.example.com"
DUD = "dud.example.com"


def _span(kind, text="", href="", off=0):
    return {"kind": kind, "text": text, "media_ref": href, "offset": off}


def _build_docs():
    """hub/p0 → 6 children → 2 grandchildren each (all fresh URLs);
    dud/p0 → 2 leaf children."""
    docs = {}
    hub_children = [f"http://{HUB}/c{i}" for i in range(6)]
    docs[f"http://{HUB}/p0"] = [_span("text", "hub root")] + [
        _span("link", "c", u, off=1 + i) for i, u in enumerate(hub_children)
    ]
    for i, c in enumerate(hub_children):
        kids = [f"http://{HUB}/c{i}/g{j}" for j in range(2)]
        docs[c] = [_span("text", f"child {i}")] + [
            _span("link", "g", u, off=1 + j) for j, u in enumerate(kids)
        ]
        for j, g in enumerate(kids):
            docs[g] = [_span("text", f"leaf {i}.{j}")]
    dud_children = [f"http://{DUD}/c{i}" for i in range(2)]
    docs[f"http://{DUD}/p0"] = [_span("text", "dud root")] + [
        _span("link", "c", u, off=1 + i) for i, u in enumerate(dud_children)
    ]
    for c in dud_children:
        docs[c] = [_span("text", "dud leaf")]
    return docs


def _children(docs, uri):
    return [s["media_ref"] for s in docs.get(uri, []) if s["kind"] == "link"]


def test_adaptive_budget_feedback_loop(spark, tmp_path):
    docs = _build_docs()
    df = spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)
    seeds = [f"http://{HUB}/p0", f"http://{DUD}/p0"]

    # --- 1. probe crawl: flat per-host budget, shallow ------------------
    probe = Crawler(
        spark,
        df,
        str(tmp_path / "probe"),
        CrawlConfig(depth=1, per_host_budget=4),
    )
    probe.run(seeds)
    order = probe.order_df().select("uri", "round").collect()

    # --- 2. telemetry from the REAL probe order: pops per (host, round),
    # new URLs = outlink count of each popped page (every link target in
    # this web is a fresh unique URL, so the attribution is exact) -------
    telemetry = [
        (r["uri"].split("/")[2], 1, len(_children(docs, r["uri"])))
        for r in order
    ]
    tdf = spark.createDataFrame(
        telemetry, "host string, n_pops int, n_new int"
    )

    # --- 3. adaptive budgets: hub rides its yield to the ceiling, the
    # dud's near-zero yield floors it ------------------------------------
    budgets = {
        r["host"]: r["next_budget"]
        for r in adaptive_budget(tdf, base=2, lo=1, hi=4).collect()
    }
    # probe pops: hub p0 (6 new) + 4 of 6 children (2 new each) →
    # 2*14//5 = 5 → ceiling 4; dud p0 + 2 leaves → 2*2//3 = 1
    assert budgets == {HUB: 4, DUD: 1}

    # --- 4. re-crawl under the derived budgets == oracle exactly --------
    golden = oracle_crawl(
        docs, seeds, depth=2, host_budgets=budgets
    )
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "full"),
        CrawlConfig(depth=2, host_budgets=tuple(sorted(budgets.items()))),
    )
    crawler.run(seeds)
    got = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    assert got == golden.order
    assert {
        (r["uri"], r["depth"]) for r in crawler.seen_df().collect()
    } == golden.seen

    # --- 5. enforcement is non-vacuous: the hub saturates its budget in
    # at least one round and never exceeds it; the dud never exceeds 1;
    # the budget defers (nothing dropped): the whole web is crawled ------
    per_round = {}
    for r in crawler.order_df().collect():
        host = r["uri"].split("/")[2]
        per_round[(host, r["round"])] = per_round.get((host, r["round"]), 0) + 1
    hub_counts = [n for (h, _), n in per_round.items() if h == HUB]
    dud_counts = [n for (h, _), n in per_round.items() if h == DUD]
    assert max(hub_counts) == 4 and all(n <= 4 for n in hub_counts)
    assert all(n <= 1 for n in dud_counts)
    assert len(got) == len(docs)  # every page eventually popped
