"""Kernel tests for the round-5 operators: anchor-text aggregation,
host-graph rollup, recrawl scheduling, int8 embedding quantization, and
the canonicalize-query collapse semantics."""

import math

import pytest
from pyspark.sql import functions as F

from scrappy_spark.frontier.recrawl import recrawl_schedule, snapshot_diff
from scrappy_spark.operators.webgraph import anchor_topk, host_graph


def test_snapshot_diff_all_four_statuses(spark):
    old = spark.createDataFrame(
        [
            ("h1/a", "h1", "f1"),  # unchanged
            ("h1/b", "h1", "f2"),  # changed
            ("h2/c", "h2", "f3"),  # removed (host must come from OLD)
        ],
        "url string, host string, fingerprint string",
    )
    new = spark.createDataFrame(
        [
            ("h1/a", "h1", "f1"),
            ("h1/b", "h1", "f2x"),
            ("h3/d", "h3", "f4"),  # added (host must come from NEW)
        ],
        "url string, host string, fingerprint string",
    )
    got = {
        (r["host"], r["status"]): r["n_pages"]
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        ("h1", "unchanged"): 1,
        ("h1", "changed"): 1,
        ("h2", "removed"): 1,
        ("h3", "added"): 1,
    }


def test_anchor_topk_rank_and_inlinks(spark):
    links = spark.createDataFrame(
        # t1: 'nav' ×3, 'buy' ×2, 'go' ×1, 'zz' ×1 → top-3 cuts 'zz'
        [("s1", "t1", "nav")] * 3
        + [("s2", "t1", "buy")] * 2
        + [("s3", "t1", "go"), ("s4", "t1", "zz")]
        # t2: two anchors tied at 1 → rank by anchor text
        + [("s1", "t2", "beta"), ("s2", "t2", "alpha")],
        "src string, dst string, anchor string",
    )
    got = {
        (r["dst"], r["rk"]): (r["anchor"], r["n"], r["inlinks"])
        for r in anchor_topk(links, k=3).collect()
    }
    assert got[("t1", 1)] == ("nav", 3, 7)
    assert got[("t1", 2)] == ("buy", 2, 7)
    assert got[("t1", 3)] == ("go", 1, 7)  # 'zz' ties on n, loses on text
    assert ("t1", 4) not in got
    assert got[("t2", 1)] == ("alpha", 1, 2)
    assert got[("t2", 2)] == ("beta", 1, 2)


def test_host_graph_drops_intra_host_and_counts_distinct(spark):
    links = spark.createDataFrame(
        [
            ("p1", "q1", "a", "b"),
            ("p1", "q2", "a", "b"),
            ("p2", "q1", "a", "b"),
            ("p3", "p4", "a", "a"),  # intra-host: dropped
            ("q1", "p1", "b", "a"),
        ],
        "src string, dst string, src_host string, dst_host string",
    )
    got = {
        (r["src_host"], r["dst_host"]): (
            r["n_links"],
            r["n_src_pages"],
            r["n_dst_pages"],
        )
        for r in host_graph(links).collect()
    }
    assert got == {("a", "b"): (3, 2, 2), ("b", "a"): (1, 1, 1)}


def test_recrawl_schedule_tiers_and_tiebreak(spark):
    rows = []
    # page A: fp flips every fetch (4 fetches, 3 changes) → hourly
    for i, fp in enumerate([1, 2, 1, 2]):
        rows.append(("A", float(i), i, fp))
    # page B: static (3 fetches, 0 changes) → weekly
    for i in range(3):
        rows.append(("B", float(i), i, 7))
    # page C: single fetch → cold
    rows.append(("C", 0.0, 0, 1))
    # page D: 11 fetches, exactly 1 change → 10*1 >= 10 → daily
    for i in range(11):
        rows.append(("D", float(i), i, 0 if i < 5 else 1))
    # page E: EQUAL timestamps, order totals on the tiebreak id —
    # fps by id are [1, 1, 2] → 1 change; reversed insertion order
    rows += [("E", 9.0, 2, 2), ("E", 9.0, 0, 1), ("E", 9.0, 1, 1)]
    fetches = spark.createDataFrame(
        rows, "page string, t double, fid int, fp int"
    )
    got = {
        r["page"]: (
            r["n_fetches"],
            r["n_changes"],
            r["change_rate_ppm"],
            r["schedule"],
        )
        for r in recrawl_schedule(
            fetches, key="page", ts="t", fp="fp", tiebreak="fid"
        ).collect()
    }
    assert got["A"] == (4, 3, 1_000_000, "hourly")
    assert got["B"] == (3, 0, 0, "weekly")
    assert got["C"] == (1, 0, 0, "cold")
    assert got["D"] == (11, 1, 100_000, "daily")
    assert got["E"] == (3, 1, 500_000, "hourly")


def test_int8_quantization_bounds_and_fidelity(spark, sf_dir):
    from scrappy_spark.operators.similarity import (
        _emb,
        cosine_topk,
        int8_quantized,
        int8_topk,
    )

    qt = int8_quantized(_emb(spark, sf_dir))
    stats = qt.select(
        F.min(F.array_min("q")).alias("lo"),
        F.max(F.array_max("q")).alias("hi"),
        # every vector hits ±127 at its max-|v| coordinate by construction
        F.min(F.array_max(F.transform("q", lambda x: F.abs(x)))).alias(
            "peak_min"
        ),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert -127 <= stats["lo"] and stats["hi"] <= 127
    assert stats["peak_min"] == 127
    assert stats["n"] == _emb(spark, sf_dir).count()  # no zero vectors here

    # fidelity: quantized cosine within 0.02 of exact cosine on the
    # top-k pairs (64-dim int8 keeps ~2 decimal digits)
    exact = {
        (r["q"], r["vec_id"]): r["cosine"]
        for r in cosine_topk(spark, sf_dir).collect()
    }
    quant = {
        (r["q"], r["vec_id"]): r["qcosine"]
        for r in int8_topk(spark, sf_dir).collect()
    }
    shared = set(exact) & set(quant)
    assert len(shared) >= 15  # top-5 lists mostly agree
    assert all(
        math.isclose(exact[k], quant[k], abs_tol=0.02) for k in shared
    )


def test_int8_drops_zero_vectors(spark):
    from scrappy_spark.operators.similarity import int8_quantized

    emb = spark.createDataFrame(
        [(0, [0.5, -1.0]), (1, [0.0, 0.0])],
        "vec_id long, v array<double>",
    )
    got = {r["vec_id"]: r["q"] for r in int8_quantized(emb).collect()}
    assert set(got) == {0}
    assert got[0] == [64, -127]  # floor(0.5*127 + 0.5) = 64


def test_url_canonicalize_collapses_variants(spark, sf_dir):
    from scrappy_spark.operators.relational import f10_url_canonicalize
    from scrappy_spark.urlnorm import canonicalize

    out = f10_url_canonicalize(spark, sf_dir)
    rows = {r["canonical_uri"]: r["n_variants"] for r in out.collect()}
    # python-spec cross-check on one doc: doc_id=2 keeps variants
    # i=0,2,3,5 ((2+i)%3>0) → canonical collapses 0,2,3; query+bare split
    base = [r for r in rows if r.endswith("/d/2")]
    assert len(base) == 1 and rows[base[0]] == 3
    assert rows[canonicalize("doc2")] == 1
    # every canonical is a fixed point of the python canonicalizer
    sample = list(rows)[:50]
    assert all(canonicalize(u) == u for u in sample)


@pytest.mark.parametrize(
    "messy,canon",
    [
        ("  HTTP://A.Example.COM:80/x ", "http://a.example.com/x"),
        ("https://h.com:443/p?q=1#f", "https://h.com/p?q=1"),
        ("word", "http://word.com/"),
        ("h.com/p#frag", "http://h.com/p"),
    ],
)
def test_canonicalize_col_spec_cases(spark, messy, canon):
    from scrappy_spark.urlnorm import canonicalize, canonicalize_col

    df = spark.createDataFrame([(messy,)], "u string")
    got = df.select(canonicalize_col(F.col("u")).alias("c")).collect()[0]["c"]
    assert got == canon == canonicalize(messy)


def test_round5_plan_shapes(spark, sf_dir):
    """Lock the PLANS.md claims for the round-5 kernels: canonicalize and
    recrawl are ONE-Exchange plans (recrawl's window and rollup share the
    page-key partitioning); int8 top-k moves data through exactly one
    hash Exchange (the per-query window) plus the query broadcast; none
    of them contains a sort-merge or cartesian join."""
    from scrappy_spark.frontier.recrawl import recrawl_schedule_query
    from scrappy_spark.operators.relational import f10_url_canonicalize
    from scrappy_spark.operators.similarity import int8_topk

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    for fn, n_hash in (
        (f10_url_canonicalize, 1),
        (recrawl_schedule_query, 1),
        (int8_topk, 1),
    ):
        plan = plan_of(fn(spark, sf_dir))
        got = plan.count("Exchange hashpartitioning")
        assert got == n_hash, f"{fn.__name__}: {got} hash exchanges\n{plan[:1500]}"
        assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
        assert "Exchange SinglePartition" not in plan, fn.__name__


def test_snapshot_diff_presence_not_fp_nullness(spark):
    """Presence comes from join-side markers: a page in BOTH snapshots
    with a NULL fingerprint on one side is 'changed', both-NULL is
    'unchanged' — never added/removed (review r5)."""
    old = spark.createDataFrame(
        [("h1/a", "h1", None), ("h1/b", "h1", None)],
        "url string, host string, fingerprint string",
    )
    new = spark.createDataFrame(
        [("h1/a", "h1", "f1"), ("h1/b", "h1", None)],
        "url string, host string, fingerprint string",
    )
    got = {
        (r["host"], r["status"]): r["n_pages"]
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {("h1", "changed"): 1, ("h1", "unchanged"): 1}


def test_recrawl_schedule_null_fp_fails_loud(spark):
    import pytest

    from scrappy_spark.frontier.recrawl import recrawl_schedule

    fetches = spark.createDataFrame(
        [("p", 1, "a"), ("p", 2, None)],
        "uri string, ts int, fingerprint string",
    )
    with pytest.raises(Exception, match="NULL fingerprint"):
        recrawl_schedule(fetches, key="uri", ts="ts", fp="fingerprint").collect()
