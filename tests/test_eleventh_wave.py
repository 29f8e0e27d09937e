"""Eleventh-wave kernel: OPIC (Abiteboul et al., WWW 2003) — online page
importance driven by the crawl's pop schedule. Tests: python-mirror
fixed-point equality, cash conservation on dangling-free graphs, history
monotonicity for unpopped nodes, fail-loud schedule validation, and
partition/multiedge invariance."""

import pytest
from pyspark.sql import Row

from scrappy_spark.operators import graph


def _py_opic(edges, pops, rounds):
    s_i = graph.SCALE_I
    es = sorted(set(edges))
    deg = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted({n for e in es for n in e})
    sched = {n: r for n, r in pops if n in set(nodes)}
    cash = {n: s_i for n in nodes}
    hist = {n: 0 for n in nodes}
    for r in range(1, rounds + 1):
        popped = {n for n, rr in sched.items() if rr == r}
        inflow = {}
        for s, d in es:
            if s in popped and cash[s] > 0:
                inflow[d] = inflow.get(d, 0) + (2 * cash[s] + deg[s]) // (
                    2 * deg[s]
                )
        hist = {
            n: hist[n] + (cash[n] if n in popped else 0) for n in nodes
        }
        cash = {
            n: (0 if n in popped else cash[n]) + inflow.get(n, 0)
            for n in nodes
        }
    return {
        n: (hist[n], cash[n], hist[n] + cash[n]) for n in nodes
    }


def _run(spark, edges, pops, rounds):
    return {
        r["node"]: (r["hist_i"], r["cash_i"], r["opic_i"])
        for r in graph.opic(
            spark.createDataFrame([Row(src=s, dst=d) for s, d in edges]),
            spark.createDataFrame([Row(node=n, round=x) for n, x in pops]),
            rounds,
        ).collect()
    }


def test_opic_matches_python_mirror(spark):
    edges = [(f"n{i % 6}", f"n{(i * 5 + 2) % 9}") for i in range(30)]
    edges = [e for e in edges if e[0] != e[1]]
    nodes = sorted({n for e in edges for n in e})
    pops = [(n, 1 + (i * 3) % 4) for i, n in enumerate(nodes)]
    assert _run(spark, edges, pops, 4) == _py_opic(edges, pops, 4)


def test_opic_cash_conserved_without_dangling(spark):
    # a cycle has no dangling node: every distributed unit lands
    # somewhere, so total cash is conserved up to HALF_UP slack
    # (one half-unit per traversed edge) and total history equals the
    # total cash ever spent
    edges = [(f"c{i}", f"c{(i + 1) % 5}") for i in range(5)]
    pops = [(f"c{i}", 1 + i % 3) for i in range(5)]
    got = _run(spark, edges, pops, 3)
    total_cash = sum(v[1] for v in got.values())
    assert abs(total_cash - 5 * graph.SCALE_I) <= 3 * 5
    assert all(v[0] > 0 for v in got.values())  # everyone popped once


def test_opic_unpopped_node_accumulates_only(spark):
    # 'sink' never pops: zero history, cash grows past its initial unit
    edges = [("a", "sink"), ("b", "sink"), ("a", "b")]
    pops = [("a", 1), ("b", 2)]
    got = _run(spark, edges, pops, 2)
    assert got["sink"][0] == 0
    assert got["sink"][1] > graph.SCALE_I
    # a spent all in round 1: zero cash unless someone paid it back (no)
    assert got["a"][1] == 0 and got["a"][0] == graph.SCALE_I


def test_opic_out_of_range_round_fails_loud(spark):
    with pytest.raises(ValueError, match="outside 1"):
        _run(spark, [("a", "b")], [("a", 7)], 3)


def test_opic_duplicate_schedule_fails_loud(spark):
    # a node in two rounds would duplicate its state row through the
    # schedule join — doubled cash, duplicate output (review r5)
    with pytest.raises(ValueError, match="more than one round"):
        _run(spark, [("a", "b"), ("b", "c")], [("a", 1), ("a", 2)], 3)


def test_opic_partition_and_multiedge_invariant(spark):
    edges = [(f"n{i % 5}", f"n{(i * 7 + 1) % 8}") for i in range(25)]
    edges = [e for e in edges if e[0] != e[1]]
    nodes = sorted({n for e in edges for n in e})
    pops = [(n, 1 + (i % 3)) for i, n in enumerate(nodes)]
    a = _run(spark, edges, pops, 3)
    b = {
        r["node"]: (r["hist_i"], r["cash_i"], r["opic_i"])
        for r in graph.opic(
            spark.createDataFrame(
                [Row(src=s, dst=d) for s, d in edges + edges]
            ).repartition(5),
            spark.createDataFrame(
                [Row(node=n, round=x) for n, x in pops + pops]
            ),
            3,
        ).collect()
    }
    assert a == b
