"""Eighth-wave kernels: TrustRank seeded propagation (operators/graph.py)
and DUST rule mining (frontier/dust.py). Each test checks a property the
value oracle can't: python-mirror fixed-point equality, spam-cluster
zero-trust semantics, fail-loud edges, partition/multiedge invariance,
and the lcp/lcs overlap cap on adversarial alignments."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from scrappy_spark.frontier import dust
from scrappy_spark.operators import graph


# -------------------------------------------------------------- TrustRank

def _py_trustrank(
    edges,
    seeds,
    iters=graph.ITERATIONS,
    num=graph.DAMPING_NUM,
    den=graph.DAMPING_DEN,
):
    """Pure-python mirror of the exact BIGINT fixed-point loop."""
    s_i = graph.SCALE_I
    base_i = (den - num) * s_i // den
    es = sorted(set(edges))
    deg = {}
    for s, _ in es:
        deg[s] = deg.get(s, 0) + 1
    nodes = sorted({n for e in es for n in e})
    seed = set(seeds) & set(nodes)
    rank = {n: (s_i if n in seed else 0) for n in nodes}
    for _ in range(iters):
        mass = {}
        for s, d in es:
            mass[d] = mass.get(d, 0) + (2 * rank[s] + deg[s]) // (2 * deg[s])
        rank = {
            n: (base_i if n in seed else 0)
            + (2 * num * mass.get(n, 0) + den) // (2 * den)
            for n in nodes
        }
    return rank


def test_trustrank_matches_python_mirror(spark):
    edges = [(f"n{i % 7}", f"n{(i * 3 + 1) % 11}") for i in range(40)]
    edges = [e for e in edges if e[0] != e[1]]
    seeds = ["n0", "n3"]
    got = {
        r["node"]: r["trust_i"]
        for r in graph.trustrank(
            spark.createDataFrame([Row(src=s, dst=d) for s, d in edges]),
            spark.createDataFrame([Row(node=n) for n in seeds]),
        ).collect()
    }
    assert got == _py_trustrank(edges, seeds)


def test_trustrank_spam_cluster_gets_exactly_zero(spark):
    # a link farm unreachable from the seed collects NO trust (the
    # anti-spam point of the algorithm): HALF_UP(0/deg) == 0 exactly,
    # so zero-ness is an invariant of the integer loop, not an epsilon
    edges = [
        ("seed", "good1"),
        ("good1", "good2"),
        ("farm1", "farm2"),
        ("farm2", "farm1"),
        ("farm3", "farm1"),
        # the farm even links OUT to a good page — trust still must not
        # flow backwards into it
        ("farm1", "good1"),
    ]
    rows = {
        r["node"]: r
        for r in graph.trustrank(
            spark.createDataFrame([Row(src=s, dst=d) for s, d in edges]),
            spark.createDataFrame([Row(node="seed")]),
        ).collect()
    }
    assert rows["farm1"]["trust_i"] == 0
    assert rows["farm2"]["trust_i"] == 0
    assert rows["farm3"]["trust_i"] == 0
    assert rows["seed"]["trust_i"] > 0
    assert rows["good1"]["trust_i"] > 0 and rows["good2"]["trust_i"] > 0


def test_trustrank_no_seed_in_graph_fails_loud(spark):
    e = spark.createDataFrame([Row(src="a", dst="b")])
    with pytest.raises(ValueError, match="no seed is a graph node"):
        graph.trustrank(e, spark.createDataFrame([Row(node="zzz")]))


def test_trustrank_partition_and_multiedge_invariant(spark):
    edges = [
        Row(src=f"n{i % 5}", dst=f"n{(i * 7 + 2) % 9}") for i in range(30)
    ]
    edges = [e for e in edges if e.src != e.dst]
    seeds = spark.createDataFrame([Row(node="n0"), Row(node="n2")])
    a = sorted(
        map(
            tuple,
            graph.trustrank(spark.createDataFrame(edges), seeds).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            graph.trustrank(
                spark.createDataFrame(edges + edges).repartition(5),
                seeds.unionAll(seeds),
            ).collect(),
        )
    )
    assert a == b


def test_trustrank_bounded_by_pagerank(spark):
    # the seed base is pointwise <= pagerank's uniform base, and the
    # propagation operator is monotone in the integer loop, so trust
    # never exceeds rank — the bound the overflow precondition relies on
    edges = [
        Row(src=f"n{i % 6}", dst=f"n{(i * 5 + 1) % 8}") for i in range(25)
    ]
    edges = [e for e in edges if e.src != e.dst]
    e = spark.createDataFrame(edges)
    pr = {r["node"]: r["rank_i"] for r in graph.pagerank(e).collect()}
    tr = {
        r["node"]: r["trust_i"]
        for r in graph.trustrank(
            e, spark.createDataFrame([Row(node="n0")])
        ).collect()
    }
    assert set(tr) == set(pr)
    assert all(tr[n] <= pr[n] for n in tr)


# ------------------------------------------------------------------ DUST

def test_dust_pairs_bucket_cap_drops_whole_group(spark):
    rows = [Row(uri=f"u{i:03d}", fingerprint=1) for i in range(5)] + [
        Row(uri=f"v{i:03d}", fingerprint=2) for i in range(3)
    ]
    pairs = dust.duplicate_url_pairs(
        spark.createDataFrame(rows), max_bucket=4
    ).collect()
    # fp 1 (5 uris > cap 4) dropped whole; fp 2 yields C(3,2)=3 pairs,
    # each in canonical uri_a < uri_b direction
    assert len(pairs) == 3
    assert all(p["uri_a"] < p["uri_b"] and p["uri_a"][0] == "v" for p in pairs)


def test_dust_alignment_overlap_cap(spark):
    # 'aab' vs 'ab': lcp=1 claims the leading 'a'; the raw suffix scan
    # also matches 2 ('ab') — uncapped, prefix and suffix double-claim.
    # The cap yields the correct rule 'a' -> ''.
    p = spark.createDataFrame([Row(uri_a="aab", uri_b="ab")])
    rules = dust.dust_rules(p, min_support=1).collect()
    assert [(r["alpha"], r["beta"], r["support"]) for r in rules] == [
        ("a", "", 1)
    ]


def test_dust_strict_prefix_pair(spark):
    # session-id alias: the shorter uri IS the prefix; lcs must be
    # capped to 0 (nothing left after the prefix on the short side);
    # direction normalized longer->shorter: the alias middle is the
    # rewrite SOURCE
    p = spark.createDataFrame(
        [Row(uri_a="http://x/a/1", uri_b="http://x/a/1?session=s1")]
    )
    rules = dust.dust_rules(p, min_support=1).collect()
    assert [(r["alpha"], r["beta"]) for r in rules] == [("?session=s1", "")]


def test_dust_opposite_direction_minings_pool_support(spark):
    # the same logical delete-'a' rule mined from opposite pair shapes
    # (review r5): support must aggregate on the NORMALIZED key, not
    # split across ('a','') and ('','a') and fall under min_support
    p = spark.createDataFrame(
        [
            Row(uri_a="http://h/xab", uri_b="http://h/xb"),
            Row(uri_a="http://h/yb", uri_b="http://h/yba"),
        ]
    )
    rules = dust.dust_rules(p, min_support=2).collect()
    assert [(r["alpha"], r["beta"], r["support"]) for r in rules] == [
        ("a", "", 2)
    ]


def test_dust_identical_uri_pair_fails_loud(spark):
    p = spark.createDataFrame([Row(uri_a="http://x/a", uri_b="http://x/a")])
    with pytest.raises(ValueError, match="uri_a == uri_b"):
        dust.dust_rules(p, min_support=1)


def test_dust_delta_pools_exactly_like_full_mining(spark):
    # pair mining is per-pair independent, so counts(history pairs)
    # merged with counts(delta pairs) must equal counts(all pairs)
    # value-for-value — the exactness contract of the O(delta) shape
    rows = []
    for d in range(40):
        art = f"http://m{d % 5}.example.org/art/{d}"
        rows.append(Row(fingerprint=d, uri=art))
        rows.append(Row(fingerprint=d, uri=f"{art}?session=s{d % 7}"))
    all_v = spark.createDataFrame(rows)
    hist_v = all_v.where("fingerprint % 4 != 0")
    delta_v = all_v.where("fingerprint % 4 = 0")
    full = {
        (r["alpha"], r["beta"]): r["support"]
        for r in dust.dust_rules(dust.duplicate_url_pairs(all_v)).collect()
    }
    pooled = {
        (r["alpha"], r["beta"]): r["support"]
        for r in dust.dust_rules_delta(
            dust.dust_rule_counts(dust.duplicate_url_pairs(hist_v)),
            dust.duplicate_url_pairs(delta_v),
        ).collect()
    }
    assert pooled == full and full


def test_dust_delta_new_rule_flag(spark):
    # history support 1 (< floor) + delta 1 -> surfaces WITH new_rule;
    # history support 2 + delta 1 -> pooled 3, NOT new; history-only
    # rule at the floor survives, NOT new
    def pairs(rows):
        return spark.createDataFrame(
            [Row(uri_a=a, uri_b=b) for a, b in rows]
        )

    hist = dust.dust_rule_counts(
        pairs(
            [
                ("http://h/a1", "http://h/a1?s=x"),   # ('?s=x','') x1
                ("http://h/b1", "http://h/b1/print"),  # ('/print','') x1
                ("http://h/b2", "http://h/b2/print"),  # -> x2
                ("http://h/c1", "http://h/c1?old=1"),  # ('?old=1','') x1
                ("http://h/c2", "http://h/c2?old=1"),  # -> x2
            ]
        )
    )
    out = {
        (r["alpha"], r["beta"]): (r["support"], r["new_rule"])
        for r in dust.dust_rules_delta(
            hist,
            pairs(
                [
                    ("http://h/a9", "http://h/a9?s=x"),
                    ("http://h/b9", "http://h/b9/print"),
                ]
            ),
        ).collect()
    }
    assert out == {
        ("?s=x", ""): (2, True),
        ("/print", ""): (3, False),
        ("?old=1", ""): (2, False),
    }


def test_dust_recovers_alias_families(spark):
    # 35 docs through the entry's synthesis shape: supports are exact
    # (7 session residues x 5 docs each; 7 print docs; 12 CMS docs) and
    # every id-bearing cross-family middle dies below min_support=2
    n = 35
    rows = []
    for d in range(n):
        base = f"http://m{d % 40}.example.org/"
        art = f"{base}art/{d}"
        rows.append(Row(fingerprint=d, uri=art))
        rows.append(Row(fingerprint=d, uri=f"{art}?session=s{d % 7}"))
        if d % 3 == 0:
            rows.append(Row(fingerprint=d, uri=f"{base}index.php?id={d}"))
        if d % 5 == 0:
            rows.append(Row(fingerprint=d, uri=f"{art}/print"))
    pairs = dust.duplicate_url_pairs(spark.createDataFrame(rows))
    got = {
        (r["alpha"], r["beta"]): r["support"]
        for r in dust.dust_rules(pairs).collect()
    }
    expected = {(f"?session=s{k}", ""): 5 for k in range(7)}
    expected[("/print", "")] = 7
    expected[("index.php?id=", "art/")] = 12
    assert got == expected
