"""Ninth-wave kernels: host spam-mass signal (rank-share vs trust-share
disparity) and DUST rule application (frontier canonicalization). Tests
cover the share arithmetic against a python replica over the REAL
constituent outputs, the rule direction/selection total order, literal
replace semantics, and the mine→canonicalize full circle."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from scrappy_spark.frontier import dust
from scrappy_spark.operators import graph


# -------------------------------------------------------------- spam mass

def test_spam_signal_matches_share_arithmetic(spark, sf_dir):
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    pr = {
        r["doc_id"]: r["rank_i"]
        for r in graph.doc_pagerank(spark, sf_dir, docs).collect()
    }
    tr = {
        r["doc_id"]: r["trust_i"]
        for r in graph.doc_trustrank(spark, sf_dir, docs).collect()
    }
    assert set(pr) == set(tr) and pr
    rsum, tsum, nn = {}, {}, {}
    for d, ri in pr.items():
        h = f"h{d % graph.SPAM_HOST_MOD}"
        rsum[h] = rsum.get(h, 0) + ri
        tsum[h] = tsum.get(h, 0) + tr[d]
        nn[h] = nn.get(h, 0) + 1
    rt, tt = sum(rsum.values()), sum(tsum.values())
    expected = {}
    for h in rsum:
        rs = (2 * 10**6 * rsum[h] + rt) // (2 * rt)
        ts = (2 * 10**6 * tsum[h] + tt) // (2 * tt)
        expected[h] = (nn[h], rs, ts, rs - ts)
    got = {
        r["host"]: (
            r["n_nodes"],
            r["rank_share_ppm"],
            r["trust_share_ppm"],
            r["spam_signal_ppm"],
        )
        for r in graph.host_spam_signal(spark, sf_dir, docs).collect()
    }
    assert got == expected


def test_spam_signal_shares_sum_to_one_million(spark, sf_dir):
    docs = spark.range(0, 80).select(F.col("id").alias("doc_id"))
    rows = graph.host_spam_signal(spark, sf_dir, docs).collect()
    n = len(rows)
    # HALF_UP slack: one ppm unit per host on each axis
    assert abs(sum(r["rank_share_ppm"] for r in rows) - 10**6) <= n
    assert abs(sum(r["trust_share_ppm"] for r in rows) - 10**6) <= n
    # signals are a zero-sum ledger up to the same slack
    assert abs(sum(r["spam_signal_ppm"] for r in rows)) <= 2 * n


# ------------------------------------------------------- DUST application

def _canon(spark, urls, rules):
    u = spark.createDataFrame([Row(uri=x) for x in urls])
    r = spark.createDataFrame(
        [Row(alpha=a, beta=b, support=s) for a, b, s in rules]
    )
    return {
        row["uri"]: (
            row["canon_uri"],
            row["rule_src"],
            row["rule_dst"],
            row["applied"],
        )
        for row in dust.canonicalize(u, r).collect()
    }


def test_canonicalize_direction_is_longer_to_shorter(spark):
    # mined as ('', '?session=s1'): rewriting must STRIP the suffix,
    # never mint it
    got = _canon(
        spark,
        ["http://x/a?session=s1", "http://x/b"],
        [("", "?session=s1", 5)],
    )
    assert got["http://x/a?session=s1"] == (
        "http://x/a",
        "?session=s1",
        "",
        True,
    )
    assert got["http://x/b"] == ("http://x/b", None, None, False)


def test_canonicalize_best_rule_total_order(spark):
    # higher support wins; at equal support the longer src wins
    got = _canon(
        spark,
        ["http://x/art/1?session=s1"],
        [("", "?session=s1", 3), ("art/", "a/", 9)],
    )
    assert got["http://x/art/1?session=s1"] == (
        "http://x/a/1?session=s1",
        "art/",
        "a/",
        True,
    )
    got2 = _canon(
        spark,
        ["http://x/art/1?s=1"],
        [("", "?s=1", 3), ("", "t/1?s=1", 3)],
    )
    assert got2["http://x/art/1?s=1"] == (
        "http://x/ar",
        "t/1?s=1",
        "",
        True,
    )


def test_canonicalize_single_splice_first_occurrence(spark):
    # ONE positional splice at the first valid match — a second
    # occurrence is content, not addressing, and stays untouched
    got = _canon(spark, ["http://x/pp/a/pp"], [("", "pp", 2)])
    assert got["http://x/pp/a/pp"] == ("http://x//a/pp", "pp", "", True)


def test_canonicalize_boundary_guard_blocks_token_prefix(spark):
    # review r5: '?session=s1' must NOT rewrite '?session=s10' (the
    # match continues the token); the exact alias still rewrites, and a
    # delimiter-ending src (the CMS infix rule) needs no guard even
    # though digits follow its match
    got = _canon(
        spark,
        [
            "http://x/a?session=s10",
            "http://x/a?session=s1",
            "http://x/art/7",
        ],
        [("?session=s1", "", 9), ("art/", "A/", 2)],
    )
    assert got["http://x/a?session=s1"] == (
        "http://x/a",
        "?session=s1",
        "",
        True,
    )
    assert got["http://x/art/7"] == ("http://x/A/7", "art/", "A/", True)
    # the s10 URL matches neither rule source validly except 'art/'…
    # which it does not contain — so it keeps itself
    assert got["http://x/a?session=s10"] == (
        "http://x/a?session=s10",
        None,
        None,
        False,
    )


def test_canonicalize_empty_rules_identity(spark):
    u = spark.createDataFrame([Row(uri="http://x/a")])
    r = spark.createDataFrame(
        [], "alpha string, beta string, support bigint"
    )
    rows = dust.canonicalize(u, r).collect()
    assert [tuple(x) for x in rows] == [
        ("http://x/a", "http://x/a", None, None, False)
    ]


def test_canonicalize_full_circle_collapses_sessions(spark):
    # mine rules from the synthesized aliases, apply them back: every
    # session alias canonicalizes to its bare article URL
    n = 35
    rows = []
    for d in range(n):
        art = f"http://m{d % 40}.example.org/art/{d}"
        rows.append(Row(fingerprint=d, uri=art))
        rows.append(Row(fingerprint=d, uri=f"{art}?session=s{d % 7}"))
    variants = spark.createDataFrame(rows)
    rules = dust.dust_rules(dust.duplicate_url_pairs(variants))
    out = dust.canonicalize(variants.select("uri").distinct(), rules)
    got = {r["uri"]: r["canon_uri"] for r in out.collect()}
    for d in range(n):
        art = f"http://m{d % 40}.example.org/art/{d}"
        assert got[art] == art
        assert got[f"{art}?session=s{d % 7}"] == art
