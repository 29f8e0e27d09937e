"""PageRank fixed-point kernel, exact distributed ranking, PII scrub."""

from collections import defaultdict

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from scrappy_spark.operators import graph, ranking, scrub


# ------------------------------------------------------------- pagerank


def _py_pagerank(edges, iterations=10):
    """Pure-python mirror of the integer fixed-point contract."""
    deg = defaultdict(int)
    for s, _ in edges:
        deg[s] += 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    rank = {n: 10**9 for n in nodes}
    for _ in range(iterations):
        mass = defaultdict(int)
        for s, d in edges:
            mass[d] += (2 * rank[s] + deg[s]) // (2 * deg[s])
        rank = {
            n: 150_000_000 + (170 * mass.get(n, 0) + 100) // 200 for n in nodes
        }
    return rank


def test_pagerank_tiny_graph_exact(spark):
    # 1→2, 1→3, 2→3, 3→1 plus dangling sink 4 (1→4) and source-only 5→1:
    # exercises out-degree split, dangling loss, and no-in-edge reseating
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (1, 4), (5, 1)]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r["node"]: r["rank_i"] for r in graph.pagerank(df).collect()}
    want = _py_pagerank(edges)
    assert got == want
    # node 5 has no in-edges: fixed at the base after iteration 1
    assert got[5] == 150_000_000
    # float rendering is exactly rank_i / 1e9
    row = graph.pagerank(df).where("node = 1").collect()[0]
    assert row["rank"] == row["rank_i"] / 1e9


def test_pagerank_collapses_multi_edges(spark):
    once = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=1)])
    dup = once.unionAll(once)
    a = sorted(graph.pagerank(once).collect())
    b = sorted(graph.pagerank(dup).collect())
    assert a == b


def test_doc_pagerank_matches_python_mirror(spark, sf_dir):
    got = {
        r["doc_id"]: r["rank_i"]
        for r in graph.doc_pagerank(spark, sf_dir).collect()
    }
    ids = [
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n, idset = len(ids), set(ids)
    edges = set()
    for s in ids:
        for j in range(1, 2 + s % graph.LINK_MAXDEG):
            d = (s * graph.LINK_MULT + graph.LINK_STRIDE * j) % n
            if d != s and d in idset:
                edges.add((s, d))
    assert got == _py_pagerank(edges)


# ----------------------------------------------------------- exact_rank


def test_exact_rank_equals_global_window(spark):
    df = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 37) % 101).cast("double").alias("score"),
    )
    ranked = ranking.exact_rank(df, ["score", "doc_id"], num_partitions=8)
    naive = df.withColumn(
        "rank", F.row_number().over(Window.orderBy("score", "doc_id"))
    )
    assert sorted(ranked.collect()) == sorted(naive.collect())
    # and the naive spelling is exactly the single-reducer plan this
    # operator exists to avoid
    assert "SinglePartition" in naive._jdf.queryExecution().executedPlan().toString()


def test_exact_rank_survives_small_arrow_batches(spark):
    # multiple Arrow batches per partition must keep the running offset
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    try:
        df = spark.range(0, 500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 7).alias("score")
        )
        ranked = ranking.exact_rank(df, ["score", "doc_id"], num_partitions=4)
        ranks = sorted(r["rank"] for r in ranked.collect())
        assert ranks == list(range(1, 501))
        top = ranked.orderBy("rank").limit(3).collect()
        assert [r["doc_id"] for r in top] == [0, 7, 14]
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_surprisal_buckets_partition_sizes(spark, sf_dir):
    got = ranking.surprisal_buckets(spark, sf_dir)
    counts = {
        r["bucket"]: r["cnt"]
        for r in got.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(counts.values())
    assert set(counts) == set(ranking.BUCKET_LABELS)
    # integer bucketing splits as evenly as arithmetic allows
    assert max(counts.values()) - min(counts.values()) <= 1
    ranks = [r["rank"] for r in got.collect()]
    assert sorted(ranks) == list(range(1, n + 1))


# ------------------------------------------------------------ PII scrub


def test_scrub_counts_and_redaction(spark):
    rows = [
        Row(doc_id=1, text="mail a.b+c@x-y.co.uk now"),
        Row(doc_id=2, text="at 192.168.0.1 and 10.0.0.255."),
        Row(doc_id=3, text="call +4915512345678 ok"),
        Row(doc_id=4, text="clean text, no pii at all"),
    ]
    got = {
        r["doc_id"]: r
        for r in scrub.pii_scrub(spark.createDataFrame(rows)).collect()
    }
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (1, 0, 0)
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (0, 2, 0)
    assert (got[3]["n_emails"], got[3]["n_ips"], got[3]["n_phones"]) == (0, 0, 1)
    assert (got[4]["n_emails"], got[4]["n_ips"], got[4]["n_phones"]) == (0, 0, 0)
    import hashlib

    assert (
        got[3]["scrub_fp"]
        == hashlib.md5(b"call <PHONE> ok").hexdigest()
    )
    assert (
        got[2]["scrub_fp"]
        == hashlib.md5(b"at <IP> and <IP>.").hexdigest()
    )


def test_scrub_is_shuffle_free(spark, sf_dir):
    plan = (
        scrub.doc_pii_scrub(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_doc_pii_scrub_nonvacuous(spark, sf_dir):
    agg = scrub.doc_pii_scrub(spark, sf_dir).agg(
        F.sum("n_emails").alias("e"),
        F.sum("n_ips").alias("i"),
        F.sum("n_phones").alias("p"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert agg["e"] >= agg["n"] and agg["i"] >= agg["n"] and agg["p"] >= agg["n"]


# ----------------------------------------------- quantiles / heavy hitters


def test_token_quantiles_match_python_mirror(spark, sf_dir):
    from scrappy_spark.operators import textstats

    counts = sorted(
        (r["n_tokens"], r["doc_id"])
        for r in textstats.token_count(spark, sf_dir).collect()
    )
    n = len(counts)
    want = {
        q: (
            (num * n + den - 1) // den,
            counts[(num * n + den - 1) // den - 1][0],
        )
        for q, num, den in ranking.QUANTILES
    }
    got = {
        r["quantile"]: (r["target_rank"], r["n_tokens"])
        for r in ranking.token_count_quantiles(spark, sf_dir).collect()
    }
    assert got == want


def test_heavy_hitters_match_counter(spark, sf_dir):
    from collections import Counter

    from scrappy_spark.operators.text import tokens_py

    c = Counter()
    for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
        c.update(tokens_py(r["text"]) or [])
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: ranking.HEAVY_K]
    rows = sorted(ranking.heavy_hitters(spark, sf_dir).collect(), key=lambda r: r["rk"])
    got = [(r["token"], r["n_occurrences"]) for r in rows]
    assert got == want
    assert [r["rk"] for r in rows] == list(range(1, len(want) + 1))


def test_heavy_hitters_plan_is_take_ordered(spark, sf_dir):
    plan = (
        ranking.heavy_hitters(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrdered" in plan


# ------------------------------------------------------------ edge cases


def test_exact_rank_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("doc_id"), F.col("id").alias("s"))
    ranked = ranking.exact_rank(df, ["s", "doc_id"], num_partitions=4)
    assert ranked.count() == 0


def test_grouped_exact_rank_single_and_empty_groups(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(g="a", v=3), Row(g="a", v=1), Row(g="b", v=2)]
    )
    ranked, totals = ranking.grouped_exact_rank_with_totals(
        df, ["g"], ["v"], num_partitions=4
    )
    got = {(r["g"], r["v"]): r["rank"] for r in ranked.collect()}
    assert got == {("a", 1): 1, ("a", 3): 2, ("b", 2): 1}
    assert totals == {("a",): 2, ("b",): 1}


def test_grouped_exact_rank_mega_group_spans_partitions(spark):
    """The recipe's reason to exist: one group holding ~all rows is
    ranked correctly while being spread over many range partitions."""
    df = spark.range(0, 20_000).select(
        F.when(F.col("id") % 1000 == 0, "tail").otherwise("mega").alias("g"),
        ((F.col("id") * 37) % 50021).alias("v"),
        F.col("id").alias("tb"),
    )
    ranked, totals = ranking.grouped_exact_rank_with_totals(
        df, ["g"], ["v", "tb"], num_partitions=16
    )
    parted = ranked.where("g = 'mega'").select(
        F.spark_partition_id().alias("p")
    )
    # ranks are a permutation of 1..size within each group
    for g, size in ((("mega",), 19_980), (("tail",), 20)):
        assert totals[g] == size
        ranks = sorted(
            r["rank"] for r in ranked.where(F.col("g") == g[0]).collect()
        )
        assert ranks == list(range(1, size + 1))


def test_pagerank_precondition_raises_loudly(spark, monkeypatch):
    from pyspark.sql import Row

    from scrappy_spark.operators import graph as g

    # divisible by damping_den (so the divisibility check passes) and
    # big enough that 2 nodes already exceed the int64 rank bound
    monkeypatch.setattr(g, "SCALE_I", 5 * 10**18)
    df = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=1)])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lower SCALE_I"):
        g.pagerank(df)


def test_pagerank_prioritized_pop_reorders_vs_fifo(spark, sf_dir):
    """Non-vacuity of the centrality-prioritized pop: with budget 2 per
    host, the pagerank-ordered selection differs from FIFO (seq) order,
    and within each host the popped rows carry the host's top-2 ranks."""
    from scrappy_spark.operators import graph as g

    perm = lambda d: (d * g.SEQ_PERM_MULT) % g.SEQ_PERM_MOD
    popped = g.pagerank_prioritized_pop(spark, sf_dir).collect()
    pr = {
        r["doc_id"]: r["rank_i"]
        for r in g.doc_pagerank(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_host = {}
    for r in docs:
        if r["doc_id"] in pr:
            by_host.setdefault(f"h{r['doc_id'] % 7}", []).append(r["doc_id"])
    # expected: top-2 by (-rank_i, arrival seq) per host
    expected = set()
    for host, ids in by_host.items():
        for d in sorted(ids, key=lambda i: (-pr[i], perm(i)))[:2]:
            expected.add((host, perm(d)))
    got = {(r["host"], r["seq"]) for r in popped}
    assert got == expected
    # FIFO (arrival-seq-ordered) top-2 differs -> the priority truly bit
    fifo = {
        (host, perm(d))
        for host, ids in by_host.items()
        for d in sorted(ids, key=perm)[:2]
    }
    assert got != fifo
