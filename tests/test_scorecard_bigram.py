"""Kernel tests for the round-5 curation operators: per-host scorecard
and bigram-LM surprisal (operators/textstats.py)."""

import math

from pyspark.sql import functions as F  # noqa: F401

from scrappy_spark.operators import textstats


def _write_docs(spark, tmp_path, rows):
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    path = str(tmp_path / "sf")
    docs.write.parquet(path + "/documents.parquet")
    return path


def test_host_scorecard_values(spark, tmp_path):
    # srcA: 3 docs, one exact-dup pair under the normalization
    # (lowercase + whitespace collapse), langs en/en/de → top en,
    # dup_rate = 10^6*(3-2)//3; srcB: single doc, zero dups
    path = _write_docs(
        spark,
        tmp_path,
        [
            (0, "Hello  World", "en", "srcA"),
            (1, "hello world", "en", "srcA"),
            (2, "drei worte hier", "de", "srcA"),
            (3, "one two three four", "fr", "srcB"),
        ],
    )
    got = {r["source"]: r for r in textstats.host_scorecard(spark, path).collect()}
    a, b = got["srcA"], got["srcB"]
    assert (a["n_docs"], a["total_tokens"], a["n_langs"]) == (3, 7, 2)
    assert abs(a["avg_tokens"] - round(7 / 3, 6)) < 1e-12
    assert a["dup_rate_ppm"] == 333_333
    assert a["top_lang"] == "en"
    assert (b["n_docs"], b["dup_rate_ppm"], b["n_langs"], b["top_lang"]) == (
        1,
        0,
        1,
        "fr",
    )


def test_host_scorecard_top_lang_tiebreak(spark, tmp_path):
    # equal counts: lexicographically smaller lang wins (total order)
    path = _write_docs(
        spark,
        tmp_path,
        [(0, "x", "fr", "s"), (1, "y", "de", "s")],
    )
    [r] = textstats.host_scorecard(spark, path).collect()
    assert r["top_lang"] == "de" and r["n_langs"] == 2


def test_bigram_logprob_hand_computed(spark, tmp_path):
    # corpus bigrams: (a,a), (a,b) from doc0; (a,c) from doc1 —
    # context 'a' occurs 3×, each bigram once → every surprisal ln 3;
    # the 1-token doc has no bigram and drops out
    path = _write_docs(
        spark,
        tmp_path,
        [(0, "a a b", "en", "s"), (1, "a c", "en", "s"), (2, "z", "en", "s")],
    )
    out = {r["doc_id"]: r for r in textstats.bigram_logprob(spark, path).collect()}
    s = round(math.log(3.0), 6)
    assert set(out) == {0, 1}
    assert out[0]["n_bigrams"] == 2
    assert abs(out[0]["bigram_surprisal_sum"] - 2 * s) < 1e-9
    assert abs(out[0]["mean_bigram_surprisal"] - s) < 1e-9
    assert out[1]["n_bigrams"] == 1
    assert abs(out[1]["bigram_surprisal_sum"] - s) < 1e-9


def test_bigram_surprisal_rounding_margin():
    """The unigram libm-caveat guard, for the bigram model: every
    corpus bigram surprisal −ln(c2/c1) at both driver SFs must sit
    clear of a 0.0000005 rounding-grid boundary so a ~1-ulp ln()
    disagreement between engines cannot flip round(·, 6)."""
    import duckdb

    for sf in ("sf0.001", "sf0.01"):
        rows = duckdb.sql(
            f"""
            WITH tokd AS (
              SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
              FROM '/root/testdata/{sf}/documents.parquet'
            ), tok AS (
              SELECT doc_id, unnest(toks) AS t,
                     unnest(range(len(toks))) AS pos
              FROM tokd
            ), big AS (
              SELECT doc_id,
                     lag(t) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
                     t AS w2
              FROM tok QUALIFY w1 IS NOT NULL
            ), c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
            c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1)
            SELECT -ln(c2 / c1) AS s FROM c2 JOIN c1 USING (w1)
            WHERE c2 < c1
            """
        ).fetchall()
        margin = min(abs((s * 1e6) % 1 - 0.5) for (s,) in rows)
        assert margin > 1e-9, (sf, margin)


def test_scorecard_bigram_plan_shapes(spark, sf_dir):
    """Neither kernel plans an Exchange SinglePartition or a cartesian
    product; the scorecard's two host-sized rollups join without a
    sort-merge (AQE broadcast)."""

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    for fn in (textstats.host_scorecard, textstats.bigram_logprob):
        plan = plan_of(fn(spark, sf_dir))
        assert "Exchange SinglePartition" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__

    # bigram formation is map-side from the token array: no Window
    # operator (the lag-window spelling shuffled+sorted the whole token
    # stream for adjacency the array already has — r5 replica audit),
    # and the model join is an explicit broadcast with the MODEL as the
    # build side (an unhinted join broadcast-built the corpus-sided
    # stream off a bad post-explode size estimate)
    from scrappy_spark.operators.retrieval import posting_lists_query

    for fn in (textstats.bigram_logprob, posting_lists_query):
        plan = plan_of(fn(spark, sf_dir))
        assert "Window" not in plan, fn.__name__
    bplan = plan_of(textstats.bigram_logprob(spark, sf_dir))
    uplan = plan_of(textstats.unigram_logprob(spark, sf_dir))
    for p in (bplan, uplan):
        assert "BroadcastHashJoin" in p
        # every join builds the model (right) side — the stream side
        # must never be built into a hash relation
        assert "BuildLeft" not in p
    assert "Window" not in uplan


def test_posting_lists_blocks_and_fingerprints(spark):
    import hashlib

    from scrappy_spark.operators.retrieval import posting_lists

    docs = spark.createDataFrame(
        [(0, "a b a b"), (200, "a b")], "doc_id long, text string"
    )
    got = {
        (r["term"], r["block"]): (r["n_docs"], r["postings_fp"])
        for r in posting_lists(docs, block_span=128).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    # doc 0: bigrams 'a b'×2, 'b a'×1 (block 0); doc 200: 'a b'×1 (block 1)
    assert got == {
        ("a b", 0): (1, md5("0:2")),
        ("b a", 0): (1, md5("0:1")),
        ("a b", 1): (1, md5("200:1")),
    }


def test_vocab_oov_values(spark, tmp_path):
    path = _write_docs(
        spark,
        tmp_path,
        [(0, "x x y z", "en", "s"), (1, "x y q", "en", "s")],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_ppm"])
        for r in textstats.vocab_oov(spark, path, k=2).collect()
    }
    # vocab (count desc, token asc) top-2 = {x, y}; z and q are OOV
    assert got == {0: (4, 1, 250_000), 1: (3, 1, 333_333)}


def test_vocab_oov_nonvacuous_and_plan(spark, sf_dir):
    from scrappy_spark.operators.retrieval import posting_lists_query

    df = textstats.vocab_oov(spark, sf_dir)
    rows = df.collect()
    assert any(r["n_oov"] > 0 for r in rows)  # 31-token vocab, top-16
    assert any(r["n_oov"] == 0 for r in rows) or all(
        r["n_oov"] < r["n_tokens"] for r in rows
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # vocab is a broadcast model table
    for d in (df, posting_lists_query(spark, sf_dir)):
        p = d._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p and "SortMergeJoin" not in p
