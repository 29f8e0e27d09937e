"""BM25 retrieval (round 4): the distributed operator must equal an
independent pure-python BM25 on the real table, and the score must
respect tf monotonicity. The exact DuckDB value oracle runs in
test_driver_contract."""

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from scrappy_spark.operators import retrieval
from scrappy_spark.operators.text import tokens_py


def _round6(x: float) -> Decimal:
    """Spark's F.round is HALF_UP; python round() is banker's — mirror
    the engine."""
    return Decimal(str(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)


def _py_bm25_topk(rows, k):
    """Independent reimplementation: the engine's tokenization contract
    (every doc counts, empty text has dl=1), tf/df, HALF_UP
    rounded-decimal term sums, membership by shared term (a zero score
    still occupies a slot), top-k with (score desc, doc_id) ties."""
    toks = {r["doc_id"]: tokens_py(r["text"]) for r in rows}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = Counter()
    tf = {}
    for d, ts in toks.items():
        tf[d] = Counter(ts)
        for t in set(ts):
            df[t] += 1
    out = {}
    for qd, ts in toks.items():
        if qd % retrieval.QUERY_MOD != 0:
            continue
        qterms = set(ts[: retrieval.QUERY_TERMS])
        scores = {}
        for d, dtf in tf.items():
            s = Decimal(0)
            matched = False
            for t in qterms:
                if dtf.get(t):
                    matched = True
                    idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                    term = (
                        idf
                        * (dtf[t] * (retrieval.K1 + 1))
                        / (
                            dtf[t]
                            + retrieval.K1
                            * (
                                1
                                - retrieval.B
                                + retrieval.B * len(toks[d]) / avgdl
                            )
                        )
                    )
                    s += _round6(term)
            if matched:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qd] = [(d, float(s), i + 1) for i, (d, s) in enumerate(ranked)]
    return out


def test_bm25_matches_python_oracle(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    want = _py_bm25_topk(rows, retrieval.TOP_K)
    got = {}
    for r in retrieval.bm25_topk(spark, sf_dir).collect():
        got.setdefault(r["q"], []).append((r["doc_id"], r["bm25"], r["rk"]))
    for q in got:
        got[q].sort(key=lambda x: x[2])
    assert set(got) == set(want) and len(got) > 0
    for q in want:
        assert [(d, rk) for d, _, rk in got[q]] == [
            (d, rk) for d, _, rk in want[q]
        ], q
        for (_, a, _), (_, b, _) in zip(got[q], want[q]):
            assert abs(a - b) < 1e-9


def test_tokens_py_matches_tokens_col_on_edge_cases(spark):
    """The row-side python tokenizer must equal the JVM expression on
    the inputs where python idiom diverges from Java semantics: empty
    strings, non-space leading whitespace, non-breaking spaces, and
    trailing whitespace runs."""
    from pyspark.sql import functions as F

    from scrappy_spark.operators.text import tokens_col

    import random

    cases = ["", " ", "\nfoo bar", "a\xa0b", "foo \n", "  x  ", "a  b\tc"]
    # seeded adversarial sweep: strings mixing words with ASCII and
    # exotic unicode whitespace in every position, checked in ONE batch
    rng = random.Random(7)
    alphabet = ["w", "xy", " ", "  ", "\t", "\n", "\r", "\x0b", "\f",
                "\xa0", " ", "　"]
    cases += [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(500)
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, text string"
    )
    got = {
        r["i"]: r["toks"]
        for r in df.select(
            "i", tokens_col(F.col("text")).alias("toks")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == tokens_py(c), (repr(c), got[i], tokens_py(c))


def test_bm25_tf_monotonic(spark, tmp_path):
    """Same-length docs: more query-term occurrences rank higher; a doc
    without the term is absent."""
    docs = spark.createDataFrame(
        [
            (0, "zeta one two three"),  # query doc: terms zeta one two three
            (1, "zeta zeta filler pad"),
            (2, "zeta other filler pad"),
            (3, "none of these words"),
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "sf")
    docs.write.parquet(path + "/documents.parquet")
    got = {
        r["doc_id"]: r["rk"]
        for r in retrieval.bm25_topk(spark, path).collect()
        if r["q"] == 0
    }
    assert 3 not in got
    assert got[1] < got[2]  # tf=2 beats tf=1 at equal length


def test_bm25_scoring_plan_never_shuffles_tf(spark, sf_dir):
    """The scoring path's joins are ALL broadcast with the model/query
    side as the build side: the corpus-sized tf stream never shuffles
    or hash-builds for scoring (the r5 replica audit caught an unhinted
    df-table join planning a SortMergeJoin that sorted the tf stream on
    the low-cardinality term key)."""
    df = retrieval.bm25_topk(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BuildLeft" not in plan
    assert "CartesianProduct" not in plan
