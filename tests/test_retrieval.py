"""BM25 retrieval (round 4): the distributed operator must equal an
independent pure-python BM25 on the real table, and the score must
respect tf monotonicity. The exact DuckDB value oracle runs in
test_driver_contract."""

import math
import re
from collections import Counter
from decimal import Decimal

from scrappy_spark.operators import retrieval


def _py_bm25_topk(rows, k):
    """Independent reimplementation: tokenize, tf/df, rounded-decimal
    term sums, top-k with (score desc, doc_id) ties."""
    toks = {
        r["doc_id"]: re.split(r"\s+", r["text"].strip())
        for r in rows
        if r["text"] and r["text"].strip()
    }
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
            for t in qterms:
                if dtf.get(t):
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
                    s += Decimal(str(round(term, 6)))
            if s:
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
