"""Learning layer (A-5..A-9, reference lib/scrappy/learning/): optimizer
score, fragment signature/distance/merge, hill-climb with the rollback
guard, LCP URI generalization, and the span-sequence trainer."""

import math

from pyspark.sql import functions as F

from scrappy_spark import learning
from scrappy_spark.corpus import DOCUMENTS_SCHEMA
from scrappy_spark.extractor.extract import extract_triples
from scrappy_spark.extractor.kb import Fragment, Selector
from scrappy_spark.operators import metrics


def _sp(kind, text, offset, media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _docs_df(spark, docs):
    rows = [
        (
            uri,
            [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans],
        )
        for uri, spans in docs.items()
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


# ---------------------------------------------------------------- A-5


def test_optimizer_score_mean_over_samples(spark):
    golden = spark.createDataFrame(
        [("d1", "d1", "p", "x"), ("d1", "d1", "p", "y"), ("d2", "d2", "p", "z")],
        "sample string, s string, p string, o string",
    )
    extracted = spark.createDataFrame(
        [("d1", "d1", "p", "x"), ("d2", "d2", "p", "z"), ("d2", "d2", "p", "w")],
        "sample string, s string, p string, o string",
    )
    per = {
        r["sample"]: r
        for r in learning.prf_by_sample(golden, extracted).collect()
    }
    # d1: right=1, |g|=2, |e|=1 -> P=1, R=.5, F=2/3
    assert math.isclose(per["d1"]["fscore"], 2 / 3)
    # d2: right=1, |g|=1, |e|=2 -> P=.5, R=1, F=2/3
    assert math.isclose(per["d2"]["fscore"], 2 / 3)
    row = learning.optimizer_score(golden, extracted).collect()[0]
    assert math.isclose(row["score"], round(2 / 3, 6), abs_tol=1e-6)
    assert row["n_samples"] == 2
    # extractors are scored on recall (optimizer.rb:310-324)
    rec = learning.optimizer_score(golden, extracted, metric="recall").collect()[0]
    assert math.isclose(rec["score"], 0.75)


# ------------------------------------------------------------- A-6 / A-7


def _price_kb():
    def root(fid, lo, hi):
        return Fragment(
            fid=fid,
            selectors=(Selector(type="base_uri"),),
            identifier=(Selector(type="base_uri"),),
            subfragments=(
                Fragment(
                    fid=f"{fid}_lit",
                    selectors=(
                        Selector(
                            type="range",
                            min_offset=lo,
                            max_offset=hi,
                            kinds=("text",),
                        ),
                    ),
                    rdf_type="rdf:Literal",
                    relation="ex:price",
                ),
            ),
        )

    return root("f1", 3, 3), root("f2", 5, 5)


def test_fragment_signature_and_distance():
    f1, f2 = _price_kb()
    assert learning.fragment_signature(f1) == learning.fragment_signature(f2)
    assert learning.fragment_distance(f1, f2) == 0.0  # bounds live in subfrags
    sub1, sub2 = f1.subfragments[0], f2.subfragments[0]
    assert learning.fragment_signature(sub1) == learning.fragment_signature(sub2)
    assert learning.fragment_distance(sub1, sub2) == 4.0  # |3-5| × 2 bounds
    other = Fragment(fid="x", selectors=(), rdf_type="ex:Other")
    assert learning.fragment_distance(f1, other) == float("inf")


def test_merge_unions_intervals_and_generalizes():
    f1, f2 = _price_kb()
    m = learning.merge_fragments(f1, f2)
    lit = m.subfragments[0].selectors[0]
    assert (lit.min_offset, lit.max_offset) == (3, 5)
    from scrappy_spark.learning.optimize import _merge_selectors

    a = Selector(type="span", kind="text", pattern="aa", index=1)
    b = Selector(type="span", kind="link", pattern="bb", index=2)
    g = _merge_selectors(a, b)
    assert g.kind is None and g.index is None and g.pattern == "(?:aa|bb)"


def test_hill_climb_merges_without_score_drop(spark):
    docs = {
        "http://ex.com/a": [
            _sp("heading", "intro", 0),
            _sp("text", "price one", 3),
            _sp("link", "x", 4, media_ref="http://ex.com/b"),
        ],
        "http://ex.com/b": [
            _sp("heading", "intro", 0),
            _sp("link", "x", 4, media_ref="http://ex.com/a"),
            _sp("text", "price two", 5),
        ],
    }
    docs_df = _docs_df(spark, docs)
    golden = spark.createDataFrame(
        [
            ("http://ex.com/a", "http://ex.com/a", "ex:price", "price one"),
            ("http://ex.com/b", "http://ex.com/b", "ex:price", "price two"),
        ],
        "sample string, s string, p string, o string",
    )
    kb = _price_kb()
    optimized, score = learning.hill_climb(kb, docs_df, golden)
    assert score == 1.0
    assert len(optimized) == 1  # merged into one generalized fragment
    lit = optimized[0].subfragments[0].selectors[0]
    assert (lit.min_offset, lit.max_offset) == (3, 5)
    # the optimized KB still reproduces golden exactly
    ext = extract_triples(docs_df, optimized)
    got = {(r["s"], r["p"], r["o"]) for r in ext.collect()}
    assert got == {(r["s"], r["p"], r["o"]) for r in golden.collect()}


def test_hill_climb_rolls_back_harmful_merge(spark):
    # doc b has a DECOY text inside the merged window: merging [3,3] and
    # [5,5] into [3,5] would extract the decoy too, dropping precision —
    # the regression guard must reject the merge and keep both fragments
    docs = {
        "http://ex.com/a": [_sp("text", "price one", 3)],
        "http://ex.com/b": [_sp("text", "decoy", 4), _sp("text", "price two", 5)],
    }
    docs_df = _docs_df(spark, docs)
    golden = spark.createDataFrame(
        [
            ("http://ex.com/a", "http://ex.com/a", "ex:price", "price one"),
            ("http://ex.com/b", "http://ex.com/b", "ex:price", "price two"),
        ],
        "sample string, s string, p string, o string",
    )
    kb = _price_kb()
    optimized, score = learning.hill_climb(kb, docs_df, golden)
    assert score == 1.0
    assert len(optimized) == 2  # merge rejected, original KB kept


def test_hill_climb_one_extraction_pass_per_iteration(spark, monkeypatch):
    """Batched scoring (VERDICT r2 #6): each hill-climb iteration runs
    exactly ONE tagged extraction over the documents, regardless of how
    many candidate merges it considers."""
    import scrappy_spark.learning.optimize as opt

    calls: list[int] = []
    real = opt.extract_triples_tagged

    def counting(docs, kbs):
        calls.append(len(kbs))
        return real(docs, kbs)

    monkeypatch.setattr(opt, "extract_triples_tagged", counting)

    def root(fid, lo, hi):
        f1, _ = _price_kb()
        sub = f1.subfragments[0]
        from dataclasses import replace

        sel = replace(sub.selectors[0], min_offset=lo, max_offset=hi)
        return replace(
            f1,
            fid=fid,
            subfragments=(replace(sub, fid=f"{fid}_lit", selectors=(sel,)),),
        )

    docs = {
        "http://ex.com/a": [_sp("text", "price one", 3)],
        "http://ex.com/b": [_sp("text", "price two", 5)],
        "http://ex.com/c": [_sp("text", "price three", 7)],
    }
    golden = spark.createDataFrame(
        [
            ("http://ex.com/a", "http://ex.com/a", "ex:price", "price one"),
            ("http://ex.com/b", "http://ex.com/b", "ex:price", "price two"),
            ("http://ex.com/c", "http://ex.com/c", "ex:price", "price three"),
        ],
        "sample string, s string, p string, o string",
    )
    kb = (root("f1", 3, 3), root("f2", 5, 5), root("f3", 7, 7))
    optimized, score = learning.hill_climb(kb, _docs_df(spark, docs), golden)
    assert score == 1.0 and len(optimized) == 1  # merged all the way down
    assert all(c >= 1 for c in calls)
    assert max(calls) >= 3  # a 3-fragment iteration considers 3 pairs…
    assert len(calls) <= 3  # …in ONE pass (iterations, not candidates)


# ---------------------------------------------------------------- A-8


def test_lcp_uri_pattern():
    sel = learning.lcp_uri_pattern(
        ["http://t.com/products/1", "http://t.com/products/29"]
    )
    assert sel.type == "uri_pattern"
    assert sel.values == ("http://t.com/products/*",)


# ---------------------------------------------------------------- A-9


def _sample_doc(title, price, extra_text="filler"):
    return [
        _sp("heading", title, 0),
        _sp("text", extra_text, 1),
        _sp("text", price, 2),
        _sp("link", "next", 3, media_ref="http://t.com/products/x"),
    ]


def test_trainer_induces_exact_extractor(spark):
    samples = [
        (
            f"http://t.com/products/{i}",
            _sample_doc(f"Item {i}", f"{i}9 usd"),
            [("ex:title", f"Item {i}"), ("ex:price", f"{i}9 usd")],
        )
        for i in range(1, 4)
    ]
    kb = learning.train_kb(samples)
    assert len(kb) == 1 and len(kb[0].subfragments) == 2

    docs = {uri: spans for uri, spans, _ in samples}
    docs["http://t.com/products/9"] = _sample_doc("Item 9", "99 usd")
    ext = extract_triples(_docs_df(spark, docs), kb)

    golden_rows = [
        (uri, p, v) for uri, _, ann in samples for p, v in ann
    ] + [
        ("http://t.com/products/9", "ex:title", "Item 9"),
        ("http://t.com/products/9", "ex:price", "99 usd"),
    ]
    got = {(r["s"], r["p"], r["o"]) for r in ext.collect()}
    assert got == set(golden_rows)

    # P/R/F = 1.0 on the training samples via the A-3 kernel
    g_df = spark.createDataFrame(golden_rows, "s string, p string, o string")
    row = metrics.prf(g_df, ext.select("s", "p", "o")).collect()[0]
    assert (row["precision"], row["recall"], row["fscore"]) == (1.0, 1.0, 1.0)


def test_trainer_drops_inconsistent_predicate(spark):
    samples = [
        (
            "http://t.com/products/1",
            [_sp("heading", "T1", 0), _sp("text", "moves", 1)],
            [("ex:title", "T1"), ("ex:moving", "moves")],
        ),
        (
            "http://t.com/products/2",
            [_sp("heading", "T2", 0), _sp("text", "x", 1), _sp("text", "moves", 2)],
            [("ex:title", "T2"), ("ex:moving", "moves")],
        ),
    ]
    kb = learning.train_kb(samples)
    rels = {f.relation for f in kb[0].subfragments}
    assert rels == {"ex:title"}  # ex:moving has no agreeing address

    # the applicability gate rejects foreign URIs entirely
    foreign = {"http://elsewhere.org/1": [_sp("heading", "T1", 0)]}
    assert extract_triples(_docs_df(spark, foreign), kb).count() == 0
