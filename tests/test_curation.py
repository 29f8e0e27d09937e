"""Curation-planning kernels (operators/curation.py): PPS sampling,
mixture manifest, host TF-IDF keywords, retention curve — each checked
against an independent pure-Python oracle over a hand-built corpus,
plus the libm grid-margin guard for the one ln() in the family."""

import math
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from conftest import md5_hash60
from scrappy_spark.operators import curation


def _toks(text: str) -> list[str]:
    return re.split(r"[ \t\n\x0b\f\r]+", text.strip(" "))


DOCS = [
    # (doc_id, text, lang, source)
    (1, "alpha beta gamma alpha", "en", "h1"),
    (2, "beta beta delta", "en", "h1"),
    (3, "alpha zebra", "de", "h2"),
    (4, "gamma gamma gamma unique", "de", "h2"),
    (5, "omega", "xx", "h3"),  # lang absent from the mixture weights
    (6, "alpha beta gamma delta omega zebra", "fr", "h3"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, l, s, len(t)) for i, t, l, s in DOCS],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )


def test_pps_sample_exact_inclusion(spark, docs):
    n_target = 3
    w = {i: len(_toks(t)) for i, t, _, _ in [(d[0], d[1], d[2], d[3]) for d in DOCS]}
    W = sum(w.values())
    expect = {
        i
        for i in w
        if md5_hash60(f"pps:{i}") * W < n_target * w[i] * (1 << 60)
    }
    got = {
        r["doc_id"]
        for r in curation.pps_sample(docs, n_target=n_target).collect()
    }
    assert got == expect
    # weights surface correctly alongside the ids
    rows = {r["doc_id"]: r["n_tokens"] for r in
            curation.pps_sample(docs, n_target=n_target).collect()}
    for i, n in rows.items():
        assert n == w[i]


def test_pps_sample_always_in_when_weight_dominates(spark, docs):
    # n_target * w >= W makes the inclusion unconditional: with n_target
    # equal to the doc count, every inequality hash60*W < n*w*2^60 holds
    # for any doc whose share >= 1/n — force it with a huge n_target
    got = curation.pps_sample(docs, n_target=10_000).collect()
    assert len(got) == len(DOCS)


def test_mixture_manifest_cap_and_deficit(spark, docs):
    budget, cap = 100, 2_000_000  # 2-epoch cap to force a deficit
    weights = {"en": 500_000, "de": 300_000, "fr": 200_000}
    avail = {}
    for _, t, lang, _ in DOCS:
        avail[lang] = avail.get(lang, 0) + len(_toks(t))
    out = {
        r["lang"]: r
        for r in curation.mixture_manifest(
            docs, budget=budget, weights_ppm=weights, cap_ppm=cap
        ).collect()
    }
    assert set(out) == set(avail)
    for lang, a in avail.items():
        r = out[lang]
        target = (weights.get(lang, 0) * budget) // 1_000_000
        assert r["avail_tokens"] == a
        assert r["target_tokens"] == target
        assert r["epochs_ppm"] == min(
            (target * 1_000_000 + a - 1) // a, cap
        )
        planned = min(target, (a * cap) // 1_000_000)
        assert r["planned_tokens"] == planned
        assert r["deficit_tokens"] == target - planned
    # the unweighted lang is present with zeros, not missing
    assert out["xx"]["target_tokens"] == 0
    assert out["xx"]["epochs_ppm"] == 0
    # the cap binds somewhere in this configuration (the test's point)
    assert any(r["deficit_tokens"] > 0 for r in out.values())


def test_tfidf_host_keywords_oracle(spark, docs):
    # pure-python mirror with the same round-6 fixed-point discipline
    tf = {}
    for _, t, _, src in DOCS:
        for tok in _toks(t):
            tf[(src, tok)] = tf.get((src, tok), 0) + 1
    hosts = {src for _, _, _, src in DOCS}
    hdf = {}
    for (_, tok) in tf:
        hdf[tok] = hdf.get(tok, 0) + 1
    idf = {t: round(math.log(len(hosts) / d), 6) for t, d in hdf.items()}
    scored = sorted(
        ((src, tok, c, round(c * idf[tok], 6)) for (src, tok), c in tf.items()),
        key=lambda r: (r[0], -r[3], r[1]),
    )
    expect = {}
    for src, tok, c, s in scored:
        expect.setdefault(src, [])
        if len(expect[src]) < 2:
            expect[src].append((tok, c, s, len(expect[src]) + 1))
    got = {}
    for r in curation.tfidf_host_keywords(docs, k=2).collect():
        got.setdefault(r["source"], []).append(
            (r["term"], r["tf"], round(r["score"], 6), r["rank"])
        )
    for src in got:
        got[src].sort(key=lambda x: x[3])
    assert got == expect


def test_tfidf_idf_grid_margin():
    """libm guard (the unigram_logprob discipline): every idf value the
    driver corpora can produce — ln(n_hosts/hdf) for hdf in 1..n_hosts,
    20 hosts at every SF — sits clear of a 0.0000005 rounding boundary,
    so a 1-ulp ln() disagreement cannot flip round(·, 6)."""
    for sf in ("sf0.001", "sf0.01"):
        (n_hosts,) = duckdb.sql(
            f"SELECT count(DISTINCT source) FROM "
            f"'/root/testdata/{sf}/documents.parquet'"
        ).fetchone()
        margins = [
            abs((math.log(n_hosts / d) * 1e6) % 1 - 0.5)
            for d in range(1, n_hosts + 1)
            if d != n_hosts  # ln(1) = 0 exactly, margin check n/a
        ]
        assert min(margins) > 1e-9, (sf, min(margins))


def test_retention_curve_oracle(spark, docs):
    grid = [-1000, 0, 1000]
    scores = {}
    for i, t, _, _ in DOCS:
        toks = _toks(t)
        w = sum(md5_hash60(f"qw:{tok}") % 1001 - 500 for tok in toks)
        scores[i] = (len(toks), w)
    total = len(scores)
    out = {r["thr_milli"]: r for r in
           curation.retention_curve(docs, thresholds=grid).collect()}
    assert set(out) == set(grid)
    for thr in grid:
        kept = [(n, w) for n, w in scores.values() if w > thr]
        assert out[thr]["docs_kept"] == len(kept)
        assert out[thr]["tokens_kept"] == sum(n for n, _ in kept)
        assert out[thr]["docs_ppm"] == (1_000_000 * len(kept)) // total
    # the curve is monotone non-increasing in the threshold
    ds = [out[t]["docs_kept"] for t in sorted(grid)]
    assert ds == sorted(ds, reverse=True)


def test_retention_curve_emits_empty_thresholds(spark, docs):
    out = curation.retention_curve(docs, thresholds=[10**9]).collect()
    assert len(out) == 1
    assert out[0]["docs_kept"] == 0
    assert out[0]["tokens_kept"] == 0
    assert out[0]["docs_ppm"] == 0


def test_pps_plan_is_map_only_after_scalar(spark, docs):
    """Scale guard: the sampler's executed plan has exactly ONE exchange
    (the scalar total's partial agg) and no join-shaped shuffle — the
    inclusion test itself is map-side against the broadcast scalar."""
    plan = curation.pps_sample(docs)._jdf.queryExecution().executedPlan().toString()
    # broadcast of the 1-row total, never a shuffle join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 3  # scalar partial agg + broadcast


def test_mixture_manifest_zero_avail_weighted_lang_surfaces(spark, docs):
    """A weighted language the corpus never collected must appear with
    avail 0, epochs 0, and its full target as deficit (review r5: the
    lookup-map spelling silently dropped it)."""
    weights = {"en": 500_000, "ja": 500_000}
    out = {
        r["lang"]: r
        for r in curation.mixture_manifest(
            docs, budget=100, weights_ppm=weights, cap_ppm=2_000_000
        ).collect()
    }
    assert "ja" in out
    r = out["ja"]
    assert r["avail_tokens"] == 0
    assert r["target_tokens"] == 50
    assert r["epochs_ppm"] == 0
    assert r["planned_tokens"] == 0
    assert r["deficit_tokens"] == 50
    # and the corpus-only langs still surface with zero weight
    assert out["xx"]["target_tokens"] == 0


def test_mixture_manifest_explicit_empty_weights(spark, docs):
    """weights_ppm={} is an explicit all-zero mixture, not a fall-through
    to the module defaults (review r5 falsy-default fix)."""
    out = curation.mixture_manifest(docs, weights_ppm={}).collect()
    assert len(out) > 0
    assert all(r["target_tokens"] == 0 for r in out)


def test_retention_curve_null_text_excluded(spark):
    """NULL-text documents carry no tokens on either engine — they are
    in neither the kept counts nor the docs_ppm denominator."""
    d = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "gamma")],
        "doc_id LONG, text STRING",
    )
    out = {r["thr_milli"]: r for r in
           curation.retention_curve(d, thresholds=[-10**9]).collect()}
    r = out[-(10**9)]
    assert r["docs_kept"] == 2  # the NULL-text doc never counts
    assert r["docs_ppm"] == 1_000_000  # denominator excludes it too


def test_tfidf_null_source_not_counted_as_host(spark, docs):
    """count(DISTINCT source) ignores a NULL source on both engines; the
    Spark side must too (review r5: distinct().count() counted it)."""
    extra = spark.createDataFrame(
        [(9, "alpha", "en", None, 5)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    out = curation.tfidf_host_keywords(docs.unionByName(extra), k=5).collect()
    # 'unique' appears on exactly one of the 3 non-NULL hosts; its idf
    # must be ln(3/1), not ln(4/1)
    got = [r for r in out if r["source"] == "h2" and r["term"] == "unique"]
    assert got and abs(got[0]["score"] - round(math.log(3.0), 6)) < 1e-9
