"""Canonicalizer: the Python spec and the native Column chain must agree —
this equality is what lets the engine use the codegen'd path while the
oracle uses Python (SURVEY.md §7.4 determinism watchlist)."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scrappy_spark import urlnorm

CASES = [
    ("http://Example.COM/Path?q=1#frag", "http://example.com/Path?q=1"),
    ("https://example.com:443/", "https://example.com/"),
    ("http://example.com:80", "http://example.com/"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("example.com/a/b", "http://example.com/a/b"),
    ("word", "http://word.com/"),
    ("  http://a.b/c  ", "http://a.b/c"),
    ("ftp://Host/X", "ftp://host/X"),
]


@pytest.mark.parametrize("raw,expect", CASES)
def test_python_spec(raw, expect):
    assert urlnorm.canonicalize(raw) == expect


def test_resolve_relative():
    assert urlnorm.resolve("http://h.com/a/b", "/p9?x=1") == "http://h.com/p9?x=1"
    assert urlnorm.resolve("http://h.com/a/b", "c") == "http://h.com/a/c"
    assert urlnorm.resolve("http://h.com/a", "http://other.com/z") == "http://other.com/z"


def test_native_equals_python(spark):
    from scrappy_spark.corpus import CorpusConfig, doc_record

    cfg = CorpusConfig(n_docs=300)
    urls = set()
    for i in range(300):
        r = doc_record(i, cfg)
        urls.add(r["doc_id"])
        for s in r["spans"]:
            if s["kind"] == "link" and s["media_ref"].startswith("http"):
                urls.add(s["media_ref"])
    urls |= {raw for raw, _ in CASES}
    pdf = pd.DataFrame({"u": sorted(urls)})
    df = spark.createDataFrame(pdf)
    got = {
        r["u"]: r["c"]
        for r in df.select("u", urlnorm.canonicalize_col("u").alias("c")).collect()
    }
    for u in urls:
        assert got[u] == urlnorm.canonicalize(u), u


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1,
        max_size=40,
    )
)
def test_complete_always_has_scheme(s):
    out = urlnorm.complete_uri(s)
    assert "://" in out
