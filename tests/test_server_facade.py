"""Service facade (server.rb:19-41 semantics): de-mangle, format
negotiation, JSONP, redirect bounce, error on unknown format / fetch
miss, and the admin train/test path wired to the learning layer."""

import json

from scrappy_spark.corpus import DOCUMENTS_SCHEMA
from scrappy_spark.frontier import CrawlConfig
from scrappy_spark.sources.server import ScrappyService, demangle_url


def _sp(kind, text, offset, media_ref=""):
    return (kind, text, media_ref, offset)


def _web(spark):
    docs = {
        "http://a.example.com/": [
            _sp("text", "hello world", 0),
            _sp("link", "next", 1, "http://a.example.com/next"),
        ],
        "http://a.example.com/next": [_sp("text", "deep", 0)],
    }
    return spark.createDataFrame(list(docs.items()), DOCUMENTS_SCHEMA)


def test_demangle():
    assert demangle_url("http:/a.com/x") == "http://a.com/x"
    assert demangle_url("http://a.com/x") == "http://a.com/x"
    assert demangle_url("https:/a.com") == "https://a.com"


def test_ok_ntriples_and_jsonp(spark, tmp_path):
    svc = ScrappyService(spark, _web(spark), str(tmp_path), CrawlConfig(depth=0))
    resp = svc.process_request("ntriples", "http:/a.example.com/")
    assert resp.status == "ok" and resp.content_type == "text/plain"
    assert "<http://a.example.com/> <sc:references> <http://a.example.com/next> ." in resp.output

    jsonp = svc.process_request("json", "http://a.example.com/", callback="cb")
    assert jsonp.status == "ok" and jsonp.content_type == "application/json"
    assert jsonp.output.startswith("cb(") and jsonp.output.endswith(")")
    rows = json.loads(jsonp.output[3:-1])
    assert {"s": "http://a.example.com/", "p": "sc:references",
            "o": "http://a.example.com/next", "is_literal": False} in rows


def test_redirect_error_and_unknown_format(spark, tmp_path):
    cfg = CrawlConfig(
        depth=0, redirects=(("http://a.example.com/old", "http://a.example.com/"),)
    )
    svc = ScrappyService(spark, _web(spark), str(tmp_path), cfg)
    r = svc.process_request("ntriples", "http://a.example.com/old")
    assert r.status == "redirect" and r.uri == "http://a.example.com/"
    # png (graphviz raster in the reference) is the one format with no
    # distributed analog here — stays an error; yarf became a real
    # format in round 4 (sinks.py)
    assert svc.process_request("png", "http://a.example.com/").status == "error"
    assert (
        svc.process_request("ntriples", "http://missing.example.com/").status
        == "error"
    )


def test_admin_train_and_test_roundtrip(spark, tmp_path):
    samples = [
        (
            f"http://t.com/p{i}",
            [
                {"kind": "heading", "text": f"T{i}", "media_ref": "", "offset": 0},
                {"kind": "text", "text": f"{i} eur", "media_ref": "", "offset": 1},
            ],
            [("ex:title", f"T{i}"), ("ex:price", f"{i} eur")],
        )
        for i in (1, 2)
    ]
    svc = ScrappyService(spark, _web(spark), str(tmp_path))
    kb = svc.train(samples)
    docs = spark.createDataFrame(
        [
            (uri, [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans])
            for uri, spans, _ in samples
        ],
        DOCUMENTS_SCHEMA,
    )
    golden = spark.createDataFrame(
        [(u, p, v, True) for u, _, ann in samples for p, v in ann],
        "s string, p string, o string, is_literal boolean",
    )
    report = svc.test_kb(kb, docs, golden)
    assert report["total"]["fscore"] == 1.0
    assert {r["p"] for r in report["by_predicate"]} == {"ex:title", "ex:price"}
