"""Metrics (A-3/A-4), sinks (S-6/S-7), repository recency (S-8/S-9),
observe mode (F-15), robots gate."""

import os

from pyspark.sql import functions as F

from scrappy_spark.corpus import CorpusConfig, generate_df, generate_local, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.operators.metrics import missing_and_wrong, prf, prf_by_predicate
from scrappy_spark.oracle import oracle_crawl, robots_disallowed
from scrappy_spark.sources.repository import Repository
from scrappy_spark.sources.sinks import ntriples_lines, write_per_uri_dump
from scrappy_spark.streaming.observe import Observer


def _triples(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string, is_literal boolean")


def test_prf_kernel(spark):
    # optimizer.rb:326-343 semantics: right/P/R/F
    golden = _triples(spark, [("a", "p1", "x", False), ("b", "p1", "y", False), ("c", "p2", "z", False)])
    extracted = _triples(spark, [("a", "p1", "x", False), ("b", "p1", "WRONG", False)])
    row = prf(golden, extracted).first()
    assert row["right"] == 1
    assert row["precision"] == 0.5
    assert abs(row["recall"] - 1 / 3) < 1e-12
    miss, wrong = missing_and_wrong(golden, extracted)
    assert miss.count() == 2 and wrong.count() == 1

    by_p = {r["p"]: r for r in prf_by_predicate(golden, extracted).collect()}
    assert by_p["p1"]["right"] == 1 and by_p["p1"]["n_golden"] == 2
    assert by_p["p2"]["n_extracted"] == 0 and by_p["p2"]["precision"] == 1.0


def test_prf_empty_golden_is_perfect_recall(spark):
    golden = _triples(spark, [])
    extracted = _triples(spark, [("a", "p", "x", False)])
    row = prf(golden, extracted).first()
    assert row["recall"] == 1.0 and row["precision"] == 0.0


def test_ntriples_lines(spark):
    t = _triples(
        spark,
        [
            ("http://a", "http://p", "http://b", False),
            ("http://a", "http://p", 'say "hi"', True),
            ("_:b1", "http://p", "lit", True),
        ],
    )
    lines = sorted(r["value"] for r in ntriples_lines(t).collect())
    assert '<http://a> <http://p> "say \\"hi\\"" .' in lines
    assert "<http://a> <http://p> <http://b> ." in lines
    assert '_:b1 <http://p> "lit" .' in lines


def test_per_uri_dump(spark, tmp_path):
    t = spark.createDataFrame(
        [
            ("s1", "p", "o", False, "http://h.com/a?x=1", 0),
            ("s2", "p", "o", False, "http://h.com/b", 1),
        ],
        "s string, p string, o string, is_literal boolean, src_uri string, src_seq long",
    )
    out = str(tmp_path / "dump")
    write_per_uri_dump(t, out)
    dirs = {d for d in os.listdir(out) if d.startswith("uri_key=")}
    # dumper.rb:7 mangle: scheme stripped, '/'->'-', '.'->'_', '?'->'+'
    # ('=' inside the value is %-escaped by Spark's partition pathing)
    assert "uri_key=h_com-a+x%3D1" in dirs
    assert "uri_key=h_com-b" in dirs


def test_repository_recency_and_sentinel(spark, tmp_path):
    repo = Repository(spark, str(tmp_path / "repo"), window_seconds=900)
    t = _triples(spark, [("s", "p", "o", False)])
    repo.store("http://u1/", t, extracted_at=1000)
    repo.store("http://u2/", None, extracted_at=1000)  # empty -> sentinel

    got = repo.read_recent("http://u1/", now=1500)
    assert got is not None and got.count() == 1
    # sentinel context counts as "recent" but yields no triples (agent.rb:207)
    got2 = repo.read_recent("http://u2/", now=1500)
    assert got2 is not None and got2.count() == 0
    # outside window -> miss (read-through would fetch)
    assert repo.read_recent("http://u1/", now=1000 + 901) is None
    assert repo.stale_uris(["http://u1/", "http://u3/"], now=1500) == ["http://u3/"]


def test_observer_tick_refetches_only_stale(spark, tmp_path):
    cfg = CorpusConfig(n_docs=60)
    df = generate_df(spark, cfg, partitions=2).persist()
    df.count()
    watched = seeds_for(cfg, 2)
    repo = Repository(spark, str(tmp_path / "repo"), window_seconds=900)
    obs = Observer(spark, df, repo, watched, CrawlConfig(depth=0))

    m1 = obs.tick(now=1000)
    assert m1["stale"] == 2 and m1["fetched"] >= 2
    m2 = obs.tick(now=1200)  # inside window: nothing stale
    assert m2["stale"] == 0
    m3 = obs.tick(now=2500)  # window expired: re-crawl
    assert m3["stale"] == 2
    got = repo.read_recent(watched[0], now=2600)
    assert got is not None


def test_observer_cuckoo_expiry_deletes_and_refetches(spark, tmp_path):
    """VERDICT r2 #3: recency expiry must DELETE from the live cuckoo
    (delete_many) and drive a re-fetch, while fresh URIs are skipped via
    the filter without a refetch — across the same persistent filter."""
    cfg = CorpusConfig(n_docs=60)
    df = generate_df(spark, cfg, partitions=2).persist()
    df.count()
    watched = seeds_for(cfg, 3)
    repo = Repository(spark, str(tmp_path / "repo"), window_seconds=900)
    obs = Observer(spark, df, repo, watched, CrawlConfig(depth=0))

    m1 = obs.tick(now=1000)  # warm-up: all stale, filter tracks them
    assert m1["stale"] == 3 and m1["expired"] == 0
    assert obs._filter.count == 3
    m2 = obs.tick(now=1500)  # inside window: filter-fresh, nothing deleted
    assert m2["stale"] == 0 and m2["expired"] == 0
    assert obs._filter.count == 3
    m3 = obs.tick(now=2000)  # window lapsed: expiry deletes, then refetch
    assert m3["expired"] == 3 and m3["stale"] == 3
    assert obs._filter.count == 3  # deleted, then re-inserted as fresh
    assert repo.read_recent(watched[0], now=2100) is not None

    # an EXTERNALLY refreshed URI must not be refetched after its filter
    # entry expires — the just-expired set takes the exact repo check
    repo.store(watched[0], None, extracted_at=2800)
    m4 = obs.tick(now=2950)  # 2000+900 < 2950: all 3 filter-expired
    assert m4["expired"] == 3
    assert m4["stale"] == 2  # watched[0] is repo-fresh via external write
    assert obs._filter.count == 3  # re-tracked (1) + refetched (2)


def test_observer_bulk_store_one_write_and_sentinels(spark, tmp_path):
    """store_bulk: one tick writes triples for every stale URI in a single
    append (sentinel rows included), equal to per-URI store() results."""
    repo = Repository(spark, str(tmp_path / "repo"), window_seconds=900)
    tr = spark.createDataFrame(
        [
            ("http://a/", "http://a/", "sc:references", "http://b/", False),
            ("http://a/", "http://a/", "dc:title", "A", True),
        ],
        "src_uri string, s string, p string, o string, is_literal boolean",
    )
    repo.store_bulk(["http://a/", "http://empty/"], tr, extracted_at=5000)
    got_a = repo.read_recent("http://a/", now=5100)
    assert got_a is not None and got_a.count() == 2
    # empty extraction -> sentinel context: "recent" but yields no triples
    got_e = repo.read_recent("http://empty/", now=5100)
    assert got_e is not None and got_e.count() == 0
    assert repo.stale_uris(["http://a/", "http://empty/"], now=5100) == []


def test_robots_exact_match_vs_oracle(spark, tmp_path):
    cfg = CorpusConfig(n_docs=120)
    docs = generate_local(cfg)
    df = generate_df(spark, cfg, partitions=2)
    seeds = seeds_for(cfg, 2)
    # disallow one hot host entirely and one path prefix elsewhere
    robots = [("h000.example.com", "/"), ("h001.example.com", "/p4")]
    golden = oracle_crawl(docs, seeds, depth=2, robots=robots)
    crawler = Crawler(
        spark,
        df,
        str(tmp_path / "store"),
        CrawlConfig(depth=2, robots=tuple(robots)),
    )
    crawler.run(seeds)
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in crawler.order_df().orderBy("round", "seq").collect()
    ]
    seen = {(r["uri"], r["depth"]) for r in crawler.seen_df().collect()}
    assert order == golden.order
    assert seen == golden.seen
    assert not any(u.startswith("http://h000.example.com/") for u, _ in seen)
    assert all(not robots_disallowed(u, robots) for u, _ in seen)


def test_rdfxml_descriptions_and_framed_write(spark, tmp_path):
    """Round-4 serializer matrix: each rdfxml part-file is a complete,
    well-formed standalone document; descriptions carry escaped literals,
    rdf:resource links, and rdf:nodeID blank nodes."""
    import glob
    import xml.etree.ElementTree as ET

    from scrappy_spark.sources.sinks import (
        rdfxml_descriptions,
        write_rdfxml,
    )

    t = _triples(
        spark,
        [
            ("http://a", "http://ex.org/p", "http://b", False),
            ("http://a", "http://ex.org/name", 'x < "y" & z', True),
            ("_:b1", "http://ex.org/p", "_:b2", False),
        ],
    )
    descs = {r["value"] for r in rdfxml_descriptions(t).collect()}
    assert len(descs) == 2  # one block per subject
    joined = "\n".join(descs)
    assert 'rdf:about="http://a"' in joined
    assert 'rdf:resource="http://b"' in joined
    assert "x &lt; &quot;y&quot; &amp; z" in joined
    # bnode labels serialize as NCName-safe digests ('b'+md5), stable
    # per label: the _:b1 subject and _:b2 object each appear exactly once
    import re as _re

    ids = _re.findall(r'rdf:nodeID="(b[0-9a-f]{32})"', joined)
    assert len(ids) == 2 and len(set(ids)) == 2

    out = str(tmp_path / "rdfxml")
    write_rdfxml(t.repartition(2), out)
    parts = sorted(glob.glob(out + "/part-*"))
    assert parts
    for p in parts:
        root = ET.parse(p).getroot()  # every part parses standalone
        assert root.tag.endswith("RDF")


def test_rdf_json_lines_shape(spark):
    import json as _json

    from scrappy_spark.sources.sinks import rdf_json_lines

    t = _triples(
        spark,
        [
            ("http://a", "http://p", "http://b", False),
            ("http://a", "http://p", "lit", True),
            ("http://a", "http://q", "_:b1", False),
        ],
    )
    [row] = rdf_json_lines(t).collect()
    obj = _json.loads(row["value"])
    vals = obj["http://a"]["http://p"]
    assert {"type": "literal", "value": "lit"} in vals
    assert {"type": "uri", "value": "http://b"} in vals
    assert obj["http://a"]["http://q"] == [{"type": "bnode", "value": "_:b1"}]


def test_yarf_blocks_shape(spark):
    from scrappy_spark.sources.sinks import yarf_blocks

    t = _triples(
        spark,
        [
            ("http://a", "http://p", "http://b", False),
            ("http://a", "http://q", 'say "hi"', True),
        ],
    )
    [row] = yarf_blocks(t).collect()
    lines = row["value"].split("\n")
    assert lines[0] == "<http://a>:"
    assert "  <http://p>: <http://b>" in lines
    assert '  <http://q>: "say \\"hi\\""' in lines


def test_server_facade_new_formats(spark, tmp_path):
    """rdfxml / yarf / ejson negotiate through the service facade."""
    import json as _json
    import xml.etree.ElementTree as ET

    from scrappy_spark.frontier import CrawlConfig
    from scrappy_spark.sources.server import ScrappyService
    from tests.test_server_facade import _web

    svc = ScrappyService(spark, _web(spark), str(tmp_path), CrawlConfig(depth=0))
    r = svc.process_request("rdfxml", "http://a.example.com/")
    assert r.status == "ok" and r.content_type == "application/rdf+xml"
    assert ET.fromstring(r.output).tag.endswith("RDF")
    y = svc.process_request("yarf", "http://a.example.com/")
    assert y.status == "ok" and "<http://a.example.com/>:" in y.output
    e = svc.process_request("ejson", "http://a.example.com/")
    assert e.status == "ok"
    doc = _json.loads(e.output)  # ONE JSON value (JSONP-wrappable)
    assert isinstance(doc, dict) and "http://a.example.com/" in doc
    # JSONP over ejson is valid JS again (review r4)
    wrapped = svc.process_request("ejson", "http://a.example.com/", callback="cb")
    assert wrapped.output.startswith("cb(") and wrapped.output.endswith(")")
    _json.loads(wrapped.output[3:-1])
