"""Structured Streaming over the crawl store + watermarked aggregation."""

from pyspark.sql import functions as F

from scrappy_spark.corpus import CorpusConfig, generate_df, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.streaming.state_stream import pops_per_round, windowed_fetch_rate


def test_order_stream_matches_batch(spark, tmp_path):
    cfg = CorpusConfig(n_docs=80)
    df = generate_df(spark, cfg, partitions=2)
    crawler = Crawler(spark, df, str(tmp_path / "store"), CrawlConfig(depth=1))
    crawler.run(seeds_for(cfg, 2))

    q = (
        pops_per_round(spark, str(tmp_path / "store"))
        .writeStream.format("memory")
        .queryName("rounds_live")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["round"]: r["pops"]
        for r in spark.sql("SELECT * FROM rounds_live").collect()
    }
    want = {
        r["round"]: r["cnt"]
        for r in crawler.order_df()
        .groupBy("round")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want and len(got) >= 2


def test_politeness_violations_stateful(spark, tmp_path):
    """applyInPandasWithState auditor: state must carry ACROSS
    micro-batches (maxFilesPerTrigger=1 forces one batch per file), and
    the violation set must equal a pure-Python replay of the events."""
    import os

    from scrappy_spark.streaming.state_stream import politeness_violations

    src = str(tmp_path / "ev")
    os.makedirs(src)
    batch1 = [("a.com", 0), ("a.com", 5000), ("b.com", 100)]
    batch2 = [("a.com", 5400), ("b.com", 6000), ("b.com", 6200)]
    spark.createDataFrame(batch1, "host string, ts long").coalesce(1).write.parquet(
        src + "/f1"
    )
    spark.createDataFrame(batch2, "host string, ts long").coalesce(1).write.parquet(
        src + "/f2"
    )
    stream = (
        spark.readStream.schema("host string, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        politeness_violations(stream, min_interval_ms=1000)
        .writeStream.format("memory")
        .queryName("violations")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["host"], r["ts"], r["gap_ms"], r["total_fetches"])
        for r in spark.sql("SELECT * FROM violations").collect()
    }

    # pure-python golden over the same per-batch event order
    want = set()
    state = {}
    for batch in (batch1, batch2):
        per_host = {}
        for h, t in batch:
            per_host.setdefault(h, []).append(t)
        for h, ts_list in per_host.items():
            last, total = state.get(h, (-(10**18), 0))
            for t in sorted(ts_list):
                gap = t - last
                total += 1
                if gap < 1000:
                    want.add((h, t, gap, total))
                last = t
            state[h] = (last, total)
    # a.com: 5400 follows 5000 from the PREVIOUS batch (gap 400) — only
    # cross-batch state catches it; b.com: 6200 follows 6000 in-batch
    assert ("a.com", 5400, 400, 3) in want
    assert got == want


def test_windowed_fetch_rate_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = [(f"2026-01-01 00:00:{s:02d}", f"http://h/{s}") for s in range(0, 35, 5)]
    spark.createDataFrame(rows, "t string, uri string").select(
        F.col("t").cast("timestamp").alias("fetched_at"), "uri"
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("fetched_at timestamp, uri string").parquet(src)
    )
    q = (
        windowed_fetch_rate(stream, window="10 seconds", watermark="5 seconds")
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rates = spark.sql("SELECT * FROM rates ORDER BY win_start").collect()
    # append mode emits only windows fully below the final watermark
    assert all(r["fetches"] == 2 for r in rates)
    assert len(rates) >= 2


def test_dedup_stream_matches_batch(spark, tmp_path):
    """Streaming exact dedup across micro-batches (maxFilesPerTrigger=1
    forces one batch per file, so the fingerprint state must carry over)
    == batch dropDuplicates on the same files; duplicate texts arriving
    in LATER batches are dropped."""
    import datetime

    src = tmp_path / "docs_stream"
    src.mkdir()
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def _write(name, rows):
        spark.createDataFrame(
            [(d, t, t0 + datetime.timedelta(seconds=s)) for d, t, s in rows],
            "doc_id string, text string, event_time timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    _write("b1", [("a1", "alpha text", 0), ("b1", "beta text", 1),
                  ("a2", "alpha text", 2)])
    _write("b2", [("b2", "beta text", 10), ("c1", "gamma text", 11)])

    from scrappy_spark.streaming.state_stream import dedup_stream

    stream = (
        spark.readStream.schema(
            "doc_id string, text string, event_time timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        dedup_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["text"],)
        for r in spark.sql("SELECT text FROM dedup_stream_t").collect()
    }
    n = spark.sql("SELECT count(*) c FROM dedup_stream_t").first()["c"]
    assert got == {("alpha text",), ("beta text",), ("gamma text",)}
    assert n == 3  # one survivor per fingerprint, across batches


def test_simhash_py_matches_batch_fingerprints(spark, tmp_path):
    """Row-local streaming fingerprint == distributed batch fingerprint
    for every document in the real table (bit-for-bit)."""
    from scrappy_spark.operators import dedup
    from scrappy_spark.streaming.state_stream import simhash_py

    sf_dir = "/root/testdata/sf0.001"
    batch = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_fingerprints(spark, sf_dir).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert len(batch) == len(docs) > 0
    for r in docs:
        assert simhash_py(r["text"]) == batch[r["doc_id"]], r["doc_id"]


def test_simhash_pairs_stream_cross_batch(spark, tmp_path):
    """Near-dup pairs surface ACROSS micro-batches (keyed block state
    carries over) and match the batch kernel on the same corpus."""
    import datetime

    from scrappy_spark.operators import dedup
    from scrappy_spark.streaming.state_stream import (
        simhash_pairs_stream,
        simhash_py,
    )

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows_b1 = [("d1", "alpha beta gamma delta epsilon zeta", 0),
               ("d2", "totally different words entirely here now", 1)]
    rows_b2 = [("d3", "alpha beta gamma delta epsilon zeta", 10),  # dup of d1
               ("d4", "totally different words entirely here now", 11)]  # dup of d2
    src = tmp_path / "nd_stream"
    src.mkdir()
    for name, rows in (("b1", rows_b1), ("b2", rows_b2)):
        spark.createDataFrame(
            [(d, t, t0 + datetime.timedelta(seconds=s)) for d, t, s in rows],
            "doc_id string, text string, event_time timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    stream = (
        spark.readStream.schema(
            "doc_id string, text string, event_time timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        simhash_pairs_stream(stream)
        .writeStream.format("memory")
        .queryName("nd_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in spark.sql("SELECT * FROM nd_stream_t").collect()
    }
    # batch kernel over the union corpus = the expected pair set
    fp = spark.createDataFrame(
        [(d, simhash_py(t)) for d, t, _ in rows_b1 + rows_b2],
        "doc_id string, simhash long",
    )
    want = {
        (r["a"], r["b"], r["hamming"])
        for r in dedup.simhash_pairs_from(fp).collect()
    }
    assert got == want
    assert ("d1", "d3", 0) in got and ("d2", "d4", 0) in got  # cross-batch


def test_discovery_stream_first_wins_across_batches(spark, tmp_path):
    """Streaming sitemap discovery: seeds parse map-only from sitemap
    docs arriving across micro-batches; a URL re-announced in a LATER
    batch (same or different host's sitemap) is deduped by the
    watermarked state; cross-host locs never become seeds."""
    import datetime

    from scrappy_spark.corpus import DOCUMENTS_SCHEMA
    from scrappy_spark.streaming.state_stream import discovery_stream

    src = tmp_path / "sm_stream"
    src.mkdir()
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    span = lambda t: [{"kind": "text", "text": t, "media_ref": "", "offset": 0}]

    def sitemap(host, locs):
        body = "".join(
            f"<url><loc>{u}</loc><lastmod>{lm}</lastmod></url>"
            if lm
            else f"<url><loc>{u}</loc></url>"
            for u, lm in locs
        )
        return f"http://{host}/sitemap.xml", span(f"<urlset>{body}</urlset>")

    schema = DOCUMENTS_SCHEMA.add("event_time", "timestamp")

    def _write(name, rows, secs):
        data = [
            (d, s, t0 + datetime.timedelta(seconds=secs)) for d, s in rows
        ]
        spark.createDataFrame(data, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / name))

    _write(
        "b1",
        [
            sitemap(
                "a.example.com",
                [("http://a.example.com/p1", "2026-01-02"),
                 ("http://a.example.com/p2", None),
                 ("http://evil.example.com/x", "2026-01-02")],
            ),
            ("http://a.example.com/page", span("not a sitemap")),
        ],
        0,
    )
    # batch 2 re-announces p1 (must dedup) and adds p3
    _write(
        "b2",
        [sitemap("a.example.com",
                 [("http://a.example.com/p1", "2026-01-03"),
                  ("http://a.example.com/p3", "2026-01-04")])],
        30,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        discovery_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("discovery_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT uri, lastmod FROM discovery_t").collect()
    assert {(r["uri"], r["lastmod"]) for r in rows} == {
        ("http://a.example.com/p1", "2026-01-02"),  # first-seen lastmod
        ("http://a.example.com/p2", None),
        ("http://a.example.com/p3", "2026-01-04"),
    }
    assert len(rows) == 3  # the re-announcement was deduped


def test_recrawl_stream_matches_batch_across_batches(spark, tmp_path):
    """Streaming recrawl scheduler: per-page state carries ACROSS
    micro-batches, and the LAST emitted row per page equals the batch
    operator over the full fetch log — including a page whose only
    fingerprint change straddles the batch boundary."""
    import os

    from scrappy_spark.frontier.recrawl import recrawl_schedule
    from scrappy_spark.streaming.state_stream import recrawl_stream

    # page 1: fp flips inside batch 2; page 2: the ONLY change is across
    # the boundary (fp 5 in batch 1 → fp 6 in batch 2); page 3: static;
    # page 4: single fetch (cold)
    batch1 = [(1, 10, 0, 1), (1, 20, 1, 2), (2, 10, 2, 5), (3, 10, 3, 9)]
    batch2 = [(1, 30, 4, 2), (2, 40, 5, 6), (3, 50, 6, 9), (4, 60, 7, 0)]
    schema = "page_id long, ts long, fid long, fp long"
    src = str(tmp_path / "fetches")
    os.makedirs(src)
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src + "/f1")
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        recrawl_stream(stream)
        .writeStream.format("memory")
        .queryName("recrawl")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per page = the row with that page's max n_fetches
    rows = spark.sql("SELECT * FROM recrawl").collect()
    last = {}
    for r in rows:
        if r["page_id"] not in last or r["n_fetches"] > last[r["page_id"]]["n_fetches"]:
            last[r["page_id"]] = r
    got = {
        p: (r["n_fetches"], r["n_changes"], r["change_rate_ppm"], r["schedule"])
        for p, r in last.items()
    }

    batch = recrawl_schedule(
        spark.createDataFrame(batch1 + batch2, schema),
        key="page_id",
        ts="ts",
        fp="fp",
        tiebreak="fid",
    )
    want = {
        r["page_id"]: (
            r["n_fetches"],
            r["n_changes"],
            r["change_rate_ppm"],
            r["schedule"],
        )
        for r in batch.collect()
    }
    assert got == want
    # the cross-boundary change was counted (page 2: 1 change, hourly)
    assert got[2] == (2, 1, 1_000_000, "hourly")
    # intermediate emission existed for page 1 (one row per batch seen)
    assert sum(1 for r in rows if r["page_id"] == 1) == 2


def test_budget_stream_matches_batch_across_batches(spark, tmp_path):
    """Streaming adaptive-budget scheduler: per-host (pops, new) totals
    carry ACROSS micro-batches, and the LAST emitted row per host equals
    the batch operator over the full telemetry log — including a host
    whose budget only clears the floor once batch 2's yield arrives."""
    import os

    from scrappy_spark.frontier.yieldstats import adaptive_budget
    from scrappy_spark.streaming.state_stream import budget_stream

    # hub: high yield in both batches (ceiling); dud: zero yield
    # (floor); slow: 0 new in batch 1, 8 new in batch 2 — its budget
    # changes only because state crossed the boundary
    batch1 = [("hub", 2, 40), ("dud", 3, 0), ("slow", 2, 0)]
    batch2 = [("hub", 1, 20), ("dud", 2, 0), ("slow", 2, 8)]
    schema = "host string, n_pops long, n_new long"
    src = str(tmp_path / "telemetry")
    os.makedirs(src)
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(src + "/t1")
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(src + "/t2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/t*")
    )
    q = (
        budget_stream(stream)
        .writeStream.format("memory")
        .queryName("budgets")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM budgets").collect()
    last = {}
    for r in rows:
        if r["host"] not in last or r["n_pops"] > last[r["host"]]["n_pops"]:
            last[r["host"]] = r
    got = {
        h: (r["n_pops"], r["n_new"], r["yield_ppm"], r["next_budget"])
        for h, r in last.items()
    }
    batch = {
        r["host"]: (r["n_pops"], r["n_new"], r["yield_ppm"], r["next_budget"])
        for r in adaptive_budget(
            spark.createDataFrame(batch1 + batch2, schema)
        ).collect()
    }
    assert got == batch
    # the cross-boundary host really moved off the floor in batch 2
    slow_rows = sorted(
        (r["n_pops"], r["next_budget"])
        for r in rows
        if r["host"] == "slow"
    )
    assert slow_rows == [(2, 1), (4, 16)]


def test_admission_stream_matches_batch(spark, tmp_path):
    """Streaming PPS admission == batch pps_sample for the same
    calibrated total: the predicate is the single shared definition
    (curation.pps_admit_col), so the admitted doc_id sets must be
    bit-identical — across micro-batches, since the operator is
    stateless."""
    import os

    from scrappy_spark.operators.curation import pps_sample
    from scrappy_spark.streaming.state_stream import admission_stream

    rows = [(i, ("tok " * (1 + i % 7)).strip()) for i in range(60)]
    schema = "doc_id long, text string"
    batch_df = spark.createDataFrame(rows, schema)
    w_total = sum(1 + i % 7 for i in range(60))
    want = {
        r["doc_id"] for r in pps_sample(batch_df, n_target=8).collect()
    }
    assert 0 < len(want) < 60  # discriminating fixture

    src = str(tmp_path / "docs")
    os.makedirs(src)
    spark.createDataFrame(rows[:30], schema).coalesce(1).write.parquet(
        src + "/b1"
    )
    spark.createDataFrame(rows[30:], schema).coalesce(1).write.parquet(
        src + "/b2"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/b*")
    )
    q = (
        admission_stream(stream, w_total=w_total, n_target=8)
        .writeStream.format("memory")
        .queryName("admitted")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM admitted").collect()}
    assert got == want


def test_media_admission_stream_matches_batch_distinct(spark, tmp_path):
    """Streaming media-fetch admission across micro-batches: a ref
    re-embedded in a LATER batch must not re-admit (state carries), link
    spans carrying hrefs in media_ref must not admit at all, and the
    admitted ref set == the batch distinct-media-ref fetch list."""
    import datetime

    src = tmp_path / "spans_stream"
    src.mkdir()
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    schema = (
        "doc_id string, kind string, text string, media_ref string, "
        "offset int, event_time timestamp"
    )

    def _write(name, rows):
        spark.createDataFrame(
            [
                (d, k, t, m, o, t0 + datetime.timedelta(seconds=s))
                for d, k, t, m, o, s in rows
            ],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    _write(
        "b1",
        [
            ("p1", "text", "hello world", None, 0, 0),
            ("p1", "media", "", "http://cdn/x.jpg", 1, 0),
            ("p1", "link", "go 1", "http://other/page", 2, 0),
            ("p2", "media", "", "http://cdn/y.png", 0, 1),
        ],
    )
    _write(
        "b2",
        [
            ("p3", "media", "", "http://cdn/x.jpg", 0, 10),  # dup ref
            ("p3", "media", "", "http://cdn/z.gif", 1, 10),
        ],
    )

    from scrappy_spark.streaming.state_stream import media_admission_stream

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        media_admission_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("media_admit_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    admitted = {
        r["media_ref"]
        for r in spark.sql("SELECT media_ref FROM media_admit_t").collect()
    }
    n = spark.sql("SELECT count(*) c FROM media_admit_t").first()["c"]
    batch = {
        r["media_ref"]
        for r in spark.read.parquet(str(src / "*"))
        .where(F.col("kind") == "media")
        .select("media_ref")
        .distinct()
        .collect()
    }
    assert admitted == batch == {
        "http://cdn/x.jpg", "http://cdn/y.png", "http://cdn/z.gif"
    }
    assert n == 3  # x.jpg admitted once despite the batch-2 re-embed


def test_simhash_stream_bucket_cap_evicts_by_event_time(spark, tmp_path):
    """ADVICE r4 regression: the per-bucket cap keeps the newest
    fingerprints by EVENT time, not insertion order. A late-arriving
    row that is oldest-by-event-time lands at the state tail; the old
    insertion-order cap (keep[-max_bucket:]) would have kept IT and
    evicted a genuinely newer fingerprint."""
    import datetime

    from scrappy_spark.streaming.state_stream import simhash_pairs_stream

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    txt = "alpha beta gamma delta epsilon zeta"  # identical fp everywhere
    batches = [
        # batch 1: two docs at t+10s and t+20s fill the bucket (cap=2)
        [("d10", txt, 10), ("d20", txt, 20)],
        # batch 2: LATE row at t+0 — oldest by event time, newest by
        # insertion; the cap must evict it, not d10/d20
        [("dlate", txt, 0)],
        # batch 3: probe — its pairs reveal which entries survived
        [("dZ", txt, 30)],
    ]
    src = tmp_path / "cap_stream"
    src.mkdir()
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            [(d, t, t0 + datetime.timedelta(seconds=s)) for d, t, s in rows],
            "doc_id string, text string, event_time timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema(
            "doc_id string, text string, event_time timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        simhash_pairs_stream(stream, max_bucket=2)
        .writeStream.format("memory")
        .queryName("cap_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    probe_partners = {
        r["a"] if r["b"] == "dZ" else r["b"]
        for r in spark.sql(
            "SELECT * FROM cap_stream_t WHERE a = 'dZ' OR b = 'dZ'"
        ).collect()
    }
    # survivors under the event-time cap are d10 + d20; the buggy
    # insertion-order cap retained {d20, dlate} instead
    assert probe_partners == {"d10", "d20"}


def test_politeness_late_event_counted_not_judged(spark, tmp_path):
    """An event older than the stored anchor (late across a micro-batch
    boundary) increments total_fetches but is never judged, and the
    anchor never regresses (review r5: it used to emit a negative-gap
    violation and mis-anchor every later gap)."""
    import os

    from scrappy_spark.streaming.state_stream import politeness_violations

    src = str(tmp_path / "late_ev")
    os.makedirs(src)
    spark.createDataFrame(
        [("a.com", 10_000)], "host string, ts long"
    ).coalesce(1).write.parquet(src + "/f1")
    # 5000 is LATE (before the stored anchor); 10500 is a true violation
    # against the real last fetch at 10000
    spark.createDataFrame(
        [("a.com", 5_000), ("a.com", 10_500)], "host string, ts long"
    ).coalesce(1).write.parquet(src + "/f2")
    stream = (
        spark.readStream.schema("host string, ts long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/f*")
    )
    q = (
        politeness_violations(stream, min_interval_ms=1000)
        .writeStream.format("memory")
        .queryName("late_violations")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["host"], r["ts"], r["gap_ms"], r["total_fetches"])
        for r in spark.sql("SELECT * FROM late_violations").collect()
    }
    # the late event is counted (total=2) but emits nothing; 10500 is
    # judged against 10000 (gap 500), not against the late 5000
    assert got == {("a.com", 10_500, 500, 3)}


def test_simhash_stream_null_text_matches_batch_drop(spark, tmp_path):
    """NULL-text docs carry no fingerprint in the batch kernel; the
    stream must drop them too instead of pairing them as identical
    empty docs (review r5)."""
    import datetime

    from scrappy_spark.streaming.state_stream import simhash_pairs_stream

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("n1", None, 0),
        ("n2", None, 1),
        ("d1", "alpha beta gamma delta", 2),
        ("d2", "alpha beta gamma delta", 3),
    ]
    src = tmp_path / "null_stream"
    src.mkdir()
    spark.createDataFrame(
        [(d, t, t0 + datetime.timedelta(seconds=s)) for d, t, s in rows],
        "doc_id string, text string, event_time timestamp",
    ).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        "doc_id string, text string, event_time timestamp"
    ).parquet(str(src / "*"))
    q = (
        simhash_pairs_stream(stream)
        .writeStream.format("memory")
        .queryName("null_nd")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pairs = {
        tuple(sorted((r["a"], r["b"])))
        for r in spark.sql("SELECT * FROM null_nd").collect()
    }
    assert pairs == {("d1", "d2")}  # never (n1, n2)


def test_simhash_stream_pigeonhole_guard():
    import pytest

    from pyspark.sql import functions as F  # noqa: F401
    from scrappy_spark.streaming.state_stream import simhash_pairs_stream

    with pytest.raises(AssertionError, match="pigeonhole"):
        simhash_pairs_stream(None, max_hamming=4)


def test_mirror_candidates_stream_cross_batch_and_saturation(spark, tmp_path):
    """Mirror candidates surface ACROSS micro-batches (per-ref state
    carries over); a ref exceeding the stock cap within the window goes
    silent; under-cap candidates equal the batch kernel's rare-ref
    co-citations."""
    import datetime

    from scrappy_spark.streaming.state_stream import mirror_candidates_stream

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    # ref R cited by d1 (batch 1) then d2, d3 (batch 2): pairs
    # (d1,d2),(d1,d3),(d2,d3) — the first crossing micro-batches.
    # ref S cited by s0..s9 (10 > max_df=8): emissions stop once the
    # ninth citation arrives (the cap counts DISTINCT docs in-window).
    b1 = [("d1", "R", 0)] + [(f"s{i}", "S", i) for i in range(4)]
    b2 = [("d2", "R", 10), ("d3", "R", 11)] + [
        (f"s{i}", "S", 10 + i) for i in range(4, 10)
    ]
    src = tmp_path / "mirror_stream"
    src.mkdir()
    for name, rows in (("b1", b1), ("b2", b2)):
        spark.createDataFrame(
            [
                (d, "image", f"m://x/{r}", t0 + datetime.timedelta(seconds=s))
                for d, r, s in rows
            ],
            "doc_id string, kind string, media_ref string, "
            "event_time timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))
    stream = (
        spark.readStream.schema(
            "doc_id string, kind string, media_ref string, "
            "event_time timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        mirror_candidates_stream(stream)
        .writeStream.format("memory")
        .queryName("mirror_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_a"], r["doc_b"], r["media_ref"])
        for r in spark.sql("SELECT * FROM mirror_stream_t").collect()
    }
    r_pairs = {p for p in got if p[2] == "m://x/R"}
    assert r_pairs == {
        ("d1", "d2", "m://x/R"),
        ("d1", "d3", "m://x/R"),
        ("d2", "d3", "m://x/R"),
    }
    # S saturates at the 9th distinct doc (max_df=8): docs s0..s7 pair
    # freely (C(8,2)=28 pairs), s8/s9 emit nothing
    s_pairs = {p for p in got if p[2] == "m://x/S"}
    assert len(s_pairs) == 28
    assert not any("s8" in p[:2] or "s9" in p[:2] for p in s_pairs)


def test_mirror_stream_resumes_from_checkpoint(spark, tmp_path):
    """North-rule resume on the STREAMING side: a stateful query stopped
    after batch 1 and RESTARTED with the same checkpointLocation carries
    its keyed state across the restart — a doc from before the kill
    pairs with a doc arriving after it, and batch-1 files are not
    reprocessed (no duplicate pairs)."""
    import datetime

    from scrappy_spark.streaming.state_stream import mirror_candidates_stream

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    src = tmp_path / "resume_src"
    src.mkdir()
    ckpt = str(tmp_path / "resume_ckpt")
    schema = (
        "doc_id string, kind string, media_ref string, event_time timestamp"
    )

    def write_batch(name, rows):
        spark.createDataFrame(
            [
                (d, "image", f"m://x/{r}", t0 + datetime.timedelta(seconds=s))
                for d, r, s in rows
            ],
            schema,
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    # file sink: the memory sink does not support checkpoint recovery
    out = str(tmp_path / "resume_out")

    def run_query():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            mirror_candidates_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        rows = spark.read.parquet(out).collect()
        return [(r["doc_a"], r["doc_b"], r["media_ref"]) for r in rows]

    write_batch("b1", [("d1", "R", 0), ("d2", "R", 5)])
    got1 = run_query()
    assert got1 == [("d1", "d2", "m://x/R")]

    # the "kill": the first query is stopped; new data arrives; a new
    # query restarts from the SAME checkpoint
    write_batch("b2", [("d3", "R", 10)])
    got2 = run_query()
    # state survived the restart: d3 pairs with BOTH pre-kill docs.
    # ROW-count assertions, not set: reprocessing b1 would re-emit
    # (d1,d2) as a duplicate row, which a set would hide
    assert sorted(got2) == [
        ("d1", "d2", "m://x/R"),
        ("d1", "d3", "m://x/R"),
        ("d2", "d3", "m://x/R"),
    ]


def test_mirror_stream_recitation_refreshes_ttl(spark, tmp_path):
    """Review r5 regression: a doc re-citing the same ref inside the
    window refreshes its event time — without the refresh the doc ages
    out from its FIRST citation and an in-window pair is silently lost."""
    import datetime

    from scrappy_spark.streaming.state_stream import mirror_candidates_stream

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    rows = [("d1", 0), ("d1", 50), ("d2", 70)]  # ttl 60s below
    src = tmp_path / "ttl_src"
    src.mkdir()
    spark.createDataFrame(
        [
            ("%s" % d, "image", "m://x/R", t0 + datetime.timedelta(seconds=s))
            for d, s in rows
        ],
        "doc_id string, kind string, media_ref string, event_time timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))
    stream = spark.readStream.schema(
        "doc_id string, kind string, media_ref string, event_time timestamp"
    ).parquet(str(src / "*"))
    q = (
        mirror_candidates_stream(stream, ttl_ms=60_000)
        .writeStream.format("memory")
        .queryName("ttl_refresh_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in spark.sql("SELECT * FROM ttl_refresh_t").collect()
    }
    # d2 arrives 70s after d1's first citation (past TTL) but 20s after
    # the re-citation — the pair must emit
    assert got == {("d1", "d2")}
