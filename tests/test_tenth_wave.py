"""Tenth-wave kernels: mirror-host detection (webgraph.mirror_hosts) and
streaming DUST canonicalization (state_stream.canonicalize_stream).
Tests cover the df-cap-before-pairs discipline, exact Jaccard ppm
arithmetic, canonical pair direction, and cross-micro-batch alias
admission (an alias arriving in a LATER batch than its canonical twin
is dropped)."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from scrappy_spark.operators import webgraph


# ----------------------------------------------------------- mirror hosts

def _obs(spark, rows):
    return spark.createDataFrame(
        [Row(host=h, fingerprint=f) for h, f in rows]
    )


def test_mirror_hosts_exact_pair_and_ppm(spark):
    # full mirror: a/b share all 6 fps -> jaccard 1.0; c is disjoint
    rows = [("a", i) for i in range(6)] + [("b", i) for i in range(6)] + [
        ("c", 100 + i) for i in range(6)
    ]
    got = webgraph.mirror_hosts(_obs(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["host_a"], r["host_b"]) == ("a", "b")
    assert (r["shared"], r["n_a"], r["n_b"]) == (6, 6, 6)
    assert r["jaccard_ppm"] == 1_000_000


def test_mirror_hosts_partial_mirror_floor_div(spark):
    # shared 5, sizes 10/5 -> jaccard = 5/10 = 500000 exactly;
    # shrink thresholds to watch the floor-div boundary
    rows = [("big", i) for i in range(10)] + [("mir", i) for i in range(5)]
    r = webgraph.mirror_hosts(
        _obs(spark, rows), min_shared=5, min_ppm=500_000
    ).collect()
    assert [(x["host_a"], x["host_b"], x["jaccard_ppm"]) for x in r] == [
        ("big", "mir", 500_000)
    ]
    # one fewer shared fp: 4/(10+4-4) = 400000 < 500000 -> below gate
    rows2 = [("big", i) for i in range(10)] + [("mir", i) for i in range(4)]
    assert (
        webgraph.mirror_hosts(
            _obs(spark, rows2), min_shared=4, min_ppm=500_000
        ).count()
        == 0
    )


def test_mirror_hosts_df_cap_drops_boilerplate_whole(spark):
    # fp 999 lives on all 12 hosts (> max_df) and must create NO pair;
    # without the cap every host pair would share it
    hosts = [f"h{i:02d}" for i in range(12)]
    rows = [(h, 999) for h in hosts]
    # two real mirrors on top
    rows += [("h00", i) for i in range(6)] + [("h01", i) for i in range(6)]
    got = webgraph.mirror_hosts(
        _obs(spark, rows), max_df=8, min_shared=5, min_ppm=250_000
    ).collect()
    assert [(r["host_a"], r["host_b"], r["shared"]) for r in got] == [
        ("h00", "h01", 6)
    ]
    # n_a counts RARE fps only: the capped fp is excluded from sizes too
    assert got[0]["n_a"] == 6 and got[0]["n_b"] == 6


def test_mirror_hosts_partition_and_duplicate_invariant(spark):
    rows = [("a", i) for i in range(6)] + [("b", i) for i in range(6)]
    a = sorted(map(tuple, webgraph.mirror_hosts(_obs(spark, rows)).collect()))
    b = sorted(
        map(
            tuple,
            webgraph.mirror_hosts(
                _obs(spark, rows + rows).repartition(7)
            ).collect(),
        )
    )
    assert a == b


# ------------------------------------------- streaming DUST rule miner

def test_dust_rules_stream_emits_once_on_crossing(spark, tmp_path):
    """Family A crosses the floor only in batch 2 (1+1) and emits there
    with pooled support; family B crosses within batch 1 and emits
    immediately; a third B pair in batch 2 does NOT re-emit; an
    identical-uri pair is filtered, never crashes the stream."""
    import os

    src = tmp_path / "pairs_stream"
    src.mkdir()
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def _write(name, rows, mtime):
        spark.createDataFrame(
            [
                (a, b, t0 + datetime.timedelta(seconds=s))
                for a, b, s in rows
            ],
            "uri_a string, uri_b string, event_time timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))
        # the file source orders batches by modification time; pin it
        # explicitly so a coarse-mtime filesystem cannot reorder b1/b2
        # (review r5)
        for root, _, files in os.walk(src / name):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    _write(
        "b1",
        [
            ("http://h/a1", "http://h/a1?s=x", 0),      # A x1
            ("http://h/b1", "http://h/b1/print", 1),     # B x1
            ("http://h/b2", "http://h/b2/print", 2),     # B x2 -> emit
            ("http://h/b2", "http://h/b2/print", 4),     # replay: no count
            ("http://h/same", "http://h/same", 3),       # identical: drop
        ],
        1_000_000_000,
    )
    _write(
        "b2",
        [
            ("http://h/a1", "http://h/a1?s=x", 9),       # replay: no count
            ("http://h/a2", "http://h/a2?s=x", 10),      # A x2 -> emit
            ("http://h/b3", "http://h/b3/print", 11),    # B x3: no re-emit
        ],
        1_000_000_100,
    )

    from scrappy_spark.streaming.state_stream import dust_rules_stream

    stream = (
        spark.readStream.schema(
            "uri_a string, uri_b string, event_time timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        dust_rules_stream(stream, min_support=2)
        .writeStream.format("memory")
        .queryName("dust_rules_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    rows = spark.sql(
        "SELECT alpha, beta, support FROM dust_rules_t"
    ).collect()
    got = {(r["alpha"], r["beta"]): r["support"] for r in rows}
    # replays of already-seen pairs never count: A needs the genuinely
    # NEW a2 pair in batch 2 to cross; B crossed at 2 distinct pairs
    assert got == {("?s=x", ""): 2, ("/print", ""): 2}
    assert len(rows) == 2  # exactly-once per rule


def test_dust_rules_stream_replay_past_ttl_never_recounts(spark, tmp_path):
    """ADVICE r5 regression: a pair REPLAYED after its hash would have
    aged past the TTL horizon — with the key kept alive by other pairs —
    must not increment support again. Under the pruned-set behavior this
    crossed min_support=3 with only 2 DISTINCT pairs; the pair-hash set
    is now retained until emission, so the replay is recognized and
    nothing emits."""
    import os

    src = tmp_path / "pairs_replay_stream"
    src.mkdir()
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def _write(name, rows, mtime):
        spark.createDataFrame(
            [
                (a, b, t0 + datetime.timedelta(seconds=s))
                for a, b, s in rows
            ],
            "uri_a string, uri_b string, event_time timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))
        for root, _, files in os.walk(src / name):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    # ttl 3s: batch 2's max(ts)=4s puts the horizon at 1s > P1's t=0,
    # so the old code dropped P1's hash while batch 2's activity kept
    # the key's event-time timeout (4s + 3s) ahead of the watermark;
    # batch 3 then replays P1 at t=6s (< the 7s timeout)
    _write("b1", [("http://h/a1", "http://h/a1?s=x", 0)], 1_000_000_000)
    _write("b2", [("http://h/a2", "http://h/a2?s=x", 4)], 1_000_000_100)
    _write("b3", [("http://h/a1", "http://h/a1?s=x", 6)], 1_000_000_200)

    from scrappy_spark.streaming.state_stream import dust_rules_stream

    stream = (
        spark.readStream.schema(
            "uri_a string, uri_b string, event_time timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        dust_rules_stream(stream, min_support=3, state_ttl_ms=3000)
        .writeStream.format("memory")
        .queryName("dust_rules_replay_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish in time"
    rows = spark.sql(
        "SELECT alpha, beta, support FROM dust_rules_replay_t"
    ).collect()
    # 2 distinct pairs + 1 replay < min_support=3: nothing may emit
    assert rows == []


# ------------------------------------------- streaming DUST canonicalize

def test_canonicalize_stream_cross_batch_alias_dropped(spark, tmp_path):
    """Batch 1 admits the canonical URL; batch 2's session alias rewrites
    to the same canonical uri and is DROPPED by keyed state across the
    micro-batch boundary; a genuinely new URL still admits."""
    src = tmp_path / "urls_stream"
    src.mkdir()
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def _write(name, rows):
        spark.createDataFrame(
            [
                (u, t0 + datetime.timedelta(seconds=s))
                for u, s in rows
            ],
            "uri string, event_time timestamp",
        ).coalesce(1).write.mode("overwrite").parquet(str(src / name))

    _write("b1", [("http://x/art/1", 0), ("http://x/art/2?session=s1", 1)])
    _write(
        "b2",
        [
            ("http://x/art/1?session=s0", 10),  # alias of admitted canon
            ("http://x/art/2", 11),             # canon of admitted alias
            ("http://x/art/3", 12),             # genuinely new
        ],
    )

    from scrappy_spark.streaming.state_stream import canonicalize_stream

    rules = (("?session=s0", ""), ("?session=s1", ""))
    stream = (
        spark.readStream.schema("uri string, event_time timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        canonicalize_stream(stream, rules, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("canon_stream_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT canon_uri, uri FROM canon_stream_t"
    ).collect()
    admitted = {r["canon_uri"] for r in rows}
    assert admitted == {
        "http://x/art/1",
        "http://x/art/2",
        "http://x/art/3",
    }
    assert len(rows) == 3  # each family admitted exactly once
    # the art/2 family was first seen VIA its alias: the admitted row
    # keeps the original uri next to the canonical key
    by_canon = {r["canon_uri"]: r["uri"] for r in rows}
    assert by_canon["http://x/art/2"] == "http://x/art/2?session=s1"


def test_canonicalize_stream_equals_batch_distinct(spark, tmp_path):
    """Admitted canonical set == batch rewrite + distinct over the same
    rows (single batch; the streaming twin of the batch canonicalizer)."""
    src = tmp_path / "urls_one"
    src.mkdir()
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    uris = [f"http://m/art/{i}" for i in range(8)] + [
        f"http://m/art/{i}?session=s{i % 2}" for i in range(8)
    ]
    spark.createDataFrame(
        [(u, t0 + datetime.timedelta(seconds=i)) for i, u in enumerate(uris)],
        "uri string, event_time timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b1"))

    from scrappy_spark.frontier.dust import rewrite_col
    from scrappy_spark.streaming.state_stream import canonicalize_stream

    rules = (("?session=s0", ""), ("?session=s1", ""))
    stream = (
        spark.readStream.schema("uri string, event_time timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        canonicalize_stream(stream, rules, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("canon_stream_b")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["canon_uri"]
        for r in spark.sql("SELECT canon_uri FROM canon_stream_b").collect()
    }
    batch = {
        r["c"]
        for r in spark.createDataFrame([(u,) for u in uris], "uri string")
        .select(rewrite_col(F.col("uri"), rules).alias("c"))
        .distinct()
        .collect()
    }
    assert got == batch == {f"http://m/art/{i}" for i in range(8)}
