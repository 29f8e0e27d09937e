"""Sequence-packing layout (round 4): stream contiguity invariants and
the sharded plan shape. The exact DuckDB value oracle runs in
test_driver_contract."""

from conftest import md5_hash60 as _h

from scrappy_spark.operators import packing


def test_pack_layout_is_contiguous_per_shard(spark, sf_dir):
    rows = packing.pack_sequences(spark, sf_dir).collect()
    shards = {}
    for r in rows:
        assert r["shard"] == _h(r["doc_id"]) % packing.NUM_SHARDS
        assert r["pack_id"] == r["stream_off"] // packing.SEQ_LEN
        assert r["pack_off"] == r["stream_off"] % packing.SEQ_LEN
        shards.setdefault(r["shard"], []).append(r)
    assert len(shards) == packing.NUM_SHARDS
    for rs in shards.values():
        rs.sort(key=lambda r: (_h(r["doc_id"]), r["doc_id"]))
        off = 0
        for r in rs:  # the shard stream has no gaps and no overlaps
            assert r["stream_off"] == off
            off += r["n_tokens"]


def test_pack_windows_full_except_last_and_conserving(spark, sf_dir):
    """Every materialized window except each shard's last holds exactly
    SEQ_LEN tokens, and the windows conserve the corpus' total token
    count — nothing dropped, nothing duplicated."""
    from pyspark.sql import functions as F

    rows = packing.pack_windows(spark, sf_dir).collect()
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r)
    for rs in per_shard.values():
        rs.sort(key=lambda r: r["pack_id"])
        assert [r["pack_id"] for r in rs] == list(range(len(rs)))
        assert all(r["n_toks"] == packing.SEQ_LEN for r in rs[:-1])
        assert 0 < rs[-1]["n_toks"] <= packing.SEQ_LEN
    from scrappy_spark.operators.text import tokens_col

    total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.sum(F.size(tokens_col(F.col("text")))))
        .first()[0]
    )
    assert sum(r["n_toks"] for r in rows) == total


def test_pack_windows_plan_one_scan_one_exchange(spark, sf_dir):
    """The materializer must not join back to a second layout plan: one
    corpus scan, and only the shard window's exchange — the
    (shard, pack_id) regroup reuses the shard partitioning."""
    df = packing.pack_windows(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan parquet") == 1
    assert final.count("Exchange hashpartitioning") == 1


def test_pack_windows_planted_fingerprint(spark, tmp_path):
    """One-shard, two-doc corpus: the window fingerprints equal md5 of
    the hand-laid-out token stream cut at seq_len."""
    import hashlib

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f g")], "doc_id long, text string"
    )
    path = str(tmp_path / "sf")
    docs.write.parquet(path + "/documents.parquet")
    order = sorted([1, 2], key=lambda d: (_h(d), d))
    stream = []
    texts = {1: "a b c", 2: "d e f g"}
    for d in order:
        stream.extend(texts[d].split())
    want = {
        i: hashlib.md5(" ".join(stream[i * 5 : (i + 1) * 5]).encode()).hexdigest()
        for i in range((len(stream) + 4) // 5)
    }
    got = {
        r["pack_id"]: r["window_fp"]
        for r in packing.pack_windows(spark, path, seq_len=5, num_shards=1).collect()
    }
    assert got == want


def test_pack_stream_single_batch_equals_batch_and_state_carries(
    spark, tmp_path, sf_dir
):
    """A single-batch stream reproduces the batch layout exactly; with
    two micro-batches each shard's offsets continue where batch 1 ended
    (the keyed next-offset state)."""
    from scrappy_spark.streaming.state_stream import pack_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    def run(src, max_files=None):
        reader = spark.readStream.schema("doc_id long, text string")
        if max_files:
            reader = reader.option("maxFilesPerTrigger", max_files)
        name = f"pack_live_{1 if max_files else 0}"
        q = (
            pack_stream(reader.parquet(src))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.sql(f"SELECT * FROM {name}").collect()

    one = str(tmp_path / "one")
    docs.coalesce(1).write.parquet(one)
    got = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["stream_off"], r["pack_id"], r["pack_off"])
        for r in run(one)
    }
    want = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["stream_off"], r["pack_id"], r["pack_off"])
        for r in packing.pack_sequences(spark, sf_dir).collect()
    }
    assert got == want

    two = str(tmp_path / "two")
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(two)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(two)
    rows = run(two, max_files=1)
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard"], []).append(r)
    for rs in per_shard.values():  # contiguous across the batch boundary
        rs.sort(key=lambda r: r["stream_off"])
        off = 0
        for r in rs:
            assert r["stream_off"] == off
            off += r["n_tokens"]


def test_pack_plan_shuffles_once_on_shard(spark, sf_dir):
    df = packing.pack_sequences(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(shard" in final


def test_pack_efficiency_matches_layout(spark, sf_dir):
    from pyspark.sql import functions as F

    """The windowless efficiency report must agree with the actual
    layout: per shard, n_windows == max(pack_id)+1 and total_tokens ==
    sum(n_tokens); and its plan has no Window at all."""
    eff = {r["shard"]: r for r in packing.pack_efficiency(spark, sf_dir).collect()}
    # n_windows must equal the windows the MATERIALIZER actually emits
    # (max(pack_id)+1 from the layout would undercount when the last doc
    # straddles a boundary — its tokens extend past its start window)
    wins = (
        packing.pack_windows(spark, sf_dir)
        .groupBy("shard")
        .agg(F.count("*").alias("w"), F.sum("n_toks").alias("t"))
        .collect()
    )
    for r in wins:
        e = eff[r["shard"]]
        assert e["total_tokens"] == r["t"]
        assert e["n_windows"] == r["w"]
        assert e["padding_tokens"] == e["n_windows"] * packing.SEQ_LEN - e["total_tokens"]
    plan = (
        packing.pack_efficiency(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan.split("== Initial Plan ==")[0]
