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


def test_pack_plan_shuffles_once_on_shard(spark, sf_dir):
    df = packing.pack_sequences(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(shard" in final
