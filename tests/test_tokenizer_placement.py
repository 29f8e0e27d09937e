"""Edge-case tests for the tokenizer-induction and data-placement
kernels (the value sweep vs DuckDB runs in test_driver_contract.py;
these pin the semantics the sweep can't see)."""

from pyspark.sql import functions as F

from scrappy_spark.operators import placement, tokenizer
from tests.conftest import md5_hash60


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ------------------------------------------------------------ tokenizer


def test_bpe_pairs_hand_computed(spark):
    # 'aab aab b cd' -> words aab(x2... no: one doc each word counted per
    # occurrence): aab appears twice, b once (len 1 -> dropped), cd once
    df = _docs(spark, [(1, "aab aab b cd"), (2, "aab")])
    out = {
        (r["s1"], r["s2"]): r["pair_count"]
        for r in tokenizer.bpe_pair_counts(df).collect()
    }
    # aab freq 3 -> pairs (a,a)x3, (a,b)x3 ; cd freq 1 -> (c,d)x1
    assert out == {("a", "a"): 3, ("a", "b"): 3, ("c", "d"): 1}


def test_bpe_pairs_single_char_words_drop(spark):
    df = _docs(spark, [(1, "a b c ! ?")])
    assert tokenizer.bpe_pair_counts(df).count() == 0


def test_bpe_pairs_punct_and_digits_pretokenize(spark):
    # 'ab12,cd' pre-tokenizes to ab / 12 / , / cd — pairs never cross
    # class boundaries and the comma (len 1) is dropped
    df = _docs(spark, [(1, "ab12,cd")])
    out = {
        (r["s1"], r["s2"]): r["pair_count"]
        for r in tokenizer.bpe_pair_counts(df).collect()
    }
    assert out == {("a", "b"): 1, ("1", "2"): 1, ("c", "d"): 1}


def test_bpe_topk_tiebreak_total_order(spark):
    # every pair count 1 -> the k cut must be (s1, s2) lexicographic
    df = _docs(spark, [(1, "za yb xc wd ve uf tg sh ri qj")])
    out = tokenizer.bpe_pair_counts(df, k=3).collect()
    assert [(r["s1"], r["s2"]) for r in out] == [
        ("q", "j"),
        ("r", "i"),
        ("s", "h"),
    ]


# ------------------------------------------------------------ placement


def test_shard_assignment_matches_hash(spark):
    df = _docs(spark, [(i, "w x y") for i in range(40)])
    rows = df.select(
        "doc_id", placement.shard_col(F.col("doc_id")).alias("shard")
    ).collect()
    for r in rows:
        assert r["shard"] == md5_hash60(f"shard:{r['doc_id']}") % placement.N_SHARDS


def test_shard_balance_conserves_and_normalizes(spark):
    df = _docs(spark, [(i, "a b c d") for i in range(200)])
    rows = placement.shard_balance(df).collect()
    assert sum(r["n_docs"] for r in rows) == 200
    assert sum(r["total_tokens"] for r in rows) == 800
    # load_ppm is the share of ideal: mean over shards weighted by
    # 1/n_shards must floor-approximate 1e6
    assert all(r["load_ppm"] > 0 for r in rows)
    ideal = 800 / placement.N_SHARDS
    for r in rows:
        assert r["load_ppm"] == int(1_000_000 * r["total_tokens"] / ideal / 1)


def test_key_skew_geometric_fixture(spark):
    # doc_id 0..126 -> host = 'h'||len(bin(id+1)): h K owns 2^(K-1) docs
    df = _docs(spark, [(i, "t") for i in range(127)])
    host = F.concat(
        F.lit("h"), F.length(F.expr("bin(doc_id + 1)")).cast("string")
    )
    rows = {r["host"]: r for r in placement.key_skew(df, host).collect()}
    assert {h: rows[h]["n_rows"] for h in rows} == {
        f"h{k}": 2 ** (k - 1) for k in range(1, 8)
    }
    # hottest host: share 64/127, salt = ceil(32*64/127) = 17
    assert rows["h7"]["share_ppm"] == (1_000_000 * 64) // 127
    assert rows["h7"]["salt_factor"] == -(-32 * 64 // 127)
    # a host below 1/P of the table floors at salt 1 (1/127 < 1/32)
    assert rows["h1"]["salt_factor"] == 1
    # ...and one just above 1/P gets exactly ceil: 4/127 -> ceil(1.008)=2
    assert rows["h3"]["salt_factor"] == 2
    for h, r in rows.items():
        assert r["part_id"] == md5_hash60(f"part:{h}") % placement.SKEW_PARTITIONS


def test_quality_linear_sign_gate_and_sum(spark):
    from scrappy_spark.operators import textstats

    df = _docs(spark, [(1, "the cat"), (2, "")])

    # the kernel reads {sf_dir}/documents.parquet — materialize the
    # fixture in that shape and point the query at it
    import tempfile, os

    d = tempfile.mkdtemp(prefix="qlin_")
    df.selectExpr(
        "doc_id", "text", "'en' AS lang", "'s' AS source", "length(text) AS n_chars"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in textstats.quality_linear(spark, d).collect()}

    w = lambda t: (md5_hash60(f"qw:{t}") % 1001) - 500
    assert out[1]["w_sum"] == w("the") + w("cat")
    assert out[1]["n_tokens"] == 2
    assert out[1]["keep"] == (out[1]["w_sum"] > 0)
    # empty text tokenizes to [''] (the repo-wide whitespace-split
    # semantics) — n_tokens 1, w_sum = w('')
    assert out[2]["n_tokens"] == 1
    assert out[2]["w_sum"] == w("")


def test_plan_shapes(spark, sf_dir):
    """Pin the executed-plan claims: quality_linear is ZERO-Exchange
    map-only; bpe pair counting is exactly two partial-agg Exchanges +
    TakeOrderedAndProject (never a Window); the placement kernels scan
    the corpus once (localCheckpoint'ed rollup — the only
    SinglePartition exchange left feeds from the n_keys-row rollup,
    not the corpus)."""
    from scrappy_spark.operators import textstats

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    ql = plan_of(textstats.quality_linear(spark, sf_dir))
    assert ql.count("Exchange") == 0
    assert "FileScan" in ql and "Window" not in ql

    bp = plan_of(tokenizer.bpe_pair_counts_query(spark, sf_dir))
    assert bp.count("Exchange") == 2
    assert "TakeOrderedAndProject" in bp
    assert "Window" not in bp and "SinglePartition" not in bp

    for fn in (placement.shard_balance_query, placement.host_skew_query):
        plan = plan_of(fn(spark, sf_dir))
        # the corpus scan ran exactly once INSIDE the eager checkpoint;
        # the downstream plan reads the materialized rollup on both
        # fan-out branches and never touches parquet again
        assert "FileScan parquet" not in plan, fn.__name__
        assert "Scan ExistingRDD" in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__
        assert "Window" not in plan, fn.__name__
