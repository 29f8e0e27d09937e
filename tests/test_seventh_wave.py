"""Seventh-wave kernels: HLL registers/estimator, HITS fixed-point,
LSH recall eval arithmetic, CDC chunk alignment-invariance, bitext
candidate flags, politeness audit. Each test checks a property the
value oracle can't: python-mirror state equality, partitioning/
alignment invariance, fail-loud edges, and estimator accuracy at a
cardinality the bench corpus doesn't reach."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from scrappy_spark.frontier import yieldstats
from scrappy_spark.operators import boilerplate, dedup, graph, interleaved, sketch
from scrappy_spark.operators.text import hash60_py, tokens_py


# ------------------------------------------------------------------- HLL

def _py_hll_registers(values):
    regs = {}
    for v in values:
        h = hash60_py("hll:" + str(v))
        reg, w = divmod(h, 1 << sketch.HLL_W_BITS)
        rho = (sketch.HLL_W_BITS + 1) - w.bit_length() if w else (
            sketch.HLL_W_BITS + 1
        )
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def test_hll_registers_match_python_mirror(spark):
    df = spark.range(0, 3000).select(F.col("id").alias("v"))
    got = {
        r["reg"]: r["m_j"]
        for r in sketch.hll_register_maxes(df, F.col("v")).collect()
    }
    assert got == _py_hll_registers(range(3000))


def test_hll_duplicate_insensitive_and_partition_invariant(spark):
    base = spark.range(0, 500).select(F.col("id").alias("v"))
    dup = base.unionAll(base).unionAll(base).repartition(7)
    a = sorted(
        map(tuple, sketch.hll_register_maxes(base, F.col("v")).collect())
    )
    b = sorted(
        map(tuple, sketch.hll_register_maxes(dup, F.col("v")).collect())
    )
    assert a == b


def test_hll_raw_estimate_accurate_at_scale(spark):
    # n = 50k >> 2.5m: the raw-estimator regime the kernel documents.
    # alpha_256 targets ~1.04/sqrt(256) = 6.5% rse; allow 4 sigma.
    n = 50_000
    df = spark.range(0, n).select(F.col("id").alias("v"))
    est = sketch.hll_estimate(
        sketch.hll_register_maxes(df, F.col("v")), spark
    ).collect()[0]
    assert est["registers_hit"] == 256 and est["zeros"] == 0
    assert abs(est["est_raw"] - n) / n < 0.26


def test_hll_w_zero_rho_edge(spark):
    # synthetic register state with m_j at the max rho (w == 0 path):
    # the indicator term is 2^(53-53) = 1, exactly
    maxes = spark.createDataFrame(
        [Row(reg=0, m_j=sketch.HLL_W_BITS + 1)]
    )
    row = sketch.hll_estimate(maxes, spark).collect()[0]
    expected = 1 + 255 * (1 << (sketch.HLL_W_BITS + 1))
    assert row["s_scaled"] == expected
    assert row["registers_hit"] == 1 and row["zeros"] == 255


# ------------------------------------------------------------------ HITS

def test_hits_empty_edges_fails_loud(spark):
    e = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty edge list"):
        graph.hits(e)


def test_hits_star_graph_ranks_hub_and_authorities(spark):
    e = spark.createDataFrame(
        [Row(src="h", dst=f"a{i}") for i in range(3)]
        + [Row(src="x", dst="a0")]
    )
    rows = {r["node"]: r for r in graph.hits(e).collect()}
    # h links to all authorities -> top hub; x links to one -> lesser hub
    assert rows["h"]["hub_i"] > rows["x"]["hub_i"] > 0
    # a0 has two in-links -> top authority; pure hubs have authority 0
    assert rows["a0"]["auth_i"] > rows["a1"]["auth_i"] > 0
    assert rows["a1"]["auth_i"] == rows["a2"]["auth_i"]
    assert rows["h"]["auth_i"] == 0 and rows["a1"]["hub_i"] == 0
    # L1 normalization: each vector sums to SCALE_I up to HALF_UP slack
    # (one unit per nonzero entry)
    assert abs(sum(r["hub_i"] for r in rows.values()) - graph.SCALE_I) <= 2
    assert abs(sum(r["auth_i"] for r in rows.values()) - graph.SCALE_I) <= 4


def test_hits_partitioning_and_multiedge_invariant(spark):
    edges = [
        Row(src=f"n{i % 7}", dst=f"n{(i * 3 + 1) % 11}") for i in range(40)
    ]
    a = sorted(map(tuple, graph.hits(spark.createDataFrame(edges)).collect()))
    b = sorted(
        map(
            tuple,
            graph.hits(
                spark.createDataFrame(edges + edges).repartition(5)
            ).collect(),
        )
    )
    assert a == b


# -------------------------------------------------------- LSH recall eval

def test_lsh_eval_counts_match_pair_kernels(spark, sf_dir):
    truth = {
        (r["a"], r["b"])
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    cand = {
        (r["a"], r["b"])
        for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    }
    row = dedup.lsh_recall_eval(spark, sf_dir).collect()[0]
    assert row["n_true"] == len(truth)
    assert row["n_cand"] == len(cand)
    assert row["n_hit"] == len(truth & cand)
    for name, num, den in (
        ("recall_ppm", row["n_hit"], row["n_true"]),
        ("precision_ppm", row["n_hit"], row["n_cand"]),
    ):
        expect = (
            1_000_000
            if den == 0
            else (2 * num * 1_000_000 + den) // (2 * den)
        )
        assert row[name] == expect


# ---------------------------------------------------------- CDC chunking

def _py_cdc_chunks(toks, mod=boilerplate.CDC_MOD, k=boilerplate.CDC_K):
    if toks is None:
        return []
    bounds = [0]
    if len(toks) >= k + 1:
        for p in range(1, len(toks) - k + 1):
            gram = " ".join(toks[p : p + k])
            if hash60_py("cdc:" + gram) % mod == 0:
                bounds.append(p)
    bounds.append(len(toks))
    return [
        " ".join(toks[bounds[j] : bounds[j + 1]])
        for j in range(len(bounds) - 1)
    ]


def test_cdc_matches_python_mirror_on_corpus(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    from collections import Counter

    chunks = Counter()
    for r in docs:
        if r["text"] is None:
            continue
        for c in _py_cdc_chunks(tokens_py(r["text"])):
            chunks[c] += 1
    dups = {c: n for c, n in chunks.items() if n >= 2}
    got = boilerplate.cdc_chunk_dups(spark, sf_dir).collect()
    assert {r["fp"] for r in got} == {
        __import__("hashlib").md5(c.encode()).hexdigest() for c in dups
    }
    assert sum(r["n_occ"] for r in got) == sum(dups.values())


def test_cdc_alignment_invariance(spark, tmp_path):
    # doc B = junk prefix + doc A's text: fixed-position segmentation
    # would misalign every later segment; CDC re-finds the shared
    # chunks because boundaries depend only on local k-gram content
    text_a = " ".join(f"tok{(i * 7) % 97}" for i in range(120))
    rows = [("A", text_a), ("B", "junk0 junk1 junk2 " + text_a)]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = boilerplate.cdc_chunk_dups(spark, d).collect()
    shared = [r for r in got if r["n_docs"] == 2]
    # python mirror agrees on which chunks are shared
    a = _py_cdc_chunks(tokens_py(text_a))
    b = _py_cdc_chunks(tokens_py("junk0 junk1 junk2 " + text_a))
    expect_shared = set(a) & set(b)
    assert expect_shared, "test corpus must produce shared chunks"
    assert len(shared) == len(expect_shared)
    # and the shared run covers most of A's tokens (alignment robustness)
    assert sum(r["chunk_tokens"] for r in shared) > 0.5 * len(a)


def test_cdc_short_doc_single_chunk(spark, tmp_path):
    rows = [("S1", "one two"), ("S2", "one two")]
    d = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = boilerplate.cdc_chunk_dups(spark, d).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 2 and got[0]["chunk_tokens"] == 2


# ------------------------------------------------------ bitext candidates

def test_bitext_flags_match_langid_and_gate(spark, sf_dir):
    from scrappy_spark.operators.textstats import marker_langid

    langs = {
        r["doc_id"]: r["pred_lang"]
        for r in marker_langid(spark, sf_dir).collect()
    }
    rows = interleaved.bitext_candidates(spark, sf_dir).collect()
    assert rows, "sf corpus must yield at least one candidate pair"
    for r in rows:
        assert r["jaccard_ppm"] >= interleaved.BITEXT_MIN_PPM
        assert r["lang_a"] == langs[r["doc_a"]]
        assert r["lang_b"] == langs[r["doc_b"]]
        assert r["cross_lang"] == int(r["lang_a"] != r["lang_b"])


# ------------------------------------------------------- politeness audit

def test_politeness_audit_exact_hand_computed(spark):
    log = spark.createDataFrame(
        [
            Row(host="a", round=1, n_pops=3),
            Row(host="a", round=2, n_pops=7),
            Row(host="a", round=3, n_pops=6),
            Row(host="b", round=1, n_pops=2),
        ]
    )
    budgets = spark.createDataFrame([Row(host="b", budget=1)])
    rows = {
        r["host"]: r
        for r in yieldstats.politeness_audit(log, budgets).collect()
    }
    a, b = rows["a"], rows["b"]
    # host a: default budget 6 -> one violation (7), worst 7/6
    assert (a["budget"], a["rounds_active"], a["total_pops"]) == (6, 3, 16)
    assert a["n_violations"] == 1 and a["max_round_pops"] == 7
    assert a["worst_over_ppm"] == (1_000_000 * 7) // 6
    # host b: override budget 1 -> violation (2), worst 2/1
    assert b["budget"] == 1 and b["n_violations"] == 1
    assert b["worst_over_ppm"] == 2_000_000


def test_politeness_audit_null_pops_fails_loud(spark):
    log = spark.createDataFrame(
        [Row(host="a", round=1, n_pops=1), Row(host="a", round=2, n_pops=None)]
    )
    with pytest.raises(Exception, match="NULL n_pops"):
        yieldstats.politeness_audit(log).collect()


def test_politeness_audit_compliant_host_audits_clean(spark):
    log = spark.createDataFrame(
        [Row(host="c", round=i, n_pops=6) for i in range(1, 4)]
    )
    row = yieldstats.politeness_audit(log).collect()[0]
    assert row["n_violations"] == 0
    assert row["worst_over_ppm"] == 1_000_000  # exactly at budget
