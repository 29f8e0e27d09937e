"""Corpus-mixing operators (round 4): the salted two-level top-K must
equal the naive single-window top-K under heavy source skew, and the
stratified sampler must stay a map-only filter. Exact DuckDB value
oracles run in test_driver_contract."""

from conftest import md5_hash60
from pyspark.sql import Window
from pyspark.sql import functions as F

from scrappy_spark.operators import sampling
from scrappy_spark.operators.text import hash60_col


def _skewed_docs(spark):
    # one mega-source (400 rows), two small ones — the shape that breaks
    # a naive per-source window at scale
    rows = [(i, "mega") for i in range(400)]
    rows += [(1000 + i, "tiny_a") for i in range(3)]
    rows += [(2000 + i, "tiny_b") for i in range(12)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_source_quota_equals_naive_window(spark):
    docs = _skewed_docs(spark)
    quota = 7
    got = {
        (r["doc_id"], r["source"], r["rk"])
        for r in sampling.source_quota_from(docs, quota=quota).collect()
    }
    naive = (
        docs.withColumn("h", hash60_col(F.col("doc_id").cast("string")))
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("source").orderBy("h", "doc_id")),
        )
        .filter(F.col("rk") <= quota)
    )
    want = {
        (r["doc_id"], r["source"], r["rk"]) for r in naive.collect()
    }
    assert got == want
    by_src = {}
    for _, src, _rk in got:
        by_src[src] = by_src.get(src, 0) + 1
    assert by_src == {"mega": 7, "tiny_a": 3, "tiny_b": 7}


def test_source_quota_rank_is_priority_order(spark):
    """rk is dense 1..n per source in ascending priority-hash order."""
    docs = _skewed_docs(spark)
    out = sampling.source_quota_from(docs, quota=5).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r)
    for src, rs in per.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1)), src
        hs = [md5_hash60(r["doc_id"]) for r in rs]
        assert hs == sorted(hs), src


def test_source_quota_stream_admission(spark, tmp_path):
    """Cross-micro-batch quota state: a source with 6 docs in batch 1
    and 6 more in batch 2 under quota 8 admits 6 then exactly 2 — the 2
    highest-priority of batch 2 — with ranks continuing 7, 8. A
    single-batch stream equals the batch operator's survivor set."""
    from scrappy_spark.streaming.state_stream import source_quota_stream

    b1 = [(i, "mega") for i in range(6)] + [(100, "tiny")]
    b2 = [(10 + i, "mega") for i in range(6)] + [(101, "tiny")]
    src = str(tmp_path / "qsrc")
    spark.createDataFrame(b1, "doc_id long, source string").coalesce(1).write.parquet(src)
    spark.createDataFrame(b2, "doc_id long, source string").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        source_quota_stream(stream, quota=8)
        .writeStream.format("memory")
        .queryName("quota_live")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM quota_live").collect()
    mega = sorted(
        ((r["doc_id"], r["rk"]) for r in rows if r["source"] == "mega"),
        key=lambda x: x[1],
    )
    assert len(mega) == 8
    assert [rk for _, rk in mega] == list(range(1, 9))
    # batch 1 admitted all six, in the batch operator's priority order
    b1_ids = [d for d, _ in mega[:6]]
    assert set(b1_ids) == set(range(6))
    assert [md5_hash60(d) for d in b1_ids] == sorted(md5_hash60(d) for d in b1_ids)
    # batch 2 admitted the two highest-priority of its six candidates
    b2_ids = [d for d, _ in mega[6:]]
    want_b2 = sorted(range(10, 16), key=lambda d: (md5_hash60(d), d))[:2]
    assert b2_ids == want_b2
    # the under-quota source admits everything across both batches
    tiny = {r["doc_id"] for r in rows if r["source"] == "tiny"}
    assert tiny == {100, 101}


def test_stratified_sample_is_map_only_and_deterministic(spark, sf_dir):
    df = sampling.stratified_sample(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    a = sorted(r["doc_id"] for r in df.collect())
    b = sorted(r["doc_id"] for r in sampling.stratified_sample(spark, sf_dir).collect())
    assert a == b and len(a) > 0
    # the en stratum is actually down-sampled, others kept whole
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_en = docs.filter(F.col("lang") == "en").count()
    kept_en = df.filter(F.col("lang") == "en").count()
    assert 0 < kept_en < n_en
    for lang, p in sampling.STRATA_PCT.items():
        if p == 100:
            assert df.filter(F.col("lang") == lang).count() == docs.filter(
                F.col("lang") == lang
            ).count()


# ------------------------------------------------- temperature sampling


def test_temperature_sample_quotas_and_selection(spark, sf_dir):
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from scrappy_spark.operators import sampling
    from scrappy_spark.operators.text import hash60_py

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    n = len(docs)
    counts = {}
    for r in docs:
        counts[r["lang"]] = counts.get(r["lang"], 0) + 1
    # python mirror of the engine arithmetic: round(sqrt(share), 6)
    # HALF_UP, exact decimal total, identical double division
    w = {
        lang: Decimal(str(math.sqrt(c / n))).quantize(
            Decimal("0.000001"), ROUND_HALF_UP
        )
        for lang, c in counts.items()
    }
    tw = float(sum(w.values()))
    quotas = {
        lang: int(
            Decimal(str((n // sampling.TEMP_KEEP_DEN) * (float(wl) / tw)))
            .quantize(Decimal("1"), ROUND_HALF_UP)
        )
        for lang, wl in w.items()
    }
    per_lang = {}
    for r in docs:
        per_lang.setdefault(r["lang"], []).append(
            (hash60_py(str(r["doc_id"])), r["doc_id"])
        )
    want = set()
    for lang, rows in per_lang.items():
        for rk, (_, did) in enumerate(sorted(rows)[: quotas[lang]], 1):
            want.add((did, lang, rk, quotas[lang]))
    got = {
        (r["doc_id"], r["lang"], r["rk"], r["lang_quota"])
        for r in sampling.temperature_sample(spark, sf_dir).collect()
    }
    assert got == want
    # flattening: the dominant lang keeps a SMALLER fraction than a tail lang
    big = max(counts, key=counts.get)
    small = min(counts, key=counts.get)
    assert quotas[big] / counts[big] < quotas[small] / counts[small]


def test_lang_quantiles_match_python_mirror(spark, sf_dir):
    from scrappy_spark.operators import ranking
    from scrappy_spark.operators.text import tokens_py

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    per_lang = {}
    for r in docs:
        per_lang.setdefault(r["lang"], []).append(
            (len(tokens_py(r["text"]) or []), r["doc_id"])
        )
    want = set()
    for lang, rows in per_lang.items():
        rows.sort()
        c = len(rows)
        for q, num, den in ranking.QUANTILES:
            t = (num * c + den - 1) // den
            want.add((lang, q, t, rows[t - 1][0]))
    got = {
        (r["lang"], r["quantile"], r["target_rank"], r["n_tokens"])
        for r in ranking.lang_token_quantiles(spark, sf_dir).collect()
    }
    assert got == want


def test_temperature_weight_rounding_margin():
    """The Spark/DuckDB round(double, 6) boundary divergence (decimal-
    string HALF_UP vs binary rounding) can only trigger when a weight
    sqrt sits within ~1 ulp of a .xxxxxx5 boundary — pin that no lang
    share at ANY test SF is anywhere near it (the same guard pattern as
    unigram_logprob's libm-ln margin test)."""
    import math

    import duckdb

    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        rows = con.execute(
            "SELECT count(*) FROM "
            f"'/root/testdata/sf{sf}/documents.parquet' GROUP BY lang"
        ).fetchall()
        n = sum(c for (c,) in rows)
        for (c,) in rows:
            frac = (math.sqrt(c / n) * 1e6) % 1.0
            assert abs(frac - 0.5) > 1e-3, (sf, c, frac)
