"""Repetition signals + decontamination (round 4): planted-value
semantics and the broadcast shape of the decontamination probe. The
exact DuckDB value oracles run in test_driver_contract."""

from pyspark.sql import functions as F

from scrappy_spark.operators import repetition


def test_repetition_planted_values(spark):
    """'a b a b a b': top 2-gram 'a b' claims 3 of 5 occurrences; every
    3-gram occurs twice so the dup fraction is 1. An all-unique doc gets
    1/(n-1) and 0. A 2-token doc has no 3-gram and is excluded."""
    docs = spark.createDataFrame(
        [(0, "a b a b a b"), (1, "u v w x y"), (2, "p q")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["top_2gram_frac"], r["dup_3gram_frac"])
        for r in repetition.repetition_stats_from(docs).collect()
    }
    assert out == {0: (0.6, 1.0), 1: (0.25, 0.0)}


def test_decontaminate_planted_overlap(spark):
    """doc 10 is benchmark (10 % 10 == 0) and shares the 3-gram
    'beta gamma delta' with corpus doc 1; doc 2 shares nothing; doc 3 is
    shorter than k and thus clean by definition. Benchmark docs are not
    in the output."""
    docs = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),
            (1, "intro beta gamma delta outro"),
            (2, "one two three four five"),
            (3, "hi there"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["contaminated"]
        for r in repetition.decontaminate_from(docs, k=3, bench_mod=10).collect()
    }
    assert out == {1: 1, 2: 0, 3: 0}


def test_pipeline_v4_gates_discriminate(spark, tmp_path):
    """Planted corpus where each v4-only gate bites: a contaminated doc
    and a repetitive doc both pass every v3 gate but drop out of v4; a
    clean doc survives both; the benchmark member is excluded from v4 by
    construction."""
    from scrappy_spark.operators import pipeline

    # the ONLY ≥8-token run shared across documents is the planted
    # contamination 8-gram between docs 20 and 1 (the passage rewrite
    # removes longer shared runs, which would shrink docs below the
    # token gate for the wrong reason); 'the/and/of' markers repeat but
    # only in runs of one token
    shared = "zulu yankee xray whiskey victor uniform tango sierra"
    docs = spark.createDataFrame(
        [
            (
                20,
                "the quartz and marble of granite basalt slate the pumice "
                f"and obsidian of shale flint chalk {shared}",
            ),
            (
                1,
                "the maple and birch of cedar willow aspen the poplar and "
                f"spruce of alder rowan hazel {shared} ember onyx topaz "
                "amber jade beryl garnet opal",
            ),
            (
                2,
                "the copper and bronze of silver nickel cobalt the zinc and "
                "iron of platinum gold mercury lead tin antimony argon neon "
                "xenon krypton helium radon",
            ),
            (3, "the story and the tale of it" + " the cat" * 30),
        ],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn("source", F.lit("s"))
    path = str(tmp_path / "sf")
    docs.write.parquet(path + "/documents.parquet")

    v3 = {r["doc_id"] for r in pipeline.training_corpus_v3(spark, path).collect()}
    v4 = {r["doc_id"] for r in pipeline.training_corpus_v4(spark, path).collect()}
    assert v4 <= v3
    assert 1 in v3 and 1 not in v4  # dropped ONLY by contamination
    assert 3 in v3 and 3 not in v4  # dropped ONLY by the repetition gate
    assert 2 in v4  # clean doc survives the full chain
    assert 20 not in v4  # benchmark member never enters the corpus


def test_decontaminate_stream_matches_batch(spark, tmp_path, sf_dir):
    """The map-only streaming flag over micro-batched corpus files must
    equal the batch operator's join-based flags on the same corpus."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = repetition.bench_gram_hashes(docs)
    assert len(bench) > 0
    src = str(tmp_path / "stream_src")
    corpus = docs.filter((F.col("doc_id") % repetition.BENCH_MOD) != 0)
    # two files → at least two micro-batches under maxFilesPerTrigger=1
    corpus.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text").write.parquet(src)
    corpus.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text").write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        repetition.decontaminate_stream(stream, bench)
        .writeStream.format("memory")
        .queryName("decontam_live")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["contaminated"]
        for r in spark.sql("SELECT * FROM decontam_live").collect()
    }
    want = {
        r["doc_id"]: r["contaminated"]
        for r in repetition.decontaminate(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(got.values()) > 0  # flags actually fire across batches


def test_stratified_sample_works_on_a_stream(spark, tmp_path, sf_dir):
    """The stratified sampler is stateless, so the same _from operator
    must run unchanged under Structured Streaming and keep exactly the
    batch sample."""
    from scrappy_spark.operators import sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "strat_src")
    docs.select("doc_id", "lang").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, lang string").parquet(src)
    q = (
        sampling.stratified_sample_from(stream)
        .writeStream.format("memory")
        .queryName("strat_live")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.sql("SELECT * FROM strat_live").collect())
    want = sorted(r["doc_id"] for r in sampling.stratified_sample_from(docs).collect())
    assert got == want and len(got) > 0


def test_decontaminate_plan_broadcasts_benchmark(spark):
    """The benchmark n-gram set must reach the corpus probe as a
    broadcast exchange — the corpus side of the semi-join must not
    shuffle."""
    docs = spark.createDataFrame(
        [(10, "a b c d"), (1, "b c d e")], "doc_id long, text string"
    )
    plan = repetition.decontaminate_from(docs, k=3, bench_mod=10)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    assert "LeftSemi" in plan
