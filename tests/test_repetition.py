"""Repetition signals + decontamination (round 4): planted-value
semantics and the broadcast shape of the decontamination probe. The
exact DuckDB value oracles run in test_driver_contract."""

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
