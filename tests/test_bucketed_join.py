"""Bucketed fetch-join layout: the documents side of the fetch join must
need NO exchange when read from the bucketed table — the executable form
of PLANS.md's 'bucketed co-located join' cluster path."""

from pyspark.sql import functions as F

from scrappy_spark.corpus import CorpusConfig, generate_df
from scrappy_spark.sources.bucketed import (
    read_documents_table,
    write_bucketed_documents,
)


def test_fetch_join_skips_documents_exchange(spark, tmp_path):
    docs = generate_df(spark, CorpusConfig(n_docs=300), partitions=4)
    write_bucketed_documents(
        docs, "web_bucketed", buckets=8, path=str(tmp_path / "web")
    )
    web = read_documents_table(spark, "web_bucketed")
    assert web.count() == 300

    popped = web.select(F.col("doc_id").alias("uri")).limit(200)
    # force the non-broadcast path (the regime where bucketing matters)
    joined = web.join(
        popped.hint("SHUFFLE_MERGE"), web.doc_id == popped.uri, "right"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # exactly one side shuffles: the popped slice moves to the bucket
    # layout, the bucketed web table is scanned in place
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan[:2000]
    assert "SortMergeJoin" in plan

    # and the join result is correct
    assert joined.where(F.col("spans").isNotNull()).count() == 200
    spark.sql("DROP TABLE IF EXISTS web_bucketed")


def test_int8_store_join_skips_store_exchange(spark, tmp_path, sf_dir):
    """The ANN serving layout: a candidate list joining the bucketed int8
    store on vec_id shuffles ONLY the candidate side."""
    from scrappy_spark.operators.similarity import _emb, int8_quantized
    from scrappy_spark.sources.bucketed import write_bucketed_int8_store

    store = int8_quantized(_emb(spark, sf_dir))
    write_bucketed_int8_store(
        store, "int8_store", buckets=8, path=str(tmp_path / "int8")
    )
    tbl = spark.table("int8_store")
    n = tbl.count()
    assert n == store.count()

    cands = tbl.select(F.col("vec_id").alias("cand_id")).limit(n // 2)
    joined = tbl.join(
        cands.hint("SHUFFLE_MERGE"), tbl.vec_id == cands.cand_id, "right"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan[:2000]
    assert "SortMergeJoin" in plan
    assert joined.where(F.col("q").isNotNull()).count() == n // 2
    spark.sql("DROP TABLE IF EXISTS int8_store")
