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
