"""Iceberg-backed store: the one-flag flip of the checkpoint layer.

The sandbox image carries no Iceberg runtime jar, so the full contract
test skips unless an Iceberg catalog can actually be instantiated — on a
real cluster (spark-submit --packages org.apache.iceberg:…) it runs the
same crawl + resume assertions as the parquet store."""

import pytest

from scrappy_spark.corpus import CorpusConfig, generate_df, generate_local, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.oracle import oracle_crawl


def _iceberg_available(spark, tmp_path) -> bool:
    spark.conf.set(
        "spark.sql.catalog.it_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it_test.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.it_test.warehouse", str(tmp_path / "warehouse")
    )
    try:
        spark.sql("CREATE NAMESPACE IF NOT EXISTS it_test.probe")
        return True
    except Exception:
        return False


def test_iceberg_store_crawl_and_resume(spark, tmp_path):
    if not _iceberg_available(spark, tmp_path):
        pytest.skip("no Iceberg runtime jar in this environment")
    from scrappy_spark.frontier.iceberg_store import IcebergCrawlStore

    cfg = CorpusConfig(n_docs=150)
    docs = generate_local(cfg)
    df = generate_df(spark, cfg, partitions=2)
    seeds = seeds_for(cfg, 2)
    golden = oracle_crawl(docs, seeds, depth=2)

    store = IcebergCrawlStore(spark, str(tmp_path / "s1"), "it_test.crawl1")
    c = Crawler(spark, df, str(tmp_path / "s1"), CrawlConfig(depth=2), store=store)
    c.run(seeds)
    order = [
        (r["seq"], r["uri"], r["depth"])
        for r in c.order_df().orderBy("round", "seq").collect()
    ]
    assert order == golden.order

    # kill-resume over the SAME manifest protocol
    store2 = IcebergCrawlStore(spark, str(tmp_path / "s2"), "it_test.crawl2")
    c1 = Crawler(
        spark, df, str(tmp_path / "s2"), CrawlConfig(depth=2, max_rounds=2),
        store=store2,
    )
    c1.run(seeds)
    store2b = IcebergCrawlStore(spark, str(tmp_path / "s2"), "it_test.crawl2")
    c2 = Crawler(spark, df, str(tmp_path / "s2"), CrawlConfig(depth=2), store=store2b)
    c2.run()
    order2 = [
        (r["seq"], r["uri"], r["depth"])
        for r in c2.order_df().orderBy("round", "seq").collect()
    ]
    assert order2 == golden.order
