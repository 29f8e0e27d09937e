"""Structured Streaming over the crawl store + watermarked aggregation."""

from pyspark.sql import functions as F

from scrappy_spark.corpus import CorpusConfig, generate_df, seeds_for
from scrappy_spark.frontier import Crawler, CrawlConfig
from scrappy_spark.streaming.state_stream import pops_per_round, windowed_fetch_rate


def test_order_stream_matches_batch(spark, tmp_path):
    cfg = CorpusConfig(n_docs=80)
    df = generate_df(spark, cfg, partitions=2)
    crawler = Crawler(spark, df, str(tmp_path / "store"), CrawlConfig(depth=1))
    crawler.run(seeds_for(cfg, 2))

    q = (
        pops_per_round(spark, str(tmp_path / "store"))
        .writeStream.format("memory")
        .queryName("rounds_live")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["round"]: r["pops"]
        for r in spark.sql("SELECT * FROM rounds_live").collect()
    }
    want = {
        r["round"]: r["cnt"]
        for r in crawler.order_df()
        .groupBy("round")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want and len(got) >= 2


def test_windowed_fetch_rate_with_watermark(spark, tmp_path):
    src = str(tmp_path / "events")
    rows = [(f"2026-01-01 00:00:{s:02d}", f"http://h/{s}") for s in range(0, 35, 5)]
    spark.createDataFrame(rows, "t string, uri string").select(
        F.col("t").cast("timestamp").alias("fetched_at"), "uri"
    ).write.parquet(src)

    stream = (
        spark.readStream.schema("fetched_at timestamp, uri string").parquet(src)
    )
    q = (
        windowed_fetch_rate(stream, window="10 seconds", watermark="5 seconds")
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rates = spark.sql("SELECT * FROM rates ORDER BY win_start").collect()
    # append mode emits only windows fully below the final watermark
    assert all(r["fetches"] == 2 for r in rates)
    assert len(rates) >= 2
