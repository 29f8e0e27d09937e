"""Observe mode (F-15, agent.rb:140-151): watch a URI list, re-crawl each
when its repository context falls outside the recency window.

The reference is a sleep loop (fetch all → sleep remainder of period).
Spark-first this is a periodic batch re-trigger with an injectable clock:
each tick re-crawls only stale URIs (the repository's recency gate S-9
prevents refetch inside the window — same behavior the reference gets
from its read-through path agent.rb:49-51). On a live cluster the tick is
driven by a scheduler or a Structured Streaming
Trigger.ProcessingTime(period) foreachBatch — tick() is the batch body.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..frontier import Crawler, CrawlConfig
from ..sources.repository import Repository


class Observer:
    def __init__(
        self,
        spark: SparkSession,
        documents: DataFrame,
        repository: Repository,
        watched: list[str],
        crawl_config: CrawlConfig | None = None,
    ):
        self.spark = spark
        self.documents = documents
        self.repo = repository
        self.watched = watched
        self.cfg = crawl_config or CrawlConfig(depth=0)

    def tick(self, now: int) -> dict:
        """One observation round: re-crawl stale watched URIs, store their
        extractions under context epoch=now. Returns per-tick metrics."""
        stale = self.repo.stale_uris(self.watched, now)
        if not stale:
            return {"now": now, "stale": 0, "fetched": 0}
        store = tempfile.mkdtemp(prefix="observe_")
        crawler = Crawler(self.spark, self.documents, store, self.cfg)
        stats = crawler.run(stale)
        triples = crawler.triples_df()
        for uri in stale:
            from pyspark.sql import functions as F

            per_uri = triples.where(F.col("src_uri") == uri).select(
                "s", "p", "o", "is_literal"
            )
            self.repo.store(uri, per_uri, now)
        return {"now": now, "stale": len(stale), "fetched": stats["popped"]}
