"""The crawl engine: a level-synchronized BFS over DataFrame snapshots.

Replaces the reference's thread-pool FIFO loop (map_reduce.rb:50-74,
agent.rb:37-93) with one Spark job per round:

  rank/pop (politeness-budgeted, window-ranked) → salted repartition by
  host → fetch (join vs the documents table — the table plays the web) →
  vectorized link/triple extraction → robots gate → intra-round first-wins
  dedup (F-4) → bloom-prefiltered anti-join vs seen (F-3) → deterministic
  seq assignment → checkpoint commit (enqueued / order / triples deltas +
  manifest).

Ordering contract (SURVEY.md §3.4): with unlimited budget this reproduces
the reference's workers=1 FIFO order *exactly* — children are ordered by
(parent_seq, emit_idx), dedup keeps the minimum, and seq is assigned by
that order, which is precisely sequential push order. Tested against the
pure-Python oracle (oracle.py) on the synthetic corpus.

State & scale design (10^10-URL frontier):
  * per round, only APPEND-ONLY DELTAS are written: `seen` (items first
    enqueued this round — this doubles as the frontier add-log), `order`
    (pops), `triples`. Nothing is ever rewritten; the live frontier is an
    in-memory DataFrame advanced incrementally and localCheckpoint'ed to
    break lineage. On resume the frontier is reconstructed as
    enqueued_all ⟕(anti seq) popped_all — a pure function of committed
    deltas, so kill-resume stays bit-identical (tested).
  * pop selection is a per-host window (shuffle on host), never a global
    sort; the global row_number for seq assignment runs only over the
    round's *new* items (bounded by popped × avg outdegree).
  * the seen-set anti-join is prefiltered by a broadcast bloom filter that
    is built ONCE when the seen set crosses bloom_min_seen and then grown
    incrementally from each round's delta — definite-misses never touch
    the seen table; only bloom-positives anti-join it (at cluster scale
    the seen table is bucketed by hash so that join is bucket-pruned).
  * hot hosts are salt-split (host_salt_k): repartition key is
    hash(host, pmod(xxhash64(uri), k)) so one host's queue fans out to k
    tasks, each owning budget/k (politeness preserved, skew removed).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..urlnorm import canonicalize, canonicalize_col, host_col, host_of, resolve
from . import bloom as bloom_mod
from .checkpoint import CrawlStore

FRONTIER_SCHEMA = "uri string, depth int, seq long, host string"
ORDER_SCHEMA = "seq long, uri string, depth int, round int"
TRIPLES_SCHEMA = (
    "s string, p string, o string, is_literal boolean, src_uri string, src_seq long"
)


@dataclass(frozen=True)
class CrawlConfig:
    depth: int = -1
    per_host_budget: int | None = None  # None = pop whole frontier (reference mode)
    max_rounds: int | None = None
    use_bloom: bool = True
    seen_filter: str = "bloom"  # 'bloom' | 'cuckoo' (deletable — observe-mode
    # recency expiry can REMOVE entries; a bloom can only grow, cuckoo.py)
    bloom_bits: int = 1 << 22
    bloom_k: int = 5
    bloom_min_seen: int = 20_000  # below this the plain anti-join is cheaper
    cuckoo_buckets: int = 1 << 16  # 4 slots each
    repartition_by_host: bool = False
    host_salt_k: int = 1  # >1 splits hot hosts across k politeness sub-queues
    politeness_delay_ms: int = 0  # recorded in manifests; honored by live fetchers
    robots: tuple[tuple[str, str], ...] = ()  # (host, disallow_path_prefix)
    redirects: tuple[tuple[str, str], ...] = ()  # (requested_uri, final_uri), F-16
    # priority queue (north rule: window-ranked SQL over frontier
    # snapshots). A SQL expression evaluated over the frontier columns
    # (uri, depth, seq, host); pops rank by (priority ASC, seq ASC).
    # None = pure FIFO (reference-equivalence mode, priority == seq).
    priority_expr: str | None = None


def _make_resolve_udf():
    """Relative-href resolution (fragment.rb:128-135) — Arrow-batched;
    urljoin is the one genuinely-Python step (no Spark builtin). Built
    lazily because pandas_udf needs an active session."""

    @F.pandas_udf("string")
    def _resolve_udf(base: pd.Series, href: pd.Series) -> pd.Series:
        return pd.Series(
            [
                canonicalize(h)
                if h.startswith(("http://", "https://"))
                else resolve(b, h)
                for b, h in zip(base, href)
            ]
        )

    return _resolve_udf


class LinkExtractor:
    """M1 link KB, fully native except href resolution (see semantics.py
    for the pure-Python spec it is tested against).

    extract(fetched) -> (triples, candidates):
      fetched:    uri, depth, seq, spans (null if the URL 404'd)
      triples:    TRIPLES_SCHEMA
      candidates: c_uri, c_depth, parent_seq, emit_idx
    """

    _cached: DataFrame | None = None

    def cleanup(self) -> None:
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None

    def extract(self, fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
        html = fetched.where(
            F.exists("spans", lambda s: s["kind"] != F.lit("media"))
        )
        links = (
            html.select("uri", "depth", "seq", F.explode("spans").alias("sp"))
            .where(F.col("sp.kind") == "link")
            .select(
                "uri",
                "depth",
                "seq",
                F.col("sp.media_ref").alias("href"),
                F.col("sp.offset").alias("offset"),
            )
        )
        # Split absolute/relative BEFORE resolving: when()/otherwise()
        # evaluates BOTH branches over the whole batch, which would push
        # every row through the Python UDF. Absolute hrefs (the vast
        # majority on the web) stay fully native/codegen'd; only relative
        # hrefs pay the Arrow round-trip for urljoin.
        is_abs = F.col("href").rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
        resolve_udf = _make_resolve_udf()
        abs_links = links.where(is_abs).withColumn(
            "target", canonicalize_col(F.col("href"))
        )
        rel_links = links.where(~is_abs).withColumn(
            "target", resolve_udf(F.col("uri"), F.col("href"))
        )
        resolved = abs_links.unionByName(rel_links).withColumn(
            "is_page_link", F.col("href").contains("?page=")
        )

        resolved = resolved.persist()
        self._cached = resolved  # released by cleanup() after round writes

        ref_triples = resolved.select(
            F.col("uri").alias("s"),
            F.lit("sc:references").alias("p"),
            F.col("target").alias("o"),
            F.lit(False).alias("is_literal"),
            F.col("uri").alias("src_uri"),
            F.col("seq").alias("src_seq"),
        )
        page_triples = resolved.where("is_page_link").select(
            F.col("target").alias("s"),
            F.lit("rdf:type").alias("p"),
            F.lit("sc:Page").alias("o"),
            F.lit(False).alias("is_literal"),
            F.col("uri").alias("src_uri"),
            F.col("seq").alias("src_seq"),
        )
        triples = ref_triples.unionAll(page_triples)

        agg = resolved.groupBy("seq", "uri", "depth", "target").agg(
            F.min("offset").alias("first_off"),
            F.min(F.when(F.col("is_page_link"), F.col("offset"))).alias("page_off"),
        )
        cand = (
            agg.withColumn("is_page", F.col("page_off").isNotNull())
            .where(
                F.col("is_page")
                | ((F.col("depth") != 0) & (F.col("target") != F.col("uri")))
            )
            .select(
                F.col("target").alias("c_uri"),
                F.when(F.col("is_page"), F.greatest(F.lit(-1), F.col("depth")))
                .otherwise(F.greatest(F.lit(-1), F.col("depth") - 1))
                .alias("c_depth"),
                F.col("seq").alias("parent_seq"),
                F.col("is_page"),
                F.when(F.col("is_page"), F.col("page_off"))
                .otherwise(F.col("first_off"))
                .alias("order_key"),
            )
        )
        emit_w = Window.partitionBy("parent_seq").orderBy(
            F.col("is_page").desc(), "order_key", "c_uri"
        )
        candidates = cand.withColumn("emit_idx", F.row_number().over(emit_w)).select(
            "c_uri", "c_depth", "parent_seq", "emit_idx"
        )
        return triples, candidates


class Crawler:
    def __init__(
        self,
        spark: SparkSession,
        documents: DataFrame,
        store_dir: str,
        config: CrawlConfig | None = None,
        extractor=None,
    ):
        self.spark = spark
        self.documents = documents
        self.store = CrawlStore(store_dir)
        self.cfg = config or CrawlConfig()
        self.extractor = extractor or LinkExtractor()
        self._frontier: DataFrame | None = None
        self._frontier_rows = 0
        self._seen_rows = 0
        self._bloom: bloom_mod.Bloom | None = None

    # ---------------------------------------------------------------- run
    def run(self, seeds: list[str] | None = None) -> dict:
        t0 = time.monotonic()
        self.store.rollback_incomplete()
        last = self.store.last_round()
        if last is None:
            if not seeds:
                raise ValueError("fresh crawl needs seeds")
            next_seq = self._bootstrap(seeds)
            last = 0
        else:
            next_seq = self._restore(last)

        rounds_done = 0
        popped_total = 0
        while self._frontier_rows > 0:
            if self.cfg.max_rounds is not None and rounds_done >= self.cfg.max_rounds:
                break
            rnd = last + 1
            next_seq, n_popped = self._round(rnd, next_seq)
            popped_total += n_popped
            last = rnd
            rounds_done += 1

        return {
            "rounds": last,
            "popped": popped_total,
            "next_seq": next_seq,
            "wall_sec": time.monotonic() - t0,
        }

    # ----------------------------------------------------------- plumbing
    def _set_frontier(self, df: DataFrame, rows: int) -> None:
        old = self._frontier
        # localCheckpoint: break lineage so round k's plan is O(1) deep;
        # content is reproducible from committed deltas regardless.
        # Lazy: materializes with the next round's first action (one fewer
        # job per round); eager would add a standalone materialization job.
        self._frontier = df.localCheckpoint(eager=False)
        self._frontier_rows = rows
        if old is not None:
            old.unpersist()

    def _restore(self, last: int) -> int:
        """Rebuild in-memory state from committed deltas (kill-resume)."""
        m = self.store.manifest(last)
        enq = self.store.read_all(self.spark, "seen", upto=last)
        popped = self.store.read_all(self.spark, "order", upto=last)
        frontier = enq.select("uri", "depth", "seq", "host")
        if popped is not None:
            frontier = frontier.join(popped.select("seq"), "seq", "left_anti")
        self._set_frontier(
            frontier.select("uri", "depth", "seq", "host"), m["frontier_rows"]
        )
        self._seen_rows = m["seen_rows"]
        if self.cfg.use_bloom and self._seen_rows >= self.cfg.bloom_min_seen:
            # _bloom is None here, so this takes the full-build branch for
            # whichever filter kind is configured
            self._update_bloom(enq, upto_round=last)
        return m["next_seq"]

    def _robots_filter(self, df: DataFrame, uri_col: str) -> DataFrame:
        """Robots disallow gate: drop rows whose (host, path) matches any
        broadcast rule — path = authority-relative part, '/' if empty.
        A disallowed URI is never enqueued (same rule in oracle.py)."""
        if not self.cfg.robots:
            return df
        rules = F.broadcast(
            self.spark.createDataFrame(
                list(self.cfg.robots), "r_host string, r_prefix string"
            )
        )
        path = F.regexp_extract(F.col(uri_col), r"^[^:]+://[^/]*(.*)$", 1)
        path = F.when(path == "", "/").otherwise(path)
        host = host_col(F.col(uri_col))
        return df.join(
            rules,
            (host == F.col("r_host")) & path.startswith(F.col("r_prefix")),
            "left_anti",
        )

    def _with_hash(self, items: DataFrame) -> DataFrame:
        return items.withColumn(
            "h", bloom_mod.seen_hash_col(F.col("uri"), F.col("depth"))
        )

    def _bootstrap(self, seeds: list[str]) -> int:
        """Round 0: canonicalize seeds, first-wins dedup, seq by seed order
        (matches oracle seeding)."""
        from ..oracle import robots_disallowed

        rows, seen = [], set()
        for s in seeds:
            uri = canonicalize(s)
            key = (uri, self.cfg.depth)
            if key in seen or robots_disallowed(uri, list(self.cfg.robots)):
                continue
            seen.add(key)
            rows.append((uri, self.cfg.depth, len(rows), host_of(uri)))
        frontier = self.spark.createDataFrame(rows, FRONTIER_SCHEMA)
        lineage = self.store.write_delta("seen", 0, self._with_hash(frontier))
        meta = {
            "round": 0,
            "next_seq": len(rows),
            "frontier_rows": len(rows),
            "seen_rows": len(rows),
            "config": self._config_meta(),
            "lineage": {"seen": lineage},
        }
        self.store.commit(0, meta)
        self._set_frontier(
            self.store.read_round(self.spark, "seen", 0).select(
                "uri", "depth", "seq", "host"
            ),
            len(rows),
        )
        self._seen_rows = len(rows)
        return len(rows)

    def _update_bloom(self, delta: DataFrame, upto_round: int) -> None:
        """Grow the accumulated seen filter: full build once past the
        threshold, then per-round delta updates (one tiny job / collect).
        upto_round is passed explicitly — this runs before the round's
        manifest commit, so last_round() would miss the newest delta."""
        cfg = self.cfg
        if not cfg.use_bloom:
            return
        if cfg.seen_filter == "cuckoo":
            import numpy as np

            from .cuckoo import CuckooFilter

            if self._bloom is None:
                if self._seen_rows >= cfg.bloom_min_seen:
                    seen = self.store.read_all(self.spark, "seen", upto=upto_round)
                    src = seen
                else:
                    return
            else:
                src = delta
            hashes = np.array(
                [r["h"] for r in src.select("h").collect()], dtype=np.int64
            ).view(np.uint64)
            filt = self._bloom or CuckooFilter(cfg.cuckoo_buckets)
            filt.insert_many(hashes)
            self._bloom = filt
            return
        if self._bloom is None:
            if self._seen_rows >= cfg.bloom_min_seen:
                seen = self.store.read_all(self.spark, "seen", upto=upto_round)
                self._bloom = bloom_mod.build_bloom(
                    seen.select("h"), cfg.bloom_bits, cfg.bloom_k
                )
        else:
            d = bloom_mod.build_bloom(delta.select("h"), cfg.bloom_bits, cfg.bloom_k)
            self._bloom.bits |= d.bits

    def _round(self, rnd: int, next_seq: int) -> tuple[int, int]:
        cfg = self.cfg
        frontier = self._frontier
        # -- pop selection (F-2, F-11): window-ranked priority queue.
        # Rank key = (priority_expr, seq); per-host partitioning caps each
        # host at the politeness budget. FIFO = no priority, no budget.
        order_cols = (
            [F.expr(cfg.priority_expr).asc(), F.col("seq").asc()]
            if cfg.priority_expr
            else [F.col("seq").asc()]
        )
        if cfg.per_host_budget is not None:
            w = Window.partitionBy("host").orderBy(*order_cols)
            ranked = frontier.withColumn("rk", F.row_number().over(w))
            popped = ranked.where(F.col("rk") <= cfg.per_host_budget).drop("rk")
            kept = ranked.where(F.col("rk") > cfg.per_host_budget).drop("rk")
        else:
            # budgetless: the whole snapshot pops this round, so priority
            # has no selection effect (it matters only under a budget)
            popped = frontier
            kept = frontier.limit(0)

        if cfg.repartition_by_host:
            # one task owns one (host, salt) politeness sub-queue; hot hosts
            # split across host_salt_k salts (SURVEY §4.2 custom #3)
            salt = F.pmod(F.xxhash64("uri"), F.lit(cfg.host_salt_k))
            popped = popped.repartition(F.hash(F.col("host"), salt))

        popped = popped.persist()

        # -- fetch: the documents table plays the web (S-1). Broadcast the
        # popped slice while it is small (big table never shuffles); for
        # huge rounds the driver-side collect a broadcast implies would
        # serialize, so let AQE pick the strategy (on a real cluster the
        # documents table is bucketed by doc_id and this is a co-located
        # join with no shuffle at all).
        # redirect accounting (F-16, agent.rb:61): the fetch lands on the
        # final URI; extraction and link emission run under it (the order
        # log keeps the REQUESTED uri). Extraction is pure, so re-deriving
        # a redirected target equals the reference's double-keyed cache.
        if cfg.redirects:
            redir = F.broadcast(
                self.spark.createDataFrame(
                    list(cfg.redirects), "r_from string, r_to string"
                )
            )
            to_fetch = (
                popped.join(redir, popped.uri == F.col("r_from"), "left")
                .select(
                    F.coalesce(F.col("r_to"), F.col("uri")).alias("uri"),
                    "depth",
                    "seq",
                )
            )
        else:
            to_fetch = popped

        pop_side = (
            F.broadcast(to_fetch) if self._frontier_rows <= 100_000 else to_fetch
        )
        fetched = self.documents.join(
            pop_side, self.documents.doc_id == pop_side.uri, "right"
        ).select("uri", "depth", "seq", "spans")

        triples, candidates = self.extractor.extract(fetched)

        # -- robots disallow gate (never enqueued; see _robots_filter)
        candidates = self._robots_filter(candidates, "c_uri")

        # -- intra-round first-wins dedup (F-4): min (parent_seq, emit_idx)
        dw = Window.partitionBy("c_uri", "c_depth").orderBy("parent_seq", "emit_idx")
        cand = (
            candidates.withColumn("rk", F.row_number().over(dw))
            .where("rk = 1")
            .drop("rk")
            .withColumn("h", bloom_mod.seen_hash_col(F.col("c_uri"), F.col("c_depth")))
        )

        # -- seen-set dedup (F-3): bloom prefilter + exact anti-join.
        # bloom only short-circuits definite misses; positives still
        # anti-join the committed seen deltas, so results are exact.
        seen = self.store.read_all(self.spark, "seen", upto=rnd - 1)
        if self._bloom is not None:
            cand = cand.withColumn(
                "maybe_seen",
                bloom_mod.might_contain_col(self.spark, self._bloom, F.col("h")),
            )
            definite_new = cand.where(~F.col("maybe_seen")).drop("maybe_seen")
            suspects = cand.where(F.col("maybe_seen")).drop("maybe_seen")
            checked = suspects.join(
                seen.select("uri", "depth").withColumnRenamed("uri", "c_uri")
                .withColumnRenamed("depth", "c_depth"),
                ["c_uri", "c_depth"],
                "left_anti",
            )
            new_items = definite_new.unionAll(checked)
        else:
            new_items = cand.join(
                seen.select("uri", "depth").withColumnRenamed("uri", "c_uri")
                .withColumnRenamed("depth", "c_depth"),
                ["c_uri", "c_depth"],
                "left_anti",
            )

        # -- deterministic seq assignment: push order = (parent_seq, emit_idx)
        enqueued = self._assign_seq(new_items, next_seq).persist()

        order_delta = popped.select("seq", "uri", "depth", F.lit(rnd).alias("round"))

        # the three delta writes are independent Spark actions — submit
        # them concurrently; shared cached intermediates (popped, resolved,
        # enqueued) are computed once thanks to block-level cache locking
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_order = pool.submit(self.store.write_delta, "order", rnd, order_delta)
            f_triples = pool.submit(self.store.write_delta, "triples", rnd, triples)
            f_seen = pool.submit(self.store.write_delta, "seen", rnd, enqueued)
            lineage = {
                "order": f_order.result(),
                "triples": f_triples.result(),
                "seen": f_seen.result(),
            }
        n_new = lineage["seen"]["rows"]
        n_popped = lineage["order"]["rows"]
        self._seen_rows += n_new
        self._update_bloom(enqueued, upto_round=rnd)

        meta = {
            "round": rnd,
            "config": self._config_meta(),
            "lineage": lineage,
            "next_seq": next_seq + n_new,
            "frontier_rows": self._frontier_rows - n_popped + n_new,
            "seen_rows": self._seen_rows,
        }
        self.store.commit(rnd, meta)

        self._set_frontier(
            kept.unionAll(enqueued.drop("h")),
            meta["frontier_rows"],
        )
        popped.unpersist()
        enqueued.unpersist()
        if hasattr(self.extractor, "cleanup"):
            self.extractor.cleanup()
        return meta["next_seq"], n_popped

    def _assign_seq(self, new_items: DataFrame, next_seq: int) -> DataFrame:
        """Global rank by (parent_seq, emit_idx) WITHOUT a single-partition
        sort (SURVEY §4.2 custom #4): range-repartition on the sort key,
        count per range, prefix-sum the offsets on the driver (tiny), then
        rank locally within each range. The output seq mapping depends only
        on the total order of the unique key, not on partition boundaries —
        so it is deterministic even though range sampling isn't.

        For small rounds the extra counting job costs more than it saves,
        so below _SEQ_RANGE_THRESHOLD pops we fall back to the single
        window (still exact, just a small sort)."""
        projected = new_items.select(
            F.col("c_uri").alias("uri"),
            F.col("c_depth").alias("depth"),
            F.col("parent_seq"),
            F.col("emit_idx"),
            host_col(F.col("c_uri")).alias("host"),
            "h",
        )
        # upper bound on this round's pops = current frontier size
        if self._frontier_rows < self._SEQ_RANGE_THRESHOLD:
            w = Window.orderBy("parent_seq", "emit_idx")
            return projected.select(
                "uri",
                "depth",
                (F.row_number().over(w) + F.lit(next_seq - 1)).alias("seq"),
                "host",
                "h",
            )
        n_parts = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        parts = projected.repartitionByRange(
            n_parts, "parent_seq", "emit_idx"
        ).persist()
        counts = {
            r["pid"]: r["cnt"]
            for r in parts.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        offsets = {}
        acc = next_seq
        for pid in sorted(counts):  # range partitions are ordered by key
            offsets[pid] = acc
            acc += counts[pid]
        off_df = F.broadcast(
            self.spark.createDataFrame(
                [(int(p), int(o)) for p, o in offsets.items()], "pid int, off long"
            )
        )
        lw = Window.partitionBy("pid").orderBy("parent_seq", "emit_idx")
        out = (
            parts.withColumn("pid", F.spark_partition_id())
            .join(off_df, "pid")
            .select(
                "uri",
                "depth",
                (F.row_number().over(lw) + F.col("off") - 1).alias("seq"),
                "host",
                "h",
            )
        )
        return out

    _SEQ_RANGE_THRESHOLD = 5_000

    def _config_meta(self) -> dict:
        return {
            "depth": self.cfg.depth,
            "per_host_budget": self.cfg.per_host_budget,
            "politeness_delay_ms": self.cfg.politeness_delay_ms,
            "host_salt_k": self.cfg.host_salt_k,
            "robots": list(self.cfg.robots),
        }

    # ------------------------------------------------------------ readers
    def order_df(self) -> DataFrame:
        df = self.store.read_all(self.spark, "order")
        return df if df is not None else self.spark.createDataFrame([], ORDER_SCHEMA)

    def seen_df(self) -> DataFrame:
        return self.store.read_all(self.spark, "seen")

    def frontier_df(self) -> DataFrame:
        """Current pending frontier, reconstructed from committed deltas."""
        enq = self.seen_df().select("uri", "depth", "seq", "host")
        popped = self.store.read_all(self.spark, "order")
        if popped is None:
            return enq
        return enq.join(popped.select("seq"), "seq", "left_anti")

    def triples_df(self) -> DataFrame:
        df = self.store.read_all(self.spark, "triples")
        if df is None:
            return self.spark.createDataFrame([], TRIPLES_SCHEMA)
        return df

    def clean_triples_df(self) -> DataFrame:
        """F-14 (agent.rb:160-162) + F-13 set merge (agent.rb:102-103)."""
        bookkeeping = ("sc:Index", "sc:Page", "sc:NewUri")
        return (
            self.triples_df()
            .where(~((F.col("p") == "rdf:type") & F.col("o").isin(*bookkeeping)))
            .select("s", "p", "o", "is_literal")
            .dropDuplicates(["s", "p", "o"])
        )
