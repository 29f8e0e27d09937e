"""The crawl engine: a level-synchronized BFS over DataFrame snapshots.

Replaces the reference's thread-pool FIFO loop (map_reduce.rb:50-74,
agent.rb:37-93) with one Spark job per round:

  rank/pop (politeness-budgeted, window-ranked) → salted repartition by
  host → fetch (join vs the documents table — the table plays the web) →
  vectorized link/triple extraction → intra-round first-wins dedup (F-4) →
  bloom-prefiltered anti-join vs seen (F-3) → deterministic seq assignment
  → checkpoint commit (frontier / seen / order / triples + manifest).

Ordering contract (SURVEY.md §3.4): with unlimited budget this reproduces
the reference's workers=1 FIFO order *exactly* — children are ordered by
(parent_seq, emit_idx), dedup keeps the minimum, and seq is assigned by
that order, which is precisely sequential push order. Tested against the
pure-Python oracle (oracle.py) on the synthetic corpus.

Scale notes (10^10-URL frontier):
  * pop selection is a per-host window (shuffle on host), never a global
    sort; the global row_number for seq assignment runs only over the
    round's *new* items (bounded by popped × avg outdegree), and can be
    replaced by the two-level rank of SURVEY §4.2(4) when that bound is
    too big.
  * the seen-set anti-join is prefiltered by a broadcast bloom filter —
    definite-misses skip the shuffle entirely (bloom.py).
  * hot hosts are salt-split (host_salt_k): repartition key is
    hash(host, pmod(xxhash64(uri), k)) so one host's queue fans out to k
    tasks, each owning budget/k (politeness preserved, skew removed).
  * every round's state is an append-only checkpoint (checkpoint.py) —
    kill-resume is bit-identical because each round is a pure function of
    the previous round's committed state.
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
    bloom_bits: int = 1 << 22
    bloom_k: int = 5
    bloom_min_seen: int = 50_000  # below this the anti-join is cheaper than a build
    repartition_by_host: bool = False
    host_salt_k: int = 1  # >1 splits hot hosts across k politeness sub-queues
    politeness_delay_ms: int = 0  # recorded in manifests; honored by live fetchers
    robots: tuple[tuple[str, str], ...] = ()  # (host, disallow_path_prefix)


def _make_resolve_udf():
    """Relative-href resolution (fragment.rb:128-135) — Arrow-batched;
    urljoin is the one genuinely-Python step (no Spark builtin). Built
    lazily because pandas_udf needs an active session."""

    @F.pandas_udf("string")
    def _resolve_udf(base: pd.Series, href: pd.Series) -> pd.Series:
        return pd.Series([resolve(b, h) for b, h in zip(base, href)])

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
            html.select(
                "uri",
                "depth",
                "seq",
                F.explode("spans").alias("sp"),
            )
            .where(F.col("sp.kind") == "link")
            .select(
                "uri",
                "depth",
                "seq",
                F.col("sp.media_ref").alias("href"),
                F.col("sp.offset").alias("offset"),
            )
        )
        is_abs = F.col("href").rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
        resolve_udf = _make_resolve_udf()
        resolved = links.withColumn(
            "target",
            F.when(is_abs, canonicalize_col(F.col("href"))).otherwise(
                resolve_udf(F.col("uri"), F.col("href"))
            ),
        ).withColumn("is_page_link", F.col("href").contains("?page="))

        resolved = resolved.persist()
        self._cached = resolved  # released by cleanup() after the round's writes

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
                F.when(
                    F.col("is_page"), F.greatest(F.lit(-1), F.col("depth"))
                )
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
            next_seq = self.store.manifest(last)["next_seq"]

        rounds_done = 0
        popped_total = 0
        while True:
            if self.cfg.max_rounds is not None and rounds_done >= self.cfg.max_rounds:
                break
            m = self.store.manifest(last)
            if m["lineage"]["frontier"]["rows"] == 0:
                break
            self._seen_rows = sum(
                self.store.manifest(k)["lineage"]["seen"]["rows"]
                for k in range(last + 1)
            )
            frontier = self.store.read_round(self.spark, "frontier", last)
            rnd = last + 1
            next_seq, n_popped = self._round(rnd, frontier, next_seq)
            popped_total += n_popped
            last = rnd
            rounds_done += 1

        return {
            "rounds": last,
            "popped": popped_total,
            "next_seq": next_seq,
            "wall_sec": time.monotonic() - t0,
        }

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
        meta = {"round": 0, "next_seq": len(rows), "config": self._config_meta()}
        meta["lineage"] = {
            "frontier": self.store.write_delta("frontier", 0, frontier),
            "seen": self.store.write_delta("seen", 0, self._as_seen(frontier)),
        }
        self.store.commit(0, meta)
        return len(rows)

    def _as_seen(self, items: DataFrame) -> DataFrame:
        return items.select(
            "uri", "depth", bloom_mod.seen_hash_col(F.col("uri"), F.col("depth")).alias("h")
        )

    def _round(self, rnd: int, frontier: DataFrame, next_seq: int) -> tuple[int, int]:
        cfg = self.cfg
        # -- pop selection: per-host budget, lowest seq first (F-2, F-11)
        if cfg.per_host_budget is not None:
            w = Window.partitionBy("host").orderBy("seq")
            ranked = frontier.withColumn("rk", F.row_number().over(w))
            popped = ranked.where(F.col("rk") <= cfg.per_host_budget).drop("rk")
            kept = ranked.where(F.col("rk") > cfg.per_host_budget).drop("rk")
        else:
            popped = frontier
            kept = frontier.limit(0)

        if cfg.repartition_by_host:
            # one task owns one (host, salt) politeness sub-queue; hot hosts
            # split across host_salt_k salts (SURVEY §4.2 custom #3)
            salt = F.pmod(F.xxhash64("uri"), F.lit(cfg.host_salt_k))
            popped = popped.repartition(F.hash(F.col("host"), salt))

        popped = popped.persist()

        # -- fetch: the documents table plays the web (S-1); broadcast the
        # popped slice so the big table never shuffles
        fetched = self.documents.join(
            F.broadcast(popped), self.documents.doc_id == popped.uri, "right"
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
        )

        # -- seen-set dedup (F-3): bloom prefilter + exact anti-join
        seen = self.store.read_all(self.spark, "seen", upto=rnd - 1)
        cand = cand.withColumn(
            "h", bloom_mod.seen_hash_col(F.col("c_uri"), F.col("c_depth"))
        )
        if cfg.use_bloom and getattr(self, "_seen_rows", 0) >= cfg.bloom_min_seen:
            filt = bloom_mod.build_bloom(
                seen.select(F.col("h")), cfg.bloom_bits, cfg.bloom_k
            )
            cand = cand.withColumn(
                "maybe_seen",
                bloom_mod.might_contain_col(self.spark, filt, F.col("h")),
            )
            definite_new = cand.where(~F.col("maybe_seen")).drop("maybe_seen")
            suspects = cand.where(F.col("maybe_seen")).drop("maybe_seen")
            checked = suspects.join(
                seen,
                (suspects.c_uri == seen.uri) & (suspects.c_depth == seen.depth),
                "left_anti",
            )
            new_items = definite_new.unionAll(checked)
        else:
            new_items = cand.join(
                seen,
                (cand.c_uri == seen.uri) & (cand.c_depth == seen.depth),
                "left_anti",
            )

        # -- deterministic seq assignment: push order = (parent_seq, emit_idx)
        seq_w = Window.orderBy("parent_seq", "emit_idx")
        enqueued = new_items.select(
            F.col("c_uri").alias("uri"),
            F.col("c_depth").alias("depth"),
            (F.row_number().over(seq_w) + F.lit(next_seq - 1)).alias("seq"),
            host_col(F.col("c_uri")).alias("host"),
        ).persist()

        new_frontier = kept.unionAll(enqueued)
        order_delta = popped.select(
            "seq", "uri", "depth", F.lit(rnd).alias("round")
        )

        meta = {
            "round": rnd,
            "config": self._config_meta(),
            "lineage": {
                "order": self.store.write_delta("order", rnd, order_delta),
                "triples": self.store.write_delta("triples", rnd, triples),
                "seen": self.store.write_delta("seen", rnd, self._as_seen(enqueued)),
                "frontier": self.store.write_delta("frontier", rnd, new_frontier),
            },
        }
        n_new = meta["lineage"]["seen"]["rows"]
        n_popped = meta["lineage"]["order"]["rows"]
        meta["next_seq"] = next_seq + n_new
        self.store.commit(rnd, meta)
        popped.unpersist()
        enqueued.unpersist()
        if hasattr(self.extractor, "cleanup"):
            self.extractor.cleanup()
        return next_seq + n_new, n_popped

    def _config_meta(self) -> dict:
        return {
            "depth": self.cfg.depth,
            "per_host_budget": self.cfg.per_host_budget,
            "politeness_delay_ms": self.cfg.politeness_delay_ms,
            "host_salt_k": self.cfg.host_salt_k,
        }

    # ------------------------------------------------------------ readers
    def order_df(self) -> DataFrame:
        df = self.store.read_all(self.spark, "order")
        return df if df is not None else self.spark.createDataFrame([], ORDER_SCHEMA)

    def seen_df(self) -> DataFrame:
        return self.store.read_all(self.spark, "seen")

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
