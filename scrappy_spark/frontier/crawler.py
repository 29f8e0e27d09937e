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
  * the seen-set anti-join is prefiltered by a broadcast bloom filter
    (auto-sized from the seen count and REBUILT larger when the seen set
    outgrows its design capacity — a fixed-size bloom silently degenerates
    to FPP≈1) or a sharded cuckoo filter (deletable; built distributively,
    never collecting raw hashes). Definite-misses never touch the seen
    table; only filter-positives take the exact membership check.
  * the seen store itself is bucketed + compacted (checkpoint.py): deltas
    fold into a base snapshot partitioned by pmod(h, B) every
    compact_every rounds, and the dedup join is CHAINED — candidates
    anti-join the (small, broadcast) tail deltas first, then the compacted
    base, which is held persisted and hash-partitioned on the join key so
    it is neither re-read from storage nor re-shuffled each round. The
    per-round seen cost is O(tail), flat in the number of rounds.
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
    bloom_bits: int | None = None  # None = auto-size from seen_rows at build
    # (m = n·growth·k/ln2, FPP ≈ 2^-k) and rebuild when seen_rows crosses
    # the design capacity; an explicit value pins the size (no rebuilds)
    bloom_k: int = 5
    bloom_min_seen: int = 20_000  # below this the plain anti-join is cheaper
    bloom_growth: float = 4.0  # headroom factor for auto-sized (re)builds
    cuckoo_buckets: int = 1 << 16  # total, across shards; 4 slots each
    cuckoo_shards: int = 16  # distributed-build shards (power of two)
    compact_every: int = 8  # fold seen deltas into the bucketed base every K
    # rounds (checkpoint.compact_seen); tail deltas between compactions are
    # the only per-round seen read
    seen_buckets: int = 64  # hash buckets of the compacted base (pmod(h, B))
    tail_broadcast_rows: int = 400_000  # tail anti-join broadcasts below this
    repartition_by_host: bool = False
    host_salt_k: int = 1  # >1 splits hot hosts across k politeness sub-queues
    politeness_delay_ms: int = 0  # recorded in manifests; honored by live fetchers
    robots: tuple[tuple, ...] = ()  # (host, path_prefix) legacy disallow
    # 2-tuples or (host, path_prefix, allow) 3-tuples; RFC 9309 longest-
    # match, tie → Allow (spec + parser: frontier/robots.py)
    host_budgets: tuple[tuple[str, int], ...] = ()  # per-host budget
    # overrides (robots.py delays_to_budgets); shadow per_host_budget —
    # with no base budget, unlisted hosts pop whole-frontier
    redirects: tuple[tuple[str, str], ...] = ()  # (requested_uri, final_uri), F-16
    dust_rules: tuple[tuple[str, str], ...] = ()  # (src, dst) URL-alias
    # rewrite rules (frontier/dust.py, mined by dust_rules + direction-
    # normalized), pre-ordered best-first; applied to seeds and to every
    # extracted candidate BEFORE the robots gate and the seen-set check,
    # so alias families unify WITHOUT fetching — the client-side
    # complement of `redirects` (server-declared aliases)
    # priority queue (north rule: window-ranked SQL over frontier
    # snapshots). A SQL expression evaluated over the frontier columns
    # (uri, depth, seq, host); pops rank by (priority ASC, seq ASC).
    # None = pure FIFO (reference-equivalence mode, priority == seq).
    priority_expr: str | None = None


def ranked_pop(
    frontier: DataFrame,
    per_host_budget: int | None,
    host_budgets: tuple[tuple[str, int], ...] = (),
    priority_expr: str | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Window-ranked politeness pop over a frontier snapshot — the north
    rule's "priority queue realized as window-ranked SQL over frontier
    snapshots", standalone so it is both the crawl loop's pop (F-2/F-11,
    `Crawler._round`) and a value-oracled driver entry (`f2_ranked_pop`).

    Rank key = (priority_expr ASC, seq ASC) within each host partition
    (pure FIFO when priority_expr is None); a row pops iff its rank ≤ the
    host's effective budget — a literal-map override (`host_budgets`,
    robots Crawl-delay translation) else the base, with no base meaning
    unbudgeted. Both the window and the budget map are codegen expressions:
    the only shuffle is the hash partition on host, and hot-host skew is
    the caller's salted-repartition concern (CrawlConfig.host_salt_k).

    Returns (ranked, popped, kept); callers that materialize more than one
    of them should persist `ranked` (one snapshot cache serves all
    filters).
    """
    order_cols = (
        [F.expr(priority_expr).asc(), F.col("seq").asc()]
        if priority_expr
        else [F.col("seq").asc()]
    )
    w = Window.partitionBy("host").orderBy(*order_cols)
    # effective budget = host override (crawl-delay translation) else
    # base; no base → unlisted hosts effectively unbudgeted
    base = F.lit(per_host_budget if per_host_budget is not None else (1 << 62))
    if host_budgets:
        bmap = F.create_map(*[F.lit(x) for hb in host_budgets for x in hb])
        limit = F.coalesce(
            F.try_element_at(bmap, F.col("host")).cast("long"), base
        )
    else:
        limit = base
    ranked = frontier.withColumn("rk", F.row_number().over(w))
    popped = ranked.where(F.col("rk") <= limit).drop("rk")
    kept = ranked.where(F.col("rk") > limit).drop("rk")
    return ranked, popped, kept


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
        store: CrawlStore | None = None,
    ):
        self.spark = spark
        self.documents = documents
        self.cfg = config or CrawlConfig()
        # fail-loud config validation (review r5): a 0/negative effective
        # budget means ranked_pop's rk <= budget never holds, the round
        # pops nothing, and the run() loop would spin forever on a
        # non-empty frontier. delays_to_budgets floors at 1; raw user
        # tuples get the same contract here.
        if self.cfg.per_host_budget is not None and self.cfg.per_host_budget < 1:
            raise ValueError(
                f"per_host_budget must be >= 1, got {self.cfg.per_host_budget} "
                "(use robots/trap gates to exclude hosts, not a 0 budget)"
            )
        bad = [(h, b) for h, b in (self.cfg.host_budgets or ()) if b < 1]
        if bad:
            raise ValueError(
                f"host_budgets must all be >= 1, got {bad[:3]} "
                "(use robots/trap gates to exclude hosts, not a 0 budget)"
            )
        # an empty-src DUST rule matches every URI and rewrites nothing
        # deterministic — an upstream mining bug; fail loud, never spin
        if any(not s for s, _ in (self.cfg.dust_rules or ())):
            raise ValueError(
                "dust_rules must have non-empty src patterns "
                "(direction-normalize the mined rules: longer -> shorter)"
            )
        # store override: pass an IcebergCrawlStore to checkpoint into
        # real Iceberg tables (frontier/iceberg_store.py); the default is
        # the Iceberg-shaped parquet store (checkpoint.py)
        self.store = store or CrawlStore(
            store_dir, seen_buckets=self.cfg.seen_buckets
        )
        self.extractor = extractor or LinkExtractor()
        self._frontier: DataFrame | None = None
        self._frontier_rows = 0
        self._seen_rows = 0
        self._base_rows = 0  # rows already folded into the compacted base
        self._bloom = None  # Bloom | ShardedCuckoo
        self._bloom_capacity = 0  # rebuild trigger for auto-sized blooms
        self._filter_bc = None  # broadcast handle (refreshed per generation)
        self._retired_bcs: list = []  # superseded broadcasts, destroyed
        # once the round that still references them has checkpointed
        self._seen_base_cache: DataFrame | None = None  # join-side base
        self._seen_base_upto = -2  # base round the cache was built from

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
            if n_popped == 0:
                # zero-progress backstop (review r5): with validated
                # budgets (>= 1) a non-empty frontier always pops at
                # least one row, so an empty round means a logic or
                # config regression — fail loudly instead of spinning
                # and committing empty-round manifests forever.
                raise RuntimeError(
                    f"crawl round {rnd} popped nothing from a frontier of "
                    f"{self._frontier_rows} rows — zero-progress loop"
                )
            popped_total += n_popped
            last = rnd
            rounds_done += 1

        # release executor-side state: a finished crawl must not leak
        # broadcasts / cached blocks into the session (one session runs
        # many crawls in tests and observe mode). The driver-side filter
        # object (_bloom) stays for introspection; a re-run re-broadcasts.
        if self._filter_bc is not None:
            self._filter_bc.destroy()
            self._filter_bc = None
        if self._seen_base_cache is not None:
            self._seen_base_cache.unpersist()
            self._seen_base_cache = None
            self._seen_base_upto = -2

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
        # EAGER: the inputs (popped/enqueued caches, the extractor cache)
        # are unpersisted right after this call — a lazy checkpoint would
        # re-execute the whole round pipeline at the next round's first
        # action, and on a cluster could re-derive range-partitioned seqs
        # from re-sampled boundaries after the offset map went stale.
        self._frontier = df.localCheckpoint(eager=True)
        self._frontier_rows = rows
        if old is not None:
            old.unpersist()

    def _restore(self, last: int) -> int:
        """Rebuild in-memory state from committed deltas (kill-resume)."""
        # reset filter state (ADVICE r2): a SECOND run() on the same
        # instance would otherwise hit the cuckoo delta-merge branch with
        # the FULL seen set as the delta, double-inserting every entry
        if self._filter_bc is not None:
            self._filter_bc.destroy()
            self._filter_bc = None
        self._bloom = None
        self._bloom_capacity = 0
        m = self.store.manifest(last)
        enq = self.store.read_seen(self.spark, upto=last)
        popped = self.store.read_all(self.spark, "order", upto=last)
        frontier = enq.select("uri", "depth", "seq", "host")
        if popped is not None:
            frontier = frontier.join(popped.select("seq"), "seq", "left_anti")
        self._set_frontier(
            frontier.select("uri", "depth", "seq", "host"), m["frontier_rows"]
        )
        self._seen_rows = m["seen_rows"]
        base = self.store.seen_base()
        self._base_rows = (
            self.store.manifest(base["upto"])["seen_rows"] if base else 0
        )
        if self.cfg.use_bloom and self._seen_rows >= self.cfg.bloom_min_seen:
            # _bloom is None here, so this takes the full-build branch for
            # whichever filter kind is configured
            self._update_bloom(enq, upto_round=last)
        return m["next_seq"]

    def _cuckoo_per_shard_for(self, seen_rows: int) -> int:
        """Per-shard bucket count (power of two) sized so ``seen_rows`` ×
        bloom_growth fits under the ~95% cuckoo fill ceiling — shared by
        the initial build and the saturation growth-rebuild."""
        from .cuckoo import SLOTS

        cfg = self.cfg
        per = max(64, cfg.cuckoo_buckets // cfg.cuckoo_shards)
        target = int(seen_rows * cfg.bloom_growth)
        while cfg.cuckoo_shards * per * SLOTS * 95 < target * 100:
            per *= 2
        return per

    def _robots_filter(self, df: DataFrame, uri_col: str) -> DataFrame:
        """Robots gate: drop rows whose (authority, path) is disallowed
        under the config rules — authority = full host[:port] (the reference
        keys robots state on the full authority, fragment.rb; a URI on an
        explicit non-default port is a DIFFERENT authority), path =
        authority-relative part, '/' if empty. RFC 9309 longest-match with
        Allow overrides, same spec as oracle.robots_disallowed; never
        enqueued when disallowed. Config rules are a literal-array
        expression (robots.disallow_expr) — pure codegen, no join; a
        web-scale rules TABLE goes through robots.gate instead."""
        if not self.cfg.robots:
            return df
        from .robots import authority_path_cols, disallow_expr

        authority, path = authority_path_cols(F.col(uri_col))
        return df.where(~disallow_expr(authority, path, self.cfg.robots))

    def _with_hash(self, items: DataFrame) -> DataFrame:
        return items.withColumn(
            "h", bloom_mod.seen_hash_col(F.col("uri"), F.col("depth"))
        )

    def _bootstrap(self, seeds: list[str]) -> int:
        """Round 0: canonicalize seeds, first-wins dedup, seq by seed order
        (matches oracle seeding)."""
        from ..oracle import dust_rewrite, robots_disallowed

        rows, seen = [], set()
        for s in seeds:
            uri = dust_rewrite(canonicalize(s), self.cfg.dust_rules)
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
        """Grow the accumulated seen filter. Full builds AND delta updates
        run as distributed jobs (mapInPandas partition-merge) — raw seen
        hashes are never collected to the driver; only compact bitmaps /
        fingerprint tables travel. An auto-sized bloom is rebuilt larger
        when seen_rows crosses its design capacity (a fixed bloom's FPP
        silently walks to 1 right when the prefilter matters most).
        upto_round is passed explicitly — this runs before the round's
        manifest commit, so last_round() would miss the newest delta."""
        cfg = self.cfg
        if not cfg.use_bloom:
            return
        changed = False
        if cfg.seen_filter == "cuckoo":
            from .cuckoo import build_sharded

            if self._bloom is None:
                if self._seen_rows >= cfg.bloom_min_seen:
                    seen = self.store.read_seen(self.spark, upto=upto_round)
                    # size the INITIAL build from the actual seen count,
                    # not just the static config floor (review r4: a
                    # resume over a grown seen set would otherwise build
                    # an immediately-saturated all-True filter and waste
                    # a round before the growth path below kicks in)
                    self._bloom = build_sharded(
                        seen.select("h"),
                        cfg.cuckoo_shards,
                        self._cuckoo_per_shard_for(self._seen_rows),
                    )
                    changed = True
            else:
                cur_per = self._bloom.buckets_per_shard
                d = build_sharded(delta.select("h"), cfg.cuckoo_shards, cur_per)
                self._bloom.merge(d)
                changed = True
                if self._bloom.saturated_shards:
                    # saturated shards answer all-True (safe but useless as
                    # a prefilter) — rebuild the WHOLE filter at a larger
                    # geometry from the committed seen set, mirroring the
                    # bloom's capacity-overflow rebuild (VERDICT r3 #6:
                    # without this, a saturated shard stays all-True for
                    # the rest of the crawl). Always at least doubles;
                    # power-of-two steps keep the bucket count valid.
                    new_per = max(
                        cur_per * 2,
                        self._cuckoo_per_shard_for(self._seen_rows),
                    )
                    seen = self.store.read_seen(self.spark, upto=upto_round)
                    self._bloom = build_sharded(
                        seen.select("h"), cfg.cuckoo_shards, new_per
                    )
        else:
            overflow = (
                self._bloom is not None
                and cfg.bloom_bits is None
                and self._seen_rows > self._bloom_capacity
            )
            if self._bloom is None or overflow:
                if self._seen_rows >= cfg.bloom_min_seen:
                    n_bits = cfg.bloom_bits or bloom_mod.auto_bits(
                        int(self._seen_rows * cfg.bloom_growth), cfg.bloom_k
                    )
                    seen = self.store.read_seen(self.spark, upto=upto_round)
                    self._bloom = bloom_mod.build_bloom(
                        seen.select("h"), n_bits, cfg.bloom_k
                    )
                    self._bloom_capacity = bloom_mod.design_capacity(
                        n_bits, cfg.bloom_k
                    )
                    changed = True
            else:
                d = bloom_mod.build_bloom(
                    delta.select("h"), self._bloom.n_bits, self._bloom.k
                )
                self._bloom.bits |= d.bits
                changed = True
        if changed:
            # one broadcast per filter generation; the superseded one is
            # RETIRED here and destroyed at end-of-round — this round's
            # plans (incl. the frontier checkpoint) still reference it, and
            # destroying a broadcast a live plan references is an error
            if self._filter_bc is not None:
                self._retired_bcs.append(self._filter_bc)
            self._filter_bc = bloom_mod.broadcast_filter(self.spark, self._bloom)

    def _filter_meta(self) -> dict | None:
        """Filter health for the round manifest (north rule: per-round
        metrics; VERDICT r1 #3: record measured FPP)."""
        f = self._bloom
        if f is None:
            return None
        if isinstance(f, bloom_mod.Bloom):
            return {
                "kind": "bloom",
                "n_bits": f.n_bits,
                "k": f.k,
                "capacity": self._bloom_capacity,
                "fill": round(f.fill_ratio(), 6),
                "est_fpp": round(f.est_fpp(), 8),
            }
        from .cuckoo import SLOTS

        load = f.count / (f.n_shards * f.buckets_per_shard * SLOTS)
        return {
            "kind": "cuckoo",
            "shards": f.n_shards,
            "buckets_per_shard": f.buckets_per_shard,
            "count": f.count,
            "saturated_shards": f.saturated_shards,
            # 2 candidate buckets × 4 slots × uniform 16-bit fp match
            "est_fpp": round(8.0 * load / 65536.0, 10),
        }

    def _round(self, rnd: int, next_seq: int) -> tuple[int, int]:
        cfg = self.cfg
        frontier = self._frontier
        # -- pop selection (F-2, F-11): window-ranked priority queue.
        # Rank key = (priority_expr, seq); per-host partitioning caps each
        # host at the politeness budget. FIFO = no priority, no budget.
        if cfg.per_host_budget is not None or cfg.host_budgets:
            ranked, popped, kept = ranked_pop(
                frontier,
                cfg.per_host_budget,
                cfg.host_budgets,
                cfg.priority_expr,
            )
            # cache the ranked snapshot once: popped, kept, and the order
            # delta are all cheap filters over it
            ranked.persist()
        else:
            # budgetless: the whole snapshot pops this round, so priority
            # has no selection effect (it matters only under a budget);
            # frontier is already checkpoint-materialized — no extra cache
            ranked = None
            popped = frontier
            kept = frontier.limit(0)

        if cfg.repartition_by_host:
            # one task owns one (host, salt) politeness sub-queue; hot hosts
            # split across host_salt_k salts (SURVEY §4.2 custom #3)
            salt = F.pmod(F.xxhash64("uri"), F.lit(cfg.host_salt_k))
            popped = popped.repartition(F.hash(F.col("host"), salt))

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
            F.broadcast(to_fetch)
            if self._frontier_rows <= self._FETCH_BROADCAST_MAX
            else to_fetch
        )
        # INNER join (review r5): popped URLs with no document row (404s)
        # carry null spans that every extractor drops on its first filter,
        # so inner ≡ the old right-outer here — and BroadcastHashJoin can
        # only build the preserved side for Inner/LeftOuter/LeftSemi, so
        # the right-outer silently dropped the broadcast hint and
        # sort-merge-shuffled the span-heavy documents table every round.
        # (The order log is unaffected: order_delta reads `popped`.)
        fetched = self.documents.join(
            pop_side, self.documents.doc_id == pop_side.uri, "inner"
        ).select("uri", "depth", "seq", "spans")

        triples, candidates = self.extractor.extract(fetched)

        # -- DUST canonicalization (frontier/dust.py): alias candidates
        # rewrite to their canonical family member BEFORE the robots
        # gate and the seen-set check, so the seen-set unifies and the
        # alias is never fetched. Map-only literal-array expression —
        # config-scale rules, zero extra shuffles.
        if self.cfg.dust_rules:
            from .dust import rewrite_col

            candidates = candidates.withColumn(
                "c_uri", rewrite_col(F.col("c_uri"), self.cfg.dust_rules)
            )

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

        # -- seen-set dedup (F-3): filter prefilter + exact membership.
        # The filter only short-circuits definite misses; positives still
        # take the exact check against base+tail, so results are exact.
        if self._filter_bc is not None:
            # persist before the definite/suspect fan-out (review r5, same
            # discipline as `ranked`/`resolved`): the two branches are one
            # unionAll plan, and without a cache each re-runs the dedup
            # window sort, robots gate, hash, and the might_contain Arrow
            # round-trip over ALL candidates.
            cand = cand.withColumn(
                "maybe_seen",
                bloom_mod.might_contain_bc(self._filter_bc, F.col("h")),
            ).persist()
            cand_cached = cand
            definite_new = cand.where(~F.col("maybe_seen")).drop("maybe_seen")
            suspects = cand.where(F.col("maybe_seen")).drop("maybe_seen")
            new_items = definite_new.unionAll(self._anti_seen(suspects, rnd))
        else:
            cand_cached = None
            new_items = self._anti_seen(cand, rnd)

        # -- deterministic seq assignment: push order = (parent_seq, emit_idx)
        enqueued = self._assign_seq(new_items, next_seq).persist()

        order_delta = popped.select("seq", "uri", "depth", F.lit(rnd).alias("round"))

        # ONE concurrent wave for the round's tail (optimization r6,
        # guide §2.6 — previously two sequential waves: the three delta
        # writes, then bloom ∥ frontier checkpoint). All five actions
        # are independent given the cached inputs, with one exception:
        # the filter update's REBUILD paths read the committed seen set
        # `upto=rnd`, i.e. the seen dir this wave is writing — so the
        # bloom task chains on the seen-write future instead of on the
        # whole wave. Shared cached intermediates (popped, resolved,
        # enqueued) are computed once thanks to block-level cache
        # locking; the checkpoint plan holds its own reference to the
        # CURRENT filter broadcast, so the bloom thread swapping
        # `_filter_bc` mid-wave cannot affect it (destroy of the retired
        # broadcast stays deferred to end-of-round, below). The manifest
        # commit consumes all results after the join.
        from concurrent.futures import ThreadPoolExecutor

        next_frontier = kept.unionAll(enqueued.drop("h"))
        with ThreadPoolExecutor(max_workers=5) as pool:
            f_order = pool.submit(self.store.write_delta, "order", rnd, order_delta)
            f_triples = pool.submit(self.store.write_delta, "triples", rnd, triples)
            f_seen = pool.submit(self.store.write_delta, "seen", rnd, enqueued)
            # eager localCheckpoint (see _set_frontier) — materialized
            # here, swapped in below; only then is it safe to drop the
            # caches the round plan was built from
            f_ck = pool.submit(next_frontier.localCheckpoint, True)

            def _bloom_after_seen() -> None:
                f_seen.result()  # rebuild paths read seen upto=rnd
                self._update_bloom(enqueued, upto_round=rnd)

            f_bloom = pool.submit(_bloom_after_seen)
            lineage = {
                "order": f_order.result(),
                "triples": f_triples.result(),
                "seen": f_seen.result(),
            }
            f_bloom.result()
            ck_frontier = f_ck.result()
        n_new = lineage["seen"]["rows"]
        n_popped = lineage["order"]["rows"]
        self._seen_rows += n_new

        meta = {
            "round": rnd,
            "config": self._config_meta(),
            "lineage": lineage,
            "next_seq": next_seq + n_new,
            "frontier_rows": self._frontier_rows - n_popped + n_new,
            "seen_rows": self._seen_rows,
            "filter": self._filter_meta(),
        }
        self.store.commit(rnd, meta)

        old_frontier = self._frontier
        self._frontier = ck_frontier
        self._frontier_rows = meta["frontier_rows"]
        if old_frontier is not None:
            old_frontier.unpersist()
        if ranked is not None:
            ranked.unpersist()
        if cand_cached is not None:
            cand_cached.unpersist()
        enqueued.unpersist()
        if self._seq_parts is not None:
            self._seq_parts.unpersist()
            self._seq_parts = None
        for bc in self._retired_bcs:
            bc.destroy()
        self._retired_bcs.clear()
        if hasattr(self.extractor, "cleanup"):
            self.extractor.cleanup()

        # fold seen deltas into the bucketed base once the tail is
        # compact_every rounds deep — per-round seen reads stay O(tail).
        # Runs LAST (ADVICE r2): compaction deletes the old base version
        # and folded deltas, so every live plan with lineage into those
        # files (the frontier pre-checkpoint, the persisted base cache)
        # must be materialized/retired first; the base cache is dropped
        # here and rebuilt from the NEW base on next use.
        base = self.store.seen_base()
        if (
            self._seen_rows > self._base_rows
            and rnd - (base["upto"] if base else 0) >= self.cfg.compact_every
        ):
            self.store.compact_seen(self.spark, upto=rnd)
            self._base_rows = self._seen_rows
            if self._seen_base_cache is not None:
                self._seen_base_cache.unpersist()
                self._seen_base_cache = None
                self._seen_base_upto = -2
        return meta["next_seq"], n_popped

    # -- seen-membership join sides (the scale path of F-3) ---------------
    def _seen_join_sides(
        self, rnd: int
    ) -> tuple[DataFrame | None, int, DataFrame | None]:
        """(tail, tail_rows, base): the chained anti-join inputs for rounds
        > base_upto. The base side is persisted hash-partitioned on the
        join key and reused across rounds (rebuilt only after compaction),
        so the committed seen set is neither re-read from storage nor
        re-shuffled each round — the per-round cost is the tail."""
        marker = self.store.seen_base()
        base_upto = marker["upto"] if marker else -1
        if marker is not None and self._seen_base_upto != base_upto:
            if self._seen_base_cache is not None:
                self._seen_base_cache.unpersist()
            n = int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
            self._seen_base_cache = (
                self.store.read_seen(self.spark, upto=base_upto)
                .select(
                    F.col("uri").alias("c_uri"), F.col("depth").alias("c_depth")
                )
                .repartition(n, "c_uri", "c_depth")
                .persist()
            )
            self._seen_base_upto = base_upto
        tail = self.store.read_delta_range(
            self.spark, "seen", base_upto + 1, rnd - 1
        )
        tail_rows = self._seen_rows - self._base_rows
        return tail, tail_rows, self._seen_base_cache if marker else None

    def _anti_seen(self, cand: DataFrame, rnd: int) -> DataFrame:
        """Exact F-3 membership: x ∉ (base ∪ tail) as chained anti-joins —
        the small tail broadcasts (no shuffle at all); the base side joins
        from its persisted co-partitioned cache."""
        out = cand
        tail, tail_rows, base = self._seen_join_sides(rnd)
        if tail is not None:
            t = tail.select(
                F.col("uri").alias("c_uri"), F.col("depth").alias("c_depth")
            )
            if tail_rows <= self.cfg.tail_broadcast_rows:
                t = F.broadcast(t)
            out = out.join(t, ["c_uri", "c_depth"], "left_anti")
        if base is not None:
            out = out.join(base, ["c_uri", "c_depth"], "left_anti")
        return out

    def _assign_seq(self, new_items: DataFrame, next_seq: int) -> DataFrame:
        """Global rank by (parent_seq, emit_idx) WITHOUT an unpartitioned
        window (SURVEY §4.2 custom #4) — Spark executes those as a
        single-partition sort of ALL candidates (pops × out-degree rows)
        and warns about it: range-repartition on the sort key, count per
        range, prefix-sum the offsets on the driver (tiny), then rank
        locally within each range. The output seq mapping depends only on
        the total order of the unique key, not on partition boundaries —
        so it is deterministic even though range sampling isn't.

        Small rounds (pops bounded by _SEQ_RANGE_THRESHOLD, so candidates
        are bounded too) take the same path with n_parts=1: no counting
        job, one bounded-size sort task, and still no unpartitioned
        window — the gate keys on the round's pop bound, which bounds the
        candidate count, not the other way around (VERDICT r1 #6)."""
        projected = new_items.select(
            F.col("c_uri").alias("uri"),
            F.col("c_depth").alias("depth"),
            F.col("parent_seq"),
            F.col("emit_idx"),
            host_col(F.col("c_uri")).alias("host"),
            "h",
        )
        # upper bound on this round's pops = current frontier size
        small = self._frontier_rows < self._SEQ_RANGE_THRESHOLD
        n_parts = (
            1
            if small
            else int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))
        )
        parts = projected.repartitionByRange(n_parts, "parent_seq", "emit_idx")
        if n_parts == 1:
            offsets = {0: next_seq}
        else:
            parts = parts.persist()
            self._seq_parts = parts  # released in _round after the frontier
            # checkpoint materializes (an early unpersist would let a
            # re-sampled range boundary re-derive different pids against a
            # stale offset map)
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

    # pops bound below which the range path collapses to one partition:
    # candidates ≈ pops × out-degree stay a sub-second single-task sort,
    # and the n_parts=1 path skips the per-range counting job entirely —
    # measured on the sf0.1 headline crawl, 8192 beats 1024 by ~15%
    # (the counting job per mid-size round costs more than it saves)
    _SEQ_RANGE_THRESHOLD = 8_192
    _seq_parts: DataFrame | None = None

    # fetch-join strategy bound: popped rows are ~100 B (uri, depth,
    # seq); below this the popped side broadcasts so the (wide,
    # span-heavy) documents side is never shuffled. Measured on the
    # bulk-drain shape (150k-pop rounds, fresh JVMs): raising the bound
    # to 500k made local[8] 24% faster but local[32] ~30% SLOWER — the
    # driver-side broadcast build is serial and caps wide parallelism —
    # so past this bound the shuffle join (AQE's choice) wins exactly
    # where scaling matters. Keep the bound modest; cluster path above it
    # is a bucketed co-located join.
    _FETCH_BROADCAST_MAX = 100_000

    def _config_meta(self) -> dict:
        return {
            "depth": self.cfg.depth,
            "per_host_budget": self.cfg.per_host_budget,
            "politeness_delay_ms": self.cfg.politeness_delay_ms,
            "host_salt_k": self.cfg.host_salt_k,
            "robots": [list(r) for r in self.cfg.robots],
            "host_budgets": [list(hb) for hb in self.cfg.host_budgets],
            "dust_rules": [list(r) for r in self.cfg.dust_rules],
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
