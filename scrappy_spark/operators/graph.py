"""Link-graph analytics: distributed PageRank with an exact integer
fixed-point arithmetic contract.

Why it belongs in a crawl engine: the north rule's frontier is a
window-ranked priority queue; production crawlers (and training-data
pipelines choosing what to fetch/keep) rank that queue by link-graph
centrality — OPIC / PageRank over the outlink graph the crawl itself
discovers. The reference's agent loop has no graph analytics (its queue
is FIFO, `lib/scrappy/agent/agent.rb` visit loop); this layer is
pipeline-mandate territory, the same class as dedup/similarity.

Exactness contract — stronger than the decimal-sum discipline the other
scorers use: the ENTIRE iteration runs in BIGINT fixed-point at scale
1e-9. Ranks start at 10^9 (1.0); the per-edge contribution
``(2*rank + out_deg) div (2*out_deg)`` is exact HALF_UP of
rank/out_deg on the rational itself; the damping step
``base_i + (2*num*mass + den) div (2*den)`` is exact HALF_UP of
``num/den * mass``. No float appears anywhere in the loop, so Spark,
DuckDB, and a pure-Python mirror agree bit-for-bit — no libm, no
rounding-mode, no summation-order hazard. (An earlier all-double
variant drifted 1-2 ulps at the 9th decimal between engines' round()
implementations; integers end that class of bug.) The float `rank`
output column is a single CAST(rank_i)/1e9 applied identically by both
engines to identical integers.

Overflow discipline: every multi-term intermediate (the mass sum and
the damping multiply) runs in DECIMAL(38,0) — matching the DuckDB
oracle's HUGEINT aggregation and un-overflowable for any physical
graph. The only remaining wrap point is the silent bigint conversion
of the per-node quotients (the engine does NOT run ANSI; session.py
leaves Spark's default), which is excluded up front by a one-time
precondition: 2*(base + n_nodes*SCALE_I) < 2^63, i.e. ~4.6e9 nodes at
SCALE_I = 1e9. Larger graphs get a loud ValueError telling the caller
to lower SCALE_I, never silently corrupt ranks.

100 TB shape: edges are persisted once and re-joined per iteration
(2 shuffles per iteration: rank join keyed by src, contribution groupBy
keyed by dst); the rank table is node-sized (≪ edges) and is rebuilt
per iteration behind an eager localCheckpoint that cuts the loop
lineage — the same kernel discipline as dedup.components_from_pairs.
No collect, no global window, no cross join; dangling nodes (out_deg 0)
simply contribute nothing, and nodes with no in-edges are re-seated by
the left join against the persisted node set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Mirrored literally into the DuckDB oracle. Damping 0.85 is carried as
# the rational 85/100 — never as a float.
DAMPING_NUM = 85
DAMPING_DEN = 100
ITERATIONS = 10
SCALE_I = 1_000_000_000  # fixed-point unit: 1.0 == 10^9


def pagerank(
    edges: DataFrame,
    iterations: int = ITERATIONS,
    damping_num: int = DAMPING_NUM,
    damping_den: int = DAMPING_DEN,
) -> DataFrame:
    """PageRank over a directed edge list ``(src, dst)``; returns
    ``(node, rank_i, rank)`` with ``rank_i`` the exact fixed-point
    value and ``rank = rank_i / 1e9`` its double rendering.

    Unnormalized fixed-iteration variant: every node starts at 1.0 and
    updates as ``rank' = (1-d) + d * sum(rank_src/out_deg)`` with the
    exact integer rounding described in the module docstring — the
    deterministic form a cross-engine oracle requires (a
    convergence-threshold stop would make the iteration count
    float-dependent). Multi-edges are collapsed (distinct) so edge
    multiplicity cannot silently reweight the graph; self-loops are
    kept as given by the caller.
    """
    base_i = (damping_den - damping_num) * SCALE_I // damping_den
    if base_i * damping_den != (damping_den - damping_num) * SCALE_I:
        raise ValueError("damping_den must divide (den-num)*SCALE_I exactly")
    e = edges.select("src", "dst").distinct().persist()
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    edeg = e.join(deg, "src").persist()
    edeg.count()  # materialize once; every iteration reuses this
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # overflow precondition, checked ONCE (node-sized count, cheap):
    # every intermediate runs in DECIMAL(38,0) — un-overflowable for any
    # physical graph — so the only wrap point left is Spark's silent
    # bigint conversion of the per-node `div` results. Ranks are bounded
    # by base + d*(total mass) <= base + n*SCALE_I, and the expressions
    # double that bound, so requiring 2*(base + n*SCALE_I) < 2^63
    # guarantees every bigint in the loop is exact. At SCALE_I = 1e9
    # that admits ~4.6e9 nodes; beyond it, lower SCALE_I — and this
    # check tells the caller so instead of wrapping silently (ANSI is
    # off; an earlier negative-rank guard was unsound anyway, since a
    # double wrap past 2^64 lands back on a positive value).
    n_nodes = nodes.count()
    if 2 * (base_i + n_nodes * SCALE_I) >= 2**63:
        e.unpersist()
        edeg.unpersist()
        nodes.unpersist()
        raise ValueError(
            f"pagerank: {n_nodes} nodes at SCALE_I={SCALE_I} can exceed "
            "int64 rank bounds — lower SCALE_I"
        )
    ranks = nodes.select(
        "node", F.lit(SCALE_I).cast("bigint").alias("rank_i")
    ).localCheckpoint()
    # nodes with NO in-edges receive an empty contribution sum every
    # iteration, so their rank is the CONSTANT damping base: precompute
    # them once and union per iteration instead of re-seating the whole
    # node set through a per-iteration left join (optimization r6, guide
    # §2.4 — the join planned as an Exchange+Sort-per-side SortMergeJoin
    # every iteration; the union is exchange-free). Exactness: every
    # node with ≥ 1 in-edge appears in `mass` every iteration (the
    # contribution join emits a row for every edge, with no filter), so
    # mass ∪ no_in partitions the node set, and the no_in value equals
    # the old coalesce-to-0 path: base_i + (2·d·0 + den) div (2·den)
    # = base_i.
    no_in = (
        nodes.join(
            e.select(F.col("dst").alias("node")).distinct(),
            "node",
            "left_anti",
        )
        .select("node", F.lit(base_i).cast("bigint").alias("rank_i"))
        .localCheckpoint()
    )
    # DECIMAL(38,0) intermediates: the sum matches the DuckDB oracle's
    # HUGEINT aggregation semantics and cannot wrap; `div` on decimals
    # returns the exact integral quotient as bigint (in range by the
    # precondition above)
    contrib_expr = F.expr(
        "(2 * CAST(rank_i AS DECIMAL(38,0)) + out_deg) div (2 * out_deg)"
    )
    damp_expr = F.expr(
        f"{base_i} + (2 * {damping_num} * mass + {damping_den}) "
        f"div (2 * {damping_den})"
    )
    # TWO iterations share one checkpointed plan (optimization r6):
    # the rank table is referenced once per iteration (the contribution
    # join), so chaining keeps the plan linear while halving the
    # eager-materialization jobs — measured 7.8 s → 4.2 s on the bench
    # graph with bit-identical ranks (the arithmetic is unchanged, only
    # where the lineage is cut moves). The previous checkpoint is
    # released by the JVM's ContextCleaner once the reference drops
    # (DataFrame.unpersist() is a no-op on localCheckpoint RDDs).
    done = 0
    while done < iterations:
        steps = min(2, iterations - done)
        cur = ranks
        for _ in range(steps):
            contrib = (
                edeg.join(cur, edeg["src"] == cur["node"])
                .select(F.col("dst").alias("node"), contrib_expr.alias("c"))
            )
            mass = contrib.groupBy("node").agg(
                F.sum(F.col("c").cast("decimal(38,0)")).alias("mass")
            )
            cur = mass.select(
                "node", damp_expr.cast("bigint").alias("rank_i")
            ).unionAll(no_in)
        ranks = cur.localCheckpoint()
        done += steps
    e.unpersist()
    edeg.unpersist()
    nodes.unpersist()
    return ranks.select(
        "node",
        "rank_i",
        (F.col("rank_i").cast("double") / SCALE_I).alias("rank"),
    )


# ------------------------------------------------------------- TrustRank
#
# Seeded (personalized) PageRank — the classical anti-spam frontier
# prioritizer (Gyöngyi, Garcia-Molina, Pedersen, "Combating Web Spam with
# TrustRank", VLDB 2004 — public paper): trust mass is injected ONLY at a
# hand-vetted seed set and propagates along outlinks, so link farms that
# inflate raw PageRank (which teleports everywhere uniformly) collect
# little trust. A production crawler ranks its frontier by a blend of
# rank and trust and demotes high-rank/low-trust hosts; the DUST/trap
# layers (frontier/) handle URL-level spam, this handles GRAPH-level spam.
#
# Same exactness contract as pagerank: the entire iteration runs in BIGINT
# fixed-point at SCALE_I, all multi-term intermediates in DECIMAL(38,0)
# (DuckDB mirrors in HUGEINT), HALF_UP rationals for the division points.
# The only change from pagerank is the base term: per-node
# base_i = (1-d)*SCALE_I for seeds, 0 for non-seeds (the unnormalized
# personalization vector — the same unnormalized form our pagerank uses,
# so the two scores are directly comparable per node), and ranks start at
# SCALE_I on seeds / 0 elsewhere. Trust totals are bounded by the
# pagerank bound (the seed base is pointwise ≤ pagerank's uniform base),
# so pagerank's overflow precondition 2*(base + n*SCALE_I) < 2^63 is
# sufficient here too and is checked the same way.
#
# 100 TB shape: identical to pagerank — 2 shuffles per iteration against
# the persisted edge list, node-sized rank table localCheckpoint'ed per
# iteration, plus ONE broadcast-sized hash anti/semi-join equivalent:
# seed membership is carried as a precomputed 0/1 column on the node
# table (one left-semi-style join at setup, not per iteration).


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = ITERATIONS,
    damping_num: int = DAMPING_NUM,
    damping_den: int = DAMPING_DEN,
) -> DataFrame:
    """TrustRank over a directed edge list ``(src, dst)`` with a seed
    table ``(node)``; returns ``(node, trust_i, trust)`` with ``trust_i``
    the exact fixed-point value and ``trust = trust_i / 1e9`` its double
    rendering.

    Unnormalized fixed-iteration variant of seeded PageRank:
    ``trust' = (1-d)*[node in seeds] + d * sum(trust_src/out_deg)`` with
    the exact integer rounding described in the pagerank docstring.
    Seeds not present in the graph contribute nothing (they have no
    edges to carry their mass); fails loudly if NO seed is a graph node,
    since every trust score would be identically 0 and the ranking
    carries no information."""
    base_i = (damping_den - damping_num) * SCALE_I // damping_den
    if base_i * damping_den != (damping_den - damping_num) * SCALE_I:
        raise ValueError("damping_den must divide (den-num)*SCALE_I exactly")
    e = edges.select("src", "dst").distinct().persist()
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    seed_nodes = seeds.select("node").distinct()
    # carry the TARGET's seed flag on the persisted edge table (one
    # setup join) so the per-iteration damping needs no node-table
    # re-seat join (optimization r6 — see the pagerank loop note)
    edeg = (
        e.join(deg, "src")
        .join(
            seed_nodes.select(
                F.col("node").alias("dst"), F.lit(1).alias("dst_seed")
            ),
            "dst",
            "left",
        )
        .select(
            "src",
            "dst",
            "out_deg",
            F.coalesce("dst_seed", F.lit(0)).alias("dst_seed"),
        )
        .persist()
    )
    edeg.count()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            seed_nodes.select("node", F.lit(1).alias("is_seed")),
            "node",
            "left",
        )
        .select("node", F.coalesce("is_seed", F.lit(0)).alias("is_seed"))
        .persist()
    )
    # pagerank's overflow precondition is sufficient (trust base is
    # pointwise <= pagerank's uniform base, so trust_i <= rank_i bound)
    n_nodes = nodes.count()
    if 2 * (base_i + n_nodes * SCALE_I) >= 2**63:
        e.unpersist()
        edeg.unpersist()
        nodes.unpersist()
        raise ValueError(
            f"trustrank: {n_nodes} nodes at SCALE_I={SCALE_I} can exceed "
            "int64 bounds — lower SCALE_I"
        )
    if nodes.where(F.col("is_seed") == 1).limit(1).count() == 0:
        e.unpersist()
        edeg.unpersist()
        nodes.unpersist()
        raise ValueError(
            "trustrank: no seed is a graph node — all trust would be 0"
        )
    ranks = nodes.select(
        "node",
        (F.col("is_seed") * SCALE_I).cast("bigint").alias("rank_i"),
    ).localCheckpoint()
    # the pagerank union-const shape (optimization r6): nodes with no
    # in-edges keep the constant is_seed·base_i every iteration; all
    # other nodes appear in `mass` every iteration BECAUSE the former
    # zero-trust prefilter is gone — that filter was semantically a
    # no-op (summing zeros) but made the mass node set data-dependent,
    # which the union shape cannot allow; without it the iteration cost
    # equals pagerank's (map-side partial aggregation absorbs the zero
    # rows), and the per-iteration node-table re-seat join disappears.
    no_in = (
        nodes.join(
            e.select(F.col("dst").alias("node")).distinct(),
            "node",
            "left_anti",
        )
        .select(
            "node",
            (F.col("is_seed") * base_i).cast("bigint").alias("rank_i"),
        )
        .localCheckpoint()
    )
    contrib_expr = F.expr(
        "(2 * CAST(rank_i AS DECIMAL(38,0)) + out_deg) div (2 * out_deg)"
    )
    damp_expr = F.expr(
        f"is_seed * {base_i} + (2 * {damping_num} * mass + {damping_den}) "
        f"div (2 * {damping_den})"
    )
    # two iterations per checkpointed plan — the pagerank chaining note
    done = 0
    while done < iterations:
        steps = min(2, iterations - done)
        cur = ranks
        for _ in range(steps):
            contrib = (
                edeg.join(cur, edeg["src"] == cur["node"])
                .select(
                    F.col("dst").alias("node"),
                    F.col("dst_seed"),
                    contrib_expr.alias("c"),
                )
            )
            mass = contrib.groupBy("node").agg(
                F.sum(F.col("c").cast("decimal(38,0)")).alias("mass"),
                # dst_seed is constant within the group (a property of
                # the key); max() just carries it through the aggregation
                F.max("dst_seed").alias("is_seed"),
            )
            cur = mass.select(
                "node", damp_expr.cast("bigint").alias("rank_i")
            ).unionAll(no_in)
        ranks = cur.localCheckpoint()
        done += steps
    e.unpersist()
    edeg.unpersist()
    nodes.unpersist()
    return ranks.select(
        F.col("node"),
        F.col("rank_i").alias("trust_i"),
        (F.col("rank_i").cast("double") / SCALE_I).alias("trust"),
    )


# ------------------------------------------------------------------ HITS
#
# Kleinberg's hubs & authorities — the second classical link-centrality a
# crawl frontier ranks by (hub scores find link directories worth
# re-crawling for discovery; authority scores find content worth fetching
# first). Same exactness contract as pagerank: the entire iteration runs
# in integer fixed-point. The classical L2 normalization needs sqrt
# (libm — not IEEE-pinned across engines), so this uses L1 normalization,
# whose fixed point carries the same ranking information and is exact:
# after each half-step the vector is rescaled to sum ~ SCALE_I via the
# HALF_UP rational (2*v*SCALE + s) div (2*s), all intermediates in
# DECIMAL(38,0) (DuckDB mirrors in HUGEINT — both are exact integer
# arithmetic, so the engines agree bit-for-bit). Normalized entries are
# bounded by SCALE_I, so the bigint cast after the div can never wrap —
# no overflow precondition needed (unlike pagerank, whose ranks grow with
# the graph).
#
# 100 TB shape: per iteration, two equi-joins of the node-sized score
# vector against the persisted edge list and two groupBy partial aggs
# (keyed dst then src) — the same 2-shuffles-per-iteration budget as
# pagerank; the two L1 sums are node-sized scalar aggregates (partial agg
# per partition, one final row). Score vectors are localCheckpoint'ed
# per half-step to truncate the loop lineage.

HITS_ITERATIONS = 4


def hits(edges: DataFrame, iterations: int = HITS_ITERATIONS) -> DataFrame:
    """HITS over a directed edge list ``(src, dst)``; returns
    ``(node, hub_i, auth_i, hub, auth)`` with the ``_i`` columns the
    exact L1-normalized fixed-point scores and hub/auth their double
    renderings (a single CAST/1e9 both engines apply to identical
    integers).

    Fixed-iteration variant (the deterministic form a cross-engine
    oracle requires); multi-edges collapsed (distinct) as in pagerank.
    Update order is the standard one: authorities from the PREVIOUS
    hubs, then hubs from the NEW authorities. Nodes with no in-edges
    get authority 0; no out-edges, hub 0. Fails loudly on an empty edge
    list (both L1 sums would be 0 — there is no meaningful fixed point
    to report)."""
    if iterations < 1:
        # fail loud up front (ADVICE r5): iterations=0 would leave `auth`
        # unassigned below and surface as an UnboundLocalError with the
        # edge DataFrame still persisted
        raise ValueError(f"hits: iterations must be >= 1, got {iterations}")
    e = edges.select("src", "dst").distinct().persist()
    if e.limit(1).count() == 0:
        e.unpersist()
        raise ValueError("hits: empty edge list — no scores to compute")
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    nodes.count()  # materialize; the zero-score constants derive from it
    # the pagerank union-const shape (optimization r6): a node that never
    # appears on a half-step's OUT side scores a constant 0 every
    # iteration — precompute both constant tables once and union them per
    # half-step instead of re-seating the node set through a left join
    # (an Exchange+Sort per half-step). Every out-side node appears in
    # `raw` every half-step because `scores` always covers the full node
    # set (init and each half-step output do), so raw ∪ zeros partitions
    # the nodes.
    zero_auth = (
        nodes.join(
            e.select(F.col("dst").alias("node")).distinct(), "node", "left_anti"
        )
        .select("node", F.lit(0).cast("bigint").alias("score"))
        .localCheckpoint()
    )
    zero_hub = (
        nodes.join(
            e.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
        )
        .select("node", F.lit(0).cast("bigint").alias("score"))
        .localCheckpoint()
    )
    # HALF_UP L1 rescale of a DECIMAL(38,0) column v against scalar sum s
    norm_expr = F.expr(f"CAST((2 * v * {SCALE_I} + s) div (2 * s) AS BIGINT)")
    hub = nodes.select(
        "node", F.lit(SCALE_I).cast("bigint").alias("score")
    ).localCheckpoint()

    def _half_step(
        scores: DataFrame, key_in: str, key_out: str, zeros: DataFrame
    ) -> DataFrame:
        """One propagation + L1 rescale: raw(out) = Σ scores(in) over
        edges, normalized to sum ≈ SCALE_I. Returns (node, score) —
        LAZY; callers decide where to cut lineage."""
        raw = (
            e.join(scores, e[key_in] == scores["node"])
            .groupBy(F.col(key_out).alias("node"))
            .agg(F.sum(F.col("score").cast("decimal(38,0)")).alias("v"))
        )
        total = raw.agg(
            F.sum("v").cast("decimal(38,0)").alias("s")
        )
        return (
            raw.crossJoin(F.broadcast(total))
            .select(
                "node",
                # coalesce keeps the old degenerate-total behavior: a
                # zero L1 sum nulls the div and scored 0 before too
                F.coalesce(
                    norm_expr, F.lit(0).cast("bigint")
                ).alias("score"),
            )
            .unionAll(zeros)
        )

    # one checkpoint per FULL iteration, not per half-step (optimization
    # r6 — the pagerank chaining note): the auth half-step stays lazy
    # inside the hub half-step's plan, halving the eager jobs; only the
    # LAST iteration checkpoints auth too, because the output joins it
    # (otherwise the final join would re-run that half-step).
    auth = None
    for i in range(iterations):
        auth = _half_step(hub, "src", "dst", zero_auth)
        if i == iterations - 1:
            auth = auth.localCheckpoint()
        hub = _half_step(auth, "dst", "src", zero_hub).localCheckpoint()
    out = (
        hub.select("node", F.col("score").alias("hub_i"))
        .join(auth.select("node", F.col("score").alias("auth_i")), "node")
        .select(
            "node",
            "hub_i",
            "auth_i",
            (F.col("hub_i").cast("double") / SCALE_I).alias("hub"),
            (F.col("auth_i").cast("double") / SCALE_I).alias("auth"),
        )
    )
    e.unpersist()
    nodes.unpersist()
    return out


# -------------------------------------------------- driver-contract entry

# Deterministic synthetic outlink graph over the documents table (the
# same derived-input pattern as retrieval.bm25_topk's doc_id%50 queries):
# doc s emits edges to (s*31 + 7*j) % N for j = 1..(1+s%4), dropped if
# the target equals the source or is absent from the corpus. The
# multiplier/stride make long cycles, the degree term makes skew — a
# graph where fixed-iteration PR is genuinely iterative.
LINK_MULT = 31
LINK_STRIDE = 7
LINK_MAXDEG = 4
# arrival-order permutation for the prioritized-pop entry (see
# pagerank_prioritized_pop docstring): bijection on [0, SEQ_PERM_MOD)
SEQ_PERM_MULT = 131071
SEQ_PERM_MOD = 1048573


def doc_link_edges(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    keep_index: bool = False,
) -> DataFrame:
    """Synthetic outlink graph over documents — THE single edge
    generator (pagerank, prioritized pop, and webgraph's anchor/host
    rollups all consume it; review r5 removed webgraph's line-for-line
    copy, whose silent drift would have invalidated the cross-operator
    oracle claim). ``keep_index=True`` retains the per-source link
    index ``j`` for callers that derive per-link attributes (webgraph's
    anchor ids)."""
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = docs.select("doc_id")
    n = docs.groupBy().agg(F.count("*").alias("n_docs"))
    edges = (
        docs.crossJoin(F.broadcast(n))
        .select(
            F.col("doc_id").alias("src"),
            F.explode(
                F.sequence(
                    F.lit(1), F.lit(1) + (F.col("doc_id") % LINK_MAXDEG)
                )
            ).alias("j"),
            "n_docs",
        )
        .select(
            "src",
            "j",
            (
                (F.col("src") * LINK_MULT + LINK_STRIDE * F.col("j"))
                % F.col("n_docs")
            ).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
    # keep only targets that are real documents (robust to non-contiguous
    # doc_id spaces; mirrored by the oracle's IN subquery)
    out = edges.join(
        docs.select(F.col("doc_id").alias("dst")), "dst", "left_semi"
    )
    return out.select("src", "j", "dst") if keep_index else out.select(
        "src", "dst"
    )


def doc_pagerank(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Driver entry: PageRank over the synthetic document outlink graph,
    columns (doc_id, rank_i, rank)."""
    pr = pagerank(doc_link_edges(spark, sf_dir, docs))
    return pr.select(F.col("node").alias("doc_id"), "rank_i", "rank")


def doc_hits(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Driver entry: HITS over the synthetic document outlink graph,
    columns (doc_id, hub_i, auth_i, hub, auth)."""
    h = hits(doc_link_edges(spark, sf_dir, docs))
    return h.select(
        F.col("node").alias("doc_id"), "hub_i", "auth_i", "hub", "auth"
    )


# Seed selection for the TrustRank driver entry: every doc_id divisible
# by this prime is "hand-vetted trusted" (~1.9% of the corpus) — sparse
# enough that trust genuinely propagates (most nodes' trust arrives via
# edges, not the base term), deterministic on both engines.
TRUST_SEED_MOD = 53


def doc_trustrank(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Driver entry: TrustRank over the synthetic document outlink graph,
    seeds = doc_id % TRUST_SEED_MOD == 0, columns (doc_id, trust_i,
    trust)."""
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seeds = docs.where(
        F.col("doc_id") % TRUST_SEED_MOD == 0
    ).select(F.col("doc_id").alias("node"))
    tr = trustrank(doc_link_edges(spark, sf_dir, docs), seeds)
    return tr.select(F.col("node").alias("doc_id"), "trust_i", "trust")


# ------------------------------------------------------------------ OPIC
#
# On-line Page Importance Computation (Abiteboul, Preda, Cobena,
# "Adaptive On-Line Page Importance Computation", WWW 2003 — public
# paper): THE crawler-native importance algorithm — importance
# accumulates WHILE crawling, no convergence loop over a frozen graph.
# Every page holds CASH (init 1 unit); when the crawler fetches a page,
# its cash is recorded into its HISTORY and simultaneously distributed
# equally to its outlinks; importance ∝ history. Level-synchronized
# variant here: pages popped in the same crawl round distribute
# together — exactly the engine's round structure, so the pop schedule
# (node, round) drives the iteration.
#
# Exactness: BIGINT fixed-point at SCALE_I; the per-edge share is
# HALF_UP(cash/out_deg) (rounding pennies leak deterministically —
# identical in both engines); cash of a popped DANGLING page moves to
# history but exits circulation (the paper routes it through a virtual
# page; the deviation is documented and deterministic). history is
# monotone; totals are bounded by R × total initial cash, far under the
# DECIMAL(38,0) intermediates.
#
# 100 TB shape: the round loop is bounded by the crawl's round count
# (config-scale, the pagerank-iterations class). Per round: one join of
# the node-sized state against the popped set + persisted edges, one
# partial-agg groupBy(dst) — 2 shuffles, state localCheckpoint'ed (the
# pagerank lineage discipline).


def opic(
    edges: DataFrame, pops: DataFrame, rounds: int
) -> DataFrame:
    """OPIC over a directed edge list ``(src, dst)`` and a pop schedule
    ``(node, round)`` (each node popped in at most one round, rounds in
    1..rounds); returns ``(node, hist_i, cash_i, opic_i)`` with
    ``opic_i = hist_i + cash_i`` the importance estimate in SCALE_I
    fixed-point. Fails loudly if a schedule round is out of range."""
    e = edges.select("src", "dst").distinct().persist()
    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    edeg = e.join(deg, "src").persist()
    edeg.count()
    p = pops.select("node", "round").distinct().localCheckpoint()
    # BOTH schedule validations in ONE aggregation job (optimization r6;
    # two separate limit(1).count() probes each paid a full pass):
    # range violations fold through the per-node grouping, duplicates
    # are per-node counts > 1
    chk = (
        p.groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.max(
                (
                    (F.col("round") < 1) | (F.col("round") > rounds)
                ).cast("int")
            ).alias("bad"),
        )
        .agg(
            F.max((F.col("c") > 1).cast("int")).alias("dup"),
            F.max("bad").alias("bad"),
        )
        .collect()[0]
    )
    if chk["bad"]:
        e.unpersist()
        edeg.unpersist()
        raise ValueError(
            f"opic: pop schedule has rounds outside 1..{rounds}"
        )
    # a node scheduled in two rounds would duplicate its state row
    # through the left join below — doubled cash, duplicate output
    # (review r5); fail loud like the round-range check above
    if chk["dup"]:
        e.unpersist()
        edeg.unpersist()
        raise ValueError(
            "opic: pop schedule lists a node in more than one round — "
            "each node pops at most once"
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(p, "node", "left")
        .select("node", F.col("round").alias("pop_round"))
        .persist()
    )
    # overflow precondition (the pagerank/trustrank discipline): each
    # node pops at most once, so hist_i <= the cash it held at pop <=
    # total circulating cash = n*SCALE_I, and cash_i <= n*SCALE_I; the
    # bigint casts below wrap silently past 2^63 (ANSI off), so exclude
    # it up front instead
    n_nodes = nodes.count()
    if 2 * n_nodes * SCALE_I >= 2**63:
        e.unpersist()
        edeg.unpersist()
        nodes.unpersist()
        raise ValueError(
            f"opic: {n_nodes} nodes at SCALE_I={SCALE_I} can exceed "
            "int64 bounds — lower SCALE_I"
        )
    state = nodes.select(
        "node",
        F.lit(SCALE_I).cast("bigint").alias("cash_i"),
        F.lit(0).cast("bigint").alias("hist_i"),
    ).localCheckpoint()
    share = F.expr(
        "(2 * CAST(cash_i AS DECIMAL(38,0)) + out_deg) div (2 * out_deg)"
    )
    # NOTE: unlike the pagerank/trustrank loops, chaining two rounds per
    # checkpoint was MEASURED SLOWER here (7.7 s vs 5.3 s): the state
    # table is referenced twice per round (spend + update), so a chained
    # plan references the checkpoint 4× and the extra planning/broadcast
    # work exceeds the saved job — one checkpoint per round stays.
    r = 1
    while r <= rounds:
        steps = 1
        cur = state
        for rr in range(r, r + steps):
            popped = nodes.where(F.col("pop_round") == rr).select("node")
            spend = cur.join(popped, "node")  # cash being distributed
            inflow = (
                spend.join(edeg, spend["node"] == edeg["src"])
                .where(F.col("cash_i") > 0)
                .select(F.col("dst").alias("node"), share.alias("c"))
                .groupBy("node")
                .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("inflow"))
            )
            cur = (
                cur.join(
                    popped.select("node", F.lit(1).alias("is_pop")),
                    "node",
                    "left",
                )
                .join(inflow, "node", "left")
                .select(
                    "node",
                    (
                        F.when(F.col("is_pop") == 1, F.lit(0)).otherwise(
                            F.col("cash_i")
                        )
                        + F.coalesce(
                            F.col("inflow"), F.lit(0).cast("decimal(38,0)")
                        )
                    )
                    .cast("bigint")
                    .alias("cash_i"),
                    (
                        F.col("hist_i")
                        + F.when(
                            F.col("is_pop") == 1, F.col("cash_i")
                        ).otherwise(F.lit(0))
                    )
                    .cast("bigint")
                    .alias("hist_i"),
                )
            )
        state = cur.localCheckpoint()
        r += steps
    e.unpersist()
    edeg.unpersist()
    nodes.unpersist()
    return state.select(
        "node",
        "hist_i",
        "cash_i",
        (F.col("hist_i") + F.col("cash_i")).alias("opic_i"),
    )


# pop schedule for the driver entry: every graph node popped in exactly
# one of OPIC_ROUNDS rounds, spread by a fixed affine residue
OPIC_ROUNDS = 9


def doc_opic(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Driver entry: OPIC over the synthetic outlink graph with the
    deterministic pop schedule round = 1 + (doc_id*7) % OPIC_ROUNDS;
    columns (doc_id, hist_i, cash_i, opic_i)."""
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    pops = docs.select(
        d.alias("node"),
        (1 + (d * 7) % OPIC_ROUNDS).cast("int").alias("round"),
    )
    out = opic(doc_link_edges(spark, sf_dir, docs), pops, OPIC_ROUNDS)
    return out.select(
        F.col("node").alias("doc_id"), "hist_i", "cash_i", "opic_i"
    )


# ------------------------------------------------------------- spam mass
#
# Calibration-free spam-mass reading (Gyöngyi, Berkhin, Garcia-Molina,
# Pedersen, "Link Spam Detection Based on Mass Estimation", VLDB 2006 —
# public paper): a host that collects a much larger SHARE of global
# PageRank than of seeded TrustRank is accumulating importance from
# untrusted regions of the graph — the promotion/demotion signal a
# production frontier feeds back into its budgets. Shares (not raw
# scores) sidestep the rank-vs-trust scale calibration the paper spends
# a section on: both are exact ppm rationals of their own totals.
#
# Exactness: rank_i/trust_i are the BIGINT fixed-point outputs; host
# sums and totals are DECIMAL(38,0) (DuckDB HUGEINT); each share is ONE
# HALF_UP integer rational (2*1e6*part + total) div (2*total). No float
# anywhere. 100 TB shape: one node-sized equi-join (rank ⋈ trust on
# node), one partial-agg groupBy(host), one 1-row totals broadcast —
# nothing edge-sized after the constituent ranks are computed.

SPAM_HOST_MOD = 13


def host_spam_signal(
    spark: SparkSession, sf_dir: str, docs: DataFrame | None = None
) -> DataFrame:
    """Driver entry: per-host PageRank-share vs TrustRank-share
    disparity over the synthetic outlink graph (host = doc_id %
    SPAM_HOST_MOD); columns (host, n_nodes, rank_share_ppm,
    trust_share_ppm, spam_signal_ppm); positive signal = suspect."""
    from concurrent.futures import ThreadPoolExecutor

    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the two fixed-point loops are INDEPENDENT job sequences over
    # node-sized tables — run them from two driver threads so one loop's
    # stage tails back-fill the cores the other leaves idle (guide §2.6:
    # overlap independent jobs). Results are unchanged; only the job
    # overlap is new (optimization r6 — sequential, the two loops cost
    # pagerank + trustrank end to end).
    with ThreadPoolExecutor(max_workers=2) as pool:
        f_pr = pool.submit(doc_pagerank, spark, sf_dir, docs)
        f_tr = pool.submit(doc_trustrank, spark, sf_dir, docs)
        pr = f_pr.result().select("doc_id", "rank_i")
        tr = f_tr.result().select("doc_id", "trust_i")
    j = pr.join(tr, "doc_id").select(
        F.concat(
            F.lit("h"), (F.col("doc_id") % SPAM_HOST_MOD).cast("string")
        ).alias("host"),
        F.col("rank_i").cast("decimal(38,0)").alias("r"),
        F.col("trust_i").cast("decimal(38,0)").alias("t"),
    )
    h = j.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("r").alias("r"),
        F.sum("t").alias("t"),
    )
    tot = h.agg(
        F.sum("r").alias("rt"), F.sum("t").alias("tt")
    )
    share = "CAST((2 * 1000000 * {p} + {q}) div (2 * {q}) AS BIGINT)"
    rs = F.expr(share.format(p="r", q="rt"))
    ts = F.expr(share.format(p="t", q="tt"))
    return h.crossJoin(F.broadcast(tot)).select(
        "host",
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        rs.alias("rank_share_ppm"),
        ts.alias("trust_share_ppm"),
        (rs - ts).alias("spam_signal_ppm"),
    )


def pagerank_prioritized_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: centrality-prioritized frontier pop — the tier-crawl
    composition "crawl important pages first". PageRank scores (exact
    BIGINT fixed-point, so the priority ORDER is bit-identical across
    engines) join the synthetic frontier, and the REAL pop kernel
    (frontier.crawler.ranked_pop) ranks each host's queue by descending
    rank (priority_expr = -rank_i; ties fall back to seq), budget 2.
    Scale shape: the rank table joins the frontier on doc key (broadcast
    or bucketed equi-join) before the one hash partition on host that the
    pop already pays.

    Two synthesis choices keep the PRIORITY non-vacuous (the r2
    vacuous-oracle trap): seq models ARRIVAL order, decorrelated from
    centrality by a fixed modular permutation (×131071 mod the prime
    1048573 — a bijection, injective on the doc_id range); and the
    frontier host groups doc_id % 7 rather than `source` — the link
    graph is symmetric within each doc_id-mod-20 residue class (every
    `source` member gets the IDENTICAL rank), so source-grouped queues
    would tie everywhere and the pop would degenerate to FIFO. The
    mod-7 grouping mixes residue classes, giving each host's queue real
    rank variance (asserted in the reorders-vs-fifo test)."""
    from ..frontier.crawler import ranked_pop

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # the seq permutation is a bijection only on [0, SEQ_PERM_MOD); past
    # that, same-host equal-rank docs could collide on (rank, seq) and
    # make row_number nondeterministic vs the oracle — fail loudly, the
    # same discipline as pagerank()'s SCALE_I overflow guard
    max_id = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
    if max_id is not None and max_id >= SEQ_PERM_MOD:
        raise ValueError(
            f"pagerank_prioritized_pop: max doc_id {max_id} >= "
            f"SEQ_PERM_MOD {SEQ_PERM_MOD}; the arrival permutation is no "
            "longer injective — raise SEQ_PERM_MOD (prime) on both sides"
        )
    pr = doc_pagerank(spark, sf_dir, docs).select("doc_id", "rank_i")
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 7).cast("string"))
    frontier = (
        docs.select(
            "doc_id",
            F.concat(
                F.lit("http://"), host, F.lit("/f"), d.cast("string")
            ).alias("uri"),
            host.alias("host"),
            ((d * SEQ_PERM_MULT) % SEQ_PERM_MOD).alias("seq"),
        )
        .join(pr, "doc_id")
        .withColumn("neg_rank", -F.col("rank_i"))
    )
    _, popped, _ = ranked_pop(frontier, 2, (), priority_expr="neg_rank")
    return popped.select("uri", "host", "seq", "rank_i")
