"""Redirect-chain resolution — collapse multi-hop redirect maps at scale.

The reference follows redirects one hop at a time inside the fetch
(`agent.rb:61`: Mechanize lands on the final page and the result is cached
under both URIs — our F-16, `crawler.py`); the engine's `CrawlConfig.
redirects` is accordingly a SINGLE-hop (requested → final) map. Real
crawl-state tables hold raw hop EDGES (src → dst, one row per observed 3xx),
where the final target of a URL is the end of a CHAIN. This operator
resolves every chain distributedly and feeds the collapsed map back into
the crawl config.

Algorithm: pointer jumping (path doubling) — iteration k resolves every
chain of length ≤ 2^k, so a hop-cap of H needs ⌈log2 H⌉ self-joins, each an
equi-join on the current target (hash-partitioned, never a theta join).
Each iteration eagerly checkpoints (localCheckpoint) to cut the doubling
lineage, the same discipline as the connected-components kernel
(`operators/dedup.py:components_from_pairs`). Browsers and crawlers cap
redirect chains (~20 hops), so `max_hops=32` (5 iterations) is the
practical ceiling; anything unresolved after that is a cycle or an
over-cap chain, and the kernel FAILS LOUDLY rather than returning a
plausible-but-wrong map (fail-loud convergence contract, VERDICT r2).

A redirect edge table at web scale is ~1–5% of the frontier (a fraction of
URLs are 3xx), so the whole resolution is small next to a crawl round; the
output (src, final_uri, hops) joins back to the frontier on src as a
broadcast or bucketed equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_chains(edges: DataFrame, max_hops: int = 32) -> DataFrame:
    """(src, dst) single-hop redirect edges → (src, final_uri, hops) for
    EVERY src, where final_uri has no outgoing edge and hops counts the
    edges walked. Raises on cycles / chains longer than ``max_hops``.

    Precondition (raised on violation, not silently mangled): at most one
    DISTINCT target per src — a src with two different targets has no
    well-defined final. Exact-duplicate rows (the same 3xx observed twice
    in a fetch log) are fine: edges are de-duplicated first, which also
    keeps the pointer-jumping join fan-out at 1.
    """
    edges = edges.select("src", "dst").distinct().persist()
    dup = (
        edges.groupBy("src")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )
    if dup.limit(1).count() > 0:
        edges.unpersist()
        raise ValueError(
            "resolve_chains: src with multiple distinct redirect targets — "
            "final target undefined"
        )

    # m: src -> (cur, hops), initially the deduped edges (hops=1)
    m = edges.select("src", F.col("dst").alias("cur"), F.lit(1).alias("hops"))
    iters = max(1, (max_hops - 1).bit_length())  # 2^iters >= max_hops
    for _ in range(iters):
        jump = m.select(
            F.col("src").alias("j_src"),
            F.col("cur").alias("j_cur"),
            F.col("hops").alias("j_hops"),
        )
        old = m
        m = (
            m.join(jump, m["cur"] == jump["j_src"], "left")
            .select(
                "src",
                F.coalesce("j_cur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("j_hops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint(eager=True)
        )
        # the superseded doubling is dead once the new one materializes —
        # free its blocks (same discipline as components_from_pairs)
        old.unpersist()

    # convergence check: after the doublings no cur may still have an
    # outgoing edge; survivors mean a cycle or an over-cap chain
    heads = edges.select(F.col("src").alias("e_src")).distinct()
    unresolved = m.join(heads, m["cur"] == heads["e_src"], "left_semi")
    n_bad = unresolved.limit(1).count()
    if n_bad > 0:
        sample = [r["src"] for r in unresolved.select("src").limit(3).collect()]
        edges.unpersist()
        raise RuntimeError(
            f"resolve_chains: unresolved after {iters} doublings "
            f"(cycle or chain > {max_hops} hops); e.g. src={sample}"
        )
    # exact hop-cap check (review r5): the doubling count rounds max_hops
    # up to a power of two, so a chain of length in (max_hops, 2^iters]
    # CONVERGES — without this check it would resolve silently instead of
    # raising as the contract promises.
    over = m.where(F.col("hops") > max_hops)
    if over.limit(1).count() > 0:
        sample = [r["src"] for r in over.select("src").limit(3).collect()]
        edges.unpersist()
        raise RuntimeError(
            f"resolve_chains: chain longer than max_hops={max_hops}; "
            f"e.g. src={sample}"
        )
    edges.unpersist()
    return m.select("src", F.col("cur").alias("final_uri"), "hops")


def collapse_for_config(edges: DataFrame, max_hops: int = 32):
    """Resolve and collect into the ``CrawlConfig.redirects`` shape
    (requested_uri, final_uri), sorted for determinism. Redirect maps fed
    to a single crawl are config-scale (the crawl's own host set), so the
    collect is bounded by design — web-scale joins stay in
    :func:`resolve_chains`."""
    rows = resolve_chains(edges, max_hops=max_hops).select("src", "final_uri")
    return tuple(sorted((r["src"], r["final_uri"]) for r in rows.collect()))


# ---------------------------------------------------------------------------
# driver-contract query: deterministic synthetic chains from the documents
# table — edges d -> d-1 for doc_id % 16 != 0, i.e. chains up to 15 hops
# ending at multiples of 16 (terminals have no outgoing edge). 15-hop
# chains exercise 4 of the 5 doublings; the DuckDB mirror walks the same
# edges with a recursive CTE.
# ---------------------------------------------------------------------------


def _synth_edges(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    uri = F.concat(F.lit("http://r.example.com/"), d.cast("string"))
    prev = F.concat(F.lit("http://r.example.com/"), (d - 1).cast("string"))
    return docs.where(d % 16 != 0).select(
        uri.alias("src"), prev.alias("dst")
    )


def resolve_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: resolve the synthetic chains → (src, final_uri, hops)."""
    return resolve_chains(_synth_edges(spark, sf_dir))
