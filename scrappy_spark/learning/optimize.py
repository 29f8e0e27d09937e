"""KB learning: the optimizer layer (reference lib/scrappy/learning/
optimizer.rb), adapted from DOM/visual geometry to span sequences.

Shape: the KB is broadcast-size driver-side data (SURVEY §2.D), so the
hill-climb LOOP runs on the driver — exactly the reference's shape — but
every SCORE evaluation is a distributed job (extraction via the same
mapInPandas interpreter the engine uses, metrics via grouped-join
DataFrame aggregation). Nothing here collects documents.

Operators:
  A-5 optimizer score    optimizer.rb:310-324 — mean per-sample doc score
                         (recall for extractors, F-score for patterns)
  A-6 fragment distance  optimizer.rb:197-204 (structural signature
                         grouping), :265-308 (weighted numeric distance;
                         the visual x/y/w/h axes map to our offset
                         bounds, tag/font penalties map to span
                         kind/pattern penalties)
  A-7 hill-climb         optimizer.rb:58-109 (merge nearest pair, keep if
                         score does not drop — the regression guard at
                         :83-99), merge = interval-union of bounds
                         (:241-259) + term generalization (:214-238)
  A-8 LCP generalizer    optimizer.rb:352-369 — longest-common-prefix
                         `prefix*` UriPatternSelector from sample URIs
"""

from __future__ import annotations

import os
from dataclasses import replace
from itertools import zip_longest

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extractor.extract import extract_triples, extract_triples_tagged
from ..extractor.kb import Fragment, Selector

TRIPLE_KEY = ["s", "p", "o"]
_PENALTY = 500.0  # tag / font-family mismatch weight (optimizer.rb:300-305)
_INDEX_W = 100.0  # font-size weight analog (optimizer.rb:298)


# ------------------------------------------------------------- A-5 score
def prf_by_sample(
    golden: DataFrame,
    extracted: DataFrame,
    sample_col: str | list[str] = "sample",
) -> DataFrame:
    """Per-sample P/R/F (the per-doc score of optimizer.rb:326-343,
    grouped like admin.rb:183-228): one full-outer grouped join — empty
    golden ⇒ recall 1.0, empty extraction ⇒ precision 1.0, P+R=0 ⇒ F 0.
    ``sample_col`` may be a list (e.g. [candidate, sample]) so a batch of
    candidate KBs scores in the same single aggregation."""
    group = [sample_col] if isinstance(sample_col, str) else list(sample_col)
    key = [*group, *TRIPLE_KEY]
    g = golden.select(*key).distinct().withColumn("in_g", F.lit(1))
    e = extracted.select(*key).distinct().withColumn("in_e", F.lit(1))
    both = g.join(e, key, "full_outer").select(
        *group,
        F.coalesce("in_g", F.lit(0)).alias("in_g"),
        F.coalesce("in_e", F.lit(0)).alias("in_e"),
    )
    agg = both.groupBy(*group).agg(
        F.sum(F.col("in_g") * F.col("in_e")).alias("right"),
        F.sum("in_g").alias("n_golden"),
        F.sum("in_e").alias("n_extracted"),
    )
    p = F.when(
        F.col("n_extracted") > 0, F.col("right") / F.col("n_extracted")
    ).otherwise(F.lit(1.0))
    r = F.when(
        F.col("n_golden") > 0, F.col("right") / F.col("n_golden")
    ).otherwise(F.lit(1.0))
    out = agg.select(
        *group,
        "right",
        "n_golden",
        "n_extracted",
        p.alias("precision"),
        r.alias("recall"),
    )
    f = F.when(
        (F.col("precision") + F.col("recall")) > 0,
        2
        * F.col("precision")
        * F.col("recall")
        / (F.col("precision") + F.col("recall")),
    ).otherwise(F.lit(0.0))
    return out.withColumn("fscore", f)


def optimizer_score(
    golden: DataFrame,
    extracted: DataFrame,
    metric: str = "fscore",
    sample_col: str = "sample",
) -> DataFrame:
    """A-5: mean per-sample score (optimizer.rb:310-324 — extractors are
    scored on recall, patterns on F-score; pick via ``metric``). One-row
    result (score, n_samples)."""
    per = prf_by_sample(golden, extracted, sample_col)
    return per.agg(
        F.round(F.avg(metric), 6).alias("score"),
        F.count(F.lit(1)).alias("n_samples"),
    )


# -------------------------------------------------- A-6 signature/distance
def fragment_signature(f: Fragment) -> tuple:
    """Structural signature (optimizer.rb:197-204): type/relation/
    superclass/sameas/identifier-presence + recursive subfragment set.
    Only same-signature fragments are merge candidates."""
    return (
        f.rdf_type,
        f.relation,
        f.superclass,
        f.sameas,
        bool(f.identifier),
        frozenset(fragment_signature(s) for s in f.subfragments),
    )


def _selector_distance(a: Selector | None, b: Selector | None) -> float:
    if a is None or b is None:
        return _PENALTY
    if a.type != b.type:
        return 2 * _PENALTY
    d = 0.0
    if a.kind != b.kind or (a.kinds or ()) != (b.kinds or ()):
        d += _PENALTY  # tag-set mismatch analog (optimizer.rb:302-305)
    if (a.pattern or "") != (b.pattern or ""):
        d += _PENALTY  # font-family analog
    if (a.index is None) != (b.index is None) or a.index != b.index:
        d += _INDEX_W  # font-size ×100 analog
    for attr in ("min_offset", "max_offset"):
        av, bv = getattr(a, attr), getattr(b, attr)
        if (av is None) != (bv is None):
            d += _PENALTY
        elif av is not None:
            d += abs(av - bv)  # L1 over bounds (optimizer.rb:291-298)
    return d


def fragment_distance(a: Fragment, b: Fragment) -> float:
    """∞ across signature groups; weighted L1 over paired selector
    bounds within a group (optimizer.rb:265-308; memoization is
    unnecessary at our KB sizes)."""
    if fragment_signature(a) != fragment_signature(b):
        return float("inf")
    return sum(
        _selector_distance(x, y)
        for x, y in zip_longest(a.selectors, b.selectors)
    )


# --------------------------------------------------------- A-7 merge/climb
def _merge_selectors(a: Selector, b: Selector) -> Selector:
    """Generalize two same-type selectors (optimizer.rb:241-259 interval
    union; :214-238 term-wise generalization → regex alternation here;
    differing positional index drops the constraint, trainer.rb-style)."""
    assert a.type == b.type
    lo = (
        None
        if a.min_offset is None or b.min_offset is None
        else min(a.min_offset, b.min_offset)
    )
    hi = (
        None
        if a.max_offset is None or b.max_offset is None
        else max(a.max_offset, b.max_offset)
    )
    if (a.pattern or "") == (b.pattern or ""):
        pattern = a.pattern
    elif a.pattern and b.pattern:
        pattern = f"(?:{a.pattern}|{b.pattern})"
    else:
        pattern = None
    kinds: tuple[str, ...] | None
    if a.kinds is None and b.kinds is None:
        kinds = None
    else:
        kinds = tuple(dict.fromkeys((a.kinds or ()) + (b.kinds or ())))
    return replace(
        a,
        values=tuple(dict.fromkeys(a.values + b.values)),
        kind=a.kind if a.kind == b.kind else None,
        pattern=pattern,
        index=a.index if a.index == b.index else None,
        min_offset=lo,
        max_offset=hi,
        kinds=kinds,
    )


def merge_fragments(a: Fragment, b: Fragment) -> Fragment:
    """Merge two same-signature fragments into one generalized fragment
    (the optimizer's group/mix/merge move, optimizer.rb:129-178)."""
    assert fragment_signature(a) == fragment_signature(b)
    sels = tuple(
        _merge_selectors(x, y) if x is not None and y is not None else (x or y)
        for x, y in zip_longest(a.selectors, b.selectors)
    )
    # pair subfragments by signature (signature equality guarantees the
    # same multiset on both sides)
    rest = list(b.subfragments)
    subs: list[Fragment] = []
    for sa in a.subfragments:
        match = next(
            (
                sb
                for sb in rest
                if fragment_signature(sb) == fragment_signature(sa)
            ),
            None,
        )
        if match is not None:
            rest.remove(match)
            subs.append(merge_fragments(sa, match))
        else:  # pragma: no cover — unreachable under signature equality
            subs.append(sa)
    subs.extend(rest)
    return replace(
        a, fid=f"{a.fid}+{b.fid}", selectors=sels, subfragments=tuple(subs)
    )


def optimizer_scores_by(
    golden: DataFrame,
    extracted: DataFrame,
    group_col: str,
    metric: str = "fscore",
    sample_col: str = "sample",
) -> DataFrame:
    """A-5 over a BATCH: one (group, score, n_samples) row per candidate
    id, computed in a single grouped aggregation — the batched scoring
    kernel hill_climb uses (one Spark job per optimizer iteration, not
    one per candidate merge)."""
    per = prf_by_sample(golden, extracted, [group_col, sample_col])
    return per.groupBy(group_col).agg(
        F.round(F.avg(metric), 6).alias("score"),
        F.count(F.lit(1)).alias("n_samples"),
    )


def hill_climb(
    kb: tuple[Fragment, ...],
    docs: DataFrame,
    golden: DataFrame,
    metric: str = "fscore",
    max_iters: int = 20,
) -> tuple[tuple[Fragment, ...], float]:
    """A-7: repeatedly merge the nearest same-signature root pair; keep a
    merge only if the distributed score does not drop (the rollback guard
    of optimizer.rb:83-99). Golden columns: (sample, s, p, o) where
    sample is the doc URI. Returns (optimized kb, score).

    Batched (VERDICT r2 #6): each iteration scores EVERY finite-distance
    merge candidate in one tagged extraction (extract_triples_tagged) +
    one grouped A-5 aggregation, then accepts the nearest candidate whose
    score does not drop — the same answer the sequential
    try-in-distance-order loop produced, at O(1) Spark jobs per iteration
    (the documents table is scanned once per iteration, not once per
    candidate pair)."""

    def score(candidate: tuple[Fragment, ...]) -> float:
        ext = extract_triples(docs, candidate).withColumnRenamed(
            "src_uri", "sample"
        )
        row = optimizer_score(golden, ext, metric=metric).collect()[0]
        return float(row["score"])

    spark = docs.sparkSession
    cur = score(kb)
    for _ in range(max_iters):
        pairs = sorted(
            (
                (fragment_distance(kb[i], kb[j]), i, j)
                for i in range(len(kb))
                for j in range(i + 1, len(kb))
            ),
        )
        cands: list[tuple[str, tuple[Fragment, ...]]] = []
        for rank, (d, i, j) in enumerate(pairs):
            if d == float("inf"):
                break
            merged = merge_fragments(kb[i], kb[j])
            cands.append(
                (
                    f"c{rank:04d}",
                    tuple(f for k, f in enumerate(kb) if k not in (i, j))
                    + (merged,),
                )
            )
        if not cands:
            break
        tagged = extract_triples_tagged(docs, cands).withColumnRenamed(
            "src_uri", "sample"
        )
        cand_ids = F.broadcast(
            spark.createDataFrame([(cid,) for cid, _ in cands], "cand string")
        )
        scores = {
            r["cand"]: float(r["score"])
            for r in optimizer_scores_by(
                golden.crossJoin(cand_ids), tagged, "cand", metric=metric
            ).collect()
        }
        improved = False
        for cid, cand_kb in cands:  # distance order — nearest wins first
            if scores.get(cid, 0.0) >= cur:  # non-decreasing: simpler KB
                kb, cur, improved = cand_kb, scores[cid], True
                break
        if not improved:
            break
    return kb, cur


# ------------------------------------------------------------ A-8 LCP gate
def lcp_uri_pattern(uris: list[str]) -> Selector:
    """Longest-common-prefix `prefix*` gate (optimizer.rb:352-369)."""
    prefix = os.path.commonprefix(list(uris))
    return Selector(type="uri_pattern", values=(prefix + "*",))
