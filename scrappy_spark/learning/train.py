"""A-9 trainer (reference lib/scrappy/learning/trainer.rb:18-164) —
induce an extractor KB from annotated samples, adapted from DOM+XPath to
span sequences (SURVEY §7.3).

The reference maps each golden value to the DOM node carrying it, then
generalizes the node's XPath across samples with positional indexes and
class/id conditions (trainer.rb:91-137). The span analog: a value maps to
the spans whose cleaned text equals it, a "generalized XPath" is a
(span kind, positional index within that kind) pair — exactly the
interpreter's span selector with sc:index semantics — and the cross-
sample generalization keeps the candidate selectors every sample agrees
on. The applicability gate is the optimizer's LCP `prefix*` pattern
(trainer uses the same helper, trainer.rb:52-89 → optimizer.rb:352-369).

Training is driver-side over the (tiny, human-annotated) sample set —
the induced KB then runs distributed over any corpus via
extractor.extract.extract_triples.
"""

from __future__ import annotations

from ..extractor.formats import clean
from ..extractor.kb import Fragment, Selector
from .optimize import lcp_uri_pattern

Sample = tuple[str, list[dict], list[tuple[str, str]]]
# (doc_uri, spans, [(predicate, literal_value), ...])


def _candidate_selectors(spans: list[dict], value: str) -> set[tuple[str, int]]:
    """All (kind, index-within-kind) addresses whose cleaned text equals
    ``value`` — the span analog of trainer.rb's node→XPath step."""
    per_kind: dict[str, int] = {}
    out: set[tuple[str, int]] = set()
    # document list order — the same order the interpreter's span
    # selector enumerates matches in (interp.py select, type 'span')
    for s in spans:
        idx = per_kind.get(s["kind"], 0)
        per_kind[s["kind"]] = idx + 1
        if clean(s["text"]) == value:
            out.add((s["kind"], idx))
    return out


def train_kb(samples: list[Sample], fid: str = "trained") -> tuple[Fragment, ...]:
    """Induce one root fragment (identifier = the document URI, gated by
    the samples' LCP pattern) with an rdf:Literal subfragment per
    predicate whose value can be addressed consistently across ALL
    samples. Predicates with no agreeing selector are skipped — the same
    give-up the reference trainer has when XPath generalization fails.

    Returns a KB runnable by the standard interpreter; on the training
    samples its extraction reproduces the annotations exactly
    (tested: P/R/F = 1.0 via the A-3 kernel)."""
    if not samples:
        return ()
    # per sample: p -> candidate addresses (None marks "inconsistent in
    # this sample": annotated more than once, not addressable positionally)
    per_sample: list[dict[str, set[tuple[str, int]] | None]] = []
    for _, spans, annotations in samples:
        here: dict[str, set[tuple[str, int]] | None] = {}
        for p, value in annotations:
            here[p] = (
                None if p in here else _candidate_selectors(spans, value)
            )
        per_sample.append(here)

    # a predicate survives iff annotated exactly once in EVERY sample and
    # at least one address agrees across all of them (a selector trained
    # on a subset would extract spurious values on the rest)
    all_preds = set().union(*(h.keys() for h in per_sample))
    subfragments = []
    for p in sorted(all_preds):
        sets = [h.get(p) for h in per_sample]
        if any(s is None for s in sets):
            continue
        cands = set.intersection(*sets)
        if not cands:
            continue  # no selector survives every sample — trainer gives up
        kind, idx = min(cands)  # deterministic pick
        subfragments.append(
            Fragment(
                fid=f"{fid}_{p}",
                selectors=(Selector(type="span", kind=kind, index=idx),),
                rdf_type="rdf:Literal",
                relation=p,
            )
        )
    gate = lcp_uri_pattern([uri for uri, _, _ in samples])
    return (
        Fragment(
            fid=fid,
            selectors=(gate,),
            identifier=(Selector(type="base_uri"),),
            subfragments=tuple(subfragments),
        ),
    )
