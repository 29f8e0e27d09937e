"""Per-document fragment-tree interpreter — the extraction semantics spec.

Pure Python over one document's span sequence; used by BOTH the oracle
(golden truth) and the engine (inside an Arrow-batched mapInPandas — the
recursion over the fragment tree is genuinely per-document, SURVEY.md
§2.C X-16). All mutable selector state (NewUri sequence counters, bnode
counters) is scoped to one document's extraction, reproducing the
reference's KB-clone-per-extraction (extractor.rb:17).

Reference parity (file:line cited per operator in SURVEY.md §2.C):
selector post-processing selector.rb:24-54; nested composition
selector.rb:70-75; node building fragment.rb:52-100; recursive
subfragments + cardinality fragment.rb:13-48; URI resolution
fragment.rb:128-135. Bnode ids are deterministic per (doc, counter)
instead of the reference's global creation-order counter
(bin/scrappy:275) — ids are arbitrary labels; structure is preserved.
"""

from __future__ import annotations

import re

from ..semantics import Triple
from ..urlnorm import resolve
from .formats import clean, render_plain, underscore, wikify
from .kb import Fragment, Selector

AFFIRMATIONS = ("yes", "true", "si", "sí", "y", "1")
NEGATIONS = ("no", "false", "n", "0")


class _State:
    __slots__ = ("seq", "bnodes", "doc_uri", "referenceable")

    def __init__(self, doc_uri: str, referenceable: bool = False):
        self.seq: dict[str, int] = {}
        self.bnodes = 0
        self.doc_uri = doc_uri
        self.referenceable = referenceable


def _ctx(uri: str, spans: list[dict], value=None, nofollow=False) -> dict:
    return {"uri": uri, "spans": spans, "value": value, "nofollow": nofollow}


def _postproc(sel: Selector, ctxs: list[dict]) -> list[dict]:
    out = ctxs
    if sel.boolean:  # X-1 selector.rb:24-40
        mapped = []
        for c in out:
            v = (c["value"] or "").strip().lower()
            if v in AFFIRMATIONS:
                mapped.append({**c, "value": "true"})
            elif v in NEGATIONS:
                mapped.append({**c, "value": "false"})
        out = mapped
    if sel.norm_min is not None and sel.norm_max is not None:  # X-2 :41-51
        mapped = []
        for c in out:
            try:
                v = float(c["value"])
            except (TypeError, ValueError):
                continue
            norm = (v - sel.norm_min) / (sel.norm_max - sel.norm_min)
            if sel.norm_in_range and not (0.0 <= norm <= 1.0):
                continue
            mapped.append({**c, "value": str(norm)})
        out = mapped
    if sel.nonempty:  # X-3 :52-54
        out = [c for c in out if c["value"]]
    return out


def select(sel: Selector, ctx: dict, state: _State) -> list[dict]:
    """Selector#select: dispatch + postproc + nested composition."""
    t = sel.type
    spans = ctx["spans"]
    out: list[dict]

    if t == "uri":  # X-10 selectors/uri.rb:4-9
        base = re.match(r"\A([^?]*)", state.doc_uri).group(1)
        out = [dict(ctx)] if base in sel.values else []
    elif t == "uri_pattern":  # X-11 selectors/uri_pattern.rb:4-9
        out = []
        for pat in sel.values:
            rx = "\\A" + pat.replace(".", r"\.").replace("?", r"\?").replace("*", ".+") + "\\Z"
            if re.match(rx, state.doc_uri):
                out = [dict(ctx)]
                break
    elif t == "base_uri":  # X-6 selectors/base_uri.rb:3-5
        out = [_ctx(ctx["uri"], spans, state.doc_uri, ctx["nofollow"])]
    elif t == "root":  # X-7 selectors/root.rb:3-10
        out = [_ctx(ctx["uri"], spans, render_plain(spans), ctx["nofollow"])]
    elif t == "span":  # X-5 selectors/xpath.rb:3-23 (css.rb shares the path)
        matches = [
            s
            for s in spans
            if (sel.kind is None or s["kind"] == sel.kind)
            and (
                sel.pattern is None
                or re.search(sel.pattern, s[sel.pattern_on] or "")
            )
        ]
        if sel.index is not None:  # sc:index xpath.rb:5-9
            matches = [matches[sel.index]] if sel.index < len(matches) else []
        if sel.keyword is not None:  # sc:keyword xpath.rb:10-12
            matches = [
                m for m in matches if sel.keyword in clean(m["text"]).lower()
            ]
        out = [
            _ctx(
                ctx["uri"],
                [m],
                m[sel.attribute] if sel.attribute else clean(m["text"]),
                ctx["nofollow"],
            )
            for m in matches
        ]
    elif t == "section":  # X-8 selectors/section.rb:3-12
        out = []
        ordered = sorted(spans, key=lambda s: s["offset"])
        for i, s in enumerate(ordered):
            if s["kind"] == "heading" and clean(s["text"]).lower() in sel.values:
                sec = []
                for nxt in ordered[i + 1 :]:
                    if nxt["kind"] == "heading":
                        break
                    sec.append(nxt)
                out.append(
                    _ctx(ctx["uri"], sec, render_plain(sec), ctx["nofollow"])
                )
    elif t == "slice":  # X-9 selectors/slice.rb:3-10
        parts = (ctx["value"] or "").split(sel.separator)
        out = []
        for i in sel.indexes:
            if 0 <= i < len(parts):
                v = parts[i].strip()
                if v:
                    out.append({**ctx, "value": v})
    elif t == "new_uri":  # X-12 selectors/new_uri.rb:3-38
        v = ctx["value"] or ""
        if sel.transform == "wikify":
            v = wikify(v)
        elif sel.transform == "underscore":
            v = underscore(v)
        if sel.downcase:
            v = v.lower()
        if sel.sequence:  # per-(doc, prefix) counter, new_uri.rb:24-25
            state.seq[sel.prefix] = state.seq.get(sel.prefix, 0) + 1
            v = str(state.seq[sel.prefix])
        if sel.prefix.startswith("http"):
            uri = sel.prefix + v
        elif sel.prefix:
            uri = state.doc_uri + sel.prefix + v
        else:
            uri = v
        out = [{**ctx, "value": uri + sel.suffix, "nofollow": not sel.follow}]
    elif t == "range":  # X-13 selectors/visual.rb:9-70 analog over offsets
        matches = [
            s
            for s in spans
            if (sel.min_offset is None or s["offset"] >= sel.min_offset)
            and (sel.max_offset is None or s["offset"] <= sel.max_offset)
            and (sel.kinds is None or s["kind"] in sel.kinds)
        ]
        out = [
            _ctx(ctx["uri"], [m], clean(m["text"]), ctx["nofollow"])
            for m in matches
        ]
    else:
        raise ValueError(f"unknown selector type {t!r}")

    out = _postproc(sel, out)
    for child in sel.children:  # X-4 selector.rb:70-75
        nxt: list[dict] = []
        for c in out:
            nxt.extend(select(child, c, state))
        out = nxt
    return out


def _reference_triples(
    node: str, frag: Fragment, rctx: dict, state: _State
) -> list[Triple]:
    """Referenceable provenance (VERDICT r3 missing #4 — the reference's
    `-r` output shape): `node sc:source → source` bnode carrying an
    `sc:selector → sc:UnivocalSelector` node plus an `sc:presentation`
    node (fragment.rb:84-93, 138-171). Span-sequence analogs of the
    DOM/visual fields: sc:path is `span:<first offset>` (the position a
    node was built from — the XPath analog over the span axis), sc:tag
    is the first span's kind (the element-name analog), and the
    presentation geometry is the offset window (sc:x = min offset,
    sc:width = span count) with sc:text the stripped concatenated span
    text — the reference's vx/vw/node.text with the interleaved-spans
    table's one positional axis. Fragment metadata (sc:type,
    sc:superclass, sc:sameas, sc:relation) attaches to the source node
    exactly as in fragment.rb:86-90."""
    spans = rctx["spans"]
    state.bnodes += 1
    src = f"_:{state.doc_uri}#{state.bnodes}"
    state.bnodes += 1
    sel = f"_:{state.doc_uri}#{state.bnodes}"
    t: list[Triple] = [
        (node, "sc:source", src, False),
        (src, "sc:selector", sel, False),
        (sel, "rdf:type", "sc:UnivocalSelector", False),
        (sel, "sc:document", state.doc_uri, False),
    ]
    if spans:
        first = spans[0]
        t.append((sel, "sc:path", f"span:{first['offset']}", True))
        t.append((sel, "sc:tag", first["kind"], True))
        state.bnodes += 1
        pres = f"_:{state.doc_uri}#{state.bnodes}"
        text = " ".join((s["text"] or "") for s in spans).strip()
        t.extend(
            [
                (src, "sc:presentation", pres, False),
                (pres, "sc:x", str(min(s["offset"] for s in spans)), True),
                (pres, "sc:width", str(len(spans)), True),
                (pres, "sc:text", text, True),
            ]
        )
    if frag.rdf_type:
        t.append((src, "sc:type", frag.rdf_type, False))
    if frag.superclass:
        t.append((src, "sc:superclass", frag.superclass, False))
    if frag.sameas:
        t.append((src, "sc:sameas", frag.sameas, False))
    if frag.relation:
        t.append((src, "sc:relation", frag.relation, False))
    return t


def apply_fragment(
    frag: Fragment, parent_node: str | None, ctx: dict, state: _State
) -> tuple[list[Triple], int]:
    """Fragment#all_mappings (fragment.rb:13-48) + mappings (:52-100).
    Returns (triples, node_count) — node_count feeds the parent's
    cardinality check."""
    results: list[dict] = []
    for sel in frag.selectors:
        results.extend(select(sel, ctx, state))

    triples: list[Triple] = []
    count = 0
    for rctx in results:
        if frag.rdf_type == "rdf:Literal":  # literal branch fragment.rb:67-75
            value = rctx["value"] or ""
            count += 1
            if frag.relation and parent_node is not None:
                triples.append((parent_node, frag.relation, value, True))
            continue

        if frag.identifier:  # fragment.rb:52-66
            idvals: list[str] = []
            for isel in frag.identifier:
                idvals.extend(
                    c["value"] for c in select(isel, rctx, state) if c["value"]
                )
            nodes = [resolve(state.doc_uri, v) for v in idvals]
        else:  # bnode fragment.rb:105
            state.bnodes += 1
            nodes = [f"_:{state.doc_uri}#{state.bnodes}"]

        for node in nodes:
            t: list[Triple] = []
            if frag.rdf_type:
                t.append((node, "rdf:type", frag.rdf_type, False))
            if frag.superclass:  # fragment.rb:77-79
                t.append((node, "rdfs:subClassOf", frag.superclass, False))
            if frag.sameas:
                t.append((node, "owl:sameAs", frag.sameas, False))
            if rctx["nofollow"]:  # fragment.rb:121, new_uri.rb:18,36
                t.append((node, "rdf:type", "sc:NewUri", False))
            if frag.relation and parent_node is not None:  # fragment.rb:33
                t.append((parent_node, frag.relation, node, False))

            ok = True
            for sub in frag.subfragments:  # recursion fragment.rb:13-48
                sub_t, sub_n = apply_fragment(sub, node, rctx, state)
                if sub_n < sub.min_card or (
                    sub.max_card is not None and sub_n > sub.max_card
                ):
                    ok = False  # drop parent node, fragment.rb:37-44
                    break
                t.extend(sub_t)
            if ok:
                count += 1
                if state.referenceable:
                    t.extend(_reference_triples(node, frag, rctx, state))
                triples.extend(t)
    return triples, count


def extract_document(
    kb: tuple[Fragment, ...],
    uri: str,
    spans: list[dict],
    referenceable: bool = False,
) -> list[Triple]:
    """Extractor#extract (extractor.rb:10-30) for one document.
    ``referenceable`` adds the `-r` provenance graph per node
    (_reference_triples); default off — golden-parity mode."""
    state = _State(uri, referenceable)
    ctx = _ctx(uri, sorted(spans, key=lambda s: s["offset"]))
    out: list[Triple] = []
    for frag in kb:
        t, _ = apply_fragment(frag, None, ctx, state)
        out.extend(t)
    return out


def kb_extract_fn(kb: tuple[Fragment, ...]):
    """Extraction callable for oracle_crawl(extract=...): applies the
    HTML gate (S-3) then the fragment interpreter."""
    from ..semantics import is_html

    def fn(uri: str, spans: list[dict]) -> list[Triple]:
        if not is_html(spans):
            return []
        return extract_document(kb, uri, spans)

    return fn
