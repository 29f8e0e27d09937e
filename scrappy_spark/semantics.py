"""Per-document reference semantics — the pure-Python spec.

These functions reimplement, per document, what Scrappy's agent does
between fetch and enqueue (lib/scrappy/agent/agent.rb:37-93). The oracle
(oracle.py) composes them into the canonical workers=1 FIFO crawl; the
Spark engine implements the same semantics vectorized and is tested for
exact equality against these.

The "KB" here is the M1 link extractor (pagination links are sc:Page-typed
— extra/scraping.yarf:17-20 models pagination the same way); the full
fragment-tree selector algebra lives in extractor/ and plugs in through the
same triple interface.
"""

from __future__ import annotations

from .urlnorm import resolve

RDF_TYPE = "rdf:type"
SC_PAGE = "sc:Page"
SC_INDEX = "sc:Index"
SC_NEWURI = "sc:NewUri"
SC_REFERENCES = "sc:references"
BOOKKEEPING_TYPES = (SC_INDEX, SC_PAGE, SC_NEWURI)

Triple = tuple[str, str, str, bool]  # (s, p, o, is_literal)


def is_html(spans: list[dict]) -> bool:
    """Content-type gate (S-3, blind_agent.rb:32-34): a doc is 'HTML' iff it
    has any non-media span. Media-only docs are fetched but contribute
    nothing (agent.rb:231-237)."""
    return any(s["kind"] != "media" for s in spans)


def link_triples(url: str, spans: list[dict]) -> list[Triple]:
    """M1 link-KB extraction: every link span emits
    (doc, sc:references, resolved_target); pagination links (?page= in the
    href — corpus convention, FIXTURES.md §1) additionally type their
    target sc:Page (extra/scraping.yarf:17-20)."""
    if not is_html(spans):
        return []
    out: list[Triple] = []
    for s in spans:
        if s["kind"] != "link":
            continue
        target = resolve(url, s["media_ref"])
        out.append((url, SC_REFERENCES, target, False))
        if "?page=" in s["media_ref"]:
            out.append((target, RDF_TYPE, SC_PAGE, False))
    return out


def emit_links(url: str, depth: int, triples: list[Triple]) -> list[tuple[str, int]]:
    """Link classification + ordering, exactly agent.rb:64-91.

    pages (subjects typed sc:Page) follow at unchanged depth (F-6);
    all other resource subjects+objects follow at depth-1 unless depth==0
    (F-7); sc:NewUri-typed subjects are nofollow (F-8); bnodes never
    enqueued (F-9); first occurrence wins, pages before uris
    (agent.rb:80-82). depth clamps at -1 = infinite (bin/scrappy:27)."""
    pages: list[str] = []
    nofollow: set[str] = set()
    for s, p, o, lit in triples:
        if (
            p == RDF_TYPE
            and o == SC_PAGE
            and s.startswith(("http://", "https://"))
            and s not in pages
        ):
            pages.append(s)
        if p == RDF_TYPE and o == SC_NEWURI:
            nofollow.add(s)

    uris: list[str] = []
    if depth != 0:
        page_set = set(pages)
        seen_u: set[str] = set()
        for s, p, o, lit in triples:
            for node, node_lit in ((s, False), (o, lit)):
                if node_lit or node == url or node in page_set or node in seen_u:
                    continue
                if not node.startswith(("http://", "https://")):
                    continue  # literals/typed objects aren't URIs to follow
                seen_u.add(node)
                uris.append(node)

    items: list[tuple[str, int]] = []
    emitted: set[tuple[str, int]] = set()
    for p in pages:
        it = (p, max(-1, depth))
        if p not in nofollow and not p.startswith("_:") and it not in emitted:
            emitted.add(it)
            items.append(it)
    if depth != 0:
        for u in uris:
            it = (u, max(-1, depth - 1))
            if u not in nofollow and not u.startswith("_:") and it not in emitted:
                emitted.add(it)
                items.append(it)
    return items


def clean(triples: list[Triple]) -> list[Triple]:
    """F-14 (agent.rb:160-162): drop bookkeeping rdf:type triples."""
    return [
        t
        for t in triples
        if not (t[1] == RDF_TYPE and t[2] in BOOKKEEPING_TYPES)
    ]
