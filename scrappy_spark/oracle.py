"""Pure-Python reference crawl oracle — golden truth for the engine.

Reimplements MapReduce::Queue FIFO + seen-set semantics
(lib/scrappy/agent/map_reduce.rb:17-46: dedup key = whole (uri, depth)
item) and Agent#map link emission (lib/scrappy/agent/agent.rb:64-91) at the
canonical workers=1 ordering (bin/scrappy:41). ~100 lines, no Spark.

Two modes:
  * ``per_host_budget=None`` — literal FIFO pop loop (the reference).
  * ``per_host_budget=B`` — the generalized politeness semantics the engine
    implements at scale: level-synchronized rounds, each round pops at most
    B items per host (lowest seq first), processed in seq order. With
    B=None the two modes produce identical output (tested) — the §3.4
    equivalence argument made executable.

Fetch layering (SURVEY.md §7.4): the seen set keys on (uri, depth) so a URL
met again at another depth re-enters the queue, but the response cache
(agent.rb:42-48, within-run TTL never expires) means it is fetched only
once — golden_fetches counts real fetches.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from . import semantics
from .urlnorm import canonicalize, host_of


@dataclass
class CrawlResult:
    order: list[tuple[int, str, int]] = field(default_factory=list)  # (seq, uri, depth)
    seen: set[tuple[str, int]] = field(default_factory=set)
    triples: set[semantics.Triple] = field(default_factory=set)
    fetches: dict[str, int] = field(default_factory=dict)
    rounds: int = 0


def robots_disallowed(uri: str, robots) -> bool:
    """Robots rule = (host, path_prefix) 2-tuple (legacy, = disallow) or
    (host, path_prefix, allow) 3-tuple; path = everything after the
    authority ('/' if empty). RFC 9309 longest-match: among the host's
    rules whose prefix prefixes the path the longest wins, length tie →
    Allow wins, no match → allowed. A disallowed URI is never enqueued.
    Spec shared with the Spark gate (frontier/robots.py:disallowed_py)."""
    if not robots:
        return False
    import re

    from .frontier.robots import disallowed_py

    m = re.match(r"^[^:]+://([^/]*)(.*)$", uri)
    if not m:
        return False
    host, path = m.group(1), m.group(2) or "/"
    return disallowed_py(host, path, robots)


def dust_rewrite(uri: str, rules) -> str:
    """First applicable DUST rule from a pre-ordered ((src, dst), ...)
    sequence, applied as a single positional splice at the FIRST
    occurrence; identity when none applies. Boundary guard: when src
    ends mid-token (last char ASCII alphanumeric) the character after
    the match must not continue the token — '?session=s1' must not
    rewrite '?session=s10'. Spec shared with the Spark expression
    (frontier/dust.py: _match_valid/_splice/rewrite_col) and the
    crawler's in-loop rewrite."""
    import re

    alnum = re.compile(r"[0-9A-Za-z]")
    for src, dst in rules or ():
        p = uri.find(src)
        if p < 0:
            continue
        if src and alnum.match(src[-1]):
            nxt = uri[p + len(src) : p + len(src) + 1]
            if nxt and alnum.match(nxt):
                continue
        return uri[:p] + dst + uri[p + len(src) :]
    return uri


def oracle_crawl(
    docs: dict[str, list[dict]],
    seeds: list[str],
    depth: int = -1,
    per_host_budget: int | None = None,
    max_rounds: int | None = None,
    extract=semantics.link_triples,
    robots: list[tuple] | None = None,
    redirects: dict[str, str] | None = None,
    host_budgets: dict[str, int] | None = None,
    dust_rules: list[tuple[str, str]] | None = None,
) -> CrawlResult:
    res = CrawlResult()
    cache: dict[str, list[semantics.Triple]] = {}
    redirects = redirects or {}

    queue: deque[tuple[str, int, int]] = deque()  # (uri, depth, seq)
    next_seq = 0
    for s in seeds:
        uri = dust_rewrite(canonicalize(s), dust_rules)
        item = (uri, depth)
        if item not in res.seen and not robots_disallowed(uri, robots):
            res.seen.add(item)
            queue.append((uri, depth, next_seq))
            next_seq += 1

    def process(uri: str, d: int, seq: int) -> list[tuple[str, int]]:
        """One pop: fetch (following a redirect, F-16 agent.rb:61 — the
        result is cached under BOTH the requested and the final URI) →
        extract under the FINAL URI → emit links."""
        nonlocal next_seq
        res.order.append((seq, uri, d))
        final = redirects.get(uri, uri)
        if uri in cache:
            final, triples = cache[uri]
        elif final in cache:
            triples = cache[final][1]
            cache[uri] = (final, triples)
        else:
            res.fetches[final] = res.fetches.get(final, 0) + 1
            spans = docs.get(final)
            triples = extract(final, spans) if spans is not None else []
            cache[uri] = cache[final] = (final, triples)
        res.triples.update(semantics.clean(triples))
        return semantics.emit_links(final, d, triples)

    def push_unless_done(items: list[tuple[str, int]]) -> None:
        nonlocal next_seq
        for uri, d in items:
            uri = dust_rewrite(uri, dust_rules)
            if robots_disallowed(uri, robots):
                continue
            if (uri, d) not in res.seen:  # history ∪ pending (map_reduce.rb:40-42)
                res.seen.add((uri, d))
                queue.append((uri, d, next_seq))
                next_seq += 1

    overrides = dict(host_budgets or {})
    if per_host_budget is None and not overrides:
        while queue:
            uri, d, seq = queue.popleft()
            push_unless_done(process(uri, d, seq))
            res.rounds += 1
            if max_rounds is not None and res.rounds >= max_rounds and queue:
                break
    else:
        # per-host overrides (crawl-delay translation, robots.py) shadow the
        # base budget; with no base, unlisted hosts pop whole-frontier
        while queue:
            res.rounds += 1
            taken_per_host: dict[str, int] = {}
            popped: list[tuple[str, int, int]] = []
            kept: deque[tuple[str, int, int]] = deque()
            for uri, d, seq in queue:  # queue is already in seq order
                h = host_of(uri)
                limit = overrides.get(h, per_host_budget)
                if limit is None or taken_per_host.get(h, 0) < limit:
                    taken_per_host[h] = taken_per_host.get(h, 0) + 1
                    popped.append((uri, d, seq))
                else:
                    kept.append((uri, d, seq))
            queue = kept
            for uri, d, seq in popped:  # seq order == pop order
                push_unless_done(process(uri, d, seq))
            if max_rounds is not None and res.rounds >= max_rounds:
                break
    return res
