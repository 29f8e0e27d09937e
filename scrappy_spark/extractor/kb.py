"""Scraping-KB config model — the sc:Fragment mapping tree.

Mirrors the reference ontology (extra/scraping.yarf:27-349) flattened per
FIXTURES.md §3. A KB is a tuple of root Fragments; it is tiny (driver-side
data), validated once, and broadcast into the extraction UDF — the analog
of the reference's KB clone-per-extraction (extractor.rb:17) is that the
interpreter keeps all mutable state (sequence counters, bnode counters)
scoped per document.

Selector types (reference file in parens):
  uri          exact-URI gate, query string stripped (selectors/uri.rb:4-9)
  uri_pattern  glob gate: '.'/'?' escaped, '*'->'.+', anchored
               (selectors/uri_pattern.rb:4-9)
  span         kind/regex match over spans — the XPath/CSS analog, with
               sc:index, sc:keyword, sc:attribute (selectors/xpath.rb:3-23)
  base_uri     yields the document URI (selectors/base_uri.rb:3-5)
  root         yields the whole document (selectors/root.rb:3-10)
  section      heading-delimited slice (selectors/section.rb:3-12)
  slice        split-by-separator + index pick (selectors/slice.rb:3-10)
  new_uri      constructed URI w/ prefix/suffix/wikify/underscore/sequence
               + nofollow (selectors/new_uri.rb:3-38)
  range        numeric offset/kind window — the VisualSelector analog
               (selectors/visual.rb:9-70)
Post-processing on every selector (selector.rb:24-54): boolean, min-max
normalize (+in-range filter), nonempty; nested children compose
sequentially (selector.rb:70-75).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Selector:
    type: str
    values: tuple[str, ...] = ()  # gate URIs / glob patterns / section names
    kind: str | None = None  # span kind filter ('link','heading','text','media')
    pattern: str | None = None  # regex over span text (or media_ref)
    pattern_on: str = "text"  # 'text' | 'media_ref'
    index: int | None = None  # sc:index (xpath.rb:5-9)
    keyword: str | None = None  # sc:keyword (xpath.rb:10-12)
    attribute: str | None = None  # 'media_ref' -> project href (xpath.rb:14-16)
    # slice knobs (slice.rb:6)
    separator: str = " "
    indexes: tuple[int, ...] = ()
    # new_uri knobs (new_uri.rb:12-31)
    prefix: str = ""
    suffix: str = ""
    follow: bool = False
    downcase: bool = False
    sequence: bool = False
    transform: str | None = None  # 'wikify' | 'underscore'
    # range knobs (visual.rb:36-61 analog over offsets)
    min_offset: int | None = None
    max_offset: int | None = None
    kinds: tuple[str, ...] | None = None
    # postproc (selector.rb:24-54)
    boolean: bool = False
    nonempty: bool = False
    norm_min: float | None = None
    norm_max: float | None = None
    norm_in_range: bool = False
    children: tuple["Selector", ...] = ()


@dataclass(frozen=True)
class Fragment:
    fid: str
    selectors: tuple[Selector, ...]
    identifier: tuple[Selector, ...] = ()  # none -> bnode (fragment.rb:105)
    rdf_type: str | None = None  # 'rdf:Literal' switches literal branch
    relation: str | None = None  # parent sc:relation predicate (fragment.rb:33)
    superclass: str | None = None  # rdfs:subClassOf (fragment.rb:77-79)
    sameas: str | None = None  # owl:sameAs
    min_card: int = 0  # sc:min_cardinality (fragment.rb:37)
    max_card: int | None = None  # sc:max_cardinality (fragment.rb:38)
    subfragments: tuple["Fragment", ...] = field(default=())


def link_kb() -> tuple[Fragment, ...]:
    """KB equivalent to the M1 native LinkExtractor: the document node
    sc:references every link target; pagination links additionally type
    their target sc:Page (extra/scraping.yarf:17-20 models pagination the
    same way). Tests assert this KB's interpreter output equals
    semantics.link_triples as a set."""
    ident_link = (Selector(type="span", kind="link", attribute="media_ref"),)
    return (
        Fragment(
            fid="doc",
            selectors=(Selector(type="base_uri"),),
            identifier=(Selector(type="base_uri"),),
            subfragments=(
                Fragment(
                    fid="links",
                    selectors=(Selector(type="span", kind="link"),),
                    identifier=ident_link,
                    relation="sc:references",
                ),
                Fragment(
                    fid="pages",
                    selectors=(
                        Selector(
                            type="span",
                            kind="link",
                            pattern=r"\?page=",
                            pattern_on="media_ref",
                        ),
                    ),
                    identifier=(
                        Selector(
                            type="span",
                            kind="link",
                            pattern=r"\?page=",
                            pattern_on="media_ref",
                            attribute="media_ref",
                        ),
                    ),
                    rdf_type="sc:Page",
                ),
            ),
        ),
    )
