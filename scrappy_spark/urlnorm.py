"""URL completion / canonicalization — single spec, two implementations.

Reference semantics reproduced:
  * ``complete_uri`` (lib/scrappy/agent/agent.rb:154-158): a bare word gets
    ``.com`` appended; a schemeless URL gets ``http://`` prefixed.
  * relative-href resolution (lib/scrappy/extractor/fragment.rb:128-135)
    happens at extraction time (see extractor/), via ``resolve``.

Canonical form (fixed spec — oracle and engine MUST agree; property-tested
in tests/test_urlnorm.py):
  1. strip surrounding whitespace
  2. complete_uri (bare word -> word.com; schemeless -> http://)
  3. scheme lowercased; host lowercased; default port stripped
     (:80 for http, :443 for https)
  4. fragment removed; empty path -> '/'
  5. query preserved verbatim

Two implementations of the same spec:
  * ``canonicalize`` — pure Python (used by the oracle and inside
    extraction pandas UDFs for relative resolution).
  * ``canonicalize_col`` — native Spark Column expression chain (the hot
    path: whole-stage-codegen'd, no Python). Equality between the two is a
    test invariant, not an assumption.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


def complete_uri(uri: str) -> str:
    """agent.rb:154-158 — bare word -> word.com; schemeless -> http://."""
    uri = uri.strip()
    if not _SCHEME_RE.match(uri):
        if "." not in uri and "/" not in uri:
            uri = uri + ".com"
        uri = "http://" + uri
    return uri


def canonicalize(uri: str) -> str:
    """Pure-Python canonicalizer (spec above)."""
    uri = complete_uri(uri)
    m = re.match(r"^([^:]+)://([^/?#]*)([^#]*)", uri)
    if not m:  # pragma: no cover — complete_uri guarantees a scheme
        return uri
    scheme = m.group(1).lower()
    hostport = m.group(2).lower()
    rest = m.group(3)
    if scheme == "http" and hostport.endswith(":80"):
        hostport = hostport[:-3]
    elif scheme == "https" and hostport.endswith(":443"):
        hostport = hostport[:-4]
    if rest == "":
        rest = "/"
    return f"{scheme}://{hostport}{rest}"


def resolve(base: str, href: str) -> str:
    """Resolve a (possibly relative) href against a base document URL and
    canonicalize. Mirrors fragment.rb:128-135 (failures fall back to the
    raw href, canonicalized)."""
    try:
        return canonicalize(urljoin(base, href))
    except ValueError:
        return canonicalize(href)


def host_of(uri: str) -> str:
    m = re.match(r"^[^:]+://([^/?#:]*)", uri)
    return m.group(1) if m else ""


def canonicalize_col(c: Column) -> Column:
    """Native Spark Column implementation of ``canonicalize`` — identical
    output (tested), stays inside whole-stage codegen."""
    u = F.trim(c)
    has_scheme = u.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    bare = (~has_scheme) & (~u.contains(".")) & (~u.contains("/"))
    u = F.when(bare, F.concat(u, F.lit(".com"))).otherwise(u)
    u = F.when(~has_scheme, F.concat(F.lit("http://"), u)).otherwise(u)

    scheme = F.lower(F.regexp_extract(u, r"^([^:]+)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]*)", 1))
    rest = F.regexp_extract(u, r"^[^:]+://[^/?#]*([^#]*)", 1)

    hostport = F.when(
        scheme == "http", F.regexp_replace(hostport, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(hostport, r":443$", "")
    ).otherwise(hostport)

    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(scheme, F.lit("://"), hostport, rest)


def host_col(c: Column) -> Column:
    """Host of an already-canonical URL, as a native Column."""
    return F.regexp_extract(c, r"^[^:]+://([^/?#:]*)", 1)
