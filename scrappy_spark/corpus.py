"""Deterministic synthetic web — the interleaved-spans `documents` table.

Shape per BASELINE.json input_hint / FIXTURES.md §1:
    doc_id : string                            (canonical URL)
    spans  : array<struct<kind:string, text:string,
                          media_ref:string, offset:int>>
kind ∈ {text, heading, link, media}; offset = document order, 0-based.

Synthesis rules (FIXTURES.md §1, seed=42):
  * hostnames zipf(s≈1.2) over ``n_hosts`` hosts — exercises skew splitting
  * links: ~85% reference other doc_ids, ~10% dangling, ~5% duplicate
    targets within a page (first-wins dedup, agent.rb:80-82)
  * pagination chains (every 17th index starts a 3-page chain) whose
    next-page links carry ``?page=`` — typed sc:Page by the KB (F-6)
  * a fraction of docs are media-only (non-HTML gate S-3,
    blind_agent.rb:32-34)
  * ~25% of same-host links are emitted as *relative* hrefs (exercises
    resolution, fragment.rb:128-135)

Everything is a pure function of (seed, index) — the oracle generates rows
in-process, the engine generates the same rows distributed via mapInPandas,
and both see the identical web.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("offset", T.IntegerType(), False),
    ]
)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT, False), False),
    ]
)

_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa price total "
    "contact about review item detail offer news sport index archive"
).split()
_HEADINGS = ["intro", "details", "contact", "reviews", "archive"]
_CHAIN_EVERY = 17
_CHAIN_LEN = 3


@dataclass(frozen=True)
class CorpusConfig:
    n_docs: int = 2000
    n_hosts: int = 100
    zipf_s: float = 1.2
    seed: int = 42
    media_only_frac: float = 0.05
    dangling_frac: float = 0.10
    dup_frac: float = 0.05
    relative_frac: float = 0.25
    max_links: int = 6
    # document weight knobs (defaults preserve the original RNG sequence)
    sections_max: int = 3
    texts_per_section_max: int = 3
    words_max: int = 8


def _zipf_weights(cfg: CorpusConfig) -> list[float]:
    w = [1.0 / ((r + 1) ** cfg.zipf_s) for r in range(cfg.n_hosts)]
    s = sum(w)
    return [x / s for x in w]


def _chain_pos(i: int) -> tuple[int, int]:
    """(chain_start_index, page_k) for index i; page_k==0 means first page."""
    block = i % _CHAIN_EVERY
    if block < _CHAIN_LEN and i - block >= 0:
        return i - block, block
    return i, 0


def _host_of_index(i: int, cfg: CorpusConfig) -> int:
    start, _ = _chain_pos(i)
    rng = random.Random((cfg.seed << 33) ^ (start * 2654435761))
    # cumulative-weight draw; weights are tiny (n_hosts) so linear is fine
    x = rng.random()
    acc = 0.0
    for h, w in enumerate(_zipf_weights_cached(cfg)):
        acc += w
        if x < acc:
            return h
    return cfg.n_hosts - 1


_weights_cache: dict[tuple, list[float]] = {}


def _zipf_weights_cached(cfg: CorpusConfig) -> list[float]:
    key = (cfg.n_hosts, cfg.zipf_s)
    if key not in _weights_cache:
        _weights_cache[key] = _zipf_weights(cfg)
    return _weights_cache[key]


def url_of_index(i: int, cfg: CorpusConfig) -> str:
    start, k = _chain_pos(i)
    h = _host_of_index(i, cfg)
    base = f"http://h{h:03d}.example.com/p{start}"
    return base if k == 0 else f"{base}?page={k + 1}"


def doc_record(i: int, cfg: CorpusConfig) -> dict:
    """The i-th document — pure function of (cfg.seed, i)."""
    rng = random.Random((cfg.seed << 32) ^ (i * 1099511628211))
    url = url_of_index(i, cfg)
    start, page_k = _chain_pos(i)
    my_host = _host_of_index(i, cfg)

    spans: list[dict] = []
    off = 0

    def add(kind: str, text: str = "", media_ref: str = "") -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    if rng.random() < cfg.media_only_frac and page_k == 0:
        for j in range(1 + rng.randrange(3)):
            add("media", "", f"http://cdn.example.com/img{i}_{j}.jpg")
        return {"doc_id": url, "spans": spans}

    # body: interleaved headings / text / links / media
    n_sections = 1 + rng.randrange(cfg.sections_max)
    link_targets: list[str] = []
    for s in range(n_sections):
        add("heading", _HEADINGS[(i + s) % len(_HEADINGS)])
        for _ in range(1 + rng.randrange(cfg.texts_per_section_max)):
            words = " ".join(
                rng.choice(_WORDS) for _ in range(3 + rng.randrange(cfg.words_max))
            )
            if rng.random() < 0.3:
                words += f" price: {rng.randrange(5, 500)}.{rng.randrange(100):02d}"
            add("text", words)
        if rng.random() < 0.3:
            add("media", "", f"http://cdn.example.com/img{i}_{s}.png")
        n_links = rng.randrange(cfg.max_links + 1)
        for _ in range(n_links):
            x = rng.random()
            if link_targets and x < cfg.dup_frac:
                href = rng.choice(link_targets)
            elif x < cfg.dup_frac + cfg.dangling_frac:
                href = f"http://h{rng.randrange(cfg.n_hosts):03d}.example.com/missing{rng.randrange(10 * cfg.n_docs)}"
            else:
                j = rng.randrange(cfg.n_docs)
                href = url_of_index(j, cfg)
                if (
                    _host_of_index(j, cfg) == my_host
                    and rng.random() < cfg.relative_frac
                ):
                    # relative form: path(+query) only
                    href = href.split(".example.com", 1)[1]
            link_targets.append(href)
            add("link", f"go {len(link_targets)}", href)

    if page_k < _CHAIN_LEN - 1 and start + page_k + 1 < cfg.n_docs:
        # pagination next-link (same chain, ?page= marker => sc:Page)
        add("link", "next page", url_of_index(i + 1, cfg))
    return {"doc_id": url, "spans": spans}


def generate_local(cfg: CorpusConfig) -> dict[str, list[dict]]:
    """In-process web: {canonical_url: spans} — what the oracle crawls."""
    return {r["doc_id"]: r["spans"] for r in (doc_record(i, cfg) for i in range(cfg.n_docs))}


def generate_df(spark: SparkSession, cfg: CorpusConfig, partitions: int = 32) -> DataFrame:
    """Same web, generated distributed (one task per id-range slice)."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [doc_record(int(i), cfg) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "spans": [
                        [
                            (s["kind"], s["text"], s["media_ref"], s["offset"])
                            for s in r["spans"]
                        ]
                        for r in rows
                    ],
                }
            )

    return (
        spark.range(0, cfg.n_docs, numPartitions=partitions)
        .mapInPandas(gen, DOCUMENTS_SCHEMA)
    )


def seeds_for(cfg: CorpusConfig, n_seeds: int = 2) -> list[str]:
    """Deterministic seed list: the first pages of the n most-likely hosts'
    earliest chains — guaranteed to exist in the table."""
    return [url_of_index(i * _CHAIN_EVERY, cfg) for i in range(n_seeds)]
