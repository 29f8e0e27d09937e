"""Spark integration of the fragment interpreter.

FragmentExtractor plugs into frontier.Crawler exactly like the native
LinkExtractor: extract(fetched) -> (triples, candidates). One Arrow-batched
mapInPandas pass runs the interpreter per document AND computes the
link-emission order (semantics.emit_links — the same function the oracle
runs, so ordering parity is structural). The KB is broadcast once.

Rows are emitted in a single union-typed frame (row_type 't'|'c') so the
UDF runs once; the two outputs are filtered views over the persisted
result.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import semantics
from .interp import extract_document
from .kb import Fragment

COMBINED_SCHEMA = (
    "row_type string, s string, p string, o string, is_literal boolean, "
    "c_uri string, c_depth int, parent_seq long, emit_idx int, "
    "src_uri string, src_seq long"
)


def extract_triples(
    docs: DataFrame, kb: tuple[Fragment, ...], referenceable: bool = False
) -> DataFrame:
    """Run a KB over a documents table (doc_id, spans) WITHOUT crawling —
    the reference's 'test this extractor on these samples' path
    (admin.rb:167-239). Single mapInPandas pass, single output, no cache:
    the memory-lean shape for bulk re-extraction over a 100 TB table.
    ``referenceable`` adds the per-node sc:source/sc:UnivocalSelector
    provenance graph (the reference's -r output shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for uri, spans in zip(pdf["doc_id"], pdf["spans"]):
                if spans is None or len(spans) == 0:
                    continue
                span_dicts = [
                    {
                        "kind": s["kind"],
                        "text": s["text"],
                        "media_ref": s["media_ref"],
                        "offset": s["offset"],
                    }
                    for s in spans
                ]
                if not semantics.is_html(span_dicts):
                    continue
                for s, p, o, lit in extract_document(
                    kb, uri, span_dicts, referenceable
                ):
                    rows.append((s, p, o, lit, uri))
            yield pd.DataFrame(
                rows, columns=["s", "p", "o", "is_literal", "src_uri"]
            )

    return docs.select("doc_id", "spans").mapInPandas(
        run, "s string, p string, o string, is_literal boolean, src_uri string"
    )


def extract_triples_tagged(
    docs: DataFrame, kbs: list[tuple[str, tuple[Fragment, ...]]]
) -> DataFrame:
    """Run MANY candidate KBs over the documents table in ONE pass,
    tagging each output triple with its candidate id — the hill-climb
    batch-scoring path (VERDICT r2 #6: one distributed extraction per
    optimizer iteration instead of one per candidate). Each document's
    span list is decoded once and interpreted under every candidate."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for uri, spans in zip(pdf["doc_id"], pdf["spans"]):
                if spans is None or len(spans) == 0:
                    continue
                span_dicts = [
                    {
                        "kind": s["kind"],
                        "text": s["text"],
                        "media_ref": s["media_ref"],
                        "offset": s["offset"],
                    }
                    for s in spans
                ]
                if not semantics.is_html(span_dicts):
                    continue
                for cid, kb in kbs:
                    for s, p, o, lit in extract_document(kb, uri, span_dicts):
                        rows.append((cid, s, p, o, lit, uri))
            yield pd.DataFrame(
                rows, columns=["cand", "s", "p", "o", "is_literal", "src_uri"]
            )

    return docs.select("doc_id", "spans").mapInPandas(
        run,
        "cand string, s string, p string, o string, is_literal boolean, "
        "src_uri string",
    )


class FragmentExtractor:
    def __init__(self, kb: tuple[Fragment, ...], referenceable: bool = False):
        self.kb = kb
        self.referenceable = referenceable
        self._cached: DataFrame | None = None

    def cleanup(self) -> None:
        if self._cached is not None:
            self._cached.unpersist()
            self._cached = None

    def extract(self, fetched: DataFrame) -> tuple[DataFrame, DataFrame]:
        kb = self.kb  # closure-captured; broadcast via task serialization
        referenceable = self.referenceable

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows: list[tuple] = []
                for uri, depth, seq, spans in zip(
                    pdf["uri"], pdf["depth"], pdf["seq"], pdf["spans"]
                ):
                    if spans is None or len(spans) == 0:
                        continue
                    span_dicts = [
                        {
                            "kind": s["kind"],
                            "text": s["text"],
                            "media_ref": s["media_ref"],
                            "offset": s["offset"],
                        }
                        for s in spans
                    ]
                    if not semantics.is_html(span_dicts):
                        continue
                    triples = extract_document(kb, uri, span_dicts, referenceable)
                    for s, p, o, lit in triples:
                        rows.append(
                            ("t", s, p, o, lit, None, None, None, None, uri, seq)
                        )
                    items = semantics.emit_links(uri, int(depth), triples)
                    for idx, (c_uri, c_depth) in enumerate(items):
                        rows.append(
                            (
                                "c",
                                None,
                                None,
                                None,
                                None,
                                c_uri,
                                c_depth,
                                seq,
                                idx + 1,
                                uri,
                                seq,
                            )
                        )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "row_type",
                        "s",
                        "p",
                        "o",
                        "is_literal",
                        "c_uri",
                        "c_depth",
                        "parent_seq",
                        "emit_idx",
                        "src_uri",
                        "src_seq",
                    ],
                )

        combined = fetched.select("uri", "depth", "seq", "spans").mapInPandas(
            run, COMBINED_SCHEMA
        )
        combined = combined.persist()
        self._cached = combined

        triples = combined.where(F.col("row_type") == "t").select(
            "s", "p", "o", "is_literal", "src_uri", "src_seq"
        )
        candidates = combined.where(F.col("row_type") == "c").select(
            "c_uri", "c_depth", "parent_seq", "emit_idx"
        )
        return triples, candidates
