"""Request-shaped driver facade — the reference's web-service layer
(lib/scrappy/server/server.rb:19-41, admin.rb:134-239, agent.rb:114-137)
without the HTTP stack.

`process_request` reproduces server.rb:28-41 exactly: de-mangle the URL
(`:29` — the path-collapsed `http:/x` form back to `http://x`), run the
agent (here: a depth-limited crawl whose fetches hit the documents
table), then negotiate the response — `:redirect` bounces to the final
URI (`:32-33`), `:ok` serializes with the format's content type and an
optional JSONP callback wrap (`:34-36`), anything else is an error
(`:37-39` → HTTP 500). Formats and content types follow
`Agent::ContentTypes` (agent.rb:12-13) for the formats that have a
public Spark analog: ntriples (text/plain), json/ejson
(application/json); yarf/rdfxml/png need reference-only gems and report
an error status like any serializer failure.

The admin endpoints (`admin.rb:134-239`: annotate samples, train, test,
optimize) map onto the learning layer: `train` → learning.train_kb,
`optimize` → learning.hill_climb, `test_kb` → the A-3/A-4 metric kernels.

Serialization here COLLECTS — this is the interactive single-request
path (one page's cleaned triples); bulk serialization is the
distributed sink (sources/sinks.py write_ntriples / write_per_uri_dump).
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..frontier import CrawlConfig, Crawler
from ..urlnorm import canonicalize
from .sinks import (
    RDFXML_FOOTER,
    RDFXML_HEADER,
    ntriples_lines,
    rdf_json_lines,
    rdfxml_descriptions,
    yarf_blocks,
)

CONTENT_TYPES = {  # agent.rb:12-13 (the publicly-serializable subset)
    "ntriples": "text/plain",
    "json": "application/json",
    "ejson": "application/json",
    "rdfxml": "application/rdf+xml",  # round 4 (sinks.py matrix)
    "rdf": "application/rdf+xml",
    "yarf": "text/plain",
}


@dataclass(frozen=True)
class Response:
    status: str  # 'ok' | 'redirect' | 'error'  (server.rb:31-39)
    content_type: str | None = None
    output: str | None = None
    uri: str | None = None


def demangle_url(url: str) -> str:
    """server.rb:29 — a proxy path collapses '//' to '/'; restore it."""
    if re.search(r"https?:/\w", url):
        url = url.replace("http:/", "http://").replace("https:/", "https://")
        url = url.replace("http:///", "http://").replace("https:///", "https://")
    return url


class ScrappyService:
    """One service instance over a documents table (the web) and a store
    root (each request crawls into a fresh store dir, like the per-session
    agent pool server.rb:43-50)."""

    def __init__(
        self,
        spark: SparkSession,
        documents: DataFrame,
        store_root: str,
        config: CrawlConfig | None = None,
        referenceable: bool = False,
    ):
        self.spark = spark
        self.documents = documents
        self.store_root = store_root
        self.cfg = config or CrawlConfig(depth=0)
        # -r (bin/scrappy:43): crawl with the fragment extractor in
        # referenceable mode so responses carry the sc:source /
        # sc:UnivocalSelector provenance graph per node
        self.referenceable = referenceable
        os.makedirs(store_root, exist_ok=True)

    def process_request(
        self, fmt: str, url: str, callback: str | None = None
    ) -> Response:
        if fmt not in CONTENT_TYPES:
            return Response(status="error")  # serializer failure → 500
        uri = canonicalize(demangle_url(url))
        redirects = dict(self.cfg.redirects)
        if uri in redirects:  # server.rb:32-33 — client-visible redirect
            return Response(status="redirect", uri=redirects[uri])
        if self.documents.where(
            self.documents.doc_id == uri
        ).isEmpty():  # fetch failure → 500 (server.rb:37-39)
            return Response(status="error", uri=uri)
        store = tempfile.mkdtemp(prefix="req_", dir=self.store_root)
        extractor = None
        if self.referenceable:
            from ..extractor import FragmentExtractor
            from ..extractor.kb import link_kb

            extractor = FragmentExtractor(link_kb(), referenceable=True)
        crawler = Crawler(
            self.spark, self.documents, store, self.cfg, extractor=extractor
        )
        crawler.run([uri])
        body = self._serialize(crawler.clean_triples_df(), fmt)
        if callback:  # JSONP wrap, server.rb:35
            body = f"{callback}({body})"
        return Response(
            status="ok", content_type=CONTENT_TYPES[fmt], output=body, uri=uri
        )

    @staticmethod
    def _serialize(triples: DataFrame, fmt: str) -> str:
        if fmt == "ntriples":
            lines = [r["value"] for r in ntriples_lines(triples).collect()]
            return "\n".join(sorted(lines))
        if fmt in ("rdfxml", "rdf"):
            descs = [r["value"] for r in rdfxml_descriptions(triples).collect()]
            return "\n".join([RDFXML_HEADER, *sorted(descs), RDFXML_FOOTER])
        if fmt == "yarf":
            blocks = [r["value"] for r in yarf_blocks(triples).collect()]
            return "\n".join(sorted(blocks))
        if fmt == "ejson":
            # the reference's second JSON form: resource-centric RDF/JSON.
            # The per-subject JSON-lines are merged into ONE document
            # object — the facade body must be a single JSON value so the
            # JSONP callback wrap stays syntactically valid JS (its plain
            # "json" stays the flat rows dump below)
            merged: dict = {}
            for r in rdf_json_lines(triples).collect():
                merged.update(json.loads(r["value"]))
            return json.dumps(merged, sort_keys=True)
        rows = [
            {
                "s": r["s"],
                "p": r["p"],
                "o": r["o"],
                "is_literal": r["is_literal"],
            }
            for r in triples.collect()
        ]
        rows.sort(key=lambda r: (r["s"], r["p"], r["o"]))
        return json.dumps(rows)

    # ---- admin endpoints (admin.rb:134-239) → learning layer ----------
    def train(self, samples):
        """POST /samples + train (admin.rb:134-166) → induced KB."""
        from ..learning import train_kb

        return train_kb(samples)

    def optimize(self, kb, docs: DataFrame, golden: DataFrame):
        """optimize endpoint (admin.rb admin path → optimizer.rb:58-109)."""
        from ..learning import hill_climb

        return hill_climb(kb, docs, golden)

    def test_kb(self, kb, docs: DataFrame, golden: DataFrame) -> dict:
        """POST /samples/test/:kb_type (admin.rb:167-239): total and
        per-predicate P/R/F over annotated samples."""
        from ..extractor.extract import extract_triples
        from ..operators import metrics

        extracted = extract_triples(docs, kb)
        total = metrics.prf(golden, extracted).collect()[0].asDict()
        by_pred = [
            r.asDict()
            for r in metrics.prf_by_predicate(golden, extracted)
            .orderBy("p")
            .collect()
        ]
        return {"total": total, "by_predicate": by_pred}
