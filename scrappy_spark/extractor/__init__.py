"""Extraction layer: the reference's scraping-ontology fragment trees
(lib/scrappy/extractor/*) re-expressed over interleaved span sequences.

kb.py       — Fragment/Selector config model (broadcast-size, driver-side)
formats.py  — text rendering + string utils (formats.rb, support.rb)
interp.py   — pure per-document interpreter (the semantics spec; used by
              the oracle AND inside the engine's Arrow-batched UDF)
extract.py  — Spark integration: FragmentExtractor for the Crawler
"""

from .kb import Fragment, Selector  # noqa: F401
from .extract import FragmentExtractor  # noqa: F401
