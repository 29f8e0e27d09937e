"""scrappy_spark — a PySpark-native URL-frontier + fetch-scheduler +
RDF-extraction engine with the capabilities of josei/scrappy (Ruby),
re-expressed Spark-first.

Not a port: the reference's thread-pool FIFO agent loop
(reference: lib/scrappy/agent/map_reduce.rb:50-64) becomes a
level-synchronized BFS over DataFrame snapshots; its selector algebra
(lib/scrappy/extractor/selectors/*) becomes vectorized pandas/Arrow UDFs
over interleaved span sequences; its caches and Sesame repository become
checkpointed tables with timestamp predicates.

Layout:
  urlnorm    — URL completion/canonicalization (agent.rb:154-158, fragment.rb:128-135)
  corpus     — deterministic synthetic web (interleaved-spans documents table)
  oracle     — pure-Python reference crawl oracle (map_reduce.rb + agent.rb semantics)
  frontier/  — crawler loop, seen-set (bloom + anti-join), politeness, checkpoints
  extractor/ — KB fragment model + vectorized selector algebra
  operators/ — dedup / similarity / text-analysis / metrics (training-data pipeline)
  sources/   — readers/sinks (N-Triples, per-URI dump)
  streaming/ — observe-mode periodic re-crawl
"""

__version__ = "0.1.0"
