"""Operator library: SQL-analogue checks for the crawl operators
(relational.py) plus the training-data pipeline operators the engine adds
beyond the reference — dedup (exact/minhash/simhash/Jaccard/embedding +
sequence-level), similarity search, text analysis, repetition signals,
benchmark decontamination, corpus mixing (quotas/stratified sampling),
sequence packing, multimodal plumbing, composed pipelines, and P/R/F
metrics."""
