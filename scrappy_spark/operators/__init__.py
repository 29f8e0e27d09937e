"""Operator library: SQL-analogue checks for the crawl operators
(relational.py) plus the training-data pipeline operators the engine adds
beyond the reference — dedup, similarity search, text analysis, multimodal
plumbing, and P/R/F metrics."""
