"""RDF serialization sinks (S-6, S-7).

The reference serializes graphs to yarf/rdfxml/json/ntriples
(agent.rb:126, bin/scrappy:199) and optionally dumps each page's triples
to a mangled-URI file (dumper.rb:5-11). Spark-first: N-Triples is a
projection written as text; the per-URI dump is a partitionBy write —
one directory per mangled source URI, no driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _term(col: Column, is_literal: Column) -> Column:
    escaped = F.replace(
        F.replace(col, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )
    return (
        F.when(is_literal, F.concat(F.lit('"'), escaped, F.lit('"')))
        .when(col.startswith("_:"), col)
        .otherwise(F.concat(F.lit("<"), col, F.lit(">")))
    )


def ntriples_lines(triples: DataFrame) -> DataFrame:
    """(s,p,o,is_literal) -> one N-Triples line per row."""
    return triples.select(
        F.concat_ws(
            " ",
            _term(F.col("s"), F.lit(False)),
            F.concat(F.lit("<"), F.col("p"), F.lit(">")),
            _term(F.col("o"), F.col("is_literal")),
            F.lit("."),
        ).alias("value")
    )


def write_ntriples(triples: DataFrame, path: str) -> None:
    ntriples_lines(triples).write.mode("overwrite").text(path)


def mangle_uri_col(c: Column) -> Column:
    """dumper.rb:7 — strip scheme, '/'->'-', '.'->'_', '?'/'&'->'+'."""
    key = F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://", "")
    for a, b in (("/", "-"), (".", "_"), ("?", "+"), ("&", "+")):
        key = F.replace(key, F.lit(a), F.lit(b))
    return key


def write_per_uri_dump(triples: DataFrame, path: str) -> None:
    """S-7 per-URI dump (dumper.rb:5-11, enabled agent.rb:233): one
    partition directory per mangled source URI — the distributed analog of
    the reference's mutex-guarded per-page files."""
    (
        triples.withColumn("uri_key", mangle_uri_col(F.col("src_uri")))
        .write.mode("overwrite")
        .partitionBy("uri_key")
        .parquet(path)
    )
