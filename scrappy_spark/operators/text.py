"""Shared text primitives for the training-data operators.

Everything is built on md5-derived 60-bit hashes so the DuckDB oracles can
reproduce results bit-for-bit: Spark `conv(substr(md5(s),1,15),16,10)`
== DuckDB `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (both engines: regex \\s+ on trimmed text)."""
    return F.split(F.trim(text), r"\s+")


def hash60_col(s: Column) -> Column:
    """Deterministic 60-bit hash reproducible in DuckDB (see module doc)."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def qw_weight_col(token: Column) -> Column:
    """Hashed-linear quality weight of one token, integer milli-units in
    [−500, 500]: ``hash60('qw:'||t) % 1001 − 500``. The SINGLE
    definition shared by ``textstats.quality_linear`` (per-doc scorer)
    and ``curation.retention_curve`` (threshold sweep) so the score a
    threshold was swept against is bit-identical to the score the gate
    applies — two copies of this closure drifting is a silent
    mis-calibration with no error."""
    return (
        hash60_col(F.concat(F.lit("qw:"), token)) % 1001 - 500
    ).cast("long")


def tokens_py(text: str | None) -> list[str] | None:
    """The SAME whitespace tokenization as ``tokens_col``, computed in
    Python — the single row-side definition every streaming kernel and
    pure-python oracle must use. Faithful to the JVM semantics, not to
    Python idiom: Spark ``trim`` strips ASCII spaces only (not \\n or
    \\xa0), Java ``\\s`` is the ASCII class, and ``split`` on an empty
    string yields ``['']`` (so an empty document has dl=1, exactly as
    ``size(tokens_col(''))`` reports)."""
    import re

    if text is None:
        return None
    t = text.strip(" ")
    return re.split(r"[ \t\n\x0b\f\r]+", t)


def hash60_py(s: str) -> int:
    """The SAME 60-bit primitive as ``hash60_col``, computed in Python —
    the single definition every driver-side / pandas-UDF / streaming
    kernel must use so hash-derived placement (simhash bits, LSH
    planes, trigram buckets, stream admission priority) stays
    bit-identical to the JVM expression and the DuckDB oracles."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def shingles_expr(tokens_sql: str, n: int = 3) -> str:
    """Spark SQL string for shingles over a tokens-array expression."""
    parts = ", ".join(f"__t[i+{j}]" for j in range(n))
    return (
        f"transform(sequence(0, size({tokens_sql}) - {n}), "
        f"i -> concat_ws(' ', {parts}))"
    ).replace("__t", tokens_sql)


# DuckDB-side equivalents (format with a column/expr name).
# The whitespace class is EXPLICIT ASCII, not '\\s': Java's \\s is
# [ \\t\\n\\x0B\\f\\r] while RE2's lacks \\x0B — spelling the class out
# keeps both engines tokenizing identically on every byte.
DUCK_TOKENS = "string_split_regex(trim({col}), '[ \\t\\n\\x0B\\f\\r]+')"
DUCK_HASH60 = "CAST(concat('0x', substr(md5({s}), 1, 15)) AS BIGINT)"

# whitespace-normalized lowercase md5 — the exact-duplicate fingerprint
# shared by textstats.fingerprint, corpus_profile, and their mirrors
DUCK_FP = (
    "md5(regexp_replace(lower(trim({col})), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
)


def norm_fp_col(text: Column) -> Column:
    """Whole-document exact-duplicate fingerprint: md5 of the
    whitespace-normalized lowercase text (the Spark side of DUCK_FP)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def duck_shingles(tokens_sql: str, n: int = 3) -> str:
    """DuckDB shingles over a (1-based) tokens list expression."""
    parts = " || ' ' || ".join(f"__t[i+{j}]" for j in range(n))
    return (
        f"list_transform(range(1, len({tokens_sql}) - {n - 2}), "
        f"i -> {parts})"
    ).replace("__t", tokens_sql)
