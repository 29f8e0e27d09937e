"""Full-text relevance retrieval: BM25 top-k over the documents table.

The classic lexical retrieval operator (Robertson/Spärck Jones BM25 —
public literature): score(q, d) = Σ_{t∈q} idf(t) · tf·(k1+1) /
(tf + k1·(1 − b + b·|d|/avgdl)), idf(t) = ln(1 + (N − df + ½)/(df + ½)).
The query set is derived deterministically from the table itself (the
first QUERY_TERMS tokens of every doc_id % QUERY_MOD == 0 document), so
tests and oracles need no external data.

Exactness: every per-(query, term, doc) score term is rounded to 6
decimals and cast to DECIMAL(18,6) BEFORE the per-(query, doc) sum —
exact fixed-point, order-independent, so Spark and DuckDB agree however
they schedule the aggregation (same discipline as
textstats.unigram_logprob; ln() carries the same monitored 1-ulp libm
caveat). Ties in the top-k rank break on doc_id.

100 TB shape: tf and df are one explode + two partial-agg shuffles
(keyed (doc_id, term) then term — near-unique keys, map-side collapse);
the query term set is tiny and broadcasts onto the tf table, so the
only per-query work is over documents actually containing a query term;
the final top-k windows over (query) — query count ≪ corpus, and k is
small, so the per-query groups are the candidate lists, not the corpus.
The corpus parquet is scanned three times (corpus stats, tf, query
derivation), deliberately: each scan is column-pruned and map-only, no
aggregate is ever computed twice, and at full scale three cheap scans
beat persisting a corpus-sized tokenized intermediate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .text import tokens_col

K1 = 1.2
B = 0.75
TOP_K = 5
QUERY_MOD = 50  # doc_id % QUERY_MOD == 0 docs contribute queries
QUERY_TERMS = 4  # first n tokens of each query doc form its query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def bm25_topk(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    return bm25_topk_from(_docs(spark, sf_dir), k=k)


def bm25_topk_from(docs: DataFrame, k: int = TOP_K) -> DataFrame:
    """Top-``k`` documents per derived query by BM25.

    Output: ``q`` (query doc_id), ``doc_id``, ``bm25`` (double, the
    exact decimal score), ``rk`` (1-based). Documents sharing no term
    with a query never appear (standard inverted-index semantics).
    """
    d = docs.select(
        "doc_id", tokens_col(F.col("text")).alias("toks")
    ).withColumn("dl", F.size("toks"))
    stats = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )
    tf = (
        d.select("doc_id", "dl", F.explode("toks").alias("t"))
        .groupBy("doc_id", "dl", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        d.filter((F.col("doc_id") % QUERY_MOD) == 0)
        .select(
            F.col("doc_id").alias("q"),
            F.explode(F.slice("toks", 1, QUERY_TERMS)).alias("t"),
        )
        .distinct()
    )
    avgdl = F.col("total_len") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term = F.round(
        idf
        * (F.col("tf") * (K1 + 1))
        / (F.col("tf") + K1 * (1 - B + B * F.col("dl") / avgdl)),
        6,
    ).cast("decimal(18,6)")
    # qterms is tiny → broadcast is always right; the df/stats side is
    # vocab-sized, so no hint — after the qterms semi-restriction only
    # query-term rows survive and size-based planning broadcasts them
    scored = (
        tf.join(F.broadcast(qterms), "t")
        .join(df_t.crossJoin(F.broadcast(stats)), "t")
        .select("q", "doc_id", term.alias("term"))
        .groupBy("q", "doc_id")
        .agg(F.sum("term").alias("score"))
    )
    w = Window.partitionBy("q").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "q",
            "doc_id",
            F.col("score").cast("double").alias("bm25"),
            F.col("rk").cast("int").alias("rk"),
        )
    )
