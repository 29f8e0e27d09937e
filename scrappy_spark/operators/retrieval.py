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
    # qterms is tiny → broadcast is always right. The df table is
    # vocab-sized, but only QUERY terms ever score — semi-restrict it
    # to the query vocabulary first (≤ queries × QUERY_TERMS rows, tiny
    # at ANY corpus scale) and broadcast THAT. The r5 replica audit
    # caught the previous unhinted spelling planning a SortMergeJoin
    # that sorted the corpus-sized tf stream on the low-cardinality
    # term key (hot-key partition sort — the bigram_logprob lesson);
    # with the restricted broadcast the tf stream never shuffles for
    # scoring at all.
    df_q = df_t.join(
        F.broadcast(qterms.select("t").distinct()), "t", "left_semi"
    )
    scored = (
        tf.join(F.broadcast(qterms), "t")
        .join(F.broadcast(df_q.crossJoin(F.broadcast(stats))), "t")
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


# ---------------------------------------------------------------- index

POSTING_BLOCK_SPAN = 128  # doc_id range per posting block


def posting_lists(
    docs: DataFrame, block_span: int = POSTING_BLOCK_SPAN
) -> DataFrame:
    """Blocked inverted-index build — the physical artifact BM25 reads
    (Lucene/PISA ship postings as fixed-span blocks with per-block
    metadata; the block is the unit of skipping and compression). Terms
    here are word BIGRAMS (a phrase index — the unigram vocabulary of
    the driver tables is 31 tokens, too small to index interestingly;
    the kernel is term-agnostic).

    Output: one row per (term, block) — ``block`` = doc_id DIV
    block_span, ``n_docs`` = postings in the block, ``postings_fp`` =
    md5 of the doc_id-ordered ``doc:tf`` serialization (the
    pack_windows discipline: content AND order value-checked through a
    fingerprint, so the oracle pins the exact list bytes without
    shipping megabyte columns through the compare).

    Scale shape: bigram formation is MAP-SIDE — adjacent tokens are
    already collocated inside each document's token array, so terms
    come from a transform over the array + one explode, never a
    lag-window over the exploded stream (the r5 replica audit measured
    that window shuffling+sorting the whole token stream for adjacency
    the array already has — see textstats.bigram_logprob). tf is a
    partial-agg shuffle on (term, doc); blocking is a MAP-ONLY doc_id
    division — deliberately not a per-term rank window, which would
    hand a stopword term's 10^9 postings to a single window task (the
    straggler this layout exists to avoid); the final
    groupBy(term, block) has groups bounded by block_span rows by
    construction. No skew cap needed — boundedness is structural."""
    d = docs.withColumn("toks", tokens_col(F.col("text")))
    terms = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(toks[i-1], ' ', toks[i]))"
    )
    big = (
        d.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(terms).alias("term"))
    )
    tf = big.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    blocked = tf.withColumn(
        "block", F.expr(f"doc_id DIV {block_span}").cast("long")
    )
    return (
        blocked.groupBy("term", "block")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("doc_id", "tf"))
                        ),
                        lambda x: F.concat(
                            x["doc_id"].cast("string"),
                            F.lit(":"),
                            x["tf"].cast("string"),
                        ),
                    ),
                    ";",
                )
            ).alias("postings_fp"),
        )
    )


def posting_lists_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: blocked bigram posting lists over documents.
    Columns (term, block, n_docs, postings_fp)."""
    return posting_lists(_docs(spark, sf_dir))
