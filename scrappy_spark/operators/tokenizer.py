"""Tokenizer-induction kernel: BPE merge-pair counting at corpus scale.

The engine-side half of BPE/WordPiece training.  A tokenizer trainer
iterates "count adjacent symbol pairs, merge the argmax"; the counting
pass is the only corpus-scale step and is what a 100 TB pipeline runs on
the cluster (the merge loop itself is driver-side model fitting over the
returned table).  This module computes ONE iteration's pair-count table
at the character level — the first iteration of every BPE run, and the
shape of all later ones (later iterations differ only in the symbol
split of each word, which is model state, not engine input).

100 TB shape — the industrial-BPE trick (Sennrich et al. 2016 train on
word-frequency dictionaries, not running text):

* stage 1 is the ONLY corpus-sized stage: pre-tokenize map-side
  (``regexp_extract_all``, whole-stage codegen) and partial-agg count
  distinct words.  Map-side combine collapses each partition to its
  local vocabulary before the shuffle, so shuffle bytes are
  vocab-sized, not corpus-sized.
* every later stage runs over DISTINCT words weighted by frequency —
  cost per merge iteration is |vocab|, independent of corpus size.
* pair adjacency comes from the word string itself via a map-side
  ``transform(sequence(...))`` — never a window over an exploded
  token stream (the round-5 replica audit showed the lag-window
  spelling adds the only corpus-sized Exchange; see
  ``textstats.bigram_logprob``'s module note).
* top-k merges via orderBy+limit → ``TakeOrderedAndProject`` (per-
  partition heaps + driver merge of k rows, no global sort).

Ties at the k-boundary are broken (count DESC, s1 ASC, s2 ASC) so the
selected set is total-order deterministic — the DuckDB mirror uses the
same key, which is what makes the LIMIT oracle-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import BPE_PATTERN

# top-k pairs returned by the driver entry: small enough to stay a
# TakeOrderedAndProject, large enough that the boundary exercises the
# tie-break (character-pair counts collide constantly in real text)
PAIR_TOPK = 32


def bpe_pair_counts(docs: DataFrame, k: int = PAIR_TOPK) -> DataFrame:
    """One BPE iteration's merge-pair statistics: (s1, s2, pair_count)
    for adjacent character pairs inside pre-tokenized words, weighted
    by word frequency; top-k by (count DESC, s1, s2).

    Single-character words carry no pair and are filtered before the
    fan-out (``sequence(1, 0)`` would otherwise generate a DESCENDING
    [1, 0] range — Spark's sequence never returns empty).
    """
    words = docs.select(
        F.explode(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias("word")
    )
    wf = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .where(F.length("word") >= 2)
    )
    pairs = wf.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1), "
                "i -> struct(substring(word, i, 1) AS s1, "
                "substring(word, i + 1, 1) AS s2))"
            )
        ).alias("p"),
        "wc",
    ).select("p.s1", "p.s2", "wc")
    return (
        pairs.groupBy("s1", "s2")
        .agg(F.sum("wc").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("s1"), F.asc("s2"))
        .limit(k)
    )


def bpe_pair_counts_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_pair_counts(docs)
