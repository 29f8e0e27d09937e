"""Sequence packing: lay documents out into fixed-length training
windows.

The last stage of a training-data pipeline: concatenate the cleaned
token streams and cut them into SEQ_LEN-token examples (GPT-style
boundary-agnostic packing — a document may straddle two windows; the
loader masks or splits at read time). The operator does not tokenize the
world again: it consumes the per-document token COUNT and computes, for
every document, where its tokens land — shard, running stream offset,
pack (window) index, and offset within the pack. That layout table is
what a writer needs to emit packed shards without ever materializing a
corpus-wide token array.

100 TB shape: the naive layout is one cumulative sum over a global
document order — a single-partition window, i.e. the whole corpus
through one task. Instead the stream is SHARDED up front by a
deterministic hash of the document id: each shard gets its own
independent token stream packed in (hash, doc_id) order, so the layout
is one shuffle keyed by shard and a running-sum window whose state is a
single counter (Spark evaluates it streaming over the shard's sorted
rows — the sort spills, the sum does not). Shard count is a knob set to
saturate the cluster; packs are complete within a shard, which is
exactly how packed training data is laid out on disk anyway (one writer
per output file). The DuckDB mirror runs the same windows verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .text import hash60_col, tokens_col

SEQ_LEN = 256  # tokens per packed training window
NUM_SHARDS = 8  # independent pack streams (≫ executors in production)


def _pack_tokens() -> "F.Column":
    """Token array used by every packer, NULL-hardened: a NULL-text
    document tokenizes as the empty document (one ''-token, the repo's
    documented dl=1 whitespace semantics) instead of a NULL array —
    which would give it a NULL layout row in pack_sequences while
    pack_windows silently dropped it, two views of ONE layout
    disagreeing (review r5; the multimodal packer was hardened for the
    same class)."""
    return tokens_col(F.coalesce(F.col("text"), F.lit("")))


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pack_sequences(
    spark: SparkSession,
    sf_dir: str,
    seq_len: int = SEQ_LEN,
    num_shards: int = NUM_SHARDS,
) -> DataFrame:
    return pack_sequences_from(
        _docs(spark, sf_dir), seq_len=seq_len, num_shards=num_shards
    )


def layout_from(
    per_doc: DataFrame, cost_col: str, seq_len: int, num_shards: int
) -> DataFrame:
    """The sharded running-sum layout kernel shared by every packer
    (token packing here, multimodal packing in ``interleaved.py`` —
    previously a line-for-line copy that had to be kept in sync by
    hand). ``per_doc``: one row per document with ``doc_id`` and the
    document's cost in ``cost_col`` units (tokens, token-equivalents).

    Output: ``doc_id``, ``shard``, ``<cost_col>``, ``stream_off``
    (offset of the document's first unit in its shard's concatenated
    stream), ``pack_id`` (window index ``stream_off // seq_len`` within
    the shard), ``pack_off`` (offset within that window). Deterministic:
    shard and order derive from the document id's hash, so re-running
    yields the identical layout.
    """
    h = hash60_col(F.col("doc_id").cast("string"))
    d = per_doc.select("doc_id", cost_col, h.alias("h")).withColumn(
        "shard", (F.col("h") % num_shards).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    stream_off = (F.sum(cost_col).over(w) - F.col(cost_col)).alias(
        "stream_off"
    )
    d = d.select("doc_id", "shard", cost_col, stream_off)
    # integer division (never float) and a 64-bit pack_id: a shard
    # stream past 2^31 packs is reachable at full scale with a small
    # shard count, and offsets stay exact at any magnitude
    return d.select(
        "doc_id",
        "shard",
        cost_col,
        "stream_off",
        F.expr(f"stream_off DIV {seq_len}").alias("pack_id"),
        (F.col("stream_off") % seq_len).cast("int").alias("pack_off"),
    )


def pack_sequences_from(
    docs: DataFrame, seq_len: int = SEQ_LEN, num_shards: int = NUM_SHARDS
) -> DataFrame:
    """Per-document packed layout (see ``layout_from`` for the output
    contract; cost = whitespace/BPE-regex token count)."""
    per_doc = docs.select(
        "doc_id", F.size(_pack_tokens()).alias("n_tokens")
    )
    return layout_from(per_doc, "n_tokens", seq_len, num_shards)


def pack_windows(
    spark: SparkSession,
    sf_dir: str,
    seq_len: int = SEQ_LEN,
    num_shards: int = NUM_SHARDS,
) -> DataFrame:
    """Materialize the packed windows themselves: every token is mapped
    to its (shard, pack, slot) cell by the ``pack_sequences`` layout and
    regrouped into per-window token sequences — what the shard writer
    actually emits.

    Output: one row per window — ``shard``, ``pack_id``, ``n_toks``
    (tokens landed in the window; every window is exactly ``seq_len``
    full except each shard's last), and ``window_fp`` = md5 of the
    space-joined tokens IN ORDER. The fingerprint stands in for the
    token array so the oracle value-checks content AND order with a
    scalar column (the driver compare cannot hash array cells).
    Determinism: collect_list order is not guaranteed, so tokens are
    collected as (slot, token) structs and sort_array'd — canonical
    regardless of task scheduling.

    100 TB shape: the layout is recomputed INLINE carrying the token
    array through the shard window (joining back to a separate
    pack_sequences plan would scan and tokenize the corpus twice and
    shuffle both sides on doc_id — measured and rejected), so the whole
    operator is ONE scan and ONE exchange (asserted): the shard
    window's partitioning already co-locates every (shard, pack_id)
    group, so the regroup adds no shuffle; its group size is bounded by
    ``seq_len`` tokens — no skew possible by construction.
    """
    h = hash60_col(F.col("doc_id").cast("string"))
    d = (
        _docs(spark, sf_dir)
        .select("doc_id", _pack_tokens().alias("toks"))
        .withColumn("h", h)
        .withColumn("shard", (F.col("h") % num_shards).cast("int"))
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    d = d.withColumn(
        "stream_off",
        F.sum(F.size("toks")).over(w) - F.size("toks"),
    )
    toks = (
        d.select(
            "shard",
            F.posexplode("toks").alias("pos", "t"),
            F.col("stream_off"),
        )
        .select(
            "shard",
            "t",
            (F.col("stream_off") + F.col("pos")).alias("idx"),
        )
        .select(
            "shard",
            "t",
            F.expr(f"idx DIV {seq_len}").alias("pack_id"),
            (F.col("idx") % seq_len).cast("int").alias("slot"),
        )
    )
    return (
        toks.groupBy("shard", "pack_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("slot"), F.col("t")))
            ).alias("cells")
        )
        .select(
            "shard",
            "pack_id",
            F.size("cells").cast("int").alias("n_toks"),
            F.md5(
                F.concat_ws(" ", F.transform("cells", lambda c: c["t"]))
            ).alias("window_fp"),
        )
    )


def pack_efficiency(
    spark: SparkSession,
    sf_dir: str,
    seq_len: int = SEQ_LEN,
    num_shards: int = NUM_SHARDS,
) -> DataFrame:
    """The shard writer's utilization report: per shard, how many
    SEQ_LEN windows the stream fills, how many are full, the tail
    fragment, padding tokens paid, and utilization in integer ppm.

    Deliberately computed WITHOUT the layout window: every figure is
    integer arithmetic over the shard's token TOTAL (windows =
    ceil(T/L), tail = T % L, padding = (L − tail) % L, utilization =
    T·10⁶ DIV (windows·L)), so the report is one partial-agg shuffle of
    |shards| rows — a stats table must never cost a corpus-wide window
    when a sum determines it. Integer ppm, never a float ratio (the
    adaptive-budget discipline)."""
    h = hash60_col(F.col("doc_id").cast("string"))
    per_shard = (
        _docs(spark, sf_dir)
        .select(
            (h % num_shards).cast("int").alias("shard"),
            F.size(_pack_tokens()).alias("n"),
        )
        .groupBy("shard")
        .agg(F.sum("n").alias("total_tokens"))
    )
    t = F.col("total_tokens")
    windows = F.expr(f"(total_tokens + {seq_len} - 1) DIV {seq_len}")
    return per_shard.select(
        "shard",
        t.alias("total_tokens"),
        windows.cast("bigint").alias("n_windows"),
        F.expr(f"total_tokens DIV {seq_len}").alias("full_windows"),
        (t % seq_len).cast("int").alias("tail_tokens"),
        ((F.lit(seq_len) - t % seq_len) % seq_len)
        .cast("int")
        .alias("padding_tokens"),
        F.expr(
            f"(total_tokens * 1000000) DIV "
            f"(((total_tokens + {seq_len} - 1) DIV {seq_len}) * {seq_len})"
        ).alias("utilization_ppm"),
    )
