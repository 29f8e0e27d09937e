"""Corpus-curation planning kernels: weighted sampling, mixture
manifests, host keywords, and quality-retention curves.

These are the *planning* operators a training-data owner runs before
committing to a filter/mixture configuration — the step between the
per-document scores (``textstats``) and the materializing pipeline
(``pipeline``).  Reference scope: scrappy has no corpus-curation tier
(its pipeline ends at extraction, ``lib/scrappy/agent.rb``); these are
part of the beyond-reference LLM-pipeline mandate, shaped like the
published curation stacks (CCNet, RefinedWeb, Dolma mixing tables).

Every kernel is exact integer / fixed-point arithmetic on both engines
(the one ``ln`` reuses the round-6 → DECIMAL(18,6) discipline from
``textstats.unigram_logprob``), so each carries a full DuckDB value
oracle.

100 TB shapes (per kernel, details on each function):

* ``pps_sample`` — ONE partial-agg scalar (total weight) broadcast back,
  then a map-only inclusion test: zero corpus-sized shuffles.  This is
  the sampler you can afford to run on every curation iteration.
* ``mixture_manifest`` — one partial-agg shuffle to ≤ #langs rows, then
  driver-free integer arithmetic on the tiny aggregate.
* ``tfidf_host_keywords`` — two partial-agg shuffles (corpus → (host,
  term) tf, tf → term hdf), a broadcast model join, and a keyed window
  over vocab-sized rows.  Skew lives in the partial agg, exactly the
  ``anchor_topk`` argument.
* ``retention_curve`` — map-side banding into |grid|+1 buckets, one
  |grid|-key partial agg, broadcast triangular cumsum — the
  ``discovery_curve`` recipe; no Exchange SinglePartition anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import hash60_col, qw_weight_col, tokens_col

# --- pps_sample -----------------------------------------------------------

# expected sample size for the driver query (the operator takes any n)
PPS_N_TARGET = 64

# 2^60: the hash60 value space. Inclusion p = n·w/W compares against the
# hash as a fraction of this span.
_HASH_SPAN = 1 << 60


def pps_weight(doc_id: Column) -> Column:
    """The sampling hash: ``hash60('pps:' || doc_id)`` — independent of
    every other hash-derived decision in the engine (shards, splits,
    quality weights) by construction of the salt prefix."""
    return hash60_col(F.concat(F.lit("pps:"), doc_id.cast("string")))


def pps_admit_col(
    doc_id: Column, n_tokens: Column, w_total: Column, n_target: int
) -> Column:
    """The exact PPS inclusion predicate, shared verbatim by the batch
    sampler and the streaming admission twin (streaming/state_stream.
    admission_stream): ``hash60('pps:'||doc_id) · W < n_target · w ·
    2^60`` in DECIMAL(38,0) — the single definition so batch and stream
    admit bit-identical sets for the same calibrated total."""
    lhs = pps_weight(doc_id).cast("decimal(20,0)") * w_total.cast(
        "decimal(18,0)"
    )
    rhs = (n_tokens * F.lit(n_target)).cast("decimal(20,0)") * F.lit(
        _HASH_SPAN
    ).cast("decimal(19,0)")
    return lhs < rhs


def pps_sample(docs: DataFrame, n_target: int = PPS_N_TARGET) -> DataFrame:
    """Probability-proportional-to-size Poisson sampling: include each
    document with probability ``min(1, n_target · w / W)`` where ``w``
    is its token count and ``W`` the corpus total — the Horvitz-
    Thompson-weighted sample every mixture/quality sweep is estimated
    on before running the full pipeline.

    The inclusion test is EXACT integer arithmetic — no floats, no RNG
    state: include iff ``hash60('pps:'||doc_id) · W < n_target · w ·
    2^60``, evaluated in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB).
    Documents with ``n_target·w ≥ W`` are always included (the
    inequality is then unconditionally true — the min(1, ·) clamp falls
    out of the algebra, no branch needed).

    100 TB shape: stage 1 is a partial-agg scalar (sum of token counts
    — map-side combine collapses each partition to one row before the
    1-row exchange); the scalar rides back as a broadcast and the
    inclusion test is MAP-ONLY over the corpus — the whole sampler adds
    zero corpus-sized shuffles, so it composes freely into any scan.
    Expected sample size is n_target minus the always-in overflow mass;
    the variance is Poisson (no fixed-size reservoir: a fixed-k exact
    variant would need a global top-k by key, TakeOrderedAndProject —
    deliberately not this kernel, which exists to be free).
    """
    d = docs.select(
        "doc_id", F.size(tokens_col(F.col("text"))).cast("long").alias("n_tokens")
    )
    total = d.agg(F.sum("n_tokens").alias("_w_total"))
    return (
        d.crossJoin(F.broadcast(total))
        .where(
            pps_admit_col(
                F.col("doc_id"), F.col("n_tokens"), F.col("_w_total"), n_target
            )
        )
        .select("doc_id", "n_tokens")
    )


def pps_sample_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pps_sample(spark.read.parquet(f"{sf_dir}/documents.parquet"))


# --- mixture_manifest -----------------------------------------------------

# Target mixture (ppm of the token budget per language) and the repeat
# cap — literal config, exactly how published mixing tables ship
# (Dolma/Pile-style weights are a reviewed artifact, not derived state).
MIX_WEIGHTS_PPM: dict[str, int] = {
    "en": 400_000,
    "zh": 200_000,
    "de": 150_000,
    "fr": 150_000,
    "es": 100_000,
}
MIX_TOKEN_BUDGET = 100_000
# max repeats per source before the manifest reports a deficit instead
# of oversampling (4 epochs — the usual small-source repeat ceiling)
MIX_EPOCH_CAP_PPM = 4_000_000


def mixture_manifest(
    docs: DataFrame,
    budget: int = MIX_TOKEN_BUDGET,
    weights_ppm: dict[str, int] | None = None,
    cap_ppm: int = MIX_EPOCH_CAP_PPM,
) -> DataFrame:
    """Per-language data-mixing manifest: given available tokens per
    language, a token budget, target mixture weights (ppm), and a
    repeat cap, compute what the sampler will actually draw —
    ``(lang, avail_tokens, target_tokens, epochs_ppm, planned_tokens,
    deficit_tokens)``.  ``epochs_ppm`` is the repeat factor in ppm
    (1 000 000 = one epoch), capped at ``cap_ppm``; ``deficit`` is the
    target mass the cap leaves unfilled — the number a mixture review
    redistributes by hand.

    ALL integer arithmetic (ceil via ``(a + b - 1) DIV b``, never a
    float ratio), so the manifest is bit-identical across engines.
    Languages absent from the weights map get weight 0 (target 0,
    epochs 0) and still appear; languages IN the weights map with zero
    available tokens ALSO appear (avail 0, epochs 0, deficit = full
    target) — silence is not a row that vanished, in either direction.
    The second direction is the one a mixture review exists to catch
    (a weighted language the crawl never collected), so the weights
    join is a FULL OUTER, not a lookup from the availability side
    (review r5 — the lookup-map spelling silently dropped it).

    100 TB shape: ONE partial-agg shuffle keyed by lang (map-side
    combine → ≤ #langs rows cross the wire), then a full join between
    two ≤ #langs-row tables and pure expression arithmetic.  No scalar
    exchange even — the budget/cap are literals in the plan.
    """
    w = MIX_WEIGHTS_PPM if weights_ppm is None else weights_ppm
    wdf = docs.sparkSession.createDataFrame(
        sorted(w.items()), "lang STRING, _w BIGINT"
    )
    avail = (
        docs.select("lang", F.size(tokens_col(F.col("text"))).alias("n_tok"))
        .groupBy("lang")
        .agg(F.sum("n_tok").cast("long").alias("avail_tokens"))
    )
    m = (
        avail.join(wdf, "lang", "full")
        .select(
            "lang",
            F.coalesce("avail_tokens", F.lit(0).cast("long")).alias(
                "avail_tokens"
            ),
            F.coalesce("_w", F.lit(0).cast("long")).alias("_w"),
        )
        .withColumn(
            "target_tokens", F.expr(f"(_w * CAST({budget} AS BIGINT)) DIV 1000000")
        )
        .withColumn(
            "epochs_ppm",
            # avail = 0 → nothing to repeat: epochs 0 (the CASE guards
            # the ANSI integer DIV-by-zero; planned is then 0 and the
            # whole target surfaces as deficit)
            F.when(F.col("avail_tokens") == 0, F.lit(0).cast("long")).otherwise(
                F.least(
                    F.expr(
                        "(target_tokens * CAST(1000000 AS BIGINT)"
                        " + avail_tokens - 1) DIV avail_tokens"
                    ),
                    F.lit(cap_ppm).cast("long"),
                )
            ),
        )
        .withColumn(
            "planned_tokens",
            F.least(
                F.col("target_tokens"),
                F.expr(f"(avail_tokens * CAST({cap_ppm} AS BIGINT)) DIV 1000000"),
            ),
        )
        .withColumn(
            "deficit_tokens", F.col("target_tokens") - F.col("planned_tokens")
        )
        .drop("_w")
    )
    return m.select(
        "lang",
        "avail_tokens",
        "target_tokens",
        "epochs_ppm",
        "planned_tokens",
        "deficit_tokens",
    )


def mixture_manifest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mixture_manifest(spark.read.parquet(f"{sf_dir}/documents.parquet"))


# --- tfidf_host_keywords --------------------------------------------------

TFIDF_TOPK = 5


def tfidf_host_keywords(docs: DataFrame, k: int = TFIDF_TOPK) -> DataFrame:
    """Top-k TF-IDF keyword terms per host (source): ``tf`` counted
    within the host, ``idf = ln(n_hosts / hdf)`` with host-level
    document frequency — the per-domain "what is this site about"
    table a curation review reads next to ``host_scorecard``.

    Exactness: idf is rounded to 6 decimals and cast DECIMAL(18,6)
    BEFORE the tf·idf product (the ``unigram_logprob`` libm discipline;
    the idf value set is tiny — one value per distinct hdf ≤ n_hosts —
    and its grid margin is asserted in tests), so the score is exact
    fixed-point and the (score DESC, term ASC) rank is total-order
    deterministic on both engines.  Terms present on every host score
    exactly 0 and still rank — stopword-ish terms losing to anything
    rarer is the intended behavior, not an epsilon accident.

    100 TB shape: two partial-agg shuffles — corpus tokens → (host,
    term) tf (map-side combine absorbs per-host token skew, the
    ``anchor_topk`` argument), then the collapsed tf table → per-term
    host-df (vocab-sized input, never the raw stream).  The idf model
    (one row per term, two BIGINTs) broadcasts like the unigram model
    in ``textstats.unigram_logprob`` — a vocabulary that outgrows
    broadcast is pruned into one, not shuffle-joined.  The final rank
    is a keyed window over vocab-per-host-sized rows; k rows per host
    survive.
    """
    tok = docs.select(
        F.col("source"), F.explode(tokens_col(F.col("text"))).alias("t")
    )
    # the (host, term) rollup is read by BOTH hdf and the scored join —
    # materialize it ONCE (the dedup layer's persist-before-fan-out
    # lesson, VERDICT r3 #1) so the corpus-sized explode+agg compiles
    # into exactly one executed scan; the rollup itself is vocab-sized
    tf = (
        tok.groupBy("source", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .localCheckpoint()
    )
    # countDistinct ignores NULL sources — the DuckDB mirror's
    # count(DISTINCT source) does too; a bare distinct().count() would
    # count the NULL group and skew every idf by one (review r5).
    # Deliberately from docs, not tf: a host whose documents are all
    # NULL-text has no tf rows but is still a host for idf purposes —
    # and the scan is a single-column pruned pass, map-side combined.
    n_hosts = docs.agg(F.countDistinct("source").alias("_nh"))
    hdf = tf.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("hdf"))
    idf = hdf.crossJoin(F.broadcast(n_hosts)).select(
        "t",
        F.round(F.log(F.col("_nh") / F.col("hdf")), 6)
        .cast("decimal(18,6)")
        .alias("idf"),
    )
    scored = tf.join(F.broadcast(idf), "t").select(
        "source",
        F.col("t").alias("term"),
        "tf",
        (F.col("tf") * F.col("idf")).alias("_score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.desc("_score"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "source",
            "term",
            "tf",
            F.col("_score").cast("double").alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def tfidf_host_keywords_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_host_keywords(spark.read.parquet(f"{sf_dir}/documents.parquet"))


# --- retention_curve ------------------------------------------------------

# Threshold grid over the hashed-linear quality score (milli-units,
# textstats.quality_linear's w_sum). Literal config like the mixture
# weights: a sweep is a reviewed artifact.
RETENTION_THRESHOLDS_MILLI: list[int] = [
    -4000,
    -2000,
    -1000,
    -500,
    0,
    500,
    1000,
    2000,
    4000,
]


def retention_curve(
    docs: DataFrame, thresholds: list[int] | None = None
) -> DataFrame:
    """Quality-filter retention curve: for each candidate threshold t
    in the grid, the documents and tokens that survive ``w_sum > t``
    (``w_sum`` = the exact hashed-linear quality score of
    ``textstats.quality_linear``) plus the surviving share in integer
    ppm — the table that turns "pick a quality threshold" from a guess
    into a read-off.

    100 TB shape: the per-document score is the same zero-shuffle
    codegen'd array aggregate as ``quality_linear``; each document is
    then banded MAP-SIDE into its grid interval (``size(filter(grid,
    x -> x < w_sum))`` — |grid| comparisons per row, no join), one
    partial-agg shuffle collapses the corpus to |grid|+1 band rows, and
    the per-threshold cumulative is a broadcast triangular join over
    those rows (the ``discovery_curve`` recipe) — never a global-order
    window, no Exchange SinglePartition.  Thresholds nothing survives
    still emit a row (docs_kept = 0): a curve with silent gaps misreads
    as a sweep that skipped them.

    The population is TOKENIZED documents (≥ 1 token): a NULL-text row
    carries no tokens on either engine (the oracle's unnest emits zero
    rows for it), so it belongs in neither the kept counts nor the
    ``docs_ppm`` denominator — without the filter the Spark total
    counted it while the oracle's didn't (review r5).
    """
    grid = sorted(
        RETENTION_THRESHOLDS_MILLI if thresholds is None else thresholds
    )
    toks = tokens_col(F.col("text"))

    # the weight is text.qw_weight_col — the SAME definition
    # quality_linear gates on, so the curve is swept against the exact
    # score the filter will apply (two drifting copies would
    # mis-calibrate silently)
    scored = docs.select(
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + qw_weight_col(t)
        ).alias("w_sum"),
    ).where(F.col("n_tokens") > 0)
    # Band = how many grid thresholds the score clears. Deliberately a
    # SUM OF DIRECT COMPARISONS, not size(filter(grid_lit, x -> x <
    # w_sum)): CollapseProject inlines the expensive w_sum aggregate
    # into its use site either way, but a copy inlined INSIDE a
    # higher-order-function lambda is re-evaluated once per grid
    # element and subexpression elimination cannot reach across lambda
    # iterations — the whole per-token md5 aggregate ran |grid|=9x per
    # row (measured 2.75 s vs the 0.45 s single-eval floor at sf0.1;
    # 0.61 N->2N on 200k replica docs). The flat comparison copies ARE
    # subexpression-eliminated to one evaluation (0.57 s same input).
    band = sum(
        ((F.col("w_sum") > F.lit(t)).cast("int") for t in grid),
        F.lit(0),
    )
    banded = scored.select("n_tokens", "w_sum", band.alias("band"))
    bands = banded.groupBy("band").agg(
        F.count(F.lit(1)).cast("long").alias("docs"),
        F.sum("n_tokens").cast("long").alias("toks"),
    )
    total = scored.agg(F.count(F.lit(1)).cast("long").alias("_total_docs"))
    spark = docs.sparkSession
    thr = spark.createDataFrame(
        [(i, t) for i, t in enumerate(grid)], "i INT, thr_milli INT"
    )
    # doc in band b survives threshold index i iff i < b
    kept = (
        thr.join(F.broadcast(bands), F.col("i") < F.col("band"), "left")
        .groupBy("i", "thr_milli")
        .agg(
            F.coalesce(F.sum("docs"), F.lit(0)).cast("long").alias("docs_kept"),
            F.coalesce(F.sum("toks"), F.lit(0)).cast("long").alias("tokens_kept"),
        )
    )
    return (
        kept.crossJoin(F.broadcast(total))
        .select(
            "thr_milli",
            "docs_kept",
            "tokens_kept",
            F.expr("(1000000 * docs_kept) DIV _total_docs").alias("docs_ppm"),
        )
    )


def retention_curve_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return retention_curve(spark.read.parquet(f"{sf_dir}/documents.parquet"))
