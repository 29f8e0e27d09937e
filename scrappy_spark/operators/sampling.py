"""Corpus-mixing operators: per-source quotas and stratified sampling.

The two knobs every production corpus build turns after cleaning:

- ``source_quota``: cap each source's (domain's) contribution at a
  fixed number of documents, picked by a deterministic priority — no
  single crawl vertical may dominate the mix.
- ``stratified_sample``: per-stratum deterministic rate sampling (here
  keyed on ``lang``) — down-sample over-represented strata, keep the
  rest, reproducibly (re-running on the same table yields the same
  sample: the decision is a hash of the row key, not an RNG state).

Both have exact DuckDB mirrors in ``__spark_entry__``.

100 TB shape:
- source_quota is exact top-K per key WITHOUT a single-reducer window
  per source: a naive ``row_number() OVER (PARTITION BY source)`` pulls
  every row of a mega-domain into one task (a billion-row host = one
  straggler/OOM). Instead: salt each row by its own priority hash,
  take the local top-K within each (source, salt) cell, then the
  global top-K over the ≤ SALTS×K survivors per source. Total order on
  (hash, doc_id) makes the two-level result identical to the naive
  window (any global top-K row is also top-K within its cell), while
  the per-task group size is bounded by max(cell, SALTS×K) regardless
  of domain skew. The oracle runs the naive window — same answer.
- stratified_sample is a pure map-side filter fused into the scan: no
  shuffle, no state, embarrassingly parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .text import hash60_col

QUOTA = 10  # driver-entry quota: sources hold 25 docs at test SFs
SALTS = 16  # skew fan-out for the local top-K stage

# per-lang keep rates in percent (deterministic hash-mod sampling):
# down-sample the dominant 'en' stratum, keep the rest intact
STRATA_PCT = {"en": 40, "de": 100, "fr": 100, "es": 100, "zh": 100}
DEFAULT_PCT = 100


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _priority(doc_id_col: str = "doc_id"):
    """Deterministic per-document priority (smaller wins). Production
    would order by a quality score; the hash keeps tests/oracles
    self-contained while exercising the identical plan."""
    return hash60_col(F.col(doc_id_col).cast("string"))


def source_quota(
    spark: SparkSession, sf_dir: str, quota: int = QUOTA
) -> DataFrame:
    return source_quota_from(_docs(spark, sf_dir), quota=quota)


def source_quota_from(docs: DataFrame, quota: int = QUOTA) -> DataFrame:
    """Keep the ``quota`` highest-priority documents per source.

    Output: ``doc_id``, ``source``, ``rk`` (1-based priority rank within
    the source). Exact — equals the single-window top-K (see module doc
    for why it is not executed that way).
    """
    d = docs.select("doc_id", "source").withColumn("h", _priority())
    local = (
        d.withColumn("salt", (F.col("h") % SALTS).cast("int"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source", "salt").orderBy("h", "doc_id")
            ),
        )
        .filter(F.col("rk") <= quota)
        .drop("rk", "salt")
    )
    return (
        local.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("source").orderBy("h", "doc_id")),
        )
        .filter(F.col("rk") <= quota)
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
    )


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample_from(_docs(spark, sf_dir))


def stratified_sample_from(
    docs: DataFrame, strata_pct: dict[str, int] | None = None
) -> DataFrame:
    """Deterministic per-stratum rate sampling on ``lang``.

    A document survives iff ``hash60(lang || ':' || doc_id) % 100`` is
    below its stratum's keep-percentage. Output: ``doc_id``, ``lang``.
    Map-only — the decision needs nothing but the row itself.
    """
    pct = strata_pct or STRATA_PCT
    h = hash60_col(
        F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string"))
    )
    rate = F.lit(DEFAULT_PCT)
    for lang, p in sorted(pct.items()):
        rate = F.when(F.col("lang") == lang, F.lit(p)).otherwise(rate)
    return docs.filter((h % 100) < rate).select("doc_id", "lang")


# temperature exponent 1/T as a rational; T=2 is the standard
# multilingual-mix flattening (sample ∝ share^(1/2))
TEMP_EXP_DEN = 2
TEMP_KEEP_DEN = 2  # resample to n div 2 documents overall


def temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temperature_sample_from(_docs(spark, sf_dir))


def temperature_sample_from(docs: DataFrame) -> DataFrame:
    """Temperature-flattened resampling — the multilingual training-mix
    knob (XLM-R-style): per-language keep quotas ∝ share^(1/2), so
    over-represented languages are down-weighted and the tail is
    up-weighted relative to proportional sampling, then an exact
    deterministic top-k per language by document hash.

    Exactness: the quota arithmetic runs identically in both engines —
    per-lang weight = round(sqrt(c/n), 6) snapped to DECIMAL(18,6),
    the weight TOTAL is an exact decimal sum (order-free), shares and
    quotas divide/round the identical doubles. Selection is then pure
    integer ranking on (hash60, doc_id). One residual cross-engine
    hazard, same class as the documented libm-ln caveat in
    textstats.unigram_logprob: Spark's round(double, 6) rounds the
    shortest decimal rendering HALF_UP while DuckDB rounds the binary
    product — a sqrt landing within ~1 ulp of a .xxxxxx5 boundary
    could snap differently. A margin-guard test pins that no weight at
    the test SFs sits near the boundary; real deployments with
    adversarial shares would round to 5 decimals and re-check.

    100 TB shape: the quota table is #langs rows computed from a keyed
    count (one partial-agg shuffle) and broadcast; selection uses the
    grouped exact-rank recipe (ranking.grouped_exact_rank_with_totals)
    — quotas here are proportional to language size, which makes the
    salted two-level kernel's local stage a no-op for dominant
    languages (cell size c/SALTS < quota), so that kernel is
    deliberately NOT used.

    Output: (doc_id, lang, rk, lang_quota).
    """
    counts = docs.groupBy("lang").agg(F.count("*").alias("c"))
    all_w = Window.partitionBy()  # #langs rows — single tiny partition
    w_dec = F.round(F.sqrt(F.col("c") / F.sum("c").over(all_w)), 6).cast(
        "decimal(18,6)"
    )
    quotas = (
        counts.withColumn("w", w_dec)
        .withColumn(
            "share",
            F.col("w").cast("double")
            / F.sum("w").over(all_w).cast("double"),
        )
        .withColumn(
            "lang_quota",
            F.round(
                (F.sum("c").over(all_w).cast("bigint") / TEMP_KEEP_DEN).cast(
                    "bigint"
                )
                * F.col("share"),
                0,
            ).cast("int"),
        )
        .select("lang", "lang_quota")
    )
    from .ranking import grouped_exact_rank_with_totals

    d = (
        docs.select("doc_id", "lang")
        .withColumn("h", _priority())
        .join(F.broadcast(quotas), "lang")
    )
    # quota ∝ language size, so the salted two-level top-K kernel offers
    # NO skew protection here (a per-salt cell holds c/SALTS rows — less
    # than the quota whenever the keep fraction exceeds 1/SALTS, making
    # the local stage a no-op for dominant languages). Selection instead
    # uses the grouped exact-rank recipe: a mega-language spans many
    # range partitions and no task ever sorts more than one partition
    # of it.
    ranked, _ = grouped_exact_rank_with_totals(d, ["lang"], ["h", "doc_id"])
    return (
        ranked.filter(F.col("rank") <= F.col("lang_quota"))
        .select(
            "doc_id",
            "lang",
            F.col("rank").cast("int").alias("rk"),
            "lang_quota",
        )
    )


SPLIT_VAL_MOD = 5  # hash60('split:' || source) % 5 == 0 → 'val'


def host_split(docs: DataFrame) -> DataFrame:
    """(…, source) → + split: host-disjoint train/val assignment by
    source hash — ALL documents of a host land on the same side, which is
    the split rule that prevents template/near-dup leakage by
    construction for within-host duplicates. Deterministic (hash60, the
    mirrored primitive), map-only."""
    h = hash60_col(F.concat(F.lit("split:"), F.col("source")))
    return docs.withColumn(
        "split", F.when(h % SPLIT_VAL_MOD == 0, "val").otherwise("train")
    )


def split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage audit for the host-disjoint split: join the minhash-LSH
    near-dup pair graph (dedup.minhash_lsh_pairs — the kernel of record)
    with the split assignment and roll up pair counts per (split_a,
    split_b), alongside each side's document count. The train↔val row IS
    the leakage number an eval-set owner signs off on: within-host dups
    can't cross (the split is host-disjoint), so every cross row is a
    genuine cross-host near-duplicate that k-gram or embedding
    decontamination must handle.

    Scale shape: the pair graph is edge-sized (≪ corpus, bucket-capped)
    but the split map is DOC-keyed (one row per document — NOT
    broadcastable at 100 TB; an earlier spelling broadcast it, the exact
    corpus-side-broadcast class the r5 replica audit removed elsewhere).
    Both tag joins are left unhinted: AQE broadcasts the edge-sized pair
    side when it fits and shuffles on the doc key otherwise. The two
    count joins broadcast 2-row tables. Output (split_a, split_b,
    n_pairs, n_docs_a, n_docs_b) with split_a <= split_b canonical
    order."""
    from .dedup import minhash_lsh_pairs

    docs = host_split(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "source"
        )
    ).select("doc_id", "split")
    pairs = minhash_lsh_pairs(spark, sf_dir)
    sa = docs.select(F.col("doc_id").alias("a"), F.col("split").alias("sa"))
    sb = docs.select(F.col("doc_id").alias("b"), F.col("split").alias("sb"))
    tagged = (
        pairs.join(sa, "a")
        .join(sb, "b")
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    counts = docs.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
    ca = counts.select(
        F.col("split").alias("split_a"), F.col("n_docs").alias("n_docs_a")
    )
    cb = counts.select(
        F.col("split").alias("split_b"), F.col("n_docs").alias("n_docs_b")
    )
    return tagged.join(F.broadcast(ca), "split_a").join(
        F.broadcast(cb), "split_b"
    ).select("split_a", "split_b", "n_pairs", "n_docs_a", "n_docs_b")
