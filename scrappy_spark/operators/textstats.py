"""Text-analysis operators: token counting, quality scoring, document
fingerprinting, language ID. All except ngram_langid are expressed with
native functions only (whole-stage codegen) and have exact DuckDB oracles.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import hash60_col, norm_fp_col, qw_weight_col, tokens_col

STOPWORDS = ("the", "a", "and", "of", "to", "in")
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "la"),
    "es": ("el", "los", "y"),
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )


# BPE-style pre-tokenization classes (the GPT-2 pre-tokenizer's shape:
# letter runs, digit runs, single punctuation marks) — portable between
# Spark's Java regex and DuckDB's RE2. The whitespace class is EXPLICIT
# ASCII, not \s (the text.DUCK_TOKENS discipline): Java's \s is
# [ \t\n\x0B\f\r] while RE2's lacks \x0B, so a literal \s would
# tokenize vertical-tab bytes differently per engine.
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-style token count: whitespace counts nothing, punctuation
    tokenizes separately, letter and digit runs are single tokens — the
    standard BPE PRE-tokenization granularity (the merge table itself is
    model data, not an engine operator). Pure native expression."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)).alias(
            "n_bpe_tokens"
        ),
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / punctuation / stopword heuristics (the standard crawl
    quality gates, computed as pure expressions)."""
    d = _docs(spark, sf_dir).withColumn("toks", tokens_col(F.col("text")))
    n_tok = F.size("toks")
    n_char = F.length("text")
    alpha = F.length(F.regexp_replace("text", r"[^A-Za-z]", ""))
    stop = F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS)))
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(alpha / n_char, 6).alias("alpha_ratio"),
        F.round(stop / n_tok, 6).alias("stopword_ratio"),
        F.round(n_char / n_tok, 6).alias("mean_token_len"),
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        norm_fp_col(F.col("text")).alias("fp"),
    )


ROLLING_K = 16  # rolling-window width (chars)


def fingerprint_rolling(
    spark: SparkSession, sf_dir: str, k: int = ROLLING_K
) -> DataFrame:
    """Rolling-window document fingerprint (the winnowing/Rabin shape):
    hash every k-char window of the normalized text and keep the MINIMUM
    window hash — robust to insertions outside the minimizing window,
    unlike the whole-document digest (``fingerprint``). All native
    expressions: sequence → substring windows → md5-derived hash →
    array_min; the DuckDB oracle mirrors it exactly."""
    d = _docs(spark, sf_dir).withColumn(
        "t", F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    )
    windows = F.expr(
        f"transform(sequence(1, greatest(length(t) - {k - 1}, 1)), "
        f"i -> substring(t, i, {k}))"
    )
    min_h = F.array_min(
        F.transform(windows, lambda w: hash60_col(w))
    )
    return d.select("doc_id", min_h.alias("rolling_fp"))


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style corpus profile: the single-pass summary a pipeline
    run consults before choosing shard counts, quotas, and budgets.
    One row: document count, token totals/extremes, distinct languages
    and sources, and the exact-duplicate rate (distinct whole-document
    fingerprints vs rows). All native aggregates — one scan, one
    partial-agg reduction, no shuffle wider than the final single-row
    combine."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        "source",
        F.size(tokens_col(F.col("text"))).alias("n_tok"),
        norm_fp_col(F.col("text")).alias("fp"),
    )
    return d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.min("n_tok").cast("int").alias("min_tokens"),
        F.max("n_tok").cast("int").alias("max_tokens"),
        F.round(F.avg("n_tok"), 6).alias("avg_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("fp").cast("long").alias("n_distinct_texts"),
    )


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-shaped language-model quality score: per document, the
    total and mean unigram surprisal −ln(count(t)/N) of its tokens
    under the corpus' own unigram distribution (a high mean marks
    rare-token-heavy, OOV-ish documents — the same signal CCNet's
    KenLM perplexity buckets use; the unigram model IS the engine
    operator, the n-gram LM is model data).

    Exactness: per-token surprisal is rounded to 6 decimals and cast to
    DECIMAL(18,6) BEFORE the per-document sum, so the aggregate is
    exact fixed-point arithmetic — order-independent, hence identical
    in Spark and DuckDB regardless of how either engine schedules the
    sum. The final columns convert the exact decimal back to double.

    100 TB shape: one explode+groupBy builds the vocab frequency table
    (partial-agg shuffle keyed by token); the scalar N rides in as a
    broadcast; the per-doc scoring joins the token stream to the
    surprisal table with an EXPLICIT broadcast of the model side —
    the model is a bounded artifact shipped to every worker, exactly
    how CCNet distributes its KenLM binaries (a vocabulary that
    outgrows broadcast is pruned into one, not shuffle-joined). Two
    alternatives were measured and rejected in the r5 replica-scaling
    audit: (a) unhinted, the planner broadcast-built the CORPUS-sided
    token stream off a bad post-explode size estimate — BuildLeft on
    an 8.5M-row relation at 100k replica docs, a driver OOM at scale;
    (b) SHUFFLE_HASH shuffles the corpus-sized stream on the
    low-cardinality token key, whose hot keys straggle (measured
    0.63 N→2N vs 0.85 broadcast). Broadcast also leaves the scoring
    map-side, so no extra Exchange before the final groupBy(doc_id).

    Exactness caveat (measured, monitored): the per-token −ln(c/N) is
    computed by each engine's own libm, which is ~1-ulp accurate, not
    correctly rounded; a surprisal within ~1e-15 of a 0.0000005 grid
    boundary could round differently per engine. The driver corpora sit
    ≥3e-8 from every boundary (asserted in
    test_unigram_surprisal_rounding_margin), so the oracle is exact in
    practice; the fixed-point sum removes every OTHER float hazard."""
    d = _docs(spark, sf_dir).withColumn("toks", tokens_col(F.col("text")))
    tok = d.select("doc_id", F.explode("toks").alias("t"))
    freq = tok.groupBy("t").agg(F.count("*").alias("c"))
    total = freq.agg(F.sum("c").alias("n"))
    lp = (
        freq.crossJoin(F.broadcast(total))
        .select(
            "t",
            F.round(-F.log(F.col("c") / F.col("n")), 6)
            .cast("decimal(18,6)")
            .alias("surprisal"),
        )
    )
    agg = (
        tok.join(F.broadcast(lp), "t")
        .groupBy("doc_id")
        .agg(
            F.sum("surprisal").alias("s"),
            F.count("*").alias("n_tokens"),
        )
    )
    s_dbl = F.col("s").cast("double")
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        s_dbl.alias("surprisal_sum"),
        F.round(s_dbl / F.col("n_tokens"), 6).alias("mean_surprisal"),
    )


def host_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host (source) curation scorecard — the domain-level profile
    web-corpus curation acts on BEFORE touching documents (C4's and
    RefinedWeb's first filter pass is a host block/allow decision; a
    100 TB corpus has ~10^7 hosts vs ~10^10 pages, so the scorecard is
    the cheap table humans and classifiers actually review):
    per source — document count, token totals/mean, exact-duplicate
    rate (ppm, integer floor division: the recrawl-tier no-float-ratio
    discipline), distinct languages, and the majority language.

    Plan: one scan; the main rollup is a partial-agg shuffle keyed by
    source (count_distinct fingerprint/lang ride the same Exchange);
    the majority language is a second partial agg to (source, lang)
    counts + a per-source window over ≤ #langs rows (skew absorbed by
    the partial agg, the anchor_topk argument); the two host-count-
    sized results equi-join — AQE broadcasts. Nothing corpus-sized
    crosses a second Exchange."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        "lang",
        "source",
        F.size(tokens_col(F.col("text"))).alias("n_tok"),
        norm_fp_col(F.col("text")).alias("fp"),
    )
    main = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.round(F.avg("n_tok"), 6).alias("avg_tokens"),
        F.countDistinct("fp").cast("long").alias("n_distinct_texts"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
    )
    per_lang = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("_n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("_n").desc(), F.col("lang").asc()
    )
    top = (
        per_lang.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    return main.join(top, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "avg_tokens",
        F.expr(
            "(1000000 * (n_docs - n_distinct_texts)) DIV n_docs"
        ).alias("dup_rate_ppm"),
        "n_langs",
        "top_lang",
    )


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score — the next CCNet rung after
    ``unigram_logprob``: per document, total and mean conditional
    surprisal −ln(c(w1,w2)/c(w1·)) of its bigrams under the corpus' own
    bigram MLE (c(w1·) counts w1 as a CONTEXT — bigram rows grouped by
    w1 — so probabilities per context sum to exactly 1 and every
    observed bigram has p > 0; no smoothing, which would put a float
    constant inside ln). High mean = locally incoherent token
    sequences, the signal a unigram model is blind to (it scores a
    shuffled document identically to the original).

    Exactness: identical discipline to ``unigram_logprob`` — per-bigram
    surprisal rounded to 6 decimals and cast DECIMAL(18,6) BEFORE the
    per-document sum (exact fixed-point, order-independent), the same
    libm-vs-grid-boundary caveat monitored by the rounding-margin test.

    100 TB shape — NO corpus-sized shuffle anywhere. Bigram formation
    is MAP-SIDE: adjacent tokens are already collocated inside each
    document's token array, so pairs come from a transform over the
    array + one explode — never the lag-window-over-posexplode spelling
    (measured in the r5 replica audit: the window shuffles and sorts
    the whole token stream — ~6 GB at 200k replica docs — for
    adjacency the array already has; removing it took the kernel from
    0.68 to clean scaling and 1.6× the absolute throughput).
    Bigram/context counts are vocab-sized partial-agg shuffles; the
    scoring join EXPLICITLY BROADCASTS the model table (a bounded
    artifact shipped to workers — the CCNet KenLM distribution shape;
    prune the model if it outgrows broadcast — an unhinted join here
    broadcast-built the corpus-sided STREAM off a bad post-explode
    estimate, and SHUFFLE_HASH shuffles the stream on the hot
    low-cardinality token key: both measured, both rejected); scoring
    therefore stays map-side and the final groupBy(doc_id) partial agg
    collapses each document's bigrams inside its input partition, so
    the only per-doc Exchange carries ~one row per document. Documents
    with < 2 tokens have no bigram and drop out (mean undefined),
    identically in both engines."""
    d = _docs(spark, sf_dir).withColumn("toks", tokens_col(F.col("text")))
    # the <2-token guard must precede the transform: sequence(1, 0)
    # would DESCEND in Spark, not be empty
    pairs = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
    )
    big = (
        d.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
    )
    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    # model-internal join: c1 (contexts) is the provably smaller side —
    # pin it as the build side so no estimate can ever flip the build
    # to the vocab-pair table
    lp = c2.join(c1.hint("shuffle_hash"), "w1").select(
        "w1",
        "w2",
        F.round(-F.log(F.col("c2") / F.col("c1")), 6)
        .cast("decimal(18,6)")
        .alias("surprisal"),
    )
    agg = (
        big.join(F.broadcast(lp), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.sum("surprisal").alias("s"), F.count("*").alias("n_bigrams"))
    )
    s_dbl = F.col("s").cast("double")
    return agg.select(
        "doc_id",
        F.col("n_bigrams").cast("int").alias("n_bigrams"),
        s_dbl.alias("bigram_surprisal_sum"),
        F.round(s_dbl / F.col("n_bigrams"), 6).alias("mean_bigram_surprisal"),
    )


VOCAB_K = 16  # top-K vocabulary size for the OOV measure


def vocab_oov(spark: SparkSession, sf_dir: str, k: int = VOCAB_K) -> DataFrame:
    """Vocabulary truncation + per-document OOV rate — the tokenizer-prep
    measure: fix the vocabulary to the corpus' top-``k`` tokens by count
    (tiebreak token asc — a total order, the heavy_hitters discipline)
    and report each document's out-of-vocabulary token fraction in
    integer ppm. High OOV = the document's token distribution diverges
    from the corpus head — the cheap proxy for 'this doc will shred
    into subwords' that vocabulary-size sweeps gate on.

    Plan: one explode + partial-agg shuffle builds the frequency table;
    the top-k is TakeOrderedAndProject (every partition keeps k, the
    driver merges P·k — never a global sort); the k-row vocabulary
    BROADCASTS onto the token stream (it is a bounded model table, the
    bm25 query-set shape) and one groupBy(doc_id) finishes. ppm is
    integer floor division — no float ratio."""
    d = _docs(spark, sf_dir).withColumn("toks", tokens_col(F.col("text")))
    tok = d.select("doc_id", F.explode("toks").alias("t"))
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("t"))
        .limit(k)
        .select("t", F.lit(1).alias("_in"))
    )
    agg = (
        tok.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        F.expr("(1000000 * n_oov) DIV n_tokens").alias("oov_ppm"),
    )


def quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality scorer — the fastText / Vowpal-Wabbit
    hashing-trick regime used by CCNet-style quality filters: every
    token's weight is a pure function of its hash, so there is NO
    weight table to join or broadcast and the whole corpus is scored in
    one map-only pass (zero shuffles; at 100 TB this is scan-bound).
    The weight function here is the md5-derived repo hash mapped to
    integer milli-units in [−500, 500] — a stand-in for trained weights
    with the same execution shape (a trained model swaps the hash
    expression for a broadcast lookup of hashed buckets; the plan gains
    one broadcast and stays map-only).

    Per doc: n_tokens, the exact integer weight sum (w_sum, BIGINT
    milli-units — the mean is w_sum/(1000·n) when a float is wanted;
    the operator deliberately does NOT emit it: 41/640-style ratios
    land exactly on round-half boundaries where Spark's HALF_UP and
    DuckDB's half-even disagree, and the gate never needs it), and the
    keep gate (w_sum > 0 — sign of the sum, exact, no float compare).
    The token loop is a codegen'd ``aggregate`` over the token array —
    no explode, so the row count never expands."""
    toks = tokens_col(F.col("text"))

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + qw_weight_col(t)
        ).alias("w_sum"),
    )
    return d.select(
        "doc_id",
        "n_tokens",
        "w_sum",
        (F.col("w_sum") > 0).alias("keep"),
    )


def marker_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID — deterministic argmax with fixed
    priority (en > de > fr > es), 'und' when no marker hits."""
    d = _docs(spark, sf_dir).withColumn("toks", tokens_col(F.col("text")))
    def marker_count(markers):
        # one-arg lambda: F.filter introspects the signature, so extra
        # (default) params would be bound to lambda variables
        return F.size(F.filter("toks", lambda t: t.isin(*markers)))

    scores = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    pred = F.lit("und")
    # build argmax via reverse-priority folds: later (higher-priority)
    # languages override on strict >
    best = F.lit(0)
    for lang in ("es", "fr", "de", "en"):
        s = scores[lang]
        pred = F.when(s >= best, F.when(s > 0, F.lit(lang)).otherwise(pred)).otherwise(pred)
        best = F.when(s >= best, s).otherwise(best)
    return d.select("doc_id", pred.alias("pred_lang"))


NGRAM_BUCKETS = 4096
NGRAM_PROFILES = {
    "en": "the and ing ion tio ent for ati ter ers",
    "de": "der und sch die ein ich den gen ung cht",
    "fr": "les de la tion ent des que une eur ait",
    "es": "de la que el los ion cion ado par ent",
}
# deterministic priority on score ties (same scheme as marker_langid)
NGRAM_PRIORITY = ("en", "de", "fr", "es")


def ngram_bucket(tri: str) -> int:
    """md5-derived trigram bucket — the SAME construction as
    text.hash60 (conv(substr(md5,1,15),16,10)), so the DuckDB oracle
    reproduces every bucket exactly (never Python hash(): it is
    process-salted)."""
    from .text import hash60_py

    return hash60_py(tri) % NGRAM_BUCKETS


def ngram_profile_weights() -> dict[str, dict[int, float]]:
    """lang → {bucket: weight}: L2-normalized trigram counts of the
    built-in profile words. Shared by the Spark UDF and (as embedded
    literals) the DuckDB oracle."""
    import math

    out: dict[str, dict[int, float]] = {}
    for lang, words in NGRAM_PROFILES.items():
        counts: dict[int, float] = {}
        for w in words.split():
            for i in range(len(w) - 2):
                b = ngram_bucket(w[i : i + 3])
                counts[b] = counts.get(b, 0.0) + 1.0
        norm = math.sqrt(sum(c * c for c in counts.values())) or 1.0
        out[lang] = {b: c / norm for b, c in sorted(counts.items())}
    return out


def ngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram-profile language ID: per-lang score = Σ over
    buckets of doc-trigram-count × normalized profile weight, argmax with
    the marker_langid priority on ties, 'und' when no profile bucket is
    hit. (Scores are unnormalized dot products — dividing every lang's
    score by the same positive doc norm cannot change the argmax, so the
    doc-side normalization the cosine formulation carries is dropped;
    that makes the whole operator exactly reproducible in SQL.) Rounded
    to 6 decimals before the argmax on BOTH sides so float summation
    order can't flip razor-thin ties. One vectorized pandas UDF, no
    shuffle."""
    prof = ngram_profile_weights()

    @F.pandas_udf("string")
    def classify(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            t = (t or "").lower()
            counts: dict[int, int] = {}
            for i in range(len(t) - 2):
                b = ngram_bucket(t[i : i + 3])
                counts[b] = counts.get(b, 0) + 1
            pred = "und"
            best = 0.0
            for lang in reversed(NGRAM_PRIORITY):
                s = round(
                    sum(counts.get(b, 0) * w for b, w in prof[lang].items()), 6
                )
                if s >= best and s > 0:
                    pred, best = lang, s
                elif s >= best:
                    best = s
            out.append(pred)
        return pd.Series(out)

    return _docs(spark, sf_dir).select(
        "doc_id", classify(F.col("text")).alias("pred_lang")
    )
