"""DUST rule mining — "Different URLs with Similar Text" (Bar-Yossef,
Keidar, Schonfeld, WWW 2007 — public paper): mine URL rewrite rules from
pairs of URLs observed to serve identical content, so the crawler can
canonicalize ALL future URLs matching a rule without fetching them.
Classic examples recovered by this kernel: session-id parameters
(``"" -> "?session=s4"``), print views (``"" -> "/print"``), and CMS
path/query aliases (``"art/" -> "index.php?id="``).

The reference has no URL-alias learning (its dedup is the response cache
keyed by exact URI, `agent.rb` fetch loop — our S-10); this layer is
crawl-frontier-hygiene territory, the same class as the trap detector
(`frontier/traps.py`), one level up from redirect collapse
(`frontier/redirects.py`): redirects are server-DECLARED aliases, DUST
rules are server-UNDECLARED aliases discovered from content equality.

Both halves of the paper live here: `dust_rules` MINES the rules from
content-equal pairs; `canonicalize` APPLIES the mined table back onto a
URL stream so the seen-set unifies without fetching (ninth wave).

Algorithm (the exact-substring variant of the paper's rule extraction):
for each content-equal pair (uri_a, uri_b), alignment is
``lcp`` = longest common prefix, ``lcs`` = longest common suffix of the
remainders (capped so prefix and suffix never overlap); the rule is the
differing middle ``(alpha, beta)``. Rules are aggregated with support
counts; rules below ``min_support`` are noise (pair-specific middles
that swallowed a document id) and dropped — the paper's "large support"
principle.

Exactness: alignment is pure integer/string arithmetic on both engines
(no float anywhere); the DuckDB oracle mirrors lcp/lcs with a
range-lateral max-k-equal-prefix scan, which agrees with the Spark
zip_with first-mismatch scan because prefix equality is monotone in k.

100 TB shape: pair formation is ONE hash shuffle on the content
fingerprint with the standard bucket cap (a viral page mirrored to 10^5
URLs is a skew key whose pair output is quadratic — capped groups are
dropped and counted, the SIMHASH_MAX_BUCKET discipline from
`operators/dedup.py`); alignment and middle extraction are map-only
native expressions (zip_with/array_position — JVM codegen, no Python);
rule aggregation is one partial-agg shuffle keyed by (alpha, beta).
Nothing is quadratic in anything but the capped per-fingerprint bucket
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Mirrored literally into the DuckDB oracle.
DUST_MAX_BUCKET = 16
DUST_MIN_SUPPORT = 2


def duplicate_url_pairs(
    urls: DataFrame, max_bucket: int = DUST_MAX_BUCKET
) -> DataFrame:
    """Content-equal URL pairs from ``(uri, fingerprint)`` observations:
    every unordered pair of DISTINCT uris sharing a fingerprint, emitted
    once with ``uri_a < uri_b`` (lexicographic — a deterministic
    canonical direction both engines agree on). Fingerprint groups
    larger than ``max_bucket`` are dropped whole (skew cap; a mirror
    farm with 10^5 aliases of one page would otherwise emit 10^10
    pairs). Output: (uri_a, uri_b).

    Plan (review r5, then scaling-leg tuned): ONE groupBy(fingerprint)
    into a sorted distinct-uri array via collect_set (set union is
    associative, so the dedup rides the partial aggregation — a
    separate .distinct() before the groupBy shuffled the wide uri rows
    TWICE and measured 0.68 N→2N; one shuffle restores the
    mirror_hosts/media_mirror recipe), whole-group cap on the array
    size, then MAP-SIDE pair expansion. The earlier window-count +
    capped self-join was worse still (distinct subplan on both join
    sides)."""
    per_fp = (
        urls.select("uri", "fingerprint")
        .groupBy("fingerprint")
        .agg(F.array_sort(F.collect_set("uri")).alias("us"))
        .where(F.size("us") <= max_bucket)
    )
    return per_fp.select(
        F.explode(
            F.expr(
                "flatten(transform(us, (a, i) -> "
                "transform(slice(us, i + 2, size(us)), "
                "b -> struct(a AS uri_a, b AS uri_b))))"
            )
        ).alias("p")
    ).select("p.uri_a", "p.uri_b")


def dust_rule_counts(pairs: DataFrame) -> DataFrame:
    """Mine substitution rules from content-equal URL pairs
    ``(uri_a, uri_b)``; returns the UNFILTERED support table
    ``(alpha, beta, support)`` — the state the delta miner maintains
    (`dust_rules` applies the min_support floor for publication).

    Per pair: ``lcp`` = chars before the first mismatch (zip_with pads
    the shorter string with null and ``<=>`` makes the pad a mismatch,
    so a strict-prefix pair aligns at the shorter length); ``lcs`` =
    the same scan on the reversed strings, capped at
    ``min(len) - lcp`` so prefix and suffix never claim the same
    character (e.g. ``ab`` vs ``aab``: lcp = 1 and the uncapped suffix
    scan matches 2, double-claiming the leading ``a``; the cap yields
    the correct rule ``"a" -> ""``). The rule is the pair of middles,
    DIRECTION-NORMALIZED before aggregation — ``alpha`` is the longer
    (tie: lexicographically larger) side, the rewrite SOURCE; ``beta``
    the shorter, the TARGET (review r5: with pair-order-inherited
    direction, the same logical rule mined from opposite pair shapes
    split its support across ('a','') and ('','a') and could fall under
    min_support entirely). Identical uris (lcp == both lengths) are
    rejected loudly — a pair of a URL with itself is an upstream bug,
    and silently emitting the vacuous rule ("","") would let it hide."""
    p = alignment_cols(pairs).localCheckpoint()
    # materialized once (review r5): the fail-loud probe below is an
    # action; without the checkpoint the full pair pipeline ran twice
    bad = p.where(F.col("_lcp") < 0).limit(1)
    if bad.count() > 0:
        raise ValueError(
            "dust_rules: pair with uri_a == uri_b — no rule to mine; "
            "dedup the pair source"
        )
    return rule_middles(p).groupBy("alpha", "beta").agg(
        F.count(F.lit(1)).alias("support")
    )


_ALIGN_COLS = ("_la", "_lb", "_lcp", "_lcs_raw", "_lcs")


def alignment_cols(pairs: DataFrame) -> DataFrame:
    """The map-only lcp/lcs alignment projection over ``(uri_a, uri_b)``
    pairs (plus any passthrough columns) — shared by the batch miner
    (which checkpoints it and fail-louds on _lcp < 0) and the streaming
    miner (which filters those rows instead: a stream cannot raise
    mid-flight). Internals live in underscore-reserved columns and a
    caller colliding with them fails loudly (review r5: withColumn
    silently REPLACED a same-named passthrough column)."""
    clash = [c for c in _ALIGN_COLS if c in pairs.columns]
    if clash:
        raise ValueError(
            f"alignment_cols: passthrough columns collide with the "
            f"reserved alignment internals {clash}"
        )
    mismatch = (
        "array_position(zip_with(split({a}, ''), split({b}, ''),"
        " (x, y) -> x <=> y), false)"
    )
    return (
        pairs.withColumn("_la", F.length("uri_a"))
        .withColumn("_lb", F.length("uri_b"))
        .withColumn(
            "_lcp",
            F.expr(mismatch.format(a="uri_a", b="uri_b")) - F.lit(1),
        )
        .withColumn(
            "_lcs_raw",
            F.expr(
                mismatch.format(a="reverse(uri_a)", b="reverse(uri_b)")
            )
            - F.lit(1),
        )
    )


def rule_middles(aligned: DataFrame) -> DataFrame:
    """Direction-normalized rule middles from `alignment_cols` output:
    one ``(alpha, beta)`` row per pair (alpha = longer/larger source,
    beta = shorter target), passthrough columns preserved. Map-only."""
    withlcs = aligned.withColumn(
        "_lcs",
        F.least(F.col("_lcs_raw"), F.least("_la", "_lb") - F.col("_lcp")),
    )
    a = F.expr("substr(uri_a, _lcp + 1, _la - _lcp - _lcs)")
    b = F.expr("substr(uri_b, _lcp + 1, _lb - _lcp - _lcs)")
    b_bigger = (F.length(b) > F.length(a)) | (
        (F.length(b) == F.length(a)) & (b > a)
    )
    keep = [
        c
        for c in aligned.columns
        if c not in ("uri_a", "uri_b") and c not in _ALIGN_COLS
    ]
    return withlcs.select(
        F.when(b_bigger, b).otherwise(a).alias("alpha"),
        F.when(b_bigger, a).otherwise(b).alias("beta"),
        *keep,
    )


def dust_rules(
    pairs: DataFrame, min_support: int = DUST_MIN_SUPPORT
) -> DataFrame:
    """The published rule view: `dust_rule_counts` with the min_support
    noise floor applied (see that docstring for the mining semantics)."""
    return dust_rule_counts(pairs).where(F.col("support") >= min_support)


def dust_rules_delta(
    history_counts: DataFrame,
    new_pairs: DataFrame,
    min_support: int = DUST_MIN_SUPPORT,
) -> DataFrame:
    """O(delta) incremental rule maintenance — the `delta_lsh_pairs`
    discipline on the rule axis: mine middles from the NEW content-equal
    pairs only (the caller's pair source supplies new×new ∪ new×history
    pairs — however it discovers content equality) and pool them with
    the persisted UNFILTERED support table (`dust_rule_counts` output —
    the state MUST be kept un-floored, or a rule reaching min_support
    only across days never surfaces). Returns the publishable rules
    ``(alpha, beta, support, new_rule)`` where ``new_rule`` marks rules
    that cross the floor only WITH the delta — the operational signal
    (newly discovered alias families feed `CrawlConfig.dust_rules`
    refreshes).

    100 TB shape: mining is O(new pairs); the merge is ONE full-outer
    join keyed by (alpha, beta) over rule-space-sized tables (≪ corpus);
    at production the history side is the persisted counts table,
    making daily maintenance independent of corpus size."""
    d = dust_rule_counts(new_pairs).select(
        "alpha", "beta", F.col("support").alias("d_support")
    )
    h = history_counts.select(
        "alpha", "beta", F.col("support").alias("h_support")
    )
    merged = d.join(h, ["alpha", "beta"], "full_outer").select(
        "alpha",
        "beta",
        (
            F.coalesce("d_support", F.lit(0))
            + F.coalesce("h_support", F.lit(0))
        ).alias("support"),
        (F.coalesce("h_support", F.lit(0)) < min_support).alias(
            "new_rule"
        ),
    )
    return merged.where(F.col("support") >= min_support)


# ------------------------------------------------------ rule application

# Bounded rule-table size for the map-only application path (top-K by
# support — the paper's own triage: low-support rules are noise first
# and cost second). Mirrored into the oracle.
DUST_RULES_MAX = 1024


def rules_for_config(
    rules: DataFrame, max_rules: int = DUST_RULES_MAX
) -> tuple[tuple[str, str], ...]:
    """Direction-normalize a mined ``(alpha, beta, support)`` table and
    return the top-``max_rules`` as a best-first ``((src, dst), ...)``
    tuple — the form `canonicalize` applies and `CrawlConfig.dust_rules`
    accepts. Rewriting goes longer→shorter (tie: lexicographically
    larger→smaller), the direction that terminates under iteration; the
    order (support DESC, len(src) DESC, src, dst) is total, so every
    consumer picks the identical best rule. Bounded collect: ≤ max_rules
    rows by construction (config-scale, the robots-rule-table class)."""
    a, b = F.col("alpha"), F.col("beta")
    beta_smaller = (F.length(b) < F.length(a)) | (
        (F.length(b) == F.length(a)) & (b < a)
    )
    top = (
        rules.select(
            F.when(beta_smaller, a).otherwise(b).alias("src"),
            F.when(beta_smaller, b).otherwise(a).alias("dst"),
            "support",
        )
        # dust_rules output is already normalized (no-op there); pool
        # support for caller-supplied tables mined in mixed directions
        .groupBy("src", "dst")
        .agg(F.sum("support").alias("support"))
        .orderBy(
            F.col("support").desc(), F.length("src").desc(), "src", "dst"
        )
        .limit(max_rules)
    )
    return tuple((r["src"], r["dst"]) for r in top.collect())


def _match_valid(uri_col, src_col):
    """Boundary-guarded first-occurrence match (review r5: an unanchored
    contains+replace rewrote '?session=s10' under the rule
    '?session=s1' -> '' into the never-existing 'http://x/a0'): the rule
    applies at the FIRST occurrence of src, and when src ends
    mid-token (its last char is alphanumeric) the character after the
    match must NOT continue the token (non-alphanumeric or
    end-of-string; substring past the end is '' and '' fails the rlike,
    so end-of-string needs no separate clause). Rules whose src ends at
    a delimiter ('art/', '/print') carry their own boundary and need no
    guard — a guard there would block the legitimate CMS infix rule,
    whose match is followed by the article id digits."""
    p = F.call_function("instr", uri_col, src_col)
    last = F.substring(src_col, F.length(src_col), F.lit(1))
    after = F.substring(uri_col, p + F.length(src_col), F.lit(1))
    return (p > 0) & (
        ~last.rlike("[0-9A-Za-z]") | ~after.rlike("[0-9A-Za-z]")
    )


def _splice(uri_col, src_col, dst_col):
    """uri with its first occurrence of src replaced by dst — a single
    positional splice, never replace-all (one alias token per rule per
    URL is the alignment semantics the miner extracts; a second
    occurrence is content, not addressing)."""
    p = F.call_function("instr", uri_col, src_col)
    return F.concat(
        F.substring(uri_col, F.lit(1), p - 1),
        dst_col,
        F.substring(uri_col, p + F.length(src_col), F.length(uri_col)),
    )


def rule_hit_col(uri_col, rules):
    """First applicable rule from a pre-ordered ``((src, dst), ...)``
    sequence, as a nullable struct column — the shared map-only
    expression behind `canonicalize` and the crawler's in-loop
    rewrite (CrawlConfig.dust_rules). Applicability = the
    boundary-guarded first-occurrence match (`_match_valid`). ``rules``
    must be non-empty and pre-sorted best-first; F.get is the
    NULL-on-miss accessor."""
    lit_rules = F.array(
        *[
            F.struct(F.lit(s).alias("src"), F.lit(d).alias("dst"))
            for s, d in rules
        ]
    )
    return F.get(
        F.filter(lit_rules, lambda r: _match_valid(uri_col, r["src"])), 0
    )


def rewrite_col(uri_col, rules):
    """The rewritten URI under the first applicable rule (single
    positional splice at the first valid match), or the URI itself when
    none applies / no rules."""
    if not rules:
        return uri_col
    h = rule_hit_col(uri_col, rules)
    return F.when(
        h.isNotNull(), _splice(uri_col, h["src"], h["dst"])
    ).otherwise(uri_col)


def canonicalize(
    urls: DataFrame, rules: DataFrame, max_rules: int = DUST_RULES_MAX
) -> DataFrame:
    """Apply mined DUST rules to a URL table — the operational half of
    the miner: rewrite each URL toward its canonical alias so the
    frontier's seen-set unifies WITHOUT fetching the duplicates.

    Direction: each rule ``(alpha, beta)`` is normalized so rewriting
    goes longer→shorter (tie: lexicographically larger→smaller) — the
    canonical form of a family is its shortest member (session-id strip,
    print-view strip), which is also the direction that terminates under
    iteration. Per URL, the single best applicable rule wins —
    ``(support DESC, len(src) DESC, src, dst)``, a total order so both
    engines pick the identical rule — and is applied as a SINGLE
    positional splice at the first boundary-valid occurrence (ADVICE r5:
    this docstring used to say "replace-all", contradicting ``_splice``'s
    own never-replace-all contract). URLs matching no rule keep
    themselves (flag, not filter). One pass, not a fixpoint: production re-runs over the
    (tiny) still-changed remainder; one pass is the testable kernel.

    100 TB shape: the rule table is config-scale by construction
    (top-``max_rules`` by support, the documented truncation), so it is
    collected once, pre-sorted, and embedded as a literal array — the
    corpus side is MAP-ONLY: per-row ``filter(rules)[0]`` + one literal
    replace, zero shuffles, no broadcast-nested-loop join. Output:
    (uri, canon_uri, rule_src, rule_dst, applied)."""
    collected = rules_for_config(rules, max_rules)
    if not collected:
        return urls.select(
            F.col("uri"),
            F.col("uri").alias("canon_uri"),
            F.lit(None).cast("string").alias("rule_src"),
            F.lit(None).cast("string").alias("rule_dst"),
            F.lit(False).alias("applied"),
        )
    hit = rule_hit_col(F.col("uri"), collected)
    return (
        urls.withColumn("_h", hit)
        .select(
            "uri",
            F.when(
                F.col("_h").isNotNull(),
                _splice(F.col("uri"), F.col("_h.src"), F.col("_h.dst")),
            )
            .otherwise(F.col("uri"))
            .alias("canon_uri"),
            F.col("_h.src").alias("rule_src"),
            F.col("_h.dst").alias("rule_dst"),
            F.col("_h").isNotNull().alias("applied"),
        )
    )


# -------------------------------------------------- driver-contract entry

# Deterministic URL-alias synthesis over the documents table (the same
# derived-input pattern as graph.doc_link_edges): every doc has a
# canonical article URL and a session-id alias; every third doc also has
# a CMS query alias, every fifth a print view. Mined rules must recover
# the session/print/CMS substitutions with support ~ n/7, n/5, n/3 and
# drop the id-bearing singleton middles (cross-family pairs whose common
# suffix dies at the first differing character).
DUST_HOST_MOD = 40


def _base_art_cols():
    """(base, art) URL expressions over doc_id — the ONE copy of the
    synthesis scheme every driver entry derives from (review r5: the
    delta entry had grown an inline third copy that could drift from
    the shared table and the oracle)."""
    d = F.col("doc_id")
    base = F.concat(
        F.lit("http://m"),
        (d % DUST_HOST_MOD).cast("string"),
        F.lit(".example.org/"),
    )
    art = F.concat(base, F.lit("art/"), d.cast("string"))
    return base, art


def _alias_table(docs: DataFrame) -> DataFrame:
    """The deterministic (fingerprint, uri) alias synthesis shared by the
    miner and the canonicalizer entries (mirrored in both oracles)."""
    d = F.col("doc_id")
    base, art = _base_art_cols()
    variants = docs.select(
        d.alias("fingerprint"),
        F.array(
            art,
            F.concat(
                art, F.lit("?session=s"), (d % 7).cast("string")
            ),
            F.when(
                d % 3 == 0,
                F.concat(
                    base, F.lit("index.php?id="), d.cast("string")
                ),
            ),
            F.when(d % 5 == 0, F.concat(art, F.lit("/print"))),
        ).alias("uris"),
    ).select(
        "fingerprint",
        F.explode(F.filter("uris", lambda u: u.isNotNull())).alias("uri"),
    )
    return variants


def dust_rules_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: DUST rules mined from the synthetic alias table,
    columns (alpha, beta, support)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return dust_rules(duplicate_url_pairs(_alias_table(docs)))


def dust_rules_delta_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: incremental mining — docs split 3:1 into history
    (doc_id % 4 != 0) and today's delta; the delta side additionally
    grows an AMP alias family (``art + '/amp'``) absent from history, so
    the ``new_rule`` flag is non-vacuous (the session/print/CMS rules
    pool support across sides and are NOT new; '/amp' crosses the floor
    only with the delta). Columns (alpha, beta, support, new_rule)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    hist = dust_rule_counts(
        duplicate_url_pairs(_alias_table(docs.where(d % 4 != 0)))
    )
    delta_docs = docs.where(d % 4 == 0)
    _, art = _base_art_cols()
    amp = delta_docs.select(
        d.alias("fingerprint"),
        F.concat(art, F.lit("/amp")).alias("uri"),
    )
    delta_variants = _alias_table(delta_docs).unionAll(amp)
    return dust_rules_delta(hist, duplicate_url_pairs(delta_variants))


def dust_canonicalize_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: mined rules applied back onto the alias table — the
    full mine→canonicalize circle; columns (uri, canon_uri, rule_src,
    rule_dst, applied)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    variants = _alias_table(docs)
    rules = dust_rules(duplicate_url_pairs(variants))
    return canonicalize(variants.select("uri").distinct(), rules)
