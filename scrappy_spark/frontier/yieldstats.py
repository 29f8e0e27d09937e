"""Frontier telemetry — crawl-yield budgets and the URL discovery curve.

Two rollups every production crawl scheduler runs between rounds, over
the telemetry the reference's agent loop keeps implicitly (each
`agent.rb` iteration pops a batch and collects new URIs; these operators
make that feedback loop a first-class, schedulable signal):

* **Adaptive per-host budgets** (``adaptive_budget``): a host's yield —
  newly discovered URLs per pop — decides its next-round politeness
  budget. High-yield hubs (directories, sitemaps-of-links) earn more
  slots; exhausted hosts decay to the floor. This is the classic
  frontier allocation refinement over a flat per-host budget (Cho &
  Garcia-Molina, "The evolution of the web and implications for an
  incremental crawler", VLDB 2000 — allocate refresh/discovery effort
  where it pays). All INTEGER arithmetic (the recrawl-tier discipline:
  no double ratios, so Spark and DuckDB agree bit-for-bit), and the
  output plugs directly into ``CrawlConfig.host_budgets`` — the same
  literal-map override surface the robots Crawl-delay translation uses.

* **Discovery curve** (``discovery_curve``): per crawl round, how many
  URLs were seen for the FIRST time, and the cumulative total — the
  saturation curve a crawl operator reads to decide when a host/corpus
  is exhausted (new-URL rate under the horizon ⇒ stop paying fetch
  budget). First-seen is a min-aggregation, NOT a window: re-discovery
  is the common case (every page links to the nav hub every round).

100 TB shapes: ``adaptive_budget`` is one partial-agg shuffle keyed by
host (map-side combine absorbs the per-round fan-in; output is
host-count-sized and joins the frontier like the robots/trap gates).
``discovery_curve`` is one partial-agg shuffle keyed by URL (the min
round per URL — the only corpus-sized stage), then a count rollup to
#rounds rows; the cumulative sum is a broadcast triangular self-join
over those #rounds rows (rounds ≤ depth budget, tens — deliberately NOT
a global-order window, which would be an `Exchange SinglePartition`
on the corpus-sized path if fused wrong; here the quadratic join is
over a provably tiny table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# budget clamp defaults: floor keeps a host probe-able (politeness slot
# for detecting recovery), ceiling bounds any single host's share of a
# round (the skew cap this layer exists to enforce)
BUDGET_BASE = 8
BUDGET_LO = 1
BUDGET_HI = 32


def adaptive_budget(
    log: DataFrame,
    host: str = "host",
    pops: str = "n_pops",
    new: str = "n_new",
    base: int = BUDGET_BASE,
    lo: int = BUDGET_LO,
    hi: int = BUDGET_HI,
) -> DataFrame:
    """Per-(host, round) crawl telemetry → next-round per-host budgets:
    (host, n_pops, n_new, yield_ppm, next_budget).

    ``yield_ppm`` = 10^6 · Σnew ÷ Σpops (integer floor division — the
    recrawl_schedule discipline); ``next_budget`` =
    clamp(base · Σnew ÷ Σpops, lo, hi). Hosts appear in the output iff
    they were popped at least once (Σpops ≥ 1 by construction of the
    log; a zero-pop row is the caller's telemetry bug, and integer DIV
    by zero fails loudly rather than inventing a budget). NULL
    telemetry fails loudly too, checked PER ROW before the sums
    (review r5 twice: ``F.sum`` skips NULLs, so a post-agg check only
    fires when ALL of a host's rows are NULL — a mixed host would
    silently aggregate the invented-telemetry subset); the streaming
    twin (``state_stream.budget_stream``) enforces the same refusal."""

    def _row_checked(col: str, label: str):
        # per-row fail-loud: NULL telemetry never reaches the sum
        return F.when(
            F.col(col).isNull(),
            F.raise_error(
                F.concat(
                    F.lit(f"adaptive_budget: NULL telemetry ({label}) for host "),
                    F.col(host),
                )
            ).cast("long"),
        ).otherwise(F.col(col))

    checked = log.groupBy(F.col(host).alias("host")).agg(
        F.sum(_row_checked(pops, "n_pops")).cast("long").alias("n_pops"),
        F.sum(_row_checked(new, "n_new")).cast("long").alias("n_new"),
    )
    yield_ppm = F.expr("(1000000 * n_new) DIV n_pops")
    raw = F.expr(f"({base} * n_new) DIV n_pops")
    budget = F.least(F.greatest(raw, F.lit(lo).cast("long")), F.lit(hi).cast("long"))
    return checked.select(
        "host",
        "n_pops",
        "n_new",
        yield_ppm.alias("yield_ppm"),
        budget.alias("next_budget"),
    )


def adaptive_budget_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: crawl telemetry derived from events — host =
    'h' || user_id % 19, per-event pops = 1 + event_id % 3, per-event
    new URLs = event_id % (1 + 2·(user_id % 19)). The host-residue-
    bounded modulus gives h0 a hard-zero yield (clamps to the floor)
    and the high-residue hosts a mean yield well past the ceiling,
    with real values in between — both clamps and the open range occur
    at every sf (min/max budget 1/32 at sf0.001/0.01/0.1, measured).
    Columns (host, n_pops, n_new, yield_ppm, next_budget)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r = F.col("user_id") % 19
    log = ev.select(
        F.concat(F.lit("h"), r.cast("string")).alias("host"),
        (F.lit(1) + F.col("event_id") % 3).alias("n_pops"),
        (F.col("event_id") % (F.lit(1) + F.lit(2) * r)).alias("n_new"),
    )
    return adaptive_budget(log)


def discovery_curve(
    log: DataFrame, url: str = "url", round_col: str = "round"
) -> DataFrame:
    """URL-discovery log (url, round) — every sighting, re-discoveries
    included — → (round, n_new, n_cumulative): URLs first seen that
    round and the running total. Rounds with no first-sightings don't
    appear (nothing was discovered; the caller's plot fills gaps)."""
    first = log.groupBy(F.col(url).alias("_u")).agg(
        F.min(round_col).alias("round")
    )
    per_round = first.groupBy("round").agg(
        F.count(F.lit(1)).cast("long").alias("n_new")
    )
    # cumulative over #rounds rows (bounded by the crawl's depth/round
    # budget): broadcast triangular join, NOT a global-order window —
    # no Exchange SinglePartition on any path
    b = per_round.select(
        F.col("round").alias("_r"), F.col("n_new").alias("_n")
    )
    return (
        per_round.join(F.broadcast(b), F.col("_r") <= F.col("round"))
        .groupBy("round", "n_new")
        .agg(F.sum("_n").cast("long").alias("n_cumulative"))
    )


def discovery_curve_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: a 12-round discovery log from events — url =
    'u' || (event_id·31 + user_id) % 700, round = 1 + event_id % 12.
    Each synthetic URL recurs across many rounds (events ≫ 700), so
    min-round is a real contest and the curve decays the way a crawl's
    does: most URLs first-seen in the earliest rounds, a thinning tail
    after. Columns (round, n_new, n_cumulative)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    log = ev.select(
        F.concat(
            F.lit("u"),
            ((F.col("event_id") * 31 + F.col("user_id")) % 700).cast("string"),
        ).alias("url"),
        (F.lit(1) + F.col("event_id") % 12).alias("round"),
    )
    return discovery_curve(log)


def budget_for(
    n_pops: int,
    n_new: int,
    base: int = BUDGET_BASE,
    lo: int = BUDGET_LO,
    hi: int = BUDGET_HI,
) -> tuple[int, int]:
    """(yield_ppm, next_budget) — pure-python twin of the Column logic
    in ``adaptive_budget``, over the SAME constants; used by the
    streaming sibling (``state_stream.budget_stream``) so batch and
    stream budget assignment cannot drift (the recrawl
    ``tier_ppm`` discipline)."""
    ppm = (1_000_000 * n_new) // n_pops
    return ppm, min(max((base * n_new) // n_pops, lo), hi)


# ------------------------------------------------------- politeness audit

POLITE_BASE = 6  # default per-round per-host budget when no override


def politeness_audit(
    log: DataFrame,
    budgets: DataFrame | None = None,
    host: str = "host",
    round_col: str = "round",
    pops: str = "n_pops",
    base: int = POLITE_BASE,
) -> DataFrame:
    """Per-host politeness-compliance audit over per-round pop telemetry
    (host, round, n_pops) — the batch twin of the streaming politeness
    auditor (state_stream.politeness_audit_stream): for each host,
    how many rounds it was popped, total and per-round-max pops, the
    budget in force (override map, else ``base`` — the same literal-map
    surface CrawlConfig.host_budgets / ranked_pop uses), the number of
    rounds that EXCEEDED the budget, and the worst overshoot as an
    exact integer ratio (worst_over_ppm = 10^6 · max_round_pops ÷
    budget, floor DIV — ≤ 10^6 means always compliant). A scheduler
    that enforces budgets in the pop kernel should audit to zero
    violations; nonzero rows localize the config drift or the log
    corruption. NULL telemetry fails loudly PER ROW before any sum
    (the adaptive_budget discipline — F.sum skips NULLs, so a post-agg
    check would miss a mixed host).

    100 TB shape: ONE partial-agg shuffle keyed by host (the budget
    join is broadcast — override maps are config-sized); output is
    host-count-sized. Columns (host, budget, rounds_active, total_pops,
    max_round_pops, n_violations, worst_over_ppm)."""
    checked = F.when(
        F.col(pops).isNull(),
        F.raise_error(
            F.concat(
                F.lit("politeness_audit: NULL n_pops for host "), F.col(host)
            )
        ).cast("long"),
    ).otherwise(F.col(pops))
    rows = log.select(
        F.col(host).alias("host"),
        F.col(round_col).alias("round"),
        checked.alias("n_pops"),
    )
    if budgets is not None:
        rows = rows.join(F.broadcast(budgets), "host", "left")
        rows = rows.withColumn(
            "budget", F.coalesce("budget", F.lit(base)).cast("int")
        )
    else:
        rows = rows.withColumn("budget", F.lit(base).cast("int"))
    agg = rows.groupBy("host").agg(
        F.max("budget").alias("budget"),  # constant per host by contract
        F.count(F.lit(1)).cast("long").alias("rounds_active"),
        F.sum("n_pops").cast("long").alias("total_pops"),
        F.max("n_pops").cast("long").alias("max_round_pops"),
        F.sum(
            F.when(F.col("n_pops") > F.col("budget"), 1).otherwise(0)
        ).cast("long").alias("n_violations"),
    )
    return agg.withColumn(
        "worst_over_ppm", F.expr("(1000000 * max_round_pops) DIV budget")
    )


# override map for the driver entry: h0 gets a tight budget (violations
# by construction), h1 a loose one (never violates) — both audit
# branches occur at every sf because n_pops is a pure function of
# (host, round), not a count that grows with the table
POLITE_OVERRIDES = {"h0": 2, "h1": 11}


def politeness_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: per-round pop telemetry derived from events —
    host = 'h' || user_id % 13, round = 1 + event_id % 9, and
    n_pops = 1 + ((user_id%13)·3 + (event_id%9)·5) % 11 — a pure
    function of (host, round), so the DISTINCT grid (≤ 117 rows) is
    identical at every sf and the violation mix is stable. Columns
    (host, budget, rounds_active, total_pops, max_round_pops,
    n_violations, worst_over_ppm)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    r13 = F.col("user_id") % 13
    r9 = F.col("event_id") % 9
    log = ev.select(
        F.concat(F.lit("h"), r13.cast("string")).alias("host"),
        (F.lit(1) + r9).alias("round"),
        (F.lit(1) + (r13 * 3 + r9 * 5) % 11).alias("n_pops"),
    ).distinct()
    budgets = spark.createDataFrame(
        sorted(POLITE_OVERRIDES.items()), "host string, budget int"
    )
    return politeness_audit(log, budgets)
