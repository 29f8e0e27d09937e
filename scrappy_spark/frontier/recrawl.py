"""Recrawl scheduling — per-page change-rate estimation from fetch history.

The reference crawls each URI once per run (plus the observer re-crawl
loop, streaming/observe.py); a production frontier needs the NEXT
refinement: estimate each page's change frequency from its fetch history
and schedule re-crawls accordingly (the classic freshness-maximization
policy of Cho & Garcia-Molina, "Synchronizing a database to improve
freshness", SIGMOD 2000 — change-rate buckets, frequent changers
re-crawled often, static pages rarely).

Kernel shape (``recrawl_schedule``): input is a fetch log
(key, ts, fingerprint[, tiebreak]); one hash Exchange on the key, a
``lag`` window pass marks fetches whose content fingerprint differs from
the previous fetch of the same key, and one aggregation rolls up
(n_fetches, n_changes) per key. Tier assignment is INTEGER arithmetic
(2*changes >= fetches-1 → hourly, 10*changes >= fetches-1 → daily,
else weekly; a single observation is 'cold'), and the reported rate is
integer parts-per-million (floor division) — no float anywhere, because
a rounded double ratio of small ints lands on EXACT .5 at the rounding
digit for power-of-two denominators, where Spark rounds HALF_UP and
DuckDB rounds half-even (the mismatch class the decimal-sum discipline
exists for).

At 100 TB: the fetch log is append-only and time-partitioned; the window
+ rollup shuffle once on the page key (same cost as sessionize), and the
output is frontier-metadata-sized (one row per known page), joining back
to the frontier as a broadcast or bucketed equi-join — the same shape as
the robots/trap gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# integer tier thresholds: changed on at least half / a tenth of the
# observed refetch opportunities
TIER_FAST_NUM, TIER_FAST_DEN = 1, 2
TIER_MID_NUM, TIER_MID_DEN = 1, 10


def recrawl_schedule(
    fetches: DataFrame,
    key: str = "uri",
    ts: str = "ts",
    fp: str = "fingerprint",
    tiebreak: str | None = None,
) -> DataFrame:
    """(key, n_fetches, n_changes, change_rate_ppm, schedule) per page.

    ``tiebreak`` totals the order at equal timestamps (pass the fetch/
    event id); without one, equal-ts fetches of one key would make the
    lag — and therefore the change count — partition-sort-dependent,
    the same hazard asof_join fails loudly on.

    A NULL fingerprint FAILS LOUD (review r5): NULL poisons both the
    comparison against it and the next row's lag, so a page whose log
    alternates fp/NULL/fp would count ZERO changes and land in the
    'weekly' tier while churning every capture — encode failed fetches
    as an explicit sentinel value (or filter them) before calling; the
    adaptive_budget NULL-telemetry contract, same reasoning.
    """
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    fp_checked = F.when(
        F.col(fp).isNull(),
        F.raise_error(
            F.concat(
                F.lit("recrawl_schedule: NULL fingerprint for key "),
                F.col(key).cast("string"),
                F.lit(" — encode failed fetches explicitly"),
            )
        ).cast("string"),
    ).otherwise(F.col(fp).cast("string"))
    prev = F.lag(fp_checked).over(w)
    changed = (prev.isNotNull() & (fp_checked != prev)).cast("long")
    agg = (
        fetches.select(key, F.col(ts), F.col(fp), changed.alias("_chg"))
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.sum("_chg").alias("n_changes"),
        )
    )
    nf, nc = F.col("n_fetches"), F.col("n_changes")
    schedule = (
        F.when(nf <= 1, F.lit("cold"))
        .when(TIER_FAST_DEN * nc >= TIER_FAST_NUM * (nf - 1), F.lit("hourly"))
        .when(TIER_MID_DEN * nc >= TIER_MID_NUM * (nf - 1), F.lit("daily"))
        .otherwise(F.lit("weekly"))
    )
    # exact integer floor division (operands nonnegative, so Spark's
    # truncating DIV == DuckDB's // == floor) — never a double ratio
    rate = F.when(nf <= 1, F.lit(0).cast("long")).otherwise(
        F.expr("(1000000 * n_changes) DIV (n_fetches - 1)")
    )
    return agg.select(
        key,
        "n_fetches",
        "n_changes",
        rate.alias("change_rate_ppm"),
        schedule.alias("schedule"),
    )


def recrawl_schedule_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: fetch history derived deterministically from the
    events table — page = user_id*8 + event_id%8 (spreads the few users
    into enough pages that single-fetch 'cold' pages exist), fetch time =
    (ts, event_id), content fingerprint = floor(value / 10^(page_id%4))
    mod 7 (the page-dependent divisor makes some pages churn every fetch
    and others sit static, so ALL FOUR tiers occur — measured cold/daily/
    hourly/weekly = 1/19/62/38 at sf0.001). Output columns
    (page_id, n_fetches, n_changes, change_rate_ppm, schedule)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    page = F.col("user_id") * 8 + F.col("event_id") % 8
    fetches = ev.select(
        page.alias("page_id"),
        "ts",
        "event_id",
        (
            F.floor(F.col("value") / F.pow(F.lit(10.0), (page % 4).cast("double")))
            .cast("long")
            % 7
        ).alias("fp"),
    )
    return recrawl_schedule(
        fetches, key="page_id", ts="ts", fp="fp", tiebreak="event_id"
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "url",
    host: str = "host",
    fp: str = "fingerprint",
) -> DataFrame:
    """Crawl-snapshot diff — the rollup a recrawl run is judged by:
    given two snapshots (key, host, fingerprint), classify every page as
    added / removed / changed / unchanged and count per (host, status).
    This is the freshness ledger that feeds the change-rate tiers above
    (a snapshot pair is the two-fetch degenerate case of the fetch log).

    Plan: one full-outer hash join on the page key (both sides shuffle
    once on the same key — at 100 TB both snapshots are stored
    bucketed/partitioned by this key, making the join zero-Exchange),
    then a partial-agg shuffle to host×status counts (4×#hosts rows).
    No window, no collect."""
    # presence rides EXPLICIT per-side markers, never fingerprint
    # nullness (review r5): a page present in both snapshots with a
    # NULL-fp capture (failed fetch recorded) would otherwise read as
    # added/removed; fp comparison is null-safe so a (NULL, A) present
    # pair classifies as changed, not unchanged
    o = old.select(
        F.col(key).alias("_k"),
        F.col(host).alias("_h_old"),
        F.col(fp).alias("_fp_old"),
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        F.col(key).alias("_k"),
        F.col(host).alias("_h_new"),
        F.col(fp).alias("_fp_new"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "_k", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("_fp_old").eqNullSafe(F.col("_fp_new")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            F.coalesce("_h_new", "_h_old").alias("host"),
            status.alias("status"),
        )
        .groupBy("host", "status")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


def snapshot_diff_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: two snapshots derived from documents. OLD = every
    doc (url = source/d/id, fp = md5 of the 30-char text prefix). NEW
    drops doc_id%11==3 (removed), re-fingerprints doc_id%7==2 with the
    29-char prefix (changed — except docs whose chars 29 and 30 make
    both prefixes equal, i.e. text shorter than 30; equality is what's
    classified, identically in both engines), and adds a second url
    (source/new/id) for doc_id%13==0 (added). Columns
    (host, status, n_pages)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(
        F.col("source"), F.lit("/d/"), F.col("doc_id").cast("string")
    )
    old = docs.select(
        url.alias("url"),
        F.col("source").alias("host"),
        F.md5(F.substring("text", 1, 30)).alias("fingerprint"),
    )
    kept = docs.where(F.col("doc_id") % 11 != 3).select(
        url.alias("url"),
        F.col("source").alias("host"),
        F.when(
            F.col("doc_id") % 7 == 2, F.md5(F.substring("text", 1, 29))
        )
        .otherwise(F.md5(F.substring("text", 1, 30)))
        .alias("fingerprint"),
    )
    added = docs.where(F.col("doc_id") % 13 == 0).select(
        F.concat(
            F.col("source"), F.lit("/new/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.col("source").alias("host"),
        F.md5(F.substring("text", 5, 30)).alias("fingerprint"),
    )
    return snapshot_diff(old, kept.unionAll(added))


def tier_ppm(n_fetches: int, n_changes: int) -> tuple[int, str]:
    """Pure-python twin of the Column tier logic above, over the SAME
    threshold constants — used by the streaming sibling
    (streaming.state_stream.recrawl_stream) so batch and stream tier
    assignment cannot drift apart (the quota stream ↔ sampling._priority
    discipline)."""
    if n_fetches <= 1:
        return 0, "cold"
    ppm = (1_000_000 * n_changes) // (n_fetches - 1)
    if TIER_FAST_DEN * n_changes >= TIER_FAST_NUM * (n_fetches - 1):
        return ppm, "hourly"
    if TIER_MID_DEN * n_changes >= TIER_MID_NUM * (n_fetches - 1):
        return ppm, "daily"
    return ppm, "weekly"
