"""Time-series operators over the events stream: as-of join, gap
sessionization, hypertable-style time-bucket rollup, and a banded range
join.

These are the operators Spark's built-in surface famously lacks (kdb
``aj``, TimescaleDB continuous aggregates, Flink session windows) and
that the task brief names explicitly; each is expressed as a
composition of DataFrame ops whose physical plan survives scale — never
an inequality theta-join, never a driver loop.

Scale shapes (the thing each recipe exists for):

- **as-of join** — the naive spelling is a per-row ``MAX(ts) WHERE
  ts <= probe.ts`` correlated subquery, i.e. an O(n·m) theta join. The
  union-interleave recipe here shuffles BOTH sides once on the join
  key, sorts each partition once on (ts, side), and fills the build
  payload forward with ``last(ignorenulls)`` over a running window —
  O((n+m) log) per partition, one Exchange per side, no theta join in
  the plan. Per-key windows are sequential, so a pathologically hot key
  serializes; that is inherent to as-of ordering (salting would break
  the order) — the mitigation at 100 TB is range-bucketing time within
  the key, which this module's callers can do by composing with
  ``F.date_trunc`` pre-keys.
- **sessionization** — one shuffle on the entity key; gap detection is
  ``lag`` + running ``sum`` in a single window pass (two sorts fused
  into one by Spark since the windows share (key, order)).
- **time-bucket rollup** — plain hash aggregate keyed by
  (bucket, type): partial aggregation map-side, one Exchange; the
  hypertable "continuous aggregate" at 100 TB is this exact plan fed
  incrementally per partition-of-arrival.
- **range join** — the inequality predicate is turned into an equi-join
  by banding time into fixed buckets: windows explode into the ≤
  ceil(len/band)+1 buckets they cover, events carry their single
  bucket, and the join is a hash equi-join on (key, bucket) with the
  exact BETWEEN applied as a post-filter. Candidate blowup is bounded
  by window_len/band per window row.

Exactness contract (driver oracles are DuckDB): timestamps pass
through or are ``date_trunc``-ed (bit-exact in both engines);
value sums are rounded to the 2-decimal cent grid and cast to
DECIMAL(18,2) BEFORE summing, so every aggregate is order-independent
exact integer arithmetic (the module-wide decimal-sum discipline, see
textstats.unigram_logprob); counts/min/max involve no arithmetic at
all. The DuckDB mirror of the as-of join uses DuckDB's native ASOF
JOIN — the Spark recipe must (and does) reproduce its
greatest-ts-≤-probe semantics including ties, which is why build rows
sort BEFORE probe rows at equal timestamps (inclusive match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap
ATTR_WINDOW = "2 hours"  # attribution window opened by each signup
ATTR_BAND = "hour"  # banding granularity for the range equi-join


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: dict[str, str],
    check_unique: bool = True,
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``ts`` ≤ the left row's ``ts`` within the same ``on`` key (kdb
    ``aj`` / DuckDB ``ASOF JOIN`` semantics, inclusive, left-outer:
    unmatched left rows keep NULL payload).

    ``right_cols`` maps output column name → right column name; the
    result is all left columns plus those outputs.

    Precondition: ``right`` has at most one row per (on, ts) — at equal
    timestamps the fill would otherwise depend on partition sort
    stability. Callers dedup first (see ``events_asof_last_purchase``).
    The precondition is ENFORCED (ADVICE r4, mirroring the fail-loud
    contract of resolve_chains/components_from_pairs): a duplicate
    (on, ts) build key raises instead of producing a partition-sort-
    dependent, nondeterministic fill. Pass ``check_unique=False`` only
    when the caller just deduped on exactly (on, ts).
    """
    if check_unique:
        dup = (
            right.groupBy(on, ts)
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"asof_join precondition violated: right side has more than "
                f"one row per ({on}, {ts}), e.g. {dup[0][on]!r} @ {dup[0][ts]!r}"
                " — dedup the build side first (keep the row that should win)"
            )
    lcols = left.columns
    row_t = left.select(F.struct(*lcols).alias("_row")).schema["_row"].dataType
    # the payload travels as ONE struct so the forward fill is atomic:
    # filling each output column independently would back-fill a NULL
    # field of the matched build row from an OLDER build row — a torn
    # row that exists on no input row and diverges from ASOF semantics
    payload = F.struct(
        *[F.col(src).alias(out) for out, src in right_cols.items()]
    )
    build = right.select(
        F.col(on).alias(on),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),  # sorts before probes at equal ts → inclusive
        F.lit(None).cast(row_t).alias("_row"),
        payload.alias("_payload"),
    )
    payload_t = build.schema["_payload"].dataType
    probe = left.select(
        F.col(on),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_row"),
        F.lit(None).cast(payload_t).alias("_payload"),
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = probe.unionByName(build).select(
        "_side",
        "_row",
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
    )
    return filled.where(F.col("_side") == 1).select(
        *[F.col("_row")[c].alias(c) for c in lcols],
        *[F.col("_payload")[out].alias(out) for out in right_cols],
    )


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    gap_us: int = SESSION_GAP_US,
) -> DataFrame:
    """Append 1-based ``session_idx`` per ``key``: a new session starts
    whenever the gap to the previous event (by ``ts``, then
    ``tiebreak`` for a total order) strictly exceeds ``gap_us``
    microseconds. One shuffle on ``key``; both window passes share the
    same (key, order) sort."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    # parquet timestamps arrive as TIMESTAMP_NTZ; the session timezone is
    # pinned to UTC (session.py), so this cast is a wall-clock identity and
    # unix_micros agrees bit-for-bit with DuckDB's epoch_us on the same
    # naive timestamps
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_sess = (prev.isNull() | ((us - prev) > gap_us)).cast("int")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_idx", F.sum(new_sess).over(running))


def _cents(col: F.Column) -> F.Column:
    """The order-independent exact money aggregate input: snap the
    2-decimal-grid double to DECIMAL(18,2) before any sum. Shared with
    streaming.rollup_stream — the stream==batch equality depends on
    this being the SAME expression, not a lookalike."""
    return F.round(col, 2).cast("decimal(18,2)")


def hour_bucket(ts_col: str = "ts") -> F.Column:
    """The rollup's time-bucket expression, shared batch/stream."""
    return F.date_trunc("hour", ts_col)


# ------------------------------------------------------ driver entries


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: every event annotated with the user's most recent
    purchase at-or-before it. Columns (event_id, ts, user_id,
    event_type, value, last_purchase_ts, last_purchase_value). The
    build side is deduped to one purchase per (user_id, ts) by max
    (event_id, value) — deterministic under the asof_join tie
    precondition and mirrored verbatim in the oracle."""
    ev = _events(spark, sf_dir)
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max(F.struct("event_id", "value")).alias("_m"))
        .select("user_id", "ts", F.col("_m.value").alias("p_value"))
    )
    probe = ev.select("event_id", "ts", "user_id", "event_type", "value")
    joined = asof_join(
        probe,
        purchases.withColumn("p_ts", F.col("ts")),
        on="user_id",
        ts="ts",
        right_cols={"last_purchase_ts": "p_ts", "last_purchase_value": "p_value"},
        # the groupBy("user_id", "ts") above IS the dedup on exactly the
        # join key — skip the guard's extra job in the bench-timed path
        check_unique=False,
    )
    # driver-contract hygiene: the compare harness sorts row tuples, and
    # NaT/None poison mixed-type sorts — coalesce the left-outer misses to
    # fixed sentinels (mirrored in the oracle); asof_join itself stays
    # honestly left-outer for library callers
    return joined.select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        F.coalesce(
            "last_purchase_ts", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
        ).alias("last_purchase_ts"),
        F.coalesce("last_purchase_value", F.lit(-1.0)).alias(
            "last_purchase_value"
        ),
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: gap-based session rollup (30-min inactivity).
    Columns (user_id, session_idx, session_start, session_end,
    n_events, sum_value) with the exact decimal sum."""
    s = sessionize(_events(spark, sf_dir))
    return s.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum(_cents(F.col("value"))).cast("double").alias("sum_value"),
    )


def events_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: hypertable-style continuous aggregate at 1-hour
    buckets per event_type. Columns (bucket, event_type, n_events,
    n_users, sum_value, min_value, max_value)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(hour_bucket().alias("bucket"), "event_type").agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(_cents(F.col("value"))).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def events_attribution_range_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver entry: banded range join — every event falling inside the
    2-hour attribution window opened by a same-user signup, inclusive
    on both ends (the signup matches its own window). Columns (win_id,
    event_id, user_id, ts, event_type). Bands are 1-hour buckets, so
    each window explodes into ≤3 bucket rows and the join is a hash
    equi-join on (user_id, bucket) with the exact BETWEEN post-filter.
    """
    ev = _events(spark, sf_dir)
    wins = ev.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr(f"INTERVAL {ATTR_WINDOW}")).alias("w_end"),
    )
    banded = wins.select(
        "win_id",
        "user_id",
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                F.date_trunc(ATTR_BAND, F.col("w_start")),
                F.date_trunc(ATTR_BAND, F.col("w_end")),
                F.expr(f"INTERVAL 1 {ATTR_BAND}"),
            )
        ).alias("_bucket"),
    )
    probes = ev.select(
        "event_id",
        F.col("user_id").alias("p_user"),
        "ts",
        "event_type",
        F.date_trunc(ATTR_BAND, F.col("ts")).alias("_bucket"),
    )
    return (
        banded.join(
            probes,
            (banded["user_id"] == probes["p_user"])
            & (banded["_bucket"] == probes["_bucket"]),
        )
        .where((F.col("ts") >= F.col("w_start")) & (F.col("ts") <= F.col("w_end")))
        .select("win_id", "event_id", "user_id", "ts", "event_type")
    )


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: signup→purchase funnel — for each attribution
    window (a signup and the 2 hours after it), how many same-user
    events fell inside and whether any was a purchase. A pure
    composition over the banded range join: one extra keyed aggregation
    whose group size is bounded by the window's event capacity. Columns
    (win_id, user_id, n_events_in_window, converted)."""
    rj = events_attribution_range_join(spark, sf_dir)
    return rj.groupBy("win_id", "user_id").agg(
        F.count("*").alias("n_events_in_window"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "converted"
        ),
    )
