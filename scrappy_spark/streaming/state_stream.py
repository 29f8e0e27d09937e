"""Structured-Streaming consumption of the engine's append-only state.

The crawl store's tables are append-only parquet deltas (checkpoint.py) —
exactly the shape Spark's file stream source consumes. This gives live
crawl monitoring (rounds/s, URLs/s, per-host rates) without touching the
crawl loop: the store IS the stream.

The reference has no streaming at all (its observe loop is a sleep,
agent.rb:140-151; SURVEY.md §2.E); this layer is the Spark-native
capability the engine adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def order_stream(spark: SparkSession, store_dir: str) -> DataFrame:
    """Streaming view of the crawl-order table (one row per pop)."""
    return (
        spark.readStream.schema("seq long, uri string, depth int, round int")
        .option("basePath", f"{store_dir}/order")
        .parquet(f"{store_dir}/order/round=*")
    )


def pops_per_round(spark: SparkSession, store_dir: str) -> DataFrame:
    """Live rounds dashboard: pops + distinct-host spread per round."""
    return (
        order_stream(spark, store_dir)
        .withColumn("host", F.regexp_extract("uri", r"^[^:]+://([^/?#:]*)", 1))
        .groupBy("round")
        .agg(
            F.count(F.lit(1)).alias("pops"),
            F.approx_count_distinct("host").alias("hosts"),
        )
    )


VIOLATION_SCHEMA = "host string, ts long, gap_ms long, total_fetches long"
_AUDIT_STATE = "last_ts long, total long"


def politeness_violations(
    fetch_events: DataFrame, min_interval_ms: int = 1000
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): a
    per-host politeness auditor. State per host = (last fetch ts, total
    fetches), carried across micro-batches; every fetch closer than
    ``min_interval_ms`` to the previous one on the same host emits a
    violation row. This is the applyInPandasWithState shape the engine
    uses for any custom keyed state the built-in windowed aggregations
    can't express (the reference's politeness is a sleep, agent.rb:217 —
    auditing it continuously is the Spark-native upgrade).

    Input stream schema: (host string, ts long) — epoch millis.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def audit(key, pdfs, state):
        (host,) = key
        last_ts, total = state.get if state.exists else (-(10**18), 0)
        out = []
        events = []
        for pdf in pdfs:
            events.extend(int(t) for t in pdf["ts"])
        for ts in sorted(events):
            gap = ts - last_ts
            total += 1
            if gap < min_interval_ms:
                out.append((host, ts, gap, total))
            last_ts = ts
        state.update((last_ts, total))
        yield pd.DataFrame(
            out, columns=["host", "ts", "gap_ms", "total_fetches"]
        )

    return (
        fetch_events.groupBy("host")
        .applyInPandasWithState(
            audit,
            outputStructType=VIOLATION_SCHEMA,
            stateStructType=_AUDIT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup (round 4): the streaming analog of
    dedup.exact_dedup for a live ingest pipeline — the first document
    per content fingerprint survives, later copies arriving within the
    watermark are dropped, and the fingerprint state EXPIRES with the
    watermark (`dropDuplicatesWithinWatermark`), so state is bounded by
    ingest-rate × watermark instead of growing with the corpus — the
    only state contract that survives a 100 TB/day feed. Exactness
    window = the watermark: a duplicate arriving later than the
    watermark can re-emit, which is the standard streaming-dedup
    trade-off (global exactness belongs to the batch operator).

    Input stream schema: (doc_id string, text string,
    event_time timestamp)."""
    return (
        docs.withColumn("fp", F.md5("text"))
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def windowed_fetch_rate(
    fetch_events: DataFrame, window: str = "10 seconds", watermark: str = "30 seconds"
) -> DataFrame:
    """Watermarked fetch-rate over an event-time stream
    (fetched_at timestamp, uri string): late events beyond the watermark
    are dropped, state is bounded — the standard streaming-agg shape for
    live politeness auditing on a real crawler."""
    return (
        fetch_events.withWatermark("fetched_at", watermark)
        .groupBy(F.window("fetched_at", window))
        .agg(F.count(F.lit(1)).alias("fetches"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "fetches",
        )
    )
