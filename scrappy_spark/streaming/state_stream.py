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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def order_stream(spark: SparkSession, store_dir: str) -> DataFrame:
    """Streaming view of the crawl-order table (one row per pop) —
    schema shared with the writer so the two cannot drift."""
    from ..frontier.crawler import ORDER_SCHEMA

    return (
        spark.readStream.schema(ORDER_SCHEMA)
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

    Out-of-order arrival (review r5): events are sorted by ts WITHIN the
    batch, but an event older than the stored anchor (it crossed a
    micro-batch boundary late) has an unknown true predecessor — it is
    COUNTED in total_fetches but not judged, and the anchor never
    regresses (judging it would emit a negative-gap violation against
    the wrong fetch, then mis-anchor every later gap). A late event that
    was itself a violation is therefore missed — the price of unbuffered
    audit; sessionize_stream documents the same arrival caveat.

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
            total += 1
            if ts < last_ts:
                continue  # late cross-batch event: counted, not judged
            gap = ts - last_ts
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


def simhash_py(text: str) -> int:
    """Pure-python 60-bit simhash of one document — bit-for-bit the same
    value as dedup.simhash_fingerprints (same whitespace tokenization,
    same md5-derived hash60, same per-bit majority vote), so the
    streaming near-dup operator below and the batch operator agree on
    fingerprints (tested)."""
    from scrappy_spark.operators.text import hash60_py, tokens_py

    toks = tokens_py(text) or []
    w = [0] * 60
    for t in toks:
        h = hash60_py(t)
        for b in range(60):
            w[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(60) if w[b] > 0)


SIMHASH_PAIR_STREAM_SCHEMA = "a string, b string, hamming int"
_SIMHASH_BUCKET_STATE = "ids array<string>, fps array<long>, ts array<long>"


def simhash_pairs_stream(
    docs: DataFrame,
    max_hamming: int = 3,
    max_bucket: int | None = None,
    ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming near-duplicate pair detection (round 4): the streaming
    analog of dedup.simhash_near_pairs for a live ingest feed. Each
    arriving document's 60-bit simhash is computed row-locally (no
    shuffle), exploded to its four 15-bit blocks, and compared under
    per-(block index, block value) keyed state
    (``applyInPandasWithState``) against the fingerprints previously
    seen in that bucket — pigeonhole gives full recall at
    hamming ≤ 3 *within the state retention window*.

    State contract (the 100 TB/day shape): each bucket retains at most
    ``max_bucket`` most-recent fingerprints and drops entries older than
    ``ttl_ms`` of event time — state is bounded by
    buckets × max_bucket, never by corpus size. A pair whose two sides
    share 2+ identical blocks can emit from more than one bucket;
    downstream consumers needing exactly-once pairs apply a distinct
    (the batch operator's .distinct() equivalent).

    Input stream schema: (doc_id string, text string,
    event_time timestamp)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.dedup import (
        SIMHASH_BLOCK_BITS,
        SIMHASH_BLOCK_MASK,
        SIMHASH_BLOCKS,
        SIMHASH_MAX_BUCKET,
    )

    # default to the batch operator's cap so retuning dedup.py cannot
    # silently drift the stream's skew contract away from the batch one
    if max_bucket is None:
        max_bucket = SIMHASH_MAX_BUCKET
    # same fail-loud contract as dedup.simhash_pairs_from (review r5):
    # running past the block count silently loses recall, never audit it
    assert max_hamming < SIMHASH_BLOCKS, "pigeonhole needs blocks > hamming"

    @F.pandas_udf("long")
    def fp_of(text: pd.Series) -> pd.Series:
        return text.map(simhash_py)

    blocks = (
        # NULL-text docs get NO fingerprint in the batch operator
        # (tokens_col(NULL) explodes to nothing) — drop them here too,
        # or two NULL docs would emit as a hamming-0 pair the batch
        # kernel never produces (review r5)
        docs.where(F.col("text").isNotNull())
        .withColumn("fp", fp_of(F.col("text")))
        # exact integer event-time millis — the double*1000 spelling can
        # truncate 1 ms low on non-representable fractional seconds, and
        # ems feeds the TTL horizon and the deterministic sort key
        .withColumn(
            "ems", F.unix_millis(F.col("event_time").cast("timestamp"))
        )
        .select(
            "doc_id",
            "fp",
            "ems",
            F.posexplode(
                F.array(
                    *[
                        F.shiftright(F.col("fp"), SIMHASH_BLOCK_BITS * i)
                        .bitwiseAND(F.lit(SIMHASH_BLOCK_MASK))
                        .cast("long")
                        .alias(f"b{i}")
                        for i in range(SIMHASH_BLOCKS)
                    ]
                )
            ).alias("bi", "bv"),
        )
    )

    def probe(key, pdfs, state):
        ids, fps, ts = state.get if state.exists else ([], [], [])
        ids, fps, ts = list(ids), list(fps), list(ts)
        rows = []
        out = []
        for pdf in pdfs:
            for did, fp, ems in zip(pdf["doc_id"], pdf["fp"], pdf["ems"]):
                rows.append((int(ems), str(did), int(fp)))
        rows.sort()  # deterministic processing order within the batch
        for ems, did, fp in rows:
            for oid, ofp in zip(ids, fps):
                h = bin(fp ^ ofp).count("1")
                if h <= max_hamming and oid != did:
                    a, b = (did, oid) if did < oid else (oid, did)
                    out.append((a, b, h))
            ids.append(did)
            fps.append(fp)
            ts.append(ems)
        if ts:
            horizon = max(ts) - ttl_ms
            keep = [i for i, t in enumerate(ts) if t >= horizon]
            # cap by EVENT time, not insertion order: a late-arriving row
            # from a previous micro-batch sits at the list tail despite
            # being oldest-by-event-time; sorting by (ts, id, fp) before
            # the cap makes "most recent wins" mean event time and keeps
            # the tiebreak deterministic (ADVICE r4)
            keep.sort(key=lambda i: (ts[i], ids[i], fps[i]))
            keep = keep[-max_bucket:]
            ids = [ids[i] for i in keep]
            fps = [fps[i] for i in keep]
            ts = [ts[i] for i in keep]
        state.update((ids, fps, ts))
        yield pd.DataFrame(out, columns=["a", "b", "hamming"])

    return blocks.groupBy("bi", "bv").applyInPandasWithState(
        probe,
        outputStructType=SIMHASH_PAIR_STREAM_SCHEMA,
        stateStructType=_SIMHASH_BUCKET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


def media_admission_stream(
    spans: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming media-fetch admission (round 5, interleaved sibling): a
    live crawl emits span rows as pages are parsed; a media object should
    be FETCHED exactly once no matter how many documents embed it — the
    streaming half of `interleaved.fetch_once`'s ledger (which reports,
    after the fact, how many fetches the cache elided). Media rows are
    identified by kind through the SAME `MEDIA_KINDS` set as the batch
    cores (a link span's href in media_ref must not trigger a fetch),
    then first-sight-wins per media_ref via
    `dropDuplicatesWithinWatermark` — state bounded by discovery-rate ×
    watermark, the dedup_stream contract. A ref re-embedded later than
    the watermark re-admits, which for a fetch gate is a re-validation,
    not a correctness loss (the batch ledger stays globally exact).

    Input stream schema: (doc_id string, kind string, text string,
    media_ref string, offset int, event_time timestamp). Output: the
    admitted fetch rows (first sighting of each ref)."""
    from ..operators.interleaved import MEDIA_KINDS

    media = spans.where(
        F.col("kind").isin(*MEDIA_KINDS) & F.col("media_ref").isNotNull()
    )
    return (
        media.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["media_ref"])
        .select("media_ref", "kind", "doc_id", "offset", "event_time")
    )


DUST_RULE_STREAM_SCHEMA = "alpha string, beta string, support long"
_DUST_RULE_STATE = (
    "count long, emitted boolean, hs array<long>, ts array<long>"
)


def dust_rules_stream(
    pairs: DataFrame,
    min_support: int | None = None,
    state_ttl_ms: int = 86_400_000,
) -> DataFrame:
    """Streaming DUST rule discovery (round 5, thirteenth wave): the
    live third of the rule lifecycle — batch mines the corpus
    (`dust.dust_rules`), the delta job maintains the persisted counts
    (`dust_rules_delta`), and THIS operator watches the live
    content-equal pair feed (however the crawler detects equality —
    fingerprint collision, revisit digest match) and emits each rule
    EXACTLY ONCE, the moment its cumulative support crosses the floor —
    the push signal that refreshes `CrawlConfig.dust_rules` without
    waiting for the nightly delta job.

    Per pair the alignment/normalization is the SAME map-only
    `alignment_cols` + `rule_middles` expression pair as the batch
    miner (no kernel drift possible); identical-uri pairs (_lcp < 0)
    are FILTERED, not raised — a stream cannot fail loud mid-flight,
    and the batch miner remains the loud gate. Support counts DISTINCT
    pairs like the batch miner: each micro-batch dedups within itself
    and against a per-rule set of pair hashes retained UNTIL EMISSION
    (review r5: a replayed observation of ONE pair must not cross the
    floor the batch miner holds at support 1; ADVICE r5: pruning the
    set by TTL while the count stayed cumulative let a replay past the
    horizon count twice — the set is bounded by min_support - 1, so no
    pruning is needed).

    State contract (review r5 — the simhash_pairs_stream discipline):
    per-rule state is (count, emitted, recent pair hashes/timestamps)
    and EXPIRES via an EVENT-TIME timeout ``state_ttl_ms`` past the
    key's last activity (the stream carries a watermark) — id-bearing
    noise middles (the exact class min_support exists to drop) would
    otherwise each pin a state-store row forever, scaling state with
    pair volume. Published rules whose families stay live keep
    re-arming; a family dormant past the TTL expires, and a later
    re-crossing re-emits — an idempotent refresh for the downstream
    CrawlConfig consumer, not a correctness loss. A rule whose support
    accrues slower than the TTL is the nightly delta job's catch
    (`dust_rules_delta` — the globally exact path), not this
    fast-path's.

    Emission is batch-deterministic: the crossing decision depends only
    on cumulative distinct totals, not on intra-batch order. Input
    stream schema: (uri_a string, uri_b string, event_time timestamp).
    Output: (alpha, beta, support) — support as of the crossing batch."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..frontier.dust import (
        DUST_MIN_SUPPORT,
        alignment_cols,
        rule_middles,
    )
    from ..operators.text import hash60_py

    if min_support is None:
        min_support = DUST_MIN_SUPPORT
    # rule_middles drops the uri columns from its output (they are the
    # alignment INPUT, not passthrough) — carry explicit copies through
    mids = rule_middles(
        alignment_cols(
            pairs.withWatermark("event_time", "1 second").select(
                "uri_a",
                "uri_b",
                F.col("uri_a").alias("pa"),
                F.col("uri_b").alias("pb"),
                F.col("event_time"),
                F.unix_millis(
                    F.col("event_time").cast("timestamp")
                ).alias("ems"),
            )
        ).where(F.col("_lcp") >= 0)
    ).select("alpha", "beta", "pa", "pb", "event_time", "ems")

    def miner(key, pdfs, state):
        if state.hasTimedOut:
            # TTL-expired key (event-time: the watermark passed its
            # last activity + TTL): drop — for a never-crossed noise
            # middle this is the bound; for a published rule it means
            # the family went dormant for a full TTL, and a later
            # re-crossing re-emits (an idempotent refresh downstream)
            state.remove()
            yield pd.DataFrame([], columns=["alpha", "beta", "support"])
            return
        cnt, emitted, hs, ts = (
            state.get if state.exists else (0, False, [], [])
        )
        if emitted:
            # crossed already: support freezes at the crossing value
            # (the delta job owns running totals) and the pair-hash set
            # stays empty — state is O(1) for live published rules,
            # O(min_support) for candidates, never O(pair volume)
            ems_max = 0
            for pdf in pdfs:
                if len(pdf):
                    ems_max = max(ems_max, int(pdf["ems"].max()))
            state.update((cnt, True, [], []))
            if ems_max:
                state.setTimeoutTimestamp(ems_max + state_ttl_ms)
            yield pd.DataFrame([], columns=["alpha", "beta", "support"])
            return
        hs, ts = list(hs), list(ts)
        seen = set(hs)
        rows = []
        for pdf in pdfs:
            for a, b, ems in zip(pdf["pa"], pdf["pb"], pdf["ems"]):
                rows.append((int(ems), str(a), str(b)))
        rows.sort()  # deterministic within the batch
        for ems, a, b in rows:
            h = hash60_py(f"{a}\x00{b}")
            if h in seen:
                continue
            seen.add(h)
            hs.append(h)
            ts.append(ems)
            cnt += 1
        out = []
        if cnt >= min_support:
            out.append((key[0], key[1], cnt))
            emitted = True
            hs, ts = [], []  # see the emitted fast path above
        # NO TTL prune of the pair-hash set before emission (ADVICE r5):
        # pruning aged hashes while cnt stayed cumulative let a replayed
        # pair increment support AGAIN once its hash expired (with the
        # key kept alive by other pairs), so a rule could cross
        # min_support with fewer than min_support DISTINCT pairs. The
        # set needs no pruning for state size — before crossing it holds
        # at most min_support - 1 hashes, and emission clears it; the
        # key-level dormancy bound is the EventTimeTimeout above.
        state.update((cnt, emitted, hs, ts))
        if rows:
            state.setTimeoutTimestamp(rows[-1][0] + state_ttl_ms)
        yield pd.DataFrame(out, columns=["alpha", "beta", "support"])

    return mids.groupBy("alpha", "beta").applyInPandasWithState(
        miner,
        outputStructType=DUST_RULE_STREAM_SCHEMA,
        stateStructType=_DUST_RULE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def canonicalize_stream(
    urls: DataFrame,
    rules: tuple[tuple[str, str], ...],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming DUST canonicalization + admission (round 5, tenth wave):
    a live discovered-URL feed is rewritten to canonical form with the
    mined rule table (the CrawlConfig.dust_rules shape — config-scale,
    shipped as a literal array, MAP-ONLY and stateless per row, the SAME
    `rewrite_col` expression as the batch canonicalizer and the
    crawler's in-loop rewrite), then first-sight-wins per CANONICAL uri
    via `dropDuplicatesWithinWatermark` — an alias arriving after its
    canonical twin (or any other alias of the same family) within the
    watermark is dropped without a fetch. State is keyed by canonical
    uri and bounded by discovery-rate × watermark (the dedup_stream
    contract); an alias arriving later than the watermark re-admits,
    which for a fetch gate is a re-validation (the batch seen-set stays
    globally exact).

    Input stream schema: (uri string, event_time timestamp). Output:
    the admitted rows with their canonical uri."""
    from ..frontier.dust import rewrite_col

    canon = urls.withColumn(
        "canon_uri", rewrite_col(F.col("uri"), tuple(rules))
    )
    return (
        canon.withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["canon_uri"])
        .select("canon_uri", "uri", "event_time")
    )


def discovery_stream(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming sitemap discovery (round 4): sitemap documents arriving
    on a live ingest stream → first-seen seed rows (uri, lastmod,
    event_time). The sitemap parse (frontier/sitemaps.py) is MAP-ONLY —
    each document's <url> blocks explode independently, the same-host
    location constraint is a per-row filter — so the only stateful
    operator is the watermarked first-wins dedup on the discovered URL
    (`dropDuplicatesWithinWatermark`): state is bounded by discovery-rate
    × watermark, the same contract as dedup_stream. A URL re-announced
    after the watermark re-emits, which is correct for discovery (the
    frontier's seen set — bloom/cuckoo + anti-join — is the global
    dedup of record downstream).

    Input stream schema: (doc_id string, spans array<…>, event_time
    timestamp) — the spans web's shape plus ingest time."""
    from ..frontier.sitemaps import parse_sitemaps, texts_from_spans

    # the batch discovery path's OWN host/text derivation (host regex
    # included) — a re-spelled copy here drifted silently (review r5)
    texts = texts_from_spans(docs, passthrough=("event_time",))
    seeds = parse_sitemaps(texts, passthrough=("event_time",)).select(
        F.col("loc").alias("uri"), "lastmod", "event_time"
    )
    return seeds.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(
        ["uri"]
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


QUOTA_ADMIT_SCHEMA = "doc_id long, source string, rk int"
_QUOTA_STATE = "admitted int"


def source_quota_stream(docs: DataFrame, quota: int | None = None) -> DataFrame:
    """Streaming admission control: admit at most ``quota`` documents
    per source over the LIFETIME of the stream (the streaming sibling of
    ``sampling.source_quota``). State per source is a single admitted
    counter carried across micro-batches — O(1) per key, never a buffer.

    Within a micro-batch, candidates are admitted in the batch
    operator's exact priority order (ascending hash60(doc_id), then
    doc_id); across micro-batches admission is necessarily
    arrival-order — a stream cannot defer to a future higher-priority
    document. That is the inherent batch/stream semantic difference,
    and the cross-batch test pins it: with everything in one batch the
    result equals the batch operator's survivor set.

    Input stream schema: (doc_id long, source string). ``quota``
    defaults to ``sampling.QUOTA`` and the priority key is the shared
    ``hash60_py`` — the same primitive ``sampling._priority`` compiles
    to JVM-side — so batch and stream admission cannot drift apart.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from scrappy_spark.operators.sampling import QUOTA
    from scrappy_spark.operators.text import hash60_py

    if quota is None:
        quota = QUOTA

    def _h60(doc_id: int) -> int:
        return hash60_py(str(doc_id))

    def admit(key, pdfs, state):
        (source,) = key
        (admitted,) = state.get if state.exists else (0,)
        ids = []
        for pdf in pdfs:
            ids.extend(int(d) for d in pdf["doc_id"])
        ids.sort(key=lambda d: (_h60(d), d))
        out = []
        for doc_id in ids:
            if admitted >= quota:
                break
            admitted += 1
            out.append((doc_id, source, admitted))
        state.update((admitted,))
        yield pd.DataFrame(out, columns=["doc_id", "source", "rk"])

    return docs.groupBy("source").applyInPandasWithState(
        admit,
        outputStructType=QUOTA_ADMIT_SCHEMA,
        stateStructType=_QUOTA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PACK_STREAM_SCHEMA = (
    "doc_id long, shard int, n_tokens int, stream_off long, "
    "pack_id long, pack_off int"
)
_PACK_STATE = "next_off long"


def pack_stream(
    docs: DataFrame,
    seq_len: int | None = None,
    num_shards: int | None = None,
) -> DataFrame:
    """Streaming sequence-packing layout (the streaming sibling of
    ``packing.pack_sequences``): each shard's concatenated token stream
    grows monotonically across micro-batches, with a single next-offset
    counter as keyed state — O(1) per shard, never a buffer. Within a
    micro-batch documents are laid out in the batch operator's priority
    order (hash60, doc_id); across batches the layout is necessarily
    arrival-order (same inherent stream/batch difference as
    ``source_quota_stream``, pinned by the test: a single-batch stream
    reproduces the batch layout exactly).

    Input stream schema: (doc_id long, text string). Tokenization is
    the engine's whitespace contract (``tokens_col``), applied row-side.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from scrappy_spark.operators.packing import NUM_SHARDS, SEQ_LEN
    from scrappy_spark.operators.text import hash60_py, tokens_py

    if seq_len is None:
        seq_len = SEQ_LEN
    if num_shards is None:
        num_shards = NUM_SHARDS

    def layout(key, pdfs, state):
        (shard,) = key
        (next_off,) = state.get if state.exists else (0,)
        rows = []
        for pdf in pdfs:
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                rows.append((int(did), len(tokens_py(text or ""))))
        rows.sort(key=lambda r: (hash60_py(str(r[0])), r[0]))
        out = []
        for did, n in rows:
            out.append(
                (
                    did,
                    shard,
                    n,
                    next_off,
                    next_off // seq_len,
                    next_off % seq_len,
                )
            )
            next_off += n
        state.update((next_off,))
        yield pd.DataFrame(
            out,
            columns=[
                "doc_id", "shard", "n_tokens", "stream_off",
                "pack_id", "pack_off",
            ],
        )

    from scrappy_spark.operators.text import hash60_col

    sharded = docs.withColumn(
        "shard",
        (hash60_col(F.col("doc_id").cast("string")) % num_shards).cast("int"),
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        layout,
        outputStructType=PACK_STREAM_SCHEMA,
        stateStructType=_PACK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSIONIZE_STREAM_SCHEMA = (
    "event_id long, user_id long, ts_us long, session_idx long"
)
_SESSION_STATE = "last_ts_us long, session_idx long"


def sessionize_stream(events: DataFrame, gap_us: int | None = None) -> DataFrame:
    """Streaming gap sessionization — the streaming sibling of
    ``timeseries.sessionize`` with the same strict-``>`` gap contract
    (a gap of exactly ``gap_us`` stays in the session; +1 µs starts a
    new one). State per user is (last event time, session counter) —
    O(1) per key, carried across micro-batches, never a buffer.

    Within a micro-batch events are processed in the batch operator's
    exact (ts, event_id) order; across micro-batches the order is
    arrival order — the same inherent stream/batch difference
    ``source_quota_stream`` documents. When the stream delivers events
    in timestamp order (e.g. time-partitioned ingest files, the normal
    production shape), stream output equals the batch operator
    bit-for-bit, and the test pins exactly that: a two-batch split at
    the time midpoint reproduces the batch session map.

    Input stream schema: (event_id long, user_id long, ts
    timestamp_ntz). Output renders ts as epoch microseconds
    (``ts_us``) so no timezone coercion can sit between the stream and
    batch sides of the equality test.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from scrappy_spark.operators.timeseries import SESSION_GAP_US

    if gap_us is None:
        gap_us = SESSION_GAP_US

    def assign(key, pdfs, state):
        (user_id,) = key
        last, idx = state.get if state.exists else (-1, 0)
        rows = []
        for pdf in pdfs:
            for eid, t in zip(pdf["event_id"], pdf["ts"]):
                rows.append((int(eid), t.value // 1000))  # ns -> µs
        rows.sort(key=lambda r: (r[1], r[0]))
        out = []
        for eid, us in rows:
            if idx == 0 or us - last > gap_us:
                idx += 1
            last = us
            out.append((eid, int(user_id), us, idx))
        state.update((last, idx))
        yield pd.DataFrame(
            out, columns=["event_id", "user_id", "ts_us", "session_idx"]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        assign,
        outputStructType=SESSIONIZE_STREAM_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rollup_stream(events: DataFrame) -> DataFrame:
    """Streaming continuous aggregate — the hypertable story's other
    half: ``timeseries.events_rollup_hourly`` fed incrementally from a
    stream. Same bucket expression (``date_trunc('hour')``) and the
    same DECIMAL(18,2)-snapped exact money sum as the batch operator,
    so a finite stream's final state equals the batch rollup exactly
    (pinned by the stream-vs-batch test in complete output mode).

    ``n_users`` is intentionally absent: exact COUNT(DISTINCT) is not
    expressible as incremental streaming state without keeping the
    distinct set per group — callers that need it stream the KMV sketch
    instead (`operators.sketch`), which IS mergeable state. Columns
    (bucket, event_type, n_events, sum_value, min_value, max_value).
    """
    from ..operators.timeseries import _cents, hour_bucket

    return (
        events.groupBy(hour_bucket().alias("bucket"), "event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(_cents(F.col("value"))).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


RECRAWL_STREAM_SCHEMA = (
    "page_id long, n_fetches long, n_changes long, "
    "change_rate_ppm long, schedule string"
)
_RECRAWL_STATE = "last_fp long, n_fetches long, n_changes long, has_fp boolean"


def recrawl_stream(fetches: DataFrame) -> DataFrame:
    """Streaming recrawl scheduler — the live sibling of
    ``frontier.recrawl.recrawl_schedule``: each page's (last fingerprint,
    fetch count, change count) carries across micro-batches as O(1)
    state, and every batch a page appears in emits its UPDATED
    (n_fetches, n_changes, change_rate_ppm, schedule) row, so the
    frontier's scheduler always has the current tier without rescanning
    the fetch log. The LAST emitted row per page equals the batch
    operator over the full log (pinned by the cross-batch test); tier
    arithmetic is the shared ``recrawl.tier_ppm`` twin, so batch and
    stream cannot drift.

    Within a micro-batch, fetches process in (ts, fid) order — the same
    total order the batch kernel's window uses.

    Input stream schema: (page_id long, ts long, fid long, fp long).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from scrappy_spark.frontier.recrawl import tier_ppm

    def upd(key, pdfs, state):
        (page,) = key
        last_fp, nf, nc, has = (
            state.get if state.exists else (0, 0, 0, False)
        )
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(t), int(i), int(f))
                for t, i, f in zip(pdf["ts"], pdf["fid"], pdf["fp"])
            )
        rows.sort()
        for _, _, fp in rows:
            if has and fp != last_fp:
                nc += 1
            nf += 1
            last_fp, has = fp, True
        state.update((last_fp, nf, nc, has))
        ppm, tier = tier_ppm(nf, nc)
        yield pd.DataFrame(
            [(int(page), nf, nc, ppm, tier)],
            columns=[
                "page_id",
                "n_fetches",
                "n_changes",
                "change_rate_ppm",
                "schedule",
            ],
        )

    return fetches.groupBy("page_id").applyInPandasWithState(
        upd,
        outputStructType=RECRAWL_STREAM_SCHEMA,
        stateStructType=_RECRAWL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BUDGET_STREAM_SCHEMA = (
    "host string, n_pops long, n_new long, yield_ppm long, next_budget long"
)
_BUDGET_STATE = "n_pops long, n_new long"


def budget_stream(telemetry: DataFrame) -> DataFrame:
    """Streaming adaptive-budget scheduler — the live sibling of
    ``frontier.yieldstats.adaptive_budget``: each host's cumulative
    (pops, new-URL) totals carry across micro-batches as O(1) state, and
    every batch a host appears in emits its UPDATED
    (n_pops, n_new, yield_ppm, next_budget) row — the frontier's pop
    always reads the current budget without rescanning the telemetry
    log. The LAST emitted row per host equals the batch operator over
    the full log (pinned by the cross-batch test); the clamp arithmetic
    is the shared ``yieldstats.budget_for`` twin, so batch and stream
    cannot drift. State is two longs per host — bounded by host count,
    not traffic.

    Input stream schema: (host string, n_pops long, n_new long).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from scrappy_spark.frontier.yieldstats import budget_for

    def upd(key, pdfs, state):
        (host,) = key
        np_, nn = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            # fail loud on NULL telemetry like the batch twin (pandas
            # sum would silently skip NaN → an invented budget)
            if pdf["n_pops"].isna().any() or pdf["n_new"].isna().any():
                raise ValueError(
                    "budget_stream: NULL telemetry (n_pops/n_new) "
                    f"for host {host!r}"
                )
            np_ += int(pdf["n_pops"].sum())
            nn += int(pdf["n_new"].sum())
        state.update((np_, nn))
        ppm, budget = budget_for(np_, nn)
        yield pd.DataFrame(
            [(host, np_, nn, ppm, budget)],
            columns=["host", "n_pops", "n_new", "yield_ppm", "next_budget"],
        )

    return telemetry.groupBy("host").applyInPandasWithState(
        upd,
        outputStructType=BUDGET_STREAM_SCHEMA,
        stateStructType=_BUDGET_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def admission_stream(
    docs: DataFrame, w_total: int, n_target: int | None = None
) -> DataFrame:
    """Streaming PPS admission control (round 5): the live-ingest twin of
    ``curation.pps_sample`` — admit each arriving document with
    probability proportional to its token weight, deciding from the
    SAME exact integer predicate (``curation.pps_admit_col``, the single
    shared definition) so batch and stream admit bit-identical sets.

    The calibrated corpus total ``w_total`` is a PARAMETER, not derived
    state: an admission controller runs against a rate calibrated from
    the previous batch profile (exactly how the adaptive-budget
    scheduler consumes yieldstats output), which is what makes this
    operator STATELESS — a pure map over the stream, no watermark, no
    state store, composable into any ingest query at any rate. The
    trade-off is explicit: admission probabilities drift as the live
    corpus drifts from the calibration total, until the next
    re-calibration swaps the literal (re-deploy, not re-shuffle).

    Input stream schema: (doc_id string|long, text string, ...);
    passthrough of every input column plus the computed n_tokens.
    """
    from scrappy_spark.operators.curation import PPS_N_TARGET, pps_admit_col
    from scrappy_spark.operators.text import tokens_col

    n = PPS_N_TARGET if n_target is None else n_target
    return (
        docs.withColumn(
            "n_tokens", F.size(tokens_col(F.col("text"))).cast("long")
        )
        .where(
            pps_admit_col(
                F.col("doc_id"),
                F.col("n_tokens"),
                F.lit(int(w_total)).cast("long"),
                n,
            )
        )
    )


MIRROR_PAIR_STREAM_SCHEMA = "doc_a string, doc_b string, media_ref string"
_MIRROR_REF_STATE = "ids array<string>, ts array<long>"


def mirror_candidates_stream(
    spans: DataFrame,
    max_df: int | None = None,
    ttl_ms: int = 3_600_000,
) -> DataFrame:
    """Streaming mirror-CANDIDATE feed (round 5): the live-ingest side of
    `interleaved.media_mirror` — each arriving media span probes
    per-media_ref keyed state (``applyInPandasWithState``) and emits
    (doc_a, doc_b, media_ref) co-citations against the documents
    previously seen citing that ref. The candidate-generate / verify
    split: the stream feeds pairs; the batch kernel (media_mirror /
    media_mirror_delta) confirms with exact Jaccard over full rare-ref
    sets, exactly as simhash_pairs_stream feeds candidates that
    downstream consumers distinct/verify.

    Stock-media contract shared with the batch kernel: once a ref has
    been cited by more than ``max_df`` distinct documents WITHIN the TTL
    window, it is saturated and emits nothing — the streaming analog of
    the batch df cap (which both de-noises and bounds fan-out). A
    saturated ref resumes when TTL eviction drops it back under the cap:
    df is evaluated over the retention window, the only sound reading
    of a document-frequency cap on an unbounded stream. Pairs emitted
    BEFORE saturation cannot be retracted — the batch verify drops them.

    State contract (the 100 TB/day shape): each ref retains at most
    max_df+1 (doc_id, event_time) entries — the +1 witnesses saturation
    — evicted by EVENT time (the ADVICE-r4 discipline: sort by (ts, id)
    before the cap so late arrivals can't evict newer-by-event-time
    entries). State is bounded by refs × (max_df+1), never corpus size.

    Input stream schema:
    (doc_id string, kind string, media_ref string, event_time timestamp).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.interleaved import MEDIA_KINDS, MIRROR_MAX_DF

    # default to the batch cap so retuning interleaved.py cannot drift
    # the stream's stock contract away from the batch one
    if max_df is None:
        max_df = MIRROR_MAX_DF

    media = (
        spans.where(
            F.col("kind").isin(*MEDIA_KINDS) & F.col("media_ref").isNotNull()
        )
        .withColumn(
            "ems", F.unix_millis(F.col("event_time").cast("timestamp"))
        )
        .select("doc_id", "media_ref", "ems")
    )

    def probe(key, pdfs, state):
        ids, ts = state.get if state.exists else ([], [])
        ids, ts = list(ids), list(ts)
        rows = []
        out = []
        ref = key[0]
        for pdf in pdfs:
            for did, ems in zip(pdf["doc_id"], pdf["ems"]):
                rows.append((int(ems), str(did)))
        rows.sort()  # deterministic processing order within the batch
        for ems, did in rows:
            # TTL eviction first, by event time (late rows sit at the
            # list tail despite being oldest — sort before any cut)
            horizon = ems - ttl_ms
            live = [i for i, t in enumerate(ts) if t >= horizon]
            live.sort(key=lambda i: (ts[i], ids[i]))
            ids = [ids[i] for i in live]
            ts = [ts[i] for i in live]
            if did in ids:
                # (doc, ref) distinct — the batch contract — but the
                # re-citation REFRESHES the doc's event time (review
                # r5): without this a continuously-cited doc ages out
                # from its FIRST citation and in-window pairs are
                # silently missed, contradicting 'df is evaluated over
                # the retention window'; same staleness made saturation
                # resume early
                i = ids.index(did)
                ts[i] = max(ts[i], ems)
                continue
            if len(ids) < max_df:
                for oid in ids:
                    a, b = (did, oid) if did < oid else (oid, did)
                    out.append((a, b, ref))
            # append regardless (saturation must be witnessable), then
            # keep the max_df+1 most recent by event time
            ids.append(did)
            ts.append(ems)
            if len(ids) > max_df + 1:
                keep = sorted(
                    range(len(ids)), key=lambda i: (ts[i], ids[i])
                )[-(max_df + 1):]
                ids = [ids[i] for i in keep]
                ts = [ts[i] for i in keep]
        state.update((ids, ts))
        yield pd.DataFrame(out, columns=["doc_a", "doc_b", "media_ref"])

    return media.groupBy("media_ref").applyInPandasWithState(
        probe,
        outputStructType=MIRROR_PAIR_STREAM_SCHEMA,
        stateStructType=_MIRROR_REF_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
