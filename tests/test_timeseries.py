"""As-of join, sessionization, time-bucket rollup, banded range join."""

import datetime as dt

import pytest
from decimal import Decimal

from pyspark.sql import Row
from pyspark.sql import functions as F

from scrappy_spark.operators import timeseries as ts_ops


def _t(m, s=0, us=0):
    return dt.datetime(2024, 1, 1, 0, m, s, us)


# ------------------------------------------------------------ asof_join


def test_asof_join_tiny_exact(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_t(0), tag="a"),   # before any build row -> null
            Row(k=1, ts=_t(5), tag="b"),   # equal ts -> inclusive match p5
            Row(k=1, ts=_t(7), tag="c"),   # between -> p5
            Row(k=1, ts=_t(20), tag="d"),  # after both -> p10
            Row(k=2, ts=_t(9), tag="e"),   # other key, no build rows -> null
        ]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=_t(5), v=50.0), Row(k=1, ts=_t(10), v=100.0)]
    )
    got = {
        r["tag"]: (r["pv"], r["pts"])
        for r in ts_ops.asof_join(
            left, right, on="k", ts="ts", right_cols={"pv": "v", "pts": "ts"}
        ).collect()
    }
    assert got == {
        "a": (None, None),
        "b": (50.0, _t(5)),
        "c": (50.0, _t(5)),
        "d": (100.0, _t(10)),
        "e": (None, None),
    }


def test_asof_join_duplicate_build_key_fails_loud(spark):
    """ADVICE r4 regression: a build side with two rows at the same
    (on, ts) must raise (the fill would otherwise be partition-sort-
    dependent), and check_unique=False restores the unchecked path for
    callers that just deduped."""
    left = spark.createDataFrame([Row(k=1, ts=_t(7), tag="a")])
    right = spark.createDataFrame(
        [Row(k=1, ts=_t(5), v=50.0), Row(k=1, ts=_t(5), v=99.0)]
    )
    with pytest.raises(ValueError, match="precondition violated"):
        ts_ops.asof_join(left, right, on="k", ts="ts", right_cols={"pv": "v"})
    # opt-out path still runs (result is one of the two candidates)
    row = ts_ops.asof_join(
        left, right, on="k", ts="ts", right_cols={"pv": "v"},
        check_unique=False,
    ).collect()[0]
    assert row["pv"] in (50.0, 99.0)


def test_asof_join_plan_has_no_theta_join(spark, sf_dir):
    plan = (
        ts_ops.events_asof_last_purchase(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert "Window" in plan


def test_asof_join_matches_naive_per_user(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    # naive python mirror with the same (user_id, ts) build dedup
    purchases = {}
    for r in ev:
        if r["event_type"] == "purchase":
            key = (r["user_id"], r["ts"])
            cur = purchases.get(key)
            cand = (r["event_id"], r["value"])
            purchases[key] = max(cur, cand) if cur else cand
    by_user = {}
    for (u, t), (_, v) in purchases.items():
        by_user.setdefault(u, []).append((t, v))
    for lst in by_user.values():
        lst.sort()
    sentinel = (dt.datetime(1970, 1, 1), -1.0)  # driver-entry no-match marker
    want = {}
    for r in ev:
        best = sentinel
        for t, v in by_user.get(r["user_id"], []):
            if t <= r["ts"]:
                best = (t, v)
            else:
                break
        want[r["event_id"]] = best
    got = {
        r["event_id"]: (r["last_purchase_ts"], r["last_purchase_value"])
        for r in ts_ops.events_asof_last_purchase(spark, sf_dir).collect()
    }
    assert got == want
    assert any(v != sentinel for v in got.values())  # non-vacuous


# ----------------------------------------------------------- sessionize


def test_sessionize_gap_boundaries(spark):
    rows = [
        Row(user_id=1, event_id=0, ts=_t(0)),
        Row(user_id=1, event_id=1, ts=_t(30)),          # gap == 30m: same session
        Row(user_id=1, event_id=2, ts=_t(59, us=1)),    # 29m59.000001s later: same
        Row(user_id=2, event_id=3, ts=_t(0)),
        Row(user_id=2, event_id=4, ts=_t(30, 0, 1)),    # 30m + 1us: NEW session
    ]
    got = {
        r["event_id"]: r["session_idx"]
        for r in ts_ops.sessionize(spark.createDataFrame(rows)).collect()
    }
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 4: 2}


def test_sessionize_rollup_exact_decimal(spark, sf_dir):
    out = ts_ops.events_sessionize(spark, sf_dir)
    rows = out.collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    total = sum(Decimal(str(round(r["value"], 2))) for r in ev)
    # sum_value is the exact decimal rendered to double per session; the
    # cross-session float re-sum here is the only inexact step
    assert abs(sum(r["sum_value"] for r in rows) - float(total)) < 1e-6
    assert sum(r["n_events"] for r in rows) == len(ev)
    assert any(r["n_events"] > 1 for r in rows)  # bursts exist in testdata
    assert all(r["session_start"] <= r["session_end"] for r in rows)


# -------------------------------------------------------------- rollup


def test_rollup_hourly_conserves_and_buckets(spark, sf_dir):
    out = ts_ops.events_rollup_hourly(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert sum(r["n_events"] for r in out) == ev.count()
    assert all(
        r["bucket"].minute == 0 and r["bucket"].second == 0 for r in out
    )
    # spot-check one bucket against a direct filter
    pick = max(out, key=lambda r: r["n_events"])
    lo = pick["bucket"]
    hi = lo + dt.timedelta(hours=1)
    direct = (
        ev.where(
            (F.col("ts") >= F.lit(lo))
            & (F.col("ts") < F.lit(hi))
            & (F.col("event_type") == pick["event_type"])
        )
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("u"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()[0]
    )
    assert (direct["n"], direct["u"]) == (pick["n_events"], pick["n_users"])
    assert (direct["mn"], direct["mx"]) == (pick["min_value"], pick["max_value"])


# ----------------------------------------------------------- range join


def test_range_join_equals_naive_inequality(spark, sf_dir):
    got = sorted(
        (r["win_id"], r["event_id"])
        for r in ts_ops.events_attribution_range_join(spark, sf_dir).collect()
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    wins = [
        (r["event_id"], r["user_id"], r["ts"], r["ts"] + dt.timedelta(hours=2))
        for r in ev
        if r["event_type"] == "signup"
    ]
    want = sorted(
        (wid, r["event_id"])
        for wid, u, lo, hi in wins
        for r in ev
        if r["user_id"] == u and lo <= r["ts"] <= hi
    )
    assert got == want
    # every signup matches at least itself (inclusive lower bound)
    assert len(got) >= len(wins) > 0


def test_range_join_plan_is_hash_equi_join(spark, sf_dir):
    plan = (
        ts_ops.events_attribution_range_join(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# ---------------------------------------------------- streaming sessions


def test_sessionize_stream_equals_batch(spark, tmp_path, sf_dir):
    """Single-batch stream == batch sessionize; a two-micro-batch split
    at the time midpoint (arrival order == timestamp order) also equals
    batch — the keyed (last_ts, session_idx) state carries across the
    boundary."""
    from scrappy_spark.streaming.state_stream import sessionize_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    batch = {
        r["event_id"]: (
            r["session_idx"],
            int(r["ts"].timestamp() * 1_000_000),
        )
        for r in ts_ops.sessionize(ev.withColumn("value", F.lit(0.0)))
        .select("event_id", "session_idx", "ts")
        .collect()
    }

    def run(src, max_files=None):
        reader = spark.readStream.schema(
            "event_id long, user_id long, ts timestamp_ntz"
        )
        if max_files:
            reader = reader.option("maxFilesPerTrigger", max_files)
        name = f"sess_live_{1 if max_files else 0}"
        q = (
            sessionize_stream(reader.parquet(src))
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["event_id"]: (r["session_idx"], r["ts_us"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }

    one = str(tmp_path / "one")
    ev.coalesce(1).write.parquet(one)
    assert run(one) == batch

    mid = ev.agg(F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.5)")).collect()[0][0]
    two = str(tmp_path / "two")
    early = ev.where(F.unix_micros(F.col("ts").cast("timestamp")) <= mid)
    late = ev.where(F.unix_micros(F.col("ts").cast("timestamp")) > mid)
    early.coalesce(1).write.parquet(two)
    late.coalesce(1).write.mode("append").parquet(two)
    assert run(two, max_files=1) == batch


# --------------------------------------------------------------- funnel


def test_funnel_matches_naive(spark, sf_dir):
    import datetime as dt2

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    want = {}
    for w in ev:
        if w["event_type"] != "signup":
            continue
        lo, hi = w["ts"], w["ts"] + dt2.timedelta(hours=2)
        n, conv = 0, 0
        for r in ev:
            if r["user_id"] == w["user_id"] and lo <= r["ts"] <= hi:
                n += 1
                if r["event_type"] == "purchase":
                    conv = 1
        want[w["event_id"]] = (n, conv)
    got = {
        r["win_id"]: (r["n_events_in_window"], r["converted"])
        for r in ts_ops.events_funnel(spark, sf_dir).collect()
    }
    assert got == want
    assert any(c for _, c in got.values())  # some conversions exist


def test_asof_join_null_payload_field_not_torn(spark):
    """A NULL field in the matched build row must stay NULL — not be
    back-filled from an older build row (the payload travels as one
    struct precisely to keep the fill atomic)."""
    left = spark.createDataFrame([Row(k=1, ts=_t(3), tag="x")])
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_t(1), a=5.0, b=9.0),
            Row(k=1, ts=_t(2), a=7.0, b=None),
        ]
    )
    row = ts_ops.asof_join(
        left, right, on="k", ts="ts", right_cols={"pa": "a", "pb": "b"}
    ).collect()[0]
    assert (row["pa"], row["pb"]) == (7.0, None)


def test_rollup_stream_equals_batch(spark, tmp_path, sf_dir):
    """A finite stream's complete-mode continuous aggregate equals the
    batch hourly rollup on the shared columns (n_users is batch-only —
    exact distinct counts are not incremental streaming state)."""
    from scrappy_spark.streaming.state_stream import rollup_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "roll")
    ev.where("event_id % 2 = 0").coalesce(1).write.parquet(src)
    ev.where("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    reader = spark.readStream.schema(
        "event_id long, user_id long, ts timestamp_ntz, "
        "event_type string, value double"
    ).option("maxFilesPerTrigger", 1)
    q = (
        rollup_stream(reader.parquet(src))
        .writeStream.format("memory")
        .queryName("roll_live")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket"], r["event_type"]): (
            r["n_events"], r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in spark.sql("SELECT * FROM roll_live").collect()
    }
    want = {
        (r["bucket"], r["event_type"]): (
            r["n_events"], r["sum_value"], r["min_value"], r["max_value"]
        )
        for r in ts_ops.events_rollup_hourly(spark, sf_dir).collect()
    }
    assert got == want
