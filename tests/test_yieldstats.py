"""Kernel tests for frontier telemetry: adaptive yield budgets and the
URL discovery curve (frontier/yieldstats.py)."""

from pyspark.sql import functions as F  # noqa: F401

from scrappy_spark.frontier.yieldstats import adaptive_budget, discovery_curve


def test_adaptive_budget_clamps_and_exact_mid(spark):
    # h_lo: zero yield → floor; h_hi: 100 new / 2 pops → 400 → ceiling;
    # h_mid: 6 new / 4 pops → 8*6//4 = 12 exactly; telemetry rows for one
    # host aggregate across rounds before the ratio
    log = spark.createDataFrame(
        [
            ("h_lo", 5, 0),
            ("h_lo", 3, 0),
            ("h_hi", 1, 60),
            ("h_hi", 1, 40),
            ("h_mid", 2, 1),
            ("h_mid", 2, 5),
        ],
        "host string, n_pops int, n_new int",
    )
    got = {
        r["host"]: (r["n_pops"], r["n_new"], r["yield_ppm"], r["next_budget"])
        for r in adaptive_budget(log, base=8, lo=1, hi=32).collect()
    }
    assert got["h_lo"] == (8, 0, 0, 1)
    assert got["h_hi"] == (2, 100, 50_000_000, 32)
    assert got["h_mid"] == (4, 6, 1_500_000, 12)


def test_discovery_curve_counts_first_sightings_only(spark):
    # u1 seen rounds 1,2,3 → counts once at 1; u2 first at 2; u3 first
    # at 2; u4 first at 4 — round 3 has sightings but no FIRST sighting,
    # so it does not appear; cumulative is a running total
    log = spark.createDataFrame(
        [
            ("u1", 1), ("u1", 2), ("u1", 3),
            ("u2", 2), ("u3", 2), ("u3", 3),
            ("u4", 4),
        ],
        "url string, round int",
    )
    got = {
        r["round"]: (r["n_new"], r["n_cumulative"])
        for r in discovery_curve(log).collect()
    }
    assert got == {1: (1, 1), 2: (2, 3), 4: (1, 4)}


def test_yieldstats_plan_shapes(spark, sf_dir):
    """adaptive_budget is ONE partial-agg hash Exchange; discovery_curve
    never plans an Exchange SinglePartition (the cumulative sum is a
    broadcast triangular join over #rounds rows, not a global-order
    window) and no sort-merge/cartesian anywhere."""
    from scrappy_spark.frontier.yieldstats import (
        adaptive_budget_query,
        discovery_curve_query,
    )

    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    p = plan_of(adaptive_budget_query(spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p[:1500]
    for plan in (p, plan_of(discovery_curve_query(spark, sf_dir))):
        assert "Exchange SinglePartition" not in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan


def test_adaptive_budget_null_telemetry_fails_loud(spark):
    """NULL pops/new sums must raise, not ride the NULL through the DIV
    into a clamp-resurrected floor budget (review r5)."""
    import pytest

    log = spark.createDataFrame(
        [("h1", 2, None)], "host string, n_pops int, n_new int"
    )
    with pytest.raises(Exception, match="NULL telemetry"):
        adaptive_budget(log).collect()


def test_adaptive_budget_mixed_null_telemetry_fails_loud(spark):
    """A host with SOME NULL rows must raise too: F.sum skips NULLs, so a
    post-aggregation check only fires when ALL of a host's rows are NULL
    — the check is per-row, before the sums (review r5, second pass)."""
    import pytest

    log = spark.createDataFrame(
        [("h1", None, 10), ("h1", 5, 7)], "host string, n_pops int, n_new int"
    )
    with pytest.raises(Exception, match="NULL telemetry"):
        adaptive_budget(log).collect()
