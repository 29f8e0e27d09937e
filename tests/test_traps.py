"""Spider-trap detection: URL-template cardinality units — flagging,
non-flagging, duplicate immunity, and the frontier-compatible host key
(port stripped, path-less query URLs template correctly)."""

from scrappy_spark.frontier import traps as T


def test_trap_stats_units(spark):
    """URL-template trap signal: a calendar family and a session-id
    family flag; a small catalog and singleton pages do not."""
    uris = (
        [f"http://cal.example.com/d/2026-01-{i:02d}" for i in range(1, 21)]
        + [f"http://sid.example.com/p?sid={i}&x=7" for i in range(20)]
        + [f"http://ok.example.com/a/{i}" for i in range(3)]
        + ["http://one.example.com/about"]
    )
    df = spark.createDataFrame([(u,) for u in uris], "uri string")
    got = {r["host"]: r for r in T.trap_stats(df, threshold=15).collect()}
    assert got["cal.example.com"]["trap"] and got["cal.example.com"][
        "max_template_urls"
    ] == 20
    # query VALUES fold (=V) -> all sids share one template
    assert got["sid.example.com"]["trap"]
    assert got["sid.example.com"]["n_templates"] == 1
    assert not got["ok.example.com"]["trap"]  # 3 urls, one template
    assert not got["one.example.com"]["trap"]
    # duplicates don't inflate the DISTINCT-url count
    dup = spark.createDataFrame(
        [("http://h/x1",)] * 30, "uri string"
    )
    assert not T.trap_stats(dup, threshold=15).collect()[0]["trap"]


def test_host_key_matches_frontier_form_and_pathless_queries(spark):
    """The host key must be the frontier's host_col form (port stripped)
    so trap output joins the frontier / keys host_budgets; a canonical
    path-less query URL keeps its query in the TEMPLATE, not the host —
    that is the session-id family itself."""
    from scrappy_spark.urlnorm import host_of

    uris = [f"http://p.example.com:8080/cal/2026-01-{i:02d}" for i in range(1, 21)]
    uris += [f"http://q.example.com?sid={i}" for i in range(20)]
    df = spark.createDataFrame([(u,) for u in uris], "uri string")
    got = {r["host"]: r for r in T.trap_stats(df, threshold=15).collect()}
    # port stripped, exactly like host_of/host_col
    assert set(got) == {"p.example.com", "q.example.com"}
    assert got["p.example.com"]["trap"]
    assert host_of(uris[0]) == "p.example.com"
    # all 20 sid URLs collapse into ONE '?sid=V' template on one host
    assert got["q.example.com"]["n_templates"] == 1
    assert got["q.example.com"]["trap"]
