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


def test_value_fold_is_query_only(spark):
    """Review r5: the =V fold must not swallow path structure. A '='
    inside a path segment (matrix params) previously matched '=[^&#]*'
    across '/' and collapsed 20 structurally distinct paths into one
    template, falsely flagging the host; query values (including values
    containing '/') still fold, and fragments are not a template axis."""
    import string

    tags = [a + b for a in string.ascii_lowercase[:5] for b in string.ascii_lowercase[:4]]
    # matrix-'=' paths: 20 distinct non-digit path tails on one host
    matrix = [f"http://m.example.com/filter=red/sec-{t}" for t in tags]
    # query values containing '/': all 20 fold into ONE '?next=V' template
    slashy = [f"http://n.example.com/go?next=/p/{t}" for t in tags]
    df = spark.createDataFrame([(u,) for u in matrix + slashy], "uri string")
    got = {r["host"]: r for r in T.trap_stats(df, threshold=15).collect()}
    assert not got["m.example.com"]["trap"]
    assert got["m.example.com"]["n_templates"] == 20
    assert got["n.example.com"]["trap"]
    assert got["n.example.com"]["n_templates"] == 1
    # fragments are client-side — not part of the URL-space template
    frag = spark.createDataFrame(
        [("http://f.example.com/a#x1",), ("http://f.example.com/a#x2",)],
        "uri string",
    )
    f = T.trap_stats(frag, threshold=15).collect()[0]
    assert f["n_templates"] == 1 and f["n_urls"] == 2
