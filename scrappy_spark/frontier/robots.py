"""robots.txt layer — parse, select, and enforce crawl rules at scale.

The reference fetches unconditionally (`blind_agent.rb:12-31` has no robots
handling); the north rule names "politeness, robots" as first-class frontier
concerns, so this layer implements the standard itself: an RFC 9309-subset
robots.txt parser over the interleaved-spans documents table, per-agent group
selection, a longest-match allow/disallow gate, and a deterministic
crawl-delay → per-host-budget translation that plugs into the crawler's
window-ranked politeness pop (F-2/F-11, `crawler.py`).

Everything is native Spark SQL expressions — split / posexplode / regexp /
window / groupBy; no per-row Python anywhere (input_hint mandate). Parsing is
embarrassingly parallel per host (a robots.txt is tiny), so the windows below
partition by host and never see skew: at 10^10-URL scale the robots table is
~one row per authority (millions of rows, bytes each), a broadcast-sized dim
next to the frontier.

Supported subset (documented here, mirrored exactly by the DuckDB oracle in
`__spark_entry__.py` and the pure-Python spec used by `oracle.py`):

  * line structure: LF or CRLF; ``#`` starts a comment (stripped first);
    fields are trimmed of spaces/tabs
  * directives (case-insensitive names): ``User-agent``, ``Allow``,
    ``Disallow``, ``Crawl-delay``; anything else (or a line with no colon)
    is ignored
  * a *group* is a run of consecutive ``User-agent`` lines plus the rule
    lines that follow; a ``User-agent`` line that follows a rule line starts
    a NEW group (RFC 9309 §2.2.1); rules before any ``User-agent`` line are
    invalid and dropped
  * agent selection per host: the groups naming ``agent`` exactly
    (case-insensitive) when any exist, else the ``*`` groups — the RFC's
    most-specific-group rule restricted to exact-token match
  * Allow/Disallow values are literal path prefixes: values must start with
    ``/``; empty values are dropped (an empty ``Disallow:`` means
    allow-everything, RFC 9309 §2.2.2); values containing ``*`` or ``$``
    (RFC wildcards) are dropped conservatively rather than matched literally
  * ``Crawl-delay`` (non-standard, ubiquitous): numeric seconds; the MIN
    across the selected groups wins
  * matching (the gate): among the host's rules whose prefix prefixes the
    URI path, the LONGEST wins; on a length tie Allow wins; no match ⇒
    allowed (RFC 9309 §2.2.2)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_AGENT = "scrappy"
_DIRECTIVES = ("user-agent", "allow", "disallow", "crawl-delay")
# explicit space/tab trim on BOTH sides (Spark trim() and DuckDB trim() only
# strip spaces — tabs are legal robots.txt whitespace)
_TRIM_RE = r"^[ \t]+|[ \t]+$"
_NUM_RE = r"^[0-9]+(\.[0-9]+)?$"


# ---------------------------------------------------------------------------
# pure-Python spec (no Spark) — the oracle side of the gate. oracle.py
# imports these; this module must therefore never import oracle/crawler.
# ---------------------------------------------------------------------------

def normalize_rules(rules) -> list[tuple[str, str, bool]]:
    """Accept legacy 2-tuples ``(host, prefix)`` (= disallow) and 3-tuples
    ``(host, prefix, allow)``; return uniform 3-tuples."""
    out = []
    for r in rules or ():
        if len(r) == 2:
            out.append((r[0], r[1], False))
        else:
            out.append((r[0], r[1], bool(r[2])))
    return out


def disallowed_py(host: str, path: str, rules) -> bool:
    """Longest-match gate, pure-Python spec. Tie → allow wins (True > False
    in the tuple max). No matching rule → allowed."""
    matches = [
        (len(p), a)
        for h, p, a in normalize_rules(rules)
        if h == host and path.startswith(p)
    ]
    return bool(matches) and not max(matches)[1]


# ---------------------------------------------------------------------------
# parsing (native expressions only)
# ---------------------------------------------------------------------------

def span_text_expr() -> Column:
    """Expression: a spans-web document's plain text — its ``text`` spans
    concatenated in offset order ('\\n'-joined), media/link spans ignored.
    Shared by the robots and sitemap layers (any per-document control file
    living IN the interleaved-spans web)."""
    ordered = F.array_sort(
        F.filter("spans", lambda s: s["kind"] == F.lit("text")),
        # array_sort on struct sorts by fields in order (kind first) — sort
        # by offset explicitly via a comparator
        lambda a, b: F.when(a["offset"] < b["offset"], -1)
        .when(a["offset"] > b["offset"], 1)
        .otherwise(0),
    )
    return F.concat_ws("\n", F.transform(ordered, lambda s: s["text"]))


def robots_texts_from_spans(docs: DataFrame) -> DataFrame:
    """(doc_id, spans) → (host, text) for the ``/robots.txt`` documents.

    The interleaved-spans table is the web (input_hint); a robots.txt is a
    document whose text spans are its lines/blocks, concatenated in offset
    order. Media/link spans inside a robots doc are ignored.

    Robots.txt is only defined at the authority root, so the filter anchors
    the path (``scheme://authority/robots.txt`` exactly — a page that merely
    ENDS with /robots.txt is not a robots file); if one host still yields
    several robots documents (http:// and https:// variants), ONE is chosen
    deterministically (min doc_id) — interleaving two documents through the
    parser's per-host windows would scramble group segmentation.
    """
    cand = docs.where(
        F.col("doc_id").rlike(r"^[^:/]+://[^/]+/robots\.txt$")
    ).select(
        F.regexp_extract("doc_id", r"^[^:]+://([^/]*)", 1).alias("host"),
        "doc_id",
        span_text_expr().alias("text"),
    )
    w = Window.partitionBy("host").orderBy("doc_id")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("host", "text")
    )


def _selected_directives(texts: DataFrame, agent: str) -> DataFrame:
    """(host, text) → the directive rows of the groups selected for
    ``agent``: (host, d, v) with d ∈ {allow, disallow, crawl-delay}.

    Group structure via two windows over the directive lines of each host:
    a User-agent line NOT preceded by another User-agent line starts a group
    (lag), group id = running count of group starts (sum), then group→UA-set
    aggregation and the exact-agent-else-star selection. All window
    partitions are single-host robots files — bounded and skew-free.
    """
    agent_lc = agent.lower()
    lines = texts.select(
        "host",
        F.posexplode(
            F.split(F.regexp_replace("text", "\r", ""), "\n")
        ).alias("pos", "raw"),
    )
    clean = F.regexp_replace(
        F.regexp_replace("raw", r"#.*$", ""), _TRIM_RE, ""
    )
    dirs = (
        lines.select(
            "host",
            "pos",
            F.lower(F.regexp_extract(clean, r"^([A-Za-z-]+)[ \t]*:", 1)).alias("d"),
            F.regexp_replace(
                F.regexp_extract(clean, r"^[A-Za-z-]+[ \t]*:(.*)$", 1),
                _TRIM_RE,
                "",
            ).alias("v"),
        )
        .where(F.col("d").isin(*_DIRECTIVES))
    )
    w = Window.partitionBy("host").orderBy("pos")
    g = dirs.withColumn(
        "gid",
        F.sum(
            F.when(
                (F.col("d") == "user-agent")
                & (F.coalesce(F.lag("d").over(w), F.lit("")) != "user-agent"),
                1,
            ).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    # g fans out THREE ways below (rule rows, per-group UA sets, per-host
    # exact-agent flags) — materialize the split/regex/window subtree once
    # instead of compiling it into every branch (3 scans + 5 exchanges
    # measured without this; the persist-before-fan-out discipline from
    # the banded-dedup layer). localCheckpoint also cuts the lineage.
    g = g.localCheckpoint(eager=True)
    uas = (
        g.where(F.col("d") == "user-agent")
        .groupBy("host", "gid")
        .agg(
            F.max((F.lower("v") == agent_lc).cast("int")).alias("has_agent"),
            F.max((F.col("v") == "*").cast("int")).alias("has_star"),
        )
    )
    host_exact = uas.groupBy("host").agg(
        F.max("has_agent").alias("any_exact")
    )
    return (
        g.where((F.col("d") != "user-agent") & (F.col("gid") >= 1))
        .join(uas, ["host", "gid"])
        .join(host_exact, "host")
        .where(
            F.when(F.col("any_exact") == 1, F.col("has_agent") == 1).otherwise(
                F.col("has_star") == 1
            )
        )
        .select("host", "d", "v")
    )


def parse_robots(texts: DataFrame, agent: str = DEFAULT_AGENT) -> DataFrame:
    """(host, text) → distinct (host, allow:boolean, prefix) rules selected
    for ``agent``. Values are validated per the module contract (must start
    with '/', no RFC wildcards)."""
    sel = _selected_directives(texts, agent)
    return (
        sel.where(
            F.col("d").isin("allow", "disallow")
            & F.col("v").startswith("/")
            & ~F.col("v").contains("*")
            & ~F.col("v").contains("$")
        )
        .select(
            "host",
            (F.col("d") == "allow").alias("allow"),
            F.col("v").alias("prefix"),
        )
        .distinct()
    )


def parse_crawl_delays(texts: DataFrame, agent: str = DEFAULT_AGENT) -> DataFrame:
    """(host, text) → (host, crawl_delay:double), min across selected
    groups, numeric values only."""
    sel = _selected_directives(texts, agent)
    return (
        sel.where((F.col("d") == "crawl-delay") & F.col("v").rlike(_NUM_RE))
        .groupBy("host")
        .agg(F.min(F.col("v").cast("double")).alias("crawl_delay"))
    )


# ---------------------------------------------------------------------------
# the gate (expression — zero joins, zero shuffles)
# ---------------------------------------------------------------------------

def authority_path_cols(uri_col: Column) -> tuple[Column, Column]:
    """(authority, path) match key for a URI column — full host[:port]
    authority (the reference keys robots state on the full authority,
    fragment.rb; an explicit non-default port is a DIFFERENT authority)
    and the authority-relative path, ``'/'`` when empty. The ONE spelling
    shared by :func:`gate` and the crawler's config-rules filter
    (review r5: a third copy lived in ``Crawler._robots_filter`` — a
    normalization fix applied to one copy would silently diverge the
    table-rules gate from the config-rules gate)."""
    authority = F.regexp_extract(uri_col, r"^[^:]+://([^/]*)", 1)
    path = F.regexp_extract(uri_col, r"^[^:]+://[^/]*(.*)$", 1)
    path = F.when(path == "", "/").otherwise(path)
    return authority, path


def _best_rule(matches: Column) -> Column:
    """Longest-match winner over an array of matched (p, a) rule structs:
    lexicographic struct max — longer prefix wins, tie → allow=true wins;
    NULL when the array is empty. Shared by :func:`disallow_expr` and
    :func:`gate` (review r5: previously spelled twice)."""
    return F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(F.length(r["p"]).alias("l"), r["a"].alias("a")),
        )
    )


def disallow_expr(authority: Column, path: Column, rules) -> Column:
    """Boolean column: is (authority, path) disallowed under ``rules``
    (normalized 3-tuples)? Longest-match, tie→allow, no-match→allowed —
    identical to :func:`disallowed_py`.

    Built as a literal rule array + ``filter``/``transform``/``array_max``,
    so the whole gate stays inside whole-stage codegen: no join, no
    broadcast variable, no shuffle. Config rule lists are small (they come
    from seeds/robots of the crawl's own host set); for a web-scale rules
    TABLE use the per-host grouped join in :func:`gate` instead.
    """
    norm = normalize_rules(rules)
    arr = F.array(
        *[
            F.struct(
                F.lit(h).alias("h"), F.lit(p).alias("p"), F.lit(a).alias("a")
            )
            for h, p, a in norm
        ]
    )
    matches = F.filter(
        arr, lambda r: (authority == r["h"]) & path.startswith(r["p"])
    )
    best = _best_rule(matches)
    return best.isNotNull() & ~best["a"]


def gate(df: DataFrame, uri_col: str, rules_df: DataFrame) -> DataFrame:
    """Scale path: drop rows of ``df`` whose ``uri_col`` is disallowed by a
    rules TABLE (host, allow, prefix) too large for a literal array.

    One broadcast-able aggregation groups each host's rules into an array,
    an equi-join on authority attaches it (hash-partition-friendly, no
    theta-join), and the same longest-match expression decides. Hosts with
    no rules pass through (left join, null array ⇒ allowed).

    Helper columns are collision-proofed (ADVICE r4): their names are
    derived from the caller's schema, so a frontier table that already
    carries ``_r_host``/``_r_rules`` is joined and restored intact rather
    than broken by the join or silently dropped at the end.
    """
    taken = set(df.columns)
    hcol, rcol = "_r_host", "_r_rules"
    while hcol in taken or rcol in taken:
        hcol, rcol = hcol + "_", rcol + "_"
    per_host = F.broadcast(
        rules_df.groupBy(F.col("host").alias(hcol)).agg(
            F.collect_list(
                F.struct(F.col("prefix").alias("p"), F.col("allow").alias("a"))
            ).alias(rcol)
        )
    )
    authority, path = authority_path_cols(F.col(uri_col))
    matches = F.filter(
        F.col(rcol), lambda r: path.startswith(r["p"])
    )
    best = _best_rule(matches)
    return (
        df.join(per_host, authority == F.col(hcol), "left")
        .where(F.col(rcol).isNull() | best.isNull() | best["a"])
        .drop(hcol, rcol)
    )


# ---------------------------------------------------------------------------
# driver-contract queries: a synthetic robots corpus derived
# DETERMINISTICALLY from the documents table (doc_id, source), so the parser
# and the gate are value-oracled against a full DuckDB mirror of the same
# construction + parse (oracle strings live in __spark_entry__.py). Line
# type cycles with floor(doc_id/20) % 8 — doc_ids within a source are
# congruent mod 20 in the generator, so a doc_id % 8 selector would give
# each host only two line types; the /20 divisor walks all eight.
# ---------------------------------------------------------------------------

def synth_robots_texts(spark, sf_dir: str) -> DataFrame:
    """(host, text) robots corpus: host = source, one directive line per
    document (ordered by doc_id), covering grouping (consecutive UA lines,
    UA-after-rule group breaks), agent/star/other selection, case folding,
    comments, invalid values, RFC wildcards, and crawl-delays."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    t = F.floor(d / 20) % 8
    dig = (d % 7).cast("string")
    line = (
        F.when(
            t == 0,
            F.concat(
                F.lit("User-agent: "),
                F.when(d % 3 == 0, F.lit("*"))
                .when(d % 3 == 1, F.lit("scrappy"))
                .otherwise(F.lit("otherbot")),
            ),
        )
        .when(t == 1, F.concat(F.lit("Disallow: /p"), dig))
        .when(t == 2, F.concat(F.lit("Allow: /p"), dig, F.lit("/ok")))
        .when(
            t == 3,
            F.concat(F.lit("Crawl-delay: "), (1 + d % 5).cast("string")),
        )
        .when(
            t == 4,
            F.concat(
                F.lit("User-Agent: "),
                F.when(d % 2 == 0, F.lit("SCRAPPY")).otherwise(F.lit("*")),
            ),
        )
        .when(t == 5, F.concat(F.lit("Disallow: bad"), dig))
        .when(t == 6, F.lit("# c"))
        .otherwise(F.lit("Disallow: /w*"))
    )
    lines = docs.select(F.col("source").alias("host"), "doc_id", line.alias("line"))
    ordered = F.array_sort(F.collect_list(F.struct("doc_id", "line")))
    return lines.groupBy("host").agg(
        F.concat_ws("\n", F.transform(ordered, lambda x: x["line"])).alias("text")
    )


def parse_rules_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: parse the synthetic corpus for agent 'scrappy' →
    (host, allow, prefix)."""
    return parse_robots(synth_robots_texts(spark, sf_dir), agent=DEFAULT_AGENT)


def crawl_delays_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: (host, crawl_delay) minima for agent 'scrappy'."""
    return parse_crawl_delays(
        synth_robots_texts(spark, sf_dir), agent=DEFAULT_AGENT
    )


def gate_query(spark, sf_dir: str) -> DataFrame:
    """Driver entry: longest-match gate over synthetic URIs (one per
    document; paths hit disallowed prefixes, Allow-override subtrees, and
    unruled paths) against the parsed rules table → allowed (uri) rows."""
    rules = parse_robots(synth_robots_texts(spark, sf_dir), agent=DEFAULT_AGENT)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    dig = (d % 7).cast("string")
    ds = d.cast("string")
    path = (
        F.when(d % 3 == 0, F.concat(F.lit("/p"), dig, F.lit("/x"), ds))
        .when(d % 3 == 1, F.concat(F.lit("/p"), dig, F.lit("/ok/y"), ds))
        .otherwise(F.concat(F.lit("/q"), ds))
    )
    uris = docs.select(
        F.concat(F.lit("http://"), F.col("source"), path).alias("uri")
    )
    return gate(uris, "uri", rules)


# ---------------------------------------------------------------------------
# driver helpers — feed parse output into CrawlConfig
# ---------------------------------------------------------------------------

def rules_tuples(rules_df: DataFrame) -> tuple[tuple[str, str, bool], ...]:
    """Collect a parsed rules DataFrame into the CrawlConfig.robots shape
    (sorted for determinism). Rules are config-scale here — one crawl's
    host set — so the collect is bounded by design."""
    rows = rules_df.select("host", "prefix", "allow").collect()
    return tuple(sorted((r["host"], r["prefix"], bool(r["allow"])) for r in rows))


def delays_to_budgets(
    delays_df: DataFrame,
    round_seconds: float = 60.0,
    base_budget: int | None = None,
) -> tuple[tuple[str, int], ...]:
    """Crawl-delay → per-host per-round budget, deterministically.

    A level-synchronized round models ``round_seconds`` of wall clock; a
    delay of d seconds admits ⌊round_seconds/d⌋ fetches per round. The
    floor is 1 (liveness: a host with a huge delay still progresses one
    URL per round — documented divergence from wall-clock enforcement,
    which live fetchers additionally honor via politeness_delay_ms). A
    ``base_budget`` caps the translated budgets.

    ``Crawl-delay: 0`` (valid, means "no delay") translates to NO override
    — the base budget applies. Keys are normalized to the frontier's
    ``host`` column form (port stripped, ``urlnorm.host_of``) — the parser
    keys on the full authority, but budget overrides attach to the pop's
    host partitioning; if two authorities of one host carry different
    delays the SMALLEST budget wins (most conservative).
    """
    rows = delays_df.select("host", "crawl_delay").collect()
    out: dict[str, int] = {}
    for r in rows:
        d = float(r["crawl_delay"])
        if d <= 0:
            continue  # no delay -> unbudgeted (base applies)
        b = max(1, int(round_seconds // d))
        if base_budget is not None:
            b = min(b, base_budget)
        host = r["host"].split(":", 1)[0]
        out[host] = min(b, out.get(host, b))
    return tuple(sorted(out.items()))
