"""Relational analogues of the crawl-engine operators (SURVEY.md §2).

Each function implements one reference operator's dataflow shape on the
driver's TPC-H-ish tables, named `<op-id>_<name>`; `oracle_sql` strings
live in __spark_entry__.py. These run as real queries()/oracle_sql()
entries so the driver's DuckDB cross-check validates operator semantics
(row counts + schema + value hashes) every round.

Scale notes: anti-joins broadcast the small side; global windows are only
used where the reference semantics are global (min-max normalize) — at
cluster scale those become two-pass agg+join, which is how x2 is written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def f2_ranked_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-2/F-11 window-ranked politeness pop (map_reduce.rb:17-30 pop +
    the north rule's budgeted priority queue), exercising the REAL kernel
    (frontier.crawler.ranked_pop): a synthetic frontier snapshot derived
    from documents (uri/host/seq/depth), ranked by priority_expr='depth'
    (shallow-first) then seq, base budget 3 with per-host literal-map
    overrides (src0→1, src1→5). Returns the popped rows."""
    from ..frontier.crawler import ranked_pop

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    frontier = docs.select(
        F.concat(F.lit("http://"), "source", F.lit("/f"), d.cast("string")).alias(
            "uri"
        ),
        F.col("source").alias("host"),
        d.alias("seq"),
        (d % 4).cast("int").alias("depth"),
    )
    _, popped, _ = ranked_pop(
        frontier, 3, (("src0", 1), ("src1", 5)), priority_expr="depth"
    )
    return popped


def f3_seen_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-3 seen-set dedup (map_reduce.rb:40-42) ↔ left-anti join:
    customers with no 'F'-status order. The "seen" side is a filtered
    subset, so the result is non-empty on the driver testdata (the r2
    variant — customers that never ordered — returned 0 rows on both
    sides, a vacuous oracle; VERDICT r2 #2)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    seen = orders.where(F.col("o_orderstatus") == "F")
    return customer.join(
        seen, customer.c_custkey == seen.o_custkey, "left_anti"
    ).select("c_custkey")


def f4_firstwins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-4 intra-batch first-wins uniq (agent.rb:80-82) ↔ row_number()==1
    per key with a stable total order."""
    li = _t(spark, sf_dir, "lineitem")
    # total order: (l_orderkey, l_linenumber) alone is not unique at
    # sf>=0.01, so tie-break on the remaining output columns
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("l_orderkey", "l_partkey", "l_linenumber")
    )


def f13_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-13 triple merge reduce (agent.rb:102-103) ↔ UNION DISTINCT."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.select(F.col("o_custkey").alias("k"))
        .union(customer.select(F.col("c_custkey").alias("k")))
        .distinct()
    )


def f14_clean_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-14 output clean (agent.rb:160-162) ↔ NOT-IN filter."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(~F.col("l_returnflag").isin("A", "R")).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


def s9_recency_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-9 repository recency read (repository.rb:6-12) ↔ timestamp-window
    filter; the predicate partition-prunes on a time-partitioned table."""
    ev = _t(spark, sf_dir, "events")
    horizon = ev.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("h")
    )
    return (
        ev.join(F.broadcast(horizon))
        .where(F.col("ts") >= F.col("h"))
        .select("event_id", "user_id", "event_type")
    )


def a2_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-2 graph set difference (optimizer.rb:330-331) ↔ EXCEPT."""
    orders = _t(spark, sf_dir, "orders")
    open_keys = orders.where("o_orderstatus = 'O'").select("o_orderkey")
    cheap = orders.where("o_totalprice < 50000").select("o_orderkey")
    return open_keys.exceptAll(cheap).distinct()


def a3_prf_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-3 precision/recall/F-score kernel (optimizer.rb:326-343):
    golden = finished orders, extracted = high-value orders."""
    orders = _t(spark, sf_dir, "orders")
    golden = orders.where("o_orderstatus = 'F'").select("o_orderkey")
    extracted = orders.where("o_totalprice > 100000").select("o_orderkey")
    right = golden.join(extracted, "o_orderkey").count()
    n_e, n_g = extracted.count(), golden.count()
    precision = right / n_e if n_e else 1.0
    recall = right / n_g if n_g else 1.0
    f = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return spark.createDataFrame(
        [(float(precision), float(recall), float(f))],
        "precision double, recall double, fscore double",
    )


def a4_grouped_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-4 per-group metrics (admin.rb:183-228) ↔ GROUP BY + conditional
    counts (TPC-H Q1 shape). Partial (map-side) aggregation is free here —
    the shuffle carries one row per group."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("count_order"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("high_disc"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def a5_optimizer_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-5 optimizer score (optimizer.rb:310-324): mean per-sample F-score
    over sample groups — here samples are customer nations, golden =
    finished orders, extracted = high-value orders. Runs through the real
    learning operator (learning.optimizer_score)."""
    from ..learning import optimizer_score

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    o = orders.join(
        F.broadcast(customer.select("c_custkey", "c_nationkey")),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_nationkey").cast("string").alias("sample"),
        F.col("o_orderkey").cast("string").alias("s"),
        F.lit("ex:order").alias("p"),
        F.col("o_orderkey").cast("string").alias("o"),
        "o_orderstatus",
        "o_totalprice",
    )
    golden = o.where(F.col("o_orderstatus") == "F")
    extracted = o.where(F.col("o_totalprice") > 100000)
    return optimizer_score(golden, extracted, metric="fscore")


def x2_minmax_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-2 selector normalize (selector.rb:41-51): (v-min)/(max-min).
    Two-pass agg + broadcast join, NOT a global window (a global window
    is a single-partition sort at scale)."""
    li = _t(spark, sf_dir, "lineitem")
    bounds = li.agg(
        F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx")
    )
    return (
        li.join(F.broadcast(bounds))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                (F.col("l_extendedprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn")),
                6,
            ).alias("norm"),
        )
    )


def x8_section_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-8 section slice (selectors/section.rb:3-12) ↔ bounded window
    frame per partition key (events per user, ordered by time)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-1, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 6).alias("rolling2"),
    )


def x5_span_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-5 XPath/CssSelector over spans (selectors/xpath.rb:3-23): the
    'search' = regexp-matching words of p_name (the span list), sc:index
    (xpath.rb:5-9) = positional select of the 2nd match, sc:keyword
    (xpath.rb:10-12) = exact-match count, and the fragment applicability
    gate = a regexp over p_type. try_element_at past the end yields NULL
    (xpath.rb returns an empty list) — matches SQL list indexing."""
    part = _t(spark, sf_dir, "part")
    words = F.split(F.col("p_name"), " ")
    matched = F.filter(words, lambda w: w.rlike("o"))
    return part.where(F.col("p_type").rlike("^(PROMO|ECONOMY)")).select(
        "p_partkey",
        F.try_element_at(matched, F.lit(2)).alias("second_match"),
        F.size(F.filter(words, lambda w: w == F.lit("tan"))).alias("kw_hits"),
    )


def x9_slice_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-9 slice selector (selectors/slice.rb:3-10) ↔ split + index."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.split(F.col("p_name"), " ").getItem(1).alias("slice_word")
    )


def x11_uripattern_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-11 UriPatternSelector glob (selectors/uri_pattern.rb:4-9) ↔
    anchored prefix LIKE — pushed down into the parquet scan."""
    part = _t(spark, sf_dir, "part")
    return part.where(F.col("p_type").like("PROMO%")).select("p_partkey", "p_type")


def x13_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-13 VisualSelector numeric ranges (selectors/visual.rb:36-61) ↔
    conjunctive range predicates (all pushed to the scan)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 40)
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.08)
        & (F.col("l_extendedprice") < 40000)
    ).select("l_orderkey", "l_linenumber", "l_quantity")


def s7_uri_mangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-7 per-URI dump key mangling (dumper.rb:7): scheme stripped,
    '/'→'-', '.'→'_', '?'/'&'→'+' — a pure expression chain."""
    docs = _t(spark, sf_dir, "documents")
    key = F.col("source")
    for a, b in [("/", "-"), (".", "_"), ("?", "+"), ("&", "+")]:
        key = F.replace(key, F.lit(a), F.lit(b))
    return docs.select("doc_id", key.alias("uri_key"))


def f10_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-10/X-17 URL completion + canonicalization (agent.rb:154-158,
    fragment.rb:128-135) as a driver-oracled query: the REAL native
    kernel (urlnorm.canonicalize_col — the exact Column chain the crawler
    canonicalizes every frontier URL with) over a deterministic messy-URL
    corpus derived from documents. Six variant spellings per doc —
    canonical, whitespace+upper-case+explicit :80, fragment-bearing,
    schemeless, query-bearing, and a bare word (the complete_uri branch)
    — with variant i kept iff i==0 or (doc_id+i)%3>0, grouped by the
    canonical form. The variants that differ only in case/port/fragment/
    scheme COLLAPSE; the query-bearing and bare-word ones map to their
    own canonicals, so n_variants discriminates.

    Scale shape: map-only expression chain (whole-stage codegen, no UDF)
    + one hash aggregation on the canonical — the same per-row cost the
    crawl loop pays, which is the point of oracling this kernel."""
    from ..urlnorm import canonicalize_col

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    h = F.concat(F.col("source"), F.lit(".example.com"))
    p = F.concat(F.lit("/d/"), ds)
    variants = F.array(
        F.concat(F.lit("http://"), h, p),
        F.concat(F.lit("  HTTP://"), F.upper(h), F.lit(":80"), p, F.lit(" ")),
        F.concat(F.lit("http://"), h, p, F.lit("#s"), ds),
        F.concat(h, p),
        F.concat(F.lit("http://"), h, p, F.lit("?page="), (d % 3).cast("string")),
        F.concat(F.lit("doc"), ds),
    )
    m = docs.select(d, F.posexplode(variants).alias("pos", "messy")).where(
        (F.col("pos") == 0) | ((d + F.col("pos")) % 3 > 0)
    )
    return (
        m.select(canonicalize_col(F.col("messy")).alias("canonical_uri"))
        .groupBy("canonical_uri")
        .agg(F.count(F.lit(1)).alias("n_variants"))
    )
