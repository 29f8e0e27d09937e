"""Interleaved text+media corpus analytics — the graft cell's payload
axis as first-class operators.

The north rule's input is "an Iceberg table of interleaved text + media
documents with columns (doc_id, spans:array<struct<kind,text,media_ref,
offset>>)" (BASELINE.json input_hint). The crawl engine consumes that
table (`corpus.py`, `frontier/crawler.py`); this module is the ANALYTICS
side of the same payload: what a multimodal-training-data pipeline does
with the span sequences once crawled — interleave profiling, media
fetch-once dedup, caption-pair mining, a budgeted media-fetch frontier,
and multimodal-aware sequence packing.

Because the driver's oracle tables carry no span column, every operator
here derives the span table DETERMINISTICALLY from `documents.parquet`
with a recipe mirrored verbatim in the DuckDB oracle (`__spark_entry__`
`_IL_SPANS_CTE`): words chunked 8-per-text-span, a media span inserted
after chunk c iff (doc_id + c) % 3 == 0, with ref id
(doc_id*31 + c*7) % 211 — a small shared ref space so media reuse across
documents (the thing fetch-once dedup exists for) actually occurs at
test scale. Media host = 'cdn' || (ref % 7): media lives on a separate
small host set, as CDNs do, giving the fetch frontier a host
distribution unlike the page frontier's.

100 TB shapes (per operator, detailed in PLANS.md):
- span expansion is MAP-ONLY (explode over a per-doc sequence; no
  shuffle until the aggregate that consumes it);
- fetch-once and stats are single hash-groupBy reductions with partial
  aggregation (hot refs/sources are big counts, not big groups);
- caption pairs shuffle once on doc_id and run a per-doc window whose
  partition is bounded by spans-per-doc (document size), never corpus
  size;
- the media pop reuses the REAL frontier kernel
  (`frontier.crawler.ranked_pop`) — one hash partition on host;
- multimodal packing reuses the sharded running-sum layout of
  `packing.py` (state = one counter per shard, never a global cumsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..urlnorm import host_col
from .packing import layout_from

CHUNK_WORDS = 8  # words per text span
MEDIA_MOD = 3  # media span follows chunk c iff (doc_id + c) % MEDIA_MOD == 0
REF_SPACE = 211  # media ref ids live in [0, REF_SPACE) — shared across docs
CDN_HOSTS = 7  # media host = 'cdn' || (ref % CDN_HOSTS)
IMG_TOKENS = 64  # packing cost of an image span
VID_TOKENS = 256  # packing cost of a video span
MM_SEQ_LEN = 1024  # tokens per packed multimodal training window
MM_SHARDS = 8  # independent pack streams


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def spans_from(docs: DataFrame) -> DataFrame:
    """The derived interleaved span table:
    (doc_id, source, kind, text, media_ref, offset).

    `offset` is the span's order key within the document (2c for chunk
    c's text span, 2c+1 for the media span inserted after it) — monotone
    and gap-tolerant, exactly how the crawl corpus orders spans
    (`corpus.py` span `offset`). Map-only AND single-scan: a naive
    text-spans UNION media-spans would read the input twice (a real 2×
    I/O cost at 100 TB); instead each chunk row emits an array of one or
    two span structs and ONE explode flattens it — the plan is a single
    column-pruned parquet scan, two Generates, no shuffle.
    """
    words = F.split(F.col("text"), " ")
    # NULL-text rows emit NO spans (mirrored by the oracle CTE's WHERE).
    # The guard is mode-independent (review r5): under this session's
    # ANSI default size(NULL) is NULL and sequence(0, NULL) explodes to
    # nothing, but under legacy mode size(NULL)=-1 would make the chunk
    # sequence(0, -1) step -1 — TWO garbage chunks per NULL doc — so the
    # filter pins the semantics rather than trusting the mode
    base = docs.where(F.col("text").isNotNull()).select(
        "doc_id", "source", words.alias("words")
    ).withColumn(
        "c",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.size("words") - 1) / CHUNK_WORDS).cast("int"),
            )
        ),
    )
    ref = (F.col("doc_id") * 31 + F.col("c") * 7) % REF_SPACE
    text_struct = F.struct(
        F.lit("text").alias("kind"),
        F.array_join(
            F.slice("words", F.col("c") * CHUNK_WORDS + 1, CHUNK_WORDS), " "
        ).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        (F.col("c") * 2).cast("int").alias("offset"),
    )
    media_struct = F.struct(
        F.when(ref % 5 == 0, F.lit("video"))
        .otherwise(F.lit("image"))
        .alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(
            F.lit("m://cdn"),
            (ref % CDN_HOSTS).cast("string"),
            F.lit("/"),
            ref.cast("string"),
        ).alias("media_ref"),
        (F.col("c") * 2 + 1).cast("int").alias("offset"),
    )
    spans = F.when(
        (F.col("doc_id") + F.col("c")) % MEDIA_MOD == 0,
        F.array(text_struct, media_struct),
    ).otherwise(F.array(text_struct))
    return base.select(
        "doc_id", "source", F.explode(spans).alias("s")
    ).select("doc_id", "source", "s.kind", "s.text", "s.media_ref", "s.offset")


def _ref_num(col: str = "media_ref") -> F.Column:
    """ref id recovered from the ref string — kept OUT of the span schema
    (the input_hint's span struct has no numeric ref field; real refs are
    opaque strings) and re-derived where an operator needs it."""
    return F.element_at(F.split(F.col(col), "/"), -1).cast("long")


# span kinds that denote a media object. The derived table emits
# image/video; the crawl corpus (`corpus.py`) emits kind='media' — and
# its LINK spans carry the href in media_ref, so media identification
# must go through kind, never through media_ref alone.
MEDIA_KINDS = ("image", "video", "media")

# host extraction reuses urlnorm.host_col — ONE host definition across
# the engine (review r5: a local regex here required a trailing '/'
# after the host, so a path-less ref collapsed into host '', and it
# kept ports where robots/politeness strip them — the same CDN split
# across two budgets). The pattern is ASCII-class-only, so it reads
# identically under java.util.regex and DuckDB RE2 (the scrub.py
# parity discipline; the oracle embeds it verbatim).


def _is_media() -> F.Column:
    return F.col("kind").isin(*MEDIA_KINDS)


def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source interleave profile: document/span/media counts, media
    density, and distinct media refs. One map-side span expansion + one
    partial-aggregated groupBy(source) — at 100 TB this is a scan-shaped
    job whose shuffle carries |sources| rows."""
    return media_stats_from(spans_from(_docs(spark, sf_dir)))


def media_stats_from(spans: DataFrame, key: str = "source") -> DataFrame:
    m = _is_media()
    return spans.groupBy(key).agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(m.cast("long")).alias("n_media"),
        # refs counted over MEDIA rows only: in a general span table
        # link spans carry hrefs in media_ref and must not count
        F.countDistinct(F.when(m, F.col("media_ref"))).alias(
            "distinct_refs"
        ),
        F.round(F.sum(m.cast("double")) / F.count(F.lit(1)), 6).alias(
            "media_pct"
        ),
    )


def fetch_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media fetch-once accounting (S-10's response cache, lifted to the
    media axis): refs referenced by ≥2 spans, how many fetches the cache
    elides and how many bytes that saves. Byte size is a deterministic
    property of the ref (here 500 + ref·37; a real deployment passes the
    Content-Length column) — same ref, same size, as a real CDN object.
    One hash-groupBy on media_ref; hot refs reduce map-side."""
    n_bytes = F.lit(500) + _ref_num() * 37
    return fetch_once_from(spans_from(_docs(spark, sf_dir)), n_bytes)


def fetch_once_from(spans: DataFrame, bytes_col: F.Column) -> DataFrame:
    """``bytes_col`` must be a pure function of ``media_ref`` (evaluated
    after the per-ref aggregate, where only the ref survives)."""
    media = spans.where(_is_media() & F.col("media_ref").isNotNull())
    agg = media.groupBy("media_ref").agg(
        F.count(F.lit(1)).alias("n_requests"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.min("kind").alias("kind"),
    )
    return agg.where(F.col("n_requests") >= 2).select(
        "media_ref",
        "kind",
        "n_requests",
        "n_docs",
        "first_doc",
        bytes_col.alias("n_bytes"),
        ((F.col("n_requests") - 1) * bytes_col).alias("saved_bytes"),
    )


def caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-candidate mining: for every media span, the text spans
    immediately before and after it in document order — the standard
    image-text pairing prep for interleaved multimodal training. One
    shuffle on doc_id; the window partition is a single document's span
    list (bounded by document size, never corpus size). In the derived
    corpus a media span always sits between text chunks, so lag/lead of
    the text column are the neighboring chunk texts; a doc-final media
    span has no after-text and reports '' (kept, as a real pairer keeps
    before-only pairs — and '' not NULL so the oracle compare stays
    total-ordered)."""
    return caption_pairs_from(spans_from(_docs(spark, sf_dir)))


def caption_pairs_from(spans: DataFrame) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy("offset")
    return (
        spans.withColumn(
            "before_text", F.coalesce(F.lag("text").over(w), F.lit(""))
        )
        .withColumn(
            "after_text", F.coalesce(F.lead("text").over(w), F.lit(""))
        )
        .where(_is_media())
        .select(
            "doc_id",
            "media_ref",
            "kind",
            "offset",
            "before_text",
            "after_text",
        )
    )


def media_pop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted media-fetch frontier pop over the pending ref set,
    exercising the REAL crawl kernel (`frontier.crawler.ranked_pop`) on
    the media axis: popularity-first priority (most-referenced refs fetch
    first — they unblock the most documents), FIFO tiebreak on first
    discovery, per-CDN-host politeness budget (base 3; cdn0→1, cdn1→5
    literal-map overrides, the same override mechanism robots Crawl-delay
    uses). Pending set = one groupBy(media_ref); pop = one hash partition
    on host + window, identical to the page frontier's."""
    spans = spans_from(_docs(spark, sf_dir))
    # first-discovery key as a zero-padded string, collision-free at any
    # magnitude (review r5: doc_id*1000+offset collided once a doc had
    # offset ≥ 1000 — ~4000 words — inverting FIFO order across docs and
    # making the row_number tiebreak nondeterministic). lpad widths
    # cover the full int64/int32 digit ranges.
    seq = F.min(
        F.concat(
            F.lpad(F.col("doc_id").cast("string"), 20, "0"),
            F.lpad(F.col("offset").cast("string"), 10, "0"),
        )
    ).alias("seq")
    return media_pop_from(
        spans, seq, per_host_budget=3, host_budgets=(("cdn0", 1), ("cdn1", 5))
    )


def media_pop_from(
    spans: DataFrame,
    seq_agg: F.Column,
    per_host_budget: int | None = 3,
    host_budgets: tuple[tuple[str, int], ...] = (),
) -> DataFrame:
    """``seq_agg``: an aggregate over the ref's span rows yielding its
    first-discovery order key (any orderable type — the window just sorts
    by it)."""
    from ..frontier.crawler import ranked_pop

    media = spans.where(_is_media() & F.col("media_ref").isNotNull())
    pending = media.groupBy("media_ref").agg(
        F.count(F.lit(1)).alias("n_refs"), seq_agg
    )
    frontier = pending.select(
        F.col("media_ref").alias("uri"),
        host_col(F.col("media_ref")).alias("host"),
        "seq",
        "n_refs",
        (-F.col("n_refs")).alias("neg_pop"),
    )
    _, popped, _ = ranked_pop(
        frontier, per_host_budget, host_budgets, priority_expr="neg_pop"
    )
    return popped.select("uri", "host", "seq", "n_refs")


def pack_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-aware sequence packing: each document's training cost
    is its text tokens plus a fixed token budget per media span (64 per
    image, 256 per video — the vision-encoder patch budget), laid out
    with the SAME sharded running-sum layout as `packing.pack_sequences`
    (state = one counter per shard; never a global cumsum). Output: per
    document, its shard, cost, stream offset, pack id and offset within
    the pack at MM_SEQ_LEN=1024."""
    return pack_multimodal_from(spans_from(_docs(spark, sf_dir)))


def pack_multimodal_from(
    spans: DataFrame,
    media_costs: dict[str, int] | None = None,
    seq_len: int = MM_SEQ_LEN,
    num_shards: int = MM_SHARDS,
) -> DataFrame:
    """``media_costs`` maps media kind → token budget (None = the module
    defaults). A media span (kind in MEDIA_KINDS) whose kind has no cost
    in the map FAILS LOUD (``raise_error``) instead of silently costing
    ~1 token through the text branch — a partial map like
    ``{"image": 64}`` would otherwise undercost every video span with no
    error (review r5; the same review made an explicit empty dict an
    error rather than a silent fall-through to the defaults). Non-media
    span kinds always cost their text's whitespace token count."""
    if media_costs is None:
        media_costs = {
            "image": IMG_TOKENS,
            "video": VID_TOKENS,
            "media": IMG_TOKENS,
        }
    cost = None
    for kind, c in media_costs.items():
        cost = (
            F.when(F.col("kind") == kind, F.lit(c))
            if cost is None
            else cost.when(F.col("kind") == kind, F.lit(c))
        )
    uncosted_media = F.raise_error(
        F.concat(
            F.lit("pack_multimodal_from: no media cost for kind "),
            F.col("kind"),
        )
    )
    # coalesce before split: a NULL-text non-media span (legal in a
    # general table) must cost like the empty document under EITHER
    # ANSI mode (NULL under ANSI poisons the per-doc sum; -1 under
    # legacy undercounts) — review r5 corrected the rationale
    text_cost = F.size(F.split(F.coalesce("text", F.lit("")), " "))
    if cost is None:
        cost = F.when(_is_media(), uncosted_media).otherwise(text_cost)
    else:
        cost = cost.when(_is_media(), uncosted_media).otherwise(text_cost)
    per_doc = spans.groupBy("doc_id").agg(F.sum(cost).alias("cost"))
    # the sharded running-sum tail is packing.layout_from — ONE copy of
    # the 64-bit pack_id / integer-DIV discipline for every packer
    return layout_from(per_doc, "cost", seq_len, num_shards)


MIN_SPAN_WORDS = 4  # quality gate: text spans shorter than this drop


def clean_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved corpus cleaning (the boilerplate-rebuild discipline on
    the span axis): drop text spans failing a minimum-length quality gate,
    drop media spans whose anchor (the NEAREST PRECEDING NON-MEDIA span —
    shared by every span of a consecutive-media burst) did not survive —
    an image whose surrounding prose was junk is junk — and renumber
    offsets contiguously so the output is again a well-formed span
    sequence a packer or trainer can consume.

    One Exchange: both windows (the anchor-survival propagation and the
    renumbering row_number) share the same (doc_id, offset) partitioning
    and sort, so Catalyst plans a single shuffle + sort (plan-tested)."""
    return clean_rebuild_from(spans_from(_docs(spark, sf_dir)))


def clean_rebuild_from(
    spans: DataFrame, min_words: int = MIN_SPAN_WORDS
) -> DataFrame:
    m = _is_media()
    # coalesce keeps _kt non-NULL for NULL-text non-media spans (ANSI
    # NULL >= n is NULL): same observed outcome (dropped) but now an
    # explicit False, which the anchor propagation below relies on
    keep_text = (~m) & (
        F.size(F.split(F.coalesce("text", F.lit("")), " ")) >= min_words
    )
    w = Window.partitionBy("doc_id").orderBy("offset")
    # a media span's anchor is the NEAREST PRECEDING NON-MEDIA span: in
    # a media burst (consecutive media spans — media-only crawl docs,
    # image galleries) every span of the burst shares the prose anchor
    # before it. The earlier lag('_kt') looked only at the immediate
    # predecessor, whose _kt is hardwired False when it is itself media
    # — so only the FIRST media span of a burst could ever survive,
    # contradicting the documented anchor rule (review r5). On the
    # derived table media spans are never adjacent, so lag and this
    # propagation agree there (oracle values unchanged).
    anchor = F.last(F.when(~m, F.col("_kt")), ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.withColumn("_kt", keep_text).withColumn(
        "_keep",
        F.when(m, F.coalesce(anchor, F.lit(False))).otherwise(F.col("_kt")),
    )
    kept = flagged.where(F.col("_keep"))
    # text/media_ref coalesced to '' so the span struct stays total-
    # ordered for the oracle compare (the caption_pairs discipline)
    return kept.select(
        "doc_id",
        "kind",
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("media_ref", F.lit("")).alias("media_ref"),
        "offset",
        (F.row_number().over(w) - 1).cast("int").alias("new_offset"),
    )


TEMPLATE_MIN_DOCS = 2  # a "template" is a structure shared by ≥ this many docs
BENCH_REF_MOD = 17  # benchmark media set: ref id % this == 0 (deterministic)
COOCCUR_MAX_REFS = 64  # skew cap: docs with more distinct refs are excluded
COOCCUR_MIN_DOCS = 2  # co-occurrence edges must appear in ≥ this many docs


def template_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural template detection over interleaved documents: two docs
    share a template when their span SHAPE sequences are identical —
    per-span code = 't'||word_count for text spans, the kind's first
    letter for media spans, concatenated in offset order. Text-level
    dedup (minhash/simhash) can't see this: templated pages carry
    different prose in the same scaffold, and a multimodal trainer wants
    to downweight the scaffold, not the prose.

    100 TB shape: span expansion is map-only; the per-doc signature is
    ONE groupBy(doc_id) whose collect_list state is bounded by spans-
    per-doc (document size, never corpus size); signatures are then
    compacted to 60-bit hashes so the second groupBy shuffles 8-byte
    keys, one row per document. Two shuffles total, no self-join."""
    return template_groups_from(spans_from(_docs(spark, sf_dir)))


def _doc_sigs(spans: DataFrame) -> DataFrame:
    """Per-doc span-shape signature: (doc_id, sig, n_spans). ONE
    groupBy(doc_id) whose collect_list state is bounded by spans-per-doc
    (document size, never corpus size)."""
    # coalesce pins NULL-text non-media spans to 't1' (== empty-string
    # word count) under either ANSI mode — the pack_multimodal_from
    # discipline
    code = F.when(
        ~_is_media(),
        F.concat(
            F.lit("t"),
            F.size(F.split(F.coalesce("text", F.lit("")), " ")).cast(
                "string"
            ),
        ),
    ).otherwise(F.substring("kind", 1, 1))
    return spans.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("offset"), code.alias("code")))
                ),
                lambda x: x["code"],
            ),
            ".",
        ).alias("sig"),
        F.count(F.lit(1)).alias("n_spans"),
    )


def template_groups_from(
    spans: DataFrame, min_docs: int = TEMPLATE_MIN_DOCS
) -> DataFrame:
    from .text import hash60_col

    return (
        _doc_sigs(spans)
        .groupBy(hash60_col(F.col("sig")).alias("template_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("example_doc"),
            # every doc in a group shares the sig, hence the span count
            F.min("n_spans").alias("n_spans"),
        )
        .where(F.col("n_docs") >= min_docs)
    )


def template_downweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition `template_groups` exists for: per-document
    sampling weights that downweight templated scaffolds. Every document
    gets weight_ppm = 1e6 // n_docs(template) — a unique structure keeps
    full weight 1,000,000; the ten-thousandth copy of a boilerplate
    scaffold samples at 100 ppm. Exact integer arithmetic end to end
    (the sampling.py fixed-point discipline), so the oracle is
    bit-exact, and the output feeds `sample_pps_poisson` directly as its
    weight column.

    100 TB shape: the per-doc signature agg is the template_groups
    kernel (state bounded by document size); the sig table is
    localCheckpoint'ed ONCE before fanning into the count aggregate and
    the join probe (the dedup.py persist-before-fan-out discipline —
    without it the doc-sized agg subtree executes twice); the count
    join is an 8-byte-key shuffle join on template_id where AQE's
    skew-join split handles a mega-template (a window count would pin
    the mega-template's rows to one task with no skew remedy). Output is
    one row per document, flag-not-filter: singleton templates keep
    weight 1e6, so the oracle discriminates in both directions."""
    return template_downweight_from(spans_from(_docs(spark, sf_dir)))


def template_downweight_from(spans: DataFrame) -> DataFrame:
    from .text import hash60_col

    per_doc = (
        _doc_sigs(spans)
        .select("doc_id", hash60_col(F.col("sig")).alias("template_id"))
        .localCheckpoint()  # materialize the doc-sized agg once (fan-out below)
    )
    counts = per_doc.groupBy("template_id").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return per_doc.join(counts, "template_id").select(
        "doc_id",
        "template_id",
        "n_docs",
        F.expr("1000000 div n_docs").alias("weight_ppm"),
    )


def media_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination on the MEDIA axis (the cross-modal twin
    of `repetition.decontaminate`): a document is contaminated when any
    of its media spans references an object in the benchmark set —
    training on the exact image a vision benchmark tests is leakage even
    when the surrounding text is fresh. The benchmark set is derived
    deterministically (ref id % BENCH_REF_MOD == 0, no external data); a
    real deployment passes the benchmark manifest as the `bench` frame.

    Output: one row per document in the span table — media span count,
    benchmark-hit count, and the 0/1 contaminated flag (flag not filter,
    so the oracle is non-vacuous in both directions).

    100 TB shape: the benchmark set is distinct-reduced then BROADCAST
    (benchmark manifests are ≤ millions of refs; the corpus side never
    shuffles for the membership test); the only Exchange is the per-doc
    aggregate. Membership is tested on media spans ONLY — in a general
    span table link spans carry hrefs in media_ref and must not match."""
    spans = spans_from(_docs(spark, sf_dir))
    media = spans.where(_is_media() & F.col("media_ref").isNotNull())
    bench = (
        media.select("media_ref")
        .distinct()
        .where(_ref_num() % BENCH_REF_MOD == 0)
    )
    return media_decontaminate_from(spans, bench)


def media_decontaminate_from(spans: DataFrame, bench: DataFrame) -> DataFrame:
    """``bench``: one column ``media_ref`` — the benchmark object set."""
    marked = bench.select("media_ref").distinct().withColumn(
        "_bm", F.lit(1)
    )
    # isNotNull (not `== 1`) so the flag is two-valued after the left
    # join — `true AND NULL` is NULL and would fall out of the sums
    hit = _is_media() & F.col("_bm").isNotNull()
    return (
        spans.join(F.broadcast(marked), "media_ref", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(_is_media().cast("long")).alias("n_media"),
            F.sum(hit.cast("long")).alias("n_bench_hits"),
            F.max(hit.cast("int")).alias("contaminated"),
        )
    )


def media_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media co-occurrence edges: unordered ref pairs appearing together
    in ≥ COOCCUR_MIN_DOCS documents — the media-axis analogue of the
    webgraph's link edges, feeding gallery/template detection and
    image-pair mining.

    100 TB shape: NOT a self-join. Distinct (doc, ref) reduces through
    one groupBy(doc_id) into a per-doc sorted ref array (state bounded by
    COOCCUR_MAX_REFS — docs above the cap are excluded BEFORE the
    quadratic pair expansion, the dedup.py bucket-cap discipline,
    mirrored in the oracle); pairs are generated map-side from the array
    and reduced by one groupBy(ref_a, ref_b). Two shuffles, and the pair
    fan-out is ≤ cap²/2 per doc by construction."""
    return media_cooccur_from(spans_from(_docs(spark, sf_dir)))


def media_cooccur_from(
    spans: DataFrame,
    max_refs: int = COOCCUR_MAX_REFS,
    min_docs: int = COOCCUR_MIN_DOCS,
) -> DataFrame:
    media = spans.where(_is_media() & F.col("media_ref").isNotNull())
    return _cooccur_pairs(
        media.select("doc_id", "media_ref"), max_refs, min_docs
    )


def _cooccur_pairs(
    doc_ref: DataFrame, max_refs: int, min_docs: int
) -> DataFrame:
    """Co-occurrence edge core over a (doc_id, media_ref) table —
    shared by the standalone cooccur entry (raw media rows; collect_set
    dedups) and media_gallery (a checkpointed distinct table feeding
    two consumers)."""
    refs = (
        doc_ref.groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("media_ref")).alias("refs"))
        .where(F.size("refs").between(2, max_refs))
    )
    pairs = refs.select(
        F.explode(
            F.expr(
                "flatten(transform(refs, (a, i) -> "
                "transform(slice(refs, i + 2, size(refs)), "
                "b -> struct(a AS ref_a, b AS ref_b))))"
            )
        ).alias("p")
    ).select("p.ref_a", "p.ref_b")
    # (doc, ref) pairs are distinct by collect_set, so count(1) counts
    # DOCUMENTS containing the pair
    return (
        pairs.groupBy("ref_a", "ref_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def pipeline_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed multimodal training-data pipeline (the pipeline.py
    discipline on the span axis): clean the interleaved corpus
    (`clean_rebuild_from` — quality gate, orphan-media drop), then lay
    the SURVIVING spans out into packed training windows
    (`pack_multimodal_from` — per-kind token costs, sharded running
    sum). The oracle nests the clean mirror inside the pack mirror, so
    the COMPOSITION is value-checked, not just its parts. Plan: the
    clean windows' single Exchange + pack's groupBy/window pair — the
    composition adds no shuffle beyond its constituents'."""
    cleaned = clean_rebuild_from(spans_from(_docs(spark, sf_dir)))
    return pack_multimodal_from(cleaned)


MIRROR_MAX_DF = 8  # refs in more docs than this are stock media (logos,
# icons, tracking pixels) — dropped BEFORE pair generation: both the
# semantic filter (ubiquitous media is not mirroring evidence) and the
# skew cap that bounds the per-ref pair fan-out at max_df²/2
MIRROR_MIN_SHARED = 2  # a single shared rare ref is coincidence-prone
MIRROR_MIN_PPM = 500_000  # Jaccard ≥ 0.5 over rare refs = mirror-grade


def media_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror/syndication detection on the MEDIA axis: document pairs
    whose RARE media-ref sets overlap heavily (Jaccard over refs that
    appear in ≤ MIRROR_MAX_DF documents). Scraped and syndicated pages
    routinely paraphrase or re-template the prose — defeating text
    near-dup — while hot-linking the identical images; the media refs
    are the durable fingerprint. The cross-modal complement of
    `dedup.ngram_jaccard_pairs` (text-shingle Jaccard) and the doc-side
    dual of `media_cooccur` (which pairs MEDIA by shared docs; this
    pairs DOCS by shared media).

    Output: (doc_a, doc_b, shared, n_a, n_b, jaccard_ppm) for pairs with
    shared ≥ MIRROR_MIN_SHARED and exact-integer Jaccard ≥
    MIRROR_MIN_PPM ppm — fixed-point end to end (the sampling.py
    discipline) so the oracle is bit-exact.

    100 TB shape: NEVER an all-pairs self-join on documents. The
    distinct (doc, ref) table is localCheckpoint'ed ONCE (the dedup.py
    persist-before-fan-out discipline — it feeds BOTH the df filter
    chain and the per-doc counts); the df cap drops stock refs before
    any pair exists, bounding the per-ref fan-out at max_df²/2 exactly
    like COOCCUR_MAX_REFS bounds the per-doc fan-out in media_cooccur;
    pair generation is map-side from per-ref doc arrays; the pair count
    and the two n_a/n_b joins are 8/16-byte-key shuffles where AQE
    skew-split applies. Jaccard uses the RARE-ref set sizes on both
    sides — consistent set semantics (shared ⊆ rare_a ∩ rare_b), and
    the quantity a mirror hunter wants: ubiquity-corrected overlap."""
    return media_mirror_from(spans_from(_docs(spark, sf_dir)))


def _doc_ref_table(spans: DataFrame) -> DataFrame:
    """Distinct (doc_id, media_ref) over media spans, checkpointed once
    — the shared entry stage of every ref-set kernel below (mirror,
    delta mirror, gallery): ONE copy of the distinct/checkpoint
    discipline so a retune cannot drift between siblings."""
    return (
        spans.where(_is_media() & F.col("media_ref").isNotNull())
        .select("doc_id", "media_ref")
        .distinct()
        .localCheckpoint()  # fan-out: df filter + per-doc counts / nodes
    )


def _rare_refs(
    doc_ref: DataFrame, max_df: int
) -> tuple[DataFrame, DataFrame]:
    """(rare, counts): the df-capped (doc, ref) table and per-doc rare
    set sizes — the shared stock-media stage of both mirror kernels.
    The cap is both the semantic filter (ubiquitous media is not
    mirroring evidence) and the skew bound on per-ref pair fan-out."""
    df_counts = doc_ref.groupBy("media_ref").agg(
        F.count(F.lit(1)).alias("_df")
    )
    rare = (
        doc_ref.join(df_counts, "media_ref")
        .where(F.col("_df") <= max_df)
        .drop("_df")
        .localCheckpoint()  # fan-out: pair generation + per-doc counts
    )
    counts = rare.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return rare, counts


def media_mirror_from(
    spans: DataFrame,
    max_df: int = MIRROR_MAX_DF,
    min_shared: int = MIRROR_MIN_SHARED,
    min_ppm: int = MIRROR_MIN_PPM,
) -> DataFrame:
    rare, counts = _rare_refs(_doc_ref_table(spans), max_df)
    docs_per_ref = rare.groupBy("media_ref").agg(
        F.array_sort(F.collect_list("doc_id")).alias("docs")
    )
    # map-side pair expansion from the per-ref array (≤ max_df²/2 pairs
    # per ref by the cap above) — the media_cooccur recipe with the
    # roles of docs and refs swapped
    pairs = docs_per_ref.select(
        F.explode(
            F.expr(
                "flatten(transform(docs, (a, i) -> "
                "transform(slice(docs, i + 2, size(docs)), "
                "b -> struct(a AS doc_a, b AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    shared = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("shared")
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    out = (
        shared.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard_ppm",
            F.expr("1000000 * shared div (n_a + n_b - shared)"),
        )
    )
    return out.where(
        (F.col("shared") >= min_shared) & (F.col("jaccard_ppm") >= min_ppm)
    ).select("doc_a", "doc_b", "shared", "n_a", "n_b", "jaccard_ppm")


BITEXT_MIN_PPM = 200_000  # looser than MIRROR_MIN_PPM: translated page
# pairs share the gallery only partially (locale-specific images join
# the shared ones), so mirror-grade 0.5 Jaccard would miss real bitext


def bitext_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parallel-corpus (bitext) candidate mining — the cross-language
    reading of media mirroring: translated versions of a page share
    their image galleries while sharing almost no text n-grams, so
    doc pairs with overlapping RARE media refs whose predicted
    languages DIFFER are translation candidates (the signal bitext
    miners like CCMatrix use before expensive alignment scoring).

    Composition of two stamped kernels: `media_mirror_from`'s rare-ref
    pair generation (at the looser BITEXT_MIN_PPM gate) and
    `textstats.marker_langid`'s per-doc language vote. Output
    (doc_a, doc_b, shared, jaccard_ppm, lang_a, lang_b, cross_lang) —
    cross_lang is a FLAG, not a filter (the flag-not-filter discipline
    the gallery kernel set: same-language pairs are the mirror
    baseline a reviewer compares the candidate yield against, and the
    entry stays non-vacuous on a corpus whose mirrors happen to be
    monolingual).

    100 TB shape: inherits the mirror kernel's df-capped pair bound;
    the language join is two hash joins of the pair table (small)
    against the node-sized language map — broadcast the pair side when
    it fits, else an equi-join on the doc key."""
    from .textstats import marker_langid

    pairs = media_mirror_from(
        spans_from(_docs(spark, sf_dir)), min_ppm=BITEXT_MIN_PPM
    )
    langs = marker_langid(spark, sf_dir)
    la = langs.select(
        F.col("doc_id").alias("doc_a"), F.col("pred_lang").alias("lang_a")
    )
    lb = langs.select(
        F.col("doc_id").alias("doc_b"), F.col("pred_lang").alias("lang_b")
    )
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            "jaccard_ppm",
            "lang_a",
            "lang_b",
            (F.col("lang_a") != F.col("lang_b")).cast("int").alias("cross_lang"),
        )
    )


def media_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gallery resolution: connected components over the media
    co-occurrence graph (`media_cooccur` edges), labeling every distinct
    media ref with the lexicographic-min ref reachable from it — the
    media-axis twin of `dedup.simhash_components`' fingerprint→pairs→
    resolve production shape. Galleries (photo sets, product shots,
    slideshows) travel together across pages; the component map is what
    a curation pass samples BY (one gallery = one unit) instead of
    per-image, exactly as doc dedup samples by cluster.

    Output: one row per distinct media ref — component members AND
    singletons (flag-not-filter: refs outside any edge keep themselves
    as gallery_id, so the oracle discriminates in both directions).

    100 TB shape: edges come from the capped cooccur kernel (per-doc
    fan-out bounded by COOCCUR_MAX_REFS²/2); the resolution is the ONE
    shared min-label-propagation kernel (`dedup.components_from_pairs`):
    pointer-jumping (O(log diameter) rounds), localCheckpoint-truncated
    lineage per round, fail-loud on non-convergence."""
    spans = spans_from(_docs(spark, sf_dir))
    return media_gallery_from(spans)


def media_gallery_from(
    spans: DataFrame,
    max_refs: int = COOCCUR_MAX_REFS,
    min_docs: int = COOCCUR_MIN_DOCS,
    max_iter: int = 40,
) -> DataFrame:
    from .dedup import components_from_pairs

    # checkpoint the distinct (doc, ref) table ONCE: it feeds BOTH the
    # cooccur edges and the node set — without it the map-only span
    # derivation (a full parquet scan) executes twice, the exact 2× I/O
    # cost the spans_from docstring exists to avoid (review r5)
    doc_ref = _doc_ref_table(spans)
    pairs = _cooccur_pairs(doc_ref, max_refs, min_docs).select(
        F.col("ref_a").alias("a"), F.col("ref_b").alias("b")
    )
    nodes = doc_ref.select(F.col("media_ref").alias("doc_id")).distinct()
    # max_iter=40 (not the kernel's 20 default): gallery graphs chain
    # refs through long photo-set overlaps — the derived 211-ref corpus
    # builds a 45-ref component of approximate diameter 23 that took 22
    # neighbor-min rounds under the r5 kernel (its pointer jump bought
    # nothing on this id layout). The r6 kernel's reverse flow resolves
    # the same graph in 8 rounds (see components_from_pairs), but the
    # 40 cap stays as headroom: the kernel still fails loud beyond it
    # rather than returning a wrong map
    return components_from_pairs(nodes, pairs, max_iter=max_iter).select(
        F.col("doc_id").alias("media_ref"),
        F.col("canonical_id").alias("gallery_id"),
    )


CTX_SEQ_LEN = 128  # context-window token capacity for long-doc splitting


def context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-atomic context-window segmentation: split each document's
    span sequence into training windows of token cost ≤ CTX_SEQ_LEN
    WITHOUT ever separating a media span from its caption prose. The
    dual of `pack_multimodal` (which packs whole docs ACROSS a stream,
    this splits WITHIN long docs); naive fixed-stride splitting orphans
    images from the text that grounds them — the exact failure mode
    multimodal training curricula forbid.

    Semantics: spans group into ATOMS — a text span starts a new atom;
    every following media span (a whole media burst) rides with it;
    media before any text forms atom 0. Atoms fill windows greedily in
    offset order: a window closes when the next atom would overflow
    seq_len; an atom larger than seq_len alone (a video burst) gets its
    own window, flagged oversize rather than split or dropped. Costs
    are the pack_multimodal model (word count / 64 per image / 256 per
    video).

    Output: one row per (doc_id, window_id) with n_atoms, n_spans,
    n_media, cost, oversize.

    100 TB shape: ONE Exchange (the groupBy(doc_id)); the sort, the
    atom grouping, and the greedy fill all run map-side as native
    array expressions over per-doc state bounded by DOCUMENT size
    (the template_groups/_doc_sigs justification) — greedy bin packing
    is inherently sequential per doc, but docs are independent, so the
    parallelism is doc-count-wide with zero cross-doc state. No window
    function, no second shuffle, no UDF."""
    return context_windows_from(spans_from(_docs(spark, sf_dir)))


def context_windows_from(
    spans: DataFrame, seq_len: int = CTX_SEQ_LEN
) -> DataFrame:
    # per-span cost, pinned for NULL text under either ANSI mode (the
    # pack_multimodal_from coalesce discipline)
    cost = (
        F.when(F.col("kind") == "video", F.lit(VID_TOKENS))
        .when(_is_media(), F.lit(IMG_TOKENS))
        .otherwise(F.size(F.split(F.coalesce("text", F.lit("")), " ")))
    )
    per_doc = spans.select(
        "doc_id",
        F.struct(
            F.col("offset").cast("int").alias("offset"),
            (F.col("kind") == "text").alias("is_text"),
            cost.cast("int").alias("cost"),
        ).alias("s"),
    ).groupBy("doc_id").agg(
        # array_sort orders by the struct's FIRST field (offset) —
        # state bounded by spans-per-doc, never corpus size
        F.array_sort(F.collect_list("s")).alias("ss")
    )
    atoms = F.expr(
        """
        aggregate(
          ss,
          cast(array() as array<struct<cost:int,n_spans:int,n_media:int>>),
          (acc, s) -> CASE
            WHEN s.is_text OR size(acc) = 0 THEN
              acc || array(struct(
                s.cost AS cost, 1 AS n_spans,
                CAST(NOT s.is_text AS INT) AS n_media))
            ELSE
              slice(acc, 1, size(acc) - 1) || array(struct(
                element_at(acc, -1).cost + s.cost AS cost,
                element_at(acc, -1).n_spans + 1 AS n_spans,
                element_at(acc, -1).n_media + 1 AS n_media))
          END)
        """
    )
    # greedy fill: state = (current window id, its fill, per-window
    # summaries). Appending/updating the LAST summary copies an
    # O(windows-per-doc) array per atom — bounded by document size, the
    # price of keeping the whole kernel in ONE shuffle
    wins = F.expr(
        f"""
        aggregate(
          atoms,
          struct(
            -1 AS win, 0 AS fill,
            cast(array() as array<struct<
              window_id:int,n_atoms:int,n_spans:int,n_media:int,cost:int>>)
              AS wins),
          (st, a) -> CASE
            WHEN st.win < 0 OR st.fill + a.cost > {int(seq_len)} THEN
              struct(
                st.win + 1 AS win, a.cost AS fill,
                st.wins || array(struct(
                  st.win + 1 AS window_id, 1 AS n_atoms,
                  a.n_spans AS n_spans, a.n_media AS n_media,
                  a.cost AS cost)) AS wins)
            ELSE
              struct(
                st.win AS win, st.fill + a.cost AS fill,
                slice(st.wins, 1, size(st.wins) - 1) || array(struct(
                  st.win AS window_id,
                  element_at(st.wins, -1).n_atoms + 1 AS n_atoms,
                  element_at(st.wins, -1).n_spans + a.n_spans AS n_spans,
                  element_at(st.wins, -1).n_media + a.n_media AS n_media,
                  element_at(st.wins, -1).cost + a.cost AS cost)) AS wins)
          END,
          st -> st.wins)
        """
    )
    return (
        per_doc.select("doc_id", atoms.alias("atoms"))
        .select("doc_id", F.explode(wins).alias("w"))
        .select(
            "doc_id",
            F.col("w.window_id").alias("window_id"),
            F.col("w.n_atoms").cast("long").alias("n_atoms"),
            F.col("w.n_spans").cast("long").alias("n_spans"),
            F.col("w.n_media").cast("long").alias("n_media"),
            F.col("w.cost").cast("long").alias("cost"),
            (F.col("w.cost") > seq_len).cast("int").alias("oversize"),
        )
    )


MIRROR_DELTA_MOD = 3  # doc_id % this == 0 plays the NEW (delta) batch


def media_mirror_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (delta×history) mirror detection — `media_mirror`'s
    daily-ingest shape, the media-axis twin of `dedup.delta_lsh_pairs`:
    a NEW batch (doc_id % MIRROR_DELTA_MOD == 0, the deterministic
    stand-in for today's crawl) is checked against the HISTORY only.
    No delta×delta and no history×history pairs — what makes daily
    ingest O(delta) instead of re-mirroring the corpus.

    The rare-ref table (df ≤ MIRROR_MAX_DF) and the per-doc set sizes
    are computed over the UNION — the delta_lsh_pairs contract: a stock
    ref is stock regardless of which side its occurrences came from,
    and Jaccard set sizes must mean the same thing on both sides. At
    production scale the history side's rare-ref postings are
    precomputed and stored with the corpus; the incremental cost is
    O(delta refs + matched history rows) through one AQE-skew-safe
    equi-join on media_ref whose per-ref fan-out is ≤ max_df²/4 by the
    cap."""
    return media_mirror_delta_from(spans_from(_docs(spark, sf_dir)))


def media_mirror_delta_from(
    spans: DataFrame,
    delta_mod: int = MIRROR_DELTA_MOD,
    max_df: int = MIRROR_MAX_DF,
    min_shared: int = MIRROR_MIN_SHARED,
    min_ppm: int = MIRROR_MIN_PPM,
) -> DataFrame:
    from pyspark.sql.types import NumericType

    # fail loud on a non-numeric doc_id (review r5): the delta split is
    # `doc_id % delta_mod`, and under legacy (non-ANSI) mode a string
    # doc_id (the crawl corpus's URLs) would cast to NULL, BOTH sides
    # would drop every row, and the kernel would return an empty mirror
    # report with no error. Callers with string ids hash them to longs
    # first (the crawl-integration test's recipe); the symmetric
    # media_mirror_from has no split and stays id-type-agnostic.
    if not isinstance(spans.schema["doc_id"].dataType, NumericType):
        raise TypeError(
            "media_mirror_delta_from: doc_id must be numeric for the "
            "delta split (doc_id % delta_mod); hash string ids to longs "
            "first"
        )
    rare, counts = _rare_refs(_doc_ref_table(spans), max_df)
    is_delta = (F.col("doc_id") % delta_mod) == 0
    left = rare.where(is_delta).select(
        F.col("doc_id").alias("delta_id"), "media_ref"
    )
    right = rare.where(~is_delta).select(
        F.col("doc_id").alias("history_id"), "media_ref"
    )
    shared = (
        left.join(right, "media_ref")
        .groupBy("delta_id", "history_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = counts.select(
        F.col("doc_id").alias("delta_id"), F.col("n").alias("n_delta")
    )
    cb = counts.select(
        F.col("doc_id").alias("history_id"), F.col("n").alias("n_history")
    )
    out = (
        shared.join(ca, "delta_id")
        .join(cb, "history_id")
        .withColumn(
            "jaccard_ppm",
            F.expr("1000000 * shared div (n_delta + n_history - shared)"),
        )
    )
    return out.where(
        (F.col("shared") >= min_shared) & (F.col("jaccard_ppm") >= min_ppm)
    ).select(
        "delta_id", "history_id", "shared", "n_delta", "n_history",
        "jaccard_ppm",
    )


def template_pps_sample(
    spark: SparkSession, sf_dir: str, n_target: int | None = None
) -> DataFrame:
    """The composition `template_downweight` exists to feed: PPS
    admission with the TEMPLATE weight as the size measure — a document
    is included with probability min(1, n·weight/W), so the ten-
    thousandth copy of a boilerplate scaffold is sampled at 1/10000th
    the rate of a unique page while every template family retains
    expected-constant representation. This is template-debiased corpus
    sampling, the standard counter to scaffold-dominated web dumps.

    Reuses the ONE shared exact-integer inclusion predicate
    (`curation.pps_admit_col` — hash60('pps:'||doc)·W < n·w·2^60 in
    DECIMAL, no floats, no RNG state), so this sampler, the token-PPS
    batch sampler, and the streaming admission twin cannot drift.

    100 TB shape: downweight's two Exchanges + ONE 1-row scalar agg
    (partial-agg sum of weights) broadcast back; the admission test is
    MAP-ONLY — the composition adds zero corpus-sized shuffles beyond
    its constituent's."""
    from .curation import PPS_N_TARGET

    weights = template_downweight_from(spans_from(_docs(spark, sf_dir)))
    return template_pps_sample_from(
        weights, PPS_N_TARGET if n_target is None else n_target
    )


def template_pps_sample_from(weights: DataFrame, n_target: int) -> DataFrame:
    """``weights``: (doc_id, template_id, n_docs, weight_ppm) — the
    template_downweight_from output shape."""
    from .curation import pps_admit_col

    # checkpoint before the fan-out (review r5): the weights subtree
    # (downweight's counts aggregate + template join) feeds BOTH the
    # scalar total and the admission probe — without this it executes
    # twice and the docstring's plan claim undercounts the real plan
    weights = weights.localCheckpoint()
    total = weights.agg(F.sum("weight_ppm").alias("_w_total"))
    return (
        weights.crossJoin(F.broadcast(total))
        .where(
            pps_admit_col(
                F.col("doc_id"),
                F.col("weight_ppm"),
                F.col("_w_total"),
                n_target,
            )
        )
        .select("doc_id", "template_id", "n_docs", "weight_ppm")
    )


def media_gallery_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gallery-size histogram — the media-axis twin of
    `dedup.minhash_cluster_stats`: how many galleries have k members,
    the table a curation review reads BEFORE deciding gallery-level
    sampling rates (a corpus of 200k 2-image galleries needs a
    different policy than one 400k-image mega-gallery).

    100 TB shape: the component map's node-sized output reduces through
    two partial-agg shuffles (gallery_id → size, size → count); the
    histogram is |distinct sizes|-bounded, a config-scale table."""
    spans = spans_from(_docs(spark, sf_dir))
    return media_gallery_stats_from(media_gallery_from(spans))


def media_gallery_stats_from(gallery: DataFrame) -> DataFrame:
    """``gallery``: (media_ref, gallery_id) — the media_gallery_from
    output shape. Output: (gallery_size, n_galleries, n_refs),
    singletons included (flag-not-filter: gallery_size=1 rows make the
    oracle discriminate in both directions)."""
    sizes = gallery.groupBy("gallery_id").agg(
        F.count(F.lit(1)).alias("gallery_size")
    )
    return sizes.groupBy("gallery_size").agg(
        F.count(F.lit(1)).alias("n_galleries"),
        (F.count(F.lit(1)) * F.col("gallery_size"))
        .cast("long")
        .alias("n_refs"),
    )


CAP_MIN_TOKENS = 3  # caption length band: shorter is a label, not a caption
CAP_MAX_TOKENS = 30  # longer is body prose, not a caption
CAP_LEN_BONUS_PPM = 500_000  # in-band length contributes half the score


def caption_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-candidate quality scoring — the selection stage after
    `caption_pairs` mines candidates: an image-text trainer keeps ONE
    caption per media span, and "the nearest text" is often a nav label
    or body prose. Each side (the text before / after the media span)
    scores in exact integer ppm: in-band token length (3–30, the
    caption-length prior) contributes CAP_LEN_BONUS_PPM, alphabetic
    character density the other half — length-banded alpha density, the
    textstats.quality_score heuristics in fixed point. The best side
    wins; ties prefer 'before' (preceding prose is the likelier caption,
    and the tiebreak must be deterministic for the oracle).

    100 TB shape: MAP-ONLY over caption_pairs' output — the composition
    adds zero shuffles to its constituent's one doc_id Exchange. All
    arithmetic integer, all regexes ASCII-class (the scrub.py RE2-parity
    discipline), tokenization the ONE shared tokens_col."""
    return caption_quality_from(caption_pairs_from(spans_from(_docs(spark, sf_dir))))


def caption_quality_from(pairs: DataFrame) -> DataFrame:
    """``pairs``: the caption_pairs_from output shape
    (doc_id, media_ref, kind, offset, before_text, after_text)."""
    from .text import tokens_col

    def side(colname: str, out: str) -> F.Column:
        t = F.col(colname)
        n = F.when(F.length(t) == 0, F.lit(0)).otherwise(
            F.size(tokens_col(t))
        )
        # half the ppm of alphabetic chars, exact integer div at every
        # step (never /2 -> double); empty text -> 0. ASCII class only
        # (the scrub.py RE2-parity discipline)
        half_alpha = F.when(
            F.length(t) == 0, F.lit(0).cast("long")
        ).otherwise(
            F.expr(
                f"(1000000L * length(regexp_replace({colname}, "
                f"'[^A-Za-z]', '')) div length({colname})) div 2L"
            )
        )
        len_ok = n.between(CAP_MIN_TOKENS, CAP_MAX_TOKENS).cast("long")
        return (len_ok * CAP_LEN_BONUS_PPM + half_alpha).alias(out)

    # the oracle mirrors score = len_ok*BONUS + (1e6*alpha // chars) // 2
    scored = pairs.select(
        "doc_id",
        "media_ref",
        "offset",
        side("before_text", "before_score_ppm"),
        side("after_text", "after_score_ppm"),
    )
    return scored.select(
        "doc_id",
        "media_ref",
        "offset",
        "before_score_ppm",
        "after_score_ppm",
        F.when(
            F.col("before_score_ppm") >= F.col("after_score_ppm"),
            F.lit("before"),
        )
        .otherwise(F.lit("after"))
        .alias("best_side"),
        F.greatest("before_score_ppm", "after_score_ppm").alias(
            "best_score_ppm"
        ),
    )
