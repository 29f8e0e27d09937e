"""Interleaved text+media span operators (operators/interleaved.py):
structural invariants the contract sweep's value oracles don't state
directly — span-order shape, fetch-once arithmetic, pop budgets, and
packing-layout consistency."""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scrappy_spark.operators import interleaved as il  # noqa: E402


def test_spans_interleave_shape(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sp = il.spans_from(docs).cache()
    try:
        # text spans at even offsets, media at odd — and every media span
        # is preceded by the text chunk it follows (offset-1 exists)
        assert sp.where(
            (F.col("kind") == "text") & (F.col("offset") % 2 != 0)
        ).count() == 0
        assert sp.where(
            (F.col("kind") != "text") & (F.col("offset") % 2 == 0)
        ).count() == 0
        media = sp.where(F.col("media_ref").isNotNull()).select(
            F.col("doc_id").alias("m_doc"),
            (F.col("offset") - 1).alias("want_toff"),
            "media_ref",
        )
        text = sp.where(F.col("kind") == "text").select(
            F.col("doc_id").alias("m_doc"), F.col("offset").alias("want_toff")
        )
        orphan = media.join(text, ["m_doc", "want_toff"], "left_anti")
        assert orphan.count() == 0
        # chunking loses no words: sum of per-chunk word counts == doc's
        n_words_spans = (
            sp.where(F.col("kind") == "text")
            .groupBy("doc_id")
            .agg(F.sum(F.size(F.split("text", " "))).alias("n"))
        )
        n_words_docs = docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("m")
        )
        bad = n_words_spans.join(n_words_docs, "doc_id").where(
            F.col("n") != F.col("m")
        )
        assert bad.count() == 0
        # media kind is a property of the ref: no ref maps to both kinds
        two_kinds = (
            sp.where(F.col("media_ref").isNotNull())
            .groupBy("media_ref")
            .agg(F.countDistinct("kind").alias("k"))
            .where(F.col("k") > 1)
        )
        assert two_kinds.count() == 0
    finally:
        sp.unpersist()


def test_fetch_once_savings_arithmetic(spark, sf_dir):
    out = il.fetch_once(spark, sf_dir)
    # saved = (n_requests - 1) * n_bytes, and only shared refs appear
    bad = out.where(
        (F.col("saved_bytes") != (F.col("n_requests") - 1) * F.col("n_bytes"))
        | (F.col("n_requests") < 2)
        | (F.col("n_docs") > F.col("n_requests"))
    )
    assert bad.count() == 0
    assert out.count() > 0  # the 211-ref space guarantees sharing at any sf


def test_caption_pairs_neighbors_are_chunks(spark, sf_dir):
    out = il.caption_pairs(spark, sf_dir)
    # before-text always exists (media follows a chunk) and is ≤8 words
    bad = out.where(
        (F.col("before_text") == "")
        | (F.size(F.split("before_text", " ")) > il.CHUNK_WORDS)
    )
    assert bad.count() == 0


def test_media_pop_budgets(spark, sf_dir):
    out = il.media_pop(spark, sf_dir).cache()
    try:
        per_host = {
            r["host"]: r["n"]
            for r in out.groupBy("host").agg(F.count("*").alias("n")).collect()
        }
        for host, n in per_host.items():
            budget = {"cdn0": 1, "cdn1": 5}.get(host, 3)
            assert n <= budget, (host, n)
        # popularity-first: a popped ref's n_refs is >= every unpopped
        # ref's n_refs on the same host unless the unpopped lost a tie
        # on discovery seq — spot-check via the max unpopped n_refs
        assert out.count() > 0
    finally:
        out.unpersist()


def test_pack_multimodal_layout(spark, sf_dir):
    out = il.pack_multimodal(spark, sf_dir).cache()
    try:
        # layout is gap-free per shard: sum(cost) == max(stream_off+cost)
        chk = (
            out.groupBy("shard")
            .agg(
                F.sum("cost").alias("total"),
                F.max(F.col("stream_off") + F.col("cost")).alias("hi"),
            )
            .where(F.col("total") != F.col("hi"))
        )
        assert chk.count() == 0
        # pack arithmetic consistent
        bad = out.where(
            F.col("pack_id") * il.MM_SEQ_LEN + F.col("pack_off")
            != F.col("stream_off")
        )
        assert bad.count() == 0
        # media makes docs cost more than their word count
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", F.size(F.split("text", " ")).alias("n_words")
        )
        cheaper = out.join(docs, "doc_id").where(
            F.col("cost") < F.col("n_words")
        )
        assert cheaper.count() == 0
    finally:
        out.unpersist()


def test_clean_rebuild_semantics(spark, sf_dir):
    """Quality gate + orphan-media drop + contiguous renumbering, checked
    structurally (the value oracle checks the full table)."""
    out = il.clean_rebuild(spark, sf_dir).cache()
    try:
        # no surviving text span under the gate
        assert out.where(
            (F.col("kind") == "text")
            & (F.size(F.split("text", " ")) < il.MIN_SPAN_WORDS)
        ).count() == 0
        # new offsets are contiguous 0..n-1 per doc
        chk = out.groupBy("doc_id").agg(
            F.count("*").alias("n"),
            F.min("new_offset").alias("lo"),
            F.max("new_offset").alias("hi"),
            F.countDistinct("new_offset").alias("d"),
        )
        assert chk.where(
            (F.col("lo") != 0)
            | (F.col("hi") != F.col("n") - 1)
            | (F.col("d") != F.col("n"))
        ).count() == 0
        # every surviving media span's ORIGINAL anchor survived: join back
        anchors = out.where(F.col("kind") == "text").select(
            "doc_id", F.col("offset").alias("aoff")
        )
        media = out.where(F.col("kind") != "text").select(
            "doc_id", (F.col("offset") - 1).alias("aoff")
        )
        assert media.join(anchors, ["doc_id", "aoff"], "left_anti").count() == 0
        # the gate is non-vacuous both ways on the derived corpus
        n_in = il.spans_from(
            spark.read.parquet(f"{sf_dir}/documents.parquet")
        ).count()
        n_out = out.count()
        assert 0 < n_out < n_in
    finally:
        out.unpersist()


def test_interleaved_plan_shapes(spark, sf_dir):
    """Pin the documented plan shapes: single parquet scan everywhere
    (the array-of-structs construction, not a self-union), and
    clean_rebuild's two windows share ONE exchange + sort."""
    for fn, n_exchange in (
        (il.media_stats, 2),  # partial agg + distinct two-phase
        (il.caption_pairs, 1),
        (il.clean_rebuild, 1),
        (il.pack_multimodal, 2),
    ):
        plan = (
            fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        )
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("FileScan parquet") == 1, fn.__name__
        assert (
            final.count("Exchange hashpartitioning") == n_exchange
        ), fn.__name__
        assert "Exchange SinglePartition" not in final, fn.__name__


def test_pipeline_multimodal_composition_discriminates(spark, sf_dir):
    """The composed pipeline is pack-over-CLEANED spans: its per-doc cost
    differs from pack-over-raw wherever the gate dropped spans, and docs
    that lost every span vanish from the layout."""
    raw = il.pack_multimodal(spark, sf_dir).select(
        "doc_id", F.col("cost").alias("raw_cost")
    )
    piped = il.pipeline_multimodal(spark, sf_dir).select("doc_id", "cost")
    j = piped.join(raw, "doc_id").cache()
    try:
        assert j.where(F.col("cost") > F.col("raw_cost")).count() == 0
        # the gate is non-vacuous: some doc got cheaper
        assert j.where(F.col("cost") < F.col("raw_cost")).count() > 0
    finally:
        j.unpersist()


def _general_spans(spark, rows):
    """(doc_id, kind, text, media_ref, offset) general span table."""
    return spark.createDataFrame(
        rows, "doc_id long, kind string, text string, media_ref string, offset int"
    )


def test_spans_from_null_text_doc_emits_nothing(spark):
    """Review r5 regression: size(split(NULL))=-1 made sequence(0,-1)
    emit TWO garbage chunks ([0,-1], Spark's default step -1) for a
    NULL-text document where the DuckDB mirror emits zero rows."""
    docs = spark.createDataFrame(
        [(1, "a", "one two three"), (2, "a", None)],
        "doc_id long, source string, text string",
    )
    sp = il.spans_from(docs)
    assert sp.where(F.col("doc_id") == 2).count() == 0
    assert sp.where(F.col("doc_id") == 1).count() >= 1
    assert sp.where(F.col("offset") < 0).count() == 0


def test_clean_rebuild_media_burst_shares_prose_anchor(spark):
    """Review r5 regression: in a consecutive-media burst every span
    shares the nearest preceding non-media anchor — the old lag('_kt')
    kept only the burst's FIRST span (its predecessor is media, whose
    _kt is hardwired False)."""
    rows = [
        # doc 1: good prose, then a 3-media burst -> ALL THREE survive
        (1, "text", "alpha beta gamma delta", None, 0),
        (1, "media", None, "m://cdn1/1", 1),
        (1, "media", None, "m://cdn1/2", 2),
        (1, "media", None, "m://cdn1/3", 3),
        # doc 2: junk prose, then a burst -> none survive
        (2, "text", "short", None, 0),
        (2, "media", None, "m://cdn1/4", 1),
        (2, "media", None, "m://cdn1/5", 2),
        # doc 3: media-first (no anchor at all) -> dropped
        (3, "media", None, "m://cdn1/6", 0),
        (3, "text", "eins zwei drei vier fünf", None, 1),
    ]
    out = il.clean_rebuild_from(_general_spans(spark, rows)).cache()
    try:
        kept1 = sorted(
            r["offset"] for r in out.where(F.col("doc_id") == 1).collect()
        )
        assert kept1 == [0, 1, 2, 3]
        assert out.where(F.col("doc_id") == 2).count() == 0
        kept3 = [
            (r["kind"], r["new_offset"])
            for r in out.where(F.col("doc_id") == 3).collect()
        ]
        assert kept3 == [("text", 0)]
    finally:
        out.unpersist()


def test_pack_multimodal_partial_costs_fail_loud(spark):
    """Review r5 regression: a media kind missing from a caller-supplied
    media_costs map raised nothing and was costed as ~1 text token."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [
        (1, "text", "a b c d", None, 0),
        (1, "video", None, "m://cdn0/9", 1),
    ]
    spans = _general_spans(spark, rows)
    with pytest.raises(SparkRuntimeException, match="no media cost"):
        il.pack_multimodal_from(spans, media_costs={"image": 64}).collect()
    # complete map works, and the cost reflects the map
    row = il.pack_multimodal_from(
        spans, media_costs={"image": 64, "video": 256}
    ).collect()[0]
    assert row["cost"] == 4 + 256


def test_media_pop_seq_key_no_cross_doc_collision(spark):
    """Review r5 regression: the old doc_id*1000+offset discovery key
    inverted FIFO across docs once offsets passed 999."""
    rows = [
        # ref A first discovered at (doc 5, offset 1400); ref B at
        # (doc 6, offset 400). Under the old key: 5*1000+1400 = 6400 vs
        # 6*1000+400 = 6400 — a tie (nondeterministic), and doc 5's
        # offset 1500 would sort AFTER doc 6. The lpad key keeps
        # (doc_id, offset) lexicographic = true discovery order.
        (5, "media", None, "m://cdn2/A", 1400),
        (6, "media", None, "m://cdn2/B", 400),
    ]
    seq = il.F.min(
        il.F.concat(
            il.F.lpad(il.F.col("doc_id").cast("string"), 20, "0"),
            il.F.lpad(il.F.col("offset").cast("string"), 10, "0"),
        )
    ).alias("seq")
    popped = il.media_pop_from(
        _general_spans(spark, rows), seq, per_host_budget=1
    ).collect()
    # equal popularity -> FIFO on first discovery: doc 5 wins
    assert [r["uri"] for r in popped] == ["m://cdn2/A"]


def test_template_groups_shape_not_prose(spark):
    """Templates group by span SHAPE: same word-count/kind sequence with
    different prose groups together; a different shape does not; below-
    min_docs shapes are dropped."""
    rows = [
        # docs 1 & 2: same shape (t4 . i . t2) with different prose
        (1, "text", "alpha beta gamma delta", None, 0),
        (1, "image", None, "m://cdn1/1", 1),
        (1, "text", "eps zeta", None, 2),
        (2, "text", "one two three four", None, 0),
        (2, "image", None, "m://cdn1/9", 1),
        (2, "text", "five six", None, 2),
        # doc 3: same codes, different order (t4 . t2 . i) -> own group
        (3, "text", "a b c d", None, 0),
        (3, "text", "e f", None, 1),
        (3, "image", None, "m://cdn1/2", 2),
        # doc 4: video instead of image -> own group
        (4, "text", "w x y z", None, 0),
        (4, "video", None, "m://cdn0/5", 1),
        (4, "text", "u v", None, 2),
    ]
    out = il.template_groups_from(_general_spans(spark, rows)).collect()
    assert len(out) == 1  # only the doc-1/doc-2 shape reaches min_docs=2
    assert out[0]["n_docs"] == 2
    assert out[0]["example_doc"] == 1
    assert out[0]["n_spans"] == 3
    # min_docs=1 exposes all three distinct shapes
    all_groups = il.template_groups_from(
        _general_spans(spark, rows), min_docs=1
    ).collect()
    assert len(all_groups) == 3


def test_media_decontaminate_flag_both_directions(spark):
    """Contamination is a per-doc flag in BOTH directions, counts media
    spans only, and a LINK span carrying the benchmark URL in media_ref
    must not match (kind gate)."""
    rows = [
        (1, "text", "a b c d", None, 0),
        (1, "image", None, "m://cdn1/7", 1),  # benchmark hit
        (1, "image", None, "m://cdn1/8", 2),
        (2, "text", "e f g h", None, 0),
        (2, "image", None, "m://cdn1/8", 1),  # clean
        # doc 3: a link span references the benchmark object -> NOT a hit
        (3, "text", "i j k l", None, 0),
        (3, "link", None, "m://cdn1/7", 1),
    ]
    bench = spark.createDataFrame([("m://cdn1/7",)], "media_ref string")
    out = {
        r["doc_id"]: r
        for r in il.media_decontaminate_from(
            _general_spans(spark, rows), bench
        ).collect()
    }
    assert out[1]["contaminated"] == 1 and out[1]["n_bench_hits"] == 1
    assert out[1]["n_media"] == 2
    assert out[2]["contaminated"] == 0 and out[2]["n_bench_hits"] == 0
    assert out[3]["contaminated"] == 0 and out[3]["n_media"] == 0


def test_media_cooccur_cap_and_threshold(spark):
    """Pairs come from docs under the ref cap only (the cap excludes the
    doc BEFORE the quadratic expansion), pairs are lexicographically
    ordered, and sub-threshold pairs drop."""
    rows = []
    # docs 1 & 2 both contain refs {A, B} -> pair (A, B) with n_docs=2
    for d in (1, 2):
        rows += [
            (d, "image", None, "m://cdn1/A", 0),
            (d, "image", None, "m://cdn1/B", 1),
        ]
    # doc 3 contains {B, C} only once -> pair below min_docs, dropped
    rows += [
        (3, "image", None, "m://cdn1/B", 0),
        (3, "image", None, "m://cdn1/C", 1),
    ]
    # doc 4 exceeds the cap (3 refs with max_refs=2): even though it
    # contains {A, B}, it must not contribute
    rows += [
        (4, "image", None, "m://cdn1/A", 0),
        (4, "image", None, "m://cdn1/B", 1),
        (4, "image", None, "m://cdn1/C", 2),
    ]
    out = il.media_cooccur_from(
        _general_spans(spark, rows), max_refs=2, min_docs=2
    ).collect()
    assert len(out) == 1
    assert (out[0]["ref_a"], out[0]["ref_b"]) == ("m://cdn1/A", "m://cdn1/B")
    assert out[0]["n_docs"] == 2
    # duplicate spans of the same ref within a doc count the DOC once
    dup = [
        (7, "image", None, "m://cdn1/X", 0),
        (7, "image", None, "m://cdn1/X", 1),
        (7, "image", None, "m://cdn1/Y", 2),
        (8, "image", None, "m://cdn1/X", 0),
        (8, "image", None, "m://cdn1/Y", 1),
    ]
    out2 = il.media_cooccur_from(_general_spans(spark, dup)).collect()
    assert len(out2) == 1 and out2[0]["n_docs"] == 2


def test_template_downweight_exact_ppm(spark):
    """Templated docs split the weight (1e6 // n_docs, exact integer);
    unique docs keep full weight; template ids and group sizes agree
    with template_groups on the same input."""
    rows = [
        # docs 1 & 2: same shape (t4 . i . t2), different prose
        (1, "text", "alpha beta gamma delta", None, 0),
        (1, "image", None, "m://cdn1/1", 1),
        (1, "text", "eps zeta", None, 2),
        (2, "text", "one two three four", None, 0),
        (2, "image", None, "m://cdn1/9", 1),
        (2, "text", "five six", None, 2),
        # doc 3: unique shape
        (3, "text", "a b c", None, 0),
    ]
    spans = _general_spans(spark, rows)
    out = {r["doc_id"]: r for r in il.template_downweight_from(spans).collect()}
    assert len(out) == 3  # one row per document, singletons included
    assert out[1]["n_docs"] == 2 and out[1]["weight_ppm"] == 500_000
    assert out[2]["weight_ppm"] == 500_000
    assert out[1]["template_id"] == out[2]["template_id"]
    assert out[3]["n_docs"] == 1 and out[3]["weight_ppm"] == 1_000_000
    assert out[3]["template_id"] != out[1]["template_id"]
    # composition consistency: the shared template's (id, n_docs) match
    # template_groups over the same spans
    grp = il.template_groups_from(spans).collect()
    assert len(grp) == 1
    assert grp[0]["template_id"] == out[1]["template_id"]
    assert grp[0]["n_docs"] == 2
    # integer floor, not rounding: 3-doc template -> 333333 ppm
    three = [
        (d, "text", "p q", None, 0) for d in (10, 11, 12)
    ]
    w = il.template_downweight_from(_general_spans(spark, three)).collect()
    assert all(r["weight_ppm"] == 333_333 for r in w)


def test_media_mirror_exact_jaccard_and_df_cap(spark):
    """Hand-built rare/stock media sets: exact ppm Jaccard, min_shared
    gate, threshold boundary, and the df cap excluding stock refs from
    both the pair evidence AND the set sizes."""
    def m(doc, ref, off):
        return (doc, "image", None, f"m://cdn0/{ref}", off)

    rows = []
    # docs 1 & 2: identical rare sets {r1, r2} -> jaccard 1.0
    rows += [m(1, "r1", 1), m(1, "r2", 3), m(2, "r1", 1), m(2, "r2", 3)]
    # doc 3 shares only r1 with doc 1 -> shared=1 < min_shared, excluded
    rows += [m(3, "r1", 1), m(3, "r3", 3)]
    # doc 4: {r1, r2, r4, r5} vs doc 1 {r1, r2}: shared 2, union 4 ->
    # exactly 500000 ppm, ON the >= threshold
    rows += [m(4, "r1", 1), m(4, "r2", 3), m(4, "r4", 5), m(4, "r5", 7)]
    # doc 5: {r4, r5, r6} vs doc 4: shared 2, union 5 -> 400000, excluded
    rows += [m(5, "r4", 1), m(5, "r5", 3), m(5, "r6", 5)]
    # stock ref s0 in 9 docs (> MIRROR_MAX_DF=8): docs 20/21 share
    # {s0, r7, r8} -> with the cap, shared=2 over sets of size 2
    for d in (20, 21, 30, 31, 32, 33, 34, 35, 36):
        rows.append(m(d, "s0", 9))
    rows += [m(20, "r7", 1), m(20, "r8", 3), m(21, "r7", 1), m(21, "r8", 3)]
    # text spans must be ignored entirely
    rows += [(1, "text", "alpha beta", None, 0), (2, "text", "x y", None, 0)]
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in il.media_mirror_from(_general_spans(spark, rows)).collect()
    }
    assert set(out) == {(1, 2), (1, 4), (2, 4), (20, 21)}
    assert out[(1, 2)]["jaccard_ppm"] == 1_000_000
    assert out[(1, 2)]["shared"] == 2 and out[(1, 2)]["n_a"] == 2
    assert out[(1, 4)]["jaccard_ppm"] == 500_000  # boundary: kept
    assert out[(1, 4)]["n_b"] == 4
    # the stock ref neither pairs docs nor inflates set sizes
    assert out[(20, 21)]["shared"] == 2
    assert out[(20, 21)]["n_a"] == 2 and out[(20, 21)]["n_b"] == 2
    assert out[(20, 21)]["jaccard_ppm"] == 1_000_000


def test_media_gallery_components_singletons(spark):
    """Transitive gallery over the cooccur graph: a-b and b-c edges (each
    in >= 2 docs) merge {a,b,c}; a pair below COOCCUR_MIN_DOCS does NOT
    edge; a ref with no qualifying edge keeps itself as gallery_id."""
    def doc(doc_id, refs):
        return [
            (doc_id, "image", None, f"m://x/{r}", i * 2 + 1)
            for i, r in enumerate(refs)
        ]

    rows = []
    # a-b in docs 1,2 ; b-c in docs 3,4  -> component {a,b,c}
    rows += doc(1, ["a", "b"]) + doc(2, ["a", "b"])
    rows += doc(3, ["b", "c"]) + doc(4, ["b", "c"])
    # c-d co-occur ONCE only -> no edge; d stays singleton
    rows += doc(5, ["c", "d"])
    # e appears alone -> singleton
    rows += doc(6, ["e"])
    got = {
        r["media_ref"]: r["gallery_id"]
        for r in il.media_gallery_from(_general_spans(spark, rows)).collect()
    }
    assert got == {
        "m://x/a": "m://x/a",
        "m://x/b": "m://x/a",
        "m://x/c": "m://x/a",
        "m://x/d": "m://x/d",
        "m://x/e": "m://x/e",
    }


def test_context_windows_caption_atomic_greedy(spark):
    """Greedy fill at an explicit seq_len: a text+image atom never
    splits, oversize atoms take a window alone and are flagged, leading
    media forms atom 0, and a media burst rides with its anchor text."""
    t = lambda d, n, off: (d, "text", " ".join(["w"] * n), None, off)
    img = lambda d, off: (d, "image", None, "m://x/i", off)
    vid = lambda d, off: (d, "video", None, "m://x/v", off)

    # doc 1: [t40+img64]=104 | t30, t30 | t50
    rows = [t(1, 40, 0), img(1, 1), t(1, 30, 2), t(1, 30, 3), t(1, 50, 4)]
    # doc 2: leading image (atom 0) + t10 share window 0 (74 <= 100)
    rows += [img(2, 0), t(2, 10, 1)]
    # doc 3: one atom t4+img+vid+img = 388, alone and oversize
    rows += [t(3, 4, 0), img(3, 1), vid(3, 2), img(3, 3)]
    out = il.context_windows_from(_general_spans(spark, rows), seq_len=100)
    got = {
        (r["doc_id"], r["window_id"]): r for r in out.collect()
    }
    assert set(got) == {(1, 0), (1, 1), (1, 2), (2, 0), (3, 0)}
    w = got[(1, 0)]
    assert (w["n_atoms"], w["n_spans"], w["n_media"], w["cost"],
            w["oversize"]) == (1, 2, 1, 104, 1)
    w = got[(1, 1)]
    assert (w["n_atoms"], w["cost"], w["oversize"]) == (2, 60, 0)
    assert got[(1, 2)]["cost"] == 50
    w = got[(2, 0)]
    assert (w["n_atoms"], w["n_spans"], w["n_media"], w["cost"]) == (
        2, 2, 1, 74)
    w = got[(3, 0)]
    assert (w["n_atoms"], w["n_spans"], w["n_media"], w["cost"],
            w["oversize"]) == (1, 4, 3, 388, 1)


def test_media_mirror_delta_asymmetry(spark):
    """Delta×history only: no delta×delta, no history×history; the
    symmetric kernel's pairs split exactly into delta-crossing pairs
    (found, re-oriented) and same-side pairs (absent)."""
    def m(doc, ref, off):
        return (doc, "image", None, f"m://cdn0/{ref}", off)

    rows = []
    # delta docs (doc_id % 3 == 0): 3, 6 ; history: 1, 2
    # identical sets {r1, r2} everywhere -> all 6 unordered pairs mirror
    for d in (1, 2, 3, 6):
        rows += [m(d, "r1", 1), m(d, "r2", 3)]
    out = il.media_mirror_delta_from(_general_spans(spark, rows)).collect()
    got = {(r["delta_id"], r["history_id"]) for r in out}
    # delta {3,6} × history {1,2} = 4 crossing pairs; (1,2) and (3,6)
    # are same-side and must NOT appear
    assert got == {(3, 1), (3, 2), (6, 1), (6, 2)}
    for r in out:
        assert r["jaccard_ppm"] == 1_000_000
        assert r["n_delta"] == 2 and r["n_history"] == 2
    # consistency with the symmetric kernel: every crossing pair it
    # finds appears here with the same jaccard
    sym = il.media_mirror_from(_general_spans(spark, rows)).collect()
    crossing = {
        (b, a) if b % 3 == 0 else (a, b): r["jaccard_ppm"]
        for r in sym
        for a, b in [(r["doc_a"], r["doc_b"])]
        if (a % 3 == 0) != (b % 3 == 0)
    }
    assert crossing == {p: 1_000_000 for p in got}


def test_template_pps_sample_debias(spark):
    """Template-debiased PPS: the inclusion predicate is the shared
    pps_admit_col evaluated on weight_ppm — verified against a pure-
    python replica over a corpus with one dominant template; always-in
    algebra (n·w >= W) includes every doc when n_target is large."""
    import hashlib

    rows = []
    # 40 docs of one scaffold (weight 25_000 each), 2 unique docs
    for d in range(1, 41):
        rows += [(d, "text", "a b c", None, 0)]
    rows += [(100, "text", "p q r s t u", None, 0),
             (101, "text", "one two three four five six seven", None, 1)]
    spans = _general_spans(spark, rows)
    weights = {r["doc_id"]: r["weight_ppm"]
               for r in il.template_downweight_from(spans).collect()}
    assert weights[1] == 25_000 and weights[100] == 1_000_000

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    n_target = 8
    W = sum(weights.values())
    want = {
        d for d, w in weights.items()
        if h60(f"pps:{d}") * W < n_target * w * (1 << 60)
    }
    got = {
        r["doc_id"]
        for r in il.template_pps_sample_from(
            il.template_downweight_from(spans), n_target
        ).collect()
    }
    assert got == want
    # debiasing is live: unique docs are ~40x likelier per doc; with
    # these weights the template's EXPECTED draw is n·(40·25k)/W ≈ 2.7
    # of 40 docs while each unique doc is included with p ≈ 2.7/1000000·40…
    # the exact sets above already pin the arithmetic; just assert the
    # sample is a proper subset and nonempty
    assert 0 < len(got) < len(weights)
    # always-in: huge n_target admits everything (min(1,·) algebra)
    all_in = il.template_pps_sample_from(
        il.template_downweight_from(spans), 10_000_000
    ).count()
    assert all_in == len(weights)


def test_media_mirror_delta_rejects_string_ids(spark):
    """Review r5 regression: a string doc_id would NULL-cast under the
    legacy mode's delta split and silently empty BOTH sides — the kernel
    fails loud instead; callers hash string ids to longs first."""
    import pytest

    spans = spark.createDataFrame(
        [("u://a", "image", None, "m://x/r", 1)],
        "doc_id string, kind string, text string, media_ref string, "
        "offset int",
    )
    with pytest.raises(TypeError, match="doc_id must be numeric"):
        il.media_mirror_delta_from(spans)


def test_media_gallery_stats_histogram(spark):
    """Size histogram over the component map: the {a,b,c}+singleton
    graph from the gallery test rolls up to one 3-gallery and two
    1-galleries, with ref counts conserved."""
    def doc(doc_id, refs):
        return [
            (doc_id, "image", None, f"m://x/{r}", i * 2 + 1)
            for i, r in enumerate(refs)
        ]

    rows = []
    rows += doc(1, ["a", "b"]) + doc(2, ["a", "b"])
    rows += doc(3, ["b", "c"]) + doc(4, ["b", "c"])
    rows += doc(5, ["c", "d"])  # c-d below min_docs: d singleton
    rows += doc(6, ["e"])
    spans = _general_spans(spark, rows)
    got = {
        r["gallery_size"]: (r["n_galleries"], r["n_refs"])
        for r in il.media_gallery_stats_from(
            il.media_gallery_from(spans)
        ).collect()
    }
    assert got == {3: (1, 3), 1: (2, 2)}
    assert sum(n for _, n in got.values()) == 5  # all refs accounted


def test_media_gallery_stats_rollup_adds_no_recomputation(spark):
    """Plan guard (VERDICT r5 #2): the stats rollup must aggregate the
    ALREADY-MATERIALIZED component map — its physical plan is two
    aggregations over the kernel's final checkpoint scan, never a
    re-execution of the pair generation or the CC loop (no joins, no
    span/parquet scans). The r5 regression this pins was ultimately the
    checkpoint stats compounding, but the invariant 'rollup == two aggs
    over an RDD scan' is what makes the stats entry cost its own two
    shuffles and nothing else."""
    def doc(doc_id, refs):
        return [
            (doc_id, "image", None, f"m://x/{r}", i * 2 + 1)
            for i, r in enumerate(refs)
        ]

    rows = doc(1, ["a", "b"]) + doc(2, ["a", "b"]) + doc(3, ["e"])
    spans = _general_spans(spark, rows)
    stats = il.media_gallery_stats_from(il.media_gallery_from(spans))
    plan = stats._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    for forbidden in ("Join", "Scan parquet", "Generate", "Window"):
        assert forbidden not in plan, f"rollup plan re-runs upstream: {forbidden}"
    """Exact fixed-point caption scores: in-band all-alpha text scores
    the full 1e6; out-of-band (too short / body prose) loses the length
    bonus; digits/punct dilute alpha ppm; ties prefer 'before'."""
    def pairs(rows):
        return spark.createDataFrame(
            rows,
            "doc_id long, media_ref string, kind string, offset int, "
            "before_text string, after_text string",
        )

    out = {
        r["offset"]: r
        for r in il.caption_quality_from(
            pairs(
                [
                    # before: 4 alpha words (in-band, all alpha+spaces)
                    # 'a cat on mat' = 12 chars, 9 alpha -> alpha_ppm
                    # 750000 -> half 375000 + 500000 = 875000
                    (1, "m://x/1", "image", 1, "a cat on mat", ""),
                    # too short (2 tokens): no bonus; 'hi yo' 5 chars,
                    # 4 alpha -> 800000 // 2 = 400000
                    (1, "m://x/2", "image", 3, "hi yo", ""),
                    # digits dilute: '1 2 3 4' in-band (4 tokens) but
                    # 0 alpha -> exactly the 500000 bonus
                    (1, "m://x/3", "image", 5, "1 2 3 4", ""),
                    # tie: identical sides -> 'before'
                    (1, "m://x/4", "image", 7, "one two three", "one two three"),
                    # after wins when before is empty
                    (1, "m://x/5", "image", 9, "", "a fine caption here"),
                ]
            )
        ).collect()
    }
    assert out[1]["before_score_ppm"] == 875_000
    assert out[1]["best_side"] == "before"
    assert out[3]["before_score_ppm"] == 400_000
    assert out[5]["before_score_ppm"] == 500_000
    assert out[7]["best_side"] == "before"  # deterministic tie
    assert out[9]["best_side"] == "after"
    assert out[9]["before_score_ppm"] == 0
    assert out[9]["best_score_ppm"] == out[9]["after_score_ppm"] > 0
