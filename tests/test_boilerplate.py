"""Sequence-level boilerplate dedup (round 4): line mode with planted
nav-bar/footer corpora, chunk mode vs a pure-python oracle."""

import re
from collections import Counter

from pyspark.sql import functions as F

from scrappy_spark.operators import boilerplate


def test_line_mode_strips_planted_navbar(spark):
    """A nav line shared by all docs and a footer shared by 3 of 4 are
    boilerplate at max_df=2; each doc's own body lines (df=1) survive in
    order; a doc that is ALL boilerplate survives with empty text."""
    nav = "Home | About | Contact"
    footer = "(c) 2024 Example Corp"
    docs = spark.createDataFrame(
        [
            ("d0", f"{nav}\nunique zero body\n{footer}"),
            ("d1", f"{nav}\nfirst body line\nsecond body line\n{footer}"),
            ("d2", f"{nav}\nanother document\n{footer}"),
            ("d3", f"{nav}\n{nav}"),  # all boilerplate (nav twice)
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in boilerplate.boilerplate_clean_from(
            docs, max_df=2, mode="line"
        ).collect()
    }
    assert out["d0"] == ("unique zero body", 1, 2)
    assert out["d1"] == ("first body line second body line", 2, 2)
    assert out["d2"] == ("another document", 1, 2)
    assert out["d3"] == ("", 0, 2)


def test_line_mode_keeps_low_df_lines(spark):
    """A line in exactly max_df docs is NOT boilerplate."""
    docs = spark.createDataFrame(
        [("a", "shared pair\nalpha"), ("b", "shared pair\nbeta"), ("c", "gamma")],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in boilerplate.boilerplate_clean_from(
            docs, max_df=2, mode="line"
        ).collect()
    }
    assert out == {"a": "shared pair alpha", "b": "shared pair beta", "c": "gamma"}


def test_chunk_mode_matches_python_oracle(spark, sf_dir):
    """Chunk mode over the real table == an independent pure-python
    reimplementation (segmentation, per-doc-distinct df, drop, ordered
    rebuild)."""
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    k, max_df = boilerplate.CHUNK_K, boilerplate.MAX_DF
    segs = {}
    for r in rows:
        toks = re.split(r"\s+", r["text"].strip())
        segs[r["doc_id"]] = [
            " ".join(toks[i * k : i * k + k]) for i in range(len(toks) // k)
        ]
    df = Counter()
    for ss in segs.values():
        for s in set(ss):
            df[s] += 1
    want = {}
    for did, ss in segs.items():
        kept = [s for s in ss if df[s] <= max_df]
        want[did] = (" ".join(kept), len(kept), len(ss) - len(kept))
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in boilerplate.boilerplate_clean(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(1 for _, _, nd in want.values() if nd > 0) > 0  # non-vacuous


def test_intra_doc_repeat_counts_once(spark):
    """A segment repeated 5x inside ONE doc has df=1 — not boilerplate."""
    docs = spark.createDataFrame(
        [("a", "\n".join(["echo line"] * 5)), ("b", "other")],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_kept"])
        for r in boilerplate.boilerplate_clean_from(
            docs, max_df=2, mode="line"
        ).collect()
    }
    assert out["a"] == ("echo line echo line echo line echo line echo line", 5)


def test_segments_pushes_filter_to_scan(spark, sf_dir):
    """The chunk segmenter is a map-side explode over the parquet scan —
    no shuffle before the df groupBy (scale contract)."""
    seg = boilerplate.segments(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), "chunk"
    )
    plan = seg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_passage_dedup_removes_planted_duplicate_run(spark):
    """A ≥min_run-token passage shared by two docs is removed from BOTH
    at different alignments; short shared runs and unique text stay."""
    passage = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens
    docs = spark.createDataFrame(
        [
            ("a", f"alpha beta {passage} gamma delta"),
            ("b", f"{passage} epsilon zeta eta theta iota"),
            ("c", "alpha beta gamma delta epsilon unique words only here"),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in boilerplate.duplicate_passage_clean_from(
            docs, k=3, min_run=8
        ).collect()
    }
    assert out["a"][0] == "alpha beta gamma delta" and out["a"][1] == 10
    assert out["b"][0] == "epsilon zeta eta theta iota" and out["b"][1] == 10
    # doc c shares 3-shingles with nobody as an 8-token run — untouched
    assert out["c"][1] == 0 and out["c"][0].startswith("alpha beta gamma")


def test_passage_dedup_short_runs_survive(spark):
    """Duplicated runs SHORTER than min_run are left in place — the
    operator removes passages, not vocabulary."""
    shared = "one two three four"  # 4 tokens < min_run=8
    docs = spark.createDataFrame(
        [
            ("a", f"{shared} unique tail alpha beta"),
            ("b", f"prefix words here {shared} gamma"),
        ],
        "doc_id string, text string",
    )
    out = {
        r["doc_id"]: r["n_removed"]
        for r in boilerplate.duplicate_passage_clean_from(
            docs, k=3, min_run=8
        ).collect()
    }
    assert out == {"a": 0, "b": 0}


def test_passage_dedup_matches_python_oracle(spark, sf_dir):
    """Distributed plan == an independent pure-python run-merging
    implementation over the real table."""
    import re
    from collections import Counter

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    k, min_run = boilerplate.PASSAGE_K, boilerplate.PASSAGE_MIN_RUN
    docs = {r["doc_id"]: re.split(r"\s+", r["text"].strip()) for r in rows}
    df = Counter()
    for toks in docs.values():
        for s in {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}:
            df[s] += 1
    want = {}
    for did, toks in docs.items():
        dup = [
            i
            for i in range(len(toks) - k + 1)
            if df[" ".join(toks[i : i + k])] >= 2
        ]
        runs, removed = [], set()
        for p in dup:
            if runs and p == runs[-1][1] + 1:
                runs[-1] = (runs[-1][0], p)
            else:
                runs.append((p, p))
        for a, b in runs:
            if b - a + k >= min_run:
                removed.update(range(a, b + k))
        kept = [t for i, t in enumerate(toks) if i not in removed]
        want[did] = (" ".join(kept), len(removed))
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in boilerplate.duplicate_passage_clean(spark, sf_dir).collect()
    }
    assert got == want
