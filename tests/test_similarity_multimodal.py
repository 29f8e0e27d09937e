"""ANN recall vs brute force, multimodal plumbing, text formats."""

import pytest

from scrappy_spark.extractor import formats
from scrappy_spark.operators import multimodal, similarity, textstats


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    exact = {
        (r["q"], r["vec_id"])
        for r in similarity.cosine_topk(spark, sf_dir, k=5).collect()
    }
    approx = {
        (r["q"], r["vec_id"])
        for r in similarity.ann_lsh_topk(spark, sf_dir, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"ANN recall too low: {recall}"


def test_media_features_schema_and_determinism(spark, sf_dir):
    a = multimodal.media_features(spark, sf_dir).orderBy("doc_id").collect()
    b = multimodal.media_features(spark, sf_dir).orderBy("doc_id").collect()
    assert a == b and len(a) > 0
    kinds = {r["kind"] for r in a}
    assert kinds <= {"image", "audio", "video"}
    for r in a:
        if r["kind"] == "audio":
            assert r["width"] == 0
        else:
            assert r["width"] >= 16


def test_decode_stub_rejects_unknown_kind():
    with pytest.raises(NotImplementedError):
        multimodal._decode_stub(b"x", "hologram")


def test_feature_vectors_normalized(spark, sf_dir):
    import math

    df = multimodal.extract_features(multimodal.synth_media(spark, sf_dir))
    row = df.select("feature").first()
    norm = math.sqrt(sum(x * x for x in row["feature"]))
    assert abs(norm - 1.0) < 1e-5


def test_ngram_langid_runs_and_is_deterministic(spark, sf_dir):
    a = textstats.ngram_langid(spark, sf_dir).orderBy("doc_id").collect()
    b = textstats.ngram_langid(spark, sf_dir).orderBy("doc_id").collect()
    assert a == b
    assert all(r["pred_lang"] in ("en", "de", "fr", "es", "und") for r in a)


def test_unigram_logprob_planted_values(spark, tmp_path):
    """corpus 'a a a b': surprisal(a)=-ln(3/4), surprisal(b)=-ln(1/4);
    the rare-token doc scores a strictly higher mean, and sums equal
    the hand-computed per-token surprisals (6-decimal fixed point)."""
    import math

    docs = spark.createDataFrame(
        [(0, "a a a"), (1, "b")], "doc_id long, text string"
    )
    path = str(tmp_path / "sf")
    docs.write.parquet(path + "/documents.parquet")
    out = {
        r["doc_id"]: r for r in textstats.unigram_logprob(spark, path).collect()
    }
    sa = round(-math.log(3 / 4), 6)
    sb = round(-math.log(1 / 4), 6)
    assert out[0]["n_tokens"] == 3 and out[1]["n_tokens"] == 1
    assert abs(out[0]["surprisal_sum"] - 3 * sa) < 1e-9
    assert abs(out[1]["surprisal_sum"] - sb) < 1e-9
    assert out[1]["mean_surprisal"] > out[0]["mean_surprisal"]


def test_unigram_surprisal_rounding_margin():
    """Guard for the documented libm caveat: every vocab surprisal at
    both driver SFs must sit well clear of a 0.0000005 rounding-grid
    boundary, so a ~1-ulp ln() disagreement between the JVM and DuckDB
    cannot flip round(·, 6) and break the exact oracle. (Measured
    margin today: ~3.7e-8; threshold an order below.)"""
    import duckdb

    for sf in ("sf0.001", "sf0.01"):
        rows = duckdb.sql(
            f"""
            WITH tok AS (
              SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
              FROM '/root/testdata/{sf}/documents.parquet'
            ), freq AS (SELECT t, count(*) c FROM tok GROUP BY t)
            SELECT -ln(c / (SELECT sum(c) FROM freq)) AS s FROM freq
            """
        ).fetchall()
        margin = min(abs((s * 1e6) % 1 - 0.5) for (s,) in rows)
        assert margin > 1e-9, (sf, margin)


SPANS = [
    {"kind": "heading", "text": "Intro", "media_ref": "", "offset": 0},
    {"kind": "text", "text": "hello", "media_ref": "", "offset": 1},
    {"kind": "link", "text": "go", "media_ref": "http://x/", "offset": 2},
    {"kind": "media", "text": "", "media_ref": "http://img/1.png", "offset": 3},
]


def test_formats():
    # formats.rb:6-40 analogs over span sequences
    assert formats.render_plain(SPANS) == "Intro hello go"
    wiki = formats.render_wiki(SPANS)
    assert "= Intro =" in wiki and "[http://x/ go]" in wiki and "File:" in wiki
    html = formats.render_html(SPANS)
    assert html.startswith("<h1>Intro</h1>") and '<a href="http://x/">' in html
    assert formats.wikify("hello  world") == "HelloWorld"
    assert formats.underscore("Hello World") == "hello_world"
    assert formats.clean("a  b\n c") == "a b c"


def test_resize_plumbing(spark, sf_dir):
    """Aspect-preserving resize contract over image-kind rows only."""
    from scrappy_spark.operators import multimodal

    media = multimodal.synth_media(spark, sf_dir)
    out = multimodal.resize_images(media, max_w=256, max_h=256)
    rows = out.collect()
    assert len(rows) == media.where("kind = 'image'").count() > 0
    for r in rows:
        assert 0 < r["width"] <= 256 and 0 < r["height"] <= 256
        assert 0 < r["scale"] <= 1.0
        assert r["payload"] is not None
    # determinism
    again = out.orderBy("doc_id").collect()
    assert again == out.orderBy("doc_id").collect()


def test_frame_sample_plumbing(spark, sf_dir):
    """One video row explodes to ceil(n_frames/step) frame rows with
    monotone t_offset and non-empty fake frame bytes."""
    from scrappy_spark.operators import multimodal

    media = multimodal.synth_media(spark, sf_dir)
    frames = multimodal.sample_frames(media, every_n=30)
    feats = multimodal.extract_features(media).where("kind = 'video'")
    want = {
        r["doc_id"]: -(-r["n_frames"] // 30) for r in feats.collect()
    }
    got = {}
    for r in frames.collect():
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
        assert r["frame_idx"] % 30 == 0
        assert abs(r["t_offset"] - round(r["frame_idx"] / 30.0, 6)) < 1e-9
        assert len(r["frame"]) > 0
    assert got == want


def test_ivf_recall_and_determinism(spark, sf_dir):
    exact = {
        (r["q"], r["vec_id"])
        for r in similarity.cosine_topk(spark, sf_dir, k=5).collect()
    }
    a = similarity.ann_ivf_topk(spark, sf_dir, k=5).orderBy("q", "rk").collect()
    b = similarity.ann_ivf_topk(spark, sf_dir, k=5).orderBy("q", "rk").collect()
    assert a == b  # seeded quantizer => same cells, same answers
    approx = {(r["q"], r["vec_id"]) for r in a}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_token_count_bpe(spark, sf_dir):
    rows = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in textstats.token_count_bpe(spark, sf_dir).collect()
    }
    import re

    import duckdb  # independent recount on a sample

    con = duckdb.connect()
    sample = con.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet') LIMIT 20"
    ).fetchall()
    pat = re.compile(textstats.BPE_PATTERN)
    for doc_id, text in sample:
        assert rows[doc_id] == len(pat.findall(text))
