"""Dedup-operator fixes (rounds 2–4): simhash block recall (60-bit /
4×15-bit since round 4) and the exact embedding-cosine blocked scan
(no nested-loop join)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from scrappy_spark.operators import dedup


def test_simhash_finds_planted_2plus1_split_pair(spark):
    """Hamming-3 pair whose differing bits split 2+1 across block
    boundaries (bits 1, 2 in block 0 / bit 17 in block 1 of the 15-bit
    blocking): a half-split blocking would drop it; the 4×15-bit blocking
    must keep it (blocks 2 and 3 are identical — pigeonhole)."""
    a = 0xAAAAAAAAAAAAAAA  # 15 hex digits = 60-bit pattern
    b = a ^ (1 << 1) ^ (1 << 2) ^ (1 << 17)
    x = a ^ b
    assert x & 0x7FFF and (x >> 15) & 0x7FFF and x >> 30 == 0
    fp = spark.createDataFrame(
        [("d0", a), ("d1", b), ("d2", 0)], "doc_id string, simhash long"
    )
    rows = dedup.simhash_pairs_from(fp, max_hamming=3).collect()
    assert [(r["a"], r["b"], r["hamming"]) for r in rows] == [("d0", "d1", 3)]


def test_simhash_pairs_complete_vs_bruteforce(spark, sf_dir):
    """Block-join output == brute-force hamming filter over all
    fingerprint pairs (full recall, not just the planted case)."""
    fps = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash_fingerprints(spark, sf_dir).collect()
    }
    ids = sorted(fps)
    want = {
        (x, y, bin(fps[x] ^ fps[y]).count("1"))
        for i, x in enumerate(ids)
        for y in ids[i + 1 :]
        if bin(fps[x] ^ fps[y]).count("1") <= 3
    }
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in dedup.simhash_near_pairs(spark, sf_dir).collect()
    }
    assert got == want and len(want) > 0


def test_embedding_cosine_no_nested_loop_and_exact(spark, sf_dir):
    df = dedup.embedding_cosine_pairs(spark, sf_dir, threshold=0.35)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

    # exact vs an independent numpy brute force (same fold order)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").orderBy("vec_id")
    rows = emb.collect()
    ids = [r["vec_id"] for r in rows]
    mat = np.array([[float(x) for x in r["embedding"]] for r in rows])
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            dot = float(np.dot(mat[i], mat[j]))
            c = dot / (np.linalg.norm(mat[i]) * np.linalg.norm(mat[j]))
            if round(c, 6) >= 0.35:
                want.add((ids[i], ids[j]))
    got = {(r["a"], r["b"]) for r in df.collect()}
    assert got == want and len(want) > 0


def test_embedding_cosine_block_partitioned_matches_brute(spark, sf_dir):
    """The shipped plan (block-partitioned, no driver collect) must equal
    the brute broadcast baseline bit-for-bit — including the multi-block
    path (block_rows small enough that B > 1 forces real block-pair
    fan-out + shuffle)."""
    brute = {
        (r["a"], r["b"], r["cosine"])
        for r in dedup.embedding_cosine_brute(spark, sf_dir, 0.35).collect()
    }
    assert len(brute) > 0
    for block_rows in (1 << 20, 64):  # B == 1 and B == ceil(n/64)
        got = {
            (r["a"], r["b"], r["cosine"])
            for r in dedup.embedding_cosine_pairs(
                spark, sf_dir, 0.35, block_rows=block_rows
            ).collect()
        }
        assert got == brute


def test_embedding_near_pairs_planted_clusters_full_recall(spark):
    """LSH-bucketed near-dup (the 100 TB path, no driver collect) ==
    brute force on planted 0.99-clusters among random decoys: candidates
    come only from sign buckets, so this checks both recall (no true pair
    lost to bucketing) and precision (exact verify drops bucket noise).
    The driver embeddings top out at cosine ~0.6 (measured), so a 0.99
    driver-oracle entry would be vacuous — this planted test is the
    gate."""
    rng = np.random.RandomState(7)
    rows, vid = [], 0
    for _ in range(10):  # 10 clusters of 3 near-identical vectors
        base = rng.standard_normal(64)
        base /= np.linalg.norm(base)
        for _ in range(3):
            v = base + rng.standard_normal(64) * 0.01
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(100):  # decoys
        rows.append((vid, [float(x) for x in rng.standard_normal(64)]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")

    got = {
        (r["a"], r["b"])
        for r in dedup.embedding_near_pairs_from(spark, emb, 0.99).collect()
    }
    mat = np.array([r[1] for r in rows])
    ids = [r[0] for r in rows]
    nrm = np.sqrt((mat * mat).sum(1))
    cos = (mat @ mat.T) / (nrm[:, None] * nrm[None, :])
    want = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(cos[i, j], 6) >= 0.99
    }
    assert got == want and len(want) >= 30


def test_minhash_components_match_union_find(spark, sf_dir):
    """Duplicate-cluster resolution (min-label propagation over the LSH
    pair graph) must equal an independent union-find over the same pair
    list: every doc maps to its component's min doc_id, singletons to
    themselves, and at least one non-trivial cluster exists in the
    driver data (non-vacuous)."""
    pairs = [(r["a"], r["b"]) for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    got = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup.minhash_components(spark, sf_dir).collect()
    }
    want = {(d, find(d) if d in parent else d) for d, _ in got}
    assert got == want
    assert any(d != c for d, c in got)  # non-vacuous: real clusters exist
    assert all(c <= d for d, c in got)  # canonical is the component min


def test_simhash_components_match_union_find(spark, sf_dir):
    """Simhash cluster resolution == union-find over the same hamming
    pair list (this graph is dense on the driver corpus — hundreds of
    non-trivial memberships — so it also exercises deeper propagation
    than the minhash graph)."""
    pairs = [(r["a"], r["b"]) for r in dedup.simhash_near_pairs(spark, sf_dir).collect()]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    got = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup.simhash_components(spark, sf_dir).collect()
    }
    want = {(d, find(d) if d in parent else d) for d, _ in got}
    assert got == want and any(d != c for d, c in got)


def test_embedding_components_match_union_find(spark, sf_dir):
    """Embedding survivor selection == union-find over the same verified
    near-dup pairs (threshold 0.45 so the driver data has real edges)."""
    pairs = [
        (r["a"], r["b"])
        for r in dedup.embedding_near_pairs(spark, sf_dir, 0.45).collect()
    ]
    assert pairs  # non-vacuous at this threshold
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    got = {
        (r["vec_id"], r["canonical_vec"])
        for r in dedup.embedding_components(spark, sf_dir, 0.45).collect()
    }
    want = {(v, find(v) if v in parent else v) for v, _ in got}
    assert got == want and any(v != c for v, c in got)


def test_components_chain_graph_converges(spark):
    """Worst-case diameter: a 12-node path graph (0-1-2-…-11) forces the
    min label to propagate one hop per iteration — all nodes must still
    collapse to node 0 within the default max_iter, and a disjoint
    triangle plus an isolated node must keep their own canonicals."""
    nodes = [(f"n{i:02d}",) for i in range(12)] + [("t0",), ("t1",), ("t2",), ("iso",)]
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(11)]
    tri = [("t0", "t1"), ("t1", "t2"), ("t0", "t2")]
    docs = spark.createDataFrame(nodes, "doc_id string")
    pairs = spark.createDataFrame(chain + tri, "a string, b string")

    got = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup.components_from_pairs(docs, pairs).collect()
    }
    want = {(f"n{i:02d}", "n00") for i in range(12)}
    want |= {(t, "t0") for t in ("t0", "t1", "t2")}
    want |= {("iso", "iso")}
    assert got == want

    # an insufficient iteration cap must raise, never return a silently
    # unconverged (wrong) component map
    with pytest.raises(RuntimeError, match="did not converge"):
        # 2 iterations cover ≤ ~6 hops even with pointer jumping — far
        # short of the 11-hop chain, so labels are provably still moving
        dedup.components_from_pairs(docs, pairs, max_iter=2).collect()


def test_components_long_path_converges_in_log_rounds(spark):
    """O(log diameter) bound (VERDICT r5 #3): a 1,000-node path graph —
    the worst sparse-chain topology — must converge within the DEFAULT
    max_iter=20 cap (≈ 2·log₂(1000)); without effective pointer
    jumping, min-label propagation needs ~999 rounds and blows the cap.
    Also pins exactness on the worst case: every node collapses to the
    path's min id."""
    n = 1000
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    got = {
        (r["doc_id"], r["canonical_id"])
        for r in dedup.components_from_pairs(docs, pairs).collect()
    }
    assert got == {(i, 0) for i in range(n)}


def test_delta_lsh_is_exactly_the_cross_side_pairs(spark, sf_dir):
    """The asymmetric operator must produce precisely the symmetric
    candidate pairs that cross the delta/history split — no
    delta×delta, no history×history, nothing extra (same bands, same
    bucket cap)."""
    sym = {
        (r["a"], r["b"])
        for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    }
    got = {
        (r["delta_id"], r["history_id"])
        for r in dedup.delta_lsh_pairs(spark, sf_dir).collect()
    }
    want = set()
    for a, b in sym:
        for d, h in ((a, b), (b, a)):
            if d % dedup.DELTA_MOD == 0 and h % dedup.DELTA_MOD != 0:
                want.add((d, h))
    assert got == want
    assert 0 < len(got) < len(sym) * 2  # non-vacuous, strictly filtered


def test_training_corpus_composition(spark, sf_dir):
    """The composed pipeline filter must equal the manual composition of
    its three oracle-checked parts, and every gate must actually
    discriminate on the driver corpus (no vacuous conjunct)."""
    from scrappy_spark.operators import pipeline, textstats

    got = {r["doc_id"] for r in pipeline.training_corpus(spark, sf_dir).collect()}

    lang = {r["doc_id"]: r["pred_lang"] for r in textstats.marker_langid(spark, sf_dir).collect()}
    toks = {r["doc_id"]: r["n_tokens"] for r in textstats.quality_score(spark, sf_dir).collect()}
    canon = {r["doc_id"]: r["canonical_id"] for r in dedup.minhash_components(spark, sf_dir).collect()}
    want = {
        d
        for d in lang
        if lang[d] == "en" and toks[d] >= pipeline.MIN_TOKENS and canon[d] == d
    }
    assert got == want
    assert 0 < len(got) < len(lang)  # the filter keeps some, drops some
    # each conjunct discriminates on its own
    assert any(lang[d] != "en" for d in lang)
    assert any(toks[d] < pipeline.MIN_TOKENS for d in toks)
    assert any(canon[d] != d for d in canon)


def test_embedding_near_bucket_cap_drops_degenerate_direction(spark):
    """NEAR_MAX_BUCKET contract: a mega-cluster of identical embeddings
    (same sign bucket in EVERY table → O(|cluster|²) candidates) is
    dropped when the cap bites, while an unrelated near-identical pair
    (bucket size 2) still surfaces with its exact cosine."""
    rng = np.random.RandomState(11)
    rows, vid = [], 0
    mega = rng.standard_normal(64)
    for _ in range(8):  # identical vectors: one bucket of size 8 per table
        rows.append((vid, [float(x) for x in mega]))
        vid += 1
    pair_base = rng.standard_normal(64)
    for _ in range(2):
        v = pair_base + rng.standard_normal(64) * 0.001
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>")

    got = {
        (r["a"], r["b"])
        for r in dedup.embedding_near_pairs_from(
            spark, emb, 0.99, max_bucket=4
        ).collect()
    }
    assert got == {(8, 9)}  # the pair survives; the mega-cluster is capped


def test_lsh_bucket_cap_drops_mega_cluster(spark, tmp_path, monkeypatch):
    """A mega-duplicate cluster (one bucket with every doc) must not
    materialize |bucket|² pairs when the cap bites; distinct near-dup
    pairs outside the cluster survive."""
    import pandas as pd

    n = 12
    rows = [("dup%02d" % i, "the same exact duplicated text body") for i in range(n)]
    # a small (size-2) duplicate bucket: identical signatures collide in
    # every band, and 2 <= cap so the pair must survive
    rows += [("uniq_a", "alpha beta gamma delta words here"),
             ("uniq_b", "alpha beta gamma delta words here")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(path + "/documents.parquet")

    uncapped = dedup.minhash_lsh_pairs(spark, path, max_bucket=10**9)
    capped = dedup.minhash_lsh_pairs(spark, path, max_bucket=4)
    unc = {(r["a"], r["b"]) for r in uncapped.collect()}
    cap = {(r["a"], r["b"]) for r in capped.collect()}
    assert len(unc) >= n * (n - 1) // 2  # quadratic blow-up, uncapped
    assert all(not (a.startswith("dup") and b.startswith("dup")) for a, b in cap)
    assert ("uniq_a", "uniq_b") in unc  # the legit near-dup pair exists…
    assert ("uniq_a", "uniq_b") in cap  # …and survives the cap


def test_jaccard_df_cap_drops_hot_shingle(spark, tmp_path):
    """Pairs connected ONLY through a stopword-frequent shingle never
    materialize under the df cap; pairs with real overlap keep a Jaccard
    computed over the surviving vocabulary."""
    import pandas as pd

    hot = "the of and"  # one shingle shared by EVERY doc
    rows = [("d%02d" % i, f"{hot} unique token{i} filler{i}") for i in range(8)]
    rows += [("sim_a", f"{hot} red green blue yellow"),
             ("sim_b", f"{hot} red green blue purple")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    path = str(tmp_path / "docs")
    spark.createDataFrame(pdf).write.parquet(path + "/documents.parquet")

    out = dedup.ngram_jaccard_pairs(spark, path, threshold=0.01, max_df=5)
    pairs = {(r["a"], r["b"]) for r in out.collect()}
    assert ("sim_a", "sim_b") in pairs
    assert all(not (a.startswith("d") and b.startswith("d")) for a, b in pairs)


def test_embedding_cosine_threshold_column_values(spark, sf_dir):
    """Rounding happens in Spark SQL (decimal HALF_UP) and the cosine
    column is the rounded value — the driver hashes it."""
    out = dedup.embedding_cosine_pairs(spark, sf_dir, threshold=0.35)
    bad = out.where(
        (F.col("cosine") < 0.35) | (F.col("cosine") > 1.000001)
    ).count()
    assert bad == 0


def test_keep_best_picks_longest_member_per_cluster(spark, sf_dir):
    # survivor = max-length member (tiebreak min doc_id) of each minhash
    # component; one output row per cluster; sizes sum to the corpus
    comp = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup.minhash_components(spark, sf_dir).collect()
    }
    lens = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.length("text").alias("n"))
        .collect()
    }
    best = dedup.minhash_keep_best(spark, sf_dir).collect()
    assert len(best) == len(set(comp.values()))
    assert sum(r["cluster_size"] for r in best) == len(comp)
    for r in best:
        members = [d for d, c in comp.items() if c == r["canonical_id"]]
        want = min(
            members, key=lambda d: (-lens[d], d)
        )  # longest, then smallest id
        assert r["kept_doc_id"] == want
        assert r["kept_len"] == lens[want]
        assert r["cluster_size"] == len(members)
