"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: crawl throughput — frontier URLs scheduled+fetched per second on
the synthetic interleaved-spans web (reference-equivalence mode: unlimited
budget, exact FIFO ordering) — plus per-operator wall times at
$SPARK_GRAFT_SF_DIR.

Scaling evidence (BASELINE.json: efficiency >= 0.8 from N to 4N): run with
SPARK_GRAFT_SCALING=1 to execute the same crawl at local[8] and local[32]
on the same input and report both throughputs + efficiency
(T32/T8)/4. Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from scrappy_spark.operators import dedup, multimodal, relational, similarity, textstats

    qs = {
        "a4_grouped_metrics": relational.a4_grouped_metrics,
        "f3_seen_antijoin": relational.f3_seen_antijoin,
        "f4_firstwins_dedup": relational.f4_firstwins_dedup,
        "x2_minmax_normalize": relational.x2_minmax_normalize,
        "s9_recency_window": relational.s9_recency_window,
        "dedup_exact": dedup.exact_dedup,
        "dedup_minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "dedup_simhash": dedup.simhash_fingerprints,
        "dedup_ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(s, d, 0.2),
        "sim_cosine_topk": similarity.cosine_topk,
        "sim_ann_lsh_topk": similarity.ann_lsh_topk,
        "text_quality": textstats.quality_score,
        "text_fingerprint": textstats.fingerprint,
        "mm_media_features": multimodal.media_features,
    }
    times = {}
    for name, fn in qs.items():
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.monotonic() - t0, 3)
    return times


def _crawl_bench(spark, n_docs: int, cpus: int) -> dict:
    from scrappy_spark.corpus import CorpusConfig, generate_df, seeds_for
    from scrappy_spark.frontier import Crawler, CrawlConfig

    cfg = CorpusConfig(n_docs=n_docs)
    web = generate_df(spark, cfg, partitions=cpus).persist()
    web.count()  # materialize outside the timed section
    store = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        crawler = Crawler(
            spark, web, store, CrawlConfig(depth=2, use_bloom=True)
        )
        t0 = time.monotonic()
        stats = crawler.run(seeds_for(cfg, 4))
        wall = time.monotonic() - t0
        return {
            "crawl_sec": round(wall, 3),
            "crawl_popped": stats["popped"],
            "crawl_rounds": stats["rounds"],
            "urls_per_sec": round(stats["popped"] / wall, 2),
        }
    finally:
        shutil.rmtree(store, ignore_errors=True)
        web.unpersist()


def _session(cpus: int):
    from scrappy_spark.session import get_spark

    return get_spark(
        f"bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    n_docs = max(200, int(sf * 200_000))

    spark = _session(cpus)
    t_total0 = time.monotonic()
    queries = _bench_queries(spark, sf_dir)
    crawl = _crawl_bench(spark, n_docs, cpus)
    total = time.monotonic() - t_total0

    out = {
        "metric": "bench_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        **crawl,
        "cpus": cpus,
        "n_docs": n_docs,
    }

    if os.environ.get("SPARK_GRAFT_SCALING"):
        spark.stop()
        scaling = {}
        for c in (8, 32):
            s = _session(c)
            scaling[f"local{c}"] = _crawl_bench(s, n_docs, c)
            s.stop()
        t8 = scaling["local8"]["urls_per_sec"]
        t32 = scaling["local32"]["urls_per_sec"]
        out["scaling"] = {
            **{k: v["urls_per_sec"] for k, v in scaling.items()},
            "efficiency_n_to_4n": round((t32 / t8) / 4, 3),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
