"""Extra benchmarks for the optimization round (bench.py is FROZEN for
measurement; this file exists for guide §1.4-style isolation runs).

Usage:
  python bench_extra.py q1 q2 ...      # time the named queries (noop sink)
  python bench_extra.py --all          # time every bench query
  python bench_extra.py --repeat 3 q1  # repeat and report each sample
  python bench_extra.py --explain q1   # also dump .explain('formatted')
                                       # to plans/r06/<q>_plan.txt

Same session/config/methodology as bench.py (master local[$SPARK_GRAFT_CPUS],
shuffle partitions = cpus, noop sink, monotonic wall time); numbers cited in
OPTIMIZATION_r06.md come from here unless stated otherwise.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _queries(spark, sf_dir):
    import bench

    return bench._bench_queries.__wrapped__ if hasattr(
        bench._bench_queries, "__wrapped__"
    ) else None


def _build_registry():
    """Replicate bench.py's query dict without running it."""
    from scrappy_spark.frontier import (
        dust,
        recrawl,
        redirects,
        robots,
        sitemaps,
        yieldstats,
    )
    from scrappy_spark.sources import cdx, warc
    from scrappy_spark.operators import (
        webgraph,
        boilerplate,
        curation,
        dedup,
        interleaved,
        placement,
        tokenizer,
        graph,
        multimodal,
        packing,
        pipeline,
        ranking,
        relational,
        repetition,
        retrieval,
        sampling,
        scrub,
        similarity,
        sketch,
        textstats,
        timeseries,
    )

    return {
        "a4_grouped_metrics": relational.a4_grouped_metrics,
        "f3_seen_antijoin": relational.f3_seen_antijoin,
        "f4_firstwins_dedup": relational.f4_firstwins_dedup,
        "x2_minmax_normalize": relational.x2_minmax_normalize,
        "s9_recency_window": relational.s9_recency_window,
        "dedup_exact": dedup.exact_dedup,
        "dedup_minhash_lsh_pairs": dedup.minhash_lsh_pairs,
        "dedup_minhash_components": dedup.minhash_components,
        "dedup_delta_lsh": dedup.delta_lsh_pairs,
        "dedup_simhash_components": dedup.simhash_components,
        "dedup_simhash": dedup.simhash_fingerprints,
        "dedup_simhash_pairs": dedup.simhash_near_pairs,
        "dedup_ngram_jaccard": lambda s, d: dedup.ngram_jaccard_pairs(s, d, 0.2),
        "dedup_boilerplate": boilerplate.boilerplate_clean,
        "dedup_passages": boilerplate.duplicate_passage_clean,
        "dedup_embedding_cosine": lambda s, d: dedup.embedding_cosine_pairs(s, d, 0.35),
        "dedup_embedding_near": lambda s, d: dedup.embedding_near_pairs(s, d, 0.45),
        "sim_cosine_topk": similarity.cosine_topk,
        "sim_ann_lsh_topk": similarity.ann_lsh_topk,
        "sim_bm25_topk": retrieval.bm25_topk,
        "text_quality": textstats.quality_score,
        "text_fingerprint": textstats.fingerprint,
        "text_corpus_profile": textstats.corpus_profile,
        "text_unigram_logprob": textstats.unigram_logprob,
        "text_repetition": repetition.repetition_stats,
        "text_decontaminate": repetition.decontaminate,
        "sample_source_quota": sampling.source_quota,
        "sample_stratified": sampling.stratified_sample,
        "sample_temperature": sampling.temperature_sample,
        "text_lang_quantiles": ranking.lang_token_quantiles,
        "pack_sequences": packing.pack_sequences,
        "pack_windows": packing.pack_windows,
        "graph_pagerank": graph.doc_pagerank,
        "dedup_cluster_stats": dedup.minhash_cluster_stats,
        "text_surprisal_buckets": ranking.surprisal_buckets,
        "text_pii_scrub": scrub.doc_pii_scrub,
        "text_token_quantiles": ranking.token_count_quantiles,
        "text_heavy_hitters": ranking.heavy_hitters,
        "ts_asof_purchase": timeseries.events_asof_last_purchase,
        "ts_sessionize": timeseries.events_sessionize,
        "ts_rollup_hourly": timeseries.events_rollup_hourly,
        "ts_range_join": timeseries.events_attribution_range_join,
        "ts_funnel": timeseries.events_funnel,
        "sketch_distinct_tokens": sketch.distinct_tokens_sketch,
        "mm_media_features": multimodal.media_features,
        "pipeline_training_corpus": pipeline.training_corpus,
        "pipeline_training_corpus_v2": pipeline.training_corpus_v2,
        "pipeline_training_corpus_v3": pipeline.training_corpus_v3,
        "pipeline_training_corpus_v4": pipeline.training_corpus_v4,
        "robots_parse": robots.parse_rules_query,
        "robots_gate": robots.gate_query,
        "sitemap_recent_seeds": sitemaps.recent_seeds_query,
        "url_redirect_resolve": redirects.resolve_query,
        "f10_url_canonicalize": relational.f10_url_canonicalize,
        "emb_decontaminate": dedup.decontaminate_semantic,
        "warc_parse": warc.warc_responses_query,
        "split_leakage": sampling.split_leakage,
        "frontier_recrawl_schedule": recrawl.recrawl_schedule_query,
        "graph_anchor_topk": webgraph.anchor_topk_query,
        "graph_host_degree": webgraph.host_graph_query,
        "sim_int8_topk": similarity.int8_topk,
        "warc_revisit": warc.warc_revisit_query,
        "crawl_snapshot_diff": recrawl.snapshot_diff_query,
        "cdx_surt_index": cdx.cdx_index_query,
        "dedup_keep_best": dedup.minhash_keep_best,
        "frontier_adaptive_budget": yieldstats.adaptive_budget_query,
        "frontier_discovery_curve": yieldstats.discovery_curve_query,
        "host_scorecard": textstats.host_scorecard,
        "text_bigram_logprob": textstats.bigram_logprob,
        "retrieval_posting_lists": retrieval.posting_lists_query,
        "text_vocab_oov": textstats.vocab_oov,
        "tok_bpe_pair_counts": tokenizer.bpe_pair_counts_query,
        "text_quality_linear": textstats.quality_linear,
        "shard_assign_balance": placement.shard_balance_query,
        "frontier_host_skew": placement.host_skew_query,
        "sample_pps_poisson": curation.pps_sample_query,
        "mix_epoch_manifest": curation.mixture_manifest_query,
        "tfidf_host_keywords": curation.tfidf_host_keywords_query,
        "quality_retention_curve": curation.retention_curve_query,
        "il_clean_rebuild": interleaved.clean_rebuild,
        "il_template_groups": interleaved.template_groups,
        "il_template_downweight": interleaved.template_downweight,
        "il_media_mirror": interleaved.media_mirror,
        "il_media_mirror_delta": interleaved.media_mirror_delta,
        "il_template_pps_sample": interleaved.template_pps_sample,
        "il_media_gallery": interleaved.media_gallery,
        "il_media_gallery_stats": interleaved.media_gallery_stats,
        "il_context_windows": interleaved.context_windows,
        "il_media_decontaminate": interleaved.media_decontaminate,
        "il_media_cooccur": interleaved.media_cooccur,
        "pack_efficiency": packing.pack_efficiency,
        "il_pipeline_multimodal": interleaved.pipeline_multimodal,
        "il_media_stats": interleaved.media_stats,
        "il_fetch_once": interleaved.fetch_once,
        "il_caption_pairs": interleaved.caption_pairs,
        "il_caption_quality": interleaved.caption_quality,
        "il_media_pop": interleaved.media_pop,
        "il_pack_multimodal": interleaved.pack_multimodal,
        "il_bitext_candidates": interleaved.bitext_candidates,
        "sketch_hll_tokens": sketch.hll_distinct_tokens,
        "graph_hits": graph.doc_hits,
        "graph_trustrank": graph.doc_trustrank,
        "dedup_lsh_eval": dedup.lsh_recall_eval,
        "dedup_cdc_chunks": boilerplate.cdc_chunk_dups,
        "frontier_politeness_audit": yieldstats.politeness_audit_query,
        "frontier_dust_rules": dust.dust_rules_query,
        "frontier_dust_rules_delta": dust.dust_rules_delta_query,
        "frontier_dust_canonicalize": dust.dust_canonicalize_query,
        "graph_spam_mass": graph.host_spam_signal,
        "frontier_mirror_hosts": webgraph.mirror_hosts_query,
        "graph_opic": graph.doc_opic,
    }


def main() -> None:
    args = [a for a in sys.argv[1:]]
    repeat = 1
    explain = False
    run_all = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--repeat":
            repeat = int(args[i + 1])
            i += 2
        elif a == "--explain":
            explain = True
            i += 1
        elif a == "--all":
            run_all = True
            i += 1
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from scrappy_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
    spark = get_spark(
        f"bench-extra-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = _build_registry()
    if run_all:
        names = list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    plans_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r06"
    )
    os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        samples = []
        for r in range(repeat):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{r}")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            t_build = time.monotonic() - t0
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            samples.append(round(dt, 3))
            if r == 0 and explain:
                with open(os.path.join(plans_dir, f"{name}_plan.txt"), "w") as f:
                    f.write(df._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
            if r == 0:
                print(
                    f"{name}: {dt:.3f}s (build {t_build:.3f}s)",
                    file=sys.stderr,
                    flush=True,
                )
            else:
                print(f"{name}#{r}: {dt:.3f}s", file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
        results[name] = samples
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "times": results}))


if __name__ == "__main__":
    main()
