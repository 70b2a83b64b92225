#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints the JSON line
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
followed by a compact ≤1.8 kB summary line (same headline fields,
slowest queries only) as the FINAL stdout line — the driver's
per-round capture keeps the last 2000 chars of stdout, so the final
line is the one that must parse standalone (r10 verdict item 6). The
full line is also persisted to docs/bench_latest_full.json.

Each query is forced end-to-end with the noop sink (full plan
execution, no driver collection). Session startup and a warmup action
are excluded — the numbers measure the plans, not JVM boot.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

from queryengine_spark.queries import all_queries
from queryengine_spark.session import get_spark

#: headline set: one representative per operator family. The n-gram
#: Jaccard join runs with its hot-shingle guard (df ≤ 10% of docs) —
#: unguarded it is quadratic on this synthetic corpus (Σ df² ≈ 2.2e9
#: rows at sf0.1 vs ≈ 4.3e6 guarded).
HEADLINE = [
    "scan_filter_project",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "join_theta",
    "join_broadcast_dims",
    "window_topk_orders_per_customer",
    "window_basic_suite",
    "setop_suite",
    "agg_grouping_suite",
    "fuzzy_candidates_coverage",
    "fuzzy_match_full",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_suite",
    "dedup_embedding",
    "dedup_simhash_suite",
    # r6 fold: brute/LSH/IVF as one tagged composite
    "knn_ann_suite",
    "knn_filtered",
    # round-7: IVF + 8-bit scalar-quantized codes (FAISS SQ8 semantics)
    "knn_sq8",
    "text_doc_profile",
    "pipeline_clean_corpus",
    "q13_order_count_distribution",
    "subquery_in",
    "events_tumbling_hourly",
    "events_sessionize",
    "multimodal_features",
    # round-2 additions
    "q4_order_priority",
    "q10_returned_items",
    "q18_large_volume_customers",
    "text_tfidf_top_terms",
    "events_click_purchase_attribution",
    "dedup_keep_canonical",
    "agg_udaf_rms",
    # training-pipeline pack
    "text_gopher_quality",
    "text_repetition_stats",
    "dedup_decontaminate_suite",
    "pipeline_weighted_mix",
    "events_funnel_retention",
    "events_gap_fill",
    # second relational pack
    "pivot_returnflag_revenue",
    "window_range_30d_spend",
    # round-2 additions: native windowing, melt, bloom, binary headers
    "events_sliding_window",
    "unpivot_lineitem_metrics",
    "multimodal_inventory",
    "agg_histogram_quantiles",
    "text_pii_scrub",
    "text_pii_pseudonymize",
    "events_json_extract",
    "udtf_token_windows",
    # round-3 additions: sketch-scored pairs, budget sampling, e2e prep
    "pipeline_token_budget_sample",
    "pipeline_llm_prep",
    # round-7: concat-and-chunk sequence packing (two-phase prefix sum)
    "pipeline_pack_sequences",
    # round-3 curation pack: span scrub, containment, semdedup,
    # sketch-verified heavy hitters
    "curation_span_scrub",
    "dedup_containment",
    "dedup_semantic",
    "text_heavy_hitters",
    # round-3 IVF-PQ (r6 fold: ADC + 32-deep exact re-rank + the
    # persistent-index read path as one tagged composite)
    "knn_pq_suite",
    # round-3: incremental batch-vs-history dedup, NFC normalization,
    # hashed-feature quality classifier
    "dedup_incremental",
    "text_unicode_normalize",
    "text_quality_classifier",
    # round-3: BPE tokenizer, temperature-weighted source mixing,
    # real BMP pixel decode
    "text_bpe_tokenize",
    "pipeline_temperature_mix",
    "multimodal_image_decode",
    "multimodal_audio_suite",
    "pipeline_leakage_safe_split",
    "curation_intradoc_scrub",
    # round-4 analytics pack: BM25 retrieval, CMS/HLL sketches,
    # integer PageRank over the near-dup graph, dataset-card profile
    "text_bm25_search",
    "text_cms_freq",
    "text_hll_distinct",
    "graph_pagerank",
    "profile_numeric_summary",
    "fuzzy_edit_join",
    "source_partition_pruned",
    # round-4 ML pack: full-corpus Lloyd k-means (+ balanced sample),
    # MMR diversification, DSIR importance resample, triangle counts
    "ml_kmeans_distributed",
    "pipeline_cluster_balanced_sample",
    "knn_mmr",
    "pipeline_dsir_sample",
    "graph_triangles",
    # round-4 snapshot maintenance: MERGE-shaped CDC apply, SCD2
    "etl_apply_cdc",
    "etl_scd2_history",
    # round-4: PMI collocations, k-means purity eval
    "text_collocations_pmi",
    "ml_kmeans_purity",
    # round-4: weighted πps sampling, snapshot reconciliation
    "pipeline_weighted_sample_wor",
    "etl_snapshot_diff",
    "profile_lang_token_moments",
    # round-4 late additions: concat-and-chunk sequence packing,
    # MAD outlier filter, shard-balance audit, source-overlap matrix
    "pipeline_sequence_packing",
    "text_outlier_mad",
    "pipeline_shard_assign",
    "dedup_cross_source_overlap",
    # round-4 addenda: real PNG decode, rolling anomaly detection,
    # bigram-LM surprise scoring
    "events_anomaly_window",
    "text_lm_surprise",
    "graph_bfs_hops",
    "dedup_jaccard_prefix",
    "profile_regression_slope",
    "events_pattern_match",
    "text_winsorize",
    "events_transition_matrix",
    "text_novelty_hapax",
    # round-5 URL/domain curation pack
    "curation_url_canonicalize",
    "curation_domain_cap",
    "curation_domain_overlap",
    "curation_robots_filter",
    # round-5: suffix-array exact-substring spans (prefix doubling)
    "curation_repeated_spans_sa",
    # round-6: persistent SRP-LSH index (read path), SA detect→scrub
    "knn_lsh_index",
    "curation_sa_scrub",
    # round-6: WebDataset-style tar/zip shard ingestion
    "source_archive_shards",
    "source_warc_records",
    "source_warc_cdx",
    # round-7: metadata-only footer profiling (stats faithfulness check)
    "source_footer_profile",
    # round-7: per-source distribution drift (integer TVD)
    "profile_source_drift",
    # round-6 media transforms (resize/crop, animation frame sampling,
    # audio framing, AVI/MJPEG video frame sampling), folded r7 into
    # one leg-tagged composite
    "multimodal_media_suite",
    # round-6: baseline TIFF (II/MM, strips, PackBits, WhiteIsZero)
    "multimodal_scene_cuts",
    "text_chunk_rag",
    "text_html_extract",
    # round-6: perceptual-hash image dedup (decode -> dHash -> banded Hamming)
    "dedup_image_phash",
    # round-10: end-to-end CommonCrawl composite (WARC shards -> CDX
    # spans -> HTTP undo -> WET -> gate -> near-dup dedup -> packing)
    "pipeline_cc_ingest",
    # round-10: revisit-record resolution + the ADPCM corpus slot
    "source_warc_revisit",
    "multimodal_wav_adpcm",
    # round-10: WAT metadata production (the fourth CommonCrawl artifact)
    "source_warc_wat",
    # round-11: PDF text extraction (xref walk + FlateDecode + Tj/TJ)
    "source_pdf_text",
    # round-11: hybrid BM25 + vector retrieval fused by RRF
    "knn_hybrid_rrf",
    # round-11: Avro OCF ingestion (varints, blocks, from-scratch snappy)
    "source_avro_records",
    # round-11: contrastive hard-negative mining (positive exclusion)
    "pipeline_hard_negatives",
    # round-11: SQLite database-file ingestion (b-tree page walk)
    "source_sqlite_rows",
    # round-11: TFRecord/tf.Example ingestion (CRC32C framing + protobuf)
    "source_tfrecord_examples",
    # round-11: deep-gray TIFF decode (depths 1/4/16)
    "multimodal_tiff_deep",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("queryengine-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # warmup: JVM + parquet footer caches, excluded from timing
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    # ... and Python workers: the first stage using a package Arrow
    # UDF otherwise pays worker spawn + `import queryengine_spark`
    # (numpy/pandas) in every one of the 32 daemon workers, inside
    # whichever query happens to run first (measured: 8.9 s cold vs
    # 0.7 s warm on the simhash kernel). One package-UDF pass over a
    # row per core pre-forks the pool AND pre-imports the package, so
    # the timings below measure the plans, not interpreter boot.
    from pyspark.sql import functions as F  # noqa: PLC0415

    from queryengine_spark.functions.similarity import cosine_similarity  # noqa: PLC0415

    n_cores = spark.sparkContext.defaultParallelism
    v = F.array(F.lit(1.0), F.lit(2.0))
    spark.range(n_cores, numPartitions=n_cores).select(
        cosine_similarity(v, v)
    ).write.format("noop").mode("overwrite").save()
    # ... and the fuzzy pipeline's one-time costs (partial_ratio UDF
    # registration + the window/bigram JIT paths): a 3×4-row
    # end-to-end match, untimed. First-in-session fuzzy_match_full
    # otherwise measures ~6 s of boot on top of a ~4 s plan.
    from queryengine_spark.operators.fuzzy_join import fuzzy_match  # noqa: PLC0415

    warm_q = spark.createDataFrame(
        [(1, "spark sql engine"), (2, "alpha beta"), (3, "zzzz")], ["id", "term"]
    )
    warm_r = spark.createDataFrame(
        [(1, "spark sql"), (2, "gamma delta"), (3, "alpha beta"), (4, "spark engine")],
        ["id", "term"],
    )
    fuzzy_match(warm_q, warm_r, query_id="id", ref_id="id").write.format(
        "noop"
    ).mode("overwrite").save()

    # Each query runs twice and the MIN is reported: the first
    # execution of a plan pays one-time costs (whole-stage codegen
    # compilation, broadcast build, Python worker import of any new
    # module) that are properties of the JVM session, not the plan —
    # measured swings of 1.5-2x on identical plans run back-to-back.
    # Min-of-N is the steady-state number consistent with the
    # warmups above; "runs" is recorded in the output. N=3 (was 2):
    # the round-4 drift A/B (BASELINE.md) measured the FIRST run of
    # the heavier plans ~2.5-3 s above steady state even after
    # warmup, so min-of-2 reported the lone second run and inherited
    # its full session noise — min-of-3 gets two steady samples.
    N_RUNS = 3
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        best = None
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            # Inter-query isolation, outside the timed window: drop
            # py4j DataFrame refs, then force a JVM GC so
            # ContextCleaner frees this query's localCheckpoint/
            # shuffle blocks before the next run. Without it,
            # leftover storage causes multi-x swings (measured
            # 2 s → 42 s on the same query mid-suite).
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.3)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    # ANN quality alongside speed: mean recall@3 of the SRP-LSH path
    # vs brute-force ground truth (VERDICT r1 item 7; tuned config in
    # queries/knn.py — 8 bits × 16 tables, Hamming≤1 multiprobe).
    from pyspark.sql import functions as F  # noqa: PLC0415

    def _mean_recall(qname: str, leg: str | None = None) -> float:
        # recall is a per-query column on the ANN output since the r5
        # registry fold. A query whose bucket/cell probe comes back
        # EMPTY has no output rows at all, so averaging the output's
        # distinct recall values alone would silently drop it from the
        # mean; left-join the full query sample (vec_id % 50 == 0,
        # shared by every ANN entry) and count the missing as 0 —
        # matching the removed standalone knn_*_recall semantics.
        sample = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .filter(F.col("vec_id") % 50 == 0)
            .select(F.col("vec_id").alias("query_id"))
        )
        got = queries[qname](spark, sf_dir)
        if leg is not None:  # r6 fold: suite composites tag legs
            got = got.filter(F.col("leg") == leg)
        got = got.select("query_id", "recall").distinct()
        return (
            sample.join(got, "query_id", "left")
            .agg(F.avg(F.coalesce("recall", F.lit(0.0))).alias("r"))
            .collect()[0]["r"]
        )

    recall = _mean_recall("knn_ann_suite", leg="lsh")
    ivf_recall = _mean_recall("knn_ann_suite", leg="ivf")
    pq_recall = _mean_recall("knn_pq_suite", leg="rerank")
    sq8_recall = _mean_recall("knn_sq8", leg="session")

    # r12 (r11 verdict item 8): hard-negative mining's IVF
    # PRODUCTION path measured against its exact twin — per-anchor
    # fraction of the exact top-K negatives the cell probe recovers,
    # re-measured every run beside the four ANN recalls.
    from queryengine_spark.operators.knn import (  # noqa: PLC0415
        hard_negative_mining_ivf,
    )
    from queryengine_spark.queries.knn import (  # noqa: PLC0415
        HN_POS_T,
        K_HN,
        QSTRIDE_BRUTE,
        _query_sample,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    hn_exact = queries["pipeline_hard_negatives"](spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    hn_ivf = hard_negative_mining_ivf(
        _query_sample(emb, QSTRIDE_BRUTE),
        emb,
        "vec_id",
        "embedding",
        k=K_HN,
        pos_threshold=HN_POS_T,
    ).select("query_id", "neighbor_id")
    hn_base = hn_exact.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    hn_hits = hn_exact.join(
        hn_ivf, ["query_id", "neighbor_id"]
    ).groupBy("query_id").agg(F.count(F.lit(1)).alias("h"))
    hardneg_recall = (
        hn_base.join(hn_hits, "query_id", "left")
        .agg(
            F.avg(
                F.coalesce(F.col("h"), F.lit(0)) / F.col("n")
            ).alias("r")
        )
        .collect()[0]["r"]
    )

    # Ambient-load calibration INSIDE the artifact (r10 verdict item
    # 6): the 20M-iteration pure-Python add loop BASELINE.md's paired
    # ambient analysis is anchored on (~0.55 s on an idle core of this
    # class; r9/r10 measured 1.6-2.6 s under hypervisor contention).
    t0 = time.perf_counter()
    acc = 0
    for i in range(20_000_000):
        acc += i
    calib = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": N_RUNS,
        "calib_add_loop_20m_sec": calib,
        "knn_lsh_recall_at_3": round(recall, 4),
        "knn_ivf_recall_at_3": round(ivf_recall, 4),
        "knn_pq_rerank_recall_at_3": round(pq_recall, 4),
        "knn_sq8_recall_at_3": round(sq8_recall, 4),
        "hardneg_ivf_recall": round(hardneg_recall, 4),
    }
    line = json.dumps(payload)
    print(line)
    # The driver's per-round capture keeps only the LAST 2000 chars of
    # stdout and records whether they parse (r8-r10 verdicts: the full
    # line is ~5 kB, so the captured tail never parsed). Persist the
    # full line to a stable committed path, then make the FINAL stdout
    # line a self-contained compact summary under the capture limit —
    # same headline metric/recalls/calibration, plus the slowest
    # queries that fit — so BENCH_r{N}.json finally carries a
    # parseable artifact.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "docs", "bench_latest_full.json"),
            "w",
        ) as f:
            f.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout line already carries it

    compact = dict(payload)
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])
    compact["queries"] = {}
    compact["n_queries"] = len(timings)
    compact["queries_full"] = "docs/bench_latest_full.json"
    for name_, sec_ in slowest:
        compact["queries"][name_] = round(sec_, 2)
        if len(json.dumps(compact, separators=(",", ":"))) > 1800:
            del compact["queries"][name_]
            break
    compact["queries_omitted"] = len(timings) - len(compact["queries"])
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    main()
