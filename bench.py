"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec", "queries":
{...}, "families": {...}, "load1_start": ..., "load1_end": ...,
"uniform_inflation": ..., ...}. The per-query map on stdout is trimmed
slowest-first to fit the driver's ~2000-char capture window (VERDICT r7
#2); the FULL map lives in the committed BENCH_DETAIL.json. The load
averages and the uniform-inflation estimate (median per-query ratio vs
the committed detail) make the record self-adjudicating against host
contention (VERDICT r9 next #1: the r9 driver record inflated 2.08x
under external load with no way to prove it from the artifact).

Each query is executed to completion (count() action) after a warm-up of
the session; per-query wall time includes planning + execution. The
headline set covers the main engine surfaces: fact-table agg, star join,
top-k, window, dedup pipeline, similarity, streaming-equivalent batch.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata06_spark.queries import load_all_queries
from bigdata06_spark.session import get_spark

HEADLINE = [
    # scan-bound filter-agg (pushdown probe)
    "q6_forecast_revenue",
    # fact-table agg / star joins / semi-join / top-k
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_revenue_by_nation",
    "q10_returned_revenue",
    "q18_large_volume_customers",
    # reference-parity ops
    "ref_dedup_first_wins",
    "ref_enrichment_join",
    # windows + sessionization
    "topk_per_group",
    "sessionize_events",
    # LLM-pipeline: dedup + similarity + text + curation
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_adaptive",
    "dedup_incremental",
    "knn_bruteforce",
    "text_quality_score",
    "text_repetition_stats",
    "text_pmi_collocations",
    "text_winnowing_fingerprints",
    "tfidf_top_terms",
    "corpus_split_assign",
    # streaming — one row per state-shape family (VERDICT r7 #8a: the
    # streaming family needs a perf signal like batch): windowed agg,
    # sliding windows, watermark dedup, stream-stream join, and the
    # transformWithState custom operator. Each runs availableNow over
    # the SF's events table through a memory sink, so the timing is
    # the micro-batch engine's replay cost at the benched SF.
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_dedup_counts",
    "stream_stream_join",
    "stream_transform_with_state",
    # heaviest non-headline plans (VERDICT r2 #5): iterative graph /
    # linear-algebra, multi-method agreement, hybrid retrieval — the
    # new cost frontier per PLANS.md; timed so regressions are visible
    # round-over-round
    "graph_pagerank",
    "embedding_power_iteration",
    "dedup_methods_agreement",
    "rag_hybrid_rrf",
    "supplier_affinity_graph",
    # r4: the skew-capped projection + the sampled kNN eval — the
    # 100 TB shapes of the two heaviest r3 plans, timed side-by-side
    # with their exact counterparts
    "supplier_affinity_graph_capped",
    "knn_label_vote_sampled",
    # r5: the scaled-k form IS `dedup_semantic` now (VERDICT r4 #2);
    # the pinned-k=8 reference form is timed beside it
    "dedup_semantic",
    # exact all-pairs similarity (block-tiled equi-join)
    "dedup_embedding_cosine",
    # round-3 additions: SemDeDup fixed-k + leave-one-out kNN eval
    # (heaviest r3 plans — clustered pairwise, all-pairs + global window)
    "dedup_semantic_fixed_k",
    "knn_label_vote",
    # iterative learning under the oracle: BPE training + PQ codes
    "text_bpe_train",
    "embedding_pq_codes",
    # the composed billion-scale ANN index (kmeans cells + PQ + rerank)
    "knn_ivfpq",
    # r4: iterative supervised learning + engine-side recursion
    "text_classifier_train",
    "forecast_exp_smoothing",
    # r5: mergeable KMV set-op sketch + delta-join MV maintenance
    # (lakehouse side tables build once per /tmp and amortize across
    # reps; min-of-3 reports the warm maintenance cost)
    "agg_kmv_sketch_setops",
    "lakehouse_mv_join_incremental",
    # r5 final stint: column-mapping replay read + partition-swap
    # backfill (same build-once/warm-report contract)
    "lakehouse_rename_drop",
    "lakehouse_replace_where",
    # r6: SQL-surface merge, frozen-grid incremental clustering,
    # manifest-planned pruned read, and the exactly-once streaming
    # sink (warm reps re-drain zero files — the steady-state cost)
    "lakehouse_sql_merge",
    "lakehouse_zorder_incremental",
    "lakehouse_manifest_planning",
    "stream_lakehouse_sink",
    # r6 late stint: SELECT-side time travel (two-snapshot join) and
    # the ledgered COPY INTO (warm rep = pure no-op diff)
    "lakehouse_sql_time_travel",
    "lakehouse_sql_copy_into",
    # r6 second stint: Gopher rules (row-local + per-doc bigram argmax),
    # the SQ8 codec member of the ANN family (deterministic int-dot
    # shortlist + exact rerank), and greedy MMR over the checkpointed
    # shortlist (corpus scanned once by retrieval, loop cost O(Q·pool²))
    "text_gopher_filters",
    "knn_sq8_rerank",
    "rag_mmr_rerank",
    # r7: perceptual-hash image dedup (banded hamming join over the
    # mapInPandas hash stage; non-vacuous corpus with 1-byte variants)
    # and the composite-key SQL MERGE (warm reps re-register + agg)
    "multimodal_phash_dedup",
    "lakehouse_sql_merge_composite",
    # r7 second stint: partition-maintenance SQL journey (scoped
    # OPTIMIZE + REPLACE WHERE + SHOW PARTITIONS; warm reps re-agg)
    "lakehouse_sql_partition_ops",
    # r7 third stint: matryoshka truncation recall (3 broadcast-query
    # exact scans over sliced prefixes of the same embedding column)
    "knn_matryoshka_recall",
    # 1-bit binary-quantized retrieval (xor+bit_count hamming scan
    # over two packed words, exact top-50 rerank)
    "knn_bq_rerank",
    # DV purge: rewrite only deletion-vector files (warm reps no-op)
    "lakehouse_reorg_purge",
    # r8: the online near-dup probes (broadcast query buckets, corpus
    # scans once — the serving counterparts of dedup_minhash_lsh /
    # multimodal_phash_dedup, timed beside them), the vocabulary-sized
    # Zipf OLS, and the 2048-cell count-min sketch
    "dedup_lsh_probe",
    "text_zipf_fit",
    "agg_count_min_sketch",
    "multimodal_phash_probe",
    # sketch-as-streaming-state: the CMS grid maintained by the
    # micro-batch engine (state bounded at 2048 cells)
    "stream_count_min_sketch",
    # r8 second stint: runtime bloom semi-join reduction (scan-stage
    # bit probes before the join), exact two-pass heavy hitters (MG
    # candidate sketch + broadcast recount), and the one-pass
    # 24-measure column profiler (multi-countDistinct expand)
    "join_bloom_prune",
    "agg_heavy_hitters",
    "dq_profile_columns",
    # greedy subword tokenizer: corpus scanned once, vocab-sized
    # n-gram scoring + per-distinct-word Arrow segmentation
    "text_wordpiece_tokenize",
    # salted shuffle join (hot-key spreading, timed beside the
    # broadcast join shapes) and the histogram-refined exact quantile
    # (2 scans + bin-sized refinement — the no-global-sort path)
    "join_skew_salted",
    "agg_quantile_twopass",
    # MG-as-streaming-state (the heavy-hitter twin of the streaming
    # CMS row: bounded per-bucket state + exact batch recount)
    "stream_heavy_hitters",
    # r8 third stint: attribution window, apriori basket rules, the
    # fit-once IVF tuning curve, frame-level shot detection, and the
    # PSI drift monitor — each a distinct plan family
    "events_attribution_last_touch",
    "orders_basket_rules",
    "knn_ivf_nprobe_curve",
    "multimodal_scene_cuts",
    "dq_distribution_drift",
    # graph-centrality keywords (vocab-sized PageRank iterations) and
    # the CUSUM level-shift detector (calendar-bounded window)
    "text_textrank_keywords",
    "events_changepoint_cusum",
    # the dedup threshold-tuning curve (one pair relation, 3 probes)
    "dedup_threshold_sweep",
    # KS two-sample test: pure-integer ECDF supremum over distinct
    # values
    "stats_ks_test",
    # r9: the hard-oracled ANN serves (multi-table multiprobe LSH and
    # IVF probing, exact 6dp rerank — now value-hash-gated), the two
    # new rank/concordance stats (domain-bounded, not N-bounded), and
    # the co-supply community rollup (fixpoint min-label components)
    "knn_lsh_ann",
    "knn_ivf_ann",
    "stats_spearman_corr",
    "stats_kendall_tau",
    "graph_community_components",
    # one-way ANOVA (k-cell arithmetic after one combine) and the
    # parquet-checkpoint lifecycle (squash + sidecar time travel +
    # relational manifest rebuild; warm reps re-read the built table)
    "stats_anova_oneway",
    "lakehouse_checkpoint_journey",
    # k-core peeling (degree-bounded edge list, fail-loud fixpoint)
    "graph_kcore",
    # graph-ANN greedy serve (NSW base layer: kNN-graph build + the
    # O(queries x hops x degree) walk, unrolled-oracle-gated)
    "knn_graph_greedy",
    # funnel latency rollup (two user-keyed min-aggs + cohort
    # percentile_disc)
    "events_funnel_time_to_convert",
    # r10 (VERDICT r9 #8): the LLM-pipeline flagship COMPOSITIONS a
    # training-data user runs end-to-end — the multi-stage curation
    # funnel, the fuzzy train/eval decontamination pass, and the full
    # training-manifest assembly — benched beside the thin corpus row
    # (corpus_split_assign) that was their only perf signal before
    "corpus_curation_funnel",
    "corpus_decontaminate",
    "corpus_training_manifest",
    # r10 new operators: content-defined chunking dedup (one explode +
    # per-doc windows + fingerprint groupBy), common-neighbor link
    # prediction (two-hop join on the degree-bounded edge list), and
    # the Brown-Forsythe variance-homogeneity test (k-cell arithmetic
    # after one combine)
    "dedup_cdc_chunks",
    "graph_link_prediction",
    "stats_levene",
    # attribute-filtered vector search (pre-filter equi-join on the
    # label — O(Q * N_class), the production metadata-filter shape)
    "knn_filtered_ann",
    # MATCH_RECOGNIZE-lite (gaps-and-islands + position joins) and
    # retrieval over the content-derived multimodal feature vectors
    "events_match_recognize",
    "multimodal_feature_knn",
    # streaming MATCH_RECOGNIZE: the same pattern as a per-user DFA in
    # transformWithState ValueState (O(1) state per key)
    "stream_match_recognize",
    # Mann-Kendall trend (calendar-bounded pairwise sign sum) and the
    # Benford first-digit DQ screen (9-row digit-domain rollup)
    "stats_mann_kendall",
    "dq_benford_test",
    # filtered IVF serve: the attribute composed into the (cell, label)
    # candidate key — the scale path of knn_filtered_ann
    "knn_filtered_ivf_ann",
    # ---- round 11
    # sharded graph-ANN (DiskANN/SPANN shape): coarse-cell routed NSW
    # walks — the form whose build has no corpus-size ceiling
    "knn_graph_greedy_sharded",
    # its measured serve-quality companion (walks + exact top-1 scan)
    "knn_sharded_recall",
    # robust trend slope over the calendar-bounded pair domain
    "stats_theil_sen",
    # equi-depth histogram: global-sort ntile + bucket bounds
    "agg_equidepth_histogram",
    # integer-exact fractional-credit multi-touch attribution
    "events_attribution_linear",
    # seed-restart PageRank: per-iteration join+groupBy, integer ranks
    "graph_personalized_pagerank",
    # CHECK-constraint journey: per-write validation aggregate + reject
    "lakehouse_check_constraints",
]

# Family subtotals (VERDICT r6 #9): with 50+ headline entries, a
# round-over-round regression needs to be attributable without
# hand-diffing every number. First matching prefix wins.
FAMILIES = [
    ("tpch", ("q1_", "q3_", "q5_", "q6_", "q10_", "q18_")),
    ("refparity", ("ref_",)),
    ("window", ("topk_", "sessionize_", "forecast_",)),
    ("dedup", ("dedup_",)),
    ("similarity", ("knn_", "rag_", "embedding_",)),
    ("text", ("text_", "tfidf_",)),
    ("corpus", ("corpus_",)),
    ("graph", ("graph_", "supplier_",)),
    ("agg", ("agg_",)),
    ("multimodal", ("multimodal_",)),
    ("streaming", ("stream_",)),
    ("lakehouse", ("lakehouse_",)),
    ("relational", ("join_", "dq_",)),
    ("events", ("events_", "orders_",)),
    ("stats", ("stats_",)),
]


def family_of(name: str) -> str:
    for fam, prefixes in FAMILIES:
        if name.startswith(prefixes):
            return fam
    return "other"


def _load1() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # platform without getloadavg
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    # per-SF detail files: a run at another scale must never clobber
    # the committed idle reference of the canonical SF (a sf0.01 smoke
    # once overwrote the sf0.1 detail — same hazard class as the
    # contended-run overwrite ADVICE r10 flagged). The sf1 probe gets
    # the committed scale-proof artifact VERDICT r10 next #2 asked for.
    detail_name = {
        "0.1": "BENCH_DETAIL.json",
        "1": "BENCH_SF1_DETAIL.json",
        "1_probe": "BENCH_SF1_DETAIL.json",
    }.get(sf, f"BENCH_DETAIL_sf{sf}.json")
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name)
    # the COMMITTED detail (read before this run overwrites it) is the
    # idle reference for the contention self-adjudication below
    prev_times: dict[str, float] = {}
    try:
        with open(detail_path) as fh:
            prev = json.load(fh)
        # the ratio is only meaningful against a detail measured at
        # the SAME scale factor
        if str(prev.get("sf")) == (sf if not sf.replace(".", "").isdigit()
                                   else str(float(sf))):
            prev_times = prev.get("queries", {})
    except Exception:
        pass
    load1_start = _load1()
    specs = load_all_queries()
    spark = get_spark("bench")
    # warm the JVM/session so the first query doesn't pay startup costs:
    # include a parquet read so datasource/codec init is excluded too
    spark.range(1000).count()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # min-of-N reps (default 3, VERDICT r3 #4): single-rep timings
    # showed ±30% run-to-run noise round-over-round, swamping real
    # regressions. The first run pays planning/codegen compile; min is
    # the stable statistic for "how fast does this plan execute". The
    # rep count is recorded in the output JSON so cross-round compares
    # know what they're comparing.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in specs:
            continue
        best, n = None, 0
        for _ in range(max(1, reps)):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    load1_end = _load1()
    fams: dict[str, float] = {}
    for name, t in times.items():
        fam = family_of(name)
        fams[fam] = round(fams.get(fam, 0.0) + t, 3)

    # Host-contention self-adjudication (VERDICT r9 next #1): the r9
    # driver record inflated 2.08x under external load with no way to
    # prove it from the artifact. `uniform_inflation` is the MEDIAN
    # per-query ratio of this run vs the committed (idle) detail over
    # shared queries — external load inflates every query by a similar
    # factor, so a high median with the committed detail unchanged
    # reads as contention, while an isolated per-query jump with a
    # ~1.0 median reads as a real regression. Load averages bracket
    # the run for the same adjudication.
    shared = sorted(
        times[q] / prev_times[q]
        for q in times
        if prev_times.get(q) and prev_times[q] > 0.05 and times[q] > 0
    )
    uniform_inflation = (
        round(shared[len(shared) // 2], 3) if shared else None
    )

    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    common = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "reps": max(1, reps),
        "stat": "min",
        "sf": sf_val,
        "load1_start": load1_start,
        "load1_end": load1_end,
        "uniform_inflation": uniform_inflation,
    }
    # Full per-query detail goes to the committed side file (VERDICT
    # r7 #2); round-over-round per-query diffs live there. A CONTENDED
    # run (uniform_inflation well above 1.0 — the exact case the field
    # exists to detect) must NOT replace the idle reference it was
    # just compared against, or committing it propagates an inflated
    # baseline (ADVICE r10): it goes to a .contended side path instead.
    contended = uniform_inflation is not None and uniform_inflation > 1.15
    out_path = detail_path + ".contended" if contended else detail_path
    if contended:
        print(
            f"WARN: uniform_inflation={uniform_inflation} > 1.15 — "
            f"detail written to {out_path}, idle reference kept",
            file=sys.stderr,
        )
    with open(out_path, "w") as f:
        json.dump({**common, "queries": times, "families": fams}, f, indent=1)
        f.write("\n")
    # The final stdout line carries per-query times too (VERDICT r9
    # next #1) — but the driver records only the LAST ~2000 chars of
    # output, so the line must stay under that or the recorded JSON is
    # truncated mid-line and unparseable. Budget: keep the slowest
    # queries (the ones a regression diff needs), drop the fastest
    # until the line fits, and say how many were dropped (their times
    # are all in BENCH_DETAIL.json).
    by_cost = sorted(times, key=lambda q: -times[q])
    keep = dict.fromkeys(by_cost, True)
    while True:
        q_map = {q: round(times[q], 2) for q in times if keep[q]}
        omitted = len(times) - len(q_map)
        line = json.dumps(
            {
                **common,
                "queries": q_map,
                "queries_omitted_fastest": omitted,
                "families": fams,
                "n_queries": len(times),
                "detail": detail_name,
            }
        )
        if len(line) <= 1850 or not q_map:
            break
        keep[by_cost[len(q_map) - 1]] = False
    print(line)


if __name__ == "__main__":
    main()
