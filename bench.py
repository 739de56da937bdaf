#!/usr/bin/env python
"""Benchmark driver: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS], plus the extraction pipeline's
pages/sec. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with the ``noop`` sink (so
column pruning can't skip computed outputs, and no driver collect cost
pollutes the number). Scaling evidence across two parallelism levels
lives in scaling_bench.py → BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datamunging_spark.generator import corpus_to_rows, generate_corpus  # noqa: E402
from datamunging_spark.ml_ops import ML_QUERIES  # noqa: E402
from datamunging_spark.operators.munge import INPUT_SCHEMA, munge  # noqa: E402
from datamunging_spark.queries import RELATIONAL_QUERIES  # noqa: E402
from datamunging_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "broadcast_part_revenue",
    "window_topk_orders",
    "rollup_lineitem",
    "asof_join",
    "sessionize_events",
    "tumbling_window_events",
    "range_join_bins",
    # training-data ops
    "dedup_exact",
    "dedup_minhash_lsh",
    "lang_id_stopword",
    "token_stats",
    "ann_cosine_topk",
    "knn_join_topk",
    "curate_corpus",
    "extract_munge",
    "extract_main_content",
    # round-2 flagship additions
    "kmeans_embeddings",
    "decontaminate_ngrams",
    "pack_shards",
    # round-3 flagship additions
    "lm_bigram_score",
    "paragraph_dedup",
    "quality_classifier",
    "global_shuffle",
    "semantic_dedup",
    "bm25_search",
    "span_corruption",
    "importance_resample",
    # round-4 flagship additions
    "substring_dedup",
    "gopher_quality",
    "bpe_learn",
    # round-5 flagship additions
    "decontaminate_bloom",
    "pack_shards_bfd",
    "gopher_repetition",
    "zorder_layout",
    "url_normalize_dedup",
    "pagerank_links",
    "boilerplate_relational",
    "embedding_quantize",
    "fim_transform",
    "ann_ivf_sq8",
    # late-r5 extension flagships
    "span_interval_merge",
    "anchor_text_agg",
    "lm_kn_bigram",
    "funnel_events",
    "rrf_fusion",
    "scd2_history",
    "retention_cohorts",
    "hard_negative_mining",
    "quantile_buckets",
    "cdc_apply",
    "dedup_levenshtein",
    # second late-r5 extension batch
    "q9_product_profit",
    "q21_waiting_suppliers",
    "triangle_count",
    "k_core",
    "fuzzy_join_shingles",
    "table_profile",
    "domain_cap_sample",
    "snapshot_diff",
    # final-r5 extension batch
    "interval_overlap_join",
    "multimodal_phash_dedup",
    "hits_scores",
    "pareto_frontier",
    "thread_roots",
    "mutual_best_pairs",
    "k_anonymity_generalize",
    "kcenter_select",
    "isotonic_calibrate",
    "bfs_levels",
    "content_chunk_dedup",
    # mergeable-sketch family
    "hll_distinct",
    "cms_heavy_hitters",
    # time-series resample + LOCF
    "gapfill_locf",
    # submodular selection
    "maxcover_select",
    # incremental index-probe dedup + DP release
    "dedup_incremental",
    "dp_histogram",
    # sketch family legs 3+4: rank summary + set algebra
    "quantile_sketch",
    "kmv_set_similarity",
    # second-resume batch: star-contraction CC, walk corpus generation,
    # embedding-space decontamination
    "graph_components_lss",
    "random_walks",
    "decontaminate_semantic",
    "skipgram_pairs",
    "pca_power_projection",
    "clustering_coefficient",
    "link_prediction_cn",
    "pq_adc_topk",
    "anomaly_mad_events",
    # final r5 batch: communities, degree mixing, dyadic EWMA
    "label_propagation",
    "degree_mixing",
    "ewma_events",
    # final r5 batch 2: event behavior analytics
    "attribution_last_touch",
    "markov_transitions",
    "theil_sen_trend",
    "session_paths",
    # final r5 batch 4: asymmetric containment
    "containment_join",
    # final r5 batch 5: code-switch detection
    "code_switch_stats",
    # final r5 batch 6: edge-cohesion peel
    "k_truss",
    # final r5 batch 7: geospatial + exact AUC
    "spatial_join_grid",
    "auc_exact",
    # resumed-r5 batch: sequential drift detection, supervised term
    # selection, item-item CF, probabilistic linkage, Poisson-bootstrap CI
    "cusum_changepoint",
    "chi2_terms",
    "cooccurrence_recommend",
    "record_linkage_fs",
    "bootstrap_ci",
    # resumed-r5 batch 2: density clustering + data-audit family
    "dbscan_grid",
    "benford_test",
    "seasonal_profile",
    # resumed-r5 batch 3: content-aware segmentation
    "text_tiling",
    # resumed-r5 batch 4: experimentation readout
    "ab_test_uplift",
    # resumed-r5 batch 5: time-to-event + robust rolling statistic
    "survival_na",
    "rolling_median_events",
]

ALL = {**RELATIONAL_QUERIES, **ML_QUERIES}

# In-run contamination protocol (r3 verdict item 1: BENCH_r03 was recorded
# from a window with 6.3 foreign busy cores + 1.0 steal cores — over the
# scaling harness's own discard gate — and showed phantom 1.2-1.8x
# regressions on untouched plans). Same defense scaling_bench.py uses,
# adapted to an unpinned whole-host run: the bench itself may legally use
# every core, so mid-pass foreign busy is not separable from own busy;
# what IS separable is (a) hypervisor steal across the timed pass and
# (b) instantaneous host busy sampled BETWEEN queries, while this process
# is idle. Each timed repeat therefore (1) waits for the idle-time busy
# gate, (2) runs, (3) is discarded and retried if steal across its own
# pass exceeded the slack. Every attempt is kept in the audit output.
BENCH_LOAD_GATE = float(os.environ.get("BENCH_LOAD_GATE", "2.0"))
BENCH_GATE_TIMEOUT = float(os.environ.get("BENCH_GATE_TIMEOUT", "180"))
BENCH_STEAL_SLACK = float(os.environ.get("BENCH_STEAL_SLACK", "1.0"))
# 3 repeats since r5 (was 2): min-of-repeats is documented as the
# steady-state estimator, but Q1's decimal/intdiv codegen measurably
# needs two passes to JIT (audited walls 3.36 -> 1.97 -> ~1.0 s); two
# repeats reported warm-up, not steady state. Cross-round note: r<=4
# artifacts are min-of-2 — expect a small systematic improvement from
# the protocol alone on JIT-heavy queries.
BENCH_REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
BENCH_MAX_TRIES = int(os.environ.get("BENCH_MAX_TRIES", "6"))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _cpu_sample():
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(v), v[3] + v[4], (v[7] if len(v) > 7 else 0)


def _busy_cores(interval: float = 0.5) -> float:
    t1, i1, _ = _cpu_sample()
    time.sleep(interval)
    t2, i2, _ = _cpu_sample()
    dt = t2 - t1
    return os.cpu_count() * (1.0 - (i2 - i1) / dt) if dt else 0.0


def _wait_quiet() -> float:
    busy = _busy_cores()
    if not BENCH_LOAD_GATE:
        return busy
    t0 = time.time()
    while busy > BENCH_LOAD_GATE and time.time() - t0 < BENCH_GATE_TIMEOUT:
        time.sleep(3)
        busy = _busy_cores()
    return busy


def _timed(run) -> dict:
    """One gated, steal-audited measurement of ``run()``."""
    gate_busy = _wait_quiet()
    c0 = _cpu_sample()
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    c1 = _cpu_sample()
    dt = max(c1[0] - c0[0], 1)
    steal = os.cpu_count() * (c1[2] - c0[2]) / dt
    return {
        "wall_s": wall,
        "gate_busy": round(gate_busy, 2),
        "steal_during": round(steal, 2),
        "contaminated": steal > BENCH_STEAL_SLACK,
    }


def _best_clean(run) -> tuple[float, dict]:
    """Best-of-REPEATS clean walls; contaminated repeats retried up to
    MAX_TRIES, all attempts kept for audit. If every attempt was
    contaminated the best contaminated wall is reported with clean=0 —
    honest fallback, flagged top-level (ADVICE r3 pattern)."""
    attempts: list[dict] = []
    clean: list[dict] = []
    while len(clean) < BENCH_REPEATS and len(attempts) < BENCH_MAX_TRIES:
        res = _timed(run)
        attempts.append(res)
        if not res["contaminated"]:
            clean.append(res)
    pool = clean or attempts
    best = min(r["wall_s"] for r in pool)
    audit = {
        "n_clean": len(clean),
        "n_attempts": len(attempts),
        "attempts": [
            {
                "wall_s": round(a["wall_s"], 3),
                "gate_busy": a["gate_busy"],
                "steal_during": a["steal_during"],
                "contaminated": a["contaminated"],
            }
            for a in attempts
        ],
    }
    return best, audit


def main() -> None:
    spark = get_spark(app_name="datamunging-bench")
    sf = float(SF_DIR.rstrip("/").split("sf")[-1])
    c0 = _cpu_sample()

    # warm the JVM once and the Python UDF workers once (worker spawn is
    # ~200ms/core and would otherwise be billed to the first Python query)
    _force(spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000))
    # ...and the shuffle/agg machinery (exchange, AQE, wholestage agg
    # codegen) — otherwise the FIRST aggregate query (q1) absorbs it
    _force(
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .limit(5000)
        .groupBy("l_returnflag")
        .count()
    )
    warm = generate_corpus(seed=1, n_docs=64, monster_frac=0.0)
    warm_df = spark.createDataFrame(corpus_to_rows(warm), schema=INPUT_SCHEMA)
    _force(munge(warm_df.repartition(spark.sparkContext.defaultParallelism), spark))

    # best-of-N clean passes per query: a single cold pass conflates
    # first-run codegen and neighbor-load spikes (this host varies ±2x,
    # see BENCH/BASELINE.md) with steady-state cost; min of the
    # contamination-gated repeats is the stable, still end-to-end number
    timings: dict[str, float] = {}
    audits: dict[str, dict] = {}
    for name in HEADLINE:
        fn = ALL[name][0]

        def run(fn=fn, name=name):
            # the BPE ops memoize the learned tokenizer on the session
            # (production reuse pattern); the bench must still measure
            # the real learn loop on every repeat
            if name.startswith("bpe_"):
                getattr(spark, "_datamunging_bpe_memo", {}).clear()
            _force(fn(spark, SF_DIR))

        best, audit = _best_clean(run)
        timings[name] = round(best, 3)
        audits[name] = audit

    # extraction throughput: deterministic synthetic corpus read from
    # parquet — the production input path (feeding the Python stage from
    # driver-cached row objects serializes on JVM row→Arrow conversion,
    # see BENCH/BASELINE.md)
    n_docs = int(os.environ.get("BENCH_EXTRACTION_DOCS", "1500"))
    corpus_path = f"/tmp/bench_vols_{n_docs}"
    if not os.path.exists(f"{corpus_path}/_SUCCESS"):
        docs = generate_corpus(seed=42, n_docs=n_docs, monster_frac=0.05)
        n_pages = sum(1 for _, spans in docs for s in spans if s.kind == "page")
        vols_w = spark.createDataFrame(corpus_to_rows(docs), schema=INPUT_SCHEMA)
        vols_w.repartition(
            spark.sparkContext.defaultParallelism * 4, "doc_id"
        ).write.mode("overwrite").parquet(corpus_path)
        with open(f"{corpus_path}/_pages", "w") as f:
            f.write(str(n_pages))
    n_pages = int(open(f"{corpus_path}/_pages").read())
    vols = spark.read.parquet(corpus_path)
    munge_s, munge_audit = _best_clean(lambda: _force(munge(vols, spark)))
    timings[f"extraction_munge_{n_docs}docs"] = round(munge_s, 3)
    audits[f"extraction_munge_{n_docs}docs"] = munge_audit

    total = round(sum(timings.values()), 3)
    # whole-host accounting across the run: busy beyond what this bench
    # used and nonzero steal mean the numbers are inflated by neighbor /
    # hypervisor load (see BENCH/BASELINE.md) — carried in the output so
    # any reader can judge the conditions the run saw
    c1 = _cpu_sample()
    dt = max(c1[0] - c0[0], 1)
    ncpu = os.cpu_count()
    dirty = sorted(n for n, a in audits.items() if a["n_clean"] == 0)
    # Per-attempt audit detail goes to stderr + a sidecar file — NOT the
    # final stdout line. r4 lesson (VERDICT r4 "What's wrong" #1): embedding
    # query_audit in the single stdout JSON line overflowed the driver's
    # tail capture and BENCH_r04.json came back "parsed": null. The driver
    # parses the LAST stdout line; keep it compact.
    audit_blob = json.dumps({"query_audit": audits})
    print(audit_blob, file=sys.stderr)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_audit_local.json"), "w"
        ) as f:
            f.write(audit_blob)
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extraction_pages": n_pages,
                "extraction_pages_per_sec": round(n_pages / munge_s, 1),
                "host_busy_cores_during": round(
                    ncpu * (1.0 - (c1[1] - c0[1]) / dt), 2
                ),
                "host_steal_cores_during": round(ncpu * (c1[2] - c0[2]) / dt, 2),
                # a query in all_contaminated_queries never got a repeat
                # with steal <= slack — its wall is an upper bound, not a
                # measurement; per-attempt detail in BENCH_audit_local.json
                "load_gate": BENCH_LOAD_GATE or None,
                "steal_slack": BENCH_STEAL_SLACK,
                "all_contaminated_queries": dirty,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
