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
]

ALL = {**RELATIONAL_QUERIES, **ML_QUERIES}


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def _cpu_sample():
    v = list(map(int, open("/proc/stat").readline().split()[1:]))
    return sum(v), v[3] + v[4], (v[7] if len(v) > 7 else 0)


def main() -> None:
    spark = get_spark(app_name="datamunging-bench")
    sf = float(SF_DIR.rstrip("/").split("sf")[-1])
    c0 = _cpu_sample()

    # warm the JVM once and the Python UDF workers once (worker spawn is
    # ~200ms/core and would otherwise be billed to the first Python query)
    _force(spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000))
    warm = generate_corpus(seed=1, n_docs=64, monster_frac=0.0)
    warm_df = spark.createDataFrame(corpus_to_rows(warm), schema=INPUT_SCHEMA)
    _force(munge(warm_df.repartition(spark.sparkContext.defaultParallelism), spark))

    # best-of-2 per query: a single cold pass conflates first-run codegen
    # and neighbor-load spikes (this host varies ±2x, see
    # BENCH/BASELINE.md) with steady-state cost; min-of-2 is the stable,
    # still end-to-end number
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = ALL[name][0]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

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
    munge_s = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _force(munge(vols, spark))
        munge_s = min(munge_s, time.perf_counter() - t0)
    timings[f"extraction_munge_{n_docs}docs"] = round(munge_s, 3)

    total = round(sum(timings.values()), 3)
    # whole-host accounting across the run: busy beyond what this bench
    # used and nonzero steal mean the numbers are inflated by neighbor /
    # hypervisor load (see BENCH/BASELINE.md) — carried in the output so
    # any reader can judge the conditions the run saw
    c1 = _cpu_sample()
    dt = max(c1[0] - c0[0], 1)
    ncpu = os.cpu_count()
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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
