#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json:14: ">=0.8 from N to 4N
executors"). No real cluster exists in this sandbox, so per the driver
instruction we run the IDENTICAL munge job at two parallelism levels —
local[8] and local[32] (N and 4N cores) — on the same input, and report
throughput at both plus efficiency = (T_4N/T_N)/4.

Protocol:
- the input corpus (realistic ~35-line OCR pages, seed=42) is written to
  parquet ONCE; both levels read the same files — exactly how the
  production pipeline consumes its spans table (a columnar scan; feeding
  the Python stage from cached row objects serializes on JVM row→Arrow
  conversion and was the original scaling bug);
- each level runs in a fresh subprocess (own JVM), does a full-width
  Python-worker warmup, then times the munge pass; best of REPEATS.

Results are appended to BENCH/BASELINE.md and printed as one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
N_DOCS = int(os.environ.get("SCALING_N_DOCS", "12000"))
REPEATS = int(os.environ.get("SCALING_REPEATS", "3"))
# SCALING_JOB=munge (OCR cascade) or extract (HTML/PDF main-content
# extraction) — both are single-Python-stage span pipelines and both are
# north-rule scaling subjects.
JOB = os.environ.get("SCALING_JOB", "munge")
DATA = Path(os.environ.get("SCALING_DATA_DIR", f"/tmp/scaling_{JOB}_{N_DOCS}"))

GEN = r"""
import json, sys
sys.path.insert(0, {repo!r})
from datamunging_spark.session import get_spark
from datamunging_spark.generator import corpus_to_rows, generate_corpus
from datamunging_spark.operators.munge import INPUT_SCHEMA
n_docs = int(sys.argv[1]); out = sys.argv[2]; job = sys.argv[3]
spark = get_spark(app_name="scaling-gen", master="local[32]")
if job == "munge":
    docs = generate_corpus(seed=42, n_docs=n_docs, monster_frac=0.05)
    n_pages = sum(1 for _, spans in docs for s in spans if s.kind == "page")
else:
    from datamunging_spark.generator_web import generate_web_corpus
    docs = generate_web_corpus(seed=42, n_docs=n_docs)
    n_pages = sum(
        1 for _, spans in docs for s in spans if s.kind in ("html", "pdf")
    )
vols = spark.createDataFrame(corpus_to_rows(docs), schema=INPUT_SCHEMA)
vols.repartition(128, "doc_id").write.mode("overwrite").parquet(out)
print(json.dumps({{"pages": n_pages}}))
spark.stop()
"""

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from datamunging_spark.session import get_spark
cores = int(sys.argv[1]); data = sys.argv[2]; job = sys.argv[3]
if job == "munge":
    from datamunging_spark.operators.munge import munge as op
else:
    from datamunging_spark.operators.extract import extract as op
spark = get_spark(app_name=f"scaling-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=cores)
vols = spark.read.parquet(data)
# full-width warmup: spawn every Python worker once
op(vols, spark).write.mode("overwrite").format("noop").save()
t0 = time.perf_counter()
op(vols, spark).write.mode("overwrite").format("noop").save()
print(json.dumps({{"cores": cores, "wall_s": time.perf_counter() - t0}}))
spark.stop()
"""


PIN = os.environ.get("SCALING_PIN", "1") != "0"

# Load-gated protocol (round-2 verdict item 4): this host is shared and
# its timing noise is load-correlated (BENCH/BASELINE.md), so a
# reproducible quiet-window measurement must WAIT for quiet instead of
# hoping. With SCALING_LOAD_GATE=B (>0), every timed child blocks until
# the INSTANTANEOUS whole-host busy-core count (two /proc/stat samples
# 1 s apart — the same accounting BENCH/BASELINE.md's load analysis
# uses) is <= B (give up after SCALING_GATE_TIMEOUT seconds and
# proceed). /proc/stat reacts immediately when a previous child exits,
# where the 1-min load average needs minutes to decay past its own
# finished burst; what the gate must catch is CPU that will be busy
# DURING the run, which only an instantaneous measure sees. The
# observed busy-cores before each timed repeat is carried into the
# output so a reader can audit whether the gate actually held.
GATE = float(os.environ.get("SCALING_LOAD_GATE", "0"))
GATE_TIMEOUT = float(os.environ.get("SCALING_GATE_TIMEOUT", "1800"))


def _busy_cores(interval: float = 1.0) -> float:
    def sample():
        parts = open("/proc/stat").readline().split()[1:]
        vals = list(map(int, parts))
        idle = vals[3] + vals[4]  # idle + iowait
        return sum(vals), idle

    t1, i1 = sample()
    time.sleep(interval)
    t2, i2 = sample()
    dt = t2 - t1
    return os.cpu_count() * (1.0 - (i2 - i1) / dt) if dt else 0.0


def _wait_quiet() -> float:
    busy = _busy_cores()
    if not GATE:
        return busy
    t0 = time.time()
    while busy > GATE and time.time() - t0 < GATE_TIMEOUT:
        time.sleep(5)
        busy = _busy_cores()
    return busy


def _run(code: str, *args: str, cores: int | None = None) -> dict:
    cmd = [sys.executable, "-c", code.format(repo=str(REPO)), *args]
    if cores is not None and PIN:
        # Pin the whole process tree (JVM + Python workers) to exactly
        # `cores` CPUs: an honest N-core executor, not "N task threads
        # free-riding on a 32-core host for GC/Arrow/Python work".
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=str(REPO)
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_level(cores: int) -> dict:
    best = None
    loads = []
    for _ in range(REPEATS):
        loads.append(round(_wait_quiet(), 2))
        res = _run(CHILD, str(cores), str(DATA), JOB, cores=cores)
        if best is None or res["wall_s"] < best["wall_s"]:
            best = res
    best["loads_before"] = loads
    return best


def main() -> None:
    if not (DATA / "_SUCCESS").exists():
        meta = _run(GEN, str(N_DOCS), str(DATA), JOB)
        (DATA / "_meta.json").write_text(json.dumps(meta))
    pages = json.loads((DATA / "_meta.json").read_text())["pages"]

    r8 = run_level(8)
    r32 = run_level(32)
    t8, t32 = pages / r8["wall_s"], pages / r32["wall_s"]
    speedup = t32 / t8
    eff = speedup / 4.0
    result = {
        "job": JOB,
        "n_docs": N_DOCS,
        "pages": pages,
        "local8_wall_s": round(r8["wall_s"], 3),
        "local8_pages_per_sec": round(t8, 1),
        "local32_wall_s": round(r32["wall_s"], 3),
        "local32_pages_per_sec": round(t32, 1),
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "pinned": PIN,
        "load_gate": GATE or None,
        "loads_before_8": r8["loads_before"],
        "loads_before_32": r32["loads_before"],
        "target": 0.8,
        "meets_target": eff >= 0.8,
    }
    md = REPO / "BENCH" / "BASELINE.md"
    md.parent.mkdir(exist_ok=True)
    lines = [
        "",
        f"## Scaling run — {JOB} job ({N_DOCS} docs, {pages} {'pages' if JOB == 'munge' else 'html+pdf spans'}, seed=42, parquet input, {'pinned' if PIN else 'unpinned'}"
        + (f", gated at ≤{GATE:g} busy cores — busy-cores before timed repeats: 8-core {result['loads_before_8']}, 32-core {result['loads_before_32']}" if GATE else "")
        + ")",
        "",
        "| cores | wall (s) | pages/sec |",
        "|---|---|---|",
        f"| local[8]  (N)  | {result['local8_wall_s']} | {result['local8_pages_per_sec']} |",
        f"| local[32] (4N) | {result['local32_wall_s']} | {result['local32_pages_per_sec']} |",
        "",
        f"Speedup 8→32: **{result['speedup_8_to_32']}×**, scaling efficiency "
        f"(speedup/4): **{result['scaling_efficiency']}** "
        f"(target ≥ 0.8 → {'MET' if result['meets_target'] else 'NOT MET'})",
        "",
    ]
    with open(md, "a") as f:
        f.write("\n".join(lines))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
