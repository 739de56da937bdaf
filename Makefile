# Entry points for the datamunging_spark engine.
PY ?= python

.PHONY: test correctness bench scaling scaling-gated

test:
	$(PY) -m pytest tests/ -x -q

# Full-catalog correctness artifact (all 80+ queries, not just the
# driver's 50-slot window) -> CORRECTNESS_local.json
correctness:
	$(PY) tools/gen_correctness.py

bench:
	$(PY) bench.py

scaling:
	$(PY) scaling_bench.py

# Reproducible quiet-window scaling evidence: waits for 1-min load <= 2
# before every timed child (see scaling_bench.py).
scaling-gated:
	SCALING_LOAD_GATE=2 SCALING_N_DOCS=24000 $(PY) scaling_bench.py
