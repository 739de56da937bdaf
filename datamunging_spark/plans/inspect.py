"""Physical-plan inspection helpers.

Used by tests/test_plans.py (plan-quality gates) and by
``python -m datamunging_spark.plans`` which dumps an annotated PLANS.md
for every catalog query — the artifact a reviewer reads to check that
filters push down, dims broadcast, and Python appears exactly where
intended.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def scan_summary(plan: str) -> list[dict]:
    """One entry per FileScan: pushed filters + read schema."""
    out = []
    for m in re.finditer(r"FileScan parquet \[([^\]]*)\].*?PushedFilters: \[([^\]]*)\]", plan):
        out.append(
            {
                "columns": [c.split("#")[0] for c in m.group(1).split(",") if c],
                "pushed_filters": m.group(2),
            }
        )
    return out


MARKERS = [
    ("BroadcastHashJoin", "broadcast hash join"),
    ("SortMergeJoin", "sort-merge join"),
    ("ShuffledHashJoin", "shuffled hash join"),
    ("partial_", "map-side partial aggregation"),
    ("TakeOrderedAndProject", "top-k without global sort"),
    ("Exchange", "shuffle"),
    ("ReusedExchange", "shuffle reuse"),
    ("MapInArrow", "Arrow-batched Python stage"),
    ("FlatMapGroupsInPandas", "grouped pandas stage"),
    ("BatchEvalPython", "ROW-AT-A-TIME PYTHON (red flag)"),
    ("Window", "window"),
]


def plan_report(name: str, df: DataFrame) -> str:
    plan = executed_plan(df)
    lines = [f"## {name}", "", "Markers:"]
    for marker, label in MARKERS:
        c = plan.count(marker)
        if c:
            lines.append(f"- {label}: {c}")
    for i, s in enumerate(scan_summary(plan)):
        lines.append(
            f"- scan[{i}]: cols={','.join(s['columns'])}"
            + (f" pushed=[{s['pushed_filters']}]" if s["pushed_filters"] else "")
        )
    lines += ["", "```", plan[:4000], "```", ""]
    return "\n".join(lines)
