"""Dump annotated physical plans for every catalog query → PLANS.md."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from datamunging_spark.ml_ops import ML_QUERIES  # noqa: E402
from datamunging_spark.queries import RELATIONAL_QUERIES  # noqa: E402
from datamunging_spark.session import get_spark  # noqa: E402

from .inspect import plan_report  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    spark = get_spark(app_name="plan-dump", master="local[4]")
    sections = [
        "# PLANS — annotated physical plans for every catalog query",
        "",
        f"Generated against `{sf_dir}`. Markers flag the properties the",
        "engine relies on at scale (pushdown, broadcast, partial agg,",
        "single Python stage). Regenerate: `python -m datamunging_spark.plans`.",
        "",
    ]
    for name, (fn, _sql) in {**RELATIONAL_QUERIES, **ML_QUERIES}.items():
        try:
            sections.append(plan_report(name, fn(spark, sf_dir)))
        except Exception as e:  # pragma: no cover
            sections.append(f"## {name}\n\nFAILED to plan: {e}\n")
    with open(out_path, "w") as f:
        f.write("\n".join(sections))
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
