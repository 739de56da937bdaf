#!/usr/bin/env python
"""Q1 steady-state A/B: exact decimal(38,0) integer money sums + integer
half-up rounding (the shipped engine) vs plain double sums + round().

The r4 commit claimed "steady-state decimal sums beat doubles" without a
recorded A/B (VERDICT r4 'What's wrong' #4); this records it. Both
variants run the identical scan/filter/groupBy; only the aggregate
expressions differ. Best-of-N after warmup, noop-forced.

Usage: python tools/q1_ab.py [repeats]  (env SPARK_GRAFT_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from datamunging_spark.queries import q1_pricing_summary, t  # noqa: E402
from datamunging_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def q1_double(spark, sf_dir):
    """The pre-r4 formulation: raw double sums, round() at the end.
    Order-DEPENDENT (AQE re-planning can flip a 4-dp rounding) — kept
    here only as the A/B baseline."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.sum("l_quantity") / n, 4).alias("avg_qty"),
            F.round(F.sum("l_extendedprice") / n, 4).alias("avg_price"),
            F.round(F.sum("l_discount") / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark(app_name="q1-ab")
    # warm: scan + shuffle/agg codegen machinery
    _force(spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
           .groupBy("l_returnflag").count())
    out = {}
    for name, fn in (("decimal_exact", q1_pricing_summary),
                     ("double_round", q1_double)):
        walls = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            _force(fn(spark, SF_DIR))
            walls.append(round(time.perf_counter() - t0, 4))
        out[name] = {"best": min(walls), "walls": walls}
    out["sf_dir"] = SF_DIR
    out["ratio_decimal_over_double"] = round(
        out["decimal_exact"]["best"] / out["double_round"]["best"], 3
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
