"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The catalogs live in ``datamunging_spark.queries`` (relational surface,
SURVEY.md §2.2) and ``datamunging_spark.ml_ops`` (dedup / similarity /
text-analytics / multimodal / the flagship extraction cascade). Queries
whose oracle SQL is None (MinHash/SimHash via xxhash64, the munge
cascade, multimodal stubs) get the driver's rows-only check and are
instead verified by pytest invariants (tests/test_ml_ops.py,
tests/test_munge_spark.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datamunging_spark.ml_ops import ML_QUERIES, extract_munge  # noqa: E402
from datamunging_spark.queries import RELATIONAL_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full OCR-munge extraction cascade over an
    interleaved text+media spans table synthesized from sf0.001
    documents — one Arrow-batched mapInPandas pass (BASELINE.json:6)."""
    return extract_munge(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _sql) in {**RELATIONAL_QUERIES, **ML_QUERIES}.items():
        out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, (_fn, sql) in {**RELATIONAL_QUERIES, **ML_QUERIES}.items():
        if sql is not None:
            out[name] = sql
    return out
