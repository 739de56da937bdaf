"""Local mirror of the driver's correctness gate: run every Spark query
and its DuckDB oracle SQL side-by-side, compare row count + column names
+ exact values (sorted by column name, then row-wise) — the strictest
interpretation of the driver's order-insensitive value-hash."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from datamunging_spark.queries import RELATIONAL_QUERIES

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for tbl in TABLES:
        # replay the engine's ingestion canonicalization (queries.t /
        # SPEC.md §0): documents NULL text/lang/source ≡ '', NULL
        # embedding rows dropped
        sel = (
            "* REPLACE (coalesce(text, '') AS text, "
            "coalesce(lang, '') AS lang, coalesce(source, '') AS source)"
            if tbl == "documents" else "*"
        )
        where = " WHERE embedding IS NOT NULL" if tbl == "embeddings" else ""
        c.sql(
            f"CREATE VIEW {tbl} AS SELECT {sel} "
            f"FROM read_parquet('{SF_DIR}/{tbl}.parquet'){where}"
        )
    return c


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows(df_pandas):
    cols = sorted(df_pandas.columns)
    recs = [
        tuple(_canon(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(recs, key=lambda r: tuple((x is None, str(x)) for x in r))


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_query_matches_oracle(spark, con, name):
    fn, sql = RELATIONAL_QUERIES[name]
    got = fn(spark, SF_DIR).toPandas()
    want = con.sql(sql).df()
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    gc, gr = _rows(got)
    wc, wr = _rows(want)
    assert gc == wc, f"{name}: columns {gc} vs {wc}"
    mismatches = [i for i, (a, b) in enumerate(zip(gr, wr)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} row mismatches; first: "
        f"{gr[mismatches[0]]} vs {wr[mismatches[0]]}"
    )
