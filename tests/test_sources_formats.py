"""ORC / CSV-with-schema / Avro-gate source surface + merge upsert."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from datamunging_spark.catalog import ParquetTableIO, merge_upsert
from datamunging_spark.generator import corpus_to_rows, generate_corpus
from datamunging_spark.operators.munge import INPUT_SCHEMA
from datamunging_spark.sources.formats import (
    read_avro,
    read_csv,
    read_orc,
    write_orc,
)


def test_orc_roundtrips_nested_spans(spark, tmp_path):
    """ORC must round-trip the interleaved array<struct> spans table
    byte-exactly (same nested-type support as parquet)."""
    docs = generate_corpus(seed=11, n_docs=8)
    df = spark.createDataFrame(corpus_to_rows(docs), schema=INPUT_SCHEMA)
    path = str(tmp_path / "spans_orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    want = {r.doc_id: [tuple(s) for s in r.spans] for r in df.collect()}
    got = {r.doc_id: [tuple(s) for s in r.spans] for r in back.collect()}
    assert got == want


def test_orc_pushdown_and_pruning(spark, tmp_path):
    """Filters and column pruning must reach the ORC scan just like
    parquet — the format choice must not cost plan quality."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), F.lit("x").alias("pad")
    )
    path = str(tmp_path / "orc_pd")
    write_orc(df, path)
    q = read_orc(spark, path).where(F.col("k") == 3).select("id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,3)" in plan
    assert "pad" not in plan.split("ReadSchema")[1]
    assert q.count() == df.where(F.col("id") % 7 == 3).count()


def test_csv_explicit_schema_failfast(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("doc_id,n\na,1\nb,2\n")
    out = read_csv(spark, str(p), "doc_id string, n int")
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "string",
        "int",
    ]
    assert {(r.doc_id, r.n) for r in out.collect()} == {("a", 1), ("b", 2)}
    bad = tmp_path / "bad.csv"
    bad.write_text("doc_id,n\na,notanumber\n")
    with pytest.raises(Exception):  # FAILFAST: malformed row kills the job
        read_csv(spark, str(bad), "doc_id string, n int").collect()


def test_avro_gate_is_loud(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "nope"))


def test_merge_upsert_parquet_backend(spark, tmp_path):
    io = ParquetTableIO()
    target = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "doc_id string, v int"
    )
    merge_upsert(spark, base, target, io=io)
    updates = spark.createDataFrame(
        [("b", 2), ("d", 2)], "doc_id string, v int"
    )
    merge_upsert(spark, updates, target, io=io)
    got = {(r.doc_id, r.v) for r in io.read(spark, target).collect()}
    assert got == {("a", 1), ("b", 2), ("c", 1), ("d", 2)}
