"""Span-sequence equality: Spark operator vs pure-Python oracle on the
deterministic fixture corpus (the BASELINE.json:15 invariant:
(kind, text, media_ref, order) per document)."""

from __future__ import annotations

import pytest

from datamunging_spark.generator import corpus_to_rows, generate_corpus
from datamunging_spark.operators.munge import INPUT_SCHEMA, METRIC_FIELDS, munge
from datamunging_spark.oracle.munge import munge_document
from datamunging_spark.rulesets.loader import load_rulesets

RS = load_rulesets()


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(seed=42, n_docs=25)


@pytest.fixture(scope="module")
def spark_out(spark, corpus):
    df = spark.createDataFrame(corpus_to_rows(corpus), schema=INPUT_SCHEMA)
    out = munge(df.repartition(8, "doc_id"), spark)
    return {r.doc_id: r for r in out.collect()}


def test_span_sequence_equality(spark_out, corpus):
    assert len(spark_out) == len(corpus)
    for doc_id, spans in corpus:
        golden, _ = munge_document(doc_id, spans, RS)
        got = spark_out[doc_id].spans
        assert len(got) == len(golden), doc_id
        for g_spark, g_gold in zip(got, golden):
            assert (
                g_spark.kind,
                g_spark.text,
                g_spark.media_ref,
                g_spark.offset,
            ) == tuple(g_gold), doc_id


def test_metrics_equality(spark_out, corpus):
    for doc_id, spans in corpus:
        _, m = munge_document(doc_id, spans, RS)
        row = spark_out[doc_id]
        for f in METRIC_FIELDS:
            assert getattr(row, f) == getattr(m, f), (doc_id, f)


def test_media_byte_identical(spark_out, corpus):
    for doc_id, spans in corpus:
        got = spark_out[doc_id].spans
        for orig, new in zip(spans, got):
            if orig.kind != "page":
                assert (new.kind, new.text, new.media_ref, new.offset) == tuple(orig)


def test_second_pass_agrees_with_oracle_second_pass(spark, spark_out, corpus):
    """The cascade is one-shot by design (header-strip shifts lines into
    the ±2-page zones, so a second pass may strip more — same as
    re-running the reference scripts on their own output; the pipeline's
    resume anti-join guarantees each doc is processed exactly once).
    The distributed property we DO hold: a second Spark pass equals a
    second oracle pass — the implementations agree on any input,
    including already-munged text."""
    rows = [
        {"doc_id": d, "spans": [s.asDict() for s in r.spans]}
        for d, r in spark_out.items()
    ]
    df = spark.createDataFrame(rows, schema=INPUT_SCHEMA)
    again = {r.doc_id: r for r in munge(df, spark).collect()}
    from datamunging_spark.oracle.munge import Span

    for d, r in spark_out.items():
        spans_once = [Span(s.kind, s.text, s.media_ref, s.offset) for s in r.spans]
        golden_twice, _ = munge_document(d, spans_once, RS)
        assert [tuple(s) for s in again[d].spans] == [tuple(s) for s in golden_twice]
