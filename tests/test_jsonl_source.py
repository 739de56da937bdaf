from __future__ import annotations

import json

import pytest

from datamunging_spark.generator import corpus_to_rows, generate_corpus
from datamunging_spark.sources.jsonl import read_jsonl_pages, read_jsonl_spans


@pytest.fixture(scope="module")
def corpus():
    return corpus_to_rows(generate_corpus(seed=13, n_docs=6, body_lines=(4, 6)))


def test_read_jsonl_spans_roundtrip(spark, corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    p = d / "docs.jsonl"
    with open(p, "w") as f:
        for row in corpus:
            f.write(json.dumps(row) + "\n")
    got = {r.doc_id: r.spans for r in read_jsonl_spans(spark, str(p)).collect()}
    assert len(got) == len(corpus)
    for row in corpus:
        assert [
            (s.kind, s.text, s.media_ref, s.offset) for s in got[row["doc_id"]]
        ] == [tuple(s.values()) for s in row["spans"]]


def test_read_jsonl_pages_assembles_order(spark, corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("jsonl")
    p = d / "pages.jsonl"
    with open(p, "w") as f:
        for row in corpus:
            # shuffle page order on disk: assembly must restore it
            for s in reversed(row["spans"]):
                f.write(
                    json.dumps(
                        {
                            "doc_id": row["doc_id"],
                            "page_no": s["offset"],
                            "text": s["text"],
                            "media_ref": s["media_ref"] or None,
                            "kind": s["kind"],
                        }
                    )
                    + "\n"
                )
    got = {r.doc_id: r.spans for r in read_jsonl_pages(spark, str(p)).collect()}
    for row in corpus:
        assert [
            (s.kind, s.text, s.media_ref, s.offset) for s in got[row["doc_id"]]
        ] == [tuple(s.values()) for s in row["spans"]]


# ---- TSV feature sink (R16 parity) ---------------------------------------


def test_tsv_feature_sink_round_trip(spark, tmp_path_factory):
    from datamunging_spark.generator import corpus_to_rows, generate_corpus
    from datamunging_spark.operators.munge import INPUT_SCHEMA, munge
    from datamunging_spark.sources.tsv import (
        FEATURE_COLUMNS,
        read_features_tsv,
        write_features_tsv,
    )

    rows = corpus_to_rows(generate_corpus(seed=13, n_docs=8))
    out = munge(spark.createDataFrame(rows, schema=INPUT_SCHEMA), spark)
    path = str(tmp_path_factory.mktemp("tsv") / "features")
    write_features_tsv(out, path, single_file=True)
    back = read_features_tsv(spark, path)
    assert back.columns == FEATURE_COLUMNS
    want = {r.doc_id: (r.pages, r.tokens_total) for r in out.collect()}
    got = {r.doc_id: (r.pages, r.tokens_total) for r in back.collect()}
    assert got == want
