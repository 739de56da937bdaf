"""Pairtree zip source: path resolution, distributed read, end-to-end
munge over the reference's on-disk corpus layout."""

from __future__ import annotations

from pathlib import Path

import pytest

from datamunging_spark.generator import generate_corpus
from datamunging_spark.operators.munge import munge
from datamunging_spark.oracle.munge import munge_document
from datamunging_spark.rulesets.loader import load_rulesets
from datamunging_spark.sources.pairtree import (
    pairtree_path,
    read_pairtree_corpus,
    write_volume_zip,
)

RS = load_rulesets()


def test_pairtree_path_shingles_and_subs():
    p = pairtree_path("/corpus", "mdp.39015012345678")
    assert str(p) == (
        "/corpus/mdp/pairtree_root/39/01/50/12/34/56/78/"
        "39015012345678/39015012345678.zip"
    )
    # char substitutions: ':'->'+', '/'->'=', '.'->','
    p2 = pairtree_path("/c", "uc1.b4:56/7.x")
    assert "b4+56=7,x.zip" in str(p2)


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pairtree")
    docs = generate_corpus(seed=21, n_docs=8, body_lines=(5, 9))
    expected = {}
    for doc_id, spans in docs:
        pages = [s.text for s in spans if s.kind == "page"]
        if not pages:
            continue
        write_volume_zip(str(root), doc_id, pages)
        expected[doc_id] = pages
    return str(root), expected


def test_read_pairtree_corpus(spark, corpus_root):
    root, expected = corpus_root
    got = {r.doc_id: r for r in read_pairtree_corpus(spark, root).collect()}
    assert set(got) == set(expected)
    for doc_id, pages in expected.items():
        spans = got[doc_id].spans
        assert [s.text for s in spans] == pages
        assert [s.offset for s in spans] == list(range(len(pages)))
        assert all(s.kind == "page" for s in spans)


def test_pairtree_to_munge_end_to_end(spark, corpus_root):
    root, expected = corpus_root
    out = {r.doc_id: r for r in munge(read_pairtree_corpus(spark, root), spark).collect()}
    for doc_id, pages in expected.items():
        from datamunging_spark.oracle.munge import Span

        spans = [Span("page", t, "", i) for i, t in enumerate(pages)]
        golden, m = munge_document(doc_id, spans, RS)
        assert [s.text for s in out[doc_id].spans] == [s.text for s in golden]
        assert out[doc_id].tokens_corrected == m.tokens_corrected
