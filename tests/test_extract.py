"""Main-content extraction (SPEC.md part II): the Spark mapInArrow
operator must be span-sequence-equal to the pure-Python oracle, media
must pass through byte-identical, and the plan must stay one Python
stage."""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datamunging_spark.generator import corpus_to_rows
from datamunging_spark.generator_web import generate_web_corpus, make_html
from datamunging_spark.operators.extract import (
    EXTRACT_OUTPUT_SCHEMA,
    extract,
    extract_html_stream,
)
from datamunging_spark.operators.munge import INPUT_SCHEMA
from datamunging_spark.oracle.extract import (
    EXTRACT_METRIC_FIELDS,
    extract_doc,
    extract_html,
)


def _spark_results(spark, docs):
    df = spark.createDataFrame(corpus_to_rows(docs), schema=INPUT_SCHEMA)
    out = extract(df.repartition(4, "doc_id"), spark).collect()
    return {r.doc_id: r for r in out}


def test_spark_matches_oracle_span_equality(spark):
    docs = generate_web_corpus(seed=21, n_docs=25)
    got = _spark_results(spark, docs)
    assert len(got) == len(docs)
    for doc_id, spans in docs:
        want_spans, want_m = extract_doc([s._asdict() for s in spans])
        row = got[doc_id]
        have = [(s.kind, s.text, s.media_ref, s.offset) for s in row.spans]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in want_spans]
        assert have == want, f"{doc_id}: span sequence differs"
        for f in EXTRACT_METRIC_FIELDS:
            assert getattr(row, f) == want_m[f], f"{doc_id}.{f}"


def test_media_spans_byte_identical(spark):
    docs = generate_web_corpus(seed=22, n_docs=15)
    got = _spark_results(spark, docs)
    for doc_id, spans in docs:
        row = got[doc_id]
        for orig, out in zip(spans, row.spans):
            assert orig.offset == out.offset
            assert orig.kind == out.kind
            assert orig.media_ref == out.media_ref
            if orig.kind not in ("html", "pdf"):
                assert out.text == orig.text


def test_plan_is_single_python_stage(spark):
    docs = generate_web_corpus(seed=23, n_docs=5)
    df = spark.createDataFrame(corpus_to_rows(docs), schema=INPUT_SCHEMA)
    plan = extract(df, spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1
    assert "EvalPython" not in plan


def test_boilerplate_dropped_content_kept():
    rng = random.Random(5)
    html = make_html(rng, 1)
    text, kept, dropped = extract_html(html)
    assert kept > 0 and dropped > 0
    # chrome is gone
    for marker in ("Politics", "Subscribe", "cookies", "All rights reserved", "Related"):
        assert marker not in text
    # long article paragraphs survive
    assert max(len(p) for p in text.split("\n\n")) >= 50


def test_implementations_agree_on_tag_soup():
    rng = random.Random(99)
    tags = "p div span a li ul h2 em footer nav script b td body head title br pre".split()
    for _ in range(150):
        parts = []
        for _ in range(rng.randint(1, 50)):
            r = rng.random()
            if r < 0.35:
                cls = rng.choice(["", " class='ad-top'", " id='main'", " class='content'"])
                parts.append(f"<{rng.choice(tags)}{cls}>")
            elif r < 0.6:
                parts.append(f"</{rng.choice(tags)}>")
            else:
                parts.append(
                    " ".join(
                        rng.choice(["word", "the quick brown fox jumps over it", "&amp;"])
                        for _ in range(rng.randint(1, 5))
                    )
                )
        html = "".join(parts)
        assert extract_html(html) == extract_html_stream(html)


def test_output_schema_stable():
    names = [f.name for f in EXTRACT_OUTPUT_SCHEMA.fields]
    assert names[:2] == ["doc_id", "spans"]
    assert set(EXTRACT_METRIC_FIELDS) <= set(names)


def test_exploded_extraction_byte_equal(spark):
    """Span-level parallel path (monster-doc skew elimination) must be
    byte-identical to the single-pass operator, metrics included."""
    from datamunging_spark.operators.extract import extract_auto, extract_exploded

    docs = generate_web_corpus(seed=41, n_docs=6)
    # synthesize a monster: tile one doc's spans to 300 spans
    base_id, base_spans = docs[0]
    tiled = [
        s._replace(offset=i) for i, s in enumerate(
            [base_spans[i % len(base_spans)] for i in range(300)]
        )
    ]
    docs = [("web.monster", tiled), ("web.empty", [])] + docs[1:]
    df = spark.createDataFrame(corpus_to_rows(docs), schema=INPUT_SCHEMA)
    # a NULL spans row (nullable per INPUT_SCHEMA) must not be dropped
    df = df.unionByName(
        spark.createDataFrame([("web.null", None)], schema=INPUT_SCHEMA)
    )

    whole = {r.doc_id: r for r in extract(df, spark).collect()}
    routed = {r.doc_id: r for r in extract_auto(df, spark, monster_threshold=50).collect()}
    exploded = {r.doc_id: r for r in extract_exploded(df, spark).collect()}
    assert set(whole) == set(routed) == set(exploded)
    for doc_id, w in whole.items():
        for other in (routed[doc_id], exploded[doc_id]):
            assert [tuple(s) for s in w.spans] == [tuple(s) for s in other.spans], doc_id
            for f in EXTRACT_METRIC_FIELDS:
                assert getattr(w, f) == getattr(other, f), f"{doc_id}.{f}"


def test_fast_scanner_differential_vs_stdlib():
    """The fast tokenizer must emit a block stream identical to stdlib
    HTMLParser(convert_charrefs=True).feed() (no close) on a hostile
    space: entities (valid/unknown/numeric/bare), comments (terminated
    and not), doctype, PIs, bogus declarations, script/style CDATA with
    near-miss end tags, malformed/unterminated tags, quoted/unquoted
    attrs, charrefs in attr values, split charrefs at EOF."""
    from datamunging_spark.operators.extract import (
        _Bail,
        _fast_scan,
        _StreamExtractor,
    )

    def blocks(html, fast):
        p = _StreamExtractor()
        if fast:
            _fast_scan(html or "", p)
        else:
            p.feed(html or "")
        return [(b.tag, "".join(b.parts), b.raw, b.link) for b in p.blocks]

    rng = random.Random(77)
    tags = (
        "p div span a li ul h2 em footer nav script style b td body "
        "head title br pre"
    ).split()
    frag = [
        "&amp;", "&lt;x", "&unknown;", "&#65;", "&#x41;", "& loose", "&",
        "<", "<3", "< p>", "<!doctype html>", "<!-- c -->",
        "<!--unterminated", "<? pi ?>", "<?x", "<!bogus>", "</>", "</ >",
        "</p attr='>'>", "<p", "<p class", "<p class=", "<p/>",
        "<img src=x/>", "word", "text &amp; more", "<p class='ad-top'>",
        "<div id=main>", '<div class="content" id="x">',
        "<a href='/x' class='nav'>link</a>", "</scriptxyz>",
        "</script b>x", "tail&am", "<a href='a&amp;b'>",
        "<p  class='x'>", "<p class='x' >", "<SCRIPT>x</SCRIPT>",
        "<p >", "</p >",
    ]
    checked = 0
    for _ in range(800):
        parts = [
            rng.choice(frag)
            if rng.random() > 0.5
            else (
                f"<{rng.choice(tags)}>"
                if rng.random() < 0.6
                else f"</{rng.choice(tags)}>"
            )
            for _ in range(rng.randint(1, 25))
        ]
        html = "".join(parts)
        try:
            fb = blocks(html, fast=True)
        except _Bail:
            continue
        assert fb == blocks(html, fast=False), html
        checked += 1
    assert checked > 700
