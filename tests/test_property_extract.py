"""Hypothesis property tests for main-content extraction: the DOM-tree
oracle and the streaming operator implementation must agree on ARBITRARY
tag soup and layout text, not just the generator's corpus. Pure-Python
(no Spark session) so the search can run hundreds of examples."""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datamunging_spark.operators.extract import (
    extract_html_stream,
    parse_layout_stream,
)
from datamunging_spark.oracle.extract import extract_html, parse_layout

TAGS = (
    "p div span a li ul ol h1 h2 h3 em strong b i td th table tr body html "
    "head title nav footer header aside script style pre blockquote article "
    "main section form button br img"
).split()

ATTRS = [
    "",
    " class='ad-top'",
    ' class="content"',
    " id='main'",
    ' id="footer-2"',
    " href='/x'",
    " class='NAV-menu extra'",
]

text_chunk = st.text(
    alphabet="abcdef ghij &<>;/=\"'\n\t.-0123456789",
    min_size=1,
    max_size=40,
)

token = st.one_of(
    st.builds(lambda t, a: f"<{t}{a}>", st.sampled_from(TAGS), st.sampled_from(ATTRS)),
    st.builds(lambda t: f"</{t}>", st.sampled_from(TAGS)),
    text_chunk,
    st.just("<!-- comment -->"),
    st.just("<br/>"),
    st.just("&amp;&lt;&#65;"),
)

soup = st.lists(token, min_size=0, max_size=50).map("".join)


@settings(max_examples=200, deadline=None)
@given(soup)
def test_html_implementations_agree(html):
    assert extract_html(html) == extract_html_stream(html)


num = st.integers(min_value=-50, max_value=1050)
box_line = st.builds(
    lambda a, b, c, d, t: f"{a},{b},{c},{d}|{t}",
    num,
    num,
    num,
    num,
    st.text(alphabet="abc XY-|,", max_size=50),
)
layout_line = st.one_of(box_line, text_chunk)
layout = st.lists(layout_line, max_size=25).map("\n".join)


@settings(max_examples=200, deadline=None)
@given(layout)
def test_layout_implementations_agree(doc):
    a = parse_layout(doc)
    b = parse_layout_stream(doc)
    assert (a[0], a[1], a[2]) == b


@settings(max_examples=100, deadline=None)
@given(soup)
def test_no_invented_characters(html):
    """No character is invented: the multiset of non-whitespace chars in
    the output is a subset of the decoded input's (text nodes only ever
    concatenate and whitespace-normalize — implementation-agnostic)."""
    from collections import Counter
    import html as html_mod

    text, kept, dropped = extract_html(html)
    assert kept >= 0 and dropped >= 0
    out = Counter(c for c in text if not c.isspace())
    src = Counter(c for c in html_mod.unescape(html) if not c.isspace())
    assert all(src[c] >= n for c, n in out.items())
