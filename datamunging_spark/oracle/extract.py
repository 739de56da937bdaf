"""Pure-Python oracle for main-content extraction (SPEC.md part II).

Single-process, reference-faithful implementation of the HTML
boilerplate strip (§8) and PDF/layout parse (§9). This module is the
executable spec: the Spark operator (operators/extract.py) is an
INDEPENDENT implementation — this one materializes a DOM tree and walks
it recursively; the operator streams parser events against a stack and
never builds a tree. pytest asserts span-sequence equality between the
two, so agreement is evidence of correctness rather than shared code.

Heuristic lineage (public): text/link-density boilerplate features after
Kohlschütter et al., WSDM 2010; tag/class pruning lists in the style of
Readability / trafilatura. Parsing is stdlib ``html.parser`` only.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

PRUNE_TAGS = frozenset(
    "script style noscript nav header footer aside form iframe svg "
    "template button select head title".split()
)
PRUNE_ATTR_TOKENS = (
    "nav menu sidebar footer header banner ad advert promo cookie "
    "share social comment related breadcrumb".split()
)
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li td th blockquote pre div article section "
    "main body".split()
)
HEADING_TAGS = frozenset(["h1", "h2", "h3", "h4", "h5", "h6"])
VOID_TAGS = frozenset("br img hr meta link input".split())

MIN_BLOCK_CHARS = 25
MIN_HEADING_CHARS = 5
MAX_LINK_DENSITY = 0.33

_WS_RE = re.compile(r"\s+")


def _prunable(tag: str, attrs) -> bool:
    if tag in PRUNE_TAGS:
        return True
    for name, value in attrs:
        if name in ("class", "id") and value:
            v = value.lower()
            if any(tok in v for tok in PRUNE_ATTR_TOKENS):
                return True
    return False


class _Node:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag, attrs=()):
        self.tag = tag
        self.attrs = attrs
        self.children = []  # _Node or str (text)


class _TreeBuilder(HTMLParser):
    """Builds the DOM with SPEC §8.7 stack rules (implied-close of p,
    pop-to-match on end tags, ignore unmatched)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        tag = tag.lower()
        if tag in VOID_TAGS:
            if tag == "br":
                self.stack[-1].children.append(" ")
            return
        if tag in BLOCK_TAGS and self.stack[-1].tag == "p":
            self.stack.pop()
        node = _Node(tag, tuple(attrs))
        self.stack[-1].children.append(node)
        self.stack.append(node)

    def handle_endtag(self, tag):
        tag = tag.lower()
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # unmatched: ignore

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


class _Block:
    __slots__ = ("tag", "parts", "raw_chars", "link_chars")

    def __init__(self, tag):
        self.tag = tag
        self.parts = []
        self.raw_chars = 0
        self.link_chars = 0

    @property
    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.parts)).strip()

    def keep(self) -> bool:
        chars = len(self.text)
        floor = MIN_HEADING_CHARS if self.tag in HEADING_TAGS else MIN_BLOCK_CHARS
        if chars < floor:
            return False
        return self.link_chars / self.raw_chars <= MAX_LINK_DENSITY


def extract_html(html: str) -> tuple[str, int, int]:
    """Returns (main_text, blocks_kept, blocks_dropped)."""
    builder = _TreeBuilder()
    builder.feed(html or "")
    blocks: list[_Block] = []

    def walk(node: _Node, block: _Block, in_link: bool):
        for child in node.children:
            if isinstance(child, str):
                if not block.parts:
                    # lazy registration at first raw text gives blocks
                    # their document (first-emission) order
                    blocks.append(block)
                block.parts.append(child)
                block.raw_chars += len(child)
                if in_link:
                    block.link_chars += len(child)
            else:
                if _prunable(child.tag, child.attrs):
                    continue
                child_block = _Block(child.tag) if child.tag in BLOCK_TAGS else block
                walk(child, child_block, in_link or child.tag == "a")

    # ONE virtual body block for text outside any block element, shared
    # across the whole document (mirrors the operator's implicit root
    # scope at the bottom of its stack)
    walk(builder.root, _Block("body"), False)
    kept = [b for b in blocks if b.keep()]
    return "\n\n".join(b.text for b in kept), len(kept), len(blocks) - len(kept)


# ---------------------------------------------------------------------------
# §9 layout parse
# ---------------------------------------------------------------------------

_LAYOUT_RE = re.compile(
    r"^\s*(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?),(-?\d+(?:\.\d+)?)\|(.*)$"
)


def parse_layout(layout: str) -> tuple[str, int, int, int]:
    """Returns (text, lines_kept, lines_dropped, columns)."""
    boxes = []
    dropped = 0
    for raw in (layout or "").split("\n"):
        if not raw.strip():
            continue
        m = _LAYOUT_RE.match(raw)
        if not m:
            dropped += 1
            continue
        x0, y0, x1, y1 = (float(m.group(i)) for i in range(1, 5))
        boxes.append((x0, y0, x1, y1, m.group(5)))
    body = []
    for x0, y0, x1, y1, txt in boxes:
        if (y0 < 60 or y0 > 940) and len(txt) <= 40:
            dropped += 1
        else:
            body.append((x0, y0, x1, y1, txt))
    columns = 1
    if body:
        half = sum(1 for x0, _, x1, _, _ in body if x1 < 520 or x0 > 480)
        if half / len(body) >= 0.70:
            columns = 2
    if columns == 2:
        left = [b for b in body if (b[0] + b[2]) / 2 < 500]
        right = [b for b in body if (b[0] + b[2]) / 2 >= 500]
        ordered = sorted(left, key=lambda b: (b[1], b[0])) + sorted(
            right, key=lambda b: (b[1], b[0])
        )
    else:
        ordered = sorted(body, key=lambda b: (b[1], b[0]))
    out: list[str] = []
    for _, _, _, _, txt in ordered:
        if out and out[-1].endswith("-") and txt[:1].islower():
            out[-1] = out[-1][:-1] + txt
        else:
            out.append(txt)
    return "\n".join(out), len(ordered), dropped, columns


# ---------------------------------------------------------------------------
# whole document
# ---------------------------------------------------------------------------

EXTRACT_METRIC_FIELDS = [
    "html_blocks_kept",
    "html_blocks_dropped",
    "pdf_lines_kept",
    "pdf_lines_dropped",
    "chars_in",
    "chars_out",
]


def extract_doc(spans: list[dict]) -> tuple[list[dict], dict]:
    """SPEC part II over one document's span list. Non-html/pdf spans
    (pages, media) pass through byte-identical, order preserved."""
    m = {f: 0 for f in EXTRACT_METRIC_FIELDS}
    out = []
    for s in spans:
        s = dict(s)
        if s["kind"] == "html":
            m["chars_in"] += len(s["text"] or "")
            text, kept, dropped = extract_html(s["text"])
            s["text"] = text
            m["html_blocks_kept"] += kept
            m["html_blocks_dropped"] += dropped
            m["chars_out"] += len(text)
        elif s["kind"] == "pdf":
            m["chars_in"] += len(s["text"] or "")
            text, kept, dropped, _cols = parse_layout(s["text"])
            s["text"] = text
            m["pdf_lines_kept"] += kept
            m["pdf_lines_dropped"] += dropped
            m["chars_out"] += len(text)
        out.append(s)
    return out, m
