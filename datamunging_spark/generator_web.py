"""Deterministic synthetic web-document generator for the main-content
extraction pipeline (SPEC.md part II).

Pure function of (seed, n_docs). Each document is an interleaved span
list mixing `html` spans (article wrapped in realistic boilerplate:
nav/header/footer chrome, ad/sidebar divs, link farms, malformed-tag
noise), `pdf` spans (layout boxes with margin furniture, one- and
two-column reading order, hyphen splits), and opaque media spans that
must pass through byte-identical.
"""

from __future__ import annotations

import random

from .generator import BODY_WORDS
from .oracle.munge import Span

SITE_NAMES = ["The Daily Gazette", "Morning Chronicle", "Weekly Review"]
NAV_ITEMS = ["Home", "World", "Politics", "Science", "Sports", "Archive"]
AD_TEXTS = [
    "Buy one get one free today only",
    "Subscribe now for exclusive offers",
    "Limited time deal click here",
]
MEDIA_KINDS = ["image", "video", "audio"]


def _sentence(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(BODY_WORDS) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: random.Random) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 18)) for _ in range(rng.randint(2, 5)))


def make_html(rng: random.Random, doc_idx: int) -> str:
    site = rng.choice(SITE_NAMES)
    title = _sentence(rng, rng.randint(4, 8))[:-1]
    nav = "".join(f'<li><a href="/{x.lower()}">{x}</a></li>' for x in NAV_ITEMS)
    paras = "\n".join(
        f"<p>{_paragraph(rng)}</p>" for _ in range(rng.randint(3, 8))
    )
    ad = rng.choice(AD_TEXTS)
    related = "".join(
        f'<li><a href="/a/{i}">{_sentence(rng, 5)[:-1]}</a></li>' for i in range(4)
    )
    # deliberate malformations: unclosed <p>, stray </span>, p-in-p
    noise = "<p>short note<p>" + _paragraph(rng) + "</span>"
    return f"""<!DOCTYPE html>
<html><head><title>{title} - {site}</title>
<script>var t = {doc_idx};</script>
<style>.x{{color:red}}</style></head>
<body>
<header><h1>{site}</h1><nav><ul>{nav}</ul></nav></header>
<div class="ad-banner">{ad}</div>
<main>
<article>
<h2>{title}</h2>
{paras}
{noise}
</article>
</main>
<aside class="sidebar"><h3>Related</h3><ul>{related}</ul></aside>
<div id="cookie-notice">We use cookies. <a href="/accept">Accept</a></div>
<footer><p>&copy; 2026 {site}. All rights reserved.</p></footer>
</body></html>"""


def make_layout(rng: random.Random, page_no: int) -> str:
    """One PDF page in the x0,y0,x1,y1|text box format (SPEC §9)."""
    lines = [f"400,30,600,45|{rng.choice(SITE_NAMES)}", f"480,960,520,975|{page_no}"]
    two_col = rng.random() < 0.5
    n = rng.randint(6, 14)
    y = 100.0
    for i in range(n):
        txt = _sentence(rng, rng.randint(5, 10))[:-1]
        if rng.random() < 0.25:
            cut = max(1, len(txt) // 2)
            txt = txt[:cut] + "-"
        if two_col:
            col_left = i < (n + 1) // 2
            x0 = 40 if col_left else 520
            yy = 100 + (i if col_left else i - (n + 1) // 2) * 60
            lines.append(f"{x0},{yy},{x0 + 440},{yy + 40}|{txt}")
        else:
            lines.append(f"60,{int(y)},940,{int(y) + 40}|{txt}")
            y += 60
    if rng.random() < 0.2:
        lines.append("not a layout line at all")
    rng.shuffle(lines)  # input order is arbitrary; reading order is derived
    return "\n".join(lines)


def make_web_doc(rng: random.Random, doc_idx: int) -> tuple[str, list[Span]]:
    doc_id = f"web.{doc_idx:08d}"
    n_spans = rng.randint(3, 9)
    spans: list[Span] = []
    page_no = 0
    for off in range(n_spans):
        r = rng.random()
        if r < 0.2:
            kind = rng.choice(MEDIA_KINDS)
            spans.append(Span(kind, "", f"{doc_id}/media/{off:05d}.bin", off))
        elif r < 0.6:
            spans.append(Span("html", make_html(rng, doc_idx), "", off))
        else:
            page_no += 1
            spans.append(Span("pdf", make_layout(rng, page_no), f"{doc_id}/page{page_no}.pdf", off))
    return doc_id, spans


def generate_web_corpus(seed: int = 7, n_docs: int = 30):
    """Returns list[(doc_id, list[Span])], deterministic in (seed, n_docs)."""
    rng = random.Random(seed)
    return [make_web_doc(rng, i) for i in range(n_docs)]
