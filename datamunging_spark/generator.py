"""Deterministic synthetic interleaved-span volume generator.

Pure function of (seed, n_docs) — FIXTURES.md §1. Produces documents that
exercise every operator R3–R19: running headers with fuzzy perturbation,
arabic/roman page-number lines, ligatures/long-s, end-of-line hyphen
splits (real and decoy), OCR errors, f-for-s words (unambiguous and
context-ambiguous), variant spellings, syncope forms, names, numerals,
and randomly interleaved media spans. Doc lengths are skewed (a few
50–200-span monsters) to exercise salting (R18).
"""

from __future__ import annotations

import random

from .oracle.munge import Span

# Vocabulary drawn from the committed main_dictionary so hyphen fusions and
# f/s recoveries actually hit the dictionary.
BODY_WORDS = (
    "the and of to in a is that was for it with as his on be at by he had "
    "her this which she from they were are not but have you all any can "
    "history volume letter author reader nature state people country "
    "power order matter manner reason season music house water earth fire "
    "light day night morning river mountain valley forest field garden "
    "hand head heart mind soul spirit life love hope word language read "
    "write think believe come take give present certain common whole part"
).split()

HYPHEN_FUSIONS = [  # (left, right) with left+right in dictionary
    ("under", "standing"),
    ("remark", "able"),
    ("con", "sideration"),
    ("circum", "stance"),
    ("in", "formation"),
    ("ob", "servation"),
    ("cor", "poration"),
    ("satis", "faction"),
]
DECOY_HYPHENS = [("qux", "zort"), ("blar", "gle"), ("xen", "qilp")]

LIGATURE_WORDS = ["ﬁre", "ﬂower", "aﬀair", "ſpirit", "ſame", "cæsar", "phœnix"]
OCR_ERRORS = ["tbe", "tbat", "wbich", "bave", "witb", "tlie", "aud"]
FS_UNAMBIGUOUS = ["beft", "moft", "houfe", "pleafure", "fenfe", "perfon", "neceffary"]
FS_AMBIGUOUS = [("the", "fame"), ("very", "fame"), ("to", "fail"), ("the", "fun"), ("his", "fon"), ("the", "fea")]
VARIANTS = ["musick", "publick", "shew", "compleat", "honour", "colour"]
SYNCOPE = ["join'd", "receiv'd", "perform'd", "'tis", "o'er", "ne'er"]
NAMES = ["Johnson", "Milton", "London", "Oxford", "Boswell", "Paris"]
MEDIA_KINDS = ["image", "plate", "map"]

HEADER_TITLES = [
    "THE HISTORY OF ENGLAND",
    "Essays on Criticism",
    "A Journey to the Western Islands",
    "The Lives of the Poets",
    "Observations on Nature",
]


def _roman(n: int) -> str:
    vals = [(1000, "m"), (900, "cm"), (500, "d"), (400, "cd"), (100, "c"),
            (90, "xc"), (50, "l"), (40, "xl"), (10, "x"), (9, "ix"),
            (5, "v"), (4, "iv"), (1, "i")]
    out = []
    for v, s in vals:
        while n >= v:
            out.append(s)
            n -= v
    return "".join(out)


def _body_line(rng: random.Random) -> str:
    n = rng.randint(5, 12)
    words = [rng.choice(BODY_WORDS) for _ in range(n)]
    r = rng.random()
    if r < 0.10:
        words[rng.randrange(n)] = rng.choice(LIGATURE_WORDS)
    elif r < 0.20:
        words[rng.randrange(n)] = rng.choice(OCR_ERRORS)
    elif r < 0.30:
        words[rng.randrange(n)] = rng.choice(FS_UNAMBIGUOUS)
    elif r < 0.38:
        ctx, amb = rng.choice(FS_AMBIGUOUS)
        i = rng.randrange(n - 1)
        words[i], words[i + 1] = ctx, amb
    elif r < 0.46:
        words[rng.randrange(n)] = rng.choice(VARIANTS)
    elif r < 0.54:
        words[rng.randrange(n)] = rng.choice(SYNCOPE)
    elif r < 0.60:
        words[rng.randrange(n)] = rng.choice(NAMES)
    if rng.random() < 0.15:
        words[-1] = words[-1] + "."
    if rng.random() < 0.08:
        words[0] = '"' + words[0]
    return " ".join(words)


def _page_text(
    rng: random.Random,
    title: str,
    page_no: int,
    with_header: bool,
    body_lines: tuple[int, int] = (30, 45),
) -> str:
    lines: list[str] = []
    if with_header:
        # fuzzily perturbed running header: page number, case jitter
        hdr = title
        if rng.random() < 0.5:
            hdr = f"{page_no} {hdr}" if rng.random() < 0.5 else f"{hdr} {page_no}"
        if rng.random() < 0.2:
            hdr = hdr.lower()
        lines.append(hdr)
    # realistic printed-page density (~30-45 lines/page like the
    # reference's HathiTrust OCR pages), overridable for small fixtures
    n_body = rng.randint(*body_lines)
    for _ in range(n_body):
        lines.append(_body_line(rng))
    # hyphen split across two adjacent lines
    if rng.random() < 0.5 and len(lines) >= 2:
        left, right = rng.choice(HYPHEN_FUSIONS if rng.random() < 0.7 else DECOY_HYPHENS)
        i = rng.randrange(len(lines) - 1)
        if i == 0 and with_header:
            i = 1
        if i + 1 < len(lines):
            lines[i] = lines[i] + " " + left + "-"
            lines[i + 1] = right + " " + lines[i + 1]
    # bare page-number line (arabic or roman) as footer
    if rng.random() < 0.7:
        lines.append(str(page_no) if rng.random() < 0.6 else _roman(page_no))
    return "\n".join(lines)


def make_volume(
    rng: random.Random,
    doc_idx: int,
    monster: bool,
    body_lines: tuple[int, int] = (30, 45),
) -> tuple[str, list[Span]]:
    doc_id = f"mdp.3901{doc_idx:010d}"
    n_spans = rng.randint(50, 200) if monster else rng.randint(3, 10)
    title = rng.choice(HEADER_TITLES)
    headered = rng.random() < 0.8
    spans: list[Span] = []
    page_no = 0
    for off in range(n_spans):
        if rng.random() < 0.15:
            kind = rng.choice(MEDIA_KINDS)
            spans.append(Span(kind, "", f"{doc_id}/media/{off:05d}.bin", off))
        else:
            page_no += 1
            spans.append(
                Span("page", _page_text(rng, title, page_no, headered, body_lines), "", off)
            )
    return doc_id, spans


def generate_corpus(
    seed: int = 42,
    n_docs: int = 30,
    monster_frac: float = 0.1,
    body_lines: tuple[int, int] = (30, 45),
):
    """Returns list[(doc_id, list[Span])], deterministic in (seed, n_docs)."""
    rng = random.Random(seed)
    docs = []
    n_monsters = max(1, int(n_docs * monster_frac))
    for i in range(n_docs):
        docs.append(make_volume(rng, i, monster=(i < n_monsters), body_lines=body_lines))
    return docs


def corpus_to_rows(docs) -> list[dict]:
    """Rows shaped for spark.createDataFrame with the spans schema."""
    return [
        {
            "doc_id": doc_id,
            "spans": [
                {"kind": s.kind, "text": s.text, "media_ref": s.media_ref, "offset": s.offset}
                for s in spans
            ],
        }
        for doc_id, spans in docs
    ]
