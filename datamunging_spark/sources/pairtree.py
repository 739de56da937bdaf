"""Pairtree + zip corpus source (reference parity: R1, SURVEY.md §2.1 —
``OCRnormalizer/FileCabinet.py``'s pairtree resolution and the one-zip-
per-volume, one-.txt-per-page layout of HathiTrust corpora).

Spark-first design: volumes are discovered and read with the built-in
``binaryFile`` source (distributed listing + reads, one row per zip),
then a single Arrow-batched ``mapInPandas`` unzips and assembles each
volume's ordered span array. No driver-side file walking — at 10^7 zips
the listing, reads and unzips all happen on executors.

The pairtree spec implemented (ppath shingles of 2, standard character
substitutions) matches the Library of Congress pairtree 0.1 spec the
HathiTrust layout uses.
"""

from __future__ import annotations

import io
import zipfile
from pathlib import Path
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..operators.munge import INPUT_SCHEMA

# pairtree character substitutions (spec §3): id → filesystem-safe
_SUBS = [("/", "="), (":", "+"), (".", ",")]


def clean_id(doc_id: str) -> str:
    s = doc_id
    for a, b in _SUBS:
        s = s.replace(a, b)
    return s


def unclean_id(cleaned: str) -> str:
    s = cleaned
    for a, b in _SUBS:
        s = s.replace(b, a)
    return s


def pairtree_path(root: str, doc_id: str) -> Path:
    """<root>/<prefix>/pairtree_root/<2-char shingles>/<clean>/<clean>.zip"""
    prefix, _, rest = doc_id.partition(".")
    c = clean_id(rest)
    shingles = [c[i : i + 2] for i in range(0, len(c), 2)]
    return Path(root, prefix, "pairtree_root", *shingles, c, f"{c}.zip")


def write_volume_zip(root: str, doc_id: str, pages: list[str]) -> Path:
    """Test/ingest helper: write one volume in the reference layout."""
    p = pairtree_path(root, doc_id)
    p.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(p, "w", zipfile.ZIP_DEFLATED) as zf:
        for i, text in enumerate(pages):
            zf.writestr(f"{clean_id(doc_id.partition('.')[2])}_{i:08d}.txt", text)
    return p


def _assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        doc_ids, spans_col = [], []
        for path, content in zip(pdf["path"], pdf["content"]):
            name = Path(path).name
            cleaned = name[:-4] if name.endswith(".zip") else name
            # recover "<prefix>.<id>" from <root>/<prefix>/pairtree_root/...
            parts = Path(path).parts
            pr_idx = parts.index("pairtree_root")
            doc_id = f"{parts[pr_idx - 1]}.{unclean_id(cleaned)}"
            with zipfile.ZipFile(io.BytesIO(content)) as zf:
                names = sorted(n for n in zf.namelist() if n.endswith(".txt"))
                spans = [
                    {
                        "kind": "page",
                        "text": zf.read(n).decode("utf-8", errors="replace"),
                        "media_ref": "",
                        "offset": i,
                    }
                    for i, n in enumerate(names)
                ]
            doc_ids.append(doc_id)
            spans_col.append(spans)
        yield pd.DataFrame({"doc_id": doc_ids, "spans": spans_col})


def read_pairtree_corpus(spark: SparkSession, root: str) -> DataFrame:
    """Distributed pairtree scan → spans table (doc_id, spans)."""
    binaries = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path", "content")
    )
    return binaries.mapInPandas(_assemble, schema=INPUT_SCHEMA)
