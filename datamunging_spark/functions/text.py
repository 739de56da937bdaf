"""Reusable text column expressions (all JVM-side, codegen-friendly —
no Python in any of these)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens_distinct(col: Column) -> Column:
    """Distinct lowercase whitespace tokens."""
    return F.array_distinct(F.split(F.lower(col), " "))


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles; whole text if fewer than k words."""
    words = F.split(F.lower(col), " ")
    n = F.size(words)
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(
                    " ", *[words[i + j] for j in range(k)]
                ),
            ),
        ).otherwise(F.array(F.concat_ws(" ", col)))
    )


def stopword_hits(col: Column, stopwords: list[str]) -> Column:
    """Count of distinct tokens that are in the given stopword list."""
    return F.size(
        F.array_intersect(tokens_distinct(col), F.array(*[F.lit(w) for w in stopwords]))
    )


def regex_tokens(col: Column, pattern: str = "[a-z]+") -> Column:
    """Regex token extraction (BPE-ish segmentation baseline)."""
    return F.regexp_extract_all(F.lower(col), F.lit(pattern), 0)


def normalized_fingerprint(col: Column) -> Column:
    """md5 over whitespace-normalized lowercase text."""
    return F.md5(F.regexp_replace(F.lower(col), "\\s+", " "))
