"""Reusable text column expressions (all JVM-side, codegen-friendly —
no Python in any of these)."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def tokens_distinct(col: Column) -> Column:
    """Distinct lowercase whitespace tokens."""
    return F.array_distinct(F.split(F.lower(col), " "))


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles; whole text if fewer than k words.

    Built as arrays_zip of k shifted slices rather than a transform that
    indexes words[i+j]: any outer expression referenced inside a lambda
    body is re-evaluated per element, so the indexing form re-splits the
    whole text k times for EVERY shingle (O(words^2) per doc). The zip
    form evaluates the split k+1 times per ROW and the lambda only
    touches pre-materialized struct fields.
    """
    words = F.split(F.lower(col), " ")
    n = F.size(words)
    m = n - k + 1  # number of shingles
    zipped = F.arrays_zip(
        *[F.slice(words, j + 1, m).alias(f"w{j}") for j in range(k)]
    )
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(
                zipped,
                lambda s: F.concat_ws(" ", *[s[f"w{j}"] for j in range(k)]),
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
