from .text import (
    tokens_distinct,
    word_shingles,
    stopword_hits,
    regex_tokens,
    normalized_fingerprint,
)
from .vectors import cosine, cosine_to_literal, dot, l2_norm, hyperplane_bucket

__all__ = [
    "tokens_distinct",
    "word_shingles",
    "stopword_hits",
    "regex_tokens",
    "normalized_fingerprint",
    "cosine",
    "cosine_to_literal",
    "dot",
    "l2_norm",
    "hyperplane_bucket",
]
