"""Reusable vector column expressions over array<float|double> columns.

All built-in higher-order functions — Catalyst evaluates them JVM-side;
at 10^9 vectors these are scan-only projections. For even hotter paths
(dim ≥ ~1024) swap in a vectorized pandas_udf over numpy — the call
sites keep the same column signature.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F, types as T


def _as_double(v: Column) -> Column:
    return v.cast(T.ArrayType(T.DoubleType()))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def l2_norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, 0.0 when either vector has zero norm.

    The guard is not cosmetic: Spark 4 runs ANSI mode, so ONE zero
    vector in 10^9 rows would otherwise kill the whole job with
    DIVIDE_BY_ZERO (caught by tools/fuzz_correctness.py). Convention:
    a zero vector is similar to nothing — 0.0, identically in the
    DuckDB oracles (where 0/0 is NaN, which sorts as the LARGEST
    similarity and silently corrupts top-k instead of crashing)."""
    a, b = _as_double(a), _as_double(b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den > 0, dot(a, b) / den).otherwise(F.lit(0.0))


def cosine_to_literal(vec_col: Column, qvec: list[float]) -> Column:
    """Cosine similarity of a vector column against a literal query vector
    (query norm folded to a constant at plan time); 0.0 on zero norm —
    see cosine()."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    v = _as_double(vec_col)
    den = l2_norm(v) * F.lit(math.sqrt(sum(x * x for x in qvec)))
    return F.when(den > 0, dot(v, q) / den).otherwise(F.lit(0.0))


def hyperplane_bucket(vec_col: Column, hyperplanes: list[list[float]]) -> Column:
    """Sign-of-dot-product LSH bucket id (random-hyperplane hashing)."""
    v = _as_double(vec_col)
    bucket = None
    for j, h in enumerate(hyperplanes):
        hp = F.array(*[F.lit(float(x)) for x in h])
        bit = F.when(dot(v, hp) > 0, F.lit(2**j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("int")
