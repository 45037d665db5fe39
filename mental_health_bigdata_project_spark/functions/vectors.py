"""Native array/vector math for embedding columns.

No reference counterpart (the reference has no arrays at all —
SURVEY.md §1.3); this is the [EXT] similarity-search surface.  All
arithmetic is built-in higher-order functions (``zip_with`` +
``aggregate``), i.e. JVM-side sequential folds — deterministic float
summation order and no Python worker round trips.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double_array(c: Column | str) -> Column:
    """float[] -> double[] (exact widening) so all downstream arithmetic
    runs in float64 — matches the DuckDB oracle's ::DOUBLE[] cast."""
    c = F.col(c) if isinstance(c, str) else c
    return F.transform(c, lambda x: x.cast("double"))


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a|·|b|); inputs should already be double arrays."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
