"""Shared Spark-side expression helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dsum(c: Column | str, scale: int = 2) -> Column:
    """Deterministic sum over a double column: exact decimal accumulation,
    result cast back to double (twin of registry.dsum_sql)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(c: Column | str, scale: int = 2) -> Column:
    """Deterministic avg over a double column (decimal sum / count)."""
    col = F.col(c) if isinstance(c, str) else c
    return dsum(col, scale) / F.count(col)
