"""Shared Spark-side expression helpers for the query registry."""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dsum(c: Column | str, scale: int = 2, prec: int = 8) -> Column:
    """Deterministic sum over a double column: exact decimal accumulation,
    result cast back to double (twin of registry.dsum_sql).

    ``prec`` defaults to 8 so the sum's result type is DECIMAL(18,s) —
    at most 18 digits, which Spark accumulates in an unscaled *long*
    (fast path) instead of per-row BigDecimal objects (~30% faster
    steady-state and a much smaller codegen tree; measured on the Q1
    shape).  Caller contract: per-row |value| < 10^(prec-scale).  Every
    registry input is a bounded per-row amount (TPC-H price columns top
    out near 5.6e5; events.value < 1e3), leaving >10^10 of headroom in
    the 18-digit accumulator even at sf100.  For columns without such a
    bound pass ``prec=18`` and take the exact-but-slower wide path.

    The DuckDB twin keeps CAST(x AS DECIMAL(18,s)): both casts are
    exact on 2dp-valued doubles, so values agree digit-for-digit."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double")


def davg(c: Column | str, scale: int = 2, prec: int = 8) -> Column:
    """Deterministic avg over a double column (decimal sum / count)."""
    col = F.col(c) if isinstance(c, str) else c
    return dsum(col, scale, prec) / F.count(col)
