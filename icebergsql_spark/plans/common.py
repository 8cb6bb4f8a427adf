"""Shared exact-arithmetic helpers for gate queries.

Lives in its own registration-free module so importing it never triggers
@register side effects — registration ORDER decides which queries land in
the driver's ~50-entry correctness window (see plans/__init__.load_all).

Determinism contract with the DuckDB oracle: money columns are exact
2-decimal doubles, so SUMs run over DECIMAL casts (exact, order-independent)
or integer cents (exact, primitive-long fast path); the final aggregate is
cast back to DOUBLE. See plans/tpch.py for the full rationale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def money(col: str):
    """Exact decimal view of a 2-decimal-place double column."""
    return F.col(col).cast(DEC)


def one_minus(col: str):
    return (F.lit(1.0) - F.col(col)).cast(DEC)


def one_plus(col: str):
    return (F.lit(1.0) + F.col(col)).cast(DEC)


def cents(col: str):
    """Exact integer-cents view of a 2-decimal-place double column.

    Integer (bigint) sums are exact and order-independent like the decimal
    strategy, but stay on the fast primitive-long aggregation path — Spark's
    decimal SUM promotes past precision 18 into the BigDecimal-backed
    representation, ~4× slower on a full-table aggregate. Overflow bound:
    int64 holds sums to 9.2e18; at cents scale (~1e7/row) that is ~1e11
    rows PER GROUP, and the scale-6 products (~1e11/row) are safe to
    ~1e7 rows/group at this data's magnitudes — fine for the bench scales;
    a 100 TB deployment flips the same queries back to DECIMAL(38,x) sums
    (`money()` exists for exactly that).
    """
    return F.round(F.col(col) * 100).cast("bigint")
