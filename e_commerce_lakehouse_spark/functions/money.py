"""Exact money arithmetic over double-typed columns.

Why: summing doubles is order-dependent, and Spark's ``round`` (BigDecimal
HALF_UP on the exact binary value) disagrees with other engines' scaled-
multiply rounding on ~0.4% of boundary values. The engine therefore
quantizes money to integer cents at the edge with ``floor(x*100 + 0.5)``
— a fixed sequence of IEEE-754 ops that every engine evaluates
identically — aggregates exactly over longs (associative, shuffle-order-
independent), and divides back to double once at the end.

This also makes 100 TB aggregation deterministic across retries/AQE
re-plans: partial-aggregate merge order can't change a long sum.

SQL-equivalent fragments (DuckDB/ANSI) are kept alongside each Column
builder so the oracle strings stay in lock-step.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """floor(x*100 + 0.5) as BIGINT. SQL: CAST(floor(x * 100.0 + 0.5) AS BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(100.0) + F.lit(0.5)).cast("long")


CENTS_SQL = "CAST(floor({x} * 100.0 + 0.5) AS BIGINT)"


def revenue_cents() -> Column:
    """Lineitem net revenue in cents: floor(extprice*(1-discount)*100 + 0.5).

    Matches SQL: CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)
    — identical left-associative op order on both sides.
    """
    return F.floor(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * F.lit(100.0)
        + F.lit(0.5)
    ).cast("long")


REVENUE_CENTS_SQL = (
    "CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)"
)


def money_from_cents(cents_col: Column | str) -> Column:
    """cents → double money. SQL: CAST(c AS DOUBLE) / 100.0."""
    c = F.col(cents_col) if isinstance(cents_col, str) else cents_col
    return c.cast("double") / F.lit(100.0)
