"""Pure Column-expression helpers for the retail domain.

Everything here is a JVM-side Catalyst expression (whole-stage
codegen-able) — no Python UDFs. Semantics mirror the reference's
derived columns (see /root/reference/etl/transform_data_modeling.py:391
``_assign_band`` and :399 ``_assign_customer_tenure_bucket``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Decimal types used for exact, order-independent money aggregation.
# Doubles are fine per-row (IEEE ops are deterministic) but sums of
# doubles depend on partition order — at 1000-way parallelism that is
# non-deterministic, so all money aggregates go through DECIMAL.
MONEY = "decimal(18,2)"
RATE = "decimal(18,4)"


def money(col: Column | str) -> Column:
    return F.col(col).cast(MONEY) if isinstance(col, str) else col.cast(MONEY)


def rate(col: Column | str) -> Column:
    return F.col(col).cast(RATE) if isinstance(col, str) else col.cast(RATE)


def dsum(col: Column, scale: int = 2) -> Column:
    """Exact decimal sum, surfaced as a rounded double (stable across
    engines and partition orders)."""
    return F.round(F.sum(col).cast("double"), scale)


def davg(col: Column, scale: int = 4) -> Column:
    """Order-independent average: exact decimal sum / count, rounded
    with the engine-portable floor form (a quotient can land on a
    half-boundary where Spark and DuckDB round() disagree — see
    functions/rounding.py)."""
    from .rounding import fround

    return fround(F.sum(col).cast("double") / F.count(F.lit(1)), scale)


def price_band(price: Column, low: float = 500.0, high: float = 2000.0) -> Column:
    """LOW / MEDIUM / HIGH banding (reference products_dim.price_band)."""
    return (
        F.when(price <= low, F.lit("LOW"))
        .when(price <= high, F.lit("MEDIUM"))
        .otherwise(F.lit("HIGH"))
    )


def tenure_bucket(days: Column) -> Column:
    """NEW (<=90) / REGULAR (<=365) / LOYAL (reference customers_dim)."""
    return (
        F.when(days <= 90, F.lit("NEW"))
        .when(days <= 365, F.lit("REGULAR"))
        .otherwise(F.lit("LOYAL"))
    )


def year_month(d: Column) -> Column:
    """'yyyy-MM' bucket (reference sales_fact.order_month)."""
    return F.date_format(d, "yyyy-MM")


def weekday_mon0(d: Column) -> Column:
    """Day of week with Monday=0 (pandas ``dt.dayofweek`` semantics)."""
    return F.weekday(d)
