"""Approximate sketch aggregates: HLL distinct counts, quantile sketches.

At 100 TB, exact count-distinct shuffles every distinct key and exact
percentiles sort whole columns; the sketch forms are one-pass,
fixed-memory, and mergeable (partial sketches combine associatively
across partitions). Exact twins exist in the catalog (monthly_orders,
order_value_percentiles).

The ``queries()`` entries are SKETCH-ONLY — embedding the exact
aggregate alongside the sketch would force the very
shuffle-every-distinct-key / full-sort the sketch exists to avoid. The
error-bound contract lives in tests/test_sketches.py, which computes the
exact values in a separate query and compares.

No DuckDB oracle: sketch estimates are algorithm/seed-specific, so the
driver records a rows-only check; the unit tests pin the tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

HLL_RSD = 0.02  # ~2% relative standard deviation
PCTL_ACCURACY = 10000  # approx_percentile accuracy knob


def q_approx_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL daily distinct users per event type — one pass, fixed memory
    per (day, type) group, no distinct-key shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(
        F.approx_count_distinct("user_id", rsd=HLL_RSD).alias("approx_users"),
    )


def exact_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twin of q_approx_user_reach — test harness only (forces the
    distinct-key shuffle the sketch avoids)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type"
    ).agg(F.count_distinct("user_id").alias("exact_users"))


def q_approx_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based order-value percentiles per priority — bounded-size
    histogram per group, no full value sort."""
    orders = load_table(spark, sf_dir, "orders")
    sketched = orders.groupBy(
        F.col("o_orderpriority").alias("order_priority")
    ).agg(
        F.expr(
            f"approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), {PCTL_ACCURACY})"
        ).alias("approx_pctls"),
    )
    # Scalar columns (not array<double>): array cells are unhashable for
    # pandas-side canonicalizers, and scalars are the friendlier surface.
    return sketched.select(
        "order_priority",
        F.element_at("approx_pctls", 1).alias("p50"),
        F.element_at("approx_pctls", 2).alias("p90"),
        F.element_at("approx_pctls", 3).alias("p99"),
    )


def exact_order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twin of q_approx_order_percentiles — test harness only."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderpriority").alias("order_priority")).agg(
        F.expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))").alias("exact_pctls"),
    )


QUERIES = {
    "approx_user_reach": q_approx_user_reach,
    "approx_order_percentiles": q_approx_order_percentiles,
}

ORACLE: dict[str, str] = {}
