"""Join strategy utilities for scale: skew salting and co-located joins.

AQE's skew-join splitting handles most skew automatically (enabled in
``session.get_spark``), but two cases still need explicit treatment at
100 TB:

- ``salted_join``: an aggregation-free join where one key dominates
  (e.g. a null-like sentinel key holding 30% of a fact). Salting
  explodes the small side R ways and scatters the large side across
  R sub-keys, turning one straggler partition into R even ones.
- ``salted_agg``: two-phase aggregation for skewed group keys —
  partial agg on (key, salt), final agg on key. The partial combine
  bounds any single reducer's input to ~1/R of the hot key.

Both are pure DataFrame transforms (deterministic salts from a hash,
not a RNG) so results are exactly equal to the unsalted plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic salt 0..n_salts-1 derived from the full row hash.

    Hash-derived (not random) so retries/recomputes of a partition
    produce identical salts — required for exactly-once semantics under
    task retry.
    """
    cols = [F.col(c) for c in df.columns]
    return df.withColumn(col_name, F.pmod(F.hash(*cols), F.lit(n_salts)))


def explode_salts(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Replicate every row once per salt value (the small-side dual of
    ``with_salt``)."""
    return df.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: scatter ``large`` over salted sub-keys,
    replicate ``small`` across all salts, join on (keys + salt).

    Result equals ``large.join(small, on, how)`` exactly; the shuffle
    key cardinality is multiplied by ``n_salts`` so a hot key spreads
    over ``n_salts`` reducers. Large-side-preserving joins only: a
    right/full join would emit replicated unmatched small rows.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    salted_large = with_salt(large, n_salts)
    salted_small = explode_salts(small, n_salts)
    out = salted_large.join(salted_small, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates.

    ``aggs`` maps output column -> SUM/COUNT-decomposable partial
    expression; phase 1 groups on (keys + salt), phase 2 re-sums on
    keys. Supported shapes: sums and counts (re-summed exactly).
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


def q_salted_flag_revenue(spark, sf_dir):
    """Skew-safe revenue rollup on a 3-value group key (returnflag).

    A 3-key groupBy concentrates the whole fact on 3 reducers; the
    salted two-phase agg spreads each hot key over n_salts partial
    groups first, so no reducer sees more than ~1/n_salts of a key.
    Result is EXACTLY the plain GROUP BY (decimal partials re-sum
    associatively) — which is what the DuckDB oracle runs.
    """
    from ..catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(25,6)")
    rows = li.select("l_returnflag", rev.alias("rev_dec"))
    agged = salted_agg(
        rows,
        ["l_returnflag"],
        {"rev_dec": F.sum("rev_dec"), "n_lines": F.count(F.lit(1))},
    )
    return agged.select(
        F.col("l_returnflag").alias("return_flag"),
        F.col("rev_dec").cast("double").alias("revenue"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
    )


QUERIES = {
    "salted_flag_revenue": q_salted_flag_revenue,
}

ORACLE = {
    "salted_flag_revenue": """
        SELECT l_returnflag AS return_flag,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY 1
    """,
}
