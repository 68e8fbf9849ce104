"""Transform Phase-1 (Clean): make data safe and consistent.

Spark-first re-expression of the reference clean layer
(/root/reference/etl/transform_data_cleaning.py:146):

- snake_case column normalization        (rename — metadata-only, free)
- drop rows with NULL primary key        (filter — pushed to scan)
- fill non-PK NULLs from a default map   (coalesce projections)
- primary-key dedup                      (deterministic window, 1 shuffle)
- explicit type casts                    (cast projections)

The reference's pandas ``drop_duplicates(keep="first")`` depends on file
row order, which is meaningless on a distributed scan; here "first" is
made explicit and deterministic: row_number() over a caller-supplied (or
all-column) total order. At scale this is one hash-partition shuffle on
the PK — the same shuffle a groupBy would pay — and AQE handles skew.
"""

from __future__ import annotations

import re
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def normalize_column_name(column: str) -> str:
    """Deterministic snake_case (reference transform_data_cleaning.py:185)."""
    column = column.strip().lower()
    column = re.sub(r"[^a-z0-9]+", "_", column)
    column = re.sub(r"_+", "_", column)
    return column.strip("_")


def standardize_column_names(df: DataFrame) -> DataFrame:
    """Rename every column to snake_case. Metadata-only — no job runs."""
    return df.toDF(*[normalize_column_name(c) for c in df.columns])


def drop_null_keys(df: DataFrame, primary_key: Sequence[str]) -> DataFrame:
    """Drop rows with any NULL PK column (pushed into the scan)."""
    cond = None
    for pk in primary_key:
        c = F.col(pk).isNotNull()
        cond = c if cond is None else (cond & c)
    return df.filter(cond) if cond is not None else df


def fill_defaults(df: DataFrame, defaults: Mapping[str, object]) -> DataFrame:
    """Fill non-PK NULLs from a default map (projection only)."""
    applicable = {k: v for k, v in defaults.items() if k in df.columns}
    return df.fillna(applicable) if applicable else df


def dedupe_by_key(
    df: DataFrame,
    primary_key: Sequence[str],
    order_by: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Keep exactly one row per PK, deterministically.

    ``order_by`` defines which row is "first"; defaults to all non-PK
    columns ascending so the result is stable regardless of scan order
    or parallelism. One shuffle on the PK hash.
    """
    if order_by is None:
        order_by = [c for c in df.columns if c not in primary_key] or list(primary_key)
    w = Window.partitionBy(*primary_key).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def cast_types(df: DataFrame, type_map: Mapping[str, str]) -> DataFrame:
    """Cast columns to explicit Spark SQL types (projection only)."""
    exprs = [
        F.col(c).cast(type_map[c]).alias(c) if c in type_map else F.col(c)
        for c in df.columns
    ]
    return df.select(*exprs)


def run_cleaning(
    df: DataFrame,
    primary_key: Sequence[str],
    defaults: Mapping[str, object] | None = None,
    type_map: Mapping[str, str] | None = None,
    dedupe_order: Sequence[Column | str] | None = None,
) -> DataFrame:
    """Full T1 pipeline: normalize -> drop-null-PK -> dedup -> fill -> cast.

    Declarative end to end: Catalyst collapses the projections and pushes
    the null-PK filter to the parquet scan; the only shuffle is the dedup.

    Dedup runs BEFORE default filling, so keep-first ordering sees the
    RAW column values (Spark windows sort ascending NULLS FIRST, same as
    the oracles pin) — filling first would let a defaulted value change
    which duplicate wins when rows tie on earlier sort keys and differ
    only in a defaulted column's null-ness.
    """
    df = standardize_column_names(df)
    df = drop_null_keys(df, primary_key)
    df = dedupe_by_key(df, primary_key, dedupe_order)
    if defaults:
        df = fill_defaults(df, defaults)
    if type_map:
        df = cast_types(df, type_map)
    return df
