"""CDC-style change feed: diff two table snapshots into insert/update/
delete rows keyed on the primary key.

The reference's idempotent full-reload (``/root/reference/etl/load.py:44``
DELETE+INSERT) rewrites everything and tells the consumer nothing about
WHAT changed; a change feed is the incremental twin every downstream
consumer (cache invalidation, search indexing, audit) actually wants.
Lakehouse formats expose this as ``table_changes(...)``; over plain
snapshots the same feed is ONE full-outer join on the primary key:

- key only in ``after``  -> insert (new values)
- key only in ``before`` -> delete (old values)
- key in both, any compared column IS DISTINCT FROM -> update
- unchanged keys are dropped (the common case — at 100 TB the feed is
  the small output of a single co-partitioned shuffle, never a rewrite)

Null-safe comparison via ``eqNullSafe`` so NULL -> value and value ->
NULL transitions count as updates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def table_changes(
    before: DataFrame,
    after: DataFrame,
    primary_key: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Change rows between two snapshots sharing a schema.

    Output: primary key columns, ``change_type`` in
    ``('insert', 'update', 'delete')``, and each compared column twice —
    ``old_<col>`` (NULL for inserts) and ``new_<col>`` (NULL for
    deletes). One shuffle on the key; both sides co-partition.
    """
    compare = compare_cols or [c for c in after.columns if c not in primary_key]
    b = before.select(
        *primary_key,
        F.lit(True).alias("_in_before"),
        *[F.col(c).alias(f"old_{c}") for c in compare],
    )
    a = after.select(
        *primary_key,
        F.lit(True).alias("_in_after"),
        *[F.col(c).alias(f"new_{c}") for c in compare],
    )
    joined = b.join(a, primary_key, "full_outer")
    changed = reduce(
        lambda x, y: x | y,
        [
            ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            for c in compare
        ],
    )
    change_type = (
        F.when(F.col("_in_before").isNull(), F.lit("insert"))
        .when(F.col("_in_after").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change_type)
        .filter(F.col("change_type").isNotNull())
        .select(
            *primary_key,
            "change_type",
            *[f"old_{c}" for c in compare],
            *[f"new_{c}" for c in compare],
        )
    )


# Deterministic snapshot derivation for the driver entry: "before" is
# yesterday's load (missing every key ending in 3, pre-raise prices),
# "after" is today's (keys ending in 7 were dropped upstream, and every
# key divisible by 5 got a 10% price raise). Same arithmetic runs in
# the DuckDB oracle, so doubles stay bit-identical.
_INSERT_MOD, _DELETE_MOD, _UPDATE_MOD = 3, 7, 5


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    before = orders.filter(F.col("o_orderkey") % 10 != _INSERT_MOD)
    after = orders.filter(F.col("o_orderkey") % 10 != _DELETE_MOD).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % _UPDATE_MOD == 0,
            F.col("o_totalprice") * 1.1,
        ).otherwise(F.col("o_totalprice")),
    )
    return before, after


def q_cdc_order_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two deterministic orders snapshots."""
    before, after = _snapshots(spark, sf_dir)
    return table_changes(
        before, after, ["o_orderkey"], ["o_orderstatus", "o_totalprice"]
    )


# Incremental view maintenance: decimal type wide enough to carry any
# per-row contribution exactly (proven double->decimal cast scale).
_IVM_DEC = "decimal(25,6)"


def _ivm_snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Same insert/delete/update key sets as ``_snapshots``, but the
    price raise is computed IN DECIMAL (x * 1.1 as DECIMAL(2,1)) so the
    maintained aggregate is exact — summing doubles would make
    base+delta differ from a full recompute by float-order noise.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast(_IVM_DEC).alias("price"),
    )
    before = orders.filter(F.col("o_orderkey") % 10 != _INSERT_MOD)
    raised = (
        F.col("price") * F.lit("1.1").cast("decimal(2,1)")
    ).cast(_IVM_DEC)
    after = orders.filter(F.col("o_orderkey") % 10 != _DELETE_MOD).withColumn(
        "price",
        F.when(F.col("o_orderkey") % _UPDATE_MOD == 0, raised).otherwise(
            F.col("price")
        ),
    )
    return before, after


def q_ivm_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a grouped aggregate from the
    change feed: maintained = base(before) + delta(changes), where each
    change row contributes +new (insert/update) and -old
    (delete/update) to its group — the continuous-aggregate refresh
    every warehouse needs so a 100 TB fact is never rescanned.

    Cost is O(|view| + |changes|): the base is the already-materialized
    rollup (tiny), the delta rows come straight from ``table_changes``
    (one key-partitioned join over the two snapshots), and the final
    re-aggregate shuffles only view-grain rows. Arithmetic is DECIMAL
    end-to-end, so base+delta is bit-identical to the full recompute
    the oracle runs — groups whose maintained count reaches zero drop
    out, matching the recompute exactly.
    """
    before, after = _ivm_snapshots(spark, sf_dir)
    base = before.groupBy("o_orderpriority").agg(
        F.sum("price").cast(_IVM_DEC).alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    ch = table_changes(
        before, after, ["o_orderkey"], ["o_orderpriority", "price"]
    )
    adds = ch.filter(F.col("change_type").isin("insert", "update")).select(
        F.col("new_o_orderpriority").alias("o_orderpriority"),
        F.col("new_price").cast(_IVM_DEC).alias("rev"),
        F.lit(1).cast("bigint").alias("n"),
    )
    subs = ch.filter(F.col("change_type").isin("delete", "update")).select(
        F.col("old_o_orderpriority").alias("o_orderpriority"),
        (-F.col("old_price")).cast(_IVM_DEC).alias("rev"),
        F.lit(-1).cast("bigint").alias("n"),
    )
    return (
        base.unionByName(adds)
        .unionByName(subs)
        .groupBy("o_orderpriority")
        .agg(F.sum("rev").alias("rev"), F.sum("n").alias("n_orders"))
        .filter(F.col("n_orders") > 0)
        .select(
            "o_orderpriority",
            F.col("rev").cast("double").alias("revenue"),
            "n_orders",
        )
    )


QUERIES = {
    "cdc_order_changes": q_cdc_order_changes,
    "ivm_priority_revenue": q_ivm_priority_revenue,
}

ORACLE = {
    "ivm_priority_revenue": f"""
        WITH after_snap AS (
            SELECT o_orderkey, o_orderpriority,
                   CASE WHEN o_orderkey % {_UPDATE_MOD} = 0
                        THEN CAST(CAST(o_totalprice AS DECIMAL(25,6))
                                  * CAST(1.1 AS DECIMAL(2,1))
                                  AS DECIMAL(25,6))
                        ELSE CAST(o_totalprice AS DECIMAL(25,6))
                   END AS price
            FROM orders WHERE o_orderkey % 10 <> {_DELETE_MOD}
        )
        SELECT o_orderpriority,
               CAST(sum(price) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM after_snap GROUP BY o_orderpriority
    """,
    "cdc_order_changes": f"""
        WITH before_snap AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders WHERE o_orderkey % 10 <> {_INSERT_MOD}
        ),
        after_snap AS (
            SELECT o_orderkey, o_orderstatus,
                   CASE WHEN o_orderkey % {_UPDATE_MOD} = 0
                        THEN o_totalprice * 1.1 ELSE o_totalprice END
                       AS o_totalprice
            FROM orders WHERE o_orderkey % 10 <> {_DELETE_MOD}
        )
        SELECT
            COALESCE(b.o_orderkey, a.o_orderkey) AS o_orderkey,
            CASE WHEN b.o_orderkey IS NULL THEN 'insert'
                 WHEN a.o_orderkey IS NULL THEN 'delete'
                 ELSE 'update' END AS change_type,
            b.o_orderstatus AS old_o_orderstatus,
            b.o_totalprice AS old_o_totalprice,
            a.o_orderstatus AS new_o_orderstatus,
            a.o_totalprice AS new_o_totalprice
        FROM before_snap b
        FULL OUTER JOIN after_snap a ON b.o_orderkey = a.o_orderkey
        WHERE b.o_orderkey IS NULL
           OR a.o_orderkey IS NULL
           OR (b.o_orderstatus IS DISTINCT FROM a.o_orderstatus)
           OR (b.o_totalprice IS DISTINCT FROM a.o_totalprice)
    """,
}
