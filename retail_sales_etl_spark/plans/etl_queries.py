"""ETL-layer query catalog: T1 clean + T2 model queries with DuckDB oracles.

Each entry re-expresses a reference capability (see SURVEY.md §1) against
the testdata star schema. ``QUERIES[name]`` is the Spark implementation,
``ORACLE[name]`` the ANSI-SQL twin DuckDB runs for the correctness gate.

Float discipline (applies to the whole catalog):
- per-row math stays in raw doubles (IEEE ops are bit-identical between
  Spark and DuckDB when expressed identically);
- anything aggregated is cast per-row to DECIMAL first so the sum is
  exact and order-independent (1000-way parallel sum == serial sum);
- window "keep first" rows use an explicit total order with NULLS FIRST
  pinned on both engines.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import cleaning, modeling

# sf_dir whose co-bucketed layout is registered in each session's
# catalog (see _ensure_bucketed_layout): the layout is written once at
# load time, then every query-time call reuses it.
_bucketed_built: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def q_clean_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 clean on customer (transform_data_cleaning.py:146 parity)."""
    customer = load_table(spark, sf_dir, "customer")
    cleaned = cleaning.run_cleaning(
        customer,
        primary_key=["c_custkey"],
        defaults={"c_mktsegment": "UNKNOWN"},
        dedupe_order=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    return cleaned.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.coalesce(F.col("c_acctbal"), F.lit(0.0)).alias("c_acctbal"),
        "c_mktsegment",
    )


def q_clean_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 clean on orders: dedup + defaults + date normalization."""
    orders = load_table(spark, sf_dir, "orders")
    cleaned = cleaning.run_cleaning(
        orders,
        primary_key=["o_orderkey"],
        defaults={"o_orderpriority": "UNKNOWN", "o_orderstatus": "U"},
        dedupe_order=[
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    return cleaned.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.to_date("o_orderdate").alias("order_date"),
        "o_orderpriority",
    )


def q_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return modeling.build_customer_dim(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_part_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return modeling.build_part_dim(load_table(spark, sf_dir, "part"))


def q_supplier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return modeling.build_supplier_dim(
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


def q_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return modeling.build_date_dim(load_table(spark, sf_dir, "orders"))


def q_sales_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return modeling.build_sales_fact(load_table(spark, sf_dir, "lineitem"))


def q_clean_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 clean on the fact at its true grain (orderkey, linenumber,
    partkey, suppkey) — the synthetic data carries one genuine dup."""
    li = load_table(spark, sf_dir, "lineitem")
    cleaned = cleaning.run_cleaning(
        li,
        primary_key=["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"],
        dedupe_order=[
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        ],
    )
    return cleaned.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        F.to_date("l_shipdate").alias("ship_date"),
    )


def q_customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gaps per customer (lead/lag over customer partitions):
    average days between consecutive orders."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    with_gap = orders.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"),
            F.to_date(F.lag("o_orderdate").over(w)),
        ).alias("gap_days"),
    )
    return with_gap.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("gap_days").alias("n_gaps"),
        (F.sum("gap_days").cast("double") / F.count("gap_days")).alias("avg_gap_days"),
        F.min("gap_days").alias("min_gap_days"),
        F.max("gap_days").alias("max_gap_days"),
    )


PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "date"),
    ("o_orderpriority", "str"),
]


def q_profile_orders(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Data-profiling operator: long-format per-column stats (count,
    nulls, distincts, typed min/max) — the extract layer's sanity
    checks surfaced as a queryable table (`/root/reference/etl/
    extract.py:42-132`).

    ONE aggregate pass computes every per-column stat (wide one-row
    aggregate), then `stack()` unpivots to long form — at 100 TB this
    is a single table scan regardless of how many columns are
    profiled, vs one scan per column for the naive union-of-aggs
    shape. Exact `count_distinct` by default (the oracle-parity form);
    ``approx=True`` is the scale path: several exact count_distincts
    in one aggregate plan an Expand that replicates EVERY fact row
    once per distinct-counted column into the shuffle (~10x here —
    the pattern the 100x probe caught in exclusive_late_suppliers),
    where HLL++ sketches (`approx_count_distinct`) keep the single
    no-Expand partial-aggregate pass (plan-audited:
    tests/test_plan_audit.py::test_profile_orders_approx_has_no_expand).
    """
    orders = load_table(spark, sf_dir, "orders")
    nd = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col, kind in PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"nn_{col}")
        )
        aggs.append(nd(F.col(col)).alias(f"nd_{col}"))
        if kind == "num":
            aggs.append(F.min(col).cast("double").alias(f"mn_{col}"))
            aggs.append(F.max(col).cast("double").alias(f"mx_{col}"))
        elif kind == "date":
            aggs.append(F.date_format(F.min(col), "yyyy-MM-dd").alias(f"mns_{col}"))
            aggs.append(F.date_format(F.max(col), "yyyy-MM-dd").alias(f"mxs_{col}"))
        else:
            aggs.append(F.min(col).alias(f"mns_{col}"))
            aggs.append(F.max(col).alias(f"mxs_{col}"))
    wide = orders.agg(*aggs)
    groups = []
    for col, kind in PROFILE_COLS:
        if kind == "num":
            mn, mx = f"mn_{col}", f"mx_{col}"
            mns = mxs = "CAST(NULL AS STRING)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            mns, mxs = f"mns_{col}", f"mxs_{col}"
        groups.append(
            f"'{col}', n_rows, nn_{col}, nd_{col}, {mn}, {mx}, {mns}, {mxs}"
        )
    return wide.selectExpr(
        f"stack({len(PROFILE_COLS)}, {', '.join(groups)}) AS "
        "(column_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
    )


def _ensure_bucketed_layout(spark: SparkSession, sf_dir: str) -> None:
    """Build the co-bucketed warehouse layout ONCE per (process, sf_dir).

    The load layer loads once and queries many (reference
    /root/reference/etl/load.py:103) — the layout write is load-time
    cost, not query-time cost, so repeat calls reuse the existing
    tables instead of rewriting them.
    """
    import os
    import tempfile

    from ..load import writers

    if _bucketed_built.get(spark) == sf_dir:
        return
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_bucketed_{os.getpid()}_{abs(hash(sf_dir)) % 10**8}",
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    writers.write_bucketed_table(
        li, "li_bucketed", ["l_orderkey"], 8,
        sort_by=["l_orderkey"], path=f"{base}/lineitem",
    )
    writers.write_bucketed_table(
        orders, "orders_bucketed", ["o_orderkey"], 8,
        sort_by=["o_orderkey"], path=f"{base}/orders",
    )
    _bucketed_built[spark] = sf_dir


def q_bucketed_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact revenue rollup on a co-bucketed warehouse layout.

    The load layer owns the physical layout (the reference loads once
    and queries many, /root/reference/etl/load.py:103): both facts are
    written bucketed on the join key via
    ``load.writers.write_bucketed_table``, so the lineitem⋈orders join
    reads pre-shuffled buckets — NO Exchange on either join side
    (pinned by tests/test_plan_audit.py). At 100 TB the fact-fact
    shuffle is this query's dominant cost; the bucketed layout removes
    it for every downstream consumer at the price of one write. Scale
    knob: n_buckets tracks cluster cores (1024+ in production, 8 here).
    """
    _ensure_bucketed_layout(spark, sf_dir)
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        spark.table("li_bucketed")
        .join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(
            F.sum(rev.cast("decimal(25,6)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
            F.count_distinct("o_orderkey").alias("n_orders"),
        )
    )


def q_dq_check_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations (dbt-test shape): evaluate
    every rule in ONE aggregate pass plus one anti-join, emit a
    long-form violations report.

    Rules: PK/FK non-null, non-negative amounts, dates inside the
    calendar spine, referential integrity to customer. The conditional
    sums share a single scan; only the orphan-FK check needs a join,
    and its probe side is the distinct FK set. At 100 TB this is the
    shape that replaces per-rule full scans.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    viol = orders.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_orderkey"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_custkey"),
        F.sum(F.when(F.col("o_totalprice") < 0.0, 1).otherwise(0))
        .cast("bigint")
        .alias("negative_totalprice"),
        F.sum(
            F.when(
                (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
                | (F.col("o_orderdate") >= F.lit("2030-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("orderdate_out_of_range"),
    )
    # NULL FKs belong to the null_custkey check, not the orphan check
    # (a left-anti join would count them as unmatched)
    orphans = (
        orders.select("o_custkey")
        .filter(F.col("o_custkey").isNotNull())
        .distinct()
        .join(customer, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_custkeys"))
    )
    wide = viol.crossJoin(orphans)
    checks = [
        "null_orderkey",
        "null_custkey",
        "negative_totalprice",
        "orderdate_out_of_range",
        "orphan_custkeys",
    ]
    pairs = ", ".join(f"'{c}', {c}" for c in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {pairs}) AS (check_name, n_violations)"
    ).withColumn("passed", F.col("n_violations") == 0)


QUERIES = {
    "profile_orders": q_profile_orders,
    "dq_check_orders": q_dq_check_orders,
    "bucketed_fact_join": q_bucketed_fact_join,
    "clean_customer": q_clean_customer,
    "clean_orders": q_clean_orders,
    "clean_lineitem": q_clean_lineitem,
    "customer_order_gaps": q_customer_order_gaps,
    "customer_dim": q_customer_dim,
    "part_dim": q_part_dim,
    "supplier_dim": q_supplier_dim,
    "date_dim": q_date_dim,
    "sales_fact": q_sales_fact,
}

def _profile_oracle() -> str:
    """Single-scan oracle twin: one wide aggregate CTE, unpivoted by
    UNION ALL over the (already 1-row) aggregate. n_nulls is CAST to
    BIGINT — DuckDB types sum(int) as HUGEINT, Spark as bigint."""
    wide = ["count(*) AS n_rows"]
    rows = []
    for col, kind in PROFILE_COLS:
        wide.append(
            f"CAST(sum(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS nn_{col}"
        )
        wide.append(f"count(DISTINCT {col}) AS nd_{col}")
        if kind == "num":
            wide.append(f"CAST(min({col}) AS DOUBLE) AS mn_{col}")
            wide.append(f"CAST(max({col}) AS DOUBLE) AS mx_{col}")
            mn, mx = f"mn_{col}", f"mx_{col}"
            mns = mxs = "CAST(NULL AS VARCHAR)"
        elif kind == "date":
            wide.append(f"strftime(min({col}), '%Y-%m-%d') AS mns_{col}")
            wide.append(f"strftime(max({col}), '%Y-%m-%d') AS mxs_{col}")
            mn = mx = "CAST(NULL AS DOUBLE)"
            mns, mxs = f"mns_{col}", f"mxs_{col}"
        else:
            wide.append(f"min({col}) AS mns_{col}")
            wide.append(f"max({col}) AS mxs_{col}")
            mn = mx = "CAST(NULL AS DOUBLE)"
            mns, mxs = f"mns_{col}", f"mxs_{col}"
        rows.append(
            f"SELECT '{col}' AS column_name, n_rows, nn_{col} AS n_nulls, "
            f"nd_{col} AS n_distinct, {mn} AS min_num, {mx} AS max_num, "
            f"{mns} AS min_str, {mxs} AS max_str FROM s"
        )
    return (
        f"WITH s AS (SELECT {', '.join(wide)} FROM orders) "
        + " UNION ALL ".join(rows)
    )


ORACLE = {
    "profile_orders": _profile_oracle(),
    "dq_check_orders": """
        WITH wide AS (
            SELECT
                CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                    AS null_orderkey,
                CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                    AS null_custkey,
                CAST(sum(CASE WHEN o_totalprice < 0.0 THEN 1 ELSE 0 END) AS BIGINT)
                    AS negative_totalprice,
                CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01 00:00:00'
                               OR o_orderdate >= TIMESTAMP '2030-01-01 00:00:00'
                              THEN 1 ELSE 0 END) AS BIGINT)
                    AS orderdate_out_of_range,
                (SELECT CAST(count(*) AS BIGINT) FROM (
                    SELECT DISTINCT o_custkey FROM orders
                ) o LEFT JOIN customer ON o.o_custkey = c_custkey
                 WHERE c_custkey IS NULL AND o.o_custkey IS NOT NULL)
                    AS orphan_custkeys
            FROM orders
        )
        SELECT check_name, n_violations, n_violations = 0 AS passed
        FROM (
            SELECT 'null_orderkey' AS check_name, null_orderkey AS n_violations FROM wide
            UNION ALL SELECT 'null_custkey', null_custkey FROM wide
            UNION ALL SELECT 'negative_totalprice', negative_totalprice FROM wide
            UNION ALL SELECT 'orderdate_out_of_range', orderdate_out_of_range FROM wide
            UNION ALL SELECT 'orphan_custkeys', orphan_custkeys FROM wide
        )
    """,
    "bucketed_fact_join": """
        SELECT o_orderpriority AS order_priority,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
               count(*) AS n_items,
               count(DISTINCT o_orderkey) AS n_orders
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "clean_customer": """
        SELECT c_custkey, c_name, c_nationkey,
               coalesce(c_acctbal, 0.0) AS c_acctbal,
               coalesce(c_mktsegment, 'UNKNOWN') AS c_mktsegment
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY c_custkey
                ORDER BY c_name NULLS FIRST, c_nationkey NULLS FIRST,
                         c_acctbal NULLS FIRST, c_mktsegment NULLS FIRST
            ) AS rn
            FROM customer
            WHERE c_custkey IS NOT NULL
        )
        WHERE rn = 1
    """,
    "clean_orders": """
        SELECT o_orderkey, o_custkey,
               coalesce(o_orderstatus, 'U') AS o_orderstatus,
               o_totalprice,
               CAST(o_orderdate AS DATE) AS order_date,
               coalesce(o_orderpriority, 'UNKNOWN') AS o_orderpriority
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY o_orderkey
                ORDER BY o_custkey NULLS FIRST, o_orderstatus NULLS FIRST,
                         o_totalprice NULLS FIRST, o_orderdate NULLS FIRST,
                         o_orderpriority NULLS FIRST
            ) AS rn
            FROM orders
            WHERE o_orderkey IS NOT NULL
        )
        WHERE rn = 1
    """,
    "clean_lineitem": """
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               l_quantity, l_extendedprice,
               CAST(l_shipdate AS DATE) AS ship_date
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY l_orderkey, l_linenumber, l_partkey, l_suppkey
                ORDER BY l_quantity NULLS FIRST, l_extendedprice NULLS FIRST,
                         l_discount NULLS FIRST, l_tax NULLS FIRST,
                         l_returnflag NULLS FIRST, l_linestatus NULLS FIRST,
                         l_shipdate NULLS FIRST
            ) AS rn
            FROM lineitem
            WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL
              AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
        )
        WHERE rn = 1
    """,
    "customer_order_gaps": """
        SELECT o_custkey AS customer_id,
               count(*) AS n_orders,
               count(gap_days) AS n_gaps,
               CAST(sum(gap_days) AS DOUBLE) / count(gap_days) AS avg_gap_days,
               min(gap_days) AS min_gap_days,
               max(gap_days) AS max_gap_days
        FROM (
            SELECT o_custkey,
                   datediff('day',
                            CAST(lag(o_orderdate) OVER (
                                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ) AS DATE),
                            CAST(o_orderdate AS DATE)) AS gap_days
            FROM orders
        )
        GROUP BY 1
    """,
    "customer_dim": """
        SELECT c_custkey AS customer_id,
               c_name AS customer_name,
               split_part(c_name, '#', 2) AS customer_num,
               upper(c_mktsegment) AS segment_normalized,
               c_acctbal AS acctbal,
               CASE WHEN c_acctbal <= 1000.0 THEN 'LOW'
                    WHEN c_acctbal <= 5000.0 THEN 'MEDIUM'
                    ELSE 'HIGH' END AS acctbal_band,
               c_acctbal > 5000.0 AS is_premium_customer,
               n_name AS nation_name,
               r_name AS region_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "part_dim": """
        SELECT p_partkey AS part_id,
               p_name AS part_name,
               p_brand AS brand,
               upper(p_type) AS type_normalized,
               p_size AS part_size,
               p_retailprice AS retail_price,
               CASE WHEN p_retailprice <= 500.0 THEN 'LOW'
                    WHEN p_retailprice <= 2000.0 THEN 'MEDIUM'
                    ELSE 'HIGH' END AS price_band,
               p_retailprice > 2000.0 AS is_premium_product
        FROM part
    """,
    "supplier_dim": """
        SELECT s_suppkey AS supplier_id,
               s_name AS supplier_name,
               s_acctbal AS acctbal,
               upper(n_name) AS nation_normalized,
               r_name AS supplier_region,
               r_name IN ('ASIA', 'EUROPE') AS is_metro_region
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "date_dim": """
        SELECT CAST(d AS DATE) AS date,
               year(d) AS year,
               month(d) AS month,
               strftime(d, '%Y-%m') AS year_month,
               isodow(d) - 1 AS day_of_week,
               (isodow(d) - 1) IN (5, 6) AS is_weekend,
               quarter(d) AS quarter
        FROM (
            SELECT unnest(generate_series(
                (SELECT CAST(min(o_orderdate) AS DATE) FROM orders),
                (SELECT CAST(max(o_orderdate) AS DATE) FROM orders),
                INTERVAL 1 DAY)) AS d
        )
    """,
    "sales_fact": """
        SELECT l_orderkey AS order_id,
               l_linenumber AS line_number,
               l_partkey AS part_id,
               l_suppkey AS supplier_id,
               l_quantity AS quantity,
               l_extendedprice AS gross_amount,
               l_extendedprice * l_discount AS discount_amount,
               l_extendedprice - l_extendedprice * l_discount AS net_amount,
               (l_extendedprice - l_extendedprice * l_discount) * l_tax AS tax_amount,
               l_discount > 0.0 AS is_discounted,
               year(l_shipdate) AS order_year,
               strftime(l_shipdate, '%Y-%m') AS order_month
        FROM lineitem
    """,
}
