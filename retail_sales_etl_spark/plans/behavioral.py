"""Behavioral/retail analytics: RFM segmentation, in-group rankings,
conversion funnels — with DuckDB oracles.

The retail-analytics queries a warehouse user builds on top of the
reference's star schema. Plans stay one-shuffle-per-grouping: RFM is a
single orders pass + ntile windows over the customer aggregate (the
window input is already one row per customer — tiny relative to the
fact); rankings partition by region so no global-order bottleneck
exists; the funnel is one conditional aggregation per user.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load_table
from ..functions.rounding import fround

DEC = "decimal(25,6)"


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles per customer.

    ntile(4) over explicit total orders (value + customer_id tie-break)
    so quartile assignment is deterministic and engine-portable.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.max(F.to_date("o_orderdate")).alias("last_order_date"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast(DEC)).alias("monetary_dec"),
    )
    w_r = Window.orderBy(F.col("last_order_date").desc(), F.col("customer_id"))
    w_f = Window.orderBy(F.col("frequency").desc(), F.col("customer_id"))
    w_m = Window.orderBy(F.col("monetary_dec").desc(), F.col("customer_id"))
    return per_cust.select(
        "customer_id",
        "last_order_date",
        "frequency",
        F.col("monetary_dec").cast("double").alias("monetary"),
        F.ntile(4).over(w_r).alias("r_quartile"),
        F.ntile(4).over(w_f).alias("f_quartile"),
        F.ntile(4).over(w_m).alias("m_quartile"),
    ).withColumn(
        "rfm_segment",
        F.concat(F.col("r_quartile"), F.col("f_quartile"), F.col("m_quartile")),
    )


def q_nation_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank nations by revenue within their region (partitioned window)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_nation = (
        orders.join(broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev_dec"))
    )
    w = Window.partitionBy("region_name").orderBy(
        F.col("rev_dec").desc(), F.col("nation_name")
    )
    return per_nation.select(
        "region_name",
        "nation_name",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.row_number().over(w).alias("rank_in_region"),
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View -> click -> purchase funnel: per-user stage flags rolled up
    into stage conversion counts (ordered by first-occurrence time)."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    viewed = F.col("first_view").isNotNull()
    clicked = viewed & F.col("first_click").isNotNull() & (
        F.col("first_click") > F.col("first_view")
    )
    purchased = clicked & F.col("first_purchase").isNotNull() & (
        F.col("first_purchase") > F.col("first_click")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("int")).alias("n_viewed"),
        F.sum(clicked.cast("int")).alias("n_clicked_after_view"),
        F.sum(purchased.cast("int")).alias("n_purchased_after_click"),
        (F.sum(purchased.cast("int")).cast("double") / F.sum(viewed.cast("int")))
        .alias("view_to_purchase_rate"),
    )


TREND_EPOCH = "1992-01-01"


def q_nation_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation revenue trend: closed-form OLS (slope + intercept) of
    daily order revenue against the day index — the one-pass
    regression a dashboard runs per key to rank growth/decline, with
    no iterative fitting.

    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2); all five sufficient
    statistics are DECIMAL-exact aggregates (x is an integer day
    offset, y an exact DECIMAL revenue sum), so the closed form is
    bit-identical across engines — the float math happens once per
    nation, after the aggregation. Plan: one fact shuffle to the
    (nation, day) grid, one re-agg to nations, broadcast dims; the
    regression itself is free.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    daily = (
        orders.join(
            broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.datediff(
                F.to_date("o_orderdate"),
                F.lit(TREND_EPOCH).cast("date"),
            ).alias("x"),
        )
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("y"))
    )
    stats = daily.groupBy("nation_name").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").cast("decimal(25,0)").alias("sx"),
        F.sum(F.col("x").cast("decimal(25,0)") * F.col("x")).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("x")).cast("decimal(38,6)").alias("sxy"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    denom = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    # a nation with one observed day has denom exactly 0 (integer-
    # derived doubles): emit NULL, not Spark NaN vs DuckDB NULL
    return stats.select(
        "nation_name",
        "n_days",
        F.when(denom != 0.0, fround(slope, 6)).alias("slope"),
        F.when(denom != 0.0, fround(intercept, 6)).alias("intercept"),
    )


QUERIES = {
    "customer_rfm": q_customer_rfm,
    "nation_revenue_rank": q_nation_revenue_rank,
    "nation_revenue_trend": q_nation_revenue_trend,
    "events_funnel": q_events_funnel,
}

_TREND_DENOM = (
    "(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_TREND_SLOPE = (
    "(CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    f" / {_TREND_DENOM}"
)

ORACLE = {
    "nation_revenue_trend": f"""
        WITH daily AS (
            SELECT n_name AS nation_name,
                   datediff('day', DATE '{TREND_EPOCH}',
                            CAST(o_orderdate AS DATE)) AS x,
                   sum(CAST(o_totalprice AS DECIMAL(25,6))) AS y
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY 1, 2
        ),
        stats AS (
            SELECT nation_name, count(*) AS n_days,
                   CAST(sum(x) AS DECIMAL(25,0)) AS sx,
                   sum(CAST(x AS DECIMAL(25,0)) * x) AS sxx,
                   sum(y) AS sy,
                   CAST(sum(y * x) AS DECIMAL(38,6)) AS sxy
            FROM daily GROUP BY 1
        )
        SELECT nation_name, n_days,
               CASE WHEN {_TREND_DENOM} <> 0.0
                    THEN floor(({_TREND_SLOPE}) * 1e6 + 0.5) / 1e6 END AS slope,
               CASE WHEN {_TREND_DENOM} <> 0.0
                    THEN floor(((CAST(sy AS DOUBLE) - ({_TREND_SLOPE})
                         * CAST(sx AS DOUBLE))
                         / CAST(n_days AS DOUBLE)) * 1e6 + 0.5) / 1e6 END AS intercept
        FROM stats
    """,
    "customer_rfm": """
        SELECT customer_id, last_order_date, frequency,
               CAST(monetary_dec AS DOUBLE) AS monetary,
               CAST(ntile(4) OVER (ORDER BY last_order_date DESC, customer_id) AS INTEGER) AS r_quartile,
               CAST(ntile(4) OVER (ORDER BY frequency DESC, customer_id) AS INTEGER) AS f_quartile,
               CAST(ntile(4) OVER (ORDER BY monetary_dec DESC, customer_id) AS INTEGER) AS m_quartile,
               CAST(ntile(4) OVER (ORDER BY last_order_date DESC, customer_id) AS VARCHAR)
                 || CAST(ntile(4) OVER (ORDER BY frequency DESC, customer_id) AS VARCHAR)
                 || CAST(ntile(4) OVER (ORDER BY monetary_dec DESC, customer_id) AS VARCHAR)
                 AS rfm_segment
        FROM (
            SELECT o_custkey AS customer_id,
                   CAST(max(o_orderdate) AS DATE) AS last_order_date,
                   count(*) AS frequency,
                   sum(CAST(o_totalprice AS DECIMAL(25,6))) AS monetary_dec
            FROM orders
            GROUP BY 1
        )
    """,
    "nation_revenue_rank": """
        SELECT region_name, nation_name,
               CAST(rev_dec AS DOUBLE) AS revenue,
               CAST(row_number() OVER (
                   PARTITION BY region_name ORDER BY rev_dec DESC, nation_name
               ) AS INTEGER) AS rank_in_region
        FROM (
            SELECT r_name AS region_name, n_name AS nation_name,
                   sum(CAST(o_totalprice AS DECIMAL(25,6))) AS rev_dec
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        )
    """,
    "events_funnel": """
        SELECT count(*) AS n_users,
               CAST(sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
               CAST(sum(CASE WHEN first_view IS NOT NULL AND first_click IS NOT NULL
                         AND first_click > first_view THEN 1 ELSE 0 END) AS BIGINT) AS n_clicked_after_view,
               CAST(sum(CASE WHEN first_view IS NOT NULL AND first_click IS NOT NULL
                         AND first_click > first_view AND first_purchase IS NOT NULL
                         AND first_purchase > first_click THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased_after_click,
               CAST(sum(CASE WHEN first_view IS NOT NULL AND first_click IS NOT NULL
                         AND first_click > first_view AND first_purchase IS NOT NULL
                         AND first_purchase > first_click THEN 1 ELSE 0 END) AS DOUBLE)
                 / sum(CASE WHEN first_view IS NOT NULL THEN 1 ELSE 0 END)
                 AS view_to_purchase_rate
        FROM (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
            FROM events
            GROUP BY user_id
        )
    """,
}
