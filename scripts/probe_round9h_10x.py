"""10x scale-posture probe for the eighth round-9 operator wave:
events_props_rollup, dp_revenue_by_nation.

Growth constructions:
- events_props_rollup: event_id/user_id-offset event copies -> counts
  exactly x10, avg/min/max of the JSON field IDENTICAL.
- dp_revenue_by_nation: plain lineitem replication -> each nation's
  clipped sum x10 while the hash-Laplace noise (keyed by nation name)
  is UNCHANGED, so dp_big == 10 * clipped_base + noise, with noise
  recovered as dp_base - clipped_base.

Run: python scripts/probe_round9h_10x.py
Results -> SURVEY §6.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retail_sales_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
STAGE = "/tmp/probe_r9h_10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def probe_props(spark):
    from retail_sales_etl_spark.operators.events import (
        q_events_props_rollup,
    )

    d = f"{STAGE}/props"
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * F.lit(10_000_000)).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("copy") * F.lit(10_000_000)).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )
    big.write.mode("overwrite").parquet(f"{d}/events.parquet")
    base = {r["event_type"]: r for r in q_events_props_rollup(spark, SF_DIR).collect()}
    _, t1 = _time(
        lambda: q_events_props_rollup(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    bigr = {r["event_type"]: r for r in q_events_props_rollup(spark, d).collect()}
    _, t10 = _time(
        lambda: q_events_props_rollup(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    for t, rb in base.items():
        rg = bigr[t]
        assert rg["n_events"] == COPIES * rb["n_events"], t
        assert rg["n_with_k"] == COPIES * rb["n_with_k"], t
        assert rg["avg_k"] == rb["avg_k"], t
        assert (rg["min_k"], rg["max_k"]) == (rb["min_k"], rb["max_k"]), t
    print(
        f"events_props_rollup: counts x{COPIES} exact, avg/min/max "
        f"IDENTICAL; wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_dp(spark):
    from retail_sales_etl_spark.plans.analytics import (
        DP_CLIP,
        q_dp_revenue_by_nation,
    )

    d = f"{STAGE}/dp"
    for t in ("lineitem", "orders", "customer", "nation"):
        df = spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        if t == "lineitem":
            copies = spark.range(COPIES).select(F.col("id").alias("copy"))
            df = df.crossJoin(copies).drop("copy")
        df.write.mode("overwrite").parquet(f"{d}/{t}.parquet")

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    crev = {
        r["n_name"]: float(r["crev"])
        for r in (
            li.select(
                "l_orderkey",
                F.least(
                    F.col("l_extendedprice") * (1.0 - F.col("l_discount")),
                    F.lit(DP_CLIP),
                ).cast("decimal(25,6)").alias("crev"),
            )
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.sum("crev").alias("crev"))
            .collect()
        )
    }
    base = {
        r["nation_name"]: r["dp_revenue"]
        for r in q_dp_revenue_by_nation(spark, SF_DIR).collect()
    }
    _, t1 = _time(
        lambda: q_dp_revenue_by_nation(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {
        r["nation_name"]: r["dp_revenue"]
        for r in q_dp_revenue_by_nation(spark, d).collect()
    }
    _, t10 = _time(
        lambda: q_dp_revenue_by_nation(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    for n, dp_base in base.items():
        noise = dp_base - crev[n]
        assert abs(big[n] - (COPIES * crev[n] + noise)) < 0.05, n
    print(
        f"dp_revenue_by_nation: clipped sums x{COPIES} with noise "
        f"UNCHANGED (keyed by release key), closed form holds for all "
        f"{len(base)} nations; wall {t1:.2f}s -> {t10:.2f}s "
        f"(x{t10 / t1:.1f})"
    )


def main():
    spark = get_spark()
    os.makedirs(STAGE, exist_ok=True)
    try:
        probe_props(spark)
        probe_dp(spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
