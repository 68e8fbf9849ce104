"""Round-11 probe: the rewritten customer_rfm (banded two-phase ranks,
no global ntile) under 10x fact growth.

Identity: duplicate every ORDER 10x (distinct orderkeys, SAME
customer) — the customer grid is unchanged, frequency and monetary
scale exactly x10 (order-preserving: 10f and 10m are monotone in f, m
with identical tie structure), recency is unchanged — so every
customer's global rank under all three orderings is IDENTICAL, and
therefore every r/f/m quartile and rfm_segment is IDENTICAL, while the
fact side the banded rank aggregates over is 10x. Pins that the
banded-rank + closed-form-ntile path is a pure function of the
per-customer ORDER, not of absolute values or band contents.

Run: python scripts/probe_rfm_banded_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_rfm_10x"
COPIES = 10


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-rfm-banded")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import TABLES, load_table
    from retail_sales_etl_spark.plans.behavioral import q_customer_rfm

    orders = load_table(spark, SF_DIR, "orders")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = orders.crossJoin(copies).select(
        (F.col("o_orderkey") + F.col("copy") * F.lit(10**10)).alias(
            "o_orderkey"
        ),
        *[c for c in orders.columns if c != "o_orderkey"],
    )
    d10 = os.path.join(STAGE, "orders10")
    os.makedirs(d10, exist_ok=True)
    big.write.mode("overwrite").parquet(f"{d10}/orders.parquet")
    for t in TABLES:
        link = f"{d10}/{t}.parquet"
        if t != "orders" and not os.path.exists(link):
            os.symlink(f"{SF_DIR}/{t}.parquet", link)

    t0 = time.perf_counter()
    base = {r["customer_id"]: r for r in q_customer_rfm(spark, SF_DIR).collect()}
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out10 = {r["customer_id"]: r for r in q_customer_rfm(spark, d10).collect()}
    t10 = time.perf_counter() - t0

    assert set(base) == set(out10), "customer grid changed"
    for cid, b in base.items():
        g = out10[cid]
        assert g["frequency"] == COPIES * b["frequency"], (cid, b, g)
        assert abs(g["monetary"] - COPIES * b["monetary"]) < 1e-6 * max(
            1.0, abs(b["monetary"])
        ), (cid, b, g)
        assert g["last_order_date"] == b["last_order_date"], (cid, b, g)
        assert g["rfm_segment"] == b["rfm_segment"], (cid, b, g)
    print(
        f"customer_rfm banded ranks: base {t1:.1f}s -> 10x-fact {t10:.1f}s "
        f"(x{t10 / t1:.1f}); {len(base)} customers, every rfm_segment "
        f"IDENTICAL under x10 orders (frequency/monetary exactly x10)"
    )
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
