"""Round-15 fourth-wave 10x probes (sf0.1 x10 copies):

- multimodal_tga_stats: 10x docs -> 10x rows, original doc_ids
  byte-identical (payloads are pure functions of doc_id).
- supplier_leadtime_profile: 10x lineitem/orders/supplier on fresh
  order- and supplier-keys -> rows x10, original suppliers'
  percentile profiles byte-identical.
- streaming_burstiness: 10x events on fresh user_ids -> rows x10,
  original users' (mu, sigma, B) byte-identical; the sink replay
  cost should scale ~linearly in delivered rows (fixed per-batch
  commit cost amortizes).

Run: python scripts/probe_round15d_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15d_10x"
COPIES = 10


def _stage(spark, subdir, tables: dict):
    d = os.path.join(STAGE, subdir)
    os.makedirs(d, exist_ok=True)
    for table, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(d, f"{table}.parquet"))
    from retail_sales_etl_spark.catalog import TABLES

    for t in TABLES:
        link = os.path.join(d, f"{t}.parquet")
        if t not in tables and not os.path.exists(link):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), link)
    return d


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-round15d-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_tga_stats,
    )
    from retail_sales_etl_spark.plans.analytics import (
        q_supplier_leadtime_profile,
    )
    from retail_sales_etl_spark.streaming.events import (
        q_streaming_burstiness,
    )

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", {"documents": docs10})
    base, t1 = _timed(lambda: q_multimodal_tga_stats(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_multimodal_tga_stats(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"tga_stats      1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    supp = load_table(spark, SF_DIR, "supplier")
    hi_o = orders.agg(F.max("o_orderkey")).first()[0] + 1
    hi_s = supp.agg(F.max("s_suppkey")).first()[0] + 1
    li10, or10, sp10 = li, orders, supp
    for k in range(1, COPIES):
        li10 = li10.unionAll(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * hi_o))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(k * hi_s))
        )
        or10 = or10.unionAll(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * hi_o)
            )
        )
        sp10 = sp10.unionAll(
            supp.withColumn("s_suppkey", F.col("s_suppkey") + F.lit(k * hi_s))
        )
    f10 = _stage(
        spark, "fact10",
        {"lineitem": li10, "orders": or10, "supplier": sp10},
    )
    base, t1 = _timed(
        lambda: q_supplier_leadtime_profile(spark, SF_DIR).collect()
    )
    big, t10 = _timed(lambda: q_supplier_leadtime_profile(spark, f10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.s_suppkey: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.s_suppkey] for r in base)
    print(f"leadtime       1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} suppliers)")

    ev = load_table(spark, SF_DIR, "events")
    hi_u = ev.agg(F.max("user_id")).first()[0] + 1
    hi_e = ev.agg(F.max("event_id")).first()[0] + 1
    ev10 = ev
    for k in range(1, COPIES):
        ev10 = ev10.unionAll(
            ev.withColumn("user_id", F.col("user_id") + F.lit(k * hi_u))
            .withColumn("event_id", F.col("event_id") + F.lit(k * hi_e))
        )
    e10 = _stage(spark, "events10", {"events": ev10})
    base, t1 = _timed(lambda: q_streaming_burstiness(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_streaming_burstiness(spark, e10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.user_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.user_id] for r in base)
    print(f"strm_burstiness 1x {t1:6.2f}s  10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} users)")

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
