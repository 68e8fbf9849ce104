"""Round-15 sixth-wave 10x probes (sf0.1 x10 copies):

- multimodal_ico_stats: 10x docs -> 10x (doc, image) rows, original
  doc_ids byte-identical (payloads are pure functions of doc_id).
- orders_revenue_ccf / revenue_hurst: orders x10 WITHIN the same day
  range (10 orders where there was 1) -> the day grid is unchanged in
  size; counts/revenue scale x10 exactly, so ccf/hurst are recomputed
  on the same-sized grid — the probe asserts the grid-bounded cost
  shape (10x fact, ~1x grid work) and that outputs remain
  deterministic single rows.

Run: python scripts/probe_round15f_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15f_10x"
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


def probe_ks(spark=None) -> None:
    """leadtime_drift_ks 10x: lineitem/orders/supplier x10 on fresh
    keys -> rows x10, original suppliers' KS rows byte-identical."""
    own = spark is None
    if own:
        shutil.rmtree(STAGE, ignore_errors=True)
        spark = get_spark(app_name="probe-round15f-ks")
        spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.plans.analytics import q_leadtime_drift_ks

    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    hi_o = orders.agg(F.max("o_orderkey")).first()[0] + 1
    hi_s = li.agg(F.max("l_suppkey")).first()[0] + 1
    li10, or10 = li, orders
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
    k10 = _stage(spark, "ks10", {"lineitem": li10, "orders": or10})
    base, t1 = _timed(lambda: q_leadtime_drift_ks(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_leadtime_drift_ks(spark, k10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.s_suppkey: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.s_suppkey] for r in base)
    print(f"ks_drift       1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} suppliers)")
    if own:
        shutil.rmtree(STAGE, ignore_errors=True)
        spark.stop()


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-round15f-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_ico_stats,
    )
    from retail_sales_etl_spark.operators.profiling import (
        q_orders_revenue_ccf,
        q_revenue_hurst,
    )

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", {"documents": docs10})
    base, t1 = _timed(lambda: q_multimodal_ico_stats(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_multimodal_ico_stats(spark, d10).collect())
    # image counts follow doc_id % 3 + 1, so shifted copies carry
    # different counts — pin the exact expected (doc, image) total
    want_rows = docs10.select(
        F.sum(F.col("doc_id") % 3 + 1)
    ).first()[0]
    assert len(big) == want_rows, (len(big), want_rows)
    bmap = {(r.doc_id, r.img_idx): tuple(r) for r in big}
    assert all(tuple(r) == bmap[(r.doc_id, r.img_idx)] for r in base)
    print(f"ico_stats      1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    orders = load_table(spark, SF_DIR, "orders")
    hi_o = orders.agg(F.max("o_orderkey")).first()[0] + 1
    or10 = orders
    for k in range(1, COPIES):
        or10 = or10.unionAll(
            orders.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(k * hi_o)
            )
        )
    f10 = _stage(spark, "fact10", {"orders": or10})

    base, t1 = _timed(lambda: q_orders_revenue_ccf(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_orders_revenue_ccf(spark, f10).collect())
    assert len(big) == len(base)  # the day grid does not grow
    bm = {r.lag: r for r in big}
    assert all(bm[r.lag].n_pairs == r.n_pairs for r in base)
    print(f"ccf            1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} lags, same grid)")

    base, t1 = _timed(lambda: q_revenue_hurst(spark, SF_DIR).first())
    big, t10 = _timed(lambda: q_revenue_hurst(spark, f10).first())
    assert base["n_days"] == big["n_days"]
    assert big["n_scales"] == base["n_scales"]
    assert big["hurst"] is not None
    print(f"hurst          1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  (H {base['hurst']} -> {big['hurst']})")

    probe_ks(spark)

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()



if __name__ == "__main__":
    main()
