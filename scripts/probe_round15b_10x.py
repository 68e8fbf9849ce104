"""Round-15 second-wave 10x probes (sf0.1 x10 copies):

- events_burstiness: 10x copies on FRESH user_ids (same per-user event
  sequences) -> rows x10, original users' mu/sigma/B byte-identical
  (per-user statistics see only their own gaps).
- text_mattr: 10x docs (fresh doc_ids, same texts) -> rows x10,
  original rows byte-identical (per-doc closed form).
- streaming_periodogram (sink path, 2 batches): orders x10 -> every
  maintained daily cent total x10 exact, spectrum strengths within the
  6-dp staging tolerance of the 1x run, n_groups identical.

Run: python scripts/probe_round15b_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15b_10x"
COPIES = 10


def _stage(spark, subdir, table, df):
    d = os.path.join(STAGE, subdir)
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{table}.parquet"))
    from retail_sales_etl_spark.catalog import TABLES

    for t in TABLES:
        link = os.path.join(d, f"{t}.parquet")
        if t != table and not os.path.exists(link):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), link)
    return d


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-round15b-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import q_events_burstiness
    from retail_sales_etl_spark.operators.text import q_text_mattr

    # -- events_burstiness (fresh user_ids) --------------------------------
    ev = load_table(spark, SF_DIR, "events")
    hi_u = ev.agg(F.max("user_id")).first()[0] + 1
    hi_e = ev.agg(F.max("event_id")).first()[0] + 1
    ev10 = ev
    for k in range(1, COPIES):
        ev10 = ev10.unionAll(
            ev.withColumn("user_id", F.col("user_id") + F.lit(k * hi_u))
            .withColumn("event_id", F.col("event_id") + F.lit(k * hi_e))
        )
    ed10 = _stage(spark, "events10", "events", ev10)
    base, t1 = _timed(lambda: q_events_burstiness(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_events_burstiness(spark, ed10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.user_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.user_id] for r in base)
    print(f"burstiness     1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} users)")

    # -- text_mattr (fresh doc_ids) -----------------------------------------
    docs = load_table(spark, SF_DIR, "documents")
    hi_d = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi_d))
        )
    dd10 = _stage(spark, "docs10", "documents", docs10)
    base, t1 = _timed(lambda: q_text_mattr(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_text_mattr(spark, dd10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"text_mattr     1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    # -- daily-revenue sink + spectrum (2 batches) --------------------------
    import tempfile

    from retail_sales_etl_spark.load.lakehouse import LakehouseTable
    from retail_sales_etl_spark.operators.profiling import (
        _periodogram_spectrum,
    )
    from retail_sales_etl_spark.streaming.events import daily_revenue_sink

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    o10 = orders
    for _ in range(1, COPIES):
        o10 = o10.unionAll(orders)

    def _run(src):
        work = tempfile.mkdtemp(prefix="probe_perio_")
        mid = src.agg(F.max("o_custkey")).first()[0] // 2
        t0 = time.perf_counter()
        daily_revenue_sink(src.filter(F.col("o_custkey") <= mid), 0,
                           f"{work}/d")
        daily_revenue_sink(src.filter(F.col("o_custkey") > mid), 1,
                           f"{work}/d")
        dt = time.perf_counter() - t0
        daily = LakehouseTable(spark, f"{work}/d").read()
        grid = {r.d: r.v for r in daily.collect()}
        spec = {r.period_days: r for r in
                _periodogram_spectrum(daily).collect()}
        return grid, spec, dt

    g1, s1, t1 = _run(orders)
    g10, s10, t10 = _run(o10)
    assert set(g1) == set(g10)
    assert all(g10[d] == COPIES * g1[d] for d in g1)
    for p, a in s1.items():
        c = s10[p]
        assert c.n_groups == a.n_groups
        assert abs(c.strength - a.strength) <= 2e-5, (a, c)
    print(f"daily_sink     1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(g1)} days x10 exact, "
          f"spectrum within 2e-5)")

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
