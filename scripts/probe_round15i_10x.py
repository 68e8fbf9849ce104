"""Round-15 ninth-wave 10x probes (sf0.1 x10 copies):

- copurchase_rich_club: lineitem x10 on fresh order/part keys -> 10
  disjoint graph copies; every degree histogram count scales x10, so
  each phi(k) is IDENTICAL (the club density is copy-invariant — a
  free correctness cross-check) while thresholds cover the same range.
- events_daily_peaks: events x10 WITHIN the same day range -> the day
  grid is unchanged; every daily count scales x10, so the SAME days
  peak with the SAME vs_mean (scale-invariant by construction).

Run: python scripts/probe_round15i_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15i_10x"
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
    spark = get_spark(app_name="probe-round15i-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import (
        q_events_daily_peaks,
    )
    from retail_sales_etl_spark.operators.graph import (
        q_copurchase_rich_club,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    hi_o = li.agg(F.max("l_orderkey")).first()[0] + 1
    hi_p = li.agg(F.max("l_partkey")).first()[0] + 1
    li10 = li
    for k in range(1, COPIES):
        li10 = li10.unionAll(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * hi_o))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(k * hi_p))
        )
    g10 = _stage(spark, "graph10", {"lineitem": li10})
    base, t1 = _timed(
        lambda: q_copurchase_rich_club(spark, SF_DIR).collect()
    )
    big, t10 = _timed(lambda: q_copurchase_rich_club(spark, g10).collect())
    bmap = {r.k: r for r in big}
    for r in base:
        b = bmap[r.k]
        assert b.n_k == COPIES * r.n_k and b.e_k == COPIES * r.e_k
    # club density per copy is unchanged -> phi scales by the exact
    # (10n_k - 1)/(n_k - 1)/10 factor; spot-check phi(0) analytically
    print(f"rich_club      1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} thresholds)")

    ev = load_table(spark, SF_DIR, "events")
    hi_e = ev.agg(F.max("event_id")).first()[0] + 1
    ev10 = ev
    for k in range(1, COPIES):
        ev10 = ev10.unionAll(
            ev.withColumn("event_id", F.col("event_id") + F.lit(k * hi_e))
        )
    e10 = _stage(spark, "events10", {"events": ev10})
    base, t1 = _timed(lambda: q_events_daily_peaks(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_events_daily_peaks(spark, e10).collect())
    assert len(big) == len(base)  # same days peak
    bmap = {r.peak_date: r for r in big}
    for r in base:
        b = bmap[r.peak_date]
        assert b.n_events == COPIES * r.n_events
        assert b.vs_mean == r.vs_mean  # scale-invariant share of mean
    print(f"daily_peaks    1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} peaks, same grid)")

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
