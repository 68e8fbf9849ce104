"""Round-15 third-wave 10x probes (sf0.1 x10 copies):

- multimodal_gif_resize: 10x docs -> 10x rows, original doc_ids
  byte-identical (payloads are pure functions of doc_id).
- events_gap_memory: 10x copies on fresh user_ids -> rows x10,
  original users' M byte-identical.

Run: python scripts/probe_round15c_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15c_10x"
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
    spark = get_spark(app_name="probe-round15c-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import q_events_gap_memory
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_gif_resize,
    )

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", "documents", docs10)
    base, t1 = _timed(lambda: q_multimodal_gif_resize(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_multimodal_gif_resize(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"gif_resize     1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    ev = load_table(spark, SF_DIR, "events")
    hi_u = ev.agg(F.max("user_id")).first()[0] + 1
    hi_e = ev.agg(F.max("event_id")).first()[0] + 1
    ev10 = ev
    for k in range(1, COPIES):
        ev10 = ev10.unionAll(
            ev.withColumn("user_id", F.col("user_id") + F.lit(k * hi_u))
            .withColumn("event_id", F.col("event_id") + F.lit(k * hi_e))
        )
    e10 = _stage(spark, "events10", "events", ev10)
    base, t1 = _timed(lambda: q_events_gap_memory(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_events_gap_memory(spark, e10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.user_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.user_id] for r in base)
    print(f"gap_memory     1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} users)")

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
