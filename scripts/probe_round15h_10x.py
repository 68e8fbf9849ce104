"""Round-15 eighth-wave 10x probes (sf0.1 x10 copies):

- events_hour_uniformity: 10x events on fresh user_ids -> rows x10,
  original users' chi2 byte-identical (per-user grids untouched).
- multimodal_wav_silence: 10x docs -> rows x10, originals
  byte-identical (payloads are pure functions of doc_id).

Run: python scripts/probe_round15h_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15h_10x"
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
    spark = get_spark(app_name="probe-round15h-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import (
        q_events_hour_uniformity,
    )
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_wav_silence,
    )

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
    base, t1 = _timed(lambda: q_events_hour_uniformity(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_events_hour_uniformity(spark, e10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.user_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.user_id] for r in base)
    print(f"hour_uniform   1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} users)")

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", {"documents": docs10})
    base, t1 = _timed(lambda: q_multimodal_wav_silence(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_multimodal_wav_silence(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"wav_silence    1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
