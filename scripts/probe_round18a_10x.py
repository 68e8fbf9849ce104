"""Round-18 10x probe for the session-survival IVM (streaming_weibull):

- streaming_weibull vs batch session_weibull_fit on the SAME 10x
  events corpus (sf0.1 x10 on user-offset copies): the maintained
  tails+grid state must serve the IDENTICAL fit row the batch operator
  computes from scratch, wherever the 4 ts-range seams fall. Timed
  both ways; the streaming number includes the 4-batch fold.
- Growth contract pinned empirically: tails rows == users ever seen,
  grid rows == distinct CLOSED durations (both sublinear in events —
  the state a 100 TB pipeline carries is user-count + duration-support
  bounded, never event-count bounded).

Run: python scripts/probe_round18a_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r18a_10x"
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
    spark = get_spark(app_name="probe-round18a-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import q_session_weibull_fit
    from retail_sales_etl_spark.streaming.events import q_streaming_weibull

    ev = load_table(spark, SF_DIR, "events")
    uhi = ev.agg(F.max("user_id")).first()[0] + 1
    ev10 = ev
    for k in range(1, COPIES):
        ev10 = ev10.unionAll(
            ev.withColumn("user_id", F.col("user_id") + F.lit(k * uhi))
        )
    d10 = _stage(spark, "ev10", {"events": ev10})

    batch, tb = _timed(
        lambda: [tuple(r) for r in q_session_weibull_fit(spark, d10).collect()]
    )
    served, ts = _timed(
        lambda: [tuple(r) for r in q_streaming_weibull(spark, d10).collect()]
    )
    assert served == batch, (served, batch)
    print(
        f"weibull@10x   batch {tb:6.2f}s   maintained(fold+serve) "
        f"{ts:6.2f}s   fit rows IDENTICAL: {served}"
    )

    # growth contract: re-fold at 1x and inspect the state tables
    import glob
    import tempfile

    from retail_sales_etl_spark.load.lakehouse import LakehouseTable
    from retail_sales_etl_spark.streaming.events import (
        maintain_session_tails,
    )

    work = tempfile.mkdtemp(prefix="probe_r18a_state_")
    src = f"{work}/src"
    e1 = load_table(spark, SF_DIR, "events").select("user_id", "ts")
    t_lo, t_hi = e1.agg(F.min("ts"), F.max("ts")).first()
    cuts = [t_lo + (t_hi - t_lo) * i // 4 for i in range(5)]
    t0 = time.time()
    os.makedirs(src, exist_ok=True)
    for i in range(4):
        before = set(glob.glob(f"{src}/*.parquet"))
        cond = (F.col("ts") >= F.lit(cuts[i])) & (
            F.col("ts") < F.lit(cuts[i + 1])
            if i < 3
            else F.col("ts") <= F.lit(t_hi)
        )
        e1.filter(cond).coalesce(1).write.mode("append").parquet(src)
        for f in set(glob.glob(f"{src}/*.parquet")) - before:
            os.utime(f, (t0 + i, t0 + i))
    ts_t = spark.read.parquet(src).schema["ts"].dataType.simpleString()
    stream = (
        spark.readStream.schema(f"user_id bigint, ts {ts_t}")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    maintain_session_tails(
        stream, f"{work}/tails", f"{work}/grid", f"{work}/ckpt",
        optimize_every=3,
    ).awaitTermination()
    n_users = e1.select("user_id").distinct().count()
    n_tails = LakehouseTable(spark, f"{work}/tails").read().count()
    n_grid = LakehouseTable(spark, f"{work}/grid").read().count()
    n_events = e1.count()
    assert n_tails == n_users, (n_tails, n_users)
    print(
        f"state@1x      events {n_events}  users {n_users}  tails "
        f"{n_tails} (== users)  grid rows {n_grid} (distinct closed "
        f"durations; {n_grid / n_events:.4f} of events)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
