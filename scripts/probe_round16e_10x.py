"""Round-16 maintained-ANN probe (sf0.1 x10 copies):

- streaming_ann_ivf vs batch ann_ivf_topk on the SAME 10x corpus
  (embeddings x10 on shifted vec_ids, labels kept): the maintained
  index must serve the IDENTICAL top-k surface the batch build
  computes from scratch — centroids agree because the decimal moment
  sums are associative, candidates agree because the probed cells
  hold the same vectors, ranking agrees through the shared scoring
  tail. Also times both paths: the streaming number includes the full
  4-batch index build; the serving read alone is the file-pruned
  probe.

Run: python scripts/probe_round16e_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r16e_10x"
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
    spark = get_spark(app_name="probe-round16e-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.similarity import q_ann_ivf_topk
    from retail_sales_etl_spark.streaming.events import q_streaming_ann_ivf

    emb = load_table(spark, SF_DIR, "embeddings")
    hi = emb.agg(F.max("vec_id")).first()[0] + 1
    emb10 = emb
    for k in range(1, COPIES):
        emb10 = emb10.unionAll(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "emb10", {"embeddings": emb10})
    batch, tb = _timed(lambda: q_ann_ivf_topk(spark, d10).collect())
    served, ts = _timed(lambda: q_streaming_ann_ivf(spark, d10).collect())
    want = [(r.vec_id, r.label, r.cosine, r.rank) for r in batch]
    got = [(r.vec_id, r.label, r.cosine, r.rank) for r in served]
    assert got == want, (got[:3], want[:3])
    print(f"ann_ivf@10x    batch {tb:6.2f}s   maintained(build+serve) "
          f"{ts:6.2f}s   top-{len(got)} IDENTICAL")
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
