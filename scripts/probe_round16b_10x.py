"""Round-16 second-wave 10x probe (sf0.1 x10 copies):

- embedding_drift_mmd: embeddings x10 on fresh vec_ids with the SAME
  label assignment -> every label's empirical distribution is
  unchanged (each vector repeated 10x), so ALL pairwise MMD^2 values
  must come out IDENTICAL — the scale-invariance of a moment
  statistic as a free correctness cross-check (the chi2/hurst probe
  pattern) — while the flatten stage processes 10x the terms.

Run: python scripts/probe_round16b_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r16b_10x"
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
    spark = get_spark(app_name="probe-round16b-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_drift_mmd,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    hi = emb.agg(F.max("vec_id")).first()[0] + 1
    emb10 = emb
    for k in range(1, COPIES):
        emb10 = emb10.unionAll(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "emb10", {"embeddings": emb10})
    base, t1 = _timed(lambda: q_embedding_drift_mmd(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_embedding_drift_mmd(spark, d10).collect())
    assert len(big) == len(base)
    bmap = {(r.label_a, r.label_b): r for r in big}
    for r in base:
        b = bmap[(r.label_a, r.label_b)]
        assert b.n_a == COPIES * r.n_a and b.n_b == COPIES * r.n_b
        assert (b.mmd2_linear, b.mmd2_quadratic) == (
            r.mmd2_linear, r.mmd2_quadratic,
        ), (r.label_a, r.label_b)
    print(f"drift_mmd      1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} label pairs, "
          f"MMD^2 identical under x10)")
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
