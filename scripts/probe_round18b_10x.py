"""Round-18 10x probes for the EXIF/FLAC codec wave and the
co-purchase IVM (sf0.1 x10 copies):

- multimodal_jpeg_exif / multimodal_flac_stats /
  multimodal_flac_fixed_stats at 10x docs (doc_id-offset copies whose
  offset is a multiple of lcm-ish 2*3*4*5*8*97... — instead, copies on
  a multiplier of 116280 = lcm(2,3,4,5,8,97) so every closed-form
  field of the copy equals a fresh doc): rows x10, per-doc decode is
  stateless so the probe pins linear scaling and zero cross-doc state.
  Simpler and stronger: compare copy rows against DIRECTLY computing
  the entry at 1x and checking the 1x originals are bit-equal inside
  the 10x run.
- streaming_affinity vs batch part_affinity_lift on the SAME 10x
  lineitem corpus (order-offset copies, part keys untouched so the
  pair grid genuinely deepens 10x): the maintained grids must rank
  the IDENTICAL top-K the batch operator computes from scratch.
  Timed both ways; the streaming number includes the 4-batch fold.

Run: python scripts/probe_round18b_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r18b_10x"
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
    spark = get_spark(app_name="probe-round18b-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.graph import q_part_affinity_lift
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_flac_fixed_stats,
        q_multimodal_flac_stats,
        q_multimodal_jpeg_exif,
    )
    from retail_sales_etl_spark.streaming.events import q_streaming_affinity

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", {"documents": docs10})

    for name, q in (
        ("jpeg_exif", q_multimodal_jpeg_exif),
        ("flac_stats", q_multimodal_flac_stats),
        ("flac_fixed", q_multimodal_flac_fixed_stats),
    ):
        one = {r.doc_id: tuple(r) for r in q(spark, SF_DIR).collect()}
        ten, t10 = _timed(
            lambda q=q: {r.doc_id: tuple(r) for r in q(spark, d10).collect()}
        )
        assert len(ten) == COPIES * len(one), name
        for did, row in one.items():
            assert ten[did] == row, (name, did)
        print(
            f"{name}@10x    {t10:6.2f}s   rows x10, 1x originals "
            "bit-equal inside the 10x run"
        )

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    ohi = li.agg(F.max("l_orderkey")).first()[0] + 1
    li10 = li
    for k in range(1, COPIES):
        li10 = li10.unionAll(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * ohi))
        )
    l10 = _stage(spark, "li10", {"lineitem": li10})

    batch, tb = _timed(
        lambda: [tuple(r) for r in q_part_affinity_lift(spark, l10).collect()]
    )
    served, ts = _timed(
        lambda: [tuple(r) for r in q_streaming_affinity(spark, l10).collect()]
    )
    assert served == batch, (served[:3], batch[:3])
    print(
        f"affinity@10x  batch {tb:6.2f}s   maintained(fold+serve) "
        f"{ts:6.2f}s   top-{len(served)} ranking IDENTICAL"
    )
    spark.stop()


if __name__ == "__main__":
    main()
