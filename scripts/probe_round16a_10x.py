"""Round-16 first-wave 10x probe (sf0.1 x10 copies):

- multimodal_ico_resize: 10x docs -> the exact (doc, image) row total
  pinned from the generator's doc_id % 3 + 1 image counts, original
  doc_ids' resized rows byte-identical (payloads are pure functions
  of doc_id) — the zero-shuffle mapInPandas resize family shape on
  the container codec.

Run: python scripts/probe_round16a_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r16a_10x"
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
    spark = get_spark(app_name="probe-round16a-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_ico_resize,
    )

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", {"documents": docs10})
    base, t1 = _timed(
        lambda: q_multimodal_ico_resize(spark, SF_DIR).collect()
    )
    big, t10 = _timed(lambda: q_multimodal_ico_resize(spark, d10).collect())
    want_rows = docs10.select(F.sum(F.col("doc_id") % 3 + 1)).first()[0]
    assert len(big) == want_rows, (len(big), want_rows)
    bmap = {(r.doc_id, r.img_idx): tuple(r) for r in big}
    assert all(tuple(r) == bmap[(r.doc_id, r.img_idx)] for r in base)
    print(f"ico_resize     1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()


def probe_qoi(spark=None) -> None:
    """multimodal_qoi_stats 10x: rows x10, original doc_ids
    byte-identical (payloads are pure functions of doc_id)."""
    import shutil as _sh

    own = spark is None
    if own:
        _sh.rmtree(STAGE, ignore_errors=True)
        spark = get_spark(app_name="probe-round16a-qoi")
        spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_qoi_stats,
    )

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "qoi10", {"documents": docs10})
    base, t1 = _timed(
        lambda: q_multimodal_qoi_stats(spark, SF_DIR).collect()
    )
    big, t10 = _timed(lambda: q_multimodal_qoi_stats(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"qoi_stats      1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")
    if own:
        _sh.rmtree(STAGE, ignore_errors=True)
        spark.stop()
