"""Round-15 fifth-wave 10x probes (sf0.1 x10 copies):

- multimodal_tga_resize: 10x docs -> 10x rows, original doc_ids
  byte-identical (payloads are pure functions of doc_id).
- text_mtld: 10x docs on fresh doc_ids -> rows x10, originals
  byte-identical (the per-doc sequential walk is embarrassingly
  parallel).
- streaming_rake_by_source (4-batch replay, docs x10 into a fresh
  source so original sources' grids are untouched): original
  sources' top-k byte-identical; per-batch cost scales with batch
  occurrences, the maintained grids with vocabulary.

Run: python scripts/probe_round15e_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15e_10x"
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
    spark = get_spark(app_name="probe-round15e-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_tga_resize,
    )
    from retail_sales_etl_spark.operators.text import q_text_mtld
    from retail_sales_etl_spark.streaming.events import (
        q_streaming_rake_by_source,
    )

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", {"documents": docs10})

    base, t1 = _timed(lambda: q_multimodal_tga_resize(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_multimodal_tga_resize(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"tga_resize     1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    base, t1 = _timed(lambda: q_text_mtld(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_text_mtld(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"text_mtld      1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    # 10x corpus into ONE fresh source: original sources' grids (and
    # therefore their scored top-k) must come out byte-identical.
    docs10s = docs.unionAll(
        docs10.filter(F.col("doc_id") >= hi).withColumn(
            "source", F.lit("probe_bulk")
        )
    )
    dr = _stage(spark, "docs10src", {"documents": docs10s})
    base, t1 = _timed(
        lambda: q_streaming_rake_by_source(spark, SF_DIR).collect()
    )
    big, t10 = _timed(lambda: q_streaming_rake_by_source(spark, dr).collect())
    bmap = {(r.source, r.rank): tuple(r) for r in big}
    assert all(tuple(r) == bmap[(r.source, r.rank)] for r in base)
    n_bulk = sum(1 for r in big if r.source == "probe_bulk")
    assert n_bulk > 0
    print(f"strm_rake_src  1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
