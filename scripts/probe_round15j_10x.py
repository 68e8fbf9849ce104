"""Round-15 tenth-wave 10x probes (sf0.1 x10 copies):

- doc_novelty: 10 copies of the corpus on fresh doc_ids — every
  first-window doc keeps its ORIGINAL novelty (first occurrences stay
  with the smallest doc_ids) while every copied doc collapses to
  novelty 0 (all its grams were introduced by the originals): the
  ordering semantics probed at scale, not just the row counts.
- nation_supplier_hhi: lineitem x10 WITHIN the same suppliers — every
  nation's revenue scales x10 but shares are unchanged, so HHI, band,
  and top_share are IDENTICAL (scale-invariance cross-check).

Run: python scripts/probe_round15j_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15j_10x"
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


def probe_streaming_daily_peaks(spark=None) -> None:
    """streaming_daily_peaks 10x: events x10 in the same day range ->
    the SAME days peak from the maintained grid with counts x10 and
    vs_mean invariant (the batch probe's invariance through the IVM
    path)."""
    own = spark is None
    if own:
        shutil.rmtree(STAGE, ignore_errors=True)
        spark = get_spark(app_name="probe-round15j-evd")
        spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.streaming.events import (
        q_streaming_daily_peaks,
    )

    ev = load_table(spark, SF_DIR, "events")
    hi_e = ev.agg(F.max("event_id")).first()[0] + 1
    ev10 = ev
    for k in range(1, COPIES):
        ev10 = ev10.unionAll(
            ev.withColumn("event_id", F.col("event_id") + F.lit(k * hi_e))
        )
    e10 = _stage(spark, "events10", {"events": ev10})
    base, t1 = _timed(lambda: q_streaming_daily_peaks(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_streaming_daily_peaks(spark, e10).collect())
    assert len(big) == len(base)
    bmap = {r.peak_date: r for r in big}
    for r in base:
        b = bmap[r.peak_date]
        assert b.n_events == COPIES * r.n_events
        assert b.vs_mean == r.vs_mean
    print(f"strm_daily_pk  1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} peaks, same grid)")
    if own:
        shutil.rmtree(STAGE, ignore_errors=True)
        spark.stop()


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-round15j-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.text import q_doc_novelty
    from retail_sales_etl_spark.plans.analytics import (
        q_nation_supplier_hhi,
    )

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", {"documents": docs10})
    base, t1 = _timed(lambda: q_doc_novelty(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_doc_novelty(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: r for r in big}
    assert all(
        bmap[r.doc_id].novelty == r.novelty
        and bmap[r.doc_id].n_grams == r.n_grams
        for r in base
    )
    copies_novel = [
        r for r in big if r.doc_id >= hi and r.n_novel > 0
    ]
    assert not copies_novel  # verbatim copies introduce NOTHING new
    print(f"doc_novelty    1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} docs, "
          f"copies all novelty 0)")

    li = load_table(spark, SF_DIR, "lineitem")
    hi_o = li.agg(F.max("l_orderkey")).first()[0] + 1
    li10 = li
    for k in range(1, COPIES):
        li10 = li10.unionAll(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * hi_o))
        )
    f10 = _stage(spark, "fact10", {"lineitem": li10})
    base, t1 = _timed(lambda: q_nation_supplier_hhi(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_nation_supplier_hhi(spark, f10).collect())
    assert len(big) == len(base)
    bmap = {r.nation: r for r in big}
    for r in base:
        b = bmap[r.nation]
        assert (b.hhi, b.band, b.top_share, b.n_suppliers) == (
            r.hhi, r.band, r.top_share, r.n_suppliers
        )
    print(f"supplier_hhi   1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} nations, HHI invariant)")

    probe_streaming_daily_peaks(spark)

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()



if __name__ == "__main__":
    main()
