"""Round-14 new-operator 10x probes (sf0.1 x10 copies):

- text_heaps_fit: 10x docs (fresh doc_ids, same texts) -> n_docs and
  n_tokens scale x10 exactly, n_types is UNCHANGED (same vocabulary);
  runtime should scale ~linearly (banded cumsum, no global window).
- rake_keywords: 10x copies of the same texts -> every word's deg and
  freq scale x10, so deg/freq word scores are IDENTICAL, phrase scores
  IDENTICAL, phrase freq x10 — the exact top-k must match row for row
  with only freq scaled.
- multimodal_wav_resample: 10x docs -> 10x rows; the rows for the
  original doc_ids must be BYTE-IDENTICAL (signal is a pure function
  of doc_id); runtime ~linear (zero-shuffle mapInPandas).
- multimodal_png_stats: same contract as wav_resample (pure function
  of doc_id; deflate+inflate+unfilter per doc, zero shuffle).
- streaming_cohort_ltv (sink path, 4 batches): orders replicated 10x
  on the same customers/dates -> per-cell revenue x10 EXACT (DECIMAL),
  n_active IDENTICAL (same active pairs).

Run: python scripts/probe_round14_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r14_10x"
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
    spark = get_spark(app_name="probe-round14-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_png_stats,
        q_multimodal_wav_resample,
    )
    from retail_sales_etl_spark.operators.text import (
        q_rake_keywords,
        q_text_heaps_fit,
    )

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", "documents", docs10)

    # -- text_heaps_fit ---------------------------------------------------
    base, t1 = _timed(lambda: q_text_heaps_fit(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_text_heaps_fit(spark, d10).collect())
    b, g = base[0], big[0]
    assert g.n_docs == COPIES * b.n_docs and g.n_tokens == COPIES * b.n_tokens
    assert g.n_types == b.n_types
    print(f"heaps_fit      1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  (beta {b.heaps_beta} -> {g.heaps_beta})")

    # -- rake_keywords ----------------------------------------------------
    base, t1 = _timed(lambda: q_rake_keywords(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_rake_keywords(spark, d10).collect())
    assert len(base) == len(big)
    for a, c in zip(base, big):
        assert a.phrase == c.phrase and a.n_words == c.n_words
        assert c.freq == COPIES * a.freq
        assert a.score == c.score
    print(f"rake_keywords  1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  (top-{len(base)} identical, freq x10)")

    # -- multimodal_wav_resample -----------------------------------------
    base, t1 = _timed(
        lambda: q_multimodal_wav_resample(spark, SF_DIR).collect()
    )
    big, t10 = _timed(lambda: q_multimodal_wav_resample(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"wav_resample   1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    # -- multimodal_png_stats --------------------------------------------
    base, t1 = _timed(lambda: q_multimodal_png_stats(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_multimodal_png_stats(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"png_stats      1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    # -- cohort_ltv sink (4 in-order batches, replicated orders) ---------
    import tempfile

    from retail_sales_etl_spark.load.lakehouse import LakehouseTable
    from retail_sales_etl_spark.streaming.events import cohort_ltv_sink

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("o_orderdate"),
        "o_totalprice",
    )
    o10 = orders
    for _ in range(1, COPIES):
        o10 = o10.unionAll(orders)
    d0, d1 = orders.agg(F.min("o_orderdate"), F.max("o_orderdate")).first()
    import datetime

    cuts = [d0 + datetime.timedelta(days=((d1 - d0).days + 1) * i // 4)
            for i in range(5)]

    def _run(src):
        work = tempfile.mkdtemp(prefix="probe_cohort_")
        t0 = time.perf_counter()
        for i in range(4):
            lo, hi_ = cuts[i], cuts[i + 1]
            cond = (F.col("o_orderdate") >= F.lit(lo)) & (
                (F.col("o_orderdate") < F.lit(hi_)) if i < 3
                else (F.col("o_orderdate") <= F.lit(d1))
            )
            cohort_ltv_sink(
                src.filter(cond), i,
                f"{work}/f", f"{work}/s", f"{work}/m",
            )
        dt = time.perf_counter() - t0
        grid = {
            (r.cohort_m, r.months_since): (r.n_active, r.rev)
            for r in LakehouseTable(spark, f"{work}/m").read().collect()
        }
        return grid, dt

    g1, t1 = _run(orders)
    g10, t10 = _run(o10)
    assert set(g1) == set(g10)
    for k in g1:
        assert g10[k][0] == g1[k][0]          # n_active identical
        assert g10[k][1] == COPIES * g1[k][1]  # revenue x10 exact
    print(f"cohort_sink    1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(g1)} matrix cells, "
          f"n_active identical, rev x10 exact)")

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
