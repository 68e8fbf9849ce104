"""Round-15 new-operator 10x probes (sf0.1 x10 copies):

- rake_keywords_by_source: 10x copies of the same texts (fresh
  doc_ids, same sources) -> per-source deg and freq scale x10, so
  word scores and phrase scores are IDENTICAL, phrase freq x10 — each
  source's top-k must match row for row with only freq scaled.
- revenue_periodogram: orders replicated 10x on the same dates ->
  every daily cent total x10, so deviations scale x10 and SSB/SST
  both x100 — strengths must agree to the 6-dp staging tolerance and
  n_groups must be identical (the spectrum is calendar-bounded, not
  data-bounded).
- multimodal_png_resize / multimodal_gif_stats: 10x docs -> 10x rows;
  rows for the original doc_ids must be BYTE-IDENTICAL (payloads are
  pure functions of doc_id); runtime ~linear (zero-shuffle
  mapInPandas).
- streaming_corpus_health (sink path, 2 batches): docs x10 -> counts,
  char/word/distinct totals, and the DECIMAL entropy_sum scale x10
  EXACTLY; min/max chars identical.

Run: python scripts/probe_round15_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15_10x"
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
    spark = get_spark(app_name="probe-round15-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_gif_stats,
        q_multimodal_png_resize,
    )
    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_periodogram,
    )
    from retail_sales_etl_spark.operators.text import (
        q_rake_keywords_by_source,
    )

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", "documents", docs10)

    # -- rake_keywords_by_source ------------------------------------------
    base, t1 = _timed(lambda: q_rake_keywords_by_source(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_rake_keywords_by_source(spark, d10).collect())
    assert len(base) == len(big)
    bmap = {(r.source, r.rank): r for r in big}
    for a in base:
        c = bmap[(a.source, a.rank)]
        assert a.phrase == c.phrase and a.n_words == c.n_words
        assert c.freq == COPIES * a.freq and a.score == c.score
    n_src = len({r.source for r in base})
    print(f"rake_by_source 1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({n_src} sources x top-k identical, "
          f"freq x10)")

    # -- revenue_periodogram (orders x10, same dates) ----------------------
    orders = load_table(spark, SF_DIR, "orders")
    o10 = orders
    for _ in range(1, COPIES):
        o10 = o10.unionAll(orders)
    od10 = _stage(spark, "orders10", "orders", o10)
    base, t1 = _timed(lambda: q_revenue_periodogram(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_revenue_periodogram(spark, od10).collect())
    bmap = {r.period_days: r for r in big}
    for a in base:
        c = bmap[a.period_days]
        assert c.n_groups == a.n_groups
        assert abs(c.strength - a.strength) <= 2e-5, (a, c)
    print(f"periodogram    1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} periods, strengths "
          f"within 2e-5, n_groups identical)")

    # -- multimodal_png_resize ---------------------------------------------
    base, t1 = _timed(lambda: q_multimodal_png_resize(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_multimodal_png_resize(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"png_resize     1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    # -- multimodal_gif_stats ----------------------------------------------
    base, t1 = _timed(lambda: q_multimodal_gif_stats(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_multimodal_gif_stats(spark, d10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {r.doc_id: tuple(r) for r in big}
    assert all(tuple(r) == bmap[r.doc_id] for r in base)
    print(f"gif_stats      1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} rows)")

    # -- corpus-health sink (2 batches) ------------------------------------
    import tempfile

    from retail_sales_etl_spark.load.lakehouse import LakehouseTable
    from retail_sales_etl_spark.streaming.events import corpus_health_sink

    cols = ["doc_id", "text", "lang", "source", "n_chars"]

    def _run(src):
        work = tempfile.mkdtemp(prefix="probe_health_")
        mid = src.agg(F.max("doc_id")).first()[0] // 2
        t0 = time.perf_counter()
        corpus_health_sink(src.filter(F.col("doc_id") <= mid), 0,
                           f"{work}/h")
        corpus_health_sink(src.filter(F.col("doc_id") > mid), 1,
                           f"{work}/h")
        dt = time.perf_counter() - t0
        grid = {
            (r.source, r.lang): r
            for r in LakehouseTable(spark, f"{work}/h").read().collect()
        }
        return grid, dt

    g1, t1 = _run(docs.select(*cols))
    g10, t10 = _run(docs10.select(*cols))
    assert set(g1) == set(g10)
    for k, a in g1.items():
        c = g10[k]
        assert c.n_docs == COPIES * a.n_docs
        assert c.total_chars == COPIES * a.total_chars
        assert c.total_words == COPIES * a.total_words
        assert c.total_distinct == COPIES * a.total_distinct
        assert (c.min_chars, c.max_chars) == (a.min_chars, a.max_chars)
        assert c.entropy_sum == COPIES * a.entropy_sum
    print(f"health_sink    1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(g1)} grid cells, totals x10 "
          f"exact, extrema identical)")

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
