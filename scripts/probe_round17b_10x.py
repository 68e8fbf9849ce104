"""Round-17 10x probes for the decontamination sink, the JPEG codec,
and the Weibull fit (sf0.1 x10 copies):

- streaming_decontaminate vs batch decontaminate_ngram on the SAME
  10x corpus (documents x10 on shifted doc_ids — the shift multiplier
  is a multiple of DECON_EVAL_MOD so every copy keeps its eval/train
  role): the maintained eval-gram index must emit the IDENTICAL
  per-doc verdicts the batch operator computes from scratch. Timed
  both ways; the streaming number includes the 5-batch index build.
- multimodal_jpeg_stats at 10x docs: rows x10, originals bit-equal
  the 1x run (the codec is per-doc; the probe pins linear scaling and
  the absence of any cross-doc state).
- session_weibull_fit under 10x events (user-offset copies): the fit
  runs on the distinct-duration grid, so 10x sessions with the same
  duration distribution must land near-identical shape/scale (the
  grid barely grows; the probe pins that the fit cost is grid-bound,
  not corpus-bound).

Run: python scripts/probe_round17b_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r17b_10x"
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
    spark = get_spark(app_name="probe-round17b-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_jpeg_stats,
    )
    from retail_sales_etl_spark.operators.text import (
        DECON_EVAL_MOD,
        q_decontaminate_ngram,
    )
    from retail_sales_etl_spark.streaming.events import (
        q_streaming_decontaminate,
    )

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    # shift by a multiple of DECON_EVAL_MOD so doc_id % 37 survives
    shift = ((hi + DECON_EVAL_MOD - 1) // DECON_EVAL_MOD) * DECON_EVAL_MOD
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * shift))
        )
    d10 = _stage(spark, "docs10", {"documents": docs10})

    batch, tb = _timed(
        lambda: {
            r.doc_id: (r.n_grams, r.n_contaminated, r.is_contaminated)
            for r in q_decontaminate_ngram(spark, d10).collect()
        }
    )
    served, ts = _timed(
        lambda: {
            r.doc_id: (r.n_grams, r.n_contaminated, r.is_contaminated)
            for r in q_streaming_decontaminate(spark, d10).collect()
        }
    )
    assert served == batch, (len(served), len(batch))
    print(f"decon@10x      batch {tb:6.2f}s   maintained(build+judge) "
          f"{ts:6.2f}s   {len(served)} verdicts IDENTICAL")

    one = {r.doc_id: r for r in q_multimodal_jpeg_stats(spark, SF_DIR).collect()}
    ten, tj = _timed(
        lambda: {r.doc_id: r for r in q_multimodal_jpeg_stats(spark, d10).collect()}
    )
    assert len(ten) == 10 * len(one)
    for did, r in one.items():
        assert ten[did].asDict() == r.asDict(), did
    print(f"jpeg_stats@10x {tj:6.2f}s   rows x10, originals bit-equal")

    from retail_sales_etl_spark.operators.events import q_session_weibull_fit

    ev = load_table(spark, SF_DIR, "events")
    uhi = ev.agg(F.max("user_id")).first()[0] + 1
    ev10 = ev
    for k in range(1, COPIES):
        ev10 = ev10.unionAll(
            ev.withColumn("user_id", F.col("user_id") + F.lit(k * uhi))
        )
    e10 = _stage(spark, "ev10", {"events": ev10})
    (w1,) = q_session_weibull_fit(spark, SF_DIR).collect()
    (w10,), tw = _timed(lambda: q_session_weibull_fit(spark, e10).collect())
    assert abs(w10.weibull_shape - w1.weibull_shape) < 0.05, (w1, w10)
    print(f"weibull@10x    {tw:6.2f}s   shape {w1.weibull_shape:.4f} -> "
          f"{w10.weibull_shape:.4f} (grid-bound fit, stable)")
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
