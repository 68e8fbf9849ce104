"""Round-12 third-wave 10x probes (sf0.1 x10 copies):

- cohort_ltv: replicating every ORDER 10x on the same dates multiplies
  each (customer, month) revenue by exactly 10 but changes NO grid
  structure — n_active and cohort_size count distinct customer-months
  and cohort members, so they are IDENTICAL; revenue/cum/ltv scale by
  exactly 10 to staging precision. The cohort grid itself is
  corpus-size-independent (bounded by the month schedule squared).
- multimodal_wav_frames: doc-grain codec fan-out — copy-0 frame rows
  are IDENTICAL (the generator depends only on doc_id), total row
  count exactly 10x, wall ~linear (payload bytes never shuffle).

Run: python scripts/probe_round12c_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r12c_10x"
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
    spark = get_spark(app_name="probe-round12c-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_wav_frames,
    )
    from retail_sales_etl_spark.plans.behavioral import q_cohort_ltv

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))

    # --- cohort_ltv: 10x orders on the same dates ----------------------
    od = load_table(spark, SF_DIR, "orders")
    d_od = _stage(
        spark,
        "od10",
        "orders",
        od.crossJoin(copies).select(
            (F.col("o_orderkey") + F.col("copy") * F.lit(10**10)).alias(
                "o_orderkey"
            ),
            "o_custkey",
            "o_totalprice",
            "o_orderdate",
        ),
    )
    base, t1 = _timed(lambda: q_cohort_ltv(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_cohort_ltv(spark, d_od).collect())
    b = {(r["cohort_month"], r["months_since"]): r for r in base}
    g = {(r["cohort_month"], r["months_since"]): r for r in big}
    assert set(b) == set(g), "grid structure must be replication-invariant"
    for k, rb in b.items():
        rg = g[k]
        assert rg["n_active"] == rb["n_active"], k
        assert rg["cohort_size"] == rb["cohort_size"], k
        assert abs(rg["revenue"] - 10 * rb["revenue"]) < 1e-3, k
        assert abs(rg["cum_revenue"] - 10 * rb["cum_revenue"]) < 1e-3, k
        assert abs(rg["ltv"] - 10 * rb["ltv"]) < 2e-5 * max(
            1.0, abs(rb["ltv"])
        ), k
    print(
        f"cohort_ltv 10x (same dates): {len(b)} grid rows IDENTICAL in "
        f"structure (n_active/cohort_size exact), money exactly ~10x; "
        f"wall {t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )

    # --- multimodal_wav_frames: 10x docs -------------------------------
    docs = load_table(spark, SF_DIR, "documents")
    d_docs = _stage(
        spark,
        "docs10",
        "documents",
        # offset is a multiple of the generator moduli (97 and 4), so
        # every copy reproduces the SAME clip lengths / junk sizes and
        # the frame count replicates exactly
        docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * F.lit(388 * 10**7)).alias(
                "doc_id"
            ),
            "text",
        ),
    )
    n1, t1 = _timed(lambda: q_multimodal_wav_frames(spark, SF_DIR).count())
    n10, t10 = _timed(lambda: q_multimodal_wav_frames(spark, d_docs).count())
    # copy-0 identity: doc_ids below the offset are the originals
    sample = (
        q_multimodal_wav_frames(spark, d_docs)
        .where(F.col("doc_id") < 388 * 10**7)
        .orderBy("doc_id", "frame_idx")
        .limit(50)
        .collect()
    )
    orig = (
        q_multimodal_wav_frames(spark, SF_DIR)
        .orderBy("doc_id", "frame_idx")
        .limit(50)
        .collect()
    )
    assert [tuple(r) for r in sample] == [tuple(r) for r in orig]
    assert n10 == 10 * n1, (n1, n10)
    print(
        f"multimodal_wav_frames 10x: rows exactly x10 ({n1} -> {n10}), "
        f"copy-0 frames IDENTICAL; wall {t1:.1f}s -> {t10:.1f}s "
        f"(x{t10 / t1:.1f})"
    )

    shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
