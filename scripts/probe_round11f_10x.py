"""Round-11 sixth-wave 10x probes (sf0.1 x10 copies):

- orders_seasonal_decompose: x10 revenue per day scales seasonal
  indices and stds by 10 (cent-grid tolerance) and leaves the
  seasonal-strength RATIO unchanged.
- source_jsd_divergence: doc replication leaves every probability
  ratio p = (10c)/(10N) the same REAL number, and correctly-rounded
  doubles depend only on the real value — so every per-word staged
  term and therefore every JSD is EXACTLY identical; n_words x10.
- quality_calibration_report: bin counts exactly x10; rates/ECE
  within 1e-3 (the trainer's fixed-ridge drift, same caveat as the
  logistic probe).

Run: python scripts/probe_round11f_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r11f_10x"
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
    spark = get_spark(app_name="probe-round11f-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.profiling import (
        q_orders_seasonal_decompose,
    )
    from retail_sales_etl_spark.operators.text import (
        q_quality_calibration_report,
        q_source_jsd_divergence,
    )

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))

    orders = load_table(spark, SF_DIR, "orders")
    d_ord = _stage(
        spark,
        "ord10",
        "orders",
        orders.crossJoin(copies).select(
            (F.col("o_orderkey") + F.col("copy") * F.lit(10**10)).alias("o_orderkey"),
            "o_custkey",
            "o_orderdate",
            "o_totalprice",
            "o_orderstatus",
            "o_orderpriority",
        ),
    )
    b, t1 = _timed(
        lambda: {r["dow_idx"]: r for r in q_orders_seasonal_decompose(spark, SF_DIR).collect()}
    )
    g, t10 = _timed(
        lambda: {r["dow_idx"]: r for r in q_orders_seasonal_decompose(spark, d_ord).collect()}
    )
    for k, rb in b.items():
        rg = g[k]
        assert rg["n_days"] == rb["n_days"]
        assert abs(rg["seasonal_cents"] - COPIES * rb["seasonal_cents"]) <= 0.05 * COPIES
        assert abs(rg["std_detrended"] - COPIES * rb["std_detrended"]) <= 1e-6 * abs(
            COPIES * rb["std_detrended"]
        ) + 0.1
        assert abs(rg["seasonal_strength"] - rb["seasonal_strength"]) < 1e-4
    print(
        f"orders_seasonal_decompose 10x: day grid fixed, seasonal indices "
        f"+ stds scale x10 (cent grid), strength ratio IDENTICAL to 1e-4 "
        f"({b[0]['seasonal_strength']} vs {g[0]['seasonal_strength']}); "
        f"wall {t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )

    docs = load_table(spark, SF_DIR, "documents")
    d_docs = _stage(
        spark,
        "docs10",
        "documents",
        docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * F.lit(10**9)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        ),
    )
    b, t1 = _timed(
        lambda: {r["source"]: r for r in q_source_jsd_divergence(spark, SF_DIR).collect()}
    )
    g, t10 = _timed(
        lambda: {r["source"]: r for r in q_source_jsd_divergence(spark, d_docs).collect()}
    )
    for k, rb in b.items():
        rg = g[k]
        assert rg["n_words"] == COPIES * rb["n_words"]
        assert rg["n_types"] == rb["n_types"]
        assert rg["jsd"] == rb["jsd"], (k, rb["jsd"], rg["jsd"])
    print(
        f"source_jsd_divergence 10x: every source's JSD EXACTLY identical "
        f"(correctly-rounded ratios of x10 integers), n_words x10; wall "
        f"{t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )

    b, t1 = _timed(
        lambda: {r["bin"]: r for r in q_quality_calibration_report(spark, SF_DIR).collect()}
    )
    g, t10 = _timed(
        lambda: {r["bin"]: r for r in q_quality_calibration_report(spark, d_docs).collect()}
    )
    assert set(g) == set(b)
    for k, rb in b.items():
        rg = g[k]
        assert rg["n_docs"] == COPIES * rb["n_docs"]
        assert rg["n_kept"] == COPIES * rb["n_kept"]
        for c in ("mean_pred", "obs_rate", "gap", "ece"):
            assert abs(rg[c] - rb[c]) < 1e-3, (k, c, rb[c], rg[c])
    print(
        f"quality_calibration_report 10x: bin counts EXACTLY x10, "
        f"rates/ECE within 1e-3 (trainer ridge drift); wall {t1:.1f}s -> "
        f"{t10:.1f}s (x{t10 / t1:.1f})"
    )
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
