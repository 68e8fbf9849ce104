"""Round-11 fourth-wave 10x probes (sf0.1 x10 copies) — one exact or
algebraic identity per new operator:

- bipartite_butterflies: disjoint-key copies — n_edges/butterflies/
  3-paths EXACTLY x10, coefficient within 1e-6 (4*(10*C4)/(10*L3) is
  the same real number; the doubles differ by <= 1 ulp).
- text_zipf_fit: doc replication multiplies every word count by 10, so
  ranks are UNCHANGED, the slope is invariant (adding ln 10 to every y
  only moves the intercept) and the intercept shifts by exactly ln 10
  — the textbook log-log identity, observable end-to-end.
- customer_mahalanobis_outliers: x10 orders per customer scales
  deviations x10 and covariance x100 — Mahalanobis distance is scale-
  invariant, so the top-K set and every d^2 are preserved (1e-6).
- revenue_theil_sen: x10 daily revenue scales every pairwise slope and
  residual by exactly 10.
- embedding_top_pc: corpus replication leaves mean/covariance
  unchanged — loadings invariant (1e-5), eigenvalue invariant (norm
  and n both scale by 10), n_vectors x10.

Run: python scripts/probe_round11d_10x.py   (results -> SURVEY §6)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retail_sales_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
STAGE = "/tmp/probe_r11d_10x"
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
    spark = get_spark(app_name="probe-round11d-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.graph import q_bipartite_butterflies
    from retail_sales_etl_spark.operators.profiling import (
        q_customer_mahalanobis_outliers,
        q_revenue_theil_sen,
    )
    from retail_sales_etl_spark.operators.similarity import q_embedding_top_pc
    from retail_sales_etl_spark.operators.text import q_text_zipf_fit

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))

    # --- bipartite_butterflies: disjoint copies ---
    li = load_table(spark, SF_DIR, "lineitem")
    d_li = _stage(
        spark,
        "li10",
        "lineitem",
        li.crossJoin(copies).select(
            (F.col("l_partkey") + F.col("copy") * F.lit(10**7)).alias("l_partkey"),
            (F.col("l_suppkey") + F.col("copy") * F.lit(10**7)).alias("l_suppkey"),
        ),
    )
    (b,), t1 = _timed(lambda: q_bipartite_butterflies(spark, SF_DIR).collect())
    (g,), t10 = _timed(lambda: q_bipartite_butterflies(spark, d_li).collect())
    assert g["n_edges"] == COPIES * b["n_edges"]
    assert g["n_butterflies"] == COPIES * b["n_butterflies"]
    assert g["n_three_paths"] == COPIES * b["n_three_paths"]
    assert abs(g["bipartite_cc"] - b["bipartite_cc"]) <= 1e-6
    print(
        f"bipartite_butterflies 10x (disjoint copies): edges/butterflies/"
        f"3-paths EXACTLY x10, cc within 1e-6 "
        f"({b['bipartite_cc']} vs {g['bipartite_cc']}); wall {t1:.1f}s -> "
        f"{t10:.1f}s (x{t10 / t1:.1f})"
    )

    # --- text_zipf_fit: doc replication -> slope invariant, intercept + ln 10 ---
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
    (b,), t1 = _timed(lambda: q_text_zipf_fit(spark, SF_DIR).collect())
    (g,), t10 = _timed(lambda: q_text_zipf_fit(spark, d_docs).collect())
    assert g["n_types"] == b["n_types"] and g["n_head"] == b["n_head"]
    assert g["n_tokens"] == COPIES * b["n_tokens"]
    assert abs(g["zipf_slope"] - b["zipf_slope"]) < 1e-5
    assert abs((g["zipf_intercept"] - b["zipf_intercept"]) - math.log(10)) < 1e-5
    assert abs(g["r2"] - b["r2"]) < 1e-5
    print(
        f"text_zipf_fit 10x: ranks UNCHANGED, slope/R2 invariant (1e-5), "
        f"intercept shifts by exactly ln 10 "
        f"({b['zipf_intercept']} -> {g['zipf_intercept']}); wall {t1:.1f}s -> "
        f"{t10:.1f}s (x{t10 / t1:.1f})"
    )

    # --- customer_mahalanobis_outliers: x10 per-customer orders ---
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
        lambda: {r["custkey"]: r for r in q_customer_mahalanobis_outliers(spark, SF_DIR).collect()}
    )
    g, t10 = _timed(
        lambda: {r["custkey"]: r for r in q_customer_mahalanobis_outliers(spark, d_ord).collect()}
    )
    assert set(g) == set(b), "scale invariance must preserve the top-K set"
    for k, rb in b.items():
        rg = g[k]
        assert rg["n_orders"] == COPIES * rb["n_orders"]
        assert rg["spend_cents"] == COPIES * rb["spend_cents"]
        assert abs(rg["mahalanobis_sq"] - rb["mahalanobis_sq"]) < 1e-5 * max(
            1.0, rb["mahalanobis_sq"]
        )
    print(
        f"customer_mahalanobis_outliers 10x: top-K set preserved, every "
        f"d^2 scale-invariant (1e-5 rel), counts/spend EXACTLY x10; wall "
        f"{t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )

    # --- revenue_theil_sen: x10 daily revenue -> slope and intercept x10 ---
    (b,), t1 = _timed(lambda: q_revenue_theil_sen(spark, SF_DIR).collect())
    (g,), t10 = _timed(lambda: q_revenue_theil_sen(spark, d_ord).collect())
    assert g["n_days"] == b["n_days"] and g["n_pairs"] == b["n_pairs"]
    assert abs(g["slope_cents_per_day"] - COPIES * b["slope_cents_per_day"]) < 1e-4
    assert (
        abs(g["intercept_cents"] - COPIES * b["intercept_cents"])
        < 1e-5 * abs(COPIES * b["intercept_cents"])
    )
    print(
        f"revenue_theil_sen 10x: day grid fixed, slope + intercept scale "
        f"EXACTLY x10 ({b['slope_cents_per_day']} -> "
        f"{g['slope_cents_per_day']}); wall {t1:.1f}s -> {t10:.1f}s "
        f"(x{t10 / t1:.1f})"
    )

    # --- embedding_top_pc: replication leaves the spectrum unchanged ---
    emb = load_table(spark, SF_DIR, "embeddings")
    d_emb = _stage(
        spark,
        "emb10",
        "embeddings",
        emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias("vec_id"),
            "embedding",
            "label",
        ),
    )
    b, t1 = _timed(
        lambda: {r["dim"]: r for r in q_embedding_top_pc(spark, SF_DIR).collect()}
    )
    g, t10 = _timed(
        lambda: {r["dim"]: r for r in q_embedding_top_pc(spark, d_emb).collect()}
    )
    for d in b:
        assert abs(g[d]["loading"] - b[d]["loading"]) < 1e-5, (d, b[d], g[d])
    any_b, any_g = next(iter(b.values())), next(iter(g.values()))
    assert any_g["n_vectors"] == COPIES * any_b["n_vectors"]
    assert abs(any_g["eigenvalue"] - any_b["eigenvalue"]) < 1e-5
    print(
        f"embedding_top_pc 10x ({COPIES * 50000} vectors): loadings and "
        f"eigenvalue replication-invariant (1e-5), n x10; wall {t1:.1f}s "
        f"-> {t10:.1f}s (x{t10 / t1:.1f})"
    )
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
