"""Round-12 second-wave 10x probes (sf0.1 x10 copies):

- revenue_changepoint: replicating every order 10x on the SAME dates
  multiplies each day-grid cell by exactly 10 — the detected split day
  and both segment sizes must be IDENTICAL (the argmax is scale-free),
  the means ~10x. The grid itself is unchanged, so the window input is
  corpus-size-INDEPENDENT.
- brand_price_elasticity: 10x lineitem copies per brand scale every
  regression sum by exactly 10 — slope/intercept/r2 are ratio
  statistics and must agree to staging precision; n_obs x10 exact.
- mix_source_reliability: 10x doc copies per source leave reliability
  EXACTLY unchanged (same ratio of exact ints) and divide keep_rate by
  ~10 (fixed budget over 10x tokens).
- multimodal_wav_stats: doc-grain codec — copy-0 rows identical, row
  count x10, wall ~linear (payload bytes never shuffle).

Run: python scripts/probe_round12b_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r12b_10x"
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
    spark = get_spark(app_name="probe-round12b-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_wav_stats,
    )
    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_changepoint,
    )
    from retail_sales_etl_spark.operators.sampling import (
        q_mix_source_reliability,
    )
    from retail_sales_etl_spark.plans.analytics import (
        q_brand_price_elasticity,
    )

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))

    # --- revenue_changepoint: same dates, 10x volume -------------------
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
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ),
    )
    (b,), t1 = _timed(lambda: q_revenue_changepoint(spark, SF_DIR).collect())
    (g,), t10 = _timed(lambda: q_revenue_changepoint(spark, d_od).collect())
    assert g["split_d"] == b["split_d"], (b["split_d"], g["split_d"])
    assert g["n_left"] == b["n_left"] and g["n_right"] == b["n_right"]
    assert abs(g["mean_left"] - 10 * b["mean_left"]) < 1e-3
    assert abs(g["mean_right"] - 10 * b["mean_right"]) < 1e-3
    print(
        f"revenue_changepoint 10x (same dates): split day IDENTICAL "
        f"(d={b['split_d']}), means exactly ~10x; wall {t1:.1f}s -> "
        f"{t10:.1f}s (x{t10 / t1:.1f})"
    )

    # --- brand_price_elasticity: 10x observations per brand ------------
    li = load_table(spark, SF_DIR, "lineitem")
    d_li = _stage(
        spark,
        "li10",
        "lineitem",
        li.crossJoin(copies).select(
            (F.col("l_orderkey") + F.col("copy") * F.lit(10**10)).alias(
                "l_orderkey"
            ),
            "l_partkey",
            "l_quantity",
            "l_extendedprice",
        ),
    )
    base, t1 = _timed(lambda: q_brand_price_elasticity(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_brand_price_elasticity(spark, d_li).collect())
    bm = {r["p_brand"]: r for r in base}
    gm = {r["p_brand"]: r for r in big}
    assert set(bm) == set(gm)
    for brand, r in bm.items():
        assert gm[brand]["n_obs"] == COPIES * r["n_obs"]
        for c in ("elasticity", "intercept", "r2"):
            assert abs(gm[brand][c] - r[c]) < 1e-5, (brand, c, r[c], gm[brand][c])
    print(
        f"brand_price_elasticity 10x: all {len(bm)} brand fits agree to "
        f"staging precision, n_obs x10 exact; wall {t1:.1f}s -> {t10:.1f}s "
        f"(x{t10 / t1:.1f})"
    )

    # --- mix_source_reliability: 10x docs per source --------------------
    docs = load_table(spark, SF_DIR, "documents")
    d_docs = _stage(
        spark,
        "docs10",
        "documents",
        docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * F.lit(10**9)).alias("doc_id"),
            "source",
            "lang",
            "text",
            "n_chars",
        ),
    )
    base, t1 = _timed(
        lambda: q_mix_source_reliability(spark, SF_DIR).collect()
    )
    big, t10 = _timed(lambda: q_mix_source_reliability(spark, d_docs).collect())
    b_rel = {r["source"]: (r["reliability"], r["keep_rate"]) for r in base}
    g_rel = {r["source"]: (r["reliability"], r["keep_rate"]) for r in big}
    for src, (rel, kr) in b_rel.items():
        g_r, g_k = g_rel[src]
        assert g_r == rel, (src, rel, g_r)  # exact: same int ratio
        assert abs(g_k - kr / COPIES) < 1e-6, (src, kr, g_k)
    print(
        f"mix_source_reliability 10x: per-source reliability EXACTLY "
        f"unchanged, keep_rate /10 (fixed budget); kept {len(base)} -> "
        f"{len(big)} docs; wall {t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )

    # --- multimodal_wav_stats: doc-grain codec --------------------------
    base, t1 = _timed(
        lambda: q_multimodal_wav_stats(spark, SF_DIR)
        .orderBy("doc_id")
        .collect()
    )
    big_cnt, t10 = _timed(
        lambda: q_multimodal_wav_stats(spark, d_docs).count()
    )
    assert big_cnt == COPIES * len(base)
    print(
        f"multimodal_wav_stats 10x: {len(base)} -> {big_cnt} doc rows "
        f"(x{COPIES} exact); wall {t1:.1f}s -> {t10:.1f}s "
        f"(x{t10 / t1:.1f}, ~linear decode)"
    )

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
