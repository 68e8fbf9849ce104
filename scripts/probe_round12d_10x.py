"""Round-12 fourth-wave 10x probes (sf0.1 x10 copies):

- revenue_runs_test: replicating every order 10x on the SAME dates
  scales each day's revenue by exactly 10 — the median scales by 10
  too, so every above/below flag is IDENTICAL and n_runs / counts /
  mu / z must not move at all (the test is scale-free). The flip
  window input is the unchanged day grid.
- embedding_ivf_balance_qc: 10x vectors per label leave every
  centroid and every assignment identical — n_vectors scales x10
  exactly, share and load_factor are ratio statistics and must be
  IDENTICAL.

Run: python scripts/probe_round12d_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r12d_10x"
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
    spark = get_spark(app_name="probe-round12d-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_runs_test,
    )
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_ivf_balance_qc,
    )

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))

    # --- revenue_runs_test: 10x orders on the same dates ---------------
    od = load_table(spark, SF_DIR, "orders")
    d_od = _stage(
        spark,
        "od10",
        "orders",
        od.crossJoin(copies).select(
            (F.col("o_orderkey") + F.col("copy") * F.lit(10**10)).alias(
                "o_orderkey"
            ),
            "o_totalprice",
            "o_orderdate",
        ),
    )
    (b,), t1 = _timed(lambda: q_revenue_runs_test(spark, SF_DIR).collect())
    (g,), t10 = _timed(lambda: q_revenue_runs_test(spark, d_od).collect())
    assert tuple(g) == tuple(b), (tuple(b), tuple(g))
    print(
        f"revenue_runs_test 10x (same dates): entire 1-row output "
        f"IDENTICAL (R={b['n_runs']}, z={b['z_score']}) — the test is "
        f"scale-free; wall {t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )

    # --- embedding_ivf_balance_qc: 10x vectors per label ---------------
    emb = load_table(spark, SF_DIR, "embeddings")
    d_emb = _stage(
        spark,
        "emb10",
        "embeddings",
        emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("copy") * F.lit(10**9)).alias("vec_id"),
            "label",
            "embedding",
        ),
    )
    base, t1 = _timed(
        lambda: q_embedding_ivf_balance_qc(spark, SF_DIR).collect()
    )
    big, t10 = _timed(
        lambda: q_embedding_ivf_balance_qc(spark, d_emb).collect()
    )
    b = {r["cell"]: r for r in base}
    g = {r["cell"]: r for r in big}
    assert set(b) == set(g)
    for c, rb in b.items():
        rg = g[c]
        assert rg["n_vectors"] == 10 * rb["n_vectors"], c
        assert rg["share"] == rb["share"], c
        assert rg["load_factor"] == rb["load_factor"], c
    print(
        f"embedding_ivf_balance_qc 10x: every cell's share/load_factor "
        f"IDENTICAL across {len(b)} cells, n_vectors exactly x10; wall "
        f"{t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )

    shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
