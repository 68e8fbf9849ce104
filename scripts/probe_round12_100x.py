"""Round-12 100x probes for the r11 recursive/iterative additions —
pinning that the day-grid / 64-dim-grid shapes stay scan-dominated
when the FACT side grows two orders of magnitude:

- revenue_holt_smoothing (150k -> 15M orders): pad every order with
  99 ZERO-revenue copies (distinct orderkeys, same dates) — daily
  revenue and the day grid are bit-identical, so the whole Holt
  recursion (level/trend/fitted/resid per day) must be IDENTICAL
  while the applyInPandas input grid stays the same ~2.4k days; wall
  growth is the orders scan only.
- embedding_top_pc / embedding_anisotropy_qc (50k -> 5M vectors):
  exact x100 duplication — the staged mean is sum/count invariant,
  every centered projection repeats 100x, and each power-iteration
  round's normalized iterate is scale-free, so loadings, eigenvalue,
  and the anisotropy share are IDENTICAL (n_vectors exactly x100);
  per-round traffic stays one broadcast 64-vector + a 64-group agg.

Run: python scripts/probe_round12_100x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r12_100x"
COPIES = 100


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
    spark = get_spark(app_name="probe-round12-100x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_holt_smoothing,
    )
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_anisotropy_qc,
        q_embedding_top_pc,
    )

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))

    orders = load_table(spark, SF_DIR, "orders")
    price_t = dict(orders.dtypes)["o_totalprice"]
    d_ord = _stage(
        spark,
        "ord100",
        "orders",
        orders.crossJoin(copies).select(
            (F.col("o_orderkey") + F.col("copy") * F.lit(10**10)).alias(
                "o_orderkey"
            ),
            *[
                c
                for c in orders.columns
                if c not in ("o_orderkey", "o_totalprice")
            ],
            F.when(F.col("copy") == 0, F.col("o_totalprice"))
            .otherwise(F.lit(0))
            .cast(price_t)
            .alias("o_totalprice"),
        ),
    )
    base, t1 = _timed(
        lambda: {
            r["d"]: r for r in q_revenue_holt_smoothing(spark, SF_DIR).collect()
        }
    )
    big, t100 = _timed(
        lambda: {
            r["d"]: r for r in q_revenue_holt_smoothing(spark, d_ord).collect()
        }
    )
    assert set(big) == set(base)
    for d, b in base.items():
        assert big[d] == b, (d, b, big[d])
    print(
        f"revenue_holt_smoothing 100x ({COPIES * 150}k orders, zero-pad "
        f"identity): day grid fixed ({len(base)} days), every "
        f"level/trend/fitted/resid IDENTICAL; wall {t1:.1f}s -> "
        f"{t100:.1f}s (x{t100 / t1:.1f})"
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    d_emb = _stage(
        spark,
        "emb100",
        "embeddings",
        emb.crossJoin(copies).select(
            (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias(
                "vec_id"
            ),
            "embedding",
            "label",
        ),
    )
    base, t1 = _timed(
        lambda: {r["dim"]: r for r in q_embedding_top_pc(spark, SF_DIR).collect()}
    )
    big, t100 = _timed(
        lambda: {r["dim"]: r for r in q_embedding_top_pc(spark, d_emb).collect()}
    )
    for dim, b in base.items():
        g = big[dim]
        assert g["loading"] == b["loading"], (dim, b, g)
        assert g["eigenvalue"] == b["eigenvalue"]
        assert g["n_vectors"] == COPIES * b["n_vectors"]
    print(
        f"embedding_top_pc 100x ({COPIES * 50}k vectors): loadings + "
        f"eigenvalue IDENTICAL, n x100 exact; wall {t1:.1f}s -> "
        f"{t100:.1f}s (x{t100 / t1:.1f})"
    )

    base, t1 = _timed(lambda: q_embedding_anisotropy_qc(spark, SF_DIR).collect())
    big, t100 = _timed(lambda: q_embedding_anisotropy_qc(spark, d_emb).collect())
    (b,), (g,) = base, big
    assert g["pc1_share"] == b["pc1_share"]
    assert g["lambda1"] == b["lambda1"] and g["trace"] == b["trace"]
    print(
        f"embedding_anisotropy_qc 100x: lambda1 + trace + pc1_share "
        f"IDENTICAL; wall {t1:.1f}s -> {t100:.1f}s (x{t100 / t1:.1f})"
    )
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
