"""Round-11 100x probes — the same exact identities as the 10x wave,
two orders of magnitude up (sf0.1 base x100 copies):

- doc_length_lorenz (500k docs): deciles exactly x100, shares
  IDENTICAL, Gini exactly replication-invariant (banded rank — no
  global sort to blow up).
- events_autocorr (2.6M events): grid unchanged, autocorrelation
  IDENTICAL under x100 daily counts (DECIMAL moments — the int64
  headroom this probe would exhaust at larger counts is why the
  moments are decimal).
- embedding_matryoshka_qc (500k vectors): n_pairs exactly x100,
  mean_cos / mean_abs_gap IDENTICAL per k.

Run: python scripts/probe_round11_100x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r11_100x"
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
    spark = get_spark(app_name="probe-round11-100x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import q_events_autocorr
    from retail_sales_etl_spark.operators.profiling import q_doc_length_lorenz
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_matryoshka_qc,
    )

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))

    docs = load_table(spark, SF_DIR, "documents")
    d_docs = _stage(
        spark,
        "docs100",
        "documents",
        docs.crossJoin(copies).select(
            (F.col("doc_id") + F.col("copy") * F.lit(10**9)).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        ),
    )
    base, t1 = _timed(
        lambda: {r["decile"]: r for r in q_doc_length_lorenz(spark, SF_DIR).collect()}
    )
    big, t100 = _timed(
        lambda: {r["decile"]: r for r in q_doc_length_lorenz(spark, d_docs).collect()}
    )
    for dec, b in base.items():
        g = big[dec]
        assert g["n_docs"] == COPIES * b["n_docs"]
        assert g["decile_chars"] == COPIES * b["decile_chars"]
        assert g["share"] == b["share"] and g["gini"] == b["gini"]
    print(
        f"doc_length_lorenz 100x ({COPIES * 5000} docs): deciles x100 "
        f"exact, shares + Gini IDENTICAL; wall {t1:.1f}s -> {t100:.1f}s "
        f"(x{t100 / t1:.1f})"
    )

    ev = load_table(spark, SF_DIR, "events")
    d_ev = _stage(
        spark,
        "ev100",
        "events",
        ev.crossJoin(copies).select(
            (F.col("event_id") + F.col("copy") * F.lit(10**12)).alias(
                "event_id"
            ),
            "ts",
            (F.col("user_id") + F.col("copy") * F.lit(10**9)).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    )
    base, t1 = _timed(
        lambda: {
            (r["event_type"], r["lag"]): r
            for r in q_events_autocorr(spark, SF_DIR).collect()
        }
    )
    big, t100 = _timed(
        lambda: {
            (r["event_type"], r["lag"]): r
            for r in q_events_autocorr(spark, d_ev).collect()
        }
    )
    for k, b in base.items():
        g = big[k]
        assert g["n_pairs"] == b["n_pairs"] and g["autocorr"] == b["autocorr"]
    print(
        f"events_autocorr 100x (2.6M events): grid fixed, autocorr "
        f"IDENTICAL under x100 counts; wall {t1:.1f}s -> {t100:.1f}s "
        f"(x{t100 / t1:.1f})"
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
        lambda: {
            r["k"]: r for r in q_embedding_matryoshka_qc(spark, SF_DIR).collect()
        }
    )
    big, t100 = _timed(
        lambda: {
            r["k"]: r for r in q_embedding_matryoshka_qc(spark, d_emb).collect()
        }
    )
    for k, b in base.items():
        g = big[k]
        assert g["n_pairs"] == COPIES * b["n_pairs"]
        assert g["mean_cos"] == b["mean_cos"]
        assert g["mean_abs_gap"] == b["mean_abs_gap"]
    print(
        f"embedding_matryoshka_qc 100x (500k vectors): n_pairs x100 "
        f"exact, means IDENTICAL; wall {t1:.1f}s -> {t100:.1f}s "
        f"(x{t100 / t1:.1f})"
    )
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
