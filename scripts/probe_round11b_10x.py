"""Round-11 second-wave 10x probes — exact output identities for the
four new operators:

1. embedding_matryoshka_qc: 10 embedding copies at even id offsets
   (pair parity preserved) -> n_pairs exactly x10 with mean_cos /
   mean_abs_gap IDENTICAL per k (DECIMAL sums and counts both scale
   by 10, the quotient cancels).
2. events_autocorr: 10 disjoint-user event copies -> daily counts x10
   per (type, day), so every Pearson moment scales (n fixed, sums
   x10, cross-products x100) and the autocorrelation is IDENTICAL
   with n_pairs IDENTICAL.
3. doc_length_lorenz: 10 doc copies -> decile composition identical
   (n_docs and decile_chars exactly x10, shares IDENTICAL) and the
   Gini is EXACTLY replication-invariant: with each element copied
   10x, S' = 100S - 45T, so G' = 2S'/(10n*10T) - (10n+1)/(10n) = G.
4. pack_efficiency_report: copies packed into per-copy SALTED sources
   (disjoint shards, the packer's parallel unit) -> every copy's
   per-source report IDENTICAL to base, 10x report rows.

Run: python scripts/probe_round11b_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r11b_10x"
COPIES = 10


def _stage(spark, subdir: str, table: str, df) -> str:
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


def probe_matryoshka(spark) -> None:
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_matryoshka_qc,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias("vec_id"),
        "embedding",
        "label",
    )
    d10 = _stage(spark, "matryoshka10", "embeddings", big)

    base, t1 = _timed(
        lambda: {
            r["k"]: r for r in q_embedding_matryoshka_qc(spark, SF_DIR).collect()
        }
    )
    out10, t10 = _timed(
        lambda: {
            r["k"]: r for r in q_embedding_matryoshka_qc(spark, d10).collect()
        }
    )
    for k, b in base.items():
        g = out10[k]
        assert g["n_pairs"] == COPIES * b["n_pairs"], (k, b, g)
        assert g["mean_cos"] == b["mean_cos"], (k, b, g)
        assert g["mean_abs_gap"] == b["mean_abs_gap"], (k, b, g)
    print(
        f"embedding_matryoshka_qc: base {t1:.1f}s -> 10x {t10:.1f}s "
        f"(x{t10 / t1:.1f}); n_pairs exactly x{COPIES}, mean_cos + "
        f"mean_abs_gap IDENTICAL for every k"
    )


def probe_autocorr(spark) -> None:
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import q_events_autocorr

    ev = load_table(spark, SF_DIR, "events")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * F.lit(10**12)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("copy") * F.lit(10**9)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    d10 = _stage(spark, "autocorr10", "events", big)

    base, t1 = _timed(
        lambda: {
            (r["event_type"], r["lag"]): r
            for r in q_events_autocorr(spark, SF_DIR).collect()
        }
    )
    out10, t10 = _timed(
        lambda: {
            (r["event_type"], r["lag"]): r
            for r in q_events_autocorr(spark, d10).collect()
        }
    )
    assert set(base) == set(out10)
    for k, b in base.items():
        g = out10[k]
        assert g["n_pairs"] == b["n_pairs"], (k, b, g)
        assert g["autocorr"] == b["autocorr"], (k, b, g)
    print(
        f"events_autocorr: base {t1:.1f}s -> 10x {t10:.1f}s "
        f"(x{t10 / t1:.1f}); n_pairs IDENTICAL (grid unchanged), "
        f"autocorrelation IDENTICAL under x10 daily counts"
    )


def probe_lorenz(spark) -> None:
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.profiling import q_doc_length_lorenz

    docs = load_table(spark, SF_DIR, "documents")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(10**9)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    d10 = _stage(spark, "lorenz10", "documents", big)

    base, t1 = _timed(
        lambda: {
            r["decile"]: r for r in q_doc_length_lorenz(spark, SF_DIR).collect()
        }
    )
    out10, t10 = _timed(
        lambda: {
            r["decile"]: r for r in q_doc_length_lorenz(spark, d10).collect()
        }
    )
    for dec, b in base.items():
        g = out10[dec]
        assert g["n_docs"] == COPIES * b["n_docs"], (dec, b, g)
        assert g["decile_chars"] == COPIES * b["decile_chars"], (dec, b, g)
        assert g["share"] == b["share"], (dec, b, g)
        assert g["gini"] == b["gini"], (dec, b, g)
    print(
        f"doc_length_lorenz: base {t1:.1f}s -> 10x {t10:.1f}s "
        f"(x{t10 / t1:.1f}); deciles exactly x{COPIES}, shares IDENTICAL, "
        f"Gini EXACTLY replication-invariant ({base[0]['gini']})"
    )


def probe_pack_efficiency(spark) -> None:
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.text import q_pack_efficiency_report

    docs = load_table(spark, SF_DIR, "documents")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(10**9)).alias("doc_id"),
        "text",
        "lang",
        F.concat("source", F.lit("_c"), F.col("copy")).alias("source"),
        "n_chars",
    )
    d10 = _stage(spark, "packeff10", "documents", big)

    base, t1 = _timed(
        lambda: {
            r["source"]: r
            for r in q_pack_efficiency_report(spark, SF_DIR).collect()
        }
    )
    out10, t10 = _timed(
        lambda: {
            r["source"]: r
            for r in q_pack_efficiency_report(spark, d10).collect()
        }
    )
    assert len(out10) == COPIES * len(base)
    check_cols = (
        "n_packs",
        "n_docs",
        "total_words",
        "max_pack_words",
        "n_overflow",
        "waste_words",
        "mean_fill",
        "overflow_frac",
    )
    for src, g in out10.items():
        b = base[src.rsplit("_c", 1)[0]]
        for c in check_cols:
            assert g[c] == b[c], (src, c, b[c], g[c])
    print(
        f"pack_efficiency_report: base {t1:.1f}s -> 10x {t10:.1f}s "
        f"(x{t10 / t1:.1f}); every salted copy's per-source report "
        f"IDENTICAL to base ({len(out10)} rows)"
    )


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-round11b-10x")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        probe_matryoshka(spark)
        probe_autocorr(spark)
        probe_lorenz(spark)
        probe_pack_efficiency(spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
