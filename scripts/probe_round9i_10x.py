"""10x scale-posture probe for the ninth round-9 operator wave:
events_hour_dow_heatmap, session_km_survival, source_top_terms.

Growth constructions:
- events_hour_dow_heatmap: event replication -> every cell x10, every
  share IDENTICAL.
- session_km_survival: user_id-offset event copies -> every session
  duplicates x10 with identical durations and censoring flags, so the
  curve (duration grid, survival values) is IDENTICAL while every
  n_risk/n_death/n_censored is exactly x10.
- source_top_terms: doc replication -> tf x10 per (source, word),
  source-df and n_sources unchanged -> the top-k term SET and order
  IDENTICAL, scores exactly x10.

Run: python scripts/probe_round9i_10x.py
Results -> SURVEY §6.
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
STAGE = "/tmp/probe_r9i_10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def _stage_events(spark, out_dir):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * F.lit(10_000_000)).alias(
            "event_id"
        ),
        "ts",
        (F.col("user_id") + F.col("copy") * F.lit(10_000_000)).alias(
            "user_id"
        ),
        "event_type",
        "value",
        "props",
    )
    big.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def probe_heatmap(spark):
    from retail_sales_etl_spark.operators.events import (
        q_events_hour_dow_heatmap,
    )

    d = f"{STAGE}/heat"
    _stage_events(spark, d)
    key = lambda r: (r["dow_idx"], r["hour"])  # noqa: E731
    base = {key(r): r for r in q_events_hour_dow_heatmap(spark, SF_DIR).collect()}
    _, t1 = _time(
        lambda: q_events_hour_dow_heatmap(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {key(r): r for r in q_events_hour_dow_heatmap(spark, d).collect()}
    _, t10 = _time(
        lambda: q_events_hour_dow_heatmap(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert big.keys() == base.keys()
    for k, rb in base.items():
        assert big[k]["n_events"] == COPIES * rb["n_events"], k
        assert big[k]["share"] == rb["share"], k
    print(
        f"events_hour_dow_heatmap: cells x{COPIES} exact, shares "
        f"IDENTICAL; wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_km(spark):
    from retail_sales_etl_spark.operators.events import (
        q_session_km_survival,
    )

    d = f"{STAGE}/km"
    _stage_events(spark, d)
    base = {r["duration_sec"]: r for r in q_session_km_survival(spark, SF_DIR).collect()}
    _, t1 = _time(
        lambda: q_session_km_survival(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {r["duration_sec"]: r for r in q_session_km_survival(spark, d).collect()}
    _, t10 = _time(
        lambda: q_session_km_survival(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert big.keys() == base.keys()
    for k, rb in base.items():
        rg = big[k]
        assert rg["n_risk"] == COPIES * rb["n_risk"], k
        assert rg["n_death"] == COPIES * rb["n_death"], k
        assert rg["n_censored"] == COPIES * rb["n_censored"], k
        assert abs(rg["survival"] - rb["survival"]) < 2e-6, k
    print(
        f"session_km_survival: curve IDENTICAL (<=2e-6) with risk sets "
        f"x{COPIES} exact over {len(base)} durations; wall {t1:.2f}s -> "
        f"{t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_ctfidf(spark):
    from retail_sales_etl_spark.operators.text import q_source_top_terms

    d = f"{STAGE}/ctfidf"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(10_000_000)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    big.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    key = lambda r: (r["source"], r["rank"])  # noqa: E731
    base = {key(r): r for r in q_source_top_terms(spark, SF_DIR).collect()}
    _, t1 = _time(
        lambda: q_source_top_terms(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    bigr = {key(r): r for r in q_source_top_terms(spark, d).collect()}
    _, t10 = _time(
        lambda: q_source_top_terms(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert bigr.keys() == base.keys()
    for k, rb in base.items():
        rg = bigr[k]
        assert rg["w"] == rb["w"], k
        assert rg["tf"] == COPIES * rb["tf"], k
        assert abs(rg["ctfidf"] - COPIES * rb["ctfidf"]) < 1e-4, k
    print(
        f"source_top_terms: term sets and order IDENTICAL, tf/scores "
        f"x{COPIES}; wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def main():
    spark = get_spark()
    os.makedirs(STAGE, exist_ok=True)
    try:
        probe_heatmap(spark)
        probe_km(spark)
        probe_ctfidf(spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
