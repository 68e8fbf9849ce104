"""10x scale-posture probe for the seventh round-9 operator wave:
part_abc_classes, doc_quality_features.

Growth constructions:
- part_abc_classes: plain lineitem replication (same part keys) ->
  every part's revenue x10 and the total x10, so each part's
  cumulative SHARE — and therefore its class — is IDENTICAL:
  per-class n_parts equal, class_revenue exactly x10, shares equal.
- doc_quality_features: doc_id-offset document copies -> per-doc
  features are replication-invariant (quality/entropy/repetition are
  per-doc; the corpus-LM logprob is invariant because every count and
  the total scale together), so each clone's feature row must equal
  its base row exactly; rows x10.

Run: python scripts/probe_round9g_10x.py
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
STAGE = "/tmp/probe_r9g_10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def probe_abc(spark):
    from retail_sales_etl_spark.plans.analytics import q_part_abc_classes

    d = f"{STAGE}/abc"
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    li.crossJoin(copies).drop("copy").write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    base = {r["abc_class"]: r for r in q_part_abc_classes(spark, SF_DIR).collect()}
    _, t1 = _time(
        lambda: q_part_abc_classes(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {r["abc_class"]: r for r in q_part_abc_classes(spark, d).collect()}
    _, t10 = _time(
        lambda: q_part_abc_classes(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert set(big) == set(base)
    for cls, rb in base.items():
        rg = big[cls]
        assert rg["n_parts"] == rb["n_parts"], cls
        assert abs(rg["class_revenue"] - COPIES * rb["class_revenue"]) < 1.0
        assert rg["revenue_share"] == rb["revenue_share"], cls
    print(
        f"part_abc_classes: classes and shares IDENTICAL, revenue "
        f"x{COPIES}; wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_features(spark):
    from retail_sales_etl_spark.operators.text import q_doc_quality_features

    d = f"{STAGE}/features"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_base = docs.count()
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(10_000_000)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    big.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    base = {
        r["doc_id"]: tuple(r)[1:] for r in q_doc_quality_features(spark, SF_DIR).collect()
    }
    _, t1 = _time(
        lambda: q_doc_quality_features(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    bigr = q_doc_quality_features(spark, d).collect()
    _, t10 = _time(
        lambda: q_doc_quality_features(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert len(bigr) == COPIES * n_base
    for r in bigr:
        assert tuple(r)[1:] == base[r["doc_id"] % 10_000_000], r["doc_id"]
    print(
        f"doc_quality_features: every clone row IDENTICAL to its base "
        f"row (LM logprob replication-invariant), rows x{COPIES}; wall "
        f"{t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def main():
    spark = get_spark()
    os.makedirs(STAGE, exist_ok=True)
    try:
        probe_abc(spark)
        probe_features(spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
