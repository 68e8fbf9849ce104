"""Round-11 fifth-wave 10x probe: multimodal_phash_dedup (sf0.1 x10).

Copy shift = 3072 * 10^5, a multiple of lcm(8, 6, 256) = 3072 — the
pixel generator and the dims function are both periodic in doc_id with
that period, so every copy renders IDENTICAL images. Exact identity:
every hash bucket's n_docs and bucket_gray_sum are x10, min_doc_id
(copy 0) unchanged, and no new buckets appear.

Run: python scripts/probe_round11e_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r11e_10x"
COPIES = 10
SHIFT = 3072 * 10**5  # multiple of lcm(8, 6, 256): identical renders


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-round11e-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import TABLES, load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_phash_dedup,
    )

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    docs = load_table(spark, SF_DIR, "documents")
    d = os.path.join(STAGE, "docs10")
    os.makedirs(d, exist_ok=True)
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(SHIFT)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    for t in TABLES:
        link = os.path.join(d, f"{t}.parquet")
        if t != "documents" and not os.path.exists(link):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), link)

    t0 = time.perf_counter()
    base = {r["phash"]: r for r in q_multimodal_phash_dedup(spark, SF_DIR).collect()}
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    big = {r["phash"]: r for r in q_multimodal_phash_dedup(spark, d).collect()}
    t10 = time.perf_counter() - t0
    assert set(big) == set(base), "identical renders must not create buckets"
    for h, b in base.items():
        g = big[h]
        assert g["n_docs"] == COPIES * b["n_docs"]
        assert g["bucket_gray_sum"] == COPIES * b["bucket_gray_sum"]
        assert g["min_doc_id"] == b["min_doc_id"]
    print(
        f"multimodal_phash_dedup 10x (period-aligned copies): every "
        f"bucket n_docs + gray mass EXACTLY x10, min_doc_id unchanged "
        f"({len(base)} buckets); wall {t1:.1f}s -> {t10:.1f}s "
        f"(x{t10 / t1:.1f})"
    )
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
