"""Round-15 seventh-wave 10x probes (sf0.1 x10 copies):

- streaming_rfm (4-batch replay, orders x10 on fresh custkeys):
  rows x10; the original customers' (recency, frequency, monetary)
  state is byte-identical (quartiles shift with the population by
  design, so the probe pins the maintained STATE, not the ranks).
- chi2_source_lang (docs x10, same sources/langs): the contingency
  proportions are unchanged, so V is IDENTICAL while chi2 scales x10
  (the textbook N-dependence — a free correctness cross-check).

Run: python scripts/probe_round15g_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r15g_10x"
COPIES = 10


def _stage(spark, subdir, tables: dict):
    d = os.path.join(STAGE, subdir)
    os.makedirs(d, exist_ok=True)
    for table, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(d, f"{table}.parquet"))
    from retail_sales_etl_spark.catalog import TABLES

    for t in TABLES:
        link = os.path.join(d, f"{t}.parquet")
        if t not in tables and not os.path.exists(link):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), link)
    return d


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-round15g-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.text import q_chi2_source_lang
    from retail_sales_etl_spark.streaming.events import q_streaming_rfm

    orders = load_table(spark, SF_DIR, "orders")
    hi_c = orders.agg(F.max("o_custkey")).first()[0] + 1
    hi_o = orders.agg(F.max("o_orderkey")).first()[0] + 1
    or10 = orders
    for k in range(1, COPIES):
        or10 = or10.unionAll(
            orders.withColumn("o_custkey", F.col("o_custkey") + F.lit(k * hi_c))
            .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * hi_o))
        )
    o10 = _stage(spark, "orders10", {"orders": or10})
    base, t1 = _timed(lambda: q_streaming_rfm(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_streaming_rfm(spark, o10).collect())
    assert len(big) == COPIES * len(base)
    bmap = {
        r.customer_id: (r.last_order_date, r.frequency, r.monetary)
        for r in big
    }
    assert all(
        (r.last_order_date, r.frequency, r.monetary)
        == bmap[r.customer_id]
        for r in base
    )
    print(f"strm_rfm       1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  ({len(base)} -> {len(big)} customers)")

    docs = load_table(spark, SF_DIR, "documents")
    hi = docs.agg(F.max("doc_id")).first()[0] + 1
    docs10 = docs
    for k in range(1, COPIES):
        docs10 = docs10.unionAll(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * hi))
        )
    d10 = _stage(spark, "docs10", {"documents": docs10})
    base, t1 = _timed(lambda: q_chi2_source_lang(spark, SF_DIR).first())
    big, t10 = _timed(lambda: q_chi2_source_lang(spark, d10).first())
    assert big["n_docs"] == COPIES * base["n_docs"]
    assert big["cramers_v"] == base["cramers_v"]  # proportions unchanged
    assert abs(big["chi2"] - COPIES * base["chi2"]) < 1e-3 * big["chi2"]
    print(f"chi2_src_lang  1x {t1:6.2f}s   10x {t10:6.2f}s  "
          f"ratio {t10 / t1:4.1f}  (V {base['cramers_v']} invariant)")

    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
