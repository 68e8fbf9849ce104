"""10x scale-posture probe for the round-7 pair operators:
setsim_join (PPJoin prefix-filtered exact similarity) and
triangle_count (degree-oriented wedge join).

Corpus growth is SHARD-LIKE (disjoint), matching how real corpora
scale: each documents copy gets a copy-unique word prefix so its
shingle vocabulary is disjoint (cross-copy docs are NOT near-dups,
like new crawl shards); each lineitem copy offsets order AND part
keys so the co-purchase graph gains 10 disjoint components. Under
that growth a sub-quadratic operator should scale ~linearly in wall
time and exactly linearly in output size — which is what this probe
checks. No testdata writes; staging under /tmp.

Run: python scripts/probe_round7_10x.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retail_sales_etl_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main() -> None:
    spark = get_spark(app_name="probe-round7-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.operators.dedup import q_setsim_join
    from retail_sales_etl_spark.operators.graph import q_triangle_count

    # ---------------------------------------------------------- setsim
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big_docs = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(100_000_000)).alias("doc_id"),
        # copy-unique word prefix -> disjoint shingle vocabulary per copy
        F.expr("regexp_replace(text, '(^| )', concat('$1c', copy, 'x'))").alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )
    doc_dir = "/tmp/probe_r7_docs"
    big_docs.write.mode("overwrite").parquet(f"{doc_dir}/documents.parquet")

    n1, t1 = _time(
        lambda: q_setsim_join(spark, SF_DIR).write.mode("overwrite")
        .format("noop").save()
    )
    pairs1 = q_setsim_join(spark, SF_DIR).count()
    n10, t10 = _time(
        lambda: q_setsim_join(spark, doc_dir).write.mode("overwrite")
        .format("noop").save()
    )
    pairs10 = q_setsim_join(spark, doc_dir).count()
    print(
        f"setsim_join: {n_docs} docs {t1:.2f}s ({pairs1} pairs) -> "
        f"{n_docs * COPIES} docs {t10:.2f}s ({pairs10} pairs); "
        f"wall x{t10 / t1:.1f} for x{COPIES} data"
    )

    # -------------------------------------------------------- triangles
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_li = li.count()
    big_li = li.crossJoin(copies).select(
        (F.col("l_orderkey") + F.col("copy") * F.lit(1_000_000_000)).alias(
            "l_orderkey"
        ),
        (F.col("l_partkey") + F.col("copy") * F.lit(1_000_000_000)).alias(
            "l_partkey"
        ),
    )
    li_dir = "/tmp/probe_r7_li"
    big_li.write.mode("overwrite").parquet(f"{li_dir}/lineitem.parquet")

    n1, t1 = _time(
        lambda: q_triangle_count(spark, SF_DIR).write.mode("overwrite")
        .format("noop").save()
    )
    tri1 = q_triangle_count(spark, SF_DIR).agg(
        F.sum("n_triangles")
    ).collect()[0][0]
    n10, t10 = _time(
        lambda: q_triangle_count(spark, li_dir).write.mode("overwrite")
        .format("noop").save()
    )
    tri10 = q_triangle_count(spark, li_dir).agg(
        F.sum("n_triangles")
    ).collect()[0][0]
    print(
        f"triangle_count: {n_li} lines {t1:.2f}s (sum {tri1}) -> "
        f"{n_li * COPIES} lines {t10:.2f}s (sum {tri10}); "
        f"wall x{t10 / t1:.1f} for x{COPIES} data; "
        f"output exactly x{tri10 / tri1:.2f}"
    )


if __name__ == "__main__":
    main()
