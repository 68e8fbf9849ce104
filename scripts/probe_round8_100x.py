"""100x scale-posture probe for the round-7 operators previously
probed only at 10x: setsim_join, triangle_count, heavy_hitters,
bloom_pruned_revenue.

Growth is key-offset/shard-disjoint replication of sf0.1 (the same
construction as SURVEY §6's 10x and 100x probes): disjoint shingle
vocabularies per documents copy, disjoint order/part key spaces per
lineitem copy, so a sub-quadratic operator should scale ~linearly in
wall time and exactly linearly in output. heavy_hitters replicates
events unchanged (same key distribution — the heavy set and shares
must be IDENTICAL at any scale, which the probe asserts). No testdata
writes; staging under /tmp.

Run: python scripts/probe_round8_100x.py [copies] [ops]
     ops: comma list of heavy,bloom,triangle,setsim (default all) —
     lets each section run under a separate driver/time budget.
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
STAGE = "/tmp/probe_r8_100x"


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def probe_heavy(spark, copies, copies_n):
    from retail_sales_etl_spark.operators.profiling import q_heavy_hitters

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_ev = ev.count()
    big_ev_dir = f"{STAGE}/events"
    ev.crossJoin(copies).drop("copy").write.mode("overwrite").parquet(
        f"{big_ev_dir}/events.parquet"
    )
    base = {
        (r["key"], round(r["share"], 6))
        for r in q_heavy_hitters(spark, SF_DIR).collect()
    }
    _, t1 = _time(
        lambda: q_heavy_hitters(spark, SF_DIR).write.mode("overwrite")
        .format("noop").save()
    )
    _, t100 = _time(
        lambda: q_heavy_hitters(spark, big_ev_dir).write.mode("overwrite")
        .format("noop").save()
    )
    big = {
        (r["key"], round(r["share"], 6))
        for r in q_heavy_hitters(spark, big_ev_dir).collect()
    }
    assert big == base, (base, big)  # keys AND 6-dp shares identical
    print(
        f"heavy_hitters: {n_ev} events {t1:.2f}s -> {n_ev * copies_n} "
        f"events {t100:.2f}s; wall x{t100 / t1:.1f} for x{copies_n} data; "
        f"heavy set identical ({sorted(k for k, _ in big)})"
    )


def probe_bloom(spark, copies, copies_n):
    from retail_sales_etl_spark.operators.joins import q_bloom_pruned_revenue

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_li = li.count()
    off = F.col("copy") * F.lit(1_000_000_000)
    big_fact_dir = f"{STAGE}/fact"
    orders.crossJoin(copies).withColumn(
        "o_orderkey", F.col("o_orderkey") + off
    ).drop("copy").write.mode("overwrite").parquet(
        f"{big_fact_dir}/orders.parquet"
    )
    li.crossJoin(copies).withColumn(
        "l_orderkey", F.col("l_orderkey") + off
    ).drop("copy").write.mode("overwrite").parquet(
        f"{big_fact_dir}/lineitem.parquet"
    )
    r1 = {
        r["return_flag"]: r["n_lines"]
        for r in q_bloom_pruned_revenue(spark, SF_DIR).collect()
    }
    _, t1 = _time(
        lambda: q_bloom_pruned_revenue(spark, SF_DIR).write.mode("overwrite")
        .format("noop").save()
    )
    _, t100 = _time(
        lambda: q_bloom_pruned_revenue(spark, big_fact_dir)
        .write.mode("overwrite").format("noop").save()
    )
    r100 = {
        r["return_flag"]: r["n_lines"]
        for r in q_bloom_pruned_revenue(spark, big_fact_dir).collect()
    }
    assert r100 == {k: v * copies_n for k, v in r1.items()}, (r1, r100)
    print(
        f"bloom_pruned_revenue: {n_li} lines {t1:.2f}s -> "
        f"{n_li * copies_n} lines {t100:.2f}s; wall x{t100 / t1:.1f} for "
        f"x{copies_n} data; counts exactly x{copies_n}"
    )


def probe_triangle(spark, copies, copies_n):
    from retail_sales_etl_spark.operators.graph import q_triangle_count

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n_li = li.count()
    off = F.col("copy") * F.lit(1_000_000_000)
    big_li_dir = f"{STAGE}/li_graph"
    li.crossJoin(copies).select(
        (F.col("l_orderkey") + off).alias("l_orderkey"),
        (F.col("l_partkey") + off).alias("l_partkey"),
    ).write.mode("overwrite").parquet(f"{big_li_dir}/lineitem.parquet")
    tri1, t1 = _time(
        lambda: q_triangle_count(spark, SF_DIR).agg(
            F.sum("n_triangles")
        ).collect()[0][0]
    )
    tri100, t100 = _time(
        lambda: q_triangle_count(spark, big_li_dir).agg(
            F.sum("n_triangles")
        ).collect()[0][0]
    )
    assert tri100 == tri1 * copies_n, (tri1, tri100)
    print(
        f"triangle_count: {n_li} lines {t1:.2f}s (sum {tri1}) -> "
        f"{n_li * copies_n} lines {t100:.2f}s; wall x{t100 / t1:.1f} for "
        f"x{copies_n} data; output exactly x{copies_n}"
    )


def probe_setsim(spark, copies, copies_n):
    from retail_sales_etl_spark.operators.dedup import q_setsim_join

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    big_docs_dir = f"{STAGE}/docs"
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(100_000_000)).alias("doc_id"),
        F.expr("regexp_replace(text, '(^| )', concat('$1c', copy, 'x'))").alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{big_docs_dir}/documents.parquet")
    p1, t1 = _time(lambda: q_setsim_join(spark, SF_DIR).count())
    p100, t100 = _time(lambda: q_setsim_join(spark, big_docs_dir).count())
    assert p100 == p1 * copies_n, (p1, p100)
    print(
        f"setsim_join: {n_docs} docs {t1:.2f}s ({p1} pairs) -> "
        f"{n_docs * copies_n} docs {t100:.2f}s ({p100} pairs); "
        f"wall x{t100 / t1:.1f} for x{copies_n} data; pairs exactly x{copies_n}"
    )


PROBES = {
    "heavy": probe_heavy,
    "bloom": probe_bloom,
    "triangle": probe_triangle,
    "setsim": probe_setsim,
}


def main() -> None:
    copies_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    ops = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else list(PROBES)
    )
    spark = get_spark(app_name="probe-round8-100x")
    spark.sparkContext.setLogLevel("ERROR")
    copies = spark.range(copies_n).select(F.col("id").alias("copy"))
    os.makedirs(STAGE, exist_ok=True)
    for op in ops:
        PROBES[op](spark, copies, copies_n)
    shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
