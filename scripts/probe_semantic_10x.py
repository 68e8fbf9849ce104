"""10x scale-posture probe for the round-5 embedding operators:
kmeans_centroids (iterative Lloyd) and dedup_semantic (SemDeDup-style).

Builds a 20k-vector corpus as a key-offset union of the sf0.1
embeddings (x10, vec_ids offset so they stay unique — no testdata
writes), then measures:

- kmeans: wall time for the fixed-round Lloyd plan at 10x, and that
  every round stays one broadcast + one (cell, dim) shuffle (cost
  linear in vectors; round count fixed by construction).
- dedup_semantic: wall time and that the pair space stays per-cell
  (the kernel never sees cross-cell pairs; block sizes printed so the
  max in-memory matrix is visible).

Run: python scripts/probe_semantic_10x.py
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


def main() -> None:
    spark = get_spark(app_name="probe-semantic-10x")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_base = base.count()
    offs = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = (
        base.crossJoin(offs)
        .select(
            (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias("vec_id"),
            "label",
            "embedding",
        )
    )
    path = "/tmp/probe_semantic_10x_embeddings.parquet"
    big.write.mode("overwrite").parquet(path)
    n_big = spark.read.parquet(path).count()
    print(f"base={n_base} vectors, 10x={n_big}")

    sf_dir = "/tmp/probe_semantic_10x"
    os.makedirs(sf_dir, exist_ok=True)
    if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
        os.symlink(path, f"{sf_dir}/embeddings.parquet")

    from retail_sales_etl_spark.operators.dedup import q_dedup_semantic
    from retail_sales_etl_spark.operators.similarity import q_kmeans_centroids

    t0 = time.perf_counter()
    km = q_kmeans_centroids(spark, sf_dir)
    km.write.mode("overwrite").format("noop").save()
    t_km = time.perf_counter() - t0
    n_cells = km.select("cell").distinct().count()
    print(f"kmeans_centroids 10x: {t_km:.1f}s, {n_cells} live cells")

    t0 = time.perf_counter()
    sem = q_dedup_semantic(spark, sf_dir)
    sem.write.mode("overwrite").format("noop").save()
    t_sem = time.perf_counter() - t0
    stats = (
        sem.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("is_semantic_dup").cast("int")).alias("dups"))
        .collect()
    )
    max_block = max(r.n for r in stats)
    total_dups = sum(r.dups for r in stats)
    print(
        f"dedup_semantic 10x: {t_sem:.1f}s, max cell block {max_block} vectors "
        f"(pairwise matrix {max_block}^2 ~ {max_block * max_block / 1e6:.0f}M floats), "
        f"{total_dups} dups flagged"
    )
    spark.stop()


if __name__ == "__main__":
    main()
