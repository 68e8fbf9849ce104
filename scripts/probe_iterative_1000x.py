"""1000x posture probe for the ITERATIVE operators (connected
components, PageRank).

The batch probes (SURVEY §6 10x/100x) cover the one-pass plans; the
iterative ops have a different failure mode — per-round cost times
round COUNT, where round count depends on graph shape, not size. This
probe scales both axes independently:

1. volume: LSH-cluster-shaped graphs (many small near-clique
   components — the dedup workload) at ~30M edges, ~1000x the sf0.1
   co-purchase edge count, synthesized with spark.range (no testdata
   writes);
2. shape: a long-path graph whose diameter EXCEEDS the iteration
   budget, proving the convergence guard raises instead of silently
   under-merging (operators/graph.py).

Run: python scripts/probe_iterative_1000x.py  (results -> SURVEY §6)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from retail_sales_etl_spark.operators import graph  # noqa: E402
from retail_sales_etl_spark.session import get_spark  # noqa: E402


def clustered_graph(spark, n_components: int, comp_size: int):
    """Near-clique components (ring + chord per node): the shape of an
    LSH dedup pair graph — diameter stays small, volume is the axis."""
    n = n_components * comp_size
    nodes = spark.range(n).select(F.col("id").alias("node_id"))
    base = spark.range(n).select(
        (F.col("id") - F.col("id") % comp_size).alias("comp0"),
        (F.col("id") % comp_size).alias("i"),
    )
    ring = base.select(
        (F.col("comp0") + F.col("i")).alias("a"),
        (F.col("comp0") + (F.col("i") + 1) % comp_size).alias("b"),
    )
    chord = base.select(
        (F.col("comp0") + F.col("i")).alias("a"),
        (F.col("comp0") + (F.col("i") * 7 + 3) % comp_size).alias("b"),
    ).filter(F.col("a") != F.col("b"))
    return nodes, ring.unionAll(chord)


def main() -> None:
    spark = get_spark(app_name="probe-iterative-1000x")
    spark.sparkContext.setLogLevel("ERROR")

    # --- volume axis: 3M nodes / ~6M undirected edge rows (x2 sym) ---
    for n_comp, size in ((300_000, 10), (30_000, 100)):
        nodes, edges = clustered_graph(spark, n_comp, size)
        n_edges = edges.count()
        t0 = time.time()
        labels = graph.connected_components(nodes, edges, max_iterations=25)
        n_labels = labels.select("component_id").distinct().count()
        dt = time.time() - t0
        assert n_labels == n_comp, (n_labels, n_comp)
        print(
            f"connected_components comps={n_comp} size={size} "
            f"edges={n_edges} wall={dt:.1f}s components_ok=True"
        )

    # --- PageRank on the clustered graph (fixed 10 iterations) ---
    nodes, edges = clustered_graph(spark, 100_000, 10)
    ed = edges.select(
        F.col("a").alias("a_part"), F.col("b").alias("b_part")
    ).withColumn("n_orders", F.lit(1))
    t0 = time.time()
    ranks = graph.pagerank(ed, n_iterations=10)
    total = ranks.agg(F.sum("rank_scaled")).first()[0]
    dt = time.time() - t0
    print(f"pagerank nodes=1M edges={ed.count()} iters=10 wall={dt:.1f}s "
          f"mass={total:.1f}")

    # --- shape axis: diameter > budget must RAISE, not truncate ---
    n = 2_000
    nodes = spark.range(n).select(F.col("id").alias("node_id"))
    chain = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    try:
        graph.connected_components(nodes, chain, max_iterations=10)
        print("convergence_guard=FAILED (no raise)")
    except RuntimeError as exc:
        print(f"convergence_guard=ok ({exc})")

    spark.stop()


if __name__ == "__main__":
    main()
