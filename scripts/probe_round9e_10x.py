"""10x scale-posture probe for the fifth round-9 operator wave:
label_prop_communities, ann_ivf_pq_topk.

Growth constructions (shard-disjoint discipline, staging in /tmp):
- label_prop_communities: order+part key-offset lineitem copies -> 10
  disjoint graph components; labels cannot cross disjoint components,
  so the per-community (n_nodes, internal_edges, degree_sum) multiset
  must be exactly 10 copies of the base multiset (modularity terms
  shift because m grows x10 — recomputed from the invariant counts).
- ann_ivf_pq_topk: vec_id-offset embedding copies with copy 0 intact:
  duplicated points leave every label-mean centroid AND every Lloyd
  codebook centroid unchanged, the PQ init (K lowest vec_ids) stays
  copy-0's, and distance ties between clones resolve to the lowest
  vec_id — so the top-k must be IDENTICAL to base.

dedup_recall_report is not probed separately: it is an eval
composition of members (dedup_ngram_jaccard, dedup_minhash_lsh,
setsim_join) that each carry their own scale probes.

Run: python scripts/probe_round9e_10x.py
Results -> SURVEY §6.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retail_sales_etl_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.01"
SF_DIR = "/root/testdata/sf0.1"
STAGE = "/tmp/probe_r9e_10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def probe_lpa(spark):
    from retail_sales_etl_spark.operators.graph import (
        q_label_prop_communities,
    )

    d = f"{STAGE}/lpa"
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = li.crossJoin(copies).select(
        (F.col("l_orderkey") + F.col("copy") * F.lit(1_000_000_000)).alias(
            "l_orderkey"
        ),
        (F.col("l_partkey") + F.col("copy") * F.lit(100_000_000)).alias(
            "l_partkey"
        ),
        *[c for c in li.columns if c not in ("l_orderkey", "l_partkey")],
    )
    big.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    base = q_label_prop_communities(spark, SF_SMALL).collect()
    _, t1 = _time(
        lambda: q_label_prop_communities(spark, SF_SMALL)
        .write.mode("overwrite").format("noop").save()
    )
    bigr = q_label_prop_communities(spark, d).collect()
    _, t10 = _time(
        lambda: q_label_prop_communities(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    key = lambda r: (r["n_nodes"], r["internal_edges"], r["degree_sum"])  # noqa: E731
    base_ms = Counter(key(r) for r in base)
    big_ms = Counter(key(r) for r in bigr)
    assert big_ms == Counter(
        {k: COPIES * v for k, v in base_ms.items()}
    ), (len(base), len(bigr))
    print(
        f"label_prop_communities: community multiset exactly x{COPIES} "
        f"({len(base)} -> {len(bigr)} communities); wall {t1:.2f}s -> "
        f"{t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_ivfpq(spark):
    from retail_sales_etl_spark.operators.similarity import (
        q_ann_ivf_pq_topk,
    )

    d = f"{STAGE}/ivfpq"
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias("vec_id"),
        "embedding",
        "label",
    )
    big.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")

    base = [(r["vec_id"], r["l2_dist"]) for r in q_ann_ivf_pq_topk(spark, SF_DIR).collect()]
    _, t1 = _time(
        lambda: q_ann_ivf_pq_topk(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    bigr = [(r["vec_id"], r["l2_dist"]) for r in q_ann_ivf_pq_topk(spark, d).collect()]
    _, t10 = _time(
        lambda: q_ann_ivf_pq_topk(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    # The query vector's own clones are genuine distance-0 neighbors:
    # the x10 result must be [the 9 query clones at l2=0.0, ascending
    # id] followed by the base ranking's prefix — centroids unmoved,
    # clone ties resolved by lowest id.
    clones = [(k * 10_000_000, 0.0) for k in range(1, COPIES)]
    expected = clones + base[: len(base) - len(clones)]
    assert bigr == expected, (expected, bigr)
    print(
        f"ann_ivf_pq_topk: x{COPIES} result == 9 query clones at l2=0 "
        f"+ the base prefix, as predicted (centroids unmoved); wall "
        f"{t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def main():
    spark = get_spark()
    os.makedirs(STAGE, exist_ok=True)
    try:
        probe_lpa(spark)
        probe_ivfpq(spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
