"""10x scale-posture probe for the tenth round-9 operator wave:
link_prediction_jaccard, events_ab_test.

Growth constructions:
- link_prediction_jaccard: order+part key-offset lineitem copies ->
  10 disjoint graph components with identical structure; every
  candidate's n_common/jaccard is copy-invariant, so the top-k SCORE
  multiset is the base top-k repeated (ties across copies resolve by
  part id -> copy 0's pairs win the deterministic order, and the
  base top-k pairs must all appear).
- events_ab_test: event replication with user offset -> each user
  clone lands in a hash-arm independently (new user_ids reshuffle
  arms), so identity is on the ARM ASSIGNMENT LAW, not the split:
  instead replicate with UNCHANGED user_ids (event_id offset only) ->
  per-arm counts x10, means/variances IDENTICAL, so t scales by
  sqrt(10) within rounding.

Run: python scripts/probe_round9j_10x.py
Results -> SURVEY §6.
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from retail_sales_etl_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.01"
SF_DIR = "/root/testdata/sf0.1"
STAGE = "/tmp/probe_r9j_10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def probe_linkpred(spark):
    from retail_sales_etl_spark.operators.graph import (
        q_link_prediction_jaccard,
    )

    d = f"{STAGE}/linkpred"
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
    base = q_link_prediction_jaccard(spark, SF_SMALL).collect()
    _, t1 = _time(
        lambda: q_link_prediction_jaccard(spark, SF_SMALL)
        .write.mode("overwrite").format("noop").save()
    )
    bigr = q_link_prediction_jaccard(spark, d).collect()
    _, t10 = _time(
        lambda: q_link_prediction_jaccard(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    base_pairs = {(r["a_part"], r["b_part"]): r["jaccard"] for r in base}
    big_pairs = {(r["a_part"], r["b_part"]): r["jaccard"] for r in bigr}
    # copy 0 keeps original ids and wins every cross-copy score tie
    kth = min(base_pairs.values())
    for pair, j in base_pairs.items():
        if j > kth:  # strictly above the boundary must survive the cut
            assert big_pairs.get(pair) == j, pair
    print(
        f"link_prediction_jaccard: above-boundary predictions and "
        f"scores IDENTICAL at x{COPIES} (disjoint components); wall "
        f"{t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_abtest(spark):
    from retail_sales_etl_spark.operators.events import q_events_ab_test

    d = f"{STAGE}/ab"
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * F.lit(10_000_000)).alias(
            "event_id"
        ),
        "ts",
        "user_id",  # UNCHANGED: clones stay in their user's arm
        "event_type",
        "value",
        "props",
    )
    big.write.mode("overwrite").parquet(f"{d}/events.parquet")
    base = {r["event_type"]: r for r in q_events_ab_test(spark, SF_DIR).collect()}
    _, t1 = _time(
        lambda: q_events_ab_test(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    bigr = {r["event_type"]: r for r in q_events_ab_test(spark, d).collect()}
    _, t10 = _time(
        lambda: q_events_ab_test(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    for t, rb in base.items():
        rg = bigr[t]
        assert rg["n_a"] == COPIES * rb["n_a"], t
        assert rg["n_b"] == COPIES * rb["n_b"], t
        assert rg["mean_a"] == rb["mean_a"], t
        assert rg["mean_b"] == rb["mean_b"], t
        # variance shrinks by (10n-10)/(10n-1) vs base; t ~ sqrt(10)*t
        assert abs(rg["t_stat"]) >= abs(rb["t_stat"]) * math.sqrt(
            COPIES
        ) * 0.99, t
    print(
        f"events_ab_test: arms x{COPIES} with means IDENTICAL, t "
        f"scales ~sqrt({COPIES}) as predicted; wall {t1:.2f}s -> "
        f"{t10:.2f}s (x{t10 / t1:.1f})"
    )


def main():
    spark = get_spark()
    os.makedirs(STAGE, exist_ok=True)
    try:
        probe_linkpred(spark)
        probe_abtest(spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
