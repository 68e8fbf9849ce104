"""10x scale-posture probe for the sixth round-9 operator wave:
events_pattern_match, embedding_whiten_qc, streaming_source_sketch.

Growth constructions:
- events_pattern_match: user_id-offset event copies -> every user's
  symbol string is identical per copy, so n_users and every n_matched
  are exactly x10 and every match_rate identical.
- embedding_whiten_qc: vec_id-offset copies -> the per-dim stats are
  shared by all clones, so the 10 clones of each vector must carry
  IDENTICAL z stats (copy symmetry — exact even though the sample-std
  denominator shifts the absolute z's vs base); row count x10.
- streaming_source_sketch: the 4-batch replay at sf0.1 (10x the gate
  corpus) must still equal the batch per-source sketch exactly
  (min-merge is size-independent), wall dominated by micro-batch
  fixed costs.

Run: python scripts/probe_round9f_10x.py
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
STAGE = "/tmp/probe_r9f_10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def probe_pattern(spark):
    from retail_sales_etl_spark.operators.events import (
        q_events_pattern_match,
    )

    d = f"{STAGE}/pattern"
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
    big.write.mode("overwrite").parquet(f"{d}/events.parquet")
    base = {r["pattern"]: r for r in q_events_pattern_match(spark, SF_DIR).collect()}
    _, t1 = _time(
        lambda: q_events_pattern_match(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    bigr = {r["pattern"]: r for r in q_events_pattern_match(spark, d).collect()}
    _, t10 = _time(
        lambda: q_events_pattern_match(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    for p, rb in base.items():
        rg = bigr[p]
        assert rg["n_users"] == COPIES * rb["n_users"], p
        assert rg["n_matched"] == COPIES * rb["n_matched"], p
        assert rg["match_rate"] == rb["match_rate"], p
    print(
        f"events_pattern_match: counts x{COPIES} exact, rates IDENTICAL; "
        f"wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_whiten(spark):
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_whiten_qc,
    )

    d = f"{STAGE}/whiten"
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_base = emb.count()
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias("vec_id"),
        "embedding",
        "label",
    )
    big.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    _, t1 = _time(
        lambda: q_embedding_whiten_qc(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    bigr = q_embedding_whiten_qc(spark, d).collect()
    _, t10 = _time(
        lambda: q_embedding_whiten_qc(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert len(bigr) == COPIES * n_base
    by_orig = Counter()
    sig = {}
    for r in bigr:
        orig = r["vec_id"] % 10_000_000
        key = (r["z_norm"], r["max_abs_z"], r["n_outlier_dims"])
        if orig in sig:
            assert sig[orig] == key, orig  # clone symmetry: exact
        else:
            sig[orig] = key
        by_orig[orig] += 1
    assert all(v == COPIES for v in by_orig.values())
    print(
        f"embedding_whiten_qc: {COPIES} clones per vector IDENTICAL "
        f"(shared stats), rows x{COPIES}; wall {t1:.2f}s -> {t10:.2f}s "
        f"(x{t10 / t1:.1f})"
    )


def probe_stream_sketch(spark):
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.dedup import (
        N_MINHASH,
        _mh_expr_sql,
        _shingles,
    )
    from retail_sales_etl_spark.streaming.events import (
        q_streaming_source_sketch,
    )

    docs = load_table(spark, SF_DIR, "documents")
    sh = _shingles(docs).join(docs.select("doc_id", "source"), "doc_id")
    aggs = [F.expr(f"{_mh_expr_sql(s)} AS mh{s}") for s in range(N_MINHASH)]
    batch = {
        r["source"]: tuple(r[f"mh{j}"] for j in range(N_MINHASH))
        for r in sh.groupBy("source").agg(*aggs).collect()
    }
    got, t = _time(lambda: q_streaming_source_sketch(spark, SF_DIR).collect())
    streamed = {
        r["source"]: tuple(r[f"mh{j}"] for j in range(N_MINHASH)) for r in got
    }
    assert streamed == batch
    print(
        f"streaming_source_sketch: maintained sketch == batch recompute "
        f"at sf0.1 (10x the gate corpus), 4-batch replay {t:.1f}s"
    )


def main():
    spark = get_spark()
    os.makedirs(STAGE, exist_ok=True)
    try:
        probe_pattern(spark)
        probe_whiten(spark)
        probe_stream_sketch(spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
