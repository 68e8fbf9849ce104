"""10x scale-posture probe for the fourth round-9 operator wave:
hybrid_rrf_retrieval, vocab_oov_rate, shard_serpentine,
bpe_merge_rounds, source_minhash_jaccard.

Growth constructions (doc_id-offset replication, staging in /tmp):
- vocab_oov_rate: plain doc replication keeps the head vocabulary
  IDENTICAL (every count x10, ranks unchanged) -> per-source n_tokens
  x10 and oov_rate exactly equal to base.
- bpe_merge_rounds: word counts x10 -> the same merge rules with
  pair_count exactly x10 (BPE is scale-invariant on relative counts).
- source_minhash_jaccard: same per-source shingle SETS -> the sketch
  and the whole pair matrix IDENTICAL.
- shard_serpentine: balance properties must hold at x10 (counts
  within 1, char totals within one max-doc) and the char grand total
  is exactly x10.
- hybrid_rrf_retrieval: constant-k output (10 rows) regardless of
  corpus size; wall tracks the linear members (BM25 term scan + exact
  ANN scan).

Run: python scripts/probe_round9d_10x.py
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
STAGE = "/tmp/probe_r9d_10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def _stage_docs(spark, out_dir):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(10_000_000)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def _stage_embeddings(spark, out_dir):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias("vec_id"),
        "embedding",
        "label",
    )
    # copy 0 keeps the original ids, so the query vector (vec_id=0)
    # still exists and the exact top-k is well-defined.
    big.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def probe_oov(spark):
    from retail_sales_etl_spark.operators.text import q_vocab_oov_rate

    d = f"{STAGE}/oov"
    _stage_docs(spark, d)
    base = {r["source"]: r for r in q_vocab_oov_rate(spark, SF_DIR).collect()}
    _, t1 = _time(
        lambda: q_vocab_oov_rate(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {r["source"]: r for r in q_vocab_oov_rate(spark, d).collect()}
    _, t10 = _time(
        lambda: q_vocab_oov_rate(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert set(big) == set(base)
    for s, rb in base.items():
        rg = big[s]
        assert rg["n_tokens"] == COPIES * rb["n_tokens"], s
        assert rg["n_oov"] == COPIES * rb["n_oov"], s
        assert rg["oov_rate"] == rb["oov_rate"], s
    print(
        f"vocab_oov_rate: rates IDENTICAL, tokens x{COPIES} exact; "
        f"wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_bpe(spark):
    from retail_sales_etl_spark.operators.text import q_bpe_merge_rounds

    d = f"{STAGE}/bpe"
    _stage_docs(spark, d)
    base = sorted(
        q_bpe_merge_rounds(spark, SF_DIR).collect(), key=lambda r: r["round"]
    )
    _, t1 = _time(
        lambda: q_bpe_merge_rounds(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = sorted(
        q_bpe_merge_rounds(spark, d).collect(), key=lambda r: r["round"]
    )
    _, t10 = _time(
        lambda: q_bpe_merge_rounds(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert [(r["w1"], r["w2"]) for r in big] == [
        (r["w1"], r["w2"]) for r in base
    ]
    assert [r["pair_count"] for r in big] == [
        COPIES * r["pair_count"] for r in base
    ]
    print(
        f"bpe_merge_rounds: rules IDENTICAL, counts x{COPIES} exact; "
        f"wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_srcjac(spark):
    from retail_sales_etl_spark.operators.dedup import (
        q_source_minhash_jaccard,
    )

    d = f"{STAGE}/srcjac"
    _stage_docs(spark, d)
    key = lambda r: (r["source_a"], r["source_b"])  # noqa: E731
    base = {key(r): r for r in q_source_minhash_jaccard(spark, SF_DIR).collect()}
    _, t1 = _time(
        lambda: q_source_minhash_jaccard(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {key(r): r for r in q_source_minhash_jaccard(spark, d).collect()}
    _, t10 = _time(
        lambda: q_source_minhash_jaccard(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert big.keys() == base.keys()
    for k, rb in base.items():
        assert big[k]["jaccard_est"] == rb["jaccard_est"], k
    print(
        f"source_minhash_jaccard: pair matrix IDENTICAL at x{COPIES}; "
        f"wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_shard(spark):
    from retail_sales_etl_spark.operators.sampling import (
        N_SHARDS,
        q_shard_serpentine,
    )

    d = f"{STAGE}/shard"
    _stage_docs(spark, d)
    base = q_shard_serpentine(spark, SF_DIR).collect()
    _, t1 = _time(
        lambda: q_shard_serpentine(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = q_shard_serpentine(spark, d).collect()
    _, t10 = _time(
        lambda: q_shard_serpentine(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert len(big) == N_SHARDS
    counts = [r["n_docs"] for r in big]
    totals = [r["total_chars"] for r in big]
    max_len = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .agg(F.max("n_chars"))
        .first()[0]
    )
    assert max(counts) - min(counts) <= 1
    assert max(totals) - min(totals) <= max_len
    assert sum(totals) == COPIES * sum(r["total_chars"] for r in base)
    print(
        f"shard_serpentine: balanced at x{COPIES} (count spread "
        f"{max(counts) - min(counts)}, char spread "
        f"{max(totals) - min(totals)} <= {max_len}); "
        f"wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_rrf(spark):
    from retail_sales_etl_spark.operators.similarity import (
        RRF_TOP,
        q_hybrid_rrf_retrieval,
    )

    d = f"{STAGE}/rrf"
    _stage_docs(spark, d)
    _stage_embeddings(spark, d)
    _, t1 = _time(
        lambda: q_hybrid_rrf_retrieval(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = q_hybrid_rrf_retrieval(spark, d).collect()
    _, t10 = _time(
        lambda: q_hybrid_rrf_retrieval(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert len(big) == RRF_TOP
    print(
        f"hybrid_rrf_retrieval: constant {RRF_TOP}-row output at "
        f"x{COPIES}; wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def main():
    spark = get_spark()
    os.makedirs(STAGE, exist_ok=True)
    try:
        probe_oov(spark)
        probe_bpe(spark)
        probe_srcjac(spark)
        probe_shard(spark)
        probe_rrf(spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
