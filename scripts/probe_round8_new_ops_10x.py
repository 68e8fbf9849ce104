"""10x scale-posture probe for the operators added in round 8:
ann_pq_topk, bm25_retrieval, mix_top_p_quality,
decontaminate_containment.

Same shard-disjoint growth construction as the other probes:
containment documents get copy-unique word prefixes (disjoint
vocabulary per copy, pairs stay per-copy); BM25 documents are PLAIN
id-offset copies (prefixing would leave the fixed query matching
nothing — df and N scale together instead); embeddings get key-offset vec_ids
with the ORIGINAL vectors repeated (PQ codebooks see 10x the training
points; the query's exact neighbors gain 10 identical twins, so the
re-ranked top-k must consist of copies of the base top-k ids).
mix_top_p operates per source over the same quality distribution, so
its kept token SHARE per source must be (approximately, up to the
boundary bucket) scale-invariant. No testdata writes; staging in /tmp.

Run: python scripts/probe_round8_new_ops_10x.py  (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r8_new10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def main() -> None:
    spark = get_spark(app_name="probe-round8-new-ops-10x")
    spark.sparkContext.setLogLevel("ERROR")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    os.makedirs(STAGE, exist_ok=True)
    try:
        _run(spark, copies)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


def _run(spark, copies):
    from retail_sales_etl_spark.operators.sampling import (
        MIX_TOP_P,
        q_mix_top_p_quality,
    )
    from retail_sales_etl_spark.operators.similarity import (
        TOP_K,
        q_ann_pq_topk,
    )
    from retail_sales_etl_spark.operators.text import (
        q_bm25_retrieval,
        q_decontaminate_containment,
    )

    # staged 10x documents (disjoint vocab per copy)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    docs_dir = f"{STAGE}/docs"
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(111_000_000)).alias("doc_id"),
        F.expr("regexp_replace(text, '(^| )', concat('$1c', copy, 'x'))").alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{docs_dir}/documents.parquet")

    # staged 10x embeddings (same vectors, offset ids)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_vecs = emb.count()
    emb_dir = f"{STAGE}/emb"
    emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * F.lit(100_000_000)).alias("vec_id"),
        "label",
        "embedding",
    ).write.mode("overwrite").parquet(f"{emb_dir}/embeddings.parquet")

    # ------------------------------------------------------------- bm25
    # BM25 needs the ORIGINAL vocabulary (the disjoint-vocab prefixing
    # would leave the fixed query matching nothing): plain id-offset
    # copies, so df and N scale x10 and every base match has 10 copies.
    bm25_dir = f"{STAGE}/docs_bm25"
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(111_000_000)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{bm25_dir}/documents.parquet")
    r1, t1 = _time(lambda: q_bm25_retrieval(spark, SF_DIR).collect())
    r10, t10 = _time(lambda: q_bm25_retrieval(spark, bm25_dir).collect())
    assert len(r1) == len(r10) and len(r10) > 0
    # df and N scale together, so scores are NEARLY scale-invariant
    # (only the +0.5 idf smoothing doesn't scale): the 10x top-k should
    # be mostly copies of base top-k docs at nearly the base scores
    base_scores = {r["doc_id"]: r["bm25_score"] for r in r1}
    hits = [
        r for r in r10 if (r["doc_id"] % 111_000_000) in base_scores
    ]
    assert len(hits) >= len(r10) - 2, (r1, r10)
    for r in hits:
        b = base_scores[r["doc_id"] % 111_000_000]
        assert abs(r["bm25_score"] - b) <= 0.02 * abs(b), (r, b)
    print(
        f"bm25_retrieval: {n_docs} docs {t1:.2f}s -> {n_docs * COPIES} docs "
        f"{t10:.2f}s; wall x{t10 / t1:.1f} for x{COPIES} data; top-k are "
        f"near-score-identical copies of the base top-k"
    )

    # ------------------------------------------------------ containment
    p1, t1 = _time(lambda: q_decontaminate_containment(spark, SF_DIR).count())
    p10, t10 = _time(lambda: q_decontaminate_containment(spark, docs_dir).count())
    assert p10 == p1 * COPIES, (p1, p10)  # pairs stay within copies
    print(
        f"decontaminate_containment: {n_docs} docs {t1:.2f}s ({p1} pairs) -> "
        f"{n_docs * COPIES} docs {t10:.2f}s ({p10} pairs, exactly x{COPIES}); "
        f"wall x{t10 / t1:.1f}"
    )

    # -------------------------------------------------------- mix_top_p
    def kept_share(sf):
        sel = q_mix_top_p_quality(spark, sf)
        tot = (
            spark.read.parquet(f"{sf}/documents.parquet")
            .filter(F.col("n_chars") > 0)  # mirror the operator's guard
            .select(
                "source",
                (
                    F.length("text")
                    - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                    + 1
                ).alias("t"),
            )
            .groupBy("source")
            .agg(F.sum("t").alias("t"))
        )
        kept = sel.groupBy("source").agg(F.sum("n_tokens").alias("k"))
        return {
            r["source"]: r["k"] / r["t"]
            for r in kept.join(tot, "source").collect()
        }

    s1, t1 = _time(lambda: kept_share(SF_DIR))
    s10, t10 = _time(lambda: kept_share(docs_dir))
    for src in s1:
        assert abs(s1[src] - s10[src]) < 0.05, (src, s1[src], s10[src])
        assert s10[src] >= MIX_TOP_P
    print(
        f"mix_top_p_quality: shares scale-invariant "
        f"({ {k: round(v, 3) for k, v in s10.items()} }); "
        f"{t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f} for x{COPIES})"
    )

    # ----------------------------------------------------------- ann_pq
    base_ids, t1 = _time(
        lambda: [r["vec_id"] for r in q_ann_pq_topk(spark, SF_DIR).collect()]
    )
    big_ids, t10 = _time(
        lambda: [r["vec_id"] for r in q_ann_pq_topk(spark, emb_dir).collect()]
    )
    assert len(big_ids) == len(base_ids) == TOP_K
    # The query's 9 id-offset twins carry the IDENTICAL vector: exact
    # re-rank must surface all of them, at L2 = 0, ahead of everything
    # else — the duplicates-of-the-query retrieval sanity check.
    twins = {i * 100_000_000 for i in range(1, COPIES)}
    assert set(big_ids[: COPIES - 1]) == twins, big_ids
    print(
        f"ann_pq_topk: {n_vecs} vecs {t1:.2f}s -> {n_vecs * COPIES} vecs "
        f"{t10:.2f}s; wall x{t10 / t1:.1f} for x{COPIES} data; all "
        f"{COPIES - 1} exact query twins retrieved first"
    )


if __name__ == "__main__":
    main()
