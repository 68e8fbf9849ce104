"""10x scale-posture probe for the third round-9 operator wave:
part_affinity_lift, ppr_related_parts, weekday_seasonality,
bigram_logprob, corpus_source_report, embedding_dim_stats.

Growth constructions (shard-disjoint discipline, staging in /tmp):
- affinity/ppr: order+part key-offset lineitem copies -> 10 disjoint
  graph components. Per-pair basket counts are copy-invariant while
  the basket TOTAL scales x10, so every lift must be exactly 10x its
  base value; PPR's deterministic seed (max degree, min id) lands in
  copy 0, whose component is identical to base -> identical top-20.
- weekday_seasonality: plain order replication -> each bucket x10 and
  chi-square exactly 10x (the (10c - 10e)^2/(10e) identity), peak
  bucket unchanged.
- bigram_logprob: plain doc replication -> scored rows x10 (the add-k
  smoothing shifts scores slightly with scale by design, so the probe
  asserts volume + wall, not score equality).
- corpus_source_report: copy-prefixed docs (disjoint md5 spaces) ->
  per-source n_docs and n_exact_dups exactly x10, avg_tokens equal.
- embedding_dim_stats: vec_id-offset copies of the same vectors ->
  per-dim mean/vmin/vmax IDENTICAL, n x10.

Run: python scripts/probe_round9c_10x.py [ops]
     ops: comma list of lift,ppr,season,bigram,report,dimstats
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
SF_SMALL = "/root/testdata/sf0.01"
STAGE = "/tmp/probe_r9c_10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def _lineitem_copies(spark, out_dir):
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
    big.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")


def probe_lift(spark):
    from retail_sales_etl_spark.operators.graph import q_part_affinity_lift

    d = f"{STAGE}/lift"
    _lineitem_copies(spark, d)
    base = q_part_affinity_lift(spark, SF_SMALL).collect()
    _, t1 = _time(
        lambda: q_part_affinity_lift(spark, SF_SMALL)
        .write.mode("overwrite").format("noop").save()
    )
    big = q_part_affinity_lift(spark, d).collect()
    _, t10 = _time(
        lambda: q_part_affinity_lift(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    # per-pair counts are copy-invariant, the basket total is x10 ->
    # the top lift must be exactly 10x the base top lift
    assert abs(big[0]["lift"] - COPIES * base[0]["lift"]) < 1e-3, (
        base[0]["lift"],
        big[0]["lift"],
    )
    print(
        f"part_affinity_lift: top lift {base[0]['lift']:.3f} -> "
        f"{big[0]['lift']:.3f} (exactly x{COPIES} via the basket "
        f"total); wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_ppr(spark):
    from retail_sales_etl_spark.operators.graph import q_ppr_related_parts

    d = f"{STAGE}/ppr"
    _lineitem_copies(spark, d)
    base = [
        (r["part_id"], r["ppr"])
        for r in q_ppr_related_parts(spark, SF_SMALL).collect()
    ]
    _, t1 = _time(
        lambda: q_ppr_related_parts(spark, SF_SMALL)
        .write.mode("overwrite").format("noop").save()
    )
    big = [
        (r["part_id"], r["ppr"])
        for r in q_ppr_related_parts(spark, d).collect()
    ]
    _, t10 = _time(
        lambda: q_ppr_related_parts(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    # deterministic seed lands in copy 0 == the base graph: identical
    # top-20 (PPR mass never crosses the disjoint components)
    assert big == base, (base[:3], big[:3])
    print(
        f"ppr_related_parts: top-20 IDENTICAL at x{COPIES} (seeded "
        f"mass stays in the seed's component); wall {t1:.2f}s -> "
        f"{t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_season(spark):
    from retail_sales_etl_spark.operators.profiling import (
        q_weekday_seasonality,
    )

    d = f"{STAGE}/season"
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    orders.crossJoin(copies).drop("copy").write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    base = q_weekday_seasonality(spark, SF_DIR).first()
    _, t1 = _time(
        lambda: q_weekday_seasonality(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = q_weekday_seasonality(spark, d).first()
    _, t10 = _time(
        lambda: q_weekday_seasonality(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert big["peak_idx"] == base["peak_idx"]
    assert abs(big["chi_square"] - COPIES * base["chi_square"]) < 0.01 * (
        1 + COPIES * base["chi_square"]
    )
    print(
        f"weekday_seasonality: chi2 {base['chi_square']:.3f} -> "
        f"{big['chi_square']:.3f} (x{COPIES} identity, same peak); "
        f"wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_bigram(spark):
    from retail_sales_etl_spark.operators.text import q_bigram_logprob

    d = f"{STAGE}/bigram"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(100_000_000)).alias(
            "doc_id"
        ),
        "text",
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    n_base = q_bigram_logprob(spark, SF_DIR).count()
    _, t1 = _time(
        lambda: q_bigram_logprob(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    n_big = q_bigram_logprob(spark, d).count()
    _, t10 = _time(
        lambda: q_bigram_logprob(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert n_big == COPIES * n_base, (n_base, n_big)
    print(
        f"bigram_logprob: {n_base} -> {n_big} scored docs (exactly "
        f"x{COPIES}); wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_report(spark):
    from retail_sales_etl_spark.operators.text import q_corpus_source_report

    d = f"{STAGE}/report"
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(100_000_000)).alias(
            "doc_id"
        ),
        F.expr(
            "regexp_replace(text, '(^| )', concat('$1c', copy, 'x'))"
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    base = {
        r["source"]: r for r in q_corpus_source_report(spark, SF_DIR).collect()
    }
    _, t1 = _time(
        lambda: q_corpus_source_report(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {
        r["source"]: r for r in q_corpus_source_report(spark, d).collect()
    }
    _, t10 = _time(
        lambda: q_corpus_source_report(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert set(big) == set(base)
    for s in base:
        assert big[s]["n_docs"] == COPIES * base[s]["n_docs"]
        assert big[s]["n_exact_dups"] == COPIES * base[s]["n_exact_dups"]
    print(
        f"corpus_source_report: {len(base)} sources, n_docs and "
        f"n_exact_dups exactly x{COPIES} each (disjoint md5 spaces); "
        f"wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_dimstats(spark):
    from retail_sales_etl_spark.operators.similarity import (
        q_embedding_dim_stats,
    )

    d = f"{STAGE}/dimstats"
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    emb.crossJoin(copies).select(
        (F.col("vec_id") + F.col("copy") * F.lit(10_000_000)).alias(
            "vec_id"
        ),
        "label",
        "embedding",
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    base = {
        r["dim"]: r for r in q_embedding_dim_stats(spark, SF_DIR).collect()
    }
    _, t1 = _time(
        lambda: q_embedding_dim_stats(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {
        r["dim"]: r for r in q_embedding_dim_stats(spark, d).collect()
    }
    _, t10 = _time(
        lambda: q_embedding_dim_stats(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    for k in base:
        assert big[k]["n"] == COPIES * base[k]["n"]
        assert big[k]["mean"] == base[k]["mean"], k
        assert big[k]["vmin"] == base[k]["vmin"]
        assert big[k]["vmax"] == base[k]["vmax"]
    print(
        f"embedding_dim_stats: per-dim mean/min/max IDENTICAL at "
        f"x{COPIES} replication, n x{COPIES}; wall {t1:.2f}s -> "
        f"{t10:.2f}s (x{t10 / t1:.1f})"
    )


PROBES = {
    "lift": probe_lift,
    "ppr": probe_ppr,
    "season": probe_season,
    "bigram": probe_bigram,
    "report": probe_report,
    "dimstats": probe_dimstats,
}


def main() -> None:
    which = sys.argv[1].split(",") if len(sys.argv) > 1 else list(PROBES)
    spark = get_spark(app_name="probe-round9c-10x")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(STAGE, exist_ok=True)
    try:
        for name in which:
            PROBES[name](spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
