"""10x scale-posture probe for the second round-9 operator wave:
dedup_spans, pmi_bigrams, events_ewma, attribution_time_decay,
kcore_parts, streaming_dedup_lsh.

Growth construction per operator (same shard-disjoint discipline as
the earlier probes — no testdata writes, staging in /tmp):

- dedup_spans / streaming_dedup_lsh: documents copies get copy-unique
  word prefixes (disjoint vocabulary per copy), so duplicated spans /
  LSH near-dup pairs stay per-copy — dropped-token and dup-doc counts
  must be EXACTLY x10.
- pmi_bigrams: PLAIN id-offset copies (same text) — every count scales
  x10 but every probability is unchanged, so the top-50 PMI list must
  be IDENTICAL to base (asserted).
- events_ewma: plain event replication — daily counts x10, so each
  day's EWMA must be exactly 10x the base EWMA (asserted on the grid).
- attribution_time_decay: user-offset copies — disjoint users, so the
  per-user attribution rows must be exactly x10 with base-equal values.
- kcore_parts: order+part key-offset lineitem copies — 10 disjoint
  graph components, core membership exactly x10 (base sf0.01: the
  sf0.1 co-purchase 3-core is empty, which is itself a valid answer
  but probes nothing).

Run: python scripts/probe_round9b_10x.py [ops]
     ops: comma list of spans,pmi,ewma,attr,kcore,lshsink (default all)
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
STAGE = "/tmp/probe_r9b_10x"
COPIES = 10


def _time(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def _docs_prefixed(spark, out_dir):
    """Copy-unique word prefixes -> disjoint vocabulary per copy."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(100_000_000)).alias("doc_id"),
        F.expr(
            "regexp_replace(text, '(^| )', concat('$1c', copy, 'x'))"
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    return out_dir


def _docs_plain(spark, out_dir):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(100_000_000)).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    big.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    return out_dir


def _events_copies(spark, out_dir, offset_users: bool):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * F.lit(1_000_000_000)).alias(
            "event_id"
        ),
        "ts",
        (
            F.col("user_id")
            + (F.col("copy") * F.lit(10_000_000) if offset_users else F.lit(0))
        ).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    big.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    return out_dir


def probe_spans(spark):
    from retail_sales_etl_spark.operators.text import q_dedup_spans

    d = f"{STAGE}/spans"
    _docs_prefixed(spark, d)
    base = q_dedup_spans(spark, SF_DIR).agg(
        F.sum(F.col("n_tokens") - F.col("n_kept"))
    ).first()[0]
    _, t1 = _time(
        lambda: q_dedup_spans(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = q_dedup_spans(spark, d).agg(
        F.sum(F.col("n_tokens") - F.col("n_kept"))
    ).first()[0]
    _, t10 = _time(
        lambda: q_dedup_spans(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert big == COPIES * base, (base, big)
    print(
        f"dedup_spans: dropped {base} -> {big} (exactly x{COPIES}); "
        f"wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_pmi(spark):
    from retail_sales_etl_spark.operators.text import q_pmi_bigrams

    d = f"{STAGE}/pmi"
    _docs_plain(spark, d)
    base = {
        (r.w1, r.w2, r.pmi) for r in q_pmi_bigrams(spark, SF_DIR).collect()
    }
    _, t1 = _time(
        lambda: q_pmi_bigrams(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {(r.w1, r.w2, r.pmi) for r in q_pmi_bigrams(spark, d).collect()}
    _, t10 = _time(
        lambda: q_pmi_bigrams(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert {(a, b) for a, b, _ in big} == {(a, b) for a, b, _ in base}
    print(
        f"pmi_bigrams: top-50 pair set IDENTICAL at x{COPIES} "
        f"(probabilities scale-invariant); wall {t1:.2f}s -> {t10:.2f}s "
        f"(x{t10 / t1:.1f})"
    )


def probe_ewma(spark):
    from retail_sales_etl_spark.operators.events import q_events_ewma

    d = f"{STAGE}/ewma"
    _events_copies(spark, d, offset_users=False)
    base = {
        (r.event_type, r.day): r.ewma
        for r in q_events_ewma(spark, SF_DIR).collect()
    }
    _, t1 = _time(
        lambda: q_events_ewma(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = {
        (r.event_type, r.day): r.ewma
        for r in q_events_ewma(spark, d).collect()
    }
    _, t10 = _time(
        lambda: q_events_ewma(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert set(big) == set(base)
    drift = max(
        abs(big[k] - COPIES * base[k]) for k in base
    )
    assert drift < 1e-3, drift
    print(
        f"events_ewma: {len(base)} (type, day) rows, 10x counts -> "
        f"exactly 10x EWMA (max drift {drift:.1e}); wall {t1:.2f}s -> "
        f"{t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_attr(spark):
    from retail_sales_etl_spark.operators.events import (
        q_attribution_time_decay,
    )

    d = f"{STAGE}/attr"
    _events_copies(spark, d, offset_users=True)
    base = q_attribution_time_decay(spark, SF_DIR)
    n_base = base.count()
    _, t1 = _time(
        lambda: q_attribution_time_decay(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = q_attribution_time_decay(spark, d)
    n_big = big.count()
    _, t10 = _time(
        lambda: q_attribution_time_decay(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    tot_base = base.agg(F.sum("attributed_value")).first()[0]
    tot_big = big.agg(F.sum("attributed_value")).first()[0]
    assert n_big == COPIES * n_base, (n_base, n_big)
    assert abs(tot_big - COPIES * tot_base) < 1e-3, (tot_base, tot_big)
    print(
        f"attribution_time_decay: {n_base} -> {n_big} users (exactly "
        f"x{COPIES}), totals x{COPIES} exact; wall {t1:.2f}s -> "
        f"{t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_kcore(spark):
    from retail_sales_etl_spark.operators.graph import q_kcore_parts

    d = f"{STAGE}/kcore"
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = li.crossJoin(copies).select(
        (F.col("l_orderkey") + F.col("copy") * F.lit(1_000_000_000)).alias(
            "l_orderkey"
        ),
        (F.col("l_partkey") + F.col("copy") * F.lit(100_000_000)).alias(
            "l_partkey"
        ),
        *[
            c
            for c in li.columns
            if c not in ("l_orderkey", "l_partkey")
        ],
    )
    big.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    n_base = q_kcore_parts(spark, SF_SMALL).count()
    _, t1 = _time(
        lambda: q_kcore_parts(spark, SF_SMALL)
        .write.mode("overwrite").format("noop").save()
    )
    n_big = q_kcore_parts(spark, d).count()
    _, t10 = _time(
        lambda: q_kcore_parts(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert n_big == COPIES * n_base, (n_base, n_big)
    print(
        f"kcore_parts: core {n_base} -> {n_big} nodes (exactly "
        f"x{COPIES}, 10 disjoint components peel independently); "
        f"wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


def probe_lshsink(spark):
    from retail_sales_etl_spark.streaming.events import q_streaming_dedup_lsh

    d = f"{STAGE}/lsh"
    _docs_prefixed(spark, d)
    base_dups = (
        q_streaming_dedup_lsh(spark, SF_DIR)
        .filter("is_dup").count()
    )
    _, t1 = _time(
        lambda: q_streaming_dedup_lsh(spark, SF_DIR)
        .write.mode("overwrite").format("noop").save()
    )
    big = q_streaming_dedup_lsh(spark, d).filter("is_dup").cache()
    big_dups = big.count()
    # The scale-critical property: the pair space stays per-shard. A
    # dup's nearest partner must live in the SAME copy — zero cross-
    # copy band collisions (the per-copy dup counts themselves drift
    # a few docs because re-prefixed shingles re-roll every borderline
    # LSH collision; that is hash noise, not pair-space growth).
    cross = big.filter(
        (F.col("dup_of") / 100_000_000).cast("long")
        != (F.col("doc_id") / 100_000_000).cast("long")
    ).count()
    big.unpersist()
    _, t10 = _time(
        lambda: q_streaming_dedup_lsh(spark, d)
        .write.mode("overwrite").format("noop").save()
    )
    assert cross == 0, cross
    assert abs(big_dups - COPIES * base_dups) <= 0.01 * COPIES * base_dups
    print(
        f"streaming_dedup_lsh: dup docs {base_dups} -> {big_dups} "
        f"(~x{COPIES}, hash-noise bounded, ZERO cross-copy partners); "
        f"4-batch replay wall {t1:.2f}s -> {t10:.2f}s (x{t10 / t1:.1f})"
    )


PROBES = {
    "spans": probe_spans,
    "pmi": probe_pmi,
    "ewma": probe_ewma,
    "attr": probe_attr,
    "kcore": probe_kcore,
    "lshsink": probe_lshsink,
}


def main() -> None:
    which = (
        sys.argv[1].split(",") if len(sys.argv) > 1 else list(PROBES)
    )
    spark = get_spark(app_name="probe-round9b-10x")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(STAGE, exist_ok=True)
    try:
        for name in which:
            PROBES[name](spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
