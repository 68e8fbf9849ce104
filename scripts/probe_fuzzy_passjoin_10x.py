"""Round-11 probe: the PassJoin segment filter inside
q_fuzzy_prefix_match.

1. Candidate volume at sf0.1 base: the segment filter's distinct
   candidate pairs vs the naive blocked pair space (sum over blocks of
   n*(n-1)/2) and vs the true output — candidates must sit orders of
   magnitude under the naive space and track the true pairs.
2. 10x growth under per-copy alphabet-rotation cipher (block
   cardinality grows with the corpus, the docstring's stated
   assumption): output pairs exactly x10 (each copy reproduces the
   base pair set in its own id space), wall ~linear.

Run: python scripts/probe_fuzzy_passjoin_10x.py  (results -> SURVEY §6)
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
STAGE = "/tmp/probe_fuzzy_10x"
COPIES = 10
ALPHA = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-fuzzy-passjoin")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import TABLES, load_table
    from retail_sales_etl_spark.operators.text import (
        FUZZY_BLOCK_LEN,
        FUZZY_MAX_DIST,
        FUZZY_PREFIX_LEN,
        _fuzzy_segments,
        q_fuzzy_prefix_match,
    )

    docs = load_table(spark, SF_DIR, "documents")
    canonical = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    pref = docs.select(
        "doc_id",
        F.substring(canonical, 1, FUZZY_PREFIX_LEN).alias("prefix"),
        F.substring(canonical, 1, FUZZY_BLOCK_LEN).alias("block"),
    )
    naive_pairs = (
        pref.groupBy("block")
        .count()
        .selectExpr("sum(count * (count - 1) / 2) AS p")
        .first()["p"]
    )

    # re-derive the candidate set exactly as the operator does
    segs = _fuzzy_segments()
    seg_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), F.lit(s).alias("s"), F.lit(l).alias("l")
            )
            for i, s, l in segs
        ]
    )
    index = pref.select(
        "doc_id", "block", "prefix", F.explode(seg_arr).alias("g")
    ).select(
        F.col("doc_id").alias("i_id"),
        "block",
        F.col("g.i").alias("i"),
        F.expr("substring(prefix, g.s, g.l)").alias("seg"),
    )
    from retail_sales_etl_spark.operators.text import _fuzzy_windows

    windows = _fuzzy_windows()
    win_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"), F.lit(q).alias("q"), F.lit(l).alias("l")
            )
            for i, q, l in windows
        ]
    )
    probe = pref.select(
        "doc_id", "block", "prefix", F.explode(win_arr).alias("g")
    ).select(
        F.col("doc_id").alias("p_id"),
        "block",
        F.col("g.i").alias("i"),
        F.expr("substring(prefix, g.q, g.l)").alias("seg"),
    )
    n_cand = (
        probe.join(index, ["block", "i", "seg"])
        .filter(F.col("p_id") != F.col("i_id"))
        .select(
            F.least("p_id", "i_id").alias("a"),
            F.greatest("p_id", "i_id").alias("b"),
        )
        .distinct()
        .count()
    )

    t0 = time.perf_counter()
    base_rows = q_fuzzy_prefix_match(spark, SF_DIR).collect()
    t1 = time.perf_counter() - t0
    print(
        f"fuzzy_prefix_match @ sf0.1: naive blocked pair space "
        f"{int(naive_pairs)}, PassJoin candidates {n_cand} "
        f"(x{naive_pairs / max(n_cand, 1):.0f} reduction), true pairs "
        f"{len(base_rows)}, wall {t1:.1f}s"
    )

    # 10x cipher copies: block cardinality grows with the corpus
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    ciphered = None
    for c in range(COPIES):
        rot = ALPHA[c:] + ALPHA[:c]
        drot = DIGITS[c % 10 :] + DIGITS[: c % 10]
        part = docs.select(
            (F.col("doc_id") + F.lit(c * 10**9)).alias("doc_id"),
            F.translate(F.translate("text", ALPHA, rot), DIGITS, drot).alias(
                "text"
            ),
            "lang",
            "source",
            "n_chars",
        )
        ciphered = part if ciphered is None else ciphered.unionAll(part)
    d10 = os.path.join(STAGE, "cipher10")
    os.makedirs(d10, exist_ok=True)
    ciphered.write.mode("overwrite").parquet(f"{d10}/documents.parquet")
    for t in TABLES:
        link = f"{d10}/{t}.parquet"
        if t != "documents" and not os.path.exists(link):
            os.symlink(f"{SF_DIR}/{t}.parquet", link)

    t0 = time.perf_counter()
    rows10 = q_fuzzy_prefix_match(spark, d10).collect()
    t10 = time.perf_counter() - t0
    base_set = {(r["a_id"], r["b_id"], r["dist"]) for r in base_rows}
    per_copy: dict[int, set] = {}
    for r in rows10:
        c = r["a_id"] // 10**9
        assert r["b_id"] // 10**9 == c, "cross-copy pair leaked"
        per_copy.setdefault(c, set()).add(
            (r["a_id"] % 10**9, r["b_id"] % 10**9, r["dist"])
        )
    assert len(rows10) == COPIES * len(base_rows), (len(rows10), len(base_rows))
    for c in range(COPIES):
        assert per_copy.get(c) == base_set, f"copy {c} pair set diverged"
    print(
        f"fuzzy_prefix_match 10x cipher: output exactly x{COPIES} "
        f"({len(rows10)} pairs), every copy's pair set IDENTICAL to "
        f"base, wall {t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
