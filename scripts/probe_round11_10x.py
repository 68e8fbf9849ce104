"""Round-11 scale-posture probes for the three round-10 late-wave
operators (VERDICT r10 item #3) — exact output identities at 10x data:

1. events_markov_chain: 10 event-stream copies in DISJOINT user-id
   spaces (same per-user event order) -> every (from,to) transition
   count exactly x10, every probability IDENTICAL.
2. graph_assortativity: 10 lineitem copies in DISJOINT order+part id
   spaces -> 10 isomorphic co-purchase subgraphs -> n_edges exactly
   x10, assortativity + avg_edge_degree IDENTICAL (Pearson moments all
   scale by 10, the quotient cancels).
3. multimodal_frame_dedup: two staged corpora —
   (a) exact copies: every frame appears in all 10 copies, so every
       framed doc must flag fully shared (shared_frac == 1.0) and the
       frame-row volume grows exactly x10;
   (b) per-copy alphabet-rotation cipher (injective per copy, frames
       distinct across copies): each copy's per-doc
       (n_frames, n_shared_frames, shared_frac) must be IDENTICAL to
       the base corpus — the sharing structure is copy-local.

Run: python scripts/probe_round11_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r11_10x"
COPIES = 10
ALPHA = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"


def _stage(spark, subdir: str, table: str, df) -> str:
    """Write one synthetic table into a staged sf-dir; symlink the rest."""
    d = os.path.join(STAGE, subdir)
    os.makedirs(d, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(d, f"{table}.parquet"))
    from retail_sales_etl_spark.catalog import TABLES

    for t in TABLES:
        link = os.path.join(d, f"{t}.parquet")
        if t != table and not os.path.exists(link):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), link)
    return d


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


def probe_markov(spark) -> None:
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import q_events_markov_chain

    ev = load_table(spark, SF_DIR, "events")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = ev.crossJoin(copies).select(
        (F.col("event_id") + F.col("copy") * F.lit(10**12)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("copy") * F.lit(10**9)).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    d10 = _stage(spark, "markov10", "events", big)

    base, t1 = _timed(
        lambda: {
            (r["from_type"], r["to_type"]): (r["n_transitions"], r["p"])
            for r in q_events_markov_chain(spark, SF_DIR).collect()
        }
    )
    big_out, t10 = _timed(
        lambda: {
            (r["from_type"], r["to_type"]): (r["n_transitions"], r["p"])
            for r in q_events_markov_chain(spark, d10).collect()
        }
    )
    assert set(base) == set(big_out), "transition support changed"
    for k, (n, p) in base.items():
        n10, p10 = big_out[k]
        assert n10 == COPIES * n, (k, n, n10)
        assert p10 == p, (k, p, p10)
    print(
        f"events_markov_chain: base {t1:.1f}s -> 10x {t10:.1f}s "
        f"(x{t10 / t1:.1f} wall); {len(base)} transitions, counts exactly "
        f"x{COPIES}, probabilities IDENTICAL"
    )


def probe_assortativity(spark) -> None:
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.graph import q_graph_assortativity

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = li.crossJoin(copies).select(
        (F.col("l_orderkey") + F.col("copy") * F.lit(10**10)).alias(
            "l_orderkey"
        ),
        (F.col("l_partkey") + F.col("copy") * F.lit(10**9)).alias("l_partkey"),
    )
    d10 = _stage(spark, "assort10", "lineitem", big)

    base, t1 = _timed(lambda: q_graph_assortativity(spark, SF_DIR).collect()[0])
    out10, t10 = _timed(lambda: q_graph_assortativity(spark, d10).collect()[0])
    assert out10["n_edges"] == COPIES * base["n_edges"], (base, out10)
    assert out10["assortativity"] == base["assortativity"], (base, out10)
    assert out10["avg_edge_degree"] == base["avg_edge_degree"], (base, out10)
    print(
        f"graph_assortativity: base {t1:.1f}s -> 10x {t10:.1f}s "
        f"(x{t10 / t1:.1f} wall); n_edges exactly x{COPIES}, coefficient + "
        f"avg degree IDENTICAL ({base['assortativity']})"
    )


def probe_frame_dedup(spark) -> None:
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.multimodal import (
        q_multimodal_frame_dedup,
        sample_frames,
        to_media_table,
    )

    docs = load_table(spark, SF_DIR, "documents")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    off = F.col("copy") * F.lit(10**9)

    # (a) exact copies: everything becomes shared, frame volume x10
    exact = docs.crossJoin(copies).select(
        (F.col("doc_id") + off).alias("doc_id"),
        "text",
        "lang",
        "source",
        "n_chars",
    )
    d_exact = _stage(spark, "frames_exact10", "documents", exact)

    base_rows, t1 = _timed(
        lambda: q_multimodal_frame_dedup(spark, SF_DIR).collect()
    )
    rows10, t10 = _timed(
        lambda: q_multimodal_frame_dedup(spark, d_exact).collect()
    )
    assert len(rows10) == COPIES * len(base_rows)
    n_frames_base = sum(r["n_frames"] for r in base_rows)
    n_frames_10 = sum(r["n_frames"] for r in rows10)
    assert n_frames_10 == COPIES * n_frames_base, (n_frames_base, n_frames_10)
    assert all(
        r["n_shared_frames"] == r["n_frames"] and r["shared_frac"] == 1.0
        for r in rows10
    ), "an exact copy's frame escaped sharing"

    # (b) per-copy rotation cipher: sharing structure must be copy-local
    # and identical to base. translate(alpha -> alpha rotated by copy)
    # is injective per copy, so within-copy frame equality is exactly
    # the base corpus's; across copies frames differ wherever a frame
    # contains at least one letter/digit (natural text: always).
    ciphered = None
    for c in range(COPIES):
        rot = ALPHA[c:] + ALPHA[:c]
        drot = DIGITS[c % 10 :] + DIGITS[: c % 10]
        part = docs.select(
            (F.col("doc_id") + F.lit(c * 10**9)).alias("doc_id"),
            F.translate(
                F.translate("text", ALPHA, rot), DIGITS, drot
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        ciphered = part if ciphered is None else ciphered.unionAll(part)
    d_ciph = _stage(spark, "frames_cipher10", "documents", ciphered)

    base_map = {r["doc_id"]: r for r in base_rows}
    rows_c, t_c = _timed(
        lambda: q_multimodal_frame_dedup(spark, d_ciph).collect()
    )
    assert len(rows_c) == COPIES * len(base_map)
    for r in rows_c:
        b = base_map[r["doc_id"] % 10**9]
        assert (
            r["n_frames"] == b["n_frames"]
            and r["n_shared_frames"] == b["n_shared_frames"]
            and r["shared_frac"] == b["shared_frac"]
        ), (r, b)

    # sanity on the slicer volume at 10x (payload bytes never shuffle —
    # only the 32-char hashes reach the aggregate)
    media10 = to_media_table(load_table(spark, d_ciph, "documents"))
    n_sliced = sample_frames(media10).count()
    print(
        f"multimodal_frame_dedup: base {t1:.1f}s -> exact-10x {t10:.1f}s "
        f"(x{t10 / t1:.1f}), cipher-10x {t_c:.1f}s (x{t_c / t1:.1f}); "
        f"{n_sliced} frames at 10x; exact copies fully shared, per-copy "
        f"shared_frac IDENTICAL to base"
    )


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-round11-10x")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        probe_markov(spark)
        probe_assortativity(spark)
        probe_frame_dedup(spark)
    finally:
        shutil.rmtree(STAGE, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
