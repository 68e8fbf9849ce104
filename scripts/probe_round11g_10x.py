"""Round-11 seventh-wave 10x probes (sf0.1 x10 copies):

- events_entropy_rate: disjoint user copies multiply every transition
  count by 10, every probability ratio is the same REAL number, and
  the term grid itself is unchanged — so H, norm_entropy, and
  predictability are EXACTLY identical; n_transitions x10.
- part_return_shrinkage: disjoint part copies leave the rate
  distribution (and so the fitted prior) EXACTLY unchanged; every
  copy's per-part shrunk rate is identical, so the top-K is the base
  top-2 values replicated — asserted via identical prior columns and
  identical max shrunk rate, plus the big run's shrunk values being a
  subset of the base run's full value set.

Run: python scripts/probe_round11g_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_r11g_10x"
COPIES = 10


def _stage(spark, subdir, table, df):
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


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-round11g-10x")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import q_events_entropy_rate
    from retail_sales_etl_spark.operators.profiling import (
        q_part_return_shrinkage,
    )

    copies = spark.range(COPIES).select(F.col("id").alias("copy"))

    ev = load_table(spark, SF_DIR, "events")
    d_ev = _stage(
        spark,
        "ev10",
        "events",
        ev.crossJoin(copies).select(
            (F.col("event_id") + F.col("copy") * F.lit(10**12)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("copy") * F.lit(10**9)).alias("user_id"),
            "event_type",
            "value",
            "props",
        ),
    )
    (b,), t1 = _timed(lambda: q_events_entropy_rate(spark, SF_DIR).collect())
    (g,), t10 = _timed(lambda: q_events_entropy_rate(spark, d_ev).collect())
    assert g["n_transitions"] == COPIES * b["n_transitions"]
    assert g["n_states"] == b["n_states"]
    for c in ("entropy_rate_nats", "norm_entropy", "predictability"):
        assert g[c] == b[c], (c, b[c], g[c])
    print(
        f"events_entropy_rate 10x (disjoint users): H/norm/predictability "
        f"EXACTLY identical ({b['entropy_rate_nats']}), transitions x10; "
        f"wall {t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )

    li = load_table(spark, SF_DIR, "lineitem")
    d_li = _stage(
        spark,
        "li10",
        "lineitem",
        li.crossJoin(copies).select(
            (F.col("l_partkey") + F.col("copy") * F.lit(10**7)).alias("l_partkey"),
            "l_returnflag",
        ),
    )
    base, t1 = _timed(lambda: q_part_return_shrinkage(spark, SF_DIR).collect())
    big, t10 = _timed(lambda: q_part_return_shrinkage(spark, d_li).collect())
    assert base and big
    assert big[0]["prior_mean"] == base[0]["prior_mean"]
    assert big[0]["prior_strength"] == base[0]["prior_strength"]
    base_all_vals = {r["shrunk_rate"] for r in base}
    assert max(r["shrunk_rate"] for r in big) == max(base_all_vals)
    # top-K of the replicated corpus = the base top values repeated
    assert {r["shrunk_rate"] for r in big} <= base_all_vals
    print(
        f"part_return_shrinkage 10x (disjoint parts): prior EXACTLY "
        f"unchanged (mean {base[0]['prior_mean']}, strength "
        f"{base[0]['prior_strength']}), per-part shrunk rates identical "
        f"across copies; wall {t1:.1f}s -> {t10:.1f}s (x{t10 / t1:.1f})"
    )
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
