"""Round-11 probe: attribution_position + markov_next_event_eval under
10x disjoint-user growth (copy offset 1e9 is even, so the train/eval
user-parity split is replication-invariant):
- attribution_position: every copy's per-user attribution IDENTICAL
  to base (weights depend only on within-purchase touch order).
- markov_next_event_eval: per-from predictions and hit_rate IDENTICAL
  with n_eval/n_hits exactly x10.

Run: python scripts/probe_attr_position_10x.py  (results -> SURVEY §6)
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
STAGE = "/tmp/probe_attr_10x"
COPIES = 10


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-attr-position")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import TABLES, load_table
    from retail_sales_etl_spark.operators.events import q_attribution_position

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
    d10 = os.path.join(STAGE, "ev10")
    os.makedirs(d10, exist_ok=True)
    big.write.mode("overwrite").parquet(f"{d10}/events.parquet")
    for t in TABLES:
        link = f"{d10}/{t}.parquet"
        if t != "events" and not os.path.exists(link):
            os.symlink(f"{SF_DIR}/{t}.parquet", link)

    t0 = time.perf_counter()
    base = {r["user_id"]: r for r in q_attribution_position(spark, SF_DIR).collect()}
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out10 = {r["user_id"]: r for r in q_attribution_position(spark, d10).collect()}
    t10 = time.perf_counter() - t0
    assert len(out10) == COPIES * len(base)
    for uid, g in out10.items():
        b = base[uid % 10**9]
        assert (
            g["n_purchases"] == b["n_purchases"]
            and g["n_touches"] == b["n_touches"]
            and g["attributed_value"] == b["attributed_value"]
        ), (uid, b, g)
    print(
        f"attribution_position: base {t1:.1f}s -> 10x {t10:.1f}s "
        f"(x{t10 / t1:.1f}); {len(out10)} user rows, every copy's "
        f"attribution IDENTICAL to base"
    )

    from retail_sales_etl_spark.operators.events import (
        q_markov_next_event_eval,
    )

    t0 = time.perf_counter()
    mk_base = {
        r["from_type"]: r
        for r in q_markov_next_event_eval(spark, SF_DIR).collect()
    }
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    mk10 = {
        r["from_type"]: r
        for r in q_markov_next_event_eval(spark, d10).collect()
    }
    t10 = time.perf_counter() - t0
    assert set(mk_base) == set(mk10)
    for ft, b in mk_base.items():
        g = mk10[ft]
        assert g["predicted_next"] == b["predicted_next"], (ft, b, g)
        assert g["n_eval"] == COPIES * b["n_eval"], (ft, b, g)
        assert g["n_hits"] == COPIES * b["n_hits"], (ft, b, g)
        assert g["hit_rate"] == b["hit_rate"], (ft, b, g)
    print(
        f"markov_next_event_eval: base {t1:.1f}s -> 10x {t10:.1f}s "
        f"(x{t10 / t1:.1f}); predictions + hit_rate IDENTICAL, "
        f"n_eval exactly x{COPIES}"
    )
    shutil.rmtree(STAGE, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
