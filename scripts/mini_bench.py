"""Targeted bench: pinned-protocol timing (1 excluded warmup rep +
min-of-2) for named registry entries, one shared session. For
mid-round iteration only — the official artifact stays bench.py.

Usage: python scripts/mini_bench.py query [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_sales_etl_spark.plans import registry  # noqa: E402
from retail_sales_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(
        app_name="mini-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    out = {}
    for name in names:
        runs = []
        n_reps = int(os.environ.get("MINI_BENCH_REPS", "3"))
        for rep in range(n_reps):  # rep 0 = excluded warmup
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            runs.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(runs[1:]), "reps": runs}
        print(f"{name}: min {min(runs[1:]):.2f}s reps={runs}", flush=True)
        spark.catalog.clearCache()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
