"""r19 opt probe: where does a streaming entry's wall time go?

Monkeypatch-times the LakehouseTable hot methods (cumulative wall
seconds + call counts) and runs the slowest streaming queries once
each at the given SF with the noop sink — the r18 verdict's ordered
micro-profile ("split commit-overhead from compute"). Also counts how
many commits took the driver-side fused-stats fast path vs the
distributed stats job.

Usage: python scripts/probe_r19_lakehouse_split.py [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_sales_etl_spark.load import lakehouse as lh
from retail_sales_etl_spark.plans import registry
from retail_sales_etl_spark.session import get_spark

ACC: dict[str, float] = defaultdict(float)
CNT: dict[str, int] = defaultdict(int)


def _wrap(cls, name, acc_name=None):
    orig = getattr(cls, name)
    key = acc_name or name

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            ACC[key] += time.perf_counter() - t0
            CNT[key] += 1

    setattr(cls, name, timed)


def _instrument():
    for m in (
        "_stage_files",
        "write",
        "merge",
        "optimize",
        "retire_below",
        "read",
        "read_where",
        "read_where_in",
        "prune_files",
        "_replay_stats",
        "_try_commit",
        "latest_value",
    ):
        _wrap(lh.LakehouseTable, m)

    orig_fast = lh.LakehouseTable._driver_file_stats.__func__

    def fast_counted(cls, paths, cols):
        t0 = time.perf_counter()
        out = orig_fast(cls, paths, cols)
        ACC["stats.driver_path"] += time.perf_counter() - t0
        CNT["stats.fast_hit" if out is not None else "stats.fast_miss"] += 1
        return out

    lh.LakehouseTable._driver_file_stats = classmethod(fast_counted)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or [
        "streaming_km_survival",
        "streaming_novelty",
        "streaming_rake_by_source",
        "streaming_burstiness",
    ]
    _instrument()
    spark = get_spark(app_name="probe-r19-lh-split")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    spark.range(1_000_000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    for name in names:
        for k in list(ACC):
            ACC[k] = 0.0
        for k in list(CNT):
            CNT[k] = 0
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        total = time.perf_counter() - t0
        print(f"\n== {name}: total {total:.2f}s ==")
        lake = (
            ACC.get("write", 0)
            + ACC.get("merge", 0)
            + ACC.get("optimize", 0)
            + ACC.get("retire_below", 0)
        )
        reads = ACC.get("read", 0) + ACC.get("read_where", 0) + ACC.get(
            "read_where_in", 0
        )
        print(
            f"  commits (write+merge+optimize+retire): {lake:.2f}s"
            f"  reads (read/where/in): {reads:.2f}s"
            f"  other/compute: {total - lake - reads:.2f}s"
        )
        for k in sorted(ACC, key=lambda k: -ACC[k]):
            if ACC[k] > 0.01:
                print(f"  {k:>18}: {ACC[k]:7.2f}s  x{CNT[k]}")
        print(
            f"  stats fast-path hits: {CNT.get('stats.fast_hit', 0)}"
            f"  misses: {CNT.get('stats.fast_miss', 0)}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
