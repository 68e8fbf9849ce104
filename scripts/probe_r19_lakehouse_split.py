"""r19 opt probe: where does a streaming entry's wall time go?

Monkeypatch-times the LakehouseTable hot methods (cumulative wall
seconds + call counts) and runs the slowest streaming queries once
each at the given SF with the noop sink — the r18 verdict's ordered
micro-profile ("split commit-overhead from compute"). The timers
nest (merge calls _stage_files calls the staging write), so the
report prints both the flat per-method totals and the two exclusive
legs of _stage_files (parquet staging write vs the stats read-back
pass) that are candidates for fusion.

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


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            ACC[name] += time.perf_counter() - t0
            CNT[name] += 1

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

    # Split _stage_files into its two Spark jobs: the staging parquet
    # write and the stats read-back pass (groupBy input_file_name).
    orig_stage = None

    def staged_split(self, df):
        t0 = time.perf_counter()
        import uuid

        token = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, f"_staging_{token}")
        df.write.mode("overwrite").parquet(staging)
        ACC["stage.write_job"] += time.perf_counter() - t0
        CNT["stage.write_job"] += 1
        t1 = time.perf_counter()
        from pyspark.sql import functions as F

        staged = self.spark.read.parquet(staging)
        cols = [c for c, t in staged.dtypes if t in self._STATS_DTYPES]
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            f
            for i, c in enumerate(cols)
            for f in (
                F.min(F.col(c)).alias(f"__mn_{i}"),
                F.max(F.col(c)).alias(f"__mx_{i}"),
                F.count(F.col(c)).alias(f"__nn_{i}"),
            )
        ]
        per_file = (
            staged.withColumn("__f", F.input_file_name())
            .groupBy("__f")
            .agg(*aggs)
            .collect()
        )
        ACC["stage.stats_job"] += time.perf_counter() - t1
        CNT["stage.stats_job"] += 1
        t2 = time.perf_counter()
        file_stats = {}
        file_rows = {}
        for r in per_file:
            base = os.path.basename(r["__f"])
            file_rows[base] = r["__n"]
            file_stats[base] = {
                c: [
                    lh._stat_json(r[f"__mn_{i}"]),
                    lh._stat_json(r[f"__mx_{i}"]),
                    int(r["__n"]) - int(r[f"__nn_{i}"]),
                ]
                for i, c in enumerate(cols)
            }
        n = sum(file_rows.values())
        names = []
        stats = {}
        for i, f in enumerate(sorted(os.listdir(staging))):
            if not f.endswith(".parquet"):
                continue
            name = f"part-{token}-{i:05d}.parquet"
            os.replace(os.path.join(staging, f), os.path.join(self.path, name))
            names.append(name)
            if f in file_stats:
                stats[name] = file_stats[f]
        CNT["stage.files_out"] += len(names)
        import shutil

        shutil.rmtree(staging, ignore_errors=True)
        ACC["stage.rename"] += time.perf_counter() - t2
        return names, n, stats

    # install the split UNDER the _stage_files timer wrapper
    def stage_timed(self, df):
        t0 = time.perf_counter()
        try:
            return staged_split(self, df)
        finally:
            ACC["_stage_files"] += time.perf_counter() - t0
            CNT["_stage_files"] += 1

    lh.LakehouseTable._stage_files = stage_timed


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or [
        "streaming_km_survival",
        "streaming_dedup_lsh",
        "streaming_rake_by_source",
        "streaming_burstiness",
    ]
    _instrument()
    spark = get_spark(app_name="probe-r19-lh-split")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.all_queries()
    # warm up
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
        lake = ACC.get("write", 0) + ACC.get("merge", 0) + ACC.get(
            "optimize", 0
        ) + ACC.get("retire_below", 0)
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
        print(f"  files staged out: {CNT.get('stage.files_out', 0)}")
    spark.stop()


if __name__ == "__main__":
    main()
