"""Long-stream soak: 500 micro-batches through the exactly-once
lakehouse sink with per-batch log retention (VERDICT r9 watch item).

Pins, over a real stream lifetime (not a 10-commit unit test):
- the commit-JSON count never exceeds retain + checkpoint interval + 2
  at ANY batch (sampled every batch);
- checkpoint files stay O(1) (old checkpoints are retired);
- replay detection (batch watermark) keeps returning False for old
  batch ids after hundreds of cleaning rounds;
- the final table is exact: 500 batches x rows/batch.

Run: python scripts/soak_lakehouse_stream.py [n_batches]
Results -> SURVEY §6.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_sales_etl_spark.load import lakehouse as lh
from retail_sales_etl_spark.load.lakehouse import LakehouseTable
from retail_sales_etl_spark.session import get_spark
from retail_sales_etl_spark.streaming.events import (
    _maybe_clean_log,
    lakehouse_batch_sink,
)


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    retain = 8
    bound = retain + lh._CHECKPOINT_INTERVAL + 2
    spark = get_spark(app_name="soak-lakehouse-stream")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="soak_lake_")
    path = os.path.join(root, "t")
    df = spark.range(2).selectExpr("id", "id * 2 AS v")
    log_glob = os.path.join(path, "_log", "*.json")
    ckpt_glob = os.path.join(path, "_log", "*.checkpoint.json")
    max_logs = max_ckpts = 0
    t0 = time.time()
    try:
        for b in range(n_batches):
            assert lakehouse_batch_sink(df, b, path) is True, b
            _maybe_clean_log(spark, path, retain)
            n_logs = len(glob.glob(log_glob))
            n_ckpts = len(glob.glob(ckpt_glob))
            max_logs = max(max_logs, n_logs)
            max_ckpts = max(max_ckpts, n_ckpts)
            assert n_logs <= bound, (b, n_logs, bound)
            if b and b % 100 == 0:
                assert lakehouse_batch_sink(df, b - 50, path) is False
                print(
                    f"  batch {b}: logs={n_logs} ckpts={n_ckpts} "
                    f"({time.time() - t0:.0f}s)",
                    flush=True,
                )
        dt = time.time() - t0
        table = LakehouseTable(spark, path)
        n_rows = table.read().count()
        assert n_rows == n_batches * 2, n_rows
        assert table.latest_value("batch_hwm") == n_batches - 1
        print(
            f"SOAK OK: {n_batches} micro-batches in {dt:.0f}s "
            f"({dt / n_batches * 1000:.0f} ms/batch); max log JSONs "
            f"{max_logs} (bound {bound}), max checkpoints {max_ckpts}; "
            f"final rows {n_rows} exact; replay detection held all run."
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
