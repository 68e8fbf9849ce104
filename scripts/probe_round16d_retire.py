"""Round-16 retirement probe: the state-TTL policy's scale shape.

30 ingest cycles into the per-user gap-moment state, each bringing
500 FRESH users (churn) plus 50 persistent users, with the
maintain_user_gaps retirement policy applied every cycle at a horizon
covering ~3 cycles. Measures the two claims the policy makes:

- live state rows stay BOUNDED by horizon-active users while total
  users ever seen grows linearly (15,050 by cycle 30);
- expired files drop WHOLE by pure log arithmetic — the retire
  telemetry shows files_dropped >> files_rewritten once the table is
  clustered, i.e. retirement write cost tracks the straddle boundary,
  not table size.

Run: python scripts/probe_round16d_retire.py   (results -> SURVEY §6)
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from retail_sales_etl_spark.session import get_spark


def main() -> None:
    spark = get_spark(app_name="probe-round16d-retire")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.load.lakehouse import LakehouseTable
    from retail_sales_etl_spark.streaming.events import user_gaps_sink

    work = tempfile.mkdtemp(prefix="retire_probe_")
    state = f"{work}/state"
    base = dt.datetime(2020, 1, 1)
    cycle_s = 1000          # each cycle advances event time by 1000 s
    horizon_s = 3 * cycle_s  # keep ~3 cycles of inactive users

    fresh_per_cycle, persistent = 500, 50
    live_rows, drops, rewrites = [], 0, 0
    t0 = time.perf_counter()
    for k in range(30):
        t = k * cycle_s
        rows = [
            (u, base + dt.timedelta(seconds=t + (u % 7)))
            for u in range(persistent)
        ] + [
            (100_000 + fresh_per_cycle * k + j,
             base + dt.timedelta(seconds=t + 10 + (j % 50)))
            for j in range(fresh_per_cycle)
        ]
        batch = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        assert user_gaps_sink(batch, k, state) is True
        table = LakehouseTable(spark, state)
        # the maintain_user_gaps hook logic: retire, then recluster
        wm = int(
            (base + dt.timedelta(seconds=t + 60))
            .replace(tzinfo=dt.timezone.utc).timestamp()
        ) * 1_000_000
        res = table.retire_below("last_us", wm - horizon_s * 1_000_000)
        if not res.get("noop"):
            drops += res["files_dropped"]
            rewrites += res["files_rewritten"]
        table.optimize(
            target_files=4, zorder_by=["user_id"],
            incremental=True, max_generations=4,
        )
        live_rows.append(table.read().count())
    wall = time.perf_counter() - t0

    ever = persistent + 30 * fresh_per_cycle
    print(f"cycles=30 users_ever={ever} wall={wall:.1f}s")
    print(f"live rows per cycle (every 5th): {live_rows[::5]}")
    print(f"final live={live_rows[-1]} (bound ~= persistent + "
          f"{horizon_s // cycle_s} cycles x {fresh_per_cycle})")
    print(f"retire telemetry: files_dropped={drops} "
          f"files_rewritten={rewrites}")
    assert live_rows[-1] <= persistent + 4 * fresh_per_cycle
    assert max(live_rows[10:]) <= persistent + 5 * fresh_per_cycle
    assert drops > 0
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
