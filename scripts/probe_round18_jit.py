"""Round-18 bench forensics: fresh-JVM A/B on the volatile trio.

The r17 verdict flagged embedding_rp_project / ppr_related_parts /
streaming_dedup_lsh: same-code runs disagree up to 3x and the intra-run
rep spread hits 1.66, so the recorded per-round numbers on exactly the
JIT/GC-sensitive plans are dominated by when the box is loud. This
probe runs the controlled experiment the r5 precedent used (SURVEY
S6 "same-box A/B"), with per-rep resolution:

- Arm A (fresh): a NEW JVM per query, bench-identical warm-up (range
  sum + star_flagship noop), then N reps of ONLY that query. Per-rep
  times show whether rep 1 carries a one-time JIT/codegen cost.
- Arm B (in-sequence): a NEW JVM, same warm-up, then every HEADLINE
  query that PRECEDES the target runs once (approximating the bench's
  JVM heat / codegen-class / GC-debt state at that position), then N
  reps of the target.

Reading the result:
- rep1 >> rep2..N in BOTH arms      -> first-rep JIT dominates; the fix
  is a warmup rep excluded from the min (bench.py).
- arm B mins >> arm A mins          -> accumulated JVM state (codegen
  cache pressure / GC debt) at bench position; min-of-N cannot mask it
  and the per-round number is position-biased, not code-biased.
- arms agree, reps flat             -> the recorded volatility was
  ambient host contention; nothing to fix in bench.py.

Run: python scripts/probe_round18_jit.py     (orchestrates child JVMs)
Child modes (internal): --child NAME --arm fresh|inseq --reps N
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TRIO = ["embedding_rp_project", "ppr_related_parts", "streaming_dedup_lsh"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = 4


def _child(name: str, arm: str, reps: int) -> None:
    from retail_sales_etl_spark.plans import registry
    from retail_sales_etl_spark.session import get_spark

    import bench  # HEADLINE order — the bench's own sequence

    spark = get_spark(
        app_name=f"probe-r18-jit-{arm}-{name}",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()

    # bench-identical warm-up
    spark.range(1_000_000).selectExpr("sum(id)").write.mode("overwrite").format(
        "noop"
    ).save()
    queries["star_flagship"](spark, SF_DIR).write.mode("overwrite").format(
        "noop"
    ).save()
    from retail_sales_etl_spark.plans.etl_queries import _ensure_bucketed_layout

    _ensure_bucketed_layout(spark, SF_DIR)

    prefix_sec = 0.0
    if arm == "inseq":
        t0 = time.perf_counter()
        for prior in bench.HEADLINE:
            if prior == name:
                break
            queries[prior](spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            spark.catalog.clearCache()
        prefix_sec = time.perf_counter() - t0

    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        queries[name](spark, SF_DIR).write.mode("overwrite").format("noop").save()
        runs.append(round(time.perf_counter() - t0, 3))
    print(
        "PROBE_JSON "
        + json.dumps(
            {
                "name": name,
                "arm": arm,
                "reps": runs,
                "min": min(runs),
                "rep1_over_min_rest": (
                    round(runs[0] / min(runs[1:]), 3) if len(runs) > 1 else None
                ),
                "prefix_sec": round(prefix_sec, 3),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        name = sys.argv[i + 1]
        arm = sys.argv[sys.argv.index("--arm") + 1]
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        _child(name, arm, reps)
        return

    results = []
    for name in TRIO:
        for arm in ("fresh", "inseq"):
            cmd = [
                sys.executable,
                os.path.abspath(__file__),
                "--child",
                name,
                "--arm",
                arm,
                "--reps",
                str(REPS),
            ]
            print(f"== spawning {arm} JVM for {name}", flush=True)
            out = subprocess.run(
                cmd, capture_output=True, text=True, cwd=REPO, timeout=3600
            )
            rec = None
            for line in out.stdout.splitlines():
                if line.startswith("PROBE_JSON "):
                    rec = json.loads(line[len("PROBE_JSON "):])
            if rec is None:
                print(f"!! child failed for {name}/{arm}:", file=sys.stderr)
                print(out.stdout[-2000:], file=sys.stderr)
                print(out.stderr[-2000:], file=sys.stderr)
                continue
            results.append(rec)
            print(json.dumps(rec), flush=True)

    # verdict table
    print("\n== verdict")
    by = {(r["name"], r["arm"]): r for r in results}
    for name in TRIO:
        a, b = by.get((name, "fresh")), by.get((name, "inseq"))
        if not a or not b:
            continue
        print(
            json.dumps(
                {
                    "name": name,
                    "fresh_min": a["min"],
                    "inseq_min": b["min"],
                    "inseq_over_fresh": round(b["min"] / a["min"], 3),
                    "fresh_rep1_over_rest": a["rep1_over_min_rest"],
                    "inseq_rep1_over_rest": b["rep1_over_min_rest"],
                    "fresh_reps": a["reps"],
                    "inseq_reps": b["reps"],
                }
            )
        )


if __name__ == "__main__":
    main()
