"""Round-12 probe: the grid-counting multimodal_phash_hamming under
10x corpus growth.

Identity: duplicate every DOCUMENT 10x with doc_ids shifted by
k * 10^10. The synthetic raster generator keys every pixel off
doc_id, so the copies hash to a DIFFERENT (but deterministic) hash
mix — the probe therefore checks the SCALE claim, not a value
identity: the pair-stage input (the bucket grid the probe join runs
over) is capped at 2^12 = 4096 rows at ANY corpus size, so the join
input must stay flat while the corpus grows 10x. The r11 doc-grain
probe join's input grew 13x-per-doc linearly; the r12 rewrite's is
corpus-size-independent.

Pins: (a) grid rows <= 4096 at both scales, (b) probe-side rows
<= 13 * 4096 at both scales (exact bound from the bit-direction
explode), (c) the census totals are consistent: sum over the grid of
C(n,2) at 10x equals the d0 output at 10x (self-consistency of the
closed form vs an independent driver-side recompute from the grid).

Run: python scripts/probe_phash_grid_10x.py   (results -> SURVEY §6)
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
STAGE = "/tmp/probe_phash_grid_10x"
COPIES = 10
N_BITS = 12


def main() -> None:
    shutil.rmtree(STAGE, ignore_errors=True)
    spark = get_spark(app_name="probe-phash-grid")
    spark.sparkContext.setLogLevel("ERROR")
    from retail_sales_etl_spark.catalog import TABLES, load_table
    from retail_sales_etl_spark.operators.multimodal import (
        phash_frame,
        q_multimodal_phash_hamming,
        synthesize_ppm,
    )

    docs = load_table(spark, SF_DIR, "documents")
    copies = spark.range(COPIES).select(F.col("id").alias("copy"))
    big = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * F.lit(10**10)).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )
    d10 = os.path.join(STAGE, "docs10")
    os.makedirs(d10, exist_ok=True)
    big.write.mode("overwrite").parquet(f"{d10}/documents.parquet")
    for t in TABLES:
        link = f"{d10}/{t}.parquet"
        if t != "documents" and not os.path.exists(link):
            os.symlink(f"{SF_DIR}/{t}.parquet", link)

    results = {}
    for label, sf in (("1x", SF_DIR), ("10x", d10)):
        t0 = time.perf_counter()
        out = {
            r["hamming"]: r["n_pairs"]
            for r in q_multimodal_phash_hamming(spark, sf).collect()
        }
        wall = time.perf_counter() - t0
        grid = (
            phash_frame(synthesize_ppm(load_table(spark, sf, "documents")))
            .groupBy("phash")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        grid_rows = len(grid)
        probe_rows = sum(
            1 + sum(1 for i in range(N_BITS) if not r["phash"] & (1 << i))
            for r in grid
        )
        d0_recomputed = sum(r["n"] * (r["n"] - 1) // 2 for r in grid)
        results[label] = (wall, grid_rows, probe_rows, out)
        assert grid_rows <= 2**N_BITS, grid_rows
        assert probe_rows <= (N_BITS + 1) * 2**N_BITS, probe_rows
        assert out.get(0, 0) == d0_recomputed, (out, d0_recomputed)
        print(
            f"{label}: wall={wall:.2f}s grid_rows={grid_rows} "
            f"probe_rows={probe_rows} pairs={out}"
        )

    g1, g10 = results["1x"][1], results["10x"][1]
    print(
        f"pair-stage input: {g1} -> {g10} grid rows "
        f"(x{g10 / max(g1, 1):.2f} under 10x corpus; capped at 4096)"
    )
    shutil.rmtree(STAGE, ignore_errors=True)


if __name__ == "__main__":
    main()
