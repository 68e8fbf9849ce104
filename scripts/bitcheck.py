"""Bit-level Spark-vs-DuckDB parity check (driver-hash emulation).

The pytest oracle gate compares floats with isclose(), which passes
signed-zero and half-boundary divergences that the driver's value
hash catches (it hashes formatted values, so -0.0 vs 0.0 differs).
This script compares every cell with repr() equality — bit-exact for
floats — and reports any query whose output contains a -0.0 at all.

Usage: python scripts/bitcheck.py [--sf DIR] [query ...]
With no query names, checks every oracle-backed queries() entry.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from retail_sales_etl_spark.catalog import TABLES, table_path
from retail_sales_etl_spark.plans import registry
from retail_sales_etl_spark.session import get_spark


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # repr('-0.0') != repr('0.0') — bit-level
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _sortable(row):
    return tuple((type(c).__name__, str(c)) if c is not None else ("", "") for c in row)


def check(spark, con, name, sf_dir):
    sdf = registry.all_queries()[name](spark, sf_dir)
    cols = sorted(sdf.columns)
    s_rows = [tuple(r[c] for c in cols) for r in sdf.collect()]
    res = con.execute(registry.all_oracles()[name])
    d_cols = [d[0] for d in res.description]
    if sorted(d_cols) != cols:
        return f"SCHEMA spark={cols} duck={sorted(d_cols)}"
    order = [d_cols.index(c) for c in cols]
    d_rows = [tuple(row[i] for i in order) for row in res.fetchall()]
    if len(s_rows) != len(d_rows):
        return f"ROWS spark={len(s_rows)} duck={len(d_rows)}"
    neg_zero = sum(
        1
        for row in s_rows + d_rows
        for c in row
        if isinstance(c, float) and c == 0.0 and math.copysign(1.0, c) < 0
    )
    s_sorted = sorted(s_rows, key=_sortable)
    d_sorted = sorted(d_rows, key=_sortable)
    bad = 0
    example = None
    for sr, dr in zip(s_sorted, d_sorted):
        for col, sv, dv in zip(cols, sr, dr):
            if _norm(sv) != _norm(dv):
                bad += 1
                if example is None:
                    example = f"{col}: spark={sv!r} duck={dv!r}"
    if bad:
        return f"HASH {bad} cell diffs, e.g. {example}"
    if neg_zero:
        return f"NEGZERO {neg_zero} -0.0 cells (engines agree, but fragile)"
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(args.sf, t)}')"
        )
    names = args.queries or sorted(registry.all_oracles().keys())
    fails = 0
    for name in names:
        try:
            msg = check(spark, con, name, args.sf)
        except Exception as e:  # noqa: BLE001
            msg = f"ERROR {type(e).__name__}: {e}"
        if msg:
            fails += 1
            print(f"FAIL {name}: {msg}", flush=True)
        else:
            print(f"ok   {name}", flush=True)
        spark.catalog.clearCache()
    print(f"\n{len(names) - fails}/{len(names)} bit-exact", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
