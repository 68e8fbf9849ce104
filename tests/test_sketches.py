"""Sketch aggregates: error bounds vs exact computation."""

from __future__ import annotations

from retail_sales_etl_spark.operators import sketches


def test_hll_within_error_bound(spark, sf_dir):
    rows = sketches.q_approx_user_reach(spark, sf_dir).collect()
    assert rows
    for r in rows:
        if r["exact_users"] >= 20:  # HLL bounds are asymptotic
            rel_err = abs(r["approx_users"] - r["exact_users"]) / r["exact_users"]
            assert rel_err < 0.15, (r["day"], r["event_type"], rel_err)


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    rows = sketches.q_approx_order_percentiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for approx, exact in zip(r["approx_pctls"], r["exact_pctls"]):
            assert abs(approx - exact) / max(abs(exact), 1.0) < 0.05
