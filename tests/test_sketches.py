"""Sketch aggregates: error bounds vs separately-computed exact values.

The queries() entries are sketch-only (no exact aggregate inline — that
would force the shuffle/sort the sketch avoids); the exact twins run
here, as a separate query, and the bound is asserted on the join.
"""

from __future__ import annotations

from retail_sales_etl_spark.operators import sketches


def test_sketch_queries_contain_no_exact_aggregates(spark, sf_dir):
    """The scale contract: no count_distinct / percentile in the sketch
    plans — only the approximate, mergeable forms."""
    for fn in (sketches.q_approx_user_reach, sketches.q_approx_order_percentiles):
        plan = fn(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
        assert "approx_count_distinct" in plan or "approx_percentile" in plan
        stripped = plan.replace("approx_percentile(", "").replace(
            "approx_count_distinct(", ""
        )
        assert "count(distinct" not in stripped.lower()
        assert "percentile(" not in stripped


def test_hll_within_error_bound(spark, sf_dir):
    approx = {
        (r["day"], r["event_type"]): r["approx_users"]
        for r in sketches.q_approx_user_reach(spark, sf_dir).collect()
    }
    exact = {
        (r["day"], r["event_type"]): r["exact_users"]
        for r in sketches.exact_user_reach(spark, sf_dir).collect()
    }
    assert approx and set(approx) == set(exact)
    for key, ex in exact.items():
        if ex >= 20:  # HLL bounds are asymptotic
            rel_err = abs(approx[key] - ex) / ex
            assert rel_err < 0.15, (key, rel_err)


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    approx = {
        r["order_priority"]: [r["p50"], r["p90"], r["p99"]]
        for r in sketches.q_approx_order_percentiles(spark, sf_dir).collect()
    }
    exact = {
        r["order_priority"]: r["exact_pctls"]
        for r in sketches.exact_order_percentiles(spark, sf_dir).collect()
    }
    assert approx and set(approx) == set(exact)
    for key, ex_list in exact.items():
        for ap, ex in zip(approx[key], ex_list):
            assert abs(ap - ex) / max(abs(ex), 1.0) < 0.05
