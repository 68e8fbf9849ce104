"""End-to-end orchestrator tests: E -> T1 -> T2 -> L with stage logging."""

from __future__ import annotations

import os

from retail_sales_etl_spark.control.runlog import ControlLog
from retail_sales_etl_spark.pipeline import run_pipeline


def test_customer_pipeline_end_to_end(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "warehouse")
    run = run_pipeline(spark, "customer", sf_dir, wh)
    assert run["status"] == "SUCCESS"

    out = spark.read.parquet(os.path.join(wh, "customer_dim"))
    assert out.count() == 150
    assert "acctbal_band" in out.columns

    log = ControlLog(os.path.join(wh, "_control"))
    stages = [s["stage_name"] for s in log.stages(run["run_id"])]
    for expected in ("EXTRACT", "TRANSFORM_P1", "TRANSFORM_P2", "LOAD"):
        assert expected in stages


def test_lineitem_pipeline_builds_date_dim(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "warehouse")
    run = run_pipeline(spark, "lineitem", sf_dir, wh)
    assert run["status"] == "SUCCESS"
    # fact is partitioned by order_year
    fact_dir = os.path.join(wh, "sales_fact")
    assert any(d.startswith("order_year=") for d in os.listdir(fact_dir))
    # date_dim loaded alongside (sales pipeline parity)
    dd = spark.read.parquet(os.path.join(wh, "date_dim"))
    assert dd.count() > 0


def test_pipeline_writes_per_run_text_log(spark, sf_dir, tmp_path):
    """Reference utils/text_logger.py parity: a run leaves a grep-able
    text log with ts | level | module | pipeline | run_id | message."""
    wh = str(tmp_path / "warehouse")
    run = run_pipeline(spark, "customer", sf_dir, wh)
    log_file = os.path.join(wh, "_control", "logs", "etl_logs.log")
    assert os.path.exists(log_file)
    lines = open(log_file).read().splitlines()
    mine = [ln for ln in lines if run["run_id"] in ln]
    assert any("Pipeline started" in ln for ln in mine)
    assert any("EXTRACT ok" in ln for ln in mine)
    assert any("Pipeline SUCCESS" in ln for ln in mine)
    # field layout parity with the reference formatter
    parts = mine[0].split(" | ")
    assert parts[1] == "INFO" and parts[3] == "customer"


def test_pipeline_lifecycle_gating(spark, sf_dir, tmp_path):
    """Deactivated pipelines refuse to run; listing excludes them;
    reactivation restores both (reference metadata_table_helpers
    list_active_pipelines / deactivate_pipeline parity)."""
    import pytest

    wh = str(tmp_path / "wh")
    control = os.path.join(wh, "_control")
    log = ControlLog(control)
    log.register_pipeline("customer", "customer")
    log.register_pipeline("part", "part")
    assert {p["pipeline_name"] for p in log.list_active_pipelines()} == {
        "customer",
        "part",
    }

    log.deactivate_pipeline("customer")
    assert {p["pipeline_name"] for p in log.list_active_pipelines()} == {"part"}
    assert log.get_pipeline("customer")["is_active"] is False
    with pytest.raises(RuntimeError, match="deactivated"):
        run_pipeline(spark, "customer", sf_dir, wh, control_dir=control)
    # no run row was recorded for the refused run
    assert all(r["pipeline_name"] != "customer" for r in log.runs())

    log.activate_pipeline("customer")
    run = run_pipeline(spark, "customer", sf_dir, wh, control_dir=control)
    assert run["status"] == "SUCCESS"
    # unknown pipeline names cannot be toggled
    with pytest.raises(ValueError, match="Unknown pipeline"):
        log.deactivate_pipeline("nope")
