"""T2 modeling: integrity gate behavior (violations must raise) and
derived-column spot checks on real sf0.001 data."""

from __future__ import annotations

import pytest

from retail_sales_etl_spark.catalog import load_table
from retail_sales_etl_spark.operators import modeling


def test_validate_integrity_passes(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "val"])
    modeling.validate_integrity(df, ["id"], expected_row_count=2)


def test_validate_integrity_null_pk(spark):
    df = spark.createDataFrame([(None, "a"), (2, "b")], ["id", "val"])
    with pytest.raises(ValueError, match="NULL values"):
        modeling.validate_integrity(df, ["id"])


def test_validate_integrity_dup_pk(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], ["id", "val"])
    with pytest.raises(ValueError, match="Duplicate primary keys"):
        modeling.validate_integrity(df, ["id"])


def test_validate_integrity_row_count(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "val"])
    with pytest.raises(ValueError, match="Row count changed"):
        modeling.validate_integrity(df, ["id"], expected_row_count=5)


def test_validate_integrity_schema_contract(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "BadName"])
    with pytest.raises(ValueError, match="not snake_case"):
        modeling.validate_integrity(df, ["id"])
    df2 = spark.createDataFrame([(1, "a")], ["id", "val"])
    with pytest.raises(ValueError, match="Schema mismatch"):
        modeling.validate_integrity(df2, ["id"], expected_columns=["id", "other"])


def test_sales_fact_derivations(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    fact = modeling.build_sales_fact(li)
    row = fact.filter("is_discounted").first()
    assert row["discount_amount"] > 0
    assert abs(row["net_amount"] - (row["gross_amount"] - row["discount_amount"])) < 1e-9
    assert row["order_month"].startswith(str(row["order_year"]))


def test_date_dim_spine_is_contiguous(spark, sf_dir):
    dd = modeling.build_date_dim(load_table(spark, sf_dir, "orders"))
    n = dd.count()
    bounds = dd.agg({"date": "min"}).first()[0], dd.agg({"date": "max"}).first()[0]
    assert (bounds[1] - bounds[0]).days + 1 == n
    assert dd.filter("day_of_week NOT BETWEEN 0 AND 6").count() == 0
