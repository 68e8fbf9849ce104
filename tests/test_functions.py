"""Boundary tests for the retail Column helpers (reference band/bucket
semantics at their exact thresholds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_spark.functions import retail


def test_price_band_boundaries(spark):
    df = spark.createDataFrame(
        [(500.0,), (500.01,), (2000.0,), (2000.01,)], ["p"]
    )
    out = {
        r["p"]: r["band"]
        for r in df.select("p", retail.price_band(F.col("p")).alias("band")).collect()
    }
    # reference _assign_band: <=500 LOW, <=2000 MEDIUM, else HIGH
    assert out[500.0] == "LOW"
    assert out[500.01] == "MEDIUM"
    assert out[2000.0] == "MEDIUM"
    assert out[2000.01] == "HIGH"


def test_tenure_bucket_boundaries(spark):
    df = spark.createDataFrame([(90,), (91,), (365,), (366,)], ["d"])
    out = {
        r["d"]: r["b"]
        for r in df.select(
            "d", retail.tenure_bucket(F.col("d")).alias("b")
        ).collect()
    }
    # reference _assign_customer_tenure_bucket: <=90 NEW, <=365 REGULAR, else LOYAL
    assert out[90] == "NEW"
    assert out[91] == "REGULAR"
    assert out[365] == "REGULAR"
    assert out[366] == "LOYAL"


def test_weekday_mon0(spark):
    df = spark.createDataFrame([("2024-01-01",), ("2024-01-07",)], ["d"])
    out = {
        r["d"]: r["w"]
        for r in df.select(
            "d", retail.weekday_mon0(F.to_date("d")).alias("w")
        ).collect()
    }
    assert out["2024-01-01"] == 0  # Monday
    assert out["2024-01-07"] == 6  # Sunday


def test_decimal_sum_order_independence(spark):
    # the reason for the DECIMAL discipline: same rows, different
    # partitioning, identical sum
    vals = [(float(f"{i}.{i % 100:02d}"),) for i in range(1, 2001)]
    df1 = spark.createDataFrame(vals, ["x"]).repartition(1)
    df32 = spark.createDataFrame(list(reversed(vals)), ["x"]).repartition(32)
    s1 = df1.agg(retail.dsum(retail.money("x"))).first()[0]
    s32 = df32.agg(retail.dsum(retail.money("x"))).first()[0]
    assert s1 == s32
