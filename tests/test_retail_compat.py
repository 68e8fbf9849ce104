"""Reference drop-in compatibility: the four retail pipelines produce
the reference's exact derived columns on reference-shaped CSVs."""

from __future__ import annotations

import datetime

import pytest

from retail_sales_etl_spark import retail_compat as rc
from retail_sales_etl_spark.sources import readers

AS_OF = datetime.datetime(2025, 6, 1, tzinfo=datetime.timezone.utc)


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("retail_csvs")
    (d / "customers.csv").write_text(
        "customer_id,first_name,last_name,email,city,signup_date\n"
        "1,Asha,Rao,asha@example.com,Chennai,2025-04-23\n"
        "2,Vikram,,vikram@shop.in,Mumbai,2024-12-01\n"
        "3,,Nair,nair@example.com,,2020-01-01\n"
    )
    (d / "products.csv").write_text(
        "product_id,product_name,category,price\n"
        "1,Widget,Grocery,120.5\n"
        "2,Gadget,Electronics,2500.0\n"
        "3,Thing,,900.0\n"
    )
    (d / "stores.csv").write_text(
        "store_id,store_name,city,state\n"
        "1,Store-1,Chennai,TN\n"
        "2,Store-2,pune,MH\n"
        "3,Store-3,Delhi,DL\n"
    )
    (d / "sales.csv").write_text(
        "sale_id,sale_date,customer_id,product_id,store_id,quantity,unit_price,discount_pct\n"
        "1,2025-04-02,1,1,1,6,100.0,0\n"
        "2,2025-05-16,2,2,2,2,2500.0,5\n"
        "3,2025-05-20,3,3,3,1,900.0,\n"
    )
    return str(d)


def _load(spark, csv_dir, name, table):
    df = readers.read_source(spark, f"{csv_dir}/{name}.csv", fmt="csv")
    readers.validate_schema(df, rc.EXPECTED_COLUMNS[table])
    return rc.clean(name, df)


def test_customers_dim_derivations(spark, csv_dir):
    dim = rc.build_customers_dim(
        _load(spark, csv_dir, "customers", "customers_dim"), AS_OF
    )
    rows = {r["customer_id"]: r for r in dim.collect()}
    assert rows["1"]["customer_full_name"] == "Asha Rao"
    assert rows["2"]["customer_full_name"] == "Vikram"  # empty last name trimmed
    assert rows["1"]["customer_tenure_bucket"] == "NEW"
    assert rows["2"]["customer_tenure_bucket"] == "REGULAR"
    assert rows["3"]["customer_tenure_bucket"] == "LOYAL"
    assert rows["2"]["email_domain"] == "shop.in"
    assert rows["3"]["city"] == "UNKNOWN"  # default fill


def test_products_dim_derivations(spark, csv_dir):
    dim = rc.build_products_dim(_load(spark, csv_dir, "products", "products_dim"))
    rows = {r["product_id"]: r for r in dim.collect()}
    assert rows["1"]["price_band"] == "LOW"
    assert rows["3"]["price_band"] == "MEDIUM"
    assert rows["2"]["price_band"] == "HIGH"
    assert rows["2"]["is_premium_product"] is True
    assert rows["3"]["category_normalized"] == "UNKNOWN"


def test_stores_dim_region_map_and_metro(spark, csv_dir):
    dim = rc.build_stores_dim(_load(spark, csv_dir, "stores", "stores_dim"), spark)
    rows = {r["store_id"]: r for r in dim.collect()}
    assert rows["1"]["store_region"] == "SOUTH"
    assert rows["2"]["store_region"] == "WEST"
    assert rows["3"]["store_region"] == "NORTH"
    assert rows["1"]["is_metro_store"] is True  # CHENNAI
    assert rows["2"]["is_metro_store"] is False  # PUNE upper-cased


def test_stores_dim_unmapped_state_raises(spark):
    df = spark.createDataFrame(
        [("9", "S", "NOWHERE", "XX")], ["store_id", "store_name", "city", "state"]
    )
    with pytest.raises(ValueError, match="Unmapped states"):
        rc.build_stores_dim(df, spark)


def test_sales_fact_derivations(spark, csv_dir):
    fact = rc.build_sales_fact(_load(spark, csv_dir, "sales", "sales_fact"))
    rows = {r["sale_id"]: r for r in fact.collect()}
    assert rows["1"]["gross_amount"] == 600.0
    assert rows["2"]["discount_amount"] == 250.0
    assert rows["2"]["net_amount"] == 4750.0
    assert rows["2"]["is_discounted"] is True
    assert rows["3"]["is_discounted"] is False  # null discount filled to 0
    assert rows["2"]["order_month"] == "2025-05"


def test_date_dim_covers_sale_range(spark, csv_dir):
    fact = rc.build_sales_fact(_load(spark, csv_dir, "sales", "sales_fact"))
    dd = rc.build_date_dim(fact)
    assert dd.count() == 49  # 2025-04-02 .. 2025-05-20 inclusive
    first = dd.orderBy("date").first()
    assert str(first["date"]) == "2025-04-02"
    assert first["quarter"] == 2
