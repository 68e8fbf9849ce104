"""T1 cleaning operator unit tests (edge cases the parity suite can't hit:
NULL PKs, dup PKs, messy column names)."""

from __future__ import annotations

from retail_sales_etl_spark.operators import cleaning


def test_normalize_column_name():
    assert cleaning.normalize_column_name("  First Name ") == "first_name"
    assert cleaning.normalize_column_name("Sale%%ID") == "sale_id"
    assert cleaning.normalize_column_name("__x__y__") == "x_y"
    assert cleaning.normalize_column_name("A1 B2") == "a1_b2"


def test_standardize_column_names(spark):
    df = spark.createDataFrame([(1, "a")], ["Cust ID", "First%Name"])
    out = cleaning.standardize_column_names(df)
    assert out.columns == ["cust_id", "first_name"]


def test_drop_null_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, None)], ["id", "val"]
    )
    out = cleaning.drop_null_keys(df, ["id"]).collect()
    assert sorted(r["id"] for r in out) == [1, 3]


def test_fill_defaults(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], ["id", "seg"])
    out = cleaning.fill_defaults(df, {"seg": "UNKNOWN", "missing_col": "z"})
    vals = {r["id"]: r["seg"] for r in out.collect()}
    assert vals == {1: "UNKNOWN", 2: "x"}


def test_dedupe_by_key_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b"), (1, "a"), (2, "c")], ["id", "val"]
    )
    out = cleaning.dedupe_by_key(df, ["id"], order_by=["val"]).collect()
    vals = {r["id"]: r["val"] for r in out}
    # "first" = lowest in the explicit total order, not scan order
    assert vals == {1: "a", 2: "c"}


def test_dedupe_sees_raw_nulls_not_filled_defaults(spark):
    """Keep-first must be decided on RAW values (NULL sorts first, as
    the oracles pin) — not on defaulted values. Rows tie on 'name' and
    differ only in seg's null-ness: the NULL row must win and then be
    defaulted, not lose to a value that sorts below the default."""
    df = spark.createDataFrame(
        [(1, "x", "AUTO"), (1, "x", None)], ["id", "name", "seg"]
    )
    out = cleaning.run_cleaning(
        df,
        primary_key=["id"],
        defaults={"seg": "UNKNOWN"},
        dedupe_order=["name", "seg"],
    ).collect()
    assert [(r["id"], r["seg"]) for r in out] == [(1, "UNKNOWN")]


def test_cast_types(spark):
    df = spark.createDataFrame([("1", "2.5")], ["a", "b"])
    out = cleaning.cast_types(df, {"a": "bigint", "b": "double"})
    assert dict(out.dtypes) == {"a": "bigint", "b": "double"}


def test_run_cleaning_end_to_end(spark):
    df = spark.createDataFrame(
        [
            (1, "x", None),
            (1, "x", None),  # dup PK
            (None, "y", "s"),  # null PK
            (2, "z", "s"),
        ],
        ["Cust ID", "name", "seg"],
    )
    out = cleaning.run_cleaning(
        df,
        primary_key=["cust_id"],
        defaults={"seg": "UNKNOWN"},
        type_map={"cust_id": "bigint"},
    )
    rows = sorted((r["cust_id"], r["seg"]) for r in out.collect())
    assert rows == [(1, "UNKNOWN"), (2, "s")]
