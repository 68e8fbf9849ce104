"""Change-feed semantics: insert/update/delete detection, null-safety."""

from __future__ import annotations

from retail_sales_etl_spark.operators import cdc


def test_table_changes_classifies_and_drops_unchanged(spark):
    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id long, v string, x double",
    )
    after = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        "id long, v string, x double",
    )
    rows = {
        r["id"]: r
        for r in cdc.table_changes(before, after, ["id"]).collect()
    }
    # id=1 unchanged -> absent; 2 value-update; 3 NULL->value update;
    # 4 deleted; 5 inserted
    assert set(rows) == {2, 3, 4, 5}
    assert rows[2]["change_type"] == "update"
    assert (rows[2]["old_v"], rows[2]["new_v"]) == ("b", "B")
    assert rows[3]["change_type"] == "update"
    assert (rows[3]["old_x"], rows[3]["new_x"]) == (None, 30.0)
    assert rows[4]["change_type"] == "delete"
    assert rows[4]["new_v"] is None and rows[4]["old_v"] == "d"
    assert rows[5]["change_type"] == "insert"
    assert rows[5]["old_v"] is None and rows[5]["new_v"] == "e"


def test_table_changes_compare_subset(spark):
    """Columns outside compare_cols do not trigger updates."""
    before = spark.createDataFrame([(1, "a", 1.0)], "id long, v string, x double")
    after = spark.createDataFrame([(1, "a", 9.0)], "id long, v string, x double")
    assert cdc.table_changes(before, after, ["id"], ["v"]).count() == 0
