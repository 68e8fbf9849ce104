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


def test_ivm_equals_full_recompute(spark):
    """Incremental view maintenance: base(before) + delta(changes)
    must be row-identical to recomputing the aggregate over the after
    snapshot — decimal arithmetic makes that exact, not approximate."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    maintained = {
        r["o_orderpriority"]: r
        for r in cdc.q_ivm_priority_revenue(spark, sf).collect()
    }
    _, after = cdc._ivm_snapshots(spark, sf)
    full = {
        r["o_orderpriority"]: r
        for r in after.groupBy("o_orderpriority")
        .agg(
            F.sum("price").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .collect()
    }
    assert set(maintained) == set(full)
    for k in full:
        assert maintained[k]["n_orders"] == full[k]["n_orders"]
        assert maintained[k]["revenue"] == full[k]["revenue"]


def test_ivm_emptied_group_drops_out(spark):
    """A group whose maintained count reaches zero disappears, exactly
    as a full recompute would drop it."""
    from pyspark.sql import functions as F

    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, grp string, v double",
    )
    after = spark.createDataFrame(
        [(3, "b", 35.0), (4, "c", 5.0)], "id long, grp string, v double"
    )
    base = before.groupBy("grp").agg(
        F.sum(F.col("v").cast("decimal(25,6)")).cast("decimal(25,6)").alias("rev"),
        F.count(F.lit(1)).alias("n"),
    )
    ch = cdc.table_changes(before, after, ["id"], ["grp", "v"])
    adds = ch.filter(F.col("change_type").isin("insert", "update")).select(
        F.col("new_grp").alias("grp"),
        F.col("new_v").cast("decimal(25,6)").alias("rev"),
        F.lit(1).cast("bigint").alias("n"),
    )
    subs = ch.filter(F.col("change_type").isin("delete", "update")).select(
        F.col("old_grp").alias("grp"),
        (-F.col("old_v").cast("decimal(25,6)")).alias("rev"),
        F.lit(-1).cast("bigint").alias("n"),
    )
    out = {
        r["grp"]: r
        for r in base.unionByName(adds)
        .unionByName(subs)
        .groupBy("grp")
        .agg(F.sum("rev").alias("rev"), F.sum("n").alias("n"))
        .filter(F.col("n") > 0)
        .collect()
    }
    assert set(out) == {"b", "c"}  # 'a' emptied out
    assert float(out["b"]["rev"]) == 35.0 and out["b"]["n"] == 1
    assert float(out["c"]["rev"]) == 5.0 and out["c"]["n"] == 1
