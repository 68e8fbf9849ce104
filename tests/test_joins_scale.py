"""Scale utilities: skew salting (result-equality), bucketed tables,
incremental watermark loads."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_spark.control.runlog import ControlLog
from retail_sales_etl_spark.load import writers
from retail_sales_etl_spark.operators import joins


def _skewed_frames(spark):
    # 90% of the large side lands on key 1 (the hot key)
    large = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(1, "hot"), (20, "a"), (37, "b")], ["k", "label"]
    )
    return large, small


def test_salted_join_equals_plain_join(spark):
    large, small = _skewed_frames(spark)
    plain = large.join(small, ["k"], "inner")
    salted = joins.salted_join(large, small, ["k"], n_salts=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    large, small = _skewed_frames(spark)
    plain = large.join(small, ["k"], "left")
    salted = joins.salted_join(large, small, ["k"], n_salts=8, how="left")
    assert plain.count() == salted.count() == large.count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_rejects_right(spark):
    large, small = _skewed_frames(spark)
    import pytest

    with pytest.raises(ValueError, match="does not support"):
        joins.salted_join(large, small, ["k"], how="right")


def test_salted_agg_equals_plain_agg(spark):
    large, _ = _skewed_frames(spark)
    plain = large.groupBy("k").agg(
        F.sum("payload").alias("s"), F.count(F.lit(1)).alias("n")
    )
    salted = joins.salted_agg(
        large,
        ["k"],
        {"s": F.sum("payload"), "n": F.count(F.lit(1))},
        n_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_table_write(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    writers.write_bucketed_table(df, "bucketed_t", ["k"], 4, sort_by=["k"])
    back = spark.table("bucketed_t")
    assert back.count() == 100
    spark.sql("DROP TABLE bucketed_t")


def test_incremental_load_watermark(spark, tmp_path):
    control = ControlLog(str(tmp_path / "control"))
    path = str(tmp_path / "inc_table")
    batch1 = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], ["id", "d"]
    )
    r1 = writers.run_incremental_load(spark, batch1, path, "d", control, "t")
    assert r1["rows_appended"] == 2 and r1["watermark"] == "2024-01-02"

    # batch 2 overlaps batch 1: only the newer row lands
    batch2 = spark.createDataFrame(
        [(2, "2024-01-02"), (3, "2024-01-03")], ["id", "d"]
    )
    r2 = writers.run_incremental_load(spark, batch2, path, "d", control, "t")
    assert r2["rows_appended"] == 1 and r2["watermark"] == "2024-01-03"
    assert spark.read.parquet(path).count() == 3

    # idempotent rerun of the same batch appends nothing
    r3 = writers.run_incremental_load(spark, batch2, path, "d", control, "t")
    assert r3["rows_appended"] == 0
    assert spark.read.parquet(path).count() == 3


def test_merge_upsert_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["id", "v"]
    ).write.parquet(path)
    updates = spark.createDataFrame([(2, "B"), (4, "d")], ["id", "v"])
    res = writers.merge_upsert(spark, path, updates, ["id"])
    rows = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert rows == {1: "a", 2: "B", 3: "c", 4: "d"}
    assert res["rows_after"] == 4


def test_merge_upsert_partitioned_touches_only_affected_partitions(spark, tmp_path):
    import os

    path = str(tmp_path / "tp")
    spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")], ["id", "v", "day"]
    ).write.partitionBy("day").parquet(path)

    def files_in(day):
        d = os.path.join(path, f"day={day}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    d2_before = files_in("d2")
    updates = spark.createDataFrame([(2, "B", "d1"), (9, "z", "d1")], ["id", "v", "day"])
    writers.merge_upsert(spark, path, updates, ["id"], partition_by=["day"])
    rows = {r["id"]: (r["v"], r["day"]) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("a", "d1"), 2: ("B", "d1"), 3: ("c", "d2"), 9: ("z", "d1")}
    # untouched partition: same files, same mtimes (no rewrite)
    assert files_in("d2") == d2_before


def test_merge_upsert_partition_migration_drops_stale_row(spark, tmp_path):
    """An update that MOVES a key across partitions (d1->d2) must rewrite
    the old partition too, or the stale d1 row survives as a duplicate
    PK invisible to the row-count guard."""
    path = str(tmp_path / "tm")
    spark.createDataFrame(
        [(1, "a", "d1"), (2, "b", "d1"), (3, "c", "d2")], ["id", "v", "day"]
    ).write.partitionBy("day").parquet(path)
    updates = spark.createDataFrame([(1, "A", "d2")], ["id", "v", "day"])
    writers.merge_upsert(spark, path, updates, ["id"], partition_by=["day"])
    rows = {r["id"]: (r["v"], r["day"]) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("A", "d2"), 2: ("b", "d1"), 3: ("c", "d2")}


def test_merge_upsert_partition_migration_empties_partition(spark, tmp_path):
    """If the migrating key was its old partition's ONLY row, that
    partition directory must disappear entirely (dynamic overwrite alone
    never rewrites a partition absent from the written data)."""
    import os

    path = str(tmp_path / "te")
    spark.createDataFrame(
        [(1, "a", "d1"), (3, "c", "d2")], ["id", "v", "day"]
    ).write.partitionBy("day").parquet(path)
    updates = spark.createDataFrame([(1, "A", "d2")], ["id", "v", "day"])
    writers.merge_upsert(spark, path, updates, ["id"], partition_by=["day"])
    rows = {r["id"]: (r["v"], r["day"]) for r in spark.read.parquet(path).collect()}
    assert rows == {1: ("A", "d2"), 3: ("c", "d2")}
    assert not os.path.isdir(os.path.join(path, "day=d1"))


def test_bloom_prefilter_no_false_negatives_and_prunes(spark):
    # large side: ids 0..9999; build side: every 37th id (sparse)
    large = spark.range(0, 10000).select(F.col("id").alias("k"))
    keys = spark.range(0, 10000, 37).select(F.col("id").alias("bk"))
    bloom = joins.bloom_build(keys, "bk")
    passed = (
        large.join(F.broadcast(bloom))
        .where(joins.bloom_might_contain("k"))
        .drop("__bloom")
    )
    passed_keys = {r["k"] for r in passed.collect()}
    true_keys = {r["bk"] for r in keys.collect()}
    # no false negatives: every true key survives the prefilter
    assert true_keys <= passed_keys
    # prunes: the pass-set is a small superset, not the whole fact
    assert len(passed_keys) < 2 * len(true_keys)


def test_bloom_pruned_semi_join_exact(spark):
    large = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    keys = spark.range(0, 5000, 13).select(F.col("id").alias("bk"))
    out = joins.bloom_pruned_semi_join(large, keys, "k", "bk")
    plain = large.join(keys, large.k == keys.bk, "left_semi")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))


def test_bloom_pruned_semi_join_mixed_integral_widths(spark):
    """xxhash64 hashes int and bigint differently; mismatched integral
    key widths must be widened to a common type or every row would be
    (wrongly) bloom-rejected."""
    large = spark.range(0, 2000).select(F.col("id").alias("k"))  # bigint
    keys = spark.range(0, 2000, 7).select(
        F.col("id").cast("int").alias("bk")  # int on purpose
    )
    out = joins.bloom_pruned_semi_join(large, keys, "k", "bk")
    assert out.count() == keys.count()  # no false negatives


def test_bloom_pruned_semi_join_rejects_incomparable_key_types(spark):
    import pytest

    large = spark.range(0, 100).select(F.col("id").alias("k"))
    keys = spark.range(0, 100, 5).select(
        F.col("id").cast("string").alias("bk")
    )
    with pytest.raises(ValueError, match="dtypes differ"):
        joins.bloom_pruned_semi_join(large, keys, "k", "bk")


def test_static_partition_pruning_reads_only_matching_directories(
    spark, tmp_path
):
    """A literal filter on the hive partition column must reach the
    scan as a PartitionFilter — at 100 TB the difference between
    opening one day's directory and every directory — and the executed
    scan must report exactly the matching partition's row count."""
    path = str(tmp_path / "pp")
    spark.createDataFrame(
        [(i, f"d{i % 4}") for i in range(400)], ["id", "day"]
    ).write.partitionBy("day").parquet(path)
    df = spark.read.parquet(path).where(F.col("day") == "d2")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    seg = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "day" in seg and "d2" in seg, seg
    # data filters must NOT be pushed for the partition column (it is
    # pruned at planning, not row-filtered at read)
    assert df.count() == 100


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """The Spark-first star-join contract at scale: a selective filter
    on the DIM side of a join over the fact's partition column must
    inject a dynamicpruning subquery into the fact scan (DPP), so only
    the surviving partitions are read even though the filter value is
    unknown at planning time."""
    path = str(tmp_path / "dpp_fact")
    spark.createDataFrame(
        [(i, i % 8) for i in range(800)], ["rev", "day_key"]
    ).write.partitionBy("day_key").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(k, "keep" if k == 3 else "drop") for k in range(8)],
        ["day_key", "label"],
    )
    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
    )
    try:
        joined = fact.join(dim, "day_key").where(F.col("label") == "keep")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "dynamicpruningexpression" in plan, plan
        assert joined.count() == 100
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )
