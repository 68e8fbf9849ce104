"""Join strategy utilities for scale: skew salting and co-located joins.

AQE's skew-join splitting handles most skew automatically (enabled in
``session.get_spark``), but two cases still need explicit treatment at
100 TB:

- ``salted_join``: an aggregation-free join where one key dominates
  (e.g. a null-like sentinel key holding 30% of a fact). Salting
  explodes the small side R ways and scatters the large side across
  R sub-keys, turning one straggler partition into R even ones.
- ``salted_agg``: two-phase aggregation for skewed group keys —
  partial agg on (key, salt), final agg on key. The partial combine
  bounds any single reducer's input to ~1/R of the hot key.

Both are pure DataFrame transforms (deterministic salts from a hash,
not a RNG) so results are exactly equal to the unsalted plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Deterministic salt 0..n_salts-1 derived from the full row hash.

    Hash-derived (not random) so retries/recomputes of a partition
    produce identical salts — required for exactly-once semantics under
    task retry.
    """
    cols = [F.col(c) for c in df.columns]
    return df.withColumn(col_name, F.pmod(F.hash(*cols), F.lit(n_salts)))


def explode_salts(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Replicate every row once per salt value (the small-side dual of
    ``with_salt``)."""
    return df.withColumn(
        col_name, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: scatter ``large`` over salted sub-keys,
    replicate ``small`` across all salts, join on (keys + salt).

    Result equals ``large.join(small, on, how)`` exactly; the shuffle
    key cardinality is multiplied by ``n_salts`` so a hot key spreads
    over ``n_salts`` reducers. Large-side-preserving joins only: a
    right/full join would emit replicated unmatched small rows.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}")
    salted_large = with_salt(large, n_salts)
    salted_small = explode_salts(small, n_salts)
    out = salted_large.join(salted_small, [*on, "__salt"], how)
    return out.drop("__salt")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for algebraic aggregates.

    ``aggs`` maps output column -> SUM/COUNT-decomposable partial
    expression; phase 1 groups on (keys + salt), phase 2 re-sums on
    keys. Supported shapes: sums and counts (re-summed exactly).
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


# Bloom sizing for the demo query: 2^16 bits / 5 hashes ~ 7e-5 FPR at
# ~2k build keys. At real scale, size m to the build-side cardinality.
BLOOM_LOG2_BITS = 16
BLOOM_K = 5


def bloom_build(keys: DataFrame, key: str, m_log2: int = BLOOM_LOG2_BITS,
                k: int = BLOOM_K) -> DataFrame:
    """Distributed Bloom-filter build: a 1-row DataFrame holding the
    filter as map<word_idx, 64-bit word>.

    Fully distributed — bit positions are computed map-side, OR-folded
    per word with a partial-aggregating bit_or, and only the final
    (word, bits) entries (<= m/64 rows) concentrate into the 1-row map.
    No driver collect: the filter travels as a broadcast scalar row,
    the same pattern Spark itself uses for runtime bloom pruning
    (spark.sql.optimizer.runtime.bloomFilter), expressed here in the
    DataFrame API so the pruned plan is explicit and testable.
    """
    m = 1 << m_log2
    pos = [
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m)) for i in range(k)
    ]
    return (
        keys.select(F.explode(F.array(*pos)).alias("pos"))
        .distinct()
        .select(
            F.shiftrightunsigned("pos", 6).alias("word"),
            F.expr("shiftleft(1L, CAST(pmod(pos, 64) AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias(
                "__bloom"
            )
        )
    )


def bloom_might_contain(key: str, bloom: str = "__bloom",
                        m_log2: int = BLOOM_LOG2_BITS, k: int = BLOOM_K):
    """Membership predicate (pure Catalyst, codegen-able): true when all
    k probed bits are set. No false negatives by construction."""
    m = 1 << m_log2
    tests = []
    for i in range(k):
        p = f"pmod(xxhash64({key}, {i}), {m}L)"
        word = f"shiftrightunsigned({p}, 6)"
        bit = f"CAST(pmod({p}, 64) AS INT)"
        tests.append(
            f"(coalesce(element_at({bloom}, {word}), 0L)"
            f" & shiftleft(1L, {bit})) != 0"
        )
    return F.expr(" AND ".join(tests))


def bloom_pruned_semi_join(
    large: DataFrame, keys: DataFrame, large_key: str, build_key: str
) -> DataFrame:
    """Exact semi-join with a Bloom pre-filter on the large side.

    The broadcast filter discards non-matching fact rows BEFORE the
    semi-join's exchange — at 100 TB, when the build side is too big to
    broadcast-join outright (so the semi-join must shuffle both sides),
    the few-KB bloom still broadcasts and typically removes >95% of the
    fact from the shuffle. False positives are removed by the real
    semi-join, so the result is exactly ``large SEMI JOIN keys``.

    xxhash64 is TYPE-sensitive (int, bigint, and string hash the same
    logical value differently), so the no-false-negatives guarantee
    requires both key columns to hash identically: mismatched integral
    types are widened to bigint on BOTH sides of the bloom; any other
    dtype mismatch raises instead of silently dropping matching rows.
    """
    integral = {"tinyint", "smallint", "int", "bigint"}
    large_t = dict(large.dtypes)[large_key]
    build_t = dict(keys.dtypes)[build_key]
    if large_t == build_t:
        build_side = keys.select(build_key)
        probe_key = large_key
    elif large_t in integral and build_t in integral:
        build_side = keys.select(
            F.col(build_key).cast("bigint").alias(build_key)
        )
        probe_key = f"CAST({large_key} AS BIGINT)"
    else:
        raise ValueError(
            f"bloom key dtypes differ ({large_key}: {large_t} vs "
            f"{build_key}: {build_t}); xxhash64 hashes them differently, "
            "which would drop matching rows — cast to a common type first"
        )
    bloom = bloom_build(build_side, build_key)
    pruned = (
        large.join(F.broadcast(bloom))
        .where(bloom_might_contain(probe_key))
        .drop("__bloom")
    )
    return pruned.join(
        keys, pruned[large_key] == keys[build_key], "left_semi"
    )


def q_bloom_pruned_revenue(spark, sf_dir):
    """Revenue of lineitems belonging to urgent high-value orders,
    with the fact side bloom-pruned before the semi-join shuffle.

    Oracle ignores the bloom entirely (plain semi-join + GROUP BY):
    since the bloom admits no false negatives and the semi-join removes
    its false positives, any divergence is a filter bug.
    """
    from ..catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    urgent = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_totalprice") > 150000)
    ).select("o_orderkey")
    matched = bloom_pruned_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(25,6)")
    return (
        matched.select("l_returnflag", rev.alias("rev_dec"))
        .groupBy("l_returnflag")
        .agg(
            F.sum("rev_dec").alias("rev_sum"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.col("l_returnflag").alias("return_flag"),
            F.col("rev_sum").cast("double").alias("revenue"),
            F.col("n_lines").cast("bigint").alias("n_lines"),
        )
    )


def q_salted_flag_revenue(spark, sf_dir):
    """Skew-safe revenue rollup on a 3-value group key (returnflag).

    A 3-key groupBy concentrates the whole fact on 3 reducers; the
    salted two-phase agg spreads each hot key over n_salts partial
    groups first, so no reducer sees more than ~1/n_salts of a key.
    Result is EXACTLY the plain GROUP BY (decimal partials re-sum
    associatively) — which is what the DuckDB oracle runs.
    """
    from ..catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ).cast("decimal(25,6)")
    rows = li.select("l_returnflag", rev.alias("rev_dec"))
    agged = salted_agg(
        rows,
        ["l_returnflag"],
        {"rev_dec": F.sum("rev_dec"), "n_lines": F.count(F.lit(1))},
    )
    return agged.select(
        F.col("l_returnflag").alias("return_flag"),
        F.col("rev_dec").cast("double").alias("revenue"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
    )


QUERIES = {
    "salted_flag_revenue": q_salted_flag_revenue,
    "bloom_pruned_revenue": q_bloom_pruned_revenue,
}

ORACLE = {
    "bloom_pruned_revenue": """
        SELECT l_returnflag AS return_flag,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 150000
        )
        GROUP BY 1
    """,
    "salted_flag_revenue": """
        SELECT l_returnflag AS return_flag,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        GROUP BY 1
    """,
}
