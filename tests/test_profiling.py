"""Heavy hitters (two-phase Misra-Gries) and key-skew profiling."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_etl_spark.operators import profiling


def _truth(df, denom):
    counts = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    total = df.count()
    return {
        r["k"]: r["n"]
        for r in counts.collect()
        if r["n"] * denom >= total
    }


def test_heavy_hitters_exact_on_skewed_data(spark):
    # key "hot" holds ~40%, "warm" ~10%, the rest uniform cold tail
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 10 < 4, F.lit("hot"))
        .when(F.col("id") % 10 == 4, F.lit("warm"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 500).cast("string")))
        .alias("k")
    )
    got = {
        r["key"]: r["n_rows"]
        for r in profiling.heavy_hitters(df, "k").collect()
    }
    assert got == _truth(df, profiling.HH_DENOM)
    assert "hot" in got and all(not k.startswith("cold") for k in got)


def test_heavy_hitters_survive_adversarial_partitioning(spark):
    # the heavy key is diluted across MANY partitions; MG must still
    # surface it from at least one
    df = spark.range(0, 20000).select(
        F.when(F.col("id") % 15 == 0, F.lit("heavy"))
        .otherwise((F.col("id") % 3000).cast("string"))
        .alias("k")
    ).repartition(32)
    got = {r["key"] for r in profiling.heavy_hitters(df, "k").collect()}
    assert got == set(_truth(df, profiling.HH_DENOM))


def test_heavy_hitters_null_key_is_reported(spark):
    """NULL can itself be a heavy hitter (e.g. a mostly-absent optional
    field); the recount semi-join must be null-safe or the candidate
    found by the MG pass is silently dropped."""
    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("c"), (F.col("id") % 400).cast("string")))
        .alias("k")
    ).repartition(8)
    got = {
        r["key"]: r["n_rows"]
        for r in profiling.heavy_hitters(df, "k").collect()
    }
    assert got == {None: 334}


def test_key_skew_profile_fields(spark, sf_dir):
    row = profiling.q_key_skew_profile(spark, sf_dir).collect()[0]
    assert row["n_keys"] > 0
    assert row["max_per_key"] >= row["p99_per_key"] >= row["p50_per_key"]
    assert row["suggested_salts"] >= 1
    assert abs(row["avg_per_key"] - row["n_rows"] / row["n_keys"]) < 1e-4


def test_skyline_prefilter_shrinks_input(spark, sf_dir):
    """The bucket prefilter must leave a survivor set orders of
    magnitude under the fact — that's the whole scale story."""
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.plans.advanced import q_skyline_orders

    n_orders = load_table(spark, sf_dir, "orders").count()
    out = q_skyline_orders(spark, sf_dir)
    # exact result (already oracle-pinned); here pin the shape instead:
    # survivors after the anti-join == true skyline, and it is tiny
    assert out.count() < max(20, n_orders // 100)


def test_mg_summary_pads_empty_and_evicted_partitions():
    """_mg_summaries must stay rectangular when the MG cut evicts every
    counter (or the partition is empty): the row count rides a cnt=0
    pad row that mg_merge skips — no NaN index-alignment, no spurious
    None counter."""
    import pandas as pd

    from retail_sales_etl_spark.operators.profiling import (
        HH_DENOM,
        _mg_summaries,
        mg_merge,
    )

    # empty partition
    out = next(iter(_mg_summaries(iter([]))))
    assert list(out.columns) == ["key", "cnt", "part_rows"]
    assert len(out) == 1
    assert out["cnt"].iloc[0] == 0 and out["part_rows"].iloc[0] == 0
    assert mg_merge({}, zip(out["key"], out["cnt"])) == {}

    # > HH_DENOM equally-frequent keys: the cut evicts everything
    pdf = pd.DataFrame({"key": [f"k{i}" for i in range(2 * HH_DENOM)]})
    out = next(iter(_mg_summaries(iter([pdf]))))
    assert out["part_rows"].sum() == 2 * HH_DENOM
    merged = mg_merge({}, zip(out["key"], out["cnt"]))
    assert merged == {}  # pad row must not materialize a counter


def test_mg_merge_skips_null_and_zero_counts():
    from retail_sales_etl_spark.operators.profiling import mg_merge

    merged = mg_merge({"a": 3}, [("b", None), ("c", float("nan")), ("d", 0), ("b", 2)])
    assert merged == {"a": 3, "b": 2}


def test_mahalanobis_matches_numpy(spark, sf_dir):
    """The closed-form scatter-matrix distance must equal the textbook
    population-covariance Mahalanobis (numpy linalg) on every reported
    row."""
    import numpy as np

    from retail_sales_etl_spark.operators.profiling import (
        q_customer_mahalanobis_outliers,
    )

    from retail_sales_etl_spark.catalog import load_table

    out = q_customer_mahalanobis_outliers(spark, sf_dir).collect()
    assert out
    feats = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("f"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            ).alias("m"),
        )
        .collect()
    )
    X = np.array([[r["f"], r["m"]] for r in feats], dtype=np.float64)
    mu = X.mean(axis=0)
    cov = np.cov(X.T, ddof=0)
    inv = np.linalg.inv(cov)
    by_key = {r["o_custkey"]: X[i] - mu for i, r in enumerate(feats)}
    for r in out:
        d = by_key[r["custkey"]]
        expected = float(d @ inv @ d)
        assert abs(r["mahalanobis_sq"] - expected) < 1e-5 * max(1.0, expected), (
            r["custkey"],
            r["mahalanobis_sq"],
            expected,
        )
    # and the report really is the global top-K: no unreported customer
    # scores above the reported minimum
    all_d2 = sorted(
        (float(v @ inv @ v) for v in by_key.values()), reverse=True
    )
    k = len(out)
    assert abs(all_d2[k - 1] - out[-1]["mahalanobis_sq"]) < 1e-5 * max(
        1.0, all_d2[k - 1]
    )


def test_theil_sen_outlier_immune(spark, tmp_path):
    """11 days at exactly +$1/day with one enormous flash-sale day:
    the Theil-Sen slope must stay exactly 100 cents/day (an OLS line
    would be dragged by orders of magnitude) and the intercept is the
    clean days' residual."""
    import datetime

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_theil_sen,
    )

    base = datetime.date(1992, 1, 1)
    rows = []
    for i in range(11):
        price = 1_000_000.0 if i == 5 else 10.0 + i
        rows.append(
            Row(
                o_orderdate=(base + datetime.timedelta(days=i)).isoformat(),
                o_totalprice=price,
            )
        )
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    (r,) = q_revenue_theil_sen(spark, d).collect()
    assert r["n_days"] == 11
    assert r["n_pairs"] == 55
    assert r["slope_cents_per_day"] == 100.0
    assert r["intercept_cents"] == 1000.0


def test_seasonal_decompose_pure_weekly_cycle(spark, tmp_path):
    """70 days of revenue = f(day-of-week) with no trend: the centered
    7-day MA is constant in the interior, so detrended == seasonal and
    the remainder vanishes -> seasonal_strength near 1 (window
    truncation at the 3-day edges keeps it just below)."""
    import datetime

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        SEASON_EPOCH,
        q_orders_seasonal_decompose,
    )

    base = datetime.date.fromisoformat(SEASON_EPOCH)
    rows = []
    for i in range(70):
        price = 100.0 + 1000.0 * (i % 7)
        rows.append(
            Row(
                o_orderdate=(base + datetime.timedelta(days=i)).isoformat(),
                o_totalprice=price,
            )
        )
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    out = q_orders_seasonal_decompose(spark, d).collect()
    assert len(out) == 7
    assert all(r["n_days"] == 10 for r in out)
    s = out[0]["seasonal_strength"]
    assert s > 0.9, s
    # seasonal indices must recover the injected cycle's ordering
    by_dow = {r["dow_idx"]: r["seasonal_cents"] for r in out}
    order = sorted(by_dow, key=lambda k: by_dow[k])
    assert order == [0, 1, 2, 3, 4, 5, 6]


def test_eb_shrinkage_flips_small_sample_ranking(spark, tmp_path):
    """2/3 returned must NOT outrank 200/400 once shrunk toward a
    low-rate prior built from many background parts."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        q_part_return_shrinkage,
    )

    rows = []
    # background: 50 parts, 40 items each, rates spread 0.1..0.3
    for p in range(50):
        k = 4 + (p % 9)  # 4..12 of 40 -> 0.10..0.30
        for i in range(40):
            rows.append(
                Row(l_partkey=1000 + p, l_returnflag="R" if i < k else "N")
            )
    # part 1: tiny sample, high raw rate
    for i in range(3):
        rows.append(Row(l_partkey=1, l_returnflag="R" if i < 2 else "N"))
    # part 2: large sample, moderately high rate
    for i in range(400):
        rows.append(Row(l_partkey=2, l_returnflag="R" if i < 200 else "N"))
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    out = {r["partkey"]: r for r in q_part_return_shrinkage(spark, d).collect()}
    a, b = out[1], out[2]
    assert a["raw_rate"] > b["raw_rate"]
    assert a["shrunk_rate"] < b["shrunk_rate"], (a, b)
    assert a["prior_strength"] > 0
    # shrinkage pulls toward the prior mean, never past it
    assert a["prior_mean"] < a["shrunk_rate"] < a["raw_rate"]


def test_holt_tracks_exact_linear_trend(spark, tmp_path):
    """On a perfectly linear series (b initialized to the true slope),
    Holt's recursion stays ON the line: every fitted value equals the
    observation, residuals are exactly 0, trend stays the slope."""
    import datetime

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        SEASON_EPOCH,
        q_revenue_holt_smoothing,
    )

    base = datetime.date.fromisoformat(SEASON_EPOCH)
    rows = [
        Row(
            o_orderdate=(base + datetime.timedelta(days=i)).isoformat(),
            o_totalprice=10.0 + 1.0 * i,  # +100 cents per day
        )
        for i in range(30)
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    out = sorted(q_revenue_holt_smoothing(spark, d).collect(),
                 key=lambda r: r["d"])
    assert len(out) == 30
    for r in out:
        assert r["resid"] == 0.0, r
        assert r["trend"] == 100.0, r
        assert r["fitted"] == float(r["v"]), r


def test_holt_single_day_returns_empty(spark, tmp_path):
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        SEASON_EPOCH,
        q_revenue_holt_smoothing,
    )

    rows = [Row(o_orderdate=SEASON_EPOCH, o_totalprice=10.0)]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    assert q_revenue_holt_smoothing(spark, d).collect() == []


def test_holt_winters_absorbs_exact_weekly_cycle(spark, tmp_path):
    """On a trendless series that is a constant plus an exact weekly
    pattern, the HW recursion locks on immediately: fitted == v and
    resid == 0 at every emitted step, level stays at the week mean,
    trend stays 0, and each seasonal slot stays at its init offset
    (the staged 6-dp rounding restores the 0.1*s + 0.9*s identity)."""
    import datetime

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        SEASON_EPOCH,
        q_revenue_holt_winters,
    )

    base = datetime.date.fromisoformat(SEASON_EPOCH)
    pattern = [700, 1400, 2100, 2800, 3500, 4200, 4900]  # cents, mean 2800
    rows = [
        Row(
            o_orderdate=(base + datetime.timedelta(days=i)).isoformat(),
            o_totalprice=(10000 + pattern[i % 7]) / 100.0,
        )
        for i in range(28)
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    out = sorted(q_revenue_holt_winters(spark, d).collect(),
                 key=lambda r: r["d"])
    assert len(out) == 21  # emission starts at position 8 of 28
    for i, r in enumerate(out):
        k = (i + 7) % 7
        assert r["resid"] == 0.0, r
        assert r["trend"] == 0.0, r
        assert r["level"] == 12800.0, r
        assert r["fitted"] == float(r["v"]), r
        assert r["seasonal"] == float(pattern[k] - 2800), r


def test_holt_winters_below_two_weeks_returns_empty(spark, tmp_path):
    import datetime

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        SEASON_EPOCH,
        q_revenue_holt_winters,
    )

    base = datetime.date.fromisoformat(SEASON_EPOCH)
    rows = [
        Row(
            o_orderdate=(base + datetime.timedelta(days=i)).isoformat(),
            o_totalprice=10.0 + i,
        )
        for i in range(13)
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    assert q_revenue_holt_winters(spark, d).collect() == []


def test_changepoint_finds_exact_level_shift(spark, tmp_path):
    """20 days at $100 then 20 days at $300: the best two-mean split
    must land exactly on the boundary (last day of the low segment),
    with the segment means recovered exactly."""
    import datetime

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        SEASON_EPOCH,
        q_revenue_changepoint,
    )

    base = datetime.date.fromisoformat(SEASON_EPOCH)
    rows = [
        Row(
            o_orderdate=(base + datetime.timedelta(days=i)).isoformat(),
            o_totalprice=100.0 if i < 20 else 300.0,
        )
        for i in range(40)
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    out = q_revenue_changepoint(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["split_d"] == 19, r
    assert r["n_left"] == 20 and r["n_right"] == 20
    assert r["mean_left"] == 10000.0 and r["mean_right"] == 30000.0


def test_changepoint_single_day_returns_empty(spark, tmp_path):
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        SEASON_EPOCH,
        q_revenue_changepoint,
    )

    rows = [Row(o_orderdate=SEASON_EPOCH, o_totalprice=42.0)]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    assert q_revenue_changepoint(spark, d).collect() == []


def test_runs_test_alternating_and_clumped_sequences(spark, tmp_path):
    """An alternating above/below-median sequence maximizes runs
    (z > 0), a clumped one minimizes them (runs = 2), and the closed
    form recovers the textbook mu/z exactly on a hand-computed case:
    values 1,10,2,11,3,12 -> median 6.5, runs 6, n1 = n2 = 3,
    mu = 4, var = 1.2, z = 2/sqrt(1.2)."""
    import datetime
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        SEASON_EPOCH,
        q_revenue_runs_test,
    )

    base = datetime.date.fromisoformat(SEASON_EPOCH)

    def write(vals, d):
        rows = [
            Row(
                o_orderdate=(base + datetime.timedelta(days=i)).isoformat(),
                o_totalprice=float(v),
            )
            for i, v in enumerate(vals)
        ]
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            f"{d}/orders.parquet"
        )

    d1 = str(tmp_path / "alt")
    write([1, 10, 2, 11, 3, 12], d1)
    (r,) = q_revenue_runs_test(spark, d1).collect()
    assert r["n_days"] == 6 and r["n_above"] == 3 and r["n_below"] == 3
    assert r["n_runs"] == 6
    assert r["mu_runs"] == 4.0
    assert abs(r["z_score"] - 2.0 / math.sqrt(1.2)) < 1e-6

    d2 = str(tmp_path / "clump")
    write([1, 2, 3, 10, 11, 12], d2)
    (r,) = q_revenue_runs_test(spark, d2).collect()
    assert r["n_runs"] == 2 and r["z_score"] < 0

    # a day exactly AT the (odd-n) median is dropped by the tie rule
    d3 = str(tmp_path / "tie")
    write([1, 2, 3, 4, 5], d3)
    (r,) = q_revenue_runs_test(spark, d3).collect()
    assert r["n_days"] == 4 and r["n_above"] == 2 and r["n_below"] == 2

    # one-sided sequence: mu/z guarded to NULL
    d4 = str(tmp_path / "flat")
    write([5, 5, 5], d4)
    (r,) = q_revenue_runs_test(spark, d4).collect()
    assert r["n_days"] == 0 and r["mu_runs"] is None and r["z_score"] is None


def test_periodogram_finds_weekly_period(spark, tmp_path):
    """A noise-free weekly revenue pattern: every period that is a
    multiple of 7 explains ALL the variance (strength ~1, equal up to
    the 6-dp staging of the per-group terms, so rank 1 is one of the
    multiples rather than a guaranteed tie-break winner), and
    non-multiples explain strictly less."""
    import datetime as dt

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        PERIOD_MAX,
        PERIOD_MIN,
        q_revenue_periodogram,
    )

    d0 = dt.date(1992, 1, 1)
    rows = [
        Row(
            o_orderdate=d0 + dt.timedelta(days=i),
            o_totalprice=1000.0 if i % 7 == 0 else 100.0,
        )
        for i in range(84)
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{d}/orders.parquet")
    got = {r.period_days: r for r in q_revenue_periodogram(spark, d).collect()}
    assert set(got) == set(range(PERIOD_MIN, PERIOD_MAX + 1))
    rank1 = next(p for p, r in got.items() if r.rank == 1)
    assert rank1 in (7, 14, 21, 28), rank1
    for p in (7, 14, 21, 28):
        assert got[p].strength > 0.999, (p, got[p].strength)
        assert got[p].rank <= 4, (p, got[p].rank)
    for p in (5, 6, 8, 9):
        assert got[p].strength < 0.5, (p, got[p].strength)
    for p, r in got.items():
        assert r.n_groups == p  # 84 days cover every residue class
        assert 0.0 <= r.strength <= 1.000001


def test_orders_revenue_ccf_engineered_lag_peak(spark, tmp_path):
    """Orders engineered so each day's revenue equals 600 * the order
    COUNT two days earlier (prices exact to the cent): the CCF must be
    EXACTLY 1.0 at lag 2 and visibly weaker at lag 0 — the lead/lag
    alignment is load-bearing, not just the correlation formula."""
    import datetime as dt

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        q_orders_revenue_ccf,
    )

    counts = [1, 2, 4, 1, 3, 5, 2, 1, 4, 3, 5, 1, 2, 4, 3, 1, 5, 2, 3, 4,
              1, 2]
    base = dt.date(1995, 1, 1)
    rows, k = [], 0
    for t, c in enumerate(counts):
        rev = 600.0 * (counts[t - 2] if t >= 2 else 1)
        for _ in range(c):
            k += 1
            rows.append(
                Row(o_orderkey=k,
                    o_orderdate=(base + dt.timedelta(days=t)).isoformat(),
                    o_totalprice=rev / c)
            )
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    out = {r["lag"]: r for r in q_orders_revenue_ccf(spark, d).collect()}
    assert out[2]["ccf"] == 1.0
    assert out[2]["n_pairs"] == len(counts) - 2
    assert out[0]["ccf"] < 0.9


def test_revenue_hurst_matches_reference_rs_walk(spark, tmp_path):
    """The operator must reproduce a literal python R/S reference on a
    crafted 512-day series (one order per day, deterministic pseudo-
    random walk prices), and the qualitative ends must hold: a
    strictly trending series is persistent (H near 1), a strictly
    alternating one anti-persistent (H well below 0.5)."""
    import datetime as dt
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        HURST_SCALES,
        q_revenue_hurst,
    )

    def ref_hurst(cents):
        pts = []
        for s in HURST_SCALES:
            rss = []
            for b in range(len(cents) // s):
                blk = cents[b * s:(b + 1) * s]
                mean = sum(blk) / s
                cum, zmin, zmax = 0.0, float("inf"), float("-inf")
                acc = 0
                for k, v in enumerate(blk, 1):
                    acc += v
                    z = acc - k * mean
                    zmin, zmax = min(zmin, z), max(zmax, z)
                std = math.sqrt(max(
                    sum(v * v for v in blk) / s - mean * mean, 0.0))
                if std > 0:
                    rss.append(
                        math.floor((zmax - zmin) / std * 1e6 + 0.5) / 1e6
                    )
            if rss and sum(rss) > 0:
                pts.append((math.log(s), math.log(sum(rss) / len(rss))))
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        return (n * sxy - sx * sy) / (n * sxx - sx * sx)

    def run(prices):
        base = dt.date(1995, 1, 1)
        rows = [
            Row(o_orderkey=t + 1,
                o_orderdate=(base + dt.timedelta(days=t)).isoformat(),
                o_totalprice=p)
            for t, p in enumerate(prices)
        ]
        d = str(tmp_path / f"h{len(prices)}_{hash(tuple(prices)) & 0xffff}")
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            f"{d}/orders.parquet"
        )
        return q_revenue_hurst(spark, d).first()

    # deterministic pseudo-random walk (LCG increments)
    x, prices = 100_000, []
    seed = 12345
    for _ in range(512):
        seed = (seed * 1103515245 + 12345) % (1 << 31)
        x += (seed % 2001) - 1000
        prices.append(max(x, 1) / 100.0)
    got = run(prices)
    want = ref_hurst([round(p * 100) for p in prices])
    assert got["n_scales"] == len(HURST_SCALES)
    assert abs(got["hurst"] - want) < 1e-4, (got["hurst"], want)

    trend = run([100.0 + t for t in range(512)])
    assert trend["hurst"] > 0.9
    alt = run([100.0 if t % 2 == 0 else 900.0 for t in range(512)])
    assert alt["hurst"] < 0.25


def test_ccf_daily_grid_matches_shared_helper(spark, sf_dir):
    """orders_revenue_ccf inlines the _daily_revenue_cents recipe
    (plus a count column): the two cents-staging disciplines must
    never drift — this is the sync guard the inline copy points to."""
    from pyspark.sql import functions as F

    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.profiling import (
        SEASON_EPOCH,
        _daily_revenue_cents,
    )

    orders = load_table(spark, sf_dir, "orders")
    helper = {
        r["d"]: r["v"] for r in _daily_revenue_cents(orders).collect()
    }
    ccf_daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit(SEASON_EPOCH).cast("date")
        ).alias("d")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).cast("bigint").alias("v")
    )
    inline = {r["d"]: r["v"] for r in ccf_daily.collect()}
    assert inline == helper


def test_mann_kendall_monotone_constant_and_hand_worked(spark, tmp_path):
    """Three calibration corpora for the trend test: a strictly
    increasing series gives S = n(n-1)/2 and tau_b = 1 exactly; a
    constant series (one all-n tie group) gives S = 0, Var(S) = 0 by
    the tie correction, z = 0; and a hand-worked 4-day series with
    one tie pins S, the tie-corrected variance, and tau_b to paper
    arithmetic."""
    import datetime
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.profiling import (
        q_revenue_mann_kendall,
    )

    base = datetime.date(1992, 1, 1)

    def _run(prices, sub):
        d = str(tmp_path / sub)
        rows = [
            Row(
                o_orderdate=(base + datetime.timedelta(days=i)).isoformat(),
                o_totalprice=p,
            )
            for i, p in enumerate(prices)
        ]
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            f"{d}/orders.parquet"
        )
        (r,) = q_revenue_mann_kendall(spark, d).collect()
        return r

    up = _run([10.0 + i for i in range(10)], "up")
    assert (up.n_days, up.s_stat) == (10, 45)  # all 45 pairs ascending
    assert up.tau_b == 1.0
    assert up.z > 3  # strongly significant

    flat = _run([7.0] * 8, "flat")
    assert (flat.n_days, flat.s_stat) == (8, 0)
    # one tie group of 8: n(n-1)(2n+5) == t(t-1)(2t+5) -> Var(S) = 0
    assert flat.var_s == 0.0 and flat.z == 0.0

    # hand-worked: v = 10, 20, 20, 15 -> pairs (12 +, 13 +, 14 +,
    # 23 tie, 24 -, 34 -) -> S = 3 - 2 = 1; ties: one group t=2 ->
    # tie3 = 2*1*9 = 18, Var = (4*3*13 - 18)/18 = 138/18; n0 = 6,
    # n1 = 1 -> tau_b = 1/sqrt(5*6)
    hw = _run([10.0, 20.0, 20.0, 15.0], "hw")
    assert (hw.n_days, hw.s_stat) == (4, 1)
    assert hw.var_s == math.floor(138.0 / 18.0 * 1e6 + 0.5) / 1e6
    assert hw.tau_b == math.floor(1.0 / math.sqrt(30.0) * 1e6 + 0.5) / 1e6
    assert hw.z == math.floor((1 - 1) / math.sqrt(138.0 / 18.0) * 1e6 + 0.5) / 1e6
