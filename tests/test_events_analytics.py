"""Behavioral pins for the events-analytics additions: EWMA smoothing
and time-decay attribution (the oracle-parity suite covers hash
equality; these pin the closed-form semantics on crafted inputs)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Row


def _write_events(spark, path, rows):
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{path}/events.parquet"
    )


def test_ewma_constant_series_is_flat(spark, tmp_path):
    """A constant daily series has EWMA == the constant on every day
    (adjust=True normalizes the weights away)."""
    from retail_sales_etl_spark.operators.events import q_events_ewma

    rows = [
        Row(event_id=d * 3 + i, ts=datetime(2024, 1, 1 + d, 10),
            user_id=1, event_type="click", value=1.0, props="{}")
        for d in range(10) for i in range(3)
    ]
    _write_events(spark, str(tmp_path), rows)
    got = q_events_ewma(spark, str(tmp_path)).collect()
    assert len(got) == 10
    assert all(r.cnt == 3 and r.ewma == 3.0 for r in got)


def test_ewma_step_series_halves_toward_new_level(spark, tmp_path):
    """alpha=1/2 adjusted EWMA after a 0->N step: day t has
    s_t = sum(w*x)/sum(w) with exact power-of-two weights."""
    from retail_sales_etl_spark.operators.events import q_events_ewma

    # day 1: 1 event, day 2: 1 event, day 3: 4 events
    rows = []
    eid = 0
    for day, n in [(1, 1), (2, 1), (3, 4)]:
        for _ in range(n):
            rows.append(Row(event_id=eid, ts=datetime(2024, 1, day, 12),
                            user_id=1, event_type="view", value=0.0,
                            props="{}"))
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {r.day.isoformat(): r.ewma
           for r in q_events_ewma(spark, str(tmp_path)).collect()}
    assert got["2024-01-01"] == 1.0
    # (0.5*1 + 1*1) / 1.5 = 1.0
    assert got["2024-01-02"] == 1.0
    # (0.25*1 + 0.5*1 + 1*4) / 1.75 = 4.75/1.75
    assert abs(got["2024-01-03"] - 4.75 / 1.75) < 1e-6


def test_attribution_shares_sum_to_purchase_value(spark, tmp_path):
    """Two clicks 1 and 11 minutes before a 100.0 purchase split its
    value 2^10 : 1 after per-minute halving; shares sum to the full
    value and the out-of-window click earns nothing."""
    from retail_sales_etl_spark.operators.events import (
        q_attribution_time_decay,
    )

    rows = [
        Row(event_id=1, ts=datetime(2024, 1, 1, 12, 0, 0), user_id=7,
            event_type="purchase", value=100.0, props="{}"),
        Row(event_id=2, ts=datetime(2024, 1, 1, 11, 59, 0), user_id=7,
            event_type="click", value=0.0, props="{}"),
        Row(event_id=3, ts=datetime(2024, 1, 1, 11, 49, 0), user_id=7,
            event_type="click", value=0.0, props="{}"),
        # 40 min before: outside the 30-min window
        Row(event_id=4, ts=datetime(2024, 1, 1, 11, 20, 0), user_id=7,
            event_type="click", value=0.0, props="{}"),
        # another user's click: never joined
        Row(event_id=5, ts=datetime(2024, 1, 1, 11, 59, 0), user_id=8,
            event_type="click", value=0.0, props="{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = q_attribution_time_decay(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.user_id == 7 and r.n_purchases == 1 and r.n_touches == 2
    assert abs(r.attributed_value - 100.0) < 1e-4


def test_revenue_trend_single_day_nation_yields_null_not_nan(spark, tmp_path):
    """A nation whose orders all land on one day has a zero OLS
    denominator: slope/intercept must be NULL (matching DuckDB's
    0/0 semantics), never NaN."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.plans.behavioral import (
        q_nation_revenue_trend,
    )

    d = str(tmp_path)
    spark.createDataFrame(
        [Row(o_orderkey=1, o_custkey=1, o_orderdate="1995-01-05",
             o_totalprice=10.0),
         Row(o_orderkey=2, o_custkey=1, o_orderdate="1995-01-05",
             o_totalprice=20.0),
         Row(o_orderkey=3, o_custkey=2, o_orderdate="1995-01-05",
             o_totalprice=5.0),
         Row(o_orderkey=4, o_custkey=2, o_orderdate="1995-01-08",
             o_totalprice=9.0)]
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [Row(c_custkey=1, c_nationkey=10), Row(c_custkey=2, c_nationkey=20)]
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [Row(n_nationkey=10, n_name="ONEDAY"),
         Row(n_nationkey=20, n_name="TWODAY")]
    ).write.mode("overwrite").parquet(f"{d}/nation.parquet")
    got = {r["nation_name"]: r
           for r in q_nation_revenue_trend(spark, d).collect()}
    assert got["ONEDAY"]["n_days"] == 1
    assert got["ONEDAY"]["slope"] is None
    assert got["ONEDAY"]["intercept"] is None
    # two observed days: slope = (9-5)/3 days, exact
    assert abs(got["TWODAY"]["slope"] - 4.0 / 3.0) < 1e-5


def test_events_pattern_match_planted_sequences(spark, tmp_path):
    """Planted per-user sequences must match exactly the patterns they
    were built for — including the negative condition (an error
    BETWEEN view and purchase kills clean_conversion, an error before
    the view does not)."""
    import datetime as dt

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.events import (
        q_events_pattern_match,
    )

    t0 = dt.datetime(2024, 1, 1)
    seqs = {
        1: ["view", "click", "purchase"],          # clean
        2: ["view", "error", "click", "purchase"], # error inside -> dirty
        3: ["error", "view", "click", "purchase"], # error BEFORE view -> clean, + recovery
        4: ["signup", "view", "purchase"],         # activation, no click -> not clean
        5: ["view", "click"],                      # no purchase
    }
    rows = []
    eid = 0
    for uid, types in seqs.items():
        for i, t in enumerate(types):
            eid += 1
            rows.append(
                Row(
                    event_id=eid,
                    ts=t0 + dt.timedelta(minutes=i),
                    user_id=uid,
                    event_type=t,
                    value=1.0,
                    props="{}",
                )
            )
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    got = {r["pattern"]: r for r in q_events_pattern_match(spark, d).collect()}
    assert got["clean_conversion"]["n_matched"] == 2      # users 1, 3
    assert got["error_then_purchase"]["n_matched"] == 2   # users 2, 3
    assert got["signup_to_purchase"]["n_matched"] == 1    # user 4
    assert all(r["n_users"] == 5 for r in got.values())


def test_part_abc_two_phase_prefix_sum_matches_naive(spark, tmp_path):
    """The band-grid prefix-sum classification must equal a naive
    Python cumsum over the same revenue ranking, including the
    crossing-part-starts-before-boundary rule."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.plans.analytics import (
        ABC_A_SHARE,
        ABC_B_SHARE,
        q_part_abc_classes,
    )

    # revenues spanning several 10k bands with in-band ties
    rows = []
    for pk in range(1, 61):
        rows.append(
            Row(
                l_partkey=pk,
                l_extendedprice=float(1000 * ((pk % 7) + 1) * (pk % 11 + 1)),
                l_discount=0.1,
            )
        )
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    revs = sorted(
        ((r.l_extendedprice * 0.9, r.l_partkey) for r in rows),
        key=lambda t: (-t[0], t[1]),
    )
    total = sum(r for r, _ in revs)
    cum, exp = 0.0, {"A": [0, 0.0], "B": [0, 0.0], "C": [0, 0.0]}
    for r, pk in revs:
        cls = (
            "A"
            if cum < ABC_A_SHARE * total
            else ("B" if cum < ABC_B_SHARE * total else "C")
        )
        exp[cls][0] += 1
        exp[cls][1] += r
        cum += r
    got = {r["abc_class"]: r for r in q_part_abc_classes(spark, d).collect()}
    for cls, (n, rev_sum) in exp.items():
        if n == 0:
            assert cls not in got
            continue
        assert got[cls]["n_parts"] == n, cls
        assert abs(got[cls]["class_revenue"] - round(rev_sum, 2)) < 0.01
    assert abs(sum(r["revenue_share"] for r in got.values()) - 1.0) < 1e-5


def test_events_props_rollup_handles_corrupt_json(spark, tmp_path):
    """Missing and corrupt JSON payloads count toward n_events but not
    the k statistics."""
    import datetime as dt

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.events import (
        q_events_props_rollup,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        Row(event_id=1, ts=t0, user_id=1, event_type="view", value=1.0,
            props='{"k": 10}'),
        Row(event_id=2, ts=t0, user_id=1, event_type="view", value=1.0,
            props='{"k": 30}'),
        Row(event_id=3, ts=t0, user_id=1, event_type="view", value=1.0,
            props="not json"),
        Row(event_id=4, ts=t0, user_id=1, event_type="view", value=1.0,
            props=None),
        Row(event_id=5, ts=t0, user_id=1, event_type="view", value=1.0,
            props='{"other": 1}'),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    got = q_events_props_rollup(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 5
    assert r["n_with_k"] == 2
    assert r["avg_k"] == 20.0
    assert (r["min_k"], r["max_k"]) == (10, 30)


def test_dp_revenue_matches_python_mechanism_and_clips(spark, tmp_path):
    """The release must equal a Python recompute of clip -> sum ->
    hash-Laplace, and the clip must actually bound a whale line item's
    influence."""
    import hashlib
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.plans.analytics import (
        DP_CLIP,
        DP_EPSILON,
        _DP_SALT,
        q_dp_revenue_by_nation,
    )

    lines = [
        Row(l_orderkey=1, l_extendedprice=1000.0, l_discount=0.0),
        Row(l_orderkey=1, l_extendedprice=10_000_000.0, l_discount=0.0),
        Row(l_orderkey=2, l_extendedprice=2000.0, l_discount=0.5),
    ]
    orders = [Row(o_orderkey=1, o_custkey=1), Row(o_orderkey=2, o_custkey=2)]
    customers = [Row(c_custkey=1, c_nationkey=0), Row(c_custkey=2, c_nationkey=1)]
    nations = [Row(n_nationkey=0, n_name="ALPHA"), Row(n_nationkey=1, n_name="BETA")]
    d = str(tmp_path)
    for name, rows in [
        ("lineitem", lines),
        ("orders", orders),
        ("customer", customers),
        ("nation", nations),
    ]:
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            f"{d}/{name}.parquet"
        )

    def lap(nation):
        u = (
            int(hashlib.md5(f"{_DP_SALT}{nation}".encode()).hexdigest()[:8], 16)
            + 1.0
        ) / float(0x100000000 + 1)
        v = u - 0.5
        return -(DP_CLIP / DP_EPSILON) * math.copysign(1.0, v) * math.log(
            1.0 - 2.0 * abs(v)
        )

    exp = {
        "ALPHA": round(1000.0 + DP_CLIP + lap("ALPHA"), 2),  # whale clipped
        "BETA": round(1000.0 + lap("BETA"), 2),
    }
    got = {
        r["nation_name"]: r["dp_revenue_demo"]
        for r in q_dp_revenue_by_nation(spark, d).collect()
    }
    assert got == exp


def test_km_survival_is_monotone_and_respects_censoring(spark, sf_dir):
    """The KM curve must be non-increasing in [0,1], risk sets must
    telescope (n_risk(t) = deaths+censored at or after t), and with
    censoring present the curve must end ABOVE the naive
    everything-dies empirical survival at the last death time."""
    from retail_sales_etl_spark.operators.events import (
        q_session_km_survival,
    )

    rows = sorted(
        q_session_km_survival(spark, sf_dir).collect(),
        key=lambda r: r["duration_sec"],
    )
    assert rows
    total = rows[0]["n_risk"]
    assert total == sum(r["n_death"] + r["n_censored"] for r in rows)
    last = 1.0
    running = 0
    for r in rows:
        assert 0.0 <= r["survival"] <= last + 1e-9
        last = r["survival"]
        assert r["n_risk"] == total - running
        running += r["n_death"] + r["n_censored"]
    assert sum(r["n_censored"] for r in rows) > 0  # censoring occurs


def test_attribution_position_u_shape_and_oracle_on_multi_touch(
    spark, tmp_path
):
    """The driver testdata has only single-touch purchases, so the
    oracle gate never exercises the n>=2 U-shape branches. Craft
    purchases with 1/2/3/5 touches, pin the closed-form weights
    (100%, 50/50, 40/20/40, 40/6.67x3/40), and hash-compare Spark vs
    the DuckDB oracle on the SAME staged table so the CASE-branch
    float semantics are proven engine-identical where it matters."""
    import math

    import duckdb

    from retail_sales_etl_spark.operators.events import (
        ORACLE,
        q_attribution_position,
    )

    rows, eid = [], 0

    def touch(user, minute):
        nonlocal eid
        eid += 1
        rows.append(
            Row(event_id=eid, ts=datetime(2024, 1, 1, 10, minute),
                user_id=user, event_type="click", value=0.0, props="{}")
        )

    def purchase(user, minute, value):
        nonlocal eid
        eid += 1
        rows.append(
            Row(event_id=eid, ts=datetime(2024, 1, 1, 10, minute),
                user_id=user, event_type="purchase", value=value,
                props="{}")
        )

    touch(1, 0); purchase(1, 5, 100.0)                       # 1 touch
    touch(2, 0); touch(2, 1); purchase(2, 5, 100.0)          # 2 touches
    touch(3, 0); touch(3, 1); touch(3, 2); purchase(3, 5, 100.0)
    for m in range(5):                                       # 5 touches
        touch(4, m)
    purchase(4, 10, 100.0)
    _write_events(spark, str(tmp_path), rows)

    got = {r.user_id: r for r in
           q_attribution_position(spark, str(tmp_path)).collect()}
    assert math.isclose(got[1].attributed_value, 100.0)
    assert math.isclose(got[2].attributed_value, 100.0)
    assert math.isclose(got[3].attributed_value, 100.0)
    # 5 touches: 0.4 + 3 * round6(100*0.2/3) + 0.4 — the 6-dp
    # half-up staging moves each middle share by <= 0.5e-6
    # (100*0.2/3 = 6.666666... rounds UP to 6.666667)
    assert abs(got[4].attributed_value - 100.0) <= 5e-7 * 5
    assert got[4].n_touches == 5 and got[4].n_purchases == 1

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    oracle = {r[0]: r for r in
              con.execute(ORACLE["attribution_position"]).fetchall()}
    for uid, r in got.items():
        o = oracle[uid]
        assert (r.n_purchases, r.n_touches) == (o[1], o[2]), (uid, r, o)
        assert repr(float(r.attributed_value)) == repr(float(o[3])), (
            uid, r.attributed_value, o[3])


def test_entropy_rate_deterministic_chain_is_zero(spark, tmp_path):
    """A strictly alternating a->b->a->b stream has a deterministic
    next-event: entropy rate exactly 0, predictability exactly 1."""
    import datetime

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.events import (
        q_events_entropy_rate,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append(
            Row(
                event_id=i,
                ts=base + datetime.timedelta(seconds=10 * i),
                user_id=1,
                event_type="a" if i % 2 == 0 else "b",
                value=1.0,
                props="{}",
            )
        )
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    (r,) = q_events_entropy_rate(spark, d).collect()
    assert r["n_transitions"] == 39
    assert r["n_states"] == 2
    assert r["entropy_rate_nats"] == 0.0
    assert r["predictability"] == 1.0


def test_entropy_rate_counts_target_only_states(spark, tmp_path):
    """States that appear only as transition TARGETS must enter the
    normalizer: a->b and a->c with equal counts has H = ln 2 over a
    3-state alphabet -> norm = ln2/ln3, predictability strictly
    inside (0, 1) — the pre-fix normalizer (from-states only, S=1)
    reported predictability 1.0 here."""
    import datetime
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.events import (
        q_events_entropy_rate,
    )

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(10):
        # a -> b for even users, a -> c for odd: only 'a' has outgoing
        for i, t in enumerate(("a", "b" if u % 2 == 0 else "c")):
            rows.append(
                Row(
                    event_id=eid,
                    ts=base + datetime.timedelta(seconds=10 * i),
                    user_id=u,
                    event_type=t,
                    value=1.0,
                    props="{}",
                )
            )
            eid += 1
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    (r,) = q_events_entropy_rate(spark, d).collect()
    assert r["n_states"] == 3
    assert abs(r["entropy_rate_nats"] - math.log(2)) < 1e-5
    assert abs(r["norm_entropy"] - math.log(2) / math.log(3)) < 1e-5
    assert 0 < r["predictability"] < 1


def test_brand_price_elasticity_recovers_exact_loglog_slope(spark, tmp_path):
    """A brand whose observations lie EXACTLY on ln q = 4 - 2 ln p must
    fit elasticity ~ -2 with r2 ~ 1; a brand with constant quantity at
    varying price fits elasticity 0; a brand below the min-obs
    threshold is dropped."""
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.plans.analytics import (
        ELASTICITY_MIN_OBS,
        q_brand_price_elasticity,
    )

    li, parts = [], []
    parts.append(Row(p_partkey=1, p_brand="ELASTIC"))
    parts.append(Row(p_partkey=2, p_brand="FLAT"))
    parts.append(Row(p_partkey=3, p_brand="TINY"))
    k = 0
    for i in range(ELASTICITY_MIN_OBS + 5):
        p = 2.0 + i * 0.25
        q = math.exp(4.0 - 2.0 * math.log(p))
        li.append(
            Row(l_orderkey=(k := k + 1), l_partkey=1,
                l_quantity=q, l_extendedprice=p * q)
        )
        li.append(
            Row(l_orderkey=(k := k + 1), l_partkey=2,
                l_quantity=7.0, l_extendedprice=(3.0 + i * 0.5) * 7.0)
        )
    li.append(Row(l_orderkey=(k := k + 1), l_partkey=3,
                  l_quantity=1.0, l_extendedprice=5.0))
    d = str(tmp_path)
    spark.createDataFrame(li).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    spark.createDataFrame(parts).write.mode("overwrite").parquet(
        f"{d}/part.parquet"
    )
    out = {r["p_brand"]: r for r in q_brand_price_elasticity(spark, d).collect()}
    assert set(out) == {"ELASTIC", "FLAT"}
    assert abs(out["ELASTIC"]["elasticity"] + 2.0) < 1e-4, out["ELASTIC"]
    assert out["ELASTIC"]["r2"] > 0.9999
    assert abs(out["FLAT"]["elasticity"]) < 1e-6
    assert out["FLAT"]["r2"] == 0.0  # zero y-variance -> guarded 0


def test_cohort_ltv_exact_cohorts_and_cumulative(spark, tmp_path):
    """Three customers, two cohorts, a year boundary: A and C acquire
    in 1992-12 (cohort size 2), B in 1993-02. A orders again in
    1993-01 (months_since=1 ACROSS the year boundary — month-key
    arithmetic, not same-year month subtraction) and 1993-02; every
    n_active / revenue / cumulative / ltv cell is pinned exactly."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.plans.behavioral import q_cohort_ltv

    rows = [
        Row(o_custkey=1, o_orderdate="1992-12-05", o_totalprice=10.0),
        Row(o_custkey=1, o_orderdate="1992-12-20", o_totalprice=5.0),
        Row(o_custkey=1, o_orderdate="1993-01-03", o_totalprice=7.0),
        Row(o_custkey=1, o_orderdate="1993-02-14", o_totalprice=20.0),
        Row(o_custkey=3, o_orderdate="1992-12-31", o_totalprice=1.0),
        Row(o_custkey=2, o_orderdate="1993-02-01", o_totalprice=40.0),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    out = {
        (r["cohort_month"].isoformat(), r["months_since"]): r
        for r in q_cohort_ltv(spark, d).collect()
    }
    assert set(out) == {
        ("1992-12-01", 0),
        ("1992-12-01", 1),
        ("1992-12-01", 2),
        ("1993-02-01", 0),
    }
    r0 = out[("1992-12-01", 0)]
    assert r0["n_active"] == 2 and r0["cohort_size"] == 2
    assert r0["revenue"] == 16.0 and r0["cum_revenue"] == 16.0
    assert r0["ltv"] == 8.0
    r1 = out[("1992-12-01", 1)]
    assert r1["n_active"] == 1 and r1["cohort_size"] == 2
    assert r1["revenue"] == 7.0 and r1["cum_revenue"] == 23.0
    assert r1["ltv"] == 11.5
    r2 = out[("1992-12-01", 2)]
    assert r2["n_active"] == 1 and r2["cohort_size"] == 2
    assert r2["revenue"] == 20.0 and r2["cum_revenue"] == 43.0
    assert r2["ltv"] == 21.5
    rb = out[("1993-02-01", 0)]
    assert rb["n_active"] == 1 and rb["cohort_size"] == 1
    assert rb["revenue"] == 40.0 and rb["ltv"] == 40.0


def test_burstiness_regular_poisson_and_degenerate_users(spark, tmp_path):
    """Hand-worked Goh-Barabási B: a perfectly regular user (equal
    gaps) scores -1, gaps (0, 30) score exactly 0 (sigma == mu), a
    single-event user (no variance possible) is excluded, and an
    all-zero-gap user (sigma + mu = 0) yields NULL."""
    from datetime import timedelta

    from retail_sales_etl_spark.operators.events import (
        q_events_burstiness,
    )

    t0 = datetime(2024, 1, 1, 10)
    rows = []
    # user 1: gaps 10, 10, 10 -> sigma 0, mu 10 -> B = -1
    for i, off in enumerate([0, 10, 20, 30]):
        rows.append(Row(event_id=100 + i, ts=t0 + timedelta(seconds=off),
                        user_id=1, event_type="c", value=1.0, props="{}"))
    # user 2: gaps 0, 30 -> mu 15, sigma 15 -> B = 0
    for i, off in enumerate([0, 0, 30]):
        rows.append(Row(event_id=200 + i, ts=t0 + timedelta(seconds=off),
                        user_id=2, event_type="c", value=1.0, props="{}"))
    # user 3: one event -> no gaps -> excluded
    rows.append(Row(event_id=300, ts=t0, user_id=3, event_type="c",
                    value=1.0, props="{}"))
    # user 4: three simultaneous events -> gaps 0, 0 -> B NULL
    for i in range(3):
        rows.append(Row(event_id=400 + i, ts=t0, user_id=4,
                        event_type="c", value=1.0, props="{}"))
    _write_events(spark, str(tmp_path), rows)
    got = {r.user_id: r for r in q_events_burstiness(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1].n_gaps == 3 and got[1].mean_gap_s == 10.0
    assert got[1].std_gap_s == 0.0 and got[1].burstiness == -1.0
    assert got[2].mean_gap_s == 15.0 and got[2].std_gap_s == 15.0
    assert got[2].burstiness == 0.0
    assert got[4].burstiness is None and got[4].mean_gap_s == 0.0


def test_gap_memory_alternating_chained_and_degenerate(spark, tmp_path):
    """Hand-worked memory coefficient: perfectly alternating gaps
    score M = -1, chained gaps (0,0,10,10) score +0.5 by the Pearson
    arithmetic, constant gaps (zero variance) yield NULL, and a user
    with fewer than 2 consecutive pairs is excluded."""
    from datetime import timedelta

    from retail_sales_etl_spark.operators.events import (
        q_events_gap_memory,
    )

    t0 = datetime(2024, 1, 1, 10)

    def _user(uid, offsets, base):
        return [
            Row(event_id=base + i, ts=t0 + timedelta(seconds=off),
                user_id=uid, event_type="c", value=1.0, props="{}")
            for i, off in enumerate(offsets)
        ]

    rows = []
    # user 1: gaps 10,0,10,0 -> pairs (10,0),(0,10),(10,0) -> M = -1
    rows += _user(1, [0, 10, 10, 20, 20], 100)
    # user 2: gaps 0,0,10,10 -> pairs (0,0),(0,10),(10,10) -> M = +0.5
    rows += _user(2, [0, 0, 0, 10, 20], 200)
    # user 3: constant gaps 5,5,5 -> zero variance -> NULL
    rows += _user(3, [0, 5, 10, 15], 300)
    # user 4: two events -> one gap, zero pairs -> excluded
    rows += _user(4, [0, 7], 400)
    _write_events(spark, str(tmp_path), rows)
    got = {r.user_id: r for r in q_events_gap_memory(spark, str(tmp_path)).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_pairs == 3 and got[1].memory_coeff == -1.0
    assert got[2].memory_coeff == 0.5
    assert got[3].memory_coeff is None


def test_supplier_leadtime_profile_exact_interpolation(spark, tmp_path):
    """Hand-worked percentile interpolation: supplier 1 ships two items
    0 and 10 days after order placement — linear interpolation at rank
    p*(n-1) gives p25=2.5 / p50=5 / p75=7.5 / p90=9; supplier 2's four
    identical 4-day leads collapse every percentile to 4.0."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.plans.analytics import (
        q_supplier_leadtime_profile,
    )

    d = str(tmp_path)
    spark.createDataFrame(
        [
            Row(o_orderkey=1, o_orderdate="2020-01-01"),
            Row(o_orderkey=2, o_orderdate="2020-02-01"),
        ]
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    li = [
        Row(l_orderkey=1, l_suppkey=1, l_shipdate="2020-01-01"),
        Row(l_orderkey=2, l_suppkey=1, l_shipdate="2020-02-11"),
    ] + [
        Row(l_orderkey=1, l_suppkey=2, l_shipdate="2020-01-05")
        for _ in range(4)
    ]
    spark.createDataFrame(li).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    spark.createDataFrame(
        [Row(s_suppkey=1, s_name="alpha"), Row(s_suppkey=2, s_name="beta")]
    ).write.mode("overwrite").parquet(f"{d}/supplier.parquet")

    out = {
        r["s_name"]: r
        for r in q_supplier_leadtime_profile(spark, d).collect()
    }
    a = out["alpha"]
    assert (a["n_items"], a["min_days"], a["max_days"]) == (2, 0, 10)
    assert (a["p25"], a["p50"], a["p75"], a["p90"]) == (2.5, 5.0, 7.5, 9.0)
    assert a["avg_days"] == 5.0
    b = out["beta"]
    assert (b["n_items"], b["min_days"], b["max_days"]) == (4, 4, 4)
    assert (b["p25"], b["p50"], b["p75"], b["p90"]) == (4.0, 4.0, 4.0, 4.0)

    # the fixed-memory scale path stays on the same grid for the
    # degenerate all-equal supplier and lands near-exact on the spread
    approx = {
        r["s_name"]: r
        for r in q_supplier_leadtime_profile(spark, d, approx=True).collect()
    }
    assert approx["beta"]["p50"] == 4.0
    assert abs(approx["alpha"]["p50"] - 5.0) <= 5.0


def test_leadtime_drift_ks_detects_shift_and_passes_stable(spark, tmp_path):
    """Hand-worked two-sample KS: a supplier whose lead-time
    distribution is IDENTICAL early vs late scores D=0 (not drifted);
    one whose leads jump from all-2-days to all-9-days scores D=1.0
    against a 0.607 critical value (drifted). The early/late split is
    the global midpoint order date."""
    import datetime as dt
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.plans.analytics import q_leadtime_drift_ks

    orders, lines = [], []
    k = 0

    def add(day, supp, lead):
        nonlocal k
        k += 1
        orders.append(
            Row(o_orderkey=k, o_orderdate=day.isoformat())
        )
        lines.append(
            Row(l_orderkey=k, l_suppkey=supp,
                l_shipdate=(day + dt.timedelta(days=lead)).isoformat())
        )

    early_day = dt.date(2020, 1, 10)
    late_day = dt.date(2020, 12, 10)
    for _ in range(5):
        for lead in (1, 2, 3, 4):
            add(early_day, 1, lead)   # supplier 1: same dist both halves
            add(late_day, 1, lead)
    for _ in range(10):
        add(early_day, 2, 2)          # supplier 2: clean shift 2 -> 9
        add(late_day, 2, 9)

    d = str(tmp_path)
    spark.createDataFrame(orders).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    spark.createDataFrame(lines).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    out = {r["s_suppkey"]: r for r in q_leadtime_drift_ks(spark, d).collect()}
    s1, s2 = out[1], out[2]
    assert (s1["n_early"], s1["n_late"]) == (20, 20)
    assert s1["ks_stat"] == 0.0 and s1["drifted"] is False
    assert (s2["n_early"], s2["n_late"]) == (10, 10)
    assert s2["ks_stat"] == 1.0 and s2["drifted"] is True
    want_crit = math.floor(
        1.358 * math.sqrt(20 / 100) * 1e6 + 0.5) / 1e6
    assert s2["ks_crit"] == want_crit


def test_leadtime_drift_ks_odd_span_midpoint_is_floored(spark, tmp_path):
    """Regression for the cast divergence: Spark's cast-to-int
    truncates where DuckDB's CAST rounds half-to-even, so with a span
    of 3 days (half = 1.5) an order on day 2 must land in the LATE
    half on both engines (floor(1.5) = 1). One supplier, one early
    4-day lead, one day-2 9-day lead: n_early=1/n_late=1 proves the
    day-2 order fell late."""
    import datetime as dt

    from pyspark.sql import Row

    from retail_sales_etl_spark.plans.analytics import q_leadtime_drift_ks

    base = dt.date(2020, 1, 1)
    orders = [
        Row(o_orderkey=1, o_orderdate=base.isoformat()),
        Row(o_orderkey=2,
            o_orderdate=(base + dt.timedelta(days=2)).isoformat()),
        Row(o_orderkey=3,
            o_orderdate=(base + dt.timedelta(days=3)).isoformat()),
    ]
    lines = [
        Row(l_orderkey=1, l_suppkey=1,
            l_shipdate=(base + dt.timedelta(days=4)).isoformat()),
        Row(l_orderkey=2, l_suppkey=1,
            l_shipdate=(base + dt.timedelta(days=11)).isoformat()),
    ]
    d = str(tmp_path)
    spark.createDataFrame(orders).write.mode("overwrite").parquet(
        f"{d}/orders.parquet"
    )
    spark.createDataFrame(lines).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    out = q_leadtime_drift_ks(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_early"], r["n_late"]) == (1, 1)


def test_events_hour_uniformity_scheduler_vs_burst(spark, tmp_path):
    """A scheduler firing exactly twice every hour scores chi2 = 0
    (uniform); a user with all 48 events in ONE hour scores
    24*48 - 48 = 1104 (rejected); a user under the min-events floor
    is excluded. Zero-observed hours are counted via the algebraic
    identity — the one-hour user's chi2 is exactly the dense-grid
    value."""
    import datetime as dt

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.events import (
        q_events_hour_uniformity,
    )

    base = dt.datetime(2024, 1, 1)
    rows, k = [], 0
    for h in range(24):
        for m in (5, 35):
            k += 1
            rows.append(Row(event_id=k, user_id=1,
                            ts=base + dt.timedelta(hours=h, minutes=m)))
    for m in range(48):
        k += 1
        rows.append(Row(event_id=k, user_id=2,
                        ts=base + dt.timedelta(minutes=m)))
    for m in range(10):
        k += 1
        rows.append(Row(event_id=k, user_id=3,
                        ts=base + dt.timedelta(minutes=m)))
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = {r["user_id"]: r
           for r in q_events_hour_uniformity(spark, d).collect()}
    assert set(out) == {1, 2}  # user 3 under the floor
    assert out[1]["chi2"] == 0.0 and out[1]["is_uniform"] is True
    assert out[1]["n_hours"] == 24
    assert out[2]["chi2"] == 1104.0 and out[2]["is_uniform"] is False
    assert out[2]["n_hours"] == 1


def test_events_daily_peaks_gap_and_edge_semantics(spark, tmp_path):
    """Daily counts [1,5,1,gap,8,1,3]: day 2 and day 5 are peaks (the
    gap day is a ZERO neighbor, so the 8 after the gap still
    qualifies); the final day's 3 is an edge (no right neighbor) and
    must NOT appear; vs_mean is the exact staged c*n_days/total."""
    import datetime as dt

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.events import (
        q_events_daily_peaks,
    )

    base = dt.datetime(2024, 3, 1, 12, 0)
    counts = {0: 1, 1: 5, 2: 1, 4: 8, 5: 1, 6: 3}  # day 3 is a gap
    rows, k = [], 0
    for day, c in counts.items():
        for i in range(c):
            k += 1
            rows.append(Row(event_id=k, user_id=1,
                            ts=base + dt.timedelta(days=day, minutes=i)))
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/events.parquet"
    )
    out = {r["peak_date"].isoformat(): r
           for r in q_events_daily_peaks(spark, d).collect()}
    assert set(out) == {"2024-03-02", "2024-03-05"}
    p1 = out["2024-03-02"]
    assert (p1["n_events"], p1["prev_n"], p1["next_n"]) == (5, 1, 1)
    assert p1["vs_mean"] == round(5 * 7 / 19, 6) or abs(
        p1["vs_mean"] - (5 * 7 / 19)) < 1e-6
    p2 = out["2024-03-05"]
    assert (p2["n_events"], p2["prev_n"], p2["next_n"]) == (8, 0, 1)


def test_nation_supplier_hhi_monopoly_and_split(spark, tmp_path):
    """A single-supplier nation scores HHI = 10000 ('high'); two equal
    suppliers score 5000 ('high'); ten equal suppliers score 1000
    ('unconcentrated'); top_share pins the max supplier's fraction."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.plans.analytics import (
        q_nation_supplier_hhi,
    )

    sups, lines, k = [], [], 0
    layouts = {0: 1, 1: 2, 2: 10}  # nationkey -> equal suppliers
    sk = 0
    for nk, n_sup in layouts.items():
        for _ in range(n_sup):
            sk += 1
            sups.append(Row(s_suppkey=sk, s_nationkey=nk))
            k += 1
            lines.append(Row(l_orderkey=k, l_suppkey=sk,
                             l_extendedprice=100.0, l_discount=0.0))
    nations = [Row(n_nationkey=nk, n_name=f"N{nk}") for nk in layouts]
    d = str(tmp_path)
    spark.createDataFrame(lines).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet")
    spark.createDataFrame(sups).write.mode("overwrite").parquet(
        f"{d}/supplier.parquet")
    spark.createDataFrame(nations).write.mode("overwrite").parquet(
        f"{d}/nation.parquet")
    out = {r["nation"]: r for r in q_nation_supplier_hhi(spark, d).collect()}
    assert out["N0"]["hhi"] == 10000.0 and out["N0"]["band"] == "high"
    assert out["N0"]["top_share"] == 1.0
    assert out["N1"]["hhi"] == 5000.0 and out["N1"]["band"] == "high"
    assert out["N1"]["top_share"] == 0.5
    assert out["N2"]["hhi"] == 1000.0
    assert out["N2"]["band"] == "unconcentrated"
    assert out["N2"]["n_suppliers"] == 10


def test_weibull_fit_recovers_hand_ols_and_analytic_extreme(
    spark, sf_dir
):
    """The Weibull plot fit must equal a hand-computed OLS over the
    SAME KM plotting positions (ln t, ln(-ln S) with the entry's 6-dp
    staging), and on the real corpus the fit must be usable: shape > 0
    (durations are positive-lifetime), r2 in [0, 1], scale positive."""
    import math

    from retail_sales_etl_spark.operators.events import (
        q_session_km_survival,
        q_session_weibull_fit,
    )

    def f6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    def f9(x):
        return math.floor(x * 1e9 + 0.5) / 1e9

    km = q_session_km_survival(spark, sf_dir).collect()
    pts = [
        (
            f6(math.log(r["duration_sec"])),
            f6(math.log(f6(-math.log(r["survival"])))),
        )
        for r in km
        if r["n_death"] > 0
        and r["duration_sec"] > 0
        and 0 < r["survival"] < 1
    ]
    n = len(pts)
    assert n >= 3
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(f9(x * x) for x, _ in pts)
    sxy = sum(f9(x * y) for x, y in pts)
    syy = sum(f9(y * y) for _, y in pts)
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    intercept = (sy - slope * sx) / n
    (got,) = q_session_weibull_fit(spark, sf_dir).collect()
    assert got["n_points"] == n
    assert abs(got["weibull_shape"] - f6(slope)) <= 2e-6
    assert abs(got["weibull_scale"] - f6(math.exp(-intercept / slope))) <= max(
        2e-6, 1e-5 * abs(got["weibull_scale"])
    )
    assert abs(got["r2"] - f6(cov * cov / (varx * vary))) <= 2e-6
    assert got["weibull_shape"] > 0
    assert got["weibull_scale"] > 0
    assert 0.0 <= got["r2"] <= 1.0
