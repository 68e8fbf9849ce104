"""Distribution profiling for 100 TB planning: exact heavy hitters
without a full-key shuffle, and join-key skew diagnostics.

Both answer the question an operator asks BEFORE running a big join or
aggregate: "which keys are hot, and how hot?" — the inputs to choosing
broadcast vs shuffle, salt factors, and AQE skew thresholds.

Reference parity: extends the reference's profiling stage
(retail-sales-etl transform/profile.py — null/dup/range checks) with
the distributional checks a distributed engine needs.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.rounding import fround

# Heavy-hitter support threshold phi = 1/HH_DENOM (a key is heavy when
# count * HH_DENOM >= n). Integer arithmetic end-to-end — no float
# threshold to disagree across engines.
HH_DENOM = 20


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition Misra-Gries summary with k = HH_DENOM counters,
    vectorized: each Arrow batch is reduced to exact per-key counts
    with ``value_counts`` (C speed), then MERGED into the running
    summary once per batch — the mergeable-summaries MG merge
    (Agarwal/Cormode et al., PODS 2012): add the counts, and if more
    than k counters remain, subtract the (k+1)-th largest from all and
    drop the non-positive. Python touches O(distinct-per-batch) items,
    not every row.

    Soundness: the merge preserves MG's undercount bound (error <=
    local_n / (k+1)), so any key with partition-local frequency >=
    local_n / k keeps a positive counter; a key with GLOBAL frequency
    >= n / k must reach that bound in at least one partition
    (pigeonhole), so the union of partition candidates is a superset
    of the true heavy hitters. The exact recount pass then removes
    false candidates.
    """
    yield pd.DataFrame(
        {"key": list(_mg_fold(batches).keys())}, dtype=object
    )


def _mg_fold(batches: Iterator[pd.DataFrame], k: int = HH_DENOM) -> dict:
    """Fold Arrow batches into one weighted MG summary dict (the kernel
    behind ``_mg_candidates`` and the streaming summary)."""
    counters: dict = {}
    for pdf in batches:
        vc = pdf["key"].value_counts(dropna=False)
        counters = mg_merge(counters, vc.items(), k)
    return counters


def mg_merge(counters: dict, items, k: int = HH_DENOM) -> dict:
    """Merge weighted (key, count) items into an MG summary with at
    most ``k`` positive counters — the mergeable-summaries merge
    (Agarwal/Cormode et al., PODS 2012): add the counts; if more than
    k counters remain, subtract the (k+1)-th largest from all and drop
    the non-positive. Preserves MG's bound (undercount <= n/(k+1))
    under arbitrary merge trees, which is what lets per-partition and
    per-micro-batch summaries combine into one stream-lifetime
    summary."""
    for key, cnt in items:
        # Skip padding / degenerate items: a null or zero count carries
        # no weight and must not materialize a spurious counter (the
        # summary schema pads empty partitions with a cnt=0 row, and a
        # null cnt would TypeError on int()).
        if cnt is None or (isinstance(cnt, float) and math.isnan(cnt)):
            continue
        cnt = int(cnt)
        if cnt == 0:
            continue
        # pandas may surface a NULL key as NaN; normalize to None
        # so the candidate survives Arrow round-tripping.
        if isinstance(key, float) and math.isnan(key):
            key = None
        counters[key] = counters.get(key, 0) + cnt
    if len(counters) > k:
        cut = sorted(counters.values(), reverse=True)[k]
        counters = {c: v - cut for c, v in counters.items() if v > cut}
    return counters


def _mg_summaries(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition WEIGHTED MG summary (key, cnt) — the mergeable
    form a streaming sink folds across partitions and micro-batches.
    ``part_rows`` carries the partition's row count on the FIRST summary
    row (0 elsewhere), so one pass yields both the summary and the
    batch size — no second scan of the micro-batch."""
    n_rows = 0

    def counting(batches):
        nonlocal n_rows
        for pdf in batches:
            n_rows += len(pdf)
            yield pdf

    counters = _mg_fold(counting(batches))
    # Pad to at least one row so the row count survives even when the
    # summary is empty (empty partition, or an MG cut that evicted
    # every counter — e.g. > HH_DENOM equally-frequent keys). The pad
    # row's cnt=0 is skipped by mg_merge; without the pad, the
    # unequal-length dict-of-Series constructor index-aligns into a
    # single NaN row whose null cnt crashes the driver-side merge.
    n_pad = max(1, len(counters))
    keys = list(counters.keys()) + [None] * (n_pad - len(counters))
    cnts = list(counters.values()) + [0] * (n_pad - len(counters))
    yield pd.DataFrame(
        {
            "key": pd.Series(keys, dtype=object),
            "cnt": pd.Series(cnts, dtype="int64"),
            "part_rows": pd.Series(
                [n_rows] + [0] * (n_pad - 1), dtype="int64"
            ),
        }
    )


def heavy_hitters(df: DataFrame, key_col: str) -> DataFrame:
    """EXACT keys with frequency >= n / HH_DENOM, found without ever
    shuffling the full key grid.

    Pass 1 (Arrow-batched Misra-Gries per partition) emits at most
    HH_DENOM candidate keys per partition — KBs, not the key space.
    Pass 2 recounts ONLY candidate rows (broadcast semi-join filters
    map-side) and applies the exact integer threshold. At 100 TB the
    full groupBy(key) this replaces shuffles every distinct key;
    this shuffles |candidates| partial counts.
    """
    keyed = df.select(F.col(key_col).cast("string").alias("key"))
    candidates = (
        keyed.mapInPandas(_mg_candidates, schema="key string").distinct()
    )
    total = keyed.agg(F.count(F.lit(1)).alias("n_total"))
    # eqNullSafe: a NULL key can itself be a heavy hitter, and a plain
    # equi semi-join would silently drop it after the MG pass found it.
    cand = F.broadcast(candidates).withColumnRenamed("key", "__cand_key")
    counts = (
        keyed.join(cand, F.col("key").eqNullSafe(F.col("__cand_key")), "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") * HH_DENOM >= F.col("n_total"))
        .select(
            "key",
            "n_rows",
            fround(F.col("n_rows") / F.col("n_total"), 6).alias("share"),
        )
    )


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy event types (share >= 1/HH_DENOM) over the events stream."""
    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "event_type")


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics for lineitem.l_orderkey: the one-row
    report that says whether the key needs salting.

    One groupBy builds the key-count grid (map-side combinable; the
    grid is |keys| rows, not |fact|); one aggregate over the grid
    yields max/avg/percentile counts, the top-key share, and the salt
    factor = ceil(max / avg) a salted join would use. Exact
    percentiles are fine here because the grid is already the small
    side — at 100 TB this is the profile you run once per key before
    sizing the real job.
    """
    li = load_table(spark, sf_dir, "lineitem")
    grid = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("c"))
    return grid.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").cast("bigint").alias("n_rows"),
        F.max("c").alias("max_per_key"),
        fround(F.sum("c") / F.count(F.lit(1)), 6).alias("avg_per_key"),
        F.expr("percentile(c, 0.5)").cast("double").alias("p50_per_key"),
        F.expr("percentile(c, 0.99)").cast("double").alias("p99_per_key"),
        F.ceil(F.max("c") * F.count(F.lit(1)) / F.sum("c"))
        .cast("bigint")
        .alias("suggested_salts"),
    )


# Benford first-digit expectations log10(1 + 1/d), precomputed in
# Python and embedded as literals in BOTH engines — no runtime log()
# whose last-ulp could differ across libm implementations.
BENFORD = {d: round(math.log10(1 + 1 / d), 6) for d in range(1, 10)}


def q_benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen over order totals — the classic anomaly/
    fraud data-quality check: fabricated or unit-mixed monetary data
    drifts from the log-uniform first-digit distribution.

    First digit extracted via floor -> BIGINT -> string (portable:
    double->bigint CAST truncates in Spark but ROUNDS in DuckDB, so
    floor first; integer-to-string is deterministic everywhere,
    unlike double formatting or log10 at power-of-ten boundaries).
    One map-side digit projection + a 9-group aggregate.

    Only values >= 1 participate: Benford's law is about leading
    significant digits, and totals in [0, 1) would yield digit 0 and
    negatives a '-' character — both outside the 1-9 expectation map
    (NULL benford_share rows) rather than excluded. TPC-H totals are
    all positive, but the guard keeps the screen correct on general
    monetary columns; it is mirrored in the oracle SQL.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    expected = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in BENFORD.items() for x in kv]
        ),
        F.col("first_digit"),
    )
    counts = orders.select(digit.alias("first_digit")).groupBy(
        "first_digit"
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    total = counts.agg(F.sum("n_orders").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "first_digit",
            "n_orders",
            fround(F.col("n_orders") / F.col("n_total"), 6).alias(
                "observed_share"
            ),
            expected.alias("benford_share"),
            fround(
                F.abs(
                    fround(F.col("n_orders") / F.col("n_total"), 6) - expected
                ), 6).alias("abs_deviation"),
        )
    )


SEASON_EPOCH = "1992-01-01"


def q_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday-seasonality DQ screen over order dates: the 7-bucket
    day-of-week profile plus a chi-square uniformity statistic — the
    companion to the Benford screen (synthetic/garbled date columns
    are flat or single-spiked; real ordering behavior has a weekly
    shape worth knowing before calendar-partitioned loads).

    Engine-portable weekday: ``datediff(day, epoch) % 7`` (an index
    relative to 1992-01-01, a Wednesday) — calendar dayofweek()
    numbering differs across engines, an epoch-modulus cannot. One
    map-combinable 7-bucket aggregate; chi-square terms are rounded
    to 6 dp and DECIMAL-summed over the fixed 7-row grid; the peak
    bucket resolves by (count desc, index) — fully deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    dow = (
        F.datediff(
            F.to_date("o_orderdate"), F.lit(SEASON_EPOCH).cast("date")
        )
        % 7
    )
    buckets = orders.groupBy(dow.cast("bigint").alias("dow_idx")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = buckets.agg(F.sum("cnt").alias("n_orders"))
    term = fround(
        (F.col("cnt") - F.col("n_orders") / 7.0)
        * (F.col("cnt") - F.col("n_orders") / 7.0)
        / (F.col("n_orders") / 7.0), 6).cast("decimal(25,6)")
    g = buckets.crossJoin(F.broadcast(total))
    peak = (
        g.orderBy(F.col("cnt").desc(), F.col("dow_idx"))
        .limit(1)
        .select(
            F.col("dow_idx").alias("peak_idx"),
            F.col("cnt").alias("peak_cnt"),
        )
    )
    stats = g.agg(
        F.first("n_orders").alias("n_orders"),
        F.sum(term).alias("_chi2"),
    )
    return stats.crossJoin(F.broadcast(peak)).select(
        "n_orders",
        fround(F.col("_chi2").cast("double"), 6).alias("chi_square"),
        "peak_idx",
        fround(
            F.col("peak_cnt") / F.col("n_orders").cast("double"), 6).alias("peak_share"),
    )


QUERIES = {
    "heavy_hitters": q_heavy_hitters,
    "key_skew_profile": q_key_skew_profile,
    "benford_prices": q_benford_prices,
    "weekday_seasonality": q_weekday_seasonality,
}

ORACLE = {
    "weekday_seasonality": f"""
        WITH buckets AS (
            SELECT datediff('day', DATE '{SEASON_EPOCH}',
                            CAST(o_orderdate AS DATE)) % 7 AS dow_idx,
                   count(*) AS cnt
            FROM orders GROUP BY 1
        ),
        tot AS (SELECT sum(cnt) AS n_orders FROM buckets),
        terms AS (
            SELECT dow_idx, cnt, n_orders,
                   CAST(floor(((cnt - n_orders / 7.0)
                              * (cnt - n_orders / 7.0)
                              / (n_orders / 7.0)) * 1e6 + 0.5) / 1e6
                        AS DECIMAL(25,6)) AS term
            FROM buckets CROSS JOIN tot
        ),
        peak AS (
            SELECT dow_idx AS peak_idx, cnt AS peak_cnt
            FROM buckets ORDER BY cnt DESC, dow_idx LIMIT 1
        )
        SELECT CAST(any_value(n_orders) AS BIGINT) AS n_orders,
               floor((CAST(sum(term) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS chi_square,
               any_value(peak_idx) AS peak_idx,
               floor((any_value(peak_cnt)
                     / CAST(any_value(n_orders) AS DOUBLE)) * 1e6 + 0.5) / 1e6
                   AS peak_share
        FROM terms CROSS JOIN peak
    """,
    "heavy_hitters": f"""
        WITH counts AS (
            SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS n_rows
            FROM events GROUP BY 1
        ),
        tot AS (SELECT count(*) AS n_total FROM events)
        SELECT key, n_rows,
               floor((CAST(n_rows AS DOUBLE) / n_total) * 1e6 + 0.5) / 1e6 AS share
        FROM counts, tot
        WHERE n_rows * {HH_DENOM} >= n_total
    """,
    "benford_prices": f"""
        WITH digits AS (
            SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                       AS VARCHAR), 1, 1) AS INTEGER)
                       AS first_digit
            FROM orders
            WHERE o_totalprice >= 1
        ),
        counts AS (
            SELECT first_digit, count(*) AS n_orders FROM digits GROUP BY 1
        ),
        tot AS (SELECT sum(n_orders) AS n_total FROM counts),
        benford(first_digit, benford_share) AS (
            VALUES {", ".join(f"({d}, {v})" for d, v in BENFORD.items())}
        )
        SELECT c.first_digit, c.n_orders,
               floor((CAST(c.n_orders AS DOUBLE) / n_total) * 1e6 + 0.5) / 1e6 AS observed_share,
               CAST(b.benford_share AS DOUBLE) AS benford_share,
               floor((abs(floor((CAST(c.n_orders AS DOUBLE) / n_total) * 1e6 + 0.5) / 1e6
                         - CAST(b.benford_share AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS abs_deviation
        FROM counts c JOIN benford b USING (first_digit), tot
    """,
    "key_skew_profile": """
        WITH grid AS (
            SELECT l_orderkey, count(*) AS c FROM lineitem GROUP BY 1
        )
        SELECT count(*) AS n_keys,
               CAST(sum(c) AS BIGINT) AS n_rows,
               max(c) AS max_per_key,
               floor((CAST(sum(c) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS avg_per_key,
               CAST(quantile_cont(c, 0.5) AS DOUBLE) AS p50_per_key,
               CAST(quantile_cont(c, 0.99) AS DOUBLE) AS p99_per_key,
               CAST(ceil(CAST(max(c) AS DOUBLE) * count(*) / sum(c)) AS BIGINT)
                   AS suggested_salts
        FROM grid
    """,
}


# ---------------------------------------------------------------------------
# Corpus-balance profiling: Lorenz deciles + Gini of document length.

LORENZ_BAND_W = 512  # n_chars band width for the two-phase global rank
LORENZ_DECILES = 10


def q_doc_length_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve deciles and Gini coefficient of character mass
    across documents — the corpus-balance number that says whether 10%
    of the documents carry 60% of the training tokens (and therefore
    dominate every downstream sample).

    The scale problem is the GLOBAL length rank; this is the two-phase
    banded prefix-rank (``shard_serpentine`` / ``part_abc_classes``
    discipline): docs bucket into length bands, cumulative band counts
    are a window over the SMALL band grid (broadcast back), rank =
    band offset + row_number within band. Gini comes from the exact
    rank-weighted sum G = 2*Σ(r_i·x_i)/(n·Σx) − (n+1)/n under the
    deterministic (n_chars, doc_id) total order — every input to the
    final float is an exact BIGINT/DECIMAL aggregate (the rank-weight
    products accumulate in DECIMAL(38,0): bigint would overflow at
    ~1e10 docs). Deciles are arithmetic on the same rank.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    banded = docs.withColumn(
        "band", F.floor(F.col("n_chars") / F.lit(LORENZ_BAND_W)).cast("bigint")
    )
    grid = banded.groupBy("band").agg(F.count(F.lit(1)).alias("cnt"))
    wg = Window.orderBy(F.col("band").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = grid.select(
        "band",
        F.coalesce(F.sum("cnt").over(wg), F.lit(0)).cast("bigint").alias("off"),
    )
    wb = Window.partitionBy("band").orderBy("n_chars", "doc_id")
    ranked = banded.join(F.broadcast(offsets), "band").select(
        "doc_id",
        "n_chars",
        (F.col("off") + F.row_number().over(wb)).alias("r"),
    )
    totals = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n_chars").cast("bigint").alias("tot"),
        F.sum(
            F.col("r").cast("decimal(19,0)")
            * F.col("n_chars").cast("decimal(19,0)")
        )
        .cast("decimal(38,0)")
        .alias("srx"),
    )
    n_d = F.col("n").cast("double")
    gini = fround(
        F.lit(2.0) * F.col("srx").cast("double")
        / (n_d * F.col("tot").cast("double"))
        - (n_d + F.lit(1.0)) / n_d,
        6,
    )
    per_dec = (
        ranked.crossJoin(F.broadcast(totals))
        .withColumn(
            "decile",
            F.floor(
                (F.col("r") - 1) * F.lit(LORENZ_DECILES) / F.col("n")
            ).cast("int"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("decile_chars"),
            F.max(F.col("tot")).alias("_tot"),
            F.max(gini).alias("_gini"),
        )
    )
    return per_dec.select(
        "decile",
        "n_docs",
        "decile_chars",
        fround(
            F.col("decile_chars").cast("double") / F.col("_tot").cast("double"),
            6,
        ).alias("share"),
        F.col("_gini").alias("gini"),
    )


QUERIES["doc_length_lorenz"] = q_doc_length_lorenz

ORACLE["doc_length_lorenz"] = f"""
    WITH ranked AS (
        SELECT doc_id, n_chars,
               row_number() OVER (ORDER BY n_chars, doc_id) AS r
        FROM documents
    ),
    totals AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_chars) AS BIGINT) AS tot,
               CAST(sum(CAST(r AS DECIMAL(19,0))
                        * CAST(n_chars AS DECIMAL(19,0))) AS DECIMAL(38,0))
                   AS srx
        FROM ranked
    )
    SELECT CAST(floor((r - 1) * {LORENZ_DECILES} / CAST(n AS DOUBLE))
                AS INTEGER) AS decile,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS decile_chars,
           floor((CAST(sum(n_chars) AS DOUBLE) / CAST(max(tot) AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS share,
           max(floor((2.0 * CAST(srx AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))
                      - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))
                     * 1e6 + 0.5) / 1e6) AS gini
    FROM ranked, totals
    GROUP BY 1
"""


# Mahalanobis outlier report size
MAHAL_TOP_K = 20


def q_customer_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K customer outliers by exact 2-feature Mahalanobis distance
    over (order count, lifetime spend) — the covariance-aware "whale or
    anomaly?" screen that flags customers far from the joint
    distribution even when each marginal looks normal (a 10-order
    customer spending like a 100-order one outranks a uniformly-big
    whale).

    Exactness: spend goes to integer CENTS at the scan
    (floor(x*100+0.5) — o_totalprice carries 2 decimals), so all five
    moment sums are exact DECIMAL(38,0) integer aggregates (the
    assortativity recipe; Sm² reaches ~6e34 at 1e10 customers — inside
    DECIMAL(38,0), far past int64). The scatter-matrix entries
    A = n·Sff − Sf², B = n·Sfm − Sf·Sm, C = n·Smm − Sm² and the
    quadratic form d² = (C·df² − 2B·df·dm + A·dm²)/(AC − B²) with
    df = n·f − Sf, dm = n·m − Sm are then mirrored double arithmetic
    (the n-scaling cancels: this IS the population-covariance
    Mahalanobis, verified against numpy in pytest). Plan: one
    groupBy(customer), a 1-row moment aggregate broadcast back, the
    distance map-side, top-K via orderBy+limit = distributed
    TakeOrdered — no global sort, no window.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("f"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("m"),
    )
    d19 = "decimal(19,0)"
    moments = per_cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("f").cast(d19)).cast("decimal(38,0)").alias("sf"),
        F.sum(F.col("m").cast(d19)).cast("decimal(38,0)").alias("sm"),
        F.sum(F.col("f").cast(d19) * F.col("f").cast(d19))
        .cast("decimal(38,0)")
        .alias("sff"),
        F.sum(F.col("f").cast(d19) * F.col("m").cast(d19))
        .cast("decimal(38,0)")
        .alias("sfm"),
        F.sum(F.col("m").cast(d19) * F.col("m").cast(d19))
        .cast("decimal(38,0)")
        .alias("smm"),
    )
    n_d = F.col("n").cast("double")
    a = n_d * F.col("sff").cast("double") - F.col("sf").cast("double") * F.col("sf").cast("double")
    b = n_d * F.col("sfm").cast("double") - F.col("sf").cast("double") * F.col("sm").cast("double")
    c = n_d * F.col("smm").cast("double") - F.col("sm").cast("double") * F.col("sm").cast("double")
    det = a * c - b * b
    df = n_d * F.col("f").cast("double") - F.col("sf").cast("double")
    dm = n_d * F.col("m").cast("double") - F.col("sm").cast("double")
    md2 = ((c * df) * df - ((F.lit(2.0) * b) * df) * dm + (a * dm) * dm) / det
    return (
        per_cust.crossJoin(F.broadcast(moments))
        .filter(det > 0)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("f").alias("n_orders"),
            F.col("m").alias("spend_cents"),
            fround(md2, 6).alias("mahalanobis_sq"),
        )
        .orderBy(F.col("mahalanobis_sq").desc(), F.col("custkey"))
        .limit(MAHAL_TOP_K)
    )


QUERIES["customer_mahalanobis_outliers"] = q_customer_mahalanobis_outliers

ORACLE["customer_mahalanobis_outliers"] = f"""
    WITH per_cust AS (
        SELECT o_custkey,
               CAST(count(*) AS BIGINT) AS f,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS m
        FROM orders GROUP BY 1
    ),
    mo AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(f AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sf,
               CAST(sum(CAST(m AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sm,
               CAST(sum(CAST(f AS DECIMAL(19,0)) * CAST(f AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sff,
               CAST(sum(CAST(f AS DECIMAL(19,0)) * CAST(m AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS sfm,
               CAST(sum(CAST(m AS DECIMAL(19,0)) * CAST(m AS DECIMAL(19,0)))
                    AS DECIMAL(38,0)) AS smm
        FROM per_cust
    ),
    scored AS (
        SELECT o_custkey AS custkey, f AS n_orders, m AS spend_cents,
               floor((((CAST(n AS DOUBLE) * CAST(smm AS DOUBLE)
                        - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
                       * (CAST(n AS DOUBLE) * CAST(f AS DOUBLE)
                          - CAST(sf AS DOUBLE))) * (CAST(n AS DOUBLE) * CAST(f AS DOUBLE) - CAST(sf AS DOUBLE))
                      - ((2.0 * (CAST(n AS DOUBLE) * CAST(sfm AS DOUBLE)
                                 - CAST(sf AS DOUBLE) * CAST(sm AS DOUBLE)))
                         * (CAST(n AS DOUBLE) * CAST(f AS DOUBLE)
                            - CAST(sf AS DOUBLE)))
                        * (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)
                           - CAST(sm AS DOUBLE))
                      + ((CAST(n AS DOUBLE) * CAST(sff AS DOUBLE)
                          - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)
                            - CAST(sm AS DOUBLE)))
                        * (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)
                           - CAST(sm AS DOUBLE)))
                     / ((CAST(n AS DOUBLE) * CAST(sff AS DOUBLE)
                         - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(smm AS DOUBLE)
                           - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
                        - (CAST(n AS DOUBLE) * CAST(sfm AS DOUBLE)
                           - CAST(sf AS DOUBLE) * CAST(sm AS DOUBLE))
                          * (CAST(n AS DOUBLE) * CAST(sfm AS DOUBLE)
                             - CAST(sf AS DOUBLE) * CAST(sm AS DOUBLE)))
                    * 1e6 + 0.5) / 1e6 AS mahalanobis_sq
        FROM per_cust CROSS JOIN mo
        WHERE (CAST(n AS DOUBLE) * CAST(sff AS DOUBLE)
               - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(smm AS DOUBLE)
                 - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
              - (CAST(n AS DOUBLE) * CAST(sfm AS DOUBLE)
                 - CAST(sf AS DOUBLE) * CAST(sm AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(sfm AS DOUBLE)
                   - CAST(sf AS DOUBLE) * CAST(sm AS DOUBLE)) > 0
    )
    SELECT custkey, n_orders, spend_cents, mahalanobis_sq
    FROM scored
    ORDER BY mahalanobis_sq DESC, custkey
    LIMIT {MAHAL_TOP_K}
"""


def _daily_revenue_cents(orders: DataFrame) -> DataFrame:
    """(d = epoch-day number, v = exact integer cents) daily revenue
    grid — the shared front end of the day-grid time-series operators
    (theil_sen, seasonal_decompose)."""
    return orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit(SEASON_EPOCH).cast("date")
        ).alias("d")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("v")
    )


_DAILY_CENTS_SQL = f"""
        SELECT datediff('day', DATE '{SEASON_EPOCH}',
                        CAST(o_orderdate AS DATE)) AS d,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
"""


def q_revenue_theil_sen(
    spark: SparkSession, sf_dir: str, approx: bool = False
) -> DataFrame:
    """Theil-Sen robust trend of daily order revenue (Theil 1950; Sen
    1968): the median of all pairwise day-to-day slopes, with the
    median-residual intercept — the outlier-immune alternative to OLS
    for "is revenue actually growing?" (a single flash-sale day drags
    an OLS line; it moves the slope MEDIAN not at all).

    Scale shape: the fact collapses to the bounded DAY grid in one
    scan (daily revenue in exact integer cents), and the O(grid²) pair
    space lives entirely on that grid — it does NOT grow with fact
    volume (2,406 days → 2.9M pairs whether the fact is 60k rows or
    100 TB). The pair self-join broadcasts the grid; the two medians
    use Spark's exact ``percentile`` aggregate over grid-bounded sets.
    Residuals use the 6-dp-ROUNDED slope so both engines interpolate
    identical inputs.

    ``approx=True`` swaps both exact medians for ``approx_percentile``
    (the established scale-mode flag — the profile_orders precedent):
    the exact ``percentile`` buffers the full ~2.9M-slope set on one
    reducer (grid-bounded, so never a scale-KILLER, but the slowest
    single-reducer buffer in the repo); the KLL-sketch form partial-
    combines map-side with bounded memory. The exact form stays the
    oracle default — the approx twin is for wide-calendar deployments.
    """
    med = (
        "approx_percentile({0}, 0.5, 10000)" if approx
        else "percentile({0}, 0.5)"
    )
    daily = _daily_revenue_cents(load_table(spark, sf_dir, "orders"))
    npart = max(int(spark.sparkContext.defaultParallelism), 1)
    a = daily.select(F.col("d").alias("d1"), F.col("v").alias("v1"))
    b = daily.select(F.col("d").alias("d2"), F.col("v").alias("v2"))
    if not approx:
        # spread the broadcast nested-loop probe side: the day grid
        # arrives as ONE coalesced post-aggregate partition, so the
        # O(grid^2) pair generation otherwise runs single-threaded
        a = a.repartition(npart)
    pairs = a.join(F.broadcast(b), F.col("d2") > F.col("d1")).select(
        (
            (F.col("v2") - F.col("v1")).cast("double")
            / (F.col("d2") - F.col("d1")).cast("double")
        ).alias("s")
    )
    if approx:
        sl = pairs.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            fround(F.expr(med.format("s")), 6).alias("slope_cents_per_day"),
        )
    else:
        # Distributed EXACT median (the r18 verdict's "slowest
        # single-reducer buffer"): Spark's exact percentile buffers
        # the full ~grid^2/2 slope set on one reducer. Equivalent
        # two-phase rank selection instead: range-partition the
        # slopes, count per partition (driver sees npart rows, never
        # values), locate the order statistics at 0-based ranks
        # floor((n-1)/2) and ceil((n-1)/2) with one partition-local
        # sort, and interpolate lower + (upper - lower) * 0.5 — the
        # identical IEEE expression percentile/quantile_cont evaluate,
        # so the result is bit-equal and the oracle is untouched.
        from pyspark.sql import Window

        sp = (
            pairs.repartitionByRange(npart, "s")
            .withColumn("pid", F.spark_partition_id())
            .cache()
        )
        try:
            cnts = {
                r["pid"]: r["cnt"]
                for r in sp.groupBy("pid").agg(
                    F.count(F.lit(1)).alias("cnt")
                ).collect()
            }
            n = sum(cnts.values())
            if n == 0:
                med_val = None
            else:
                want = sorted({(n - 1) // 2, n // 2})  # 0-based ranks
                targets: dict[int, list[int]] = {}
                off = 0
                for pid in sorted(cnts):
                    cnt = cnts[pid]
                    for k in want:
                        if off <= k < off + cnt:
                            targets.setdefault(pid, []).append(k - off)
                    off += cnt
                cond = None
                w = Window.partitionBy("pid").orderBy("s")
                for pid, locals_ in targets.items():
                    c = (F.col("pid") == pid) & F.col("rn").isin(
                        [lk + 1 for lk in locals_]
                    )
                    cond = c if cond is None else (cond | c)
                picked = sorted(
                    r["s"]
                    for r in sp.filter(
                        F.col("pid").isin(list(targets))
                    )
                    .withColumn("rn", F.row_number().over(w))
                    .filter(cond)
                    .select("s")
                    .collect()
                )
                lo, hi = picked[0], picked[-1]
                med_val = lo + (hi - lo) * 0.5
        finally:
            sp.unpersist()
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        sl = spark.createDataFrame(
            [(n, med_val)],
            StructType(
                [
                    # non-nullable to match the count() aggregate the
                    # approx path (and the old exact path) produce —
                    # the exact/approx schema-identity contract
                    StructField("n_pairs", LongType(), False),
                    StructField("raw_slope", DoubleType(), True),
                ]
            ),
        ).select(
            "n_pairs",
            fround(F.col("raw_slope"), 6).alias("slope_cents_per_day"),
        )
    res = daily.crossJoin(F.broadcast(sl)).select(
        "n_pairs",
        "slope_cents_per_day",
        (
            F.col("v").cast("double")
            - F.col("slope_cents_per_day") * F.col("d").cast("double")
        ).alias("r"),
    )
    return res.groupBy("n_pairs", "slope_cents_per_day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        fround(F.expr(med.format("r")), 6).alias("intercept_cents"),
    ).select(
        "n_days", "n_pairs", "slope_cents_per_day", "intercept_cents"
    )


QUERIES["revenue_theil_sen"] = q_revenue_theil_sen

ORACLE["revenue_theil_sen"] = f"""
    WITH daily AS ({_DAILY_CENTS_SQL}
    ),
    pairs AS (
        SELECT (CAST(b.v - a.v AS DOUBLE)
                / CAST(b.d - a.d AS DOUBLE)) AS s
        FROM daily a JOIN daily b ON b.d > a.d
    ),
    sl AS (
        SELECT CAST(count(*) AS BIGINT) AS n_pairs,
               floor((quantile_cont(s, 0.5)) * 1e6 + 0.5) / 1e6
                   AS slope_cents_per_day
        FROM pairs
    ),
    res AS (
        SELECT n_pairs, slope_cents_per_day,
               CAST(v AS DOUBLE) - slope_cents_per_day * CAST(d AS DOUBLE)
                   AS r
        FROM daily CROSS JOIN sl
    )
    SELECT CAST(count(*) AS BIGINT) AS n_days,
           n_pairs,
           slope_cents_per_day,
           floor((quantile_cont(r, 0.5)) * 1e6 + 0.5) / 1e6 AS intercept_cents
    FROM res GROUP BY n_pairs, slope_cents_per_day
"""


def q_orders_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition of daily order revenue
    (trend / weekly-seasonal / remainder — the moving-average
    decomposition underlying STL) plus the seasonal-STRENGTH statistic
    F_s = max(0, 1 − Var(R)/Var(detrended)) of Wang, Smith & Hyndman
    2006 — the one number that says whether the weekly cycle is real
    structure or noise (weekday_seasonality screens COUNTS for
    uniformity; this measures the REVENUE cycle's share of variance).

    Scale shape: the fact collapses to the bounded day grid (exact
    integer cents) in one scan; the centered 7-day moving average is a
    RANGE window over the grid's day numbers (gaps shrink the window's
    population, documented), the day→dow rollup is a 7-group
    aggregate, and every window/aggregate runs on the grid — none of
    it grows with fact volume. Determinism: trend is one
    integer-sums division; detrended/remainder values are 6-dp
    floor-staged before the DECIMAL variance sums; engine-portable dow
    via day-number % 7 (epoch modulus, not calendar dayofweek).
    """
    from pyspark.sql import Window

    daily = _daily_revenue_cents(load_table(spark, sf_dir, "orders"))
    w7 = Window.orderBy("d").rangeBetween(-3, 3)
    det = daily.select(
        "d",
        (
            F.col("v").cast("double")
            - fround(
                F.sum("v").over(w7).cast("double")
                / F.count(F.lit(1)).over(w7).cast("double"),
                6,
            )
        ).alias("dt"),
    ).select("d", fround(F.col("dt"), 2).alias("dt6"))
    # cent-grain (2-dp) staging: daily-revenue deviations reach ~1e9
    # cents at sf0.1 (1e13 at 100 TB); 6-dp staging would need
    # precision-19 squares, and DECIMAL(19,6)^2 exceeds width 38 —
    # width-38 ceilings; DECIMAL(19,2) forces int128 storage so the
    # square is an exact (38,4) in both engines (16..18-digit operands
    # multiply in int64 in DuckDB and overflow on cent-scale values).
    dec = "decimal(28,2)"
    seas = det.groupBy((F.col("d") % 7).cast("int").alias("dow_idx")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        fround(
            F.sum(F.col("dt6").cast(dec)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            2,
        ).alias("seasonal_cents"),
    )
    rem = det.join(
        F.broadcast(seas),
        (F.col("d") % 7).cast("int") == F.col("dow_idx"),
    ).select(
        "dt6", fround(F.col("dt6") - F.col("seasonal_cents"), 2).alias("r6")
    )
    # integer moments: x100 lifts the 2-dp values to exact hundredth-
    # cent integers, so squares are DECIMAL(38,0) integer aggregates
    # (the assortativity recipe — decimal-scale sums overflow width 38
    # on cent-scale variances); the 1e4 descale happens once, in the
    # final double arithmetic
    d19 = "decimal(19,0)"
    ints = rem.select(
        F.floor(F.col("dt6") * 100 + F.lit(0.5)).cast("bigint").alias("di"),
        F.floor(F.col("r6") * 100 + F.lit(0.5)).cast("bigint").alias("ri"),
    )
    tot = ints.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("di").cast(d19)).cast("decimal(38,0)").alias("sd"),
        F.sum(F.col("di").cast(d19) * F.col("di").cast(d19))
        .cast("decimal(38,0)")
        .alias("sdd"),
        F.sum(F.col("ri").cast(d19)).cast("decimal(38,0)").alias("sr"),
        F.sum(F.col("ri").cast(d19) * F.col("ri").cast(d19))
        .cast("decimal(38,0)")
        .alias("srr"),
    )
    n_d = F.col("n").cast("double")
    var_dt = (
        F.col("sdd").cast("double") / n_d
        - (F.col("sd").cast("double") / n_d)
        * (F.col("sd").cast("double") / n_d)
    ) / F.lit(10000.0)
    var_r = (
        F.col("srr").cast("double") / n_d
        - (F.col("sr").cast("double") / n_d)
        * (F.col("sr").cast("double") / n_d)
    ) / F.lit(10000.0)
    strength = F.greatest(F.lit(0.0), F.lit(1.0) - var_r / var_dt)
    # report STD not variance: cents^2 variances overflow fround's
    # floor->BIGINT at ~9e12 (the documented fround caveat); the sqrt
    # is IEEE-exact-rounded so portability is preserved
    glob = tot.select(
        fround(F.sqrt(var_dt), 2).alias("std_detrended"),
        fround(F.sqrt(var_r), 2).alias("std_remainder"),
        F.when(var_dt > 0, fround(strength, 6))
        .otherwise(F.lit(0.0))
        .alias("seasonal_strength"),
    )
    return seas.crossJoin(F.broadcast(glob)).select(
        "dow_idx",
        "n_days",
        "seasonal_cents",
        "std_detrended",
        "std_remainder",
        "seasonal_strength",
    )


QUERIES["orders_seasonal_decompose"] = q_orders_seasonal_decompose

ORACLE["orders_seasonal_decompose"] = f"""
    WITH daily AS ({_DAILY_CENTS_SQL}
    ),
    det AS (
        SELECT d,
               floor((CAST(v AS DOUBLE)
                      - floor((CAST(sum(v) OVER w AS DOUBLE)
                               / CAST(count(*) OVER w AS DOUBLE))
                              * 1e6 + 0.5) / 1e6) * 1e2 + 0.5) / 1e2 AS dt6
        FROM daily
        WINDOW w AS (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    seas AS (
        SELECT CAST(d % 7 AS INT) AS dow_idx,
               CAST(count(*) AS BIGINT) AS n_days,
               floor((CAST(sum(CAST(dt6 AS DECIMAL(28,2))) AS DOUBLE)
                      / CAST(count(*) AS DOUBLE)) * 1e2 + 0.5) / 1e2
                   AS seasonal_cents
        FROM det GROUP BY 1
    ),
    rem AS (
        SELECT dt6,
               floor((dt6 - s.seasonal_cents) * 1e2 + 0.5) / 1e2 AS r6
        FROM det JOIN seas s ON CAST(det.d % 7 AS INT) = s.dow_idx
    ),
    ints AS (
        SELECT CAST(floor(dt6 * 100 + 0.5) AS BIGINT) AS di,
               CAST(floor(r6 * 100 + 0.5) AS BIGINT) AS ri
        FROM rem
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(di AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sd,
               CAST(sum(CAST(di AS DECIMAL(19,0))
                        * CAST(di AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sdd,
               CAST(sum(CAST(ri AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sr,
               CAST(sum(CAST(ri AS DECIMAL(19,0))
                        * CAST(ri AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS srr
        FROM ints
    ),
    vx AS (
        SELECT (CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE))) / 10000.0
                   AS vdt,
               (CAST(srr AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))) / 10000.0
                   AS vr
        FROM tot
    ),
    gstats AS (
        SELECT floor((sqrt(vdt)) * 1e2 + 0.5) / 1e2 AS std_detrended,
               floor((sqrt(vr)) * 1e2 + 0.5) / 1e2 AS std_remainder,
               CASE WHEN vdt > 0
                    THEN floor((greatest(0.0, 1.0 - vr / vdt))
                               * 1e6 + 0.5) / 1e6
                    ELSE 0.0 END AS seasonal_strength
        FROM vx
    )
    SELECT dow_idx, n_days, seasonal_cents,
           std_detrended, std_remainder, seasonal_strength
    FROM seas CROSS JOIN gstats
"""


# Empirical-Bayes shrinkage report size
EB_TOP_K = 20


def q_part_return_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K parts by empirical-Bayes shrunk return rate — the
    small-sample ranking fix (Efron & Morris 1975; beta-binomial
    method-of-moments): a part with 2 returns out of 3 lineitems must
    not outrank one with 200/400, so each raw rate k/n shrinks toward
    the corpus prior with strength α+β = m(1−m)/v − 1 fitted from the
    observed rate distribution, and the report ranks (k+α)/(n+α+β).

    Plan: one lineitem scan to the part grid (k = returned, n =
    total), rate moments as 6-dp staged DECIMAL sums in a 1-row
    aggregate broadcast back, the shrunk rate map-side, TakeOrdered
    K — the mahalanobis shape: no window, no global sort. Degenerate
    priors (v = 0 or v >= m(1−m), where MoM breaks) fall back to zero
    strength — raw rates — via the same guarded CASE in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    parts = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    r = F.col("k").cast("double") / F.col("n").cast("double")
    staged = parts.select(
        "l_partkey", "n", "k", fround(r, 6).alias("r6")
    )
    d10 = "decimal(10,6)"
    mom = staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.sum(F.col("r6").cast("decimal(25,6)")).cast("double").alias("sr"),
        F.sum(F.col("r6").cast(d10) * F.col("r6").cast(d10))
        .cast("double")
        .alias("srr"),
    )
    np_d = F.col("np").cast("double")
    m = F.col("sr") / np_d
    v = F.col("srr") / np_d - m * m
    strength = F.when(
        (v > 0) & (v < m * (F.lit(1.0) - m)),
        m * (F.lit(1.0) - m) / v - F.lit(1.0),
    ).otherwise(F.lit(0.0))
    prior = mom.select(
        fround(m, 6).alias("prior_mean"),
        fround(strength, 6).alias("prior_strength"),
    )
    alpha = F.col("prior_mean") * F.col("prior_strength")
    shrunk = fround(
        (F.col("k").cast("double") + alpha)
        / (F.col("n").cast("double") + F.col("prior_strength")),
        6,
    )
    return (
        staged.crossJoin(F.broadcast(prior))
        .select(
            F.col("l_partkey").alias("partkey"),
            "n",
            "k",
            F.col("r6").alias("raw_rate"),
            shrunk.alias("shrunk_rate"),
            "prior_mean",
            "prior_strength",
        )
        .orderBy(F.col("shrunk_rate").desc(), F.col("partkey"))
        .limit(EB_TOP_K)
    )


QUERIES["part_return_shrinkage"] = q_part_return_shrinkage

ORACLE["part_return_shrinkage"] = f"""
    WITH parts AS (
        SELECT l_partkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS k
        FROM lineitem GROUP BY 1
    ),
    staged AS (
        SELECT l_partkey, n, k,
               floor((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6 + 0.5)
                   / 1e6 AS r6
        FROM parts
    ),
    mom AS (
        SELECT CAST(count(*) AS BIGINT) AS np,
               CAST(sum(CAST(r6 AS DECIMAL(25,6))) AS DOUBLE) AS sr,
               CAST(sum(CAST(r6 AS DECIMAL(10,6))
                        * CAST(r6 AS DECIMAL(10,6))) AS DOUBLE) AS srr
        FROM staged
    ),
    prior AS (
        SELECT floor((sr / CAST(np AS DOUBLE)) * 1e6 + 0.5) / 1e6
                   AS prior_mean,
               CASE WHEN (srr / CAST(np AS DOUBLE)
                          - (sr / CAST(np AS DOUBLE)) * (sr / CAST(np AS DOUBLE)))
                         > 0
                     AND (srr / CAST(np AS DOUBLE)
                          - (sr / CAST(np AS DOUBLE)) * (sr / CAST(np AS DOUBLE)))
                         < (sr / CAST(np AS DOUBLE))
                           * (1.0 - sr / CAST(np AS DOUBLE))
                    THEN floor(((sr / CAST(np AS DOUBLE))
                                * (1.0 - sr / CAST(np AS DOUBLE))
                                / (srr / CAST(np AS DOUBLE)
                                   - (sr / CAST(np AS DOUBLE))
                                     * (sr / CAST(np AS DOUBLE)))
                                - 1.0) * 1e6 + 0.5) / 1e6
                    ELSE 0.0 END AS prior_strength
        FROM mom
    )
    SELECT l_partkey AS partkey, n, k, r6 AS raw_rate,
           floor(((CAST(k AS DOUBLE) + prior_mean * prior_strength)
                  / (CAST(n AS DOUBLE) + prior_strength)) * 1e6 + 0.5) / 1e6
               AS shrunk_rate,
           prior_mean, prior_strength
    FROM staged CROSS JOIN prior
    ORDER BY shrunk_rate DESC, partkey
    LIMIT {EB_TOP_K}
"""


# Holt's linear-trend smoothing constants (Holt 1957 / Winters 1960)
HOLT_ALPHA = 0.2
HOLT_BETA = 0.1

HOLT_SCHEMA = (
    "d int, v bigint, level double, trend double, fitted double, "
    "resid double"
)


def q_revenue_holt_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing of daily revenue (Holt 1957):
    level/trend recursion l_t = αv_t + (1−α)(l+b), b_t = β(l_t−l) +
    (1−β)b with one-step-ahead fitted values and residuals — the
    adaptive-trend complement of revenue_theil_sen's single global
    slope (Theil-Sen answers "is revenue growing"; this tracks WHERE
    the trend bends, and its residuals are the anomaly input).

    This is the repo's one genuinely RECURSIVE time-series operator —
    each state depends on the previous step, inexpressible as window
    functions — so the Spark side is an ``applyInPandas`` recurrence
    over the BOUNDED day grid (the documented pattern for per-key
    recurrences; the grid does not grow with fact volume, and a
    per-key variant would partition by the key) and the oracle is a
    DuckDB ``WITH RECURSIVE`` CTE stepping the identical staged
    arithmetic. Determinism: every update 6-dp floor-staged in BOTH
    engines (identical IEEE op order, Python floats being IEEE
    doubles); init l₁ = v₁, b₁ = v₂ − v₁ (exact integers). Needs >= 2
    days — returns empty below that, by contract.
    """
    import math

    daily = _daily_revenue_cents(load_table(spark, sf_dir, "orders"))

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        cols = ["d", "v", "level", "trend", "fitted", "resid"]
        if len(pdf) < 2:
            return pd.DataFrame({c: [] for c in cols})

        def st(x: float) -> float:
            return math.floor(x * 1e6 + 0.5) / 1e6

        ds = [int(x) for x in pdf["d"]]
        vs = [float(x) for x in pdf["v"]]
        prev_l, prev_b = vs[0], vs[1] - vs[0]
        out = [(ds[0], int(vs[0]), prev_l, prev_b, vs[0], 0.0)]
        for t in range(1, len(vs)):
            fitted = st(prev_l + prev_b)
            l_new = st(
                HOLT_ALPHA * vs[t] + (1.0 - HOLT_ALPHA) * (prev_l + prev_b)
            )
            b_new = st(
                HOLT_BETA * (l_new - prev_l) + (1.0 - HOLT_BETA) * prev_b
            )
            out.append(
                (ds[t], int(vs[t]), l_new, b_new, fitted, st(vs[t] - fitted))
            )
            prev_l, prev_b = l_new, b_new
        return pd.DataFrame(dict(zip(cols, map(list, zip(*out)))))

    return (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(_holt, schema=HOLT_SCHEMA)
    )


QUERIES["revenue_holt_smoothing"] = q_revenue_holt_smoothing

ORACLE["revenue_holt_smoothing"] = f"""
    WITH RECURSIVE daily AS ({_DAILY_CENTS_SQL}
    ),
    idx AS (
        SELECT d, v, row_number() OVER (ORDER BY d) AS t FROM daily
    ),
    hw AS (
        SELECT i1.t, i1.d, i1.v,
               CAST(i1.v AS DOUBLE) AS l,
               CAST(i2.v AS DOUBLE) - CAST(i1.v AS DOUBLE) AS b
        FROM idx i1 JOIN idx i2 ON i1.t = 1 AND i2.t = 2
        UNION ALL
        SELECT i.t, i.d, i.v,
               floor(({HOLT_ALPHA} * CAST(i.v AS DOUBLE)
                      + {1.0 - HOLT_ALPHA} * (hw.l + hw.b)) * 1e6 + 0.5) / 1e6,
               floor(({HOLT_BETA}
                      * (floor(({HOLT_ALPHA} * CAST(i.v AS DOUBLE)
                                + {1.0 - HOLT_ALPHA} * (hw.l + hw.b))
                               * 1e6 + 0.5) / 1e6
                         - hw.l)
                      + {1.0 - HOLT_BETA} * hw.b) * 1e6 + 0.5) / 1e6
        FROM hw JOIN idx i ON i.t = hw.t + 1
    )
    SELECT CAST(d AS INT) AS d, v, l AS level, b AS trend,
           CASE WHEN t = 1 THEN CAST(v AS DOUBLE)
                ELSE floor((lag(l) OVER (ORDER BY t)
                            + lag(b) OVER (ORDER BY t)) * 1e6 + 0.5) / 1e6
           END AS fitted,
           CASE WHEN t = 1 THEN 0.0
                ELSE floor((CAST(v AS DOUBLE)
                            - floor((lag(l) OVER (ORDER BY t)
                                     + lag(b) OVER (ORDER BY t))
                                    * 1e6 + 0.5) / 1e6) * 1e6 + 0.5) / 1e6
           END AS resid
    FROM hw
"""


# Holt-Winters additive triple smoothing (Winters 1960): weekly period
HW_ALPHA = 0.25
HW_BETA = 0.05
HW_GAMMA = 0.1
HW_PERIOD = 7

HW_SCHEMA = (
    "d int, v bigint, level double, trend double, seasonal double, "
    "fitted double, resid double"
)


def q_revenue_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing of daily
    revenue (Winters 1960; Holt 1957) with a period-7 seasonal state —
    the seasonal extension of ``revenue_holt_smoothing``: level and
    trend adapt exactly as Holt does, and a 7-slot seasonal vector
    absorbs the weekly cycle so the residuals are de-seasonalized
    anomaly input (a Monday that is merely Monday-sized stops looking
    like a dip).

    Recursion (position t, slot k = (t-1) mod 7, s = seasonal state):
    fitted = l + b + s[k];  l' = alpha*(v - s[k]) + (1-alpha)*(l + b);
    b' = beta*(l' - l) + (1-beta)*b;  s[k]' = gamma*(v - l') +
    (1-gamma)*s[k].  Init from the first two weeks: l0 = mean(week 1),
    b0 = (mean(week 2) - mean(week 1))/7, s_j = v_j - l0; emission
    starts at t = 8 and needs >= 14 days (empty below, by contract).
    Seasonal slots key on SEQUENCE POSITION, not calendar weekday: the
    classic formulation assumes a regular series (the orders grid is
    dense at every tested SF), and position slots keep the modulus
    strictly non-negative in every engine (d % 7 on a pre-epoch date
    is engine-signed — the portability trap weekday_seasonality dodged
    with an epoch modulus).

    Like its Holt sibling this is genuinely RECURSIVE state — each
    step reads the previous level/trend AND the slot written 7 steps
    earlier, inexpressible as window functions — so Spark runs an
    ``applyInPandas`` recurrence over the BOUNDED day grid (the grid
    does not grow with fact volume; a 100 TB fact still collapses to
    ~2.4k day rows in the one distributed scan) and the oracle is a
    DuckDB ``WITH RECURSIVE`` CTE carrying the 7 seasonal slots as
    columns and rotating the active slot by a generated CASE — every
    update 6-dp floor-staged in BOTH engines (identical IEEE op
    order), so the full 2.4k-step recursion is bit-exact.
    """
    daily = _daily_revenue_cents(load_table(spark, sf_dir, "orders"))

    def _hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d").reset_index(drop=True)
        cols = ["d", "v", "level", "trend", "seasonal", "fitted", "resid"]
        if len(pdf) < 2 * HW_PERIOD:
            return pd.DataFrame({c: [] for c in cols})

        def st(x: float) -> float:
            return math.floor(x * 1e6 + 0.5) / 1e6

        ds = [int(x) for x in pdf["d"]]
        vs = [float(x) for x in pdf["v"]]
        m1 = st(sum(int(v) for v in vs[:HW_PERIOD]) / 7.0)
        m2 = st(sum(int(v) for v in vs[HW_PERIOD : 2 * HW_PERIOD]) / 7.0)
        lev, tr = m1, st((m2 - m1) / 7.0)
        seas = [st(v - m1) for v in vs[:HW_PERIOD]]
        out = []
        for t in range(HW_PERIOD, len(vs)):
            k = t % HW_PERIOD
            sp = seas[k]
            fitted = st(lev + tr + sp)
            l_new = st(
                HW_ALPHA * (vs[t] - sp) + (1.0 - HW_ALPHA) * (lev + tr)
            )
            b_new = st(HW_BETA * (l_new - lev) + (1.0 - HW_BETA) * tr)
            s_new = st(HW_GAMMA * (vs[t] - l_new) + (1.0 - HW_GAMMA) * sp)
            out.append(
                (ds[t], int(vs[t]), l_new, b_new, s_new, fitted,
                 st(vs[t] - fitted))
            )
            lev, tr, seas[k] = l_new, b_new, s_new
        return pd.DataFrame(dict(zip(cols, map(list, zip(*out)))))

    return (
        daily.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(_hw, schema=HW_SCHEMA)
    )


QUERIES["revenue_holt_winters"] = q_revenue_holt_winters


def _hw_oracle() -> str:
    """Generate the recursive-CTE oracle: the 7 seasonal slots ride
    along as columns s0..s6; the active slot (hw.t % 7, which is the
    incoming position's (t-1) % 7) rotates via CASE. The staged l'
    expression is textually repeated inside b'/s' exactly as the Holt
    oracle repeats it — WITH RECURSIVE cannot name a mid-step value."""
    a, b, g = HW_ALPHA, HW_BETA, HW_GAMMA
    sp = (
        "CASE (hw.t % 7) "
        + " ".join(f"WHEN {j} THEN hw.s{j}" for j in range(7))
        + " END"
    )
    v = "CAST(i.v AS DOUBLE)"
    lnew = (
        f"floor(({a} * ({v} - {sp}) + {1.0 - a} * (hw.l + hw.b))"
        " * 1e6 + 0.5) / 1e6"
    )
    bnew = f"floor(({b} * ({lnew} - hw.l) + {1.0 - b} * hw.b) * 1e6 + 0.5) / 1e6"
    snew = f"floor(({g} * ({v} - {lnew}) + {1.0 - g} * {sp}) * 1e6 + 0.5) / 1e6"
    fitted = f"floor((hw.l + hw.b + {sp}) * 1e6 + 0.5) / 1e6"
    resid = f"floor(({v} - {fitted}) * 1e6 + 0.5) / 1e6"
    slots = ", ".join(
        f"CASE WHEN (hw.t % 7) = {j} THEN {snew} ELSE hw.s{j} END AS s{j}"
        for j in range(7)
    )
    init_s = ", ".join(
        f"floor(((SELECT CAST(v AS DOUBLE) FROM idx WHERE t = {j + 1})"
        " - agg.m1) * 1e6 + 0.5) / 1e6"
        f" AS s{j}"
        for j in range(7)
    )
    return f"""
    WITH RECURSIVE daily AS ({_DAILY_CENTS_SQL}
    ),
    idx AS (
        SELECT d, v, row_number() OVER (ORDER BY d) AS t FROM daily
    ),
    agg AS (
        SELECT floor((CAST(sum(CASE WHEN t <= 7 THEN v ELSE 0 END)
                           AS DOUBLE) / 7.0) * 1e6 + 0.5) / 1e6 AS m1,
               floor((CAST(sum(CASE WHEN t BETWEEN 8 AND 14 THEN v ELSE 0 END)
                           AS DOUBLE) / 7.0) * 1e6 + 0.5) / 1e6 AS m2,
               max(t) AS n
        FROM idx
    ),
    hw AS (
        SELECT CAST(7 AS BIGINT) AS t, 0 AS d, CAST(0 AS BIGINT) AS v,
               agg.m1 AS l,
               floor(((agg.m2 - agg.m1) / 7.0) * 1e6 + 0.5) / 1e6 AS b,
               {init_s},
               CAST(0 AS DOUBLE) AS seasonal, CAST(0 AS DOUBLE) AS fitted, CAST(0 AS DOUBLE) AS resid
        FROM agg WHERE agg.n >= 14
        UNION ALL
        SELECT i.t, i.d, i.v,
               {lnew} AS l,
               {bnew} AS b,
               {slots},
               {snew} AS seasonal,
               {fitted} AS fitted,
               {resid} AS resid
        FROM hw JOIN idx i ON i.t = hw.t + 1
    )
    SELECT CAST(d AS INT) AS d, v, l AS level, b AS trend, seasonal,
           fitted, resid
    FROM hw WHERE t >= 8
"""


ORACLE["revenue_holt_winters"] = _hw_oracle()


def q_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection on daily revenue by binary
    segmentation (Scott & Knott 1974; the first step of the standard
    binary-segmentation / PELT family): pick the split of the day
    sequence into two segments that maximally reduces total squared
    error — "did the revenue level SHIFT, and when?" — the level-shift
    complement of the trend operators (theil_sen fits one slope;
    CUSUM flags drift against a fixed mean; this one finds the best
    two-mean model). Minimizing SSE_left + SSE_right is equivalent to
    maximizing gain(t) = S_L^2/t + S_R^2/(n-t) (the constant total sum
    of squares drops out of the argmin), so no sum-of-squares column
    is needed at all — only prefix sums.

    Scale shape: the fact collapses to the bounded DAY grid in the one
    distributed map-combinable scan (exact integer cents, the shared
    ``_daily_revenue_cents`` front end); prefix sums are a window over
    grid rows only (bounded, never the corpus), gain is arithmetic on
    exact-integer-derived doubles (prefix sums < 2^53, so both engines
    square and divide IDENTICAL doubles in identical op order — gain
    ships as the RAW double, un-staged, because cents^2 magnitudes
    overflow fround's BIGINT floor, the seasonal_decompose variance
    lesson; the means ARE 6-dp staged), and the argmax is a
    distributed TakeOrdered(1) on (gain desc, day) — no global sort.
    Fewer than 2 days on the grid -> no valid split -> empty, by
    construction (split positions t in [1, n-1]).
    """
    from pyspark.sql import Window

    # Persisted because BOTH consumers (the prefix-sum window and the
    # 1-row total) read it: without the cache the orders scan + grid
    # aggregate runs twice. The cached frame is the bounded day grid —
    # a few KB at any corpus size.
    daily = _daily_revenue_cents(load_table(spark, sf_dir, "orders")).persist()
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pref = daily.select(
        "d",
        F.row_number().over(Window.orderBy("d")).alias("t"),
        F.sum("v").over(w).cast("bigint").alias("sl"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("s"),
    )
    sl = F.col("sl").cast("double")
    sr = (F.col("s") - F.col("sl")).cast("double")
    t_d = F.col("t").cast("double")
    r_d = (F.col("n") - F.col("t")).cast("double")
    cand = (
        pref.join(F.broadcast(tot))
        .where((F.col("t") >= 1) & (F.col("t") <= F.col("n") - 1))
        .select(
            F.col("d").alias("split_d"),
            F.col("t").cast("bigint").alias("n_left"),
            (F.col("n") - F.col("t")).cast("bigint").alias("n_right"),
            fround(sl / t_d, 6).alias("mean_left"),
            fround(sr / r_d, 6).alias("mean_right"),
            (sl * sl / t_d + sr * sr / r_d).alias("gain"),
        )
    )
    return cand.orderBy(F.desc("gain"), "split_d").limit(1)


QUERIES["revenue_changepoint"] = q_revenue_changepoint

ORACLE["revenue_changepoint"] = f"""
    WITH daily AS ({_DAILY_CENTS_SQL}
    ),
    pref AS (
        SELECT d,
               row_number() OVER (ORDER BY d) AS t,
               CAST(sum(v) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS sl
        FROM daily
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s
        FROM daily
    )
    SELECT d AS split_d,
           t AS n_left,
           (n - t) AS n_right,
           floor((CAST(sl AS DOUBLE) / CAST(t AS DOUBLE)) * 1e6 + 0.5) / 1e6
               AS mean_left,
           floor((CAST(s - sl AS DOUBLE) / CAST(n - t AS DOUBLE)) * 1e6 + 0.5)
               / 1e6 AS mean_right,
           (CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(t AS DOUBLE)
            + CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE)
              / CAST(n - t AS DOUBLE)) AS gain
    FROM pref, tot
    WHERE t BETWEEN 1 AND n - 1
    ORDER BY gain DESC, split_d
    LIMIT 1
"""


def q_revenue_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test on daily revenue (Wald & Wolfowitz
    1940): is the above/below-median sequence of daily revenue RANDOM,
    or does it clump (momentum / regime persistence -> fewer runs than
    chance) or oscillate (alternating promotion cycles -> more runs)?
    The classic distribution-free randomness screen a forecasting
    pipeline runs before trusting an i.i.d.-residual model — the
    sequence-structure complement of the level tools (changepoint,
    CUSUM detect WHERE structure sits; this one asks WHETHER the
    sequence is structured at all).

    Days equal to the median are dropped (the standard tie rule), runs
    R = 1 + sign flips over the day order, and the normal
    approximation gives z = (R - mu) / sigma with
    mu = 2*n1*n2/(n1+n2) + 1 and
    sigma^2 = 2*n1*n2*(2*n1*n2 - n1 - n2) / ((n1+n2)^2 * (n1+n2-1)).

    Scale shape: the fact collapses to the bounded DAY grid in one
    map-combinable scan (exact integer cents); the median is an exact
    ``percentile`` over grid rows broadcast back; the flip count is a
    lag window over the bounded grid (never the corpus); the closed
    form is arithmetic on one 4-value row. Counts are grid-bounded
    (~2.4k) so every product is integer-exact in doubles; mu/z are
    fround-staged from identical inputs in identical op order; the
    degenerate one-sided sequence (n1*n2 = 0 or n1+n2 < 2) emits NULL
    mu/z via the same guard in both engines.
    """
    from pyspark.sql import Window

    # Persisted because BOTH consumers (the broadcast median and the
    # flagged-sequence scan) read it: without the cache the orders
    # scan + grid aggregate runs twice. The cached frame is the
    # bounded day grid — a few KB at any corpus size (the
    # q_revenue_changepoint cache posture).
    daily = _daily_revenue_cents(load_table(spark, sf_dir, "orders")).persist()
    med = daily.agg(F.expr("percentile(v, 0.5)").alias("med"))
    flagged = (
        daily.crossJoin(F.broadcast(med))
        .where(F.col("v").cast("double") != F.col("med"))
        .select("d", (F.col("v").cast("double") > F.col("med")).alias("s"))
    )
    w = Window.orderBy("d")
    seq = flagged.select(
        "s",
        F.when(
            F.lag("s").over(w).isNotNull()
            & (F.lag("s").over(w) != F.col("s")),
            1,
        )
        .otherwise(0)
        .alias("flip"),
    )
    stats = seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(F.when(F.col("s"), 1).otherwise(0)).cast("bigint").alias(
            "n_above"
        ),
        F.sum(F.when(~F.col("s"), 1).otherwise(0)).cast("bigint").alias(
            "n_below"
        ),
        (F.sum("flip") + F.lit(1)).cast("bigint").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = F.col("n_below").cast("double")
    n = n1 + n2
    mu = F.lit(2.0) * n1 * n2 / n + F.lit(1.0)
    var = (
        F.lit(2.0) * n1 * n2 * (F.lit(2.0) * n1 * n2 - n1 - n2)
        / (n * n * (n - F.lit(1.0)))
    )
    ok = (F.col("n_above") * F.col("n_below") > 0) & (
        F.col("n_above") + F.col("n_below") >= 2
    )
    return stats.select(
        "n_days",
        "n_above",
        "n_below",
        "n_runs",
        F.when(ok, fround(mu, 6)).alias("mu_runs"),
        F.when(
            ok & (var > 0.0),
            fround((F.col("n_runs").cast("double") - mu) / F.sqrt(var), 6),
        ).alias("z_score"),
    )


QUERIES["revenue_runs_test"] = q_revenue_runs_test

_RUNS_MU = "(2.0 * n1 * n2 / (n1 + n2) + 1.0)"
_RUNS_VAR = (
    "(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)"
    " / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1.0)))"
)

ORACLE["revenue_runs_test"] = f"""
    WITH daily AS ({_DAILY_CENTS_SQL}
    ),
    med AS (SELECT quantile_cont(v, 0.5) AS med FROM daily),
    flagged AS (
        SELECT d, CAST(v AS DOUBLE) > med AS s
        FROM daily CROSS JOIN med
        WHERE CAST(v AS DOUBLE) <> med
    ),
    seq AS (
        SELECT s,
               CASE WHEN lag(s) OVER (ORDER BY d) IS NOT NULL
                     AND lag(s) OVER (ORDER BY d) <> s
                    THEN 1 ELSE 0 END AS flip
        FROM flagged
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
               CAST(sum(CASE WHEN s THEN 0 ELSE 1 END) AS BIGINT) AS n_below,
               CAST(sum(flip) + 1 AS BIGINT) AS n_runs
        FROM seq
    ),
    d AS (
        SELECT n_days, n_above, n_below, n_runs,
               CAST(n_above AS DOUBLE) AS n1,
               CAST(n_below AS DOUBLE) AS n2
        FROM stats
    )
    SELECT n_days, n_above, n_below, n_runs,
           CASE WHEN n_above * n_below > 0 AND n_above + n_below >= 2
                THEN floor(({_RUNS_MU}) * 1e6 + 0.5) / 1e6 END AS mu_runs,
           CASE WHEN n_above * n_below > 0 AND n_above + n_below >= 2
                 AND {_RUNS_VAR} > 0.0
                THEN floor(((CAST(n_runs AS DOUBLE) - {_RUNS_MU})
                            / sqrt({_RUNS_VAR})) * 1e6 + 0.5) / 1e6
           END AS z_score
    FROM d
"""


# ---------------------------------------------------------------------------
# revenue_periodogram — epoch-folding variance-ratio spectrum over the
# daily revenue grid: seasonal strength at every integer period
# ---------------------------------------------------------------------------

PERIOD_MIN = 2
PERIOD_MAX = 30


def q_revenue_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-folding periodogram of daily revenue: for every integer
    trial period p in [PERIOD_MIN, PERIOD_MAX], fold the day grid by
    d mod p and score the period by the fraction of total variance the
    fold explains — SS_between(p) / SS_total, the one-way-ANOVA
    variance ratio (phase-dispersion-minimization family, Stellingwerf
    ApJ 1978: a true period p makes the folded phase groups tight, so
    the ratio peaks at p and its multiples). This is the trig-free
    periodogram: a Fourier periodogram's cos/sin terms differ across
    engines in the last ulp and poison a hash oracle, while the
    variance ratio needs only the exact integer-cent group sums the
    ``_daily_revenue_cents`` grid already provides. Companion to
    ``events_autocorr`` (lag domain) and ``orders_seasonal_decompose``
    (which ASSUMES period 7; this one finds it — the weekly peak is
    what the decomposition's assumption rests on).

    Output: one row per period — n_groups, the 6-dp variance ratio
    (seasonal strength), and its rank (1 = strongest). Determinism AND
    conditioning: sums of squares use the MEAN-DEVIATION form in
    thousands of dollars, never the raw-sum-of-squares shortcut —
    sum(S_g^2/n_g) - S^2/N subtracts ~1e18-magnitude terms that agree
    only in their first digit (catastrophic cancellation measured to
    turn the spectrum into noise) and overflows the 6-dp staging
    window, while n_g*(m_g - m)^2 keeps every staged term small and
    exact: group sums/counts are exact BIGINTs, each deviation term is
    one IEEE-determined double expression on them (identical in any
    engine), 6-dp floor-staged, DECIMAL-summed.

    Scale shape: the fold is one explode of the day grid by the
    PERIOD_MIN..PERIOD_MAX trial vector — a calendar x 29 grid
    (bounded: ~2.4k days at any SF, the grid never touches fact rows)
    — then two map-combinable aggregates ((p, d mod p) then p); the
    rank is a window over the <=29-row period spectrum. Everything
    upstream of the day grid is the shared daily-revenue aggregate
    (one shuffle of the orders fact).
    """
    daily = _daily_revenue_cents(load_table(spark, sf_dir, "orders"))
    return _periodogram_spectrum(daily)


def _periodogram_spectrum(daily: DataFrame) -> DataFrame:
    """The fold + variance-ratio spectrum over a (d, v-cents) daily
    grid — shared by the batch periodogram above and the maintained-
    grid streaming form (``streaming/events.py:q_streaming_periodogram``),
    so the two can never drift on the arithmetic."""
    from pyspark.sql import Window

    totals = daily.agg(
        F.sum("v").cast("bigint").alias("_sum_cents"),
        F.count(F.lit(1)).cast("bigint").alias("_n"),
    )
    # grand mean in thousands of dollars (1e5 cents) — exact-int
    # inputs, so the double is engine-independent
    grand = F.col("_sum_cents").cast("double") / (
        F.col("_n").cast("double") * F.lit(1e5)
    )
    day_dev = F.col("v").cast("double") / F.lit(1e5) - grand
    sst_df = (
        daily.crossJoin(F.broadcast(totals))
        .agg(
            F.sum(
                fround(day_dev * day_dev, 6).cast("decimal(25,6)")
            ).alias("_sst")
        )
    )
    folded = (
        daily.select(
            "d", "v",
            F.explode(
                F.sequence(F.lit(PERIOD_MIN), F.lit(PERIOD_MAX))
            ).alias("p"),
        )
        .groupBy("p", (F.col("d") % F.col("p")).alias("phase"))
        .agg(
            F.sum("v").cast("bigint").alias("s_g"),
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
        )
    )
    group_dev = F.col("s_g").cast("double") / (
        F.col("n_g").cast("double") * F.lit(1e5)
    ) - grand
    per_period = (
        folded.crossJoin(F.broadcast(totals))
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(
                fround(
                    F.col("n_g").cast("double") * group_dev * group_dev, 6
                ).cast("decimal(25,6)")
            ).alias("_ssb"),
        )
    )
    scored = per_period.crossJoin(F.broadcast(sst_df)).select(
        F.col("p").alias("period_days"),
        "n_groups",
        fround(
            F.col("_ssb").cast("double") / F.col("_sst").cast("double"), 6
        ).alias("strength"),
    )
    rk = Window.orderBy(F.col("strength").desc(), "period_days")
    return scored.select(
        "period_days", "n_groups", "strength",
        F.row_number().over(rk).alias("rank"),
    )


QUERIES["revenue_periodogram"] = q_revenue_periodogram

ORACLE["revenue_periodogram"] = f"""
    WITH daily AS ({_DAILY_CENTS_SQL}
    ),
    totals AS (
        SELECT CAST(sum(v) AS BIGINT) AS sum_cents,
               CAST(count(*) AS BIGINT) AS n
        FROM daily
    ),
    sst AS (
        SELECT sum(CAST(floor(
                   ((CAST(v AS DOUBLE) / 1e5
                     - CAST(sum_cents AS DOUBLE)
                       / (CAST(n AS DOUBLE) * 1e5))
                    * (CAST(v AS DOUBLE) / 1e5
                       - CAST(sum_cents AS DOUBLE)
                         / (CAST(n AS DOUBLE) * 1e5)))
                   * 1e6 + 0.5) / 1e6 AS DECIMAL(25,6))) AS sst
        FROM daily, totals
    ),
    folded AS (
        SELECT p, d % p AS phase,
               CAST(sum(v) AS BIGINT) AS s_g,
               CAST(count(*) AS BIGINT) AS n_g
        FROM daily,
             (SELECT unnest(generate_series({PERIOD_MIN}, {PERIOD_MAX}))
                     AS p)
        GROUP BY 1, 2
    ),
    per_period AS (
        SELECT p,
               CAST(count(*) AS BIGINT) AS n_groups,
               sum(CAST(floor(
                   (CAST(n_g AS DOUBLE)
                    * (CAST(s_g AS DOUBLE)
                       / (CAST(n_g AS DOUBLE) * 1e5)
                       - CAST(sum_cents AS DOUBLE)
                         / (CAST(n AS DOUBLE) * 1e5))
                    * (CAST(s_g AS DOUBLE)
                       / (CAST(n_g AS DOUBLE) * 1e5)
                       - CAST(sum_cents AS DOUBLE)
                         / (CAST(n AS DOUBLE) * 1e5)))
                   * 1e6 + 0.5) / 1e6 AS DECIMAL(25,6))) AS ssb
        FROM folded, totals
        GROUP BY 1
    ),
    scored AS (
        SELECT p AS period_days, n_groups,
               floor((CAST(ssb AS DOUBLE) / CAST(sst AS DOUBLE))
                     * 1e6 + 0.5) / 1e6 AS strength
        FROM per_period, sst
    )
    SELECT period_days, n_groups, strength,
           CAST(row_number() OVER (ORDER BY strength DESC, period_days)
                AS INTEGER) AS rank
    FROM scored
"""


# ---------------------------------------------------------------------------
# orders_revenue_ccf — lagged cross-correlation (CCF) between the daily
# ORDER-COUNT series and the daily REVENUE series: does volume lead
# value? The cross-variable companion to events_autocorr (same-series
# calendar lags) on the shared day grid.
# ---------------------------------------------------------------------------

CCF_MAX_LAG = 14


def q_orders_revenue_ccf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation function between daily order count x(t) and
    daily revenue y(t + lag) for lag 0..``CCF_MAX_LAG``, on the DENSE
    calendar spine (gap days are genuine zeros — dropping them would
    misalign every lag): the lead/lag diagnostic between volume and
    value (a positive peak at lag k says order volume leads revenue by
    k days; the lag-0 value is the contemporaneous mix effect).

    Scale shape: the fact collapses to the bounded day grid in ONE
    scan; the spine is generated from the min/max aggregate; the lag
    alignment is a grid-to-grid self-join on (day + lag) after a lag
    explode — days x lags rows regardless of fact volume; one
    map-combinable per-lag aggregate ends the plan. Determinism: both
    series are exact integers (counts; floor-staged cents), the five
    pair sums are exact (BIGINT / DECIMAL(38,0) for the cents
    products), and each CCF value is one IEEE expression on those
    exact sums, 6-dp floor-staged; zero variance on either margin
    yields NULL in both engines."""
    orders = load_table(spark, sf_dir, "orders")
    # the (d, v) recipe is _daily_revenue_cents verbatim plus the
    # count column; test_ccf_daily_grid_matches_shared_helper pins the
    # two against each other so the staging discipline cannot drift
    daily = orders.groupBy(
        F.datediff(
            F.to_date("o_orderdate"), F.lit(SEASON_EPOCH).cast("date")
        ).alias("d")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        ).cast("bigint").alias("v"),
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    dense = spine.join(daily, "d", "left").select(
        "d",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        F.coalesce("v", F.lit(0)).cast("bigint").alias("v"),
    )
    d18 = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    lagged = dense.select(
        "d", "n",
        F.explode(
            F.sequence(F.lit(0), F.lit(CCF_MAX_LAG))
        ).alias("lag"),
    ).alias("x")
    pairs = lagged.join(
        dense.alias("y"),
        F.col("x.d") + F.col("x.lag") == F.col("y.d"),
    ).select(
        "lag",
        F.col("x.n").alias("a"),
        F.col("y.v").alias("b"),
    )
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("a").cast("bigint").alias("_sa"),
        F.sum("b").cast("bigint").alias("_sb"),
        F.sum(F.col("a") * F.col("a")).cast("bigint").alias("_saa"),
        F.sum((d18("b") * d18("b")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("_sbb"),
        F.sum((d18("a") * d18("b")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("_sab"),
    )
    n = F.col("n_pairs").cast("double")
    sa, sb = F.col("_sa").cast("double"), F.col("_sb").cast("double")
    cov = n * F.col("_sab").cast("double") - sa * sb
    var_a = n * F.col("_saa").cast("double") - sa * sa
    var_b = n * F.col("_sbb").cast("double") - sb * sb
    ccf = F.when(
        (var_a > 0) & (var_b > 0),
        fround(cov / F.sqrt(var_a * var_b), 6),
    )
    return agg.select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        ccf.alias("ccf"),
    )


QUERIES["orders_revenue_ccf"] = q_orders_revenue_ccf

ORACLE["orders_revenue_ccf"] = f"""
    WITH daily AS (
        SELECT datediff('day', DATE '{SEASON_EPOCH}',
                        CAST(o_orderdate AS DATE)) AS d,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    spine AS (
        SELECT unnest(generate_series(lo, hi)) AS d FROM bounds
    ),
    dense AS (
        SELECT spine.d,
               coalesce(n, 0) AS n,
               coalesce(v, 0) AS v
        FROM spine LEFT JOIN daily ON spine.d = daily.d
    ),
    lags AS (SELECT unnest(generate_series(0, {CCF_MAX_LAG})) AS lag),
    pairs AS (
        SELECT lag, x.n AS a, y.v AS b
        FROM dense x CROSS JOIN lags
        JOIN dense y ON x.d + lag = y.d
    ),
    agg AS (
        SELECT lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(sum(a) AS BIGINT) AS sa,
               CAST(sum(b) AS BIGINT) AS sb,
               CAST(sum(a * a) AS BIGINT) AS saa,
               CAST(sum(CAST(b AS DECIMAL(18,0))
                        * CAST(b AS DECIMAL(18,0))) AS DECIMAL(38,0))
                   AS sbb,
               CAST(sum(CAST(a AS DECIMAL(18,0))
                        * CAST(b AS DECIMAL(18,0))) AS DECIMAL(38,0))
                   AS sab
        FROM pairs GROUP BY 1
    )
    SELECT CAST(lag AS INTEGER) AS lag, n_pairs,
           CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(saa AS DOUBLE)
                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) > 0
                 AND CAST(n_pairs AS DOUBLE) * CAST(sbb AS DOUBLE)
                     - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) > 0
                THEN floor(((CAST(n_pairs AS DOUBLE) * CAST(sab AS DOUBLE)
                             - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
                            / sqrt((CAST(n_pairs AS DOUBLE)
                                    * CAST(saa AS DOUBLE)
                                    - CAST(sa AS DOUBLE)
                                      * CAST(sa AS DOUBLE))
                                   * (CAST(n_pairs AS DOUBLE)
                                      * CAST(sbb AS DOUBLE)
                                      - CAST(sb AS DOUBLE)
                                        * CAST(sb AS DOUBLE))))
                           * 1e6 + 0.5) / 1e6
                ELSE NULL END AS ccf
    FROM agg
"""


# ---------------------------------------------------------------------------
# revenue_hurst — rescaled-range (R/S) Hurst exponent of the daily
# revenue series (Hurst 1951; Mandelbrot & Wallis 1969): long-range
# dependence in one number — H ~ 0.5 random walk, H > 0.5 persistent
# (trends compound), H < 0.5 anti-persistent (mean-reverting)
# ---------------------------------------------------------------------------

HURST_SCALES = (8, 16, 32, 64, 128, 256)


def q_revenue_hurst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by classical R/S analysis on the DENSE daily
    revenue series (gap days are genuine zeros): for each scale n in
    ``HURST_SCALES``, split the series into complete n-day blocks; per
    block compute R = range of the cumulative deviations from the
    block mean and S = the block standard deviation; average R/S over
    blocks; H is the slope of ln(mean R/S) against ln(n) — the
    long-memory diagnostic next to the periodogram (periodicity) and
    autocorr (fixed lags): H says whether shocks PERSIST across
    scales. The time-series family's scaling-law member.

    Scale shape: the fact collapses to the bounded day grid in one
    scan; the scale explode is days x |scales| grid rows; cumulative
    sums and block stats are windows over (scale, block) partitions
    bounded by the largest scale (256 rows) — nothing grows with fact
    volume. Determinism: the series is exact integer cents, per-block
    sums are exact (BIGINT / DECIMAL for squares), every per-block
    double (mean, Z_k, R, S) is a fixed IEEE expression on exact ints,
    each block's R/S is 6-dp floor-staged before the DECIMAL per-scale
    mean, the two log coordinates are 9-dp staged before the DECIMAL
    fit sums (the elasticity discipline), and the final slope/r2 are
    single expressions on those exact decimals."""
    from pyspark.sql import Window

    daily = _daily_revenue_cents(load_table(spark, sf_dir, "orders"))
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    dense = (
        bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
        .join(daily, "d", "left")
        .crossJoin(F.broadcast(bounds))
        .select(
            (F.col("d") - F.col("lo")).alias("rn"),
            F.coalesce("v", F.lit(0)).cast("bigint").alias("v"),
        )
    )
    d18 = F.col("v").cast("decimal(18,0)")
    scaled = dense.select(
        "rn", "v",
        F.explode(
            F.array(*[F.lit(s) for s in HURST_SCALES])
        ).alias("s"),
    ).select(
        "s", "v",
        F.floor(F.col("rn") / F.col("s")).cast("bigint").alias("blk"),
        (F.col("rn") % F.col("s") + 1).alias("k"),
    )
    part = Window.partitionBy("s", "blk")
    wcum = part.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    rows = scaled.select(
        "s", "blk", "k", "v",
        F.count(F.lit(1)).over(part).alias("n_b"),
        F.sum("v").over(part).cast("bigint").alias("sx"),
        F.sum((d18 * d18).cast("decimal(38,0)")).over(part)
        .cast("decimal(38,0)").alias("sxx"),
        F.sum("v").over(wcum).cast("bigint").alias("cum"),
    ).filter(F.col("n_b") == F.col("s"))  # complete blocks only
    mean = F.col("sx").cast("double") / F.col("s").cast("double")
    z = F.col("cum").cast("double") - F.col("k").cast("double") * mean
    blk = rows.groupBy("s", "blk").agg(
        (F.max(z) - F.min(z)).alias("r"),
        F.max(mean).alias("mean"),
        F.max(F.col("sxx").cast("double")).alias("sxx_d"),
    )
    std = F.sqrt(
        F.greatest(
            F.col("sxx_d") / F.col("s").cast("double")
            - F.col("mean") * F.col("mean"),
            F.lit(0.0),
        )
    )
    rs = fround(F.col("r") / std, 6).cast("decimal(25,6)")
    per_scale = blk.filter(std > 0).groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(rs).alias("_rs_sum"),
    )
    mean_rs = F.col("_rs_sum").cast("double") / F.col("n_blocks").cast(
        "double"
    )
    pts = per_scale.filter(mean_rs > 0).select(
        fround(F.log(F.col("s").cast("double")), 9).alias("lx"),
        fround(F.log(mean_rs), 9).alias("ly"),
    )
    d9 = "decimal(28,9)"
    fit = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_scales"),
        F.sum(F.col("lx").cast(d9)).cast(d9).alias("_sx"),
        F.sum(F.col("ly").cast(d9)).cast(d9).alias("_sy"),
        F.sum(fround(F.col("lx") * F.col("lx"), 9).cast(d9))
        .cast(d9).alias("_sxx"),
        F.sum(fround(F.col("lx") * F.col("ly"), 9).cast(d9))
        .cast(d9).alias("_sxy"),
        F.sum(fround(F.col("ly") * F.col("ly"), 9).cast(d9))
        .cast(d9).alias("_syy"),
    )
    n_days = bounds.select(
        (F.col("hi") - F.col("lo") + 1).cast("bigint").alias("n_days")
    )
    n = F.col("n_scales").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx, sxy = F.col("_sxx").cast("double"), F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    det = n * sxx - sx * sx
    slope = (n * sxy - sx * sy) / det
    r2 = F.when(
        (det > 0) & (n * syy - sy * sy > 0),
        fround(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / (det * (n * syy - sy * sy)),
            6,
        ),
    )
    return fit.crossJoin(F.broadcast(n_days)).select(
        "n_days",
        "n_scales",
        F.when(det > 0, fround(slope, 6)).alias("hurst"),
        r2.alias("r2"),
    )


QUERIES["revenue_hurst"] = q_revenue_hurst

ORACLE["revenue_hurst"] = f"""
    WITH daily AS ({_DAILY_CENTS_SQL}
    ),
    bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
    dense AS (
        SELECT spine.d - bounds.lo AS rn, coalesce(v, 0) AS v
        FROM (SELECT unnest(generate_series(lo, hi)) AS d
              FROM bounds) spine
        CROSS JOIN bounds
        LEFT JOIN daily ON spine.d = daily.d
    ),
    scaled AS (
        SELECT s, v,
               rn // s AS blk,
               rn % s + 1 AS k
        FROM dense CROSS JOIN
             (SELECT unnest({list(HURST_SCALES)}) AS s)
    ),
    rows_ AS (
        SELECT s, blk, k, v,
               count(*) OVER (PARTITION BY s, blk) AS n_b,
               CAST(sum(v) OVER (PARTITION BY s, blk) AS BIGINT) AS sx,
               CAST(sum(CAST(v AS DECIMAL(18,0)) * CAST(v AS DECIMAL(18,0)))
                    OVER (PARTITION BY s, blk) AS DECIMAL(38,0)) AS sxx,
               CAST(sum(v) OVER (PARTITION BY s, blk ORDER BY k
                                 ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum
        FROM scaled
        QUALIFY n_b = s
    ),
    blk AS (
        SELECT s, blk,
               max(CAST(cum AS DOUBLE)
                   - CAST(k AS DOUBLE)
                     * (CAST(sx AS DOUBLE) / CAST(s AS DOUBLE)))
               - min(CAST(cum AS DOUBLE)
                     - CAST(k AS DOUBLE)
                       * (CAST(sx AS DOUBLE) / CAST(s AS DOUBLE))) AS r,
               max(CAST(sx AS DOUBLE) / CAST(s AS DOUBLE)) AS mean,
               max(CAST(sxx AS DOUBLE)) AS sxx_d
        FROM rows_ GROUP BY 1, 2
    ),
    rs AS (
        SELECT s,
               CAST(floor((r / sqrt(greatest(
                        sxx_d / CAST(s AS DOUBLE) - mean * mean, 0.0)))
                    * 1e6 + 0.5) / 1e6 AS DECIMAL(25,6)) AS rs
        FROM blk
        WHERE sqrt(greatest(sxx_d / CAST(s AS DOUBLE) - mean * mean,
                            0.0)) > 0
    ),
    per_scale AS (
        SELECT s, CAST(count(*) AS BIGINT) AS n_blocks,
               sum(rs) AS rs_sum
        FROM rs GROUP BY 1
    ),
    pts AS (
        SELECT floor(ln(CAST(s AS DOUBLE)) * 1e9 + 0.5) / 1e9 AS lx,
               floor(ln(CAST(rs_sum AS DOUBLE)
                        / CAST(n_blocks AS DOUBLE)) * 1e9 + 0.5) / 1e9
                   AS ly
        FROM per_scale
        WHERE CAST(rs_sum AS DOUBLE) / CAST(n_blocks AS DOUBLE) > 0
    ),
    fit AS (
        SELECT CAST(count(*) AS BIGINT) AS n_scales,
               CAST(sum(CAST(lx AS DECIMAL(28,9))) AS DOUBLE) AS sx,
               CAST(sum(CAST(ly AS DECIMAL(28,9))) AS DOUBLE) AS sy,
               CAST(sum(CAST(floor((lx * lx) * 1e9 + 0.5) / 1e9
                             AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
               CAST(sum(CAST(floor((lx * ly) * 1e9 + 0.5) / 1e9
                             AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
               CAST(sum(CAST(floor((ly * ly) * 1e9 + 0.5) / 1e9
                             AS DECIMAL(28,9))) AS DOUBLE) AS syy
        FROM pts
    ),
    nd AS (SELECT CAST(hi - lo + 1 AS BIGINT) AS n_days FROM bounds)
    SELECT n_days, n_scales,
           CASE WHEN CAST(n_scales AS DOUBLE) * sxx - sx * sx > 0
                THEN floor(((CAST(n_scales AS DOUBLE) * sxy - sx * sy)
                            / (CAST(n_scales AS DOUBLE) * sxx - sx * sx))
                           * 1e6 + 0.5) / 1e6
                ELSE NULL END AS hurst,
           CASE WHEN CAST(n_scales AS DOUBLE) * sxx - sx * sx > 0
                 AND CAST(n_scales AS DOUBLE) * syy - sy * sy > 0
                THEN floor((((CAST(n_scales AS DOUBLE) * sxy - sx * sy)
                             * (CAST(n_scales AS DOUBLE) * sxy - sx * sy))
                            / ((CAST(n_scales AS DOUBLE) * sxx - sx * sx)
                               * (CAST(n_scales AS DOUBLE) * syy
                                  - sy * sy)))
                           * 1e6 + 0.5) / 1e6
                ELSE NULL END AS r2
    FROM fit CROSS JOIN nd
"""


# ---------------------------------------------------------------------------
# revenue_mann_kendall — the nonparametric monotone-trend TEST on the
# daily revenue grid (Mann 1945; Kendall 1975): theil_sen answers "how
# steep?", this answers "is there a trend at all, and how sure are
# we?" — S statistic, tie-corrected variance, the normal-approximation
# z score, and Kendall's tau-b effect size
# ---------------------------------------------------------------------------


def q_revenue_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test of daily order revenue: S = sum of
    sign(v_j - v_i) over all day pairs i < j (an exact integer),
    Var(S) with the tie correction [n(n-1)(2n+5) - sum t(t-1)(2t+5)]
    / 18 over the value-tie groups, the continuity-corrected normal z
    = (S -/+ 1)/sqrt(Var(S)), and tau-b = S / sqrt((n0 - n1) * n0)
    (day keys are distinct, so the time-side tie term is zero) — the
    distribution-free companion every monitoring stack pairs with the
    Theil-Sen slope (outlier days move neither).

    Scale shape: the ``revenue_theil_sen`` plan verbatim — the fact
    collapses to the bounded DAY grid in one scan, and the O(grid^2)
    pair space lives on that grid (broadcast self-join), independent
    of fact volume; the tie groups are one grid-bounded aggregate.
    Determinism: S and both variance numerators are exact BIGINT
    arithmetic; z and tau-b are single IEEE expressions on
    exact-integer-derived doubles, 6-dp floored."""
    daily = _daily_revenue_cents(load_table(spark, sf_dir, "orders"))
    return _mann_kendall_from_daily(daily)


def _mann_kendall_from_daily(daily: DataFrame) -> DataFrame:
    """The Mann-Kendall derivation off a (d, v) day grid — shared by
    the batch operator and the streaming twin (which reads the
    maintained ``daily_revenue_sink`` grid), so the two surfaces can
    never drift on the statistic."""
    a = daily.select(F.col("d").alias("d1"), F.col("v").alias("v1"))
    b = daily.select(F.col("d").alias("d2"), F.col("v").alias("v2"))
    s = (
        a.join(F.broadcast(b), F.col("d2") > F.col("d1"))
        .agg(
            F.sum(
                F.signum((F.col("v2") - F.col("v1")).cast("double"))
                .cast("bigint")
            )
            .cast("bigint")
            .alias("s_stat")
        )
    )
    ties = (
        daily.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).cast("bigint").alias("tie3"),
            F.sum(F.col("t") * (F.col("t") - 1))
            .cast("bigint")
            .alias("n1_twice"),
            F.sum("t").cast("bigint").alias("n_days"),
        )
    )
    n = F.col("n_days").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("tie3").cast("double")
    ) / F.lit(18.0)
    n0 = n * (n - 1) / F.lit(2.0)
    n1 = F.col("n1_twice").cast("double") / F.lit(2.0)
    sd = F.col("s_stat").cast("double")
    z = F.when(F.col("s_stat") > 0, (sd - 1) / F.sqrt(var_s)).when(
        F.col("s_stat") < 0, (sd + 1) / F.sqrt(var_s)
    ).otherwise(F.lit(0.0))
    # an all-tied series has n1 = n0 (and a single day n0 = 0): the
    # tau-b denominator degenerates to 0 — S is necessarily 0 there,
    # so publish tau_b = 0 instead of dividing by zero (ANSI mode
    # makes the raw division an error, not a NaN)
    tau_b = F.when(
        (n0 - n1) * n0 > 0, sd / F.sqrt((n0 - n1) * n0)
    ).otherwise(F.lit(0.0))
    return s.crossJoin(ties).select(
        "n_days",
        "s_stat",
        fround(var_s, 6).alias("var_s"),
        fround(z, 6).alias("z"),
        fround(tau_b, 6).alias("tau_b"),
    )


QUERIES["revenue_mann_kendall"] = q_revenue_mann_kendall

ORACLE["revenue_mann_kendall"] = f"""
    WITH daily AS ({_DAILY_CENTS_SQL}
    ),
    s AS (
        SELECT CAST(sum(CAST(sign(CAST(b.v - a.v AS DOUBLE)) AS BIGINT))
                    AS BIGINT) AS s_stat
        FROM daily a JOIN daily b ON b.d > a.d
    ),
    groups AS (
        SELECT v, CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY v
    ),
    ties AS (
        SELECT CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie3,
               CAST(sum(t * (t - 1)) AS BIGINT) AS n1_twice,
               CAST(sum(t) AS BIGINT) AS n_days
        FROM groups
    )
    SELECT n_days, s_stat,
           floor(((CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1)
                   * (2 * CAST(n_days AS DOUBLE) + 5)
                   - CAST(tie3 AS DOUBLE)) / 18.0) * 1e6 + 0.5) / 1e6
               AS var_s,
           floor((CASE
               WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1)
                   / sqrt((CAST(n_days AS DOUBLE)
                           * (CAST(n_days AS DOUBLE) - 1)
                           * (2 * CAST(n_days AS DOUBLE) + 5)
                           - CAST(tie3 AS DOUBLE)) / 18.0)
               WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1)
                   / sqrt((CAST(n_days AS DOUBLE)
                           * (CAST(n_days AS DOUBLE) - 1)
                           * (2 * CAST(n_days AS DOUBLE) + 5)
                           - CAST(tie3 AS DOUBLE)) / 18.0)
               ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS z,
           floor((CASE WHEN (CAST(n_days AS DOUBLE)
                             * (CAST(n_days AS DOUBLE) - 1) / 2.0
                             - CAST(n1_twice AS DOUBLE) / 2.0)
                            * (CAST(n_days AS DOUBLE)
                               * (CAST(n_days AS DOUBLE) - 1) / 2.0) > 0
                  THEN CAST(s_stat AS DOUBLE)
                       / sqrt((CAST(n_days AS DOUBLE)
                               * (CAST(n_days AS DOUBLE) - 1) / 2.0
                               - CAST(n1_twice AS DOUBLE) / 2.0)
                              * (CAST(n_days AS DOUBLE)
                                 * (CAST(n_days AS DOUBLE) - 1) / 2.0))
                  ELSE 0.0 END) * 1e6 + 0.5) / 1e6 AS tau_b
    FROM s CROSS JOIN ties
"""
