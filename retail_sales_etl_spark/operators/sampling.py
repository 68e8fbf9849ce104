"""Deterministic corpus sampling for training-data pipelines.

Random sampling (``df.sample``) is non-reproducible across runs,
partitionings, and engines; a training pipeline needs the SAME sample
every run so downstream shards/dedups/evals stay stable. Both
operators key the decision on a cryptographic hash of the doc id:

- ``sample_stratified``: per-language keep RATES (downsample the
  dominant languages, keep the long tail whole — the standard
  data-mixture rebalance). A doc is kept iff the first 8 hex chars of
  md5('sample|' || doc_id) sort below the stratum's threshold; on
  lowercase hex, string order == numeric order, so the threshold for
  rate r is just hex(floor(r * 2^32)) — portable to any engine with
  md5 and no int-parsing of hex anywhere.
- ``sample_topk_per_stratum``: exactly k docs per source (fixed-size
  strata for eval sets), the k smallest hash keys per group — a
  deterministic reservoir. Window rank per group, never a global sort.

Both are single-scan + (for top-k) one hash-partitioned window; no
shuffle at all for the rate filter. At 100 TB the rate filter runs
entirely map-side and prunes before any downstream shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..catalog import load_table
from ..functions.rounding import fround

# Keep rates per language stratum; absent languages keep everything.
SAMPLE_RATES = {"en": 0.25, "de": 0.5, "fr": 0.5}
TOPK_PER_SOURCE = 10
_SALT = "sample|"


def _threshold_hex(rate: float) -> str:
    """8-hex-char threshold with string order == numeric order.

    rate >= 1.0 maps to 'g', which sorts after every hex digit, so the
    predicate is vacuously true without a 9-char carry case.
    """
    if rate >= 1.0:
        return "g"
    return format(int(rate * 0x100000000), "08x")


def _key(col: F.Column) -> F.Column:
    return F.substring(F.md5(F.concat(F.lit(_SALT), col.cast("string"))), 1, 8)


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-based stratified sample: keep iff hash key < stratum threshold."""
    docs = load_table(spark, sf_dir, "documents")
    thr = None
    for lang, rate in sorted(SAMPLE_RATES.items()):
        branch = F.when(F.col("lang") == lang, F.lit(_threshold_hex(rate)))
        thr = branch if thr is None else thr.when(
            F.col("lang") == lang, F.lit(_threshold_hex(rate))
        )
    thr = thr.otherwise(F.lit(_threshold_hex(1.0)))
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            _key(F.col("doc_id")).alias("sample_key"),
            thr.alias("threshold"),
        )
        .filter(F.col("sample_key") < F.col("threshold"))
        .drop("threshold")
    )


def q_sample_topk_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size strata: the k smallest hash keys per source."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    return (
        docs.select(
            "doc_id", "source", _key(F.col("doc_id")).alias("sample_key")
        )
        .withColumn("rank_in_stratum", F.row_number().over(w))
        .filter(F.col("rank_in_stratum") <= TOPK_PER_SOURCE)
    )


TOKEN_BUDGET = 20_000


def q_mix_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing: downsample each language so every
    language contributes ~equally to a fixed total token budget.

    The per-language keep RATE is derived from the data (rate =
    min(1, (budget / n_langs) / lang_tokens)), so the static
    hex-threshold trick doesn't apply; instead the hash prefix becomes
    a numeric uniform u in [0,1) (32-bit slice / 2^32 — exact in a
    double) and the doc is kept iff u < rate. Both engines compute
    rate and u with the same integer inputs and the same double ops,
    so the comparison is bit-identical. Plan shape: one scan for the
    per-language totals (tiny agg, broadcast back) + one map-side
    filter pass — no shuffle of the corpus itself.
    """
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    toks = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    lang_tot = toks.groupBy("lang").agg(
        F.sum("n_tokens").cast("bigint").alias("lang_tokens")
    )
    n_langs = lang_tot.agg(F.count(F.lit(1)).alias("n_langs"))
    rates = lang_tot.crossJoin(broadcast(n_langs)).select(
        "lang",
        "lang_tokens",
        F.least(
            F.lit(1.0),
            (F.lit(float(TOKEN_BUDGET)) / F.col("n_langs"))
            / F.col("lang_tokens").cast("double"),
        ).alias("keep_rate"),
    )
    u = (
        F.conv(_key(F.col("doc_id")), 16, 10).cast("bigint").cast("double")
        / F.lit(4294967296.0)
    )
    return (
        toks.join(broadcast(rates), "lang")
        .withColumn("u", u)
        .filter(F.col("u") < F.col("keep_rate"))
        .select("doc_id", "lang", "n_tokens", "keep_rate", "u")
    )


MIX_ALPHA = 0.3


def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual mixing (the p^alpha recipe used
    by multilingual LM data pipelines): sampling share q_l is
    proportional to p_l^alpha where p_l is the language's natural token
    share — alpha < 1 flattens the distribution toward the long tail
    without going fully uniform (mix_token_budget is the alpha=0 case).

    keep_rate_l = min(1, (BUDGET * q_l) / lang_tokens). Engine
    portability: pow() goes through libm on DuckDB but java.lang.Math
    on Spark, so each p^alpha is rounded to 6 dp and cast to DECIMAL
    before the normalizing sum (order-independent, exact) — the same
    rule the tf-idf ln() path uses. The doc-level decision reuses the
    hash-prefix uniform: keep iff u < keep_rate. One tiny agg broadcast
    back + a map-side filter; the corpus itself never shuffles.
    """
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    toks = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    lang_tot = toks.groupBy("lang").agg(
        F.sum("n_tokens").cast("bigint").alias("lang_tokens")
    )
    tot = lang_tot.agg(
        F.sum("lang_tokens").cast("bigint").alias("total_tokens")
    )
    w = fround(
        F.pow(
            F.col("lang_tokens").cast("double")
            / F.col("total_tokens").cast("double"),
            F.lit(MIX_ALPHA),
        ), 6).cast("decimal(18,6)")
    weighted = lang_tot.join(broadcast(tot)).select(
        "lang", "lang_tokens", w.alias("w")
    )
    wsum = weighted.agg(F.sum("w").alias("w_sum"))
    rates = weighted.join(broadcast(wsum)).select(
        "lang",
        "lang_tokens",
        fround(
            F.least(
                F.lit(1.0),
                (
                    F.lit(float(TOKEN_BUDGET))
                    * (F.col("w").cast("double") / F.col("w_sum").cast("double"))
                )
                / F.col("lang_tokens").cast("double"),
            ), 6).alias("keep_rate"),
    )
    u = (
        F.conv(_key(F.col("doc_id")), 16, 10).cast("bigint").cast("double")
        / F.lit(4294967296.0)
    )
    return (
        toks.join(broadcast(rates), "lang")
        .withColumn("u", u)
        .filter(F.col("u") < F.col("keep_rate"))
        .select("doc_id", "lang", "n_tokens", "keep_rate", "u")
    )


def _stratified_oracle() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN '{_threshold_hex(rate)}'"
        for lang, rate in sorted(SAMPLE_RATES.items())
    )
    return f"""
        SELECT doc_id, lang, source, sample_key
        FROM (
            SELECT doc_id, lang, source,
                   substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS sample_key,
                   CASE lang {cases} ELSE '{_threshold_hex(1.0)}' END AS threshold
            FROM documents
        )
        WHERE sample_key < threshold
    """


# train/valid/test cumulative hash-threshold boundaries
SPLIT_TRAIN = 0.9
SPLIT_VALID = 0.95
_SPLIT_SALT = "split|"


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test assignment: the split every LLM
    data pipeline needs to be STABLE across reruns, repartitions, and
    engines (a doc must never migrate from test into train between
    pipeline versions — that's eval contamination).

    Same hash-threshold machinery as sample_stratified: the first 8
    hex chars of a salted md5(doc_id) partition [0,1) into
    train/valid/test bands. Pure map-side projection — no shuffle, no
    RNG, and adding new docs never reassigns existing ones (each doc's
    band depends only on its own id).
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.lit(_SPLIT_SALT), F.col("doc_id").cast("string"))), 1, 8
    )
    split = (
        F.when(key < F.lit(_threshold_hex(SPLIT_TRAIN)), F.lit("train"))
        .when(key < F.lit(_threshold_hex(SPLIT_VALID)), F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.select("doc_id", "lang", "source", split.alias("split"))


WEIGHTED_K = 20
_ES_SALT = "wsample|"


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES, public algorithm): k docs drawn with probability
    proportional to token count — the data-mixing primitive for
    "sample by token mass, not doc count".

    Each doc gets key = ln(u)/w where u is its hash-uniform in (0,1)
    and w its weight; the k LARGEST keys are the sample. Same
    hash-not-RNG discipline as the other samplers (stable across
    runs/engines/partitionings); the key is 9-dp rounded with doc_id
    tie-break so the cross-engine ranking is exact. Top-k is a
    distributed TakeOrdered — no global sort materializes.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    # hash-uniform u in (0,1): first 8 hex chars as a 32-bit numerator
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_ES_SALT), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(0x100000000 + 1))
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        n_tokens.alias("n_tokens"),
        fround(F.log(u) / n_tokens, 9).alias("es_key"),
    )
    top = scored.orderBy(F.col("es_key").desc(), F.col("doc_id")).limit(
        WEIGHTED_K
    )
    w = Window.orderBy(F.col("es_key").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))


# Top-p quality selection: per source, keep the highest-quality docs
# holding the first MIX_TOP_P share of the source's tokens.
MIX_TOP_P = 0.6


def q_mix_top_p_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-ranked top-p token selection — the 'keep the
    best p of each source by token mass' curation step (nucleus-style
    cut over a quality score instead of probabilities).

    Scale shape: the corpus never sorts. Docs aggregate map-side into a
    (source, quality) BUCKET GRID (quality is 6-dp rounded, so the grid
    is bounded by distinct rounded scores, not docs); the cumulative
    token share runs as a window over that small grid (the skyline
    suffix-max pattern); a bucket is kept iff the tokens of strictly
    higher-quality buckets are still under p * source_tokens (the
    boundary bucket is included whole — deterministic, no intra-bucket
    order needed). Docs then keep/drop map-side by joining their
    bucket's verdict. A naive per-source cumsum window over DOCS would
    put each source's whole corpus in one window partition — the exact
    hot-partition hazard this grid formulation removes.

    Quality proxy: word density (n_tokens / n_chars), deterministic
    from the data; both engines round it identically at 6 dp.
    """
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    n_tokens = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    scored = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        fround(n_tokens.cast("double") / F.col("n_chars"), 6).alias(
            "quality"
        ),
    )
    grid = scored.groupBy("source", "quality").agg(
        F.sum("n_tokens").cast("bigint").alias("bucket_tokens")
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("source")
    verdict = grid.select(
        "source",
        "quality",
        F.coalesce(F.sum("bucket_tokens").over(w_cum), F.lit(0)).alias(
            "cum_before"
        ),
        F.sum("bucket_tokens").over(w_tot).alias("source_tokens"),
    ).filter(
        F.col("cum_before")
        < F.lit(MIX_TOP_P) * F.col("source_tokens").cast("double")
    )
    return scored.join(
        broadcast(verdict.select("source", "quality")), ["source", "quality"]
    ).select("doc_id", "source", "quality", "n_tokens")


# DSIR (Data Selection with Importance Resampling — Xie et al.,
# NeurIPS 2023): rank raw-corpus docs by how target-like they are under
# two hashed n-gram bag-of-words models. Features are word unigrams +
# bigrams hashed into DSIR_BUCKETS buckets; the importance weight of a
# doc is sum over its grams of log p_target(bucket) - log p_raw(bucket)
# with Laplace smoothing. The top-DSIR_TOP_K docs by weight are the
# selected set (deterministic counterpart of the paper's Gumbel-top-k
# resample — swap the tie-break key for logw + Gumbel(hash-uniform)
# noise to get the sampled variant; see sample_weighted for the A-ES
# form of that trick).
DSIR_BUCKETS = 1024
DSIR_TOP_K = 200
DSIR_TARGET_LANG = "en"
_DSIR_SALT = "dsir|"


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection: score every doc by its hashed-n-gram
    importance weight against the target slice (lang='en' plays the
    target distribution; the whole corpus is the raw distribution) and
    keep the top-k.

    Scale shape: one exploded (doc, gram) scan; bucket counts are a
    DSIR_BUCKETS-row aggregate (map-side combinable — the bucket table
    is KBs no matter the corpus) broadcast back onto the grid; the
    per-doc sum is the only doc-keyed shuffle; the final cut is a
    distributed TakeOrdered on the exact DECIMAL weight. Portability:
    bucket = hex-prefix of md5 (both engines parse the same 4 hex
    chars), per-bucket log-ratios rounded to 6 dp and summed in
    DECIMAL (order-independent), ranking on the exact sum.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
    base = docs.select(
        "doc_id",
        (F.col("lang") == DSIR_TARGET_LANG).alias("is_target"),
        toks.alias("__t"),
    )
    bigrams = F.when(
        F.size("__t") >= 2,
        F.expr(
            "transform(sequence(0, size(__t) - 2),"
            " i -> concat(__t[i], ' ', __t[i + 1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    grid = base.select(
        "doc_id",
        "is_target",
        F.explode(F.concat(F.col("__t"), bigrams)).alias("__g"),
    ).select(
        "doc_id",
        "is_target",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(_DSIR_SALT), F.col("__g"))), 1, 4
                ),
                16,
                10,
            ).cast("bigint")
            % DSIR_BUCKETS
        ).alias("bucket"),
    )
    bc = grid.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("tc"),
        F.count(F.lit(1)).alias("sc"),
    )
    tot = bc.agg(F.sum("tc").alias("t_total"), F.sum("sc").alias("s_total"))
    lp = bc.crossJoin(broadcast(tot)).select(
        "bucket",
        fround(
            F.log(
                (F.col("tc") + 1.0) / (F.col("t_total") + float(DSIR_BUCKETS))
            )
            - F.log(
                (F.col("sc") + 1.0) / (F.col("s_total") + float(DSIR_BUCKETS))
            ), 6)
        .cast("decimal(25,6)")
        .alias("lpv"),
    )
    per_doc = (
        grid.join(broadcast(lp), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("lpv").alias("_s"),
        )
    )
    return (
        per_doc.orderBy(F.col("_s").desc(), "doc_id")
        .limit(DSIR_TOP_K)
        .select(
            "doc_id", "n_grams", F.col("_s").cast("double").alias("dsir_logw")
        )
    )


QUERIES = {
    "dsir_select": q_dsir_select,
    "mix_top_p_quality": q_mix_top_p_quality,
    "corpus_split": q_corpus_split,
    "sample_weighted": q_sample_weighted,
    "sample_stratified": q_sample_stratified,
    "sample_topk_per_stratum": q_sample_topk_per_stratum,
    "mix_token_budget": q_mix_token_budget,
    "mix_temperature": q_mix_temperature,
}

ORACLE = {
    "dsir_select": f"""
        WITH toks AS (
            SELECT doc_id, lang = '{DSIR_TARGET_LANG}' AS is_target,
                   list_filter(string_split(lower(text), ' '),
                               x -> x <> '') AS t
            FROM documents
        ),
        grams AS (
            SELECT doc_id, is_target,
                   unnest(list_concat(
                       t,
                       CASE WHEN len(t) >= 2
                            THEN list_transform(
                                generate_series(1, len(t) - 1),
                                i -> t[i] || ' ' || t[i + 1])
                            ELSE [] END
                   )) AS g
            FROM toks
        ),
        grid AS (
            SELECT doc_id, is_target,
                   ('0x' || substring(md5('{_DSIR_SALT}' || g), 1, 4))::BIGINT
                       % {DSIR_BUCKETS} AS bucket
            FROM grams
        ),
        bc AS (
            SELECT bucket,
                   sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS tc,
                   count(*) AS sc
            FROM grid GROUP BY 1
        ),
        tot AS (SELECT sum(tc) AS t_total, sum(sc) AS s_total FROM bc),
        lp AS (
            SELECT bucket,
                   CAST(floor((
                       ln((tc + 1.0) / (t_total + {DSIR_BUCKETS}.0))
                       - ln((sc + 1.0) / (s_total + {DSIR_BUCKETS}.0))) * 1e6 + 0.5) / 1e6
                       AS DECIMAL(25,6)) AS lpv
            FROM bc, tot
        ),
        per_doc AS (
            SELECT g.doc_id, count(*) AS n_grams, sum(l.lpv) AS s
            FROM grid g JOIN lp l USING (bucket)
            GROUP BY 1
        )
        SELECT doc_id, n_grams, CAST(s AS DOUBLE) AS dsir_logw
        FROM per_doc
        ORDER BY s DESC, doc_id
        LIMIT {DSIR_TOP_K}
    """,
    "mix_top_p_quality": f"""
        WITH scored AS (
            SELECT doc_id, source,
                   length(text) - length(replace(text, ' ', '')) + 1
                       AS n_tokens,
                   floor((CAST(length(text) - length(replace(text, ' ', ''))
                              + 1 AS DOUBLE) / n_chars) * 1e6 + 0.5) / 1e6 AS quality
            FROM documents WHERE n_chars > 0
        ),
        grid AS (
            SELECT source, quality,
                   CAST(sum(n_tokens) AS BIGINT) AS bucket_tokens
            FROM scored GROUP BY 1, 2
        ),
        verdict AS (
            SELECT source, quality FROM (
                SELECT source, quality,
                       coalesce(sum(bucket_tokens) OVER (
                           PARTITION BY source ORDER BY quality DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                       ), 0) AS cum_before,
                       sum(bucket_tokens) OVER (
                           PARTITION BY source
                       ) AS source_tokens
                FROM grid
            )
            WHERE cum_before < {MIX_TOP_P} * CAST(source_tokens AS DOUBLE)
        )
        SELECT s.doc_id, s.source, s.quality, s.n_tokens
        FROM scored s JOIN verdict v
          ON s.source = v.source AND s.quality = v.quality
    """,
    "sample_weighted": f"""
        WITH scored AS (
            SELECT doc_id, lang, source,
                   length(text) - length(replace(text, ' ', '')) + 1
                       AS n_tokens,
                   floor((ln((CAST(
                       CAST('0x' || substring(
                           md5('{_ES_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                           AS UBIGINT) AS DOUBLE) + 1.0)
                       / {float(0x100000000 + 1)})
                     / (length(text) - length(replace(text, ' ', '')) + 1)) * 1e9 + 0.5) / 1e9
                       AS es_key
            FROM documents
        )
        SELECT doc_id, lang, source, n_tokens, es_key,
               CAST(row_number() OVER (ORDER BY es_key DESC, doc_id)
                    AS INTEGER) AS rank
        FROM scored
        ORDER BY es_key DESC, doc_id
        LIMIT {WEIGHTED_K}
    """,
    "corpus_split": f"""
        SELECT doc_id, lang, source,
               CASE WHEN substring(md5('{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < '{_threshold_hex(SPLIT_TRAIN)}' THEN 'train'
                    WHEN substring(md5('{_SPLIT_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                         < '{_threshold_hex(SPLIT_VALID)}' THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "sample_stratified": _stratified_oracle(),
    "mix_token_budget": f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
            FROM documents
        ),
        lang_tot AS (
            SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
            FROM toks GROUP BY 1
        ),
        rates AS (
            SELECT lang, lang_tokens,
                   least(1.0, ({TOKEN_BUDGET}.0 / (SELECT count(*) FROM lang_tot))
                              / CAST(lang_tokens AS DOUBLE)) AS keep_rate
            FROM lang_tot
        )
        SELECT doc_id, t.lang AS lang, n_tokens, keep_rate,
               CAST(('0x' || substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) / 4294967296.0 AS u
        FROM toks t
        JOIN rates r ON t.lang = r.lang
        WHERE CAST(('0x' || substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) / 4294967296.0 < keep_rate
    """,
    "mix_temperature": f"""
        WITH toks AS (
            SELECT doc_id, lang,
                   length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens
            FROM documents
        ),
        lang_tot AS (
            SELECT lang, CAST(sum(n_tokens) AS BIGINT) AS lang_tokens
            FROM toks GROUP BY 1
        ),
        weighted AS (
            SELECT lang, lang_tokens,
                   CAST(floor((pow(CAST(lang_tokens AS DOUBLE)
                                  / (SELECT CAST(sum(lang_tokens) AS DOUBLE)
                                     FROM lang_tot),
                                  {MIX_ALPHA})) * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6)) AS w
            FROM lang_tot
        ),
        rates AS (
            SELECT lang, lang_tokens,
                   floor((least(1.0,
                               ({TOKEN_BUDGET}.0
                                * (CAST(w AS DOUBLE)
                                   / (SELECT CAST(sum(w) AS DOUBLE)
                                      FROM weighted)))
                               / CAST(lang_tokens AS DOUBLE))) * 1e6 + 0.5) / 1e6 AS keep_rate
            FROM weighted
        )
        SELECT doc_id, t.lang AS lang, n_tokens, keep_rate,
               CAST(('0x' || substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) / 4294967296.0 AS u
        FROM toks t
        JOIN rates r ON t.lang = r.lang
        WHERE CAST(('0x' || substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))
                       AS BIGINT) / 4294967296.0 < keep_rate
    """,
    "sample_topk_per_stratum": f"""
        SELECT doc_id, source, sample_key, rank_in_stratum
        FROM (
            SELECT doc_id, source,
                   substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8)
                       AS sample_key,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8),
                                doc_id
                   ) AS rank_in_stratum
            FROM documents
        )
        WHERE rank_in_stratum <= {TOPK_PER_SOURCE}
    """,
}


# ---------------------------------------------------------------------------
# Balanced shard assignment via a distributed global rank.

N_SHARDS = 8


def q_shard_serpentine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to ``N_SHARDS`` size-balanced output shards by
    serpentine (boustrophedon) order over document length — the
    pre-training sharding step that keeps every shard's token total
    within one document of optimal for sorted inputs, instead of the
    2x imbalance round-robin can give on a skewed length distribution.

    The interesting part at scale is the GLOBAL rank by (n_chars desc,
    doc_id) computed WITHOUT a global sort: the bounded (n_chars)
    bucket grid is counted (map-combinable agg), cumulative offsets
    are a window over that grid only (bounded rows, never the corpus),
    and each doc's rank = its bucket's offset + a row_number windowed
    WITHIN its bucket — the distributed two-phase row_number pattern.
    Serpentine position is pure arithmetic on the rank; the output is
    the per-shard balance report.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    grid = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("bc"))
    # Bounded grid (distinct lengths), same dodge as mix_top_p_quality:
    # the unpartitioned window runs over grid rows, never documents.
    wg = (
        Window.orderBy(F.col("n_chars").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = grid.select(
        "n_chars", F.coalesce(F.sum("bc").over(wg), F.lit(0)).alias("off")
    )
    wb = Window.partitionBy("n_chars").orderBy("doc_id")
    ranked = docs.join(broadcast(offsets), "n_chars").withColumn(
        "rk", F.col("off") + F.row_number().over(wb)
    )
    pos = (F.col("rk") - 1) % (2 * N_SHARDS)
    shard = (
        F.when(pos < N_SHARDS, pos)
        .otherwise(2 * N_SHARDS - 1 - pos)
        .cast("int")
    )
    return (
        ranked.select(shard.alias("shard"), "n_chars")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


QUERIES["shard_serpentine"] = q_shard_serpentine

ORACLE["shard_serpentine"] = f"""
    WITH ranked AS (
        SELECT doc_id, n_chars,
               row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    ),
    assigned AS (
        SELECT n_chars,
               CAST(CASE WHEN (rk - 1) % {2 * N_SHARDS} < {N_SHARDS}
                         THEN (rk - 1) % {2 * N_SHARDS}
                         ELSE {2 * N_SHARDS - 1} - (rk - 1) % {2 * N_SHARDS}
                    END AS INTEGER) AS shard
        FROM ranked
    )
    SELECT shard, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY shard
"""


_GSPLIT_SALT = "gsplit|"


def q_corpus_split_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-aware train/valid/test split: the split key is the
    document's SOURCE, not its id, so every doc of one source lands in
    the same split — the leakage-safe split an eval pipeline needs
    when documents within a group are correlated (crawls of one site,
    chapters of one book, near-dup mirror pages): a doc-id-grain split
    puts near-identical group members on both sides of the train/test
    boundary, silently inflating eval (von Luxburg's grouped
    cross-validation discipline; the split_leakage_report operator
    MEASURES exactly that defect on the id-grain split).

    Same deterministic hash-threshold machinery as corpus_split (md5
    of the salted group key against SPLIT_TRAIN/SPLIT_VALID band
    edges): pure map-side projection, no shuffle, no RNG, and adding
    docs to an existing source never moves the source between splits.
    Output keeps the group hash band so the assignment is auditable.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(
        F.md5(F.concat(F.lit(_GSPLIT_SALT), F.col("source"))), 1, 8
    )
    split = (
        F.when(key < F.lit(_threshold_hex(SPLIT_TRAIN)), F.lit("train"))
        .when(key < F.lit(_threshold_hex(SPLIT_VALID)), F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        "doc_id", "source", key.alias("group_key"), split.alias("split")
    )


QUERIES["corpus_split_group"] = q_corpus_split_group

ORACLE["corpus_split_group"] = f"""
    SELECT doc_id, source,
           substring(md5('{_GSPLIT_SALT}' || source), 1, 8) AS group_key,
           CASE WHEN substring(md5('{_GSPLIT_SALT}' || source), 1, 8)
                     < '{_threshold_hex(SPLIT_TRAIN)}' THEN 'train'
                WHEN substring(md5('{_GSPLIT_SALT}' || source), 1, 8)
                     < '{_threshold_hex(SPLIT_VALID)}' THEN 'valid'
                ELSE 'test' END AS split
    FROM documents
"""


# ---------------------------------------------------------------------------
# Per-source reliability-weighted mixing.

REL_MIN_TOKENS = 5  # quality gate: shorter docs don't count as "clean"
REL_WL_LO = 3  # min mean word length (chars per token) for a clean doc
REL_WL_HI = 12  # max mean word length


def q_mix_source_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-weighted source mixing: each SOURCE's sampling share
    is its natural token share p_s scaled by a data-derived reliability
    score — the "trust the clean crawls more" mixing step a pretraining
    pipeline runs between quality scoring and temperature mixing
    (mix_temperature flattens by size alone; this one reweights by
    measured cleanliness, so a huge-but-noisy source stops dominating
    the budget).

    reliability_s = fraction of the source's docs passing a cheap
    integer-only quality gate (>= REL_MIN_TOKENS whitespace tokens and
    mean word length within [REL_WL_LO, REL_WL_HI] — compared via
    integer cross-multiplication, no float ratio, so both engines
    agree exactly). Sampling weight w_s = round6(reliability_s * p_s),
    summed in DECIMAL (order-independent); keep_rate_s = round6(
    min(1, BUDGET * (w_s / w_sum) / src_tokens)), 0 when every source
    scores 0. The doc-level keep decision reuses the hash-prefix
    uniform u (md5 slice / 2^32, bit-identical across engines): keep
    iff u < keep_rate.

    Scale shape: one map-combinable scan to the SOURCE grid (tiny —
    sources, not docs), the 1-row weight sum broadcast back onto the
    grid, and one map-side filter pass over the corpus; the corpus
    itself never shuffles, exactly like its mix_* siblings.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_nospace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    n_tokens = F.length("text") - n_nospace + 1
    toks = docs.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        n_nospace.alias("n_nospace"),
    )
    is_clean = (
        (F.col("n_tokens") >= F.lit(REL_MIN_TOKENS))
        & (F.lit(REL_WL_LO) * F.col("n_tokens") <= F.col("n_nospace"))
        & (F.col("n_nospace") <= F.lit(REL_WL_HI) * F.col("n_tokens"))
    )
    src = toks.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("src_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(is_clean.cast("bigint")).cast("bigint").alias("n_pass"),
    )
    tot = src.agg(F.sum("src_tokens").cast("bigint").alias("total_tokens"))
    rel = fround(
        F.col("n_pass").cast("double") / F.col("n_docs").cast("double"), 6
    )
    p_s = F.col("src_tokens").cast("double") / F.col("total_tokens").cast(
        "double"
    )
    weighted = src.join(broadcast(tot)).select(
        "source",
        "src_tokens",
        rel.alias("reliability"),
        fround(rel * p_s, 6).cast("decimal(18,6)").alias("w"),
    )
    wsum = weighted.agg(F.sum("w").alias("w_sum"))
    keep_rate = F.when(F.col("w_sum") == 0, F.lit(0.0)).otherwise(
        fround(
            F.least(
                F.lit(1.0),
                (
                    F.lit(float(TOKEN_BUDGET))
                    * (F.col("w").cast("double") / F.col("w_sum").cast("double"))
                )
                / F.col("src_tokens").cast("double"),
            ),
            6,
        )
    )
    rates = weighted.join(broadcast(wsum)).select(
        "source", "reliability", keep_rate.alias("keep_rate")
    )
    u = (
        F.conv(_key(F.col("doc_id")), 16, 10).cast("bigint").cast("double")
        / F.lit(4294967296.0)
    )
    return (
        toks.join(broadcast(rates), "source")
        .withColumn("u", u)
        .filter(F.col("u") < F.col("keep_rate"))
        .select("doc_id", "source", "n_tokens", "reliability", "keep_rate", "u")
    )


QUERIES["mix_source_reliability"] = q_mix_source_reliability

ORACLE["mix_source_reliability"] = f"""
    WITH toks AS (
        SELECT doc_id, source,
               length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
               length(replace(text, ' ', '')) AS n_nospace
        FROM documents
    ),
    src AS (
        SELECT source,
               CAST(sum(n_tokens) AS BIGINT) AS src_tokens,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_tokens >= {REL_MIN_TOKENS}
                              AND {REL_WL_LO} * n_tokens <= n_nospace
                              AND n_nospace <= {REL_WL_HI} * n_tokens
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
        FROM toks GROUP BY 1
    ),
    weighted AS (
        SELECT source, src_tokens,
               floor((CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE))
                     * 1e6 + 0.5) / 1e6 AS reliability,
               CAST(floor(((floor((CAST(n_pass AS DOUBLE)
                                   / CAST(n_docs AS DOUBLE)) * 1e6 + 0.5) / 1e6)
                           * (CAST(src_tokens AS DOUBLE)
                              / (SELECT CAST(sum(src_tokens) AS DOUBLE)
                                 FROM src)))
                          * 1e6 + 0.5) / 1e6 AS DECIMAL(18,6)) AS w
        FROM src
    ),
    rates AS (
        SELECT source, reliability,
               CASE WHEN (SELECT sum(w) FROM weighted) = 0 THEN 0.0
                    ELSE floor((least(1.0,
                               ({TOKEN_BUDGET}.0
                                * (CAST(w AS DOUBLE)
                                   / (SELECT CAST(sum(w) AS DOUBLE)
                                      FROM weighted)))
                               / CAST(src_tokens AS DOUBLE))) * 1e6 + 0.5) / 1e6
               END AS keep_rate
        FROM weighted
    )
    SELECT doc_id, t.source AS source, n_tokens, reliability, keep_rate,
           CAST(('0x' || substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) / 4294967296.0 AS u
    FROM toks t
    JOIN rates r ON t.source = r.source
    WHERE CAST(('0x' || substring(md5('{_SALT}' || CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) / 4294967296.0 < keep_rate
"""
