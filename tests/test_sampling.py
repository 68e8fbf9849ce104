"""Deterministic sampling: reproducibility, strata rates, fixed-k."""

from __future__ import annotations

from retail_sales_etl_spark.operators import sampling


def test_stratified_sample_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, sampling.q_sample_stratified(spark, sf_dir).collect()))
    b = sorted(map(tuple, sampling.q_sample_stratified(spark, sf_dir).collect()))
    assert a == b and len(a) > 0


def test_stratified_rates_approximately_hold(spark, sf_dir):
    from retail_sales_etl_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    totals = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    kept = {
        r["lang"]: r["count"]
        for r in sampling.q_sample_stratified(spark, sf_dir)
        .groupBy("lang")
        .count()
        .collect()
    }
    for lang, rate in sampling.SAMPLE_RATES.items():
        if totals.get(lang, 0) >= 50:
            observed = kept.get(lang, 0) / totals[lang]
            assert abs(observed - rate) < 0.2, (lang, observed, rate)
    # un-listed languages are kept whole
    for lang in totals:
        if lang not in sampling.SAMPLE_RATES:
            assert kept.get(lang, 0) == totals[lang]


def test_topk_per_stratum_exact_size(spark, sf_dir):
    out = sampling.q_sample_topk_per_stratum(spark, sf_dir)
    sizes = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert all(n == sampling.TOPK_PER_SOURCE for n in sizes.values())
    # sample must actually subset (the testdata has >k docs per source)
    from retail_sales_etl_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() < n_docs


def test_mix_token_budget_equalizes_language_shares(spark, sf_dir):
    """Downsampled languages must land near budget/n_langs tokens;
    languages below their share are kept whole (rate capped at 1)."""
    out = sampling.q_mix_token_budget(spark, sf_dir).collect()
    assert len(out) > 0
    per_lang = {}
    rates = {}
    for r in out:
        per_lang[r["lang"]] = per_lang.get(r["lang"], 0) + r["n_tokens"]
        rates[r["lang"]] = r["keep_rate"]
    n_langs = len(rates)
    share = sampling.TOKEN_BUDGET / n_langs
    for lang, kept_tokens in per_lang.items():
        if rates[lang] < 1.0:  # downsampled language: near its share
            assert abs(kept_tokens - share) / share < 0.35, (lang, kept_tokens, share)
        assert rates[lang] <= 1.0


def test_pack_sequences_contiguous_and_bounded(spark, sf_dir):
    """Pack ids per source are contiguous from 0, and every doc's pack
    start offset lies inside that pack's budget window."""
    from retail_sales_etl_spark.operators.text import MAX_SEQ_WORDS, q_pack_sequences

    rows = q_pack_sequences(spark, sf_dir).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, docs in by_source.items():
        docs.sort(key=lambda r: r["doc_id"])
        packs = sorted({r["pack_id"] for r in docs})
        assert packs == list(range(len(packs)))
        cum = 0
        for r in docs:
            assert r["pack_id"] == cum // MAX_SEQ_WORDS
            cum += r["n_words"]


def test_chunk_documents_contiguous_overlapping(spark, sf_dir):
    from retail_sales_etl_spark.operators.text import q_chunk_documents

    rows = q_chunk_documents(spark, sf_dir).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["chunk_idx"])
    for doc_id, idxs in by_doc.items():
        assert sorted(idxs) == list(range(len(idxs)))
    assert any(len(v) > 1 for v in by_doc.values())  # real multi-chunk docs


def test_mix_temperature_flattens_but_keeps_order(spark, sf_dir):
    """alpha<1 temperature sampling: keep_rate strictly decreases as a
    language's token mass grows (rate ~ p^(alpha-1)), and sampled
    shares sit BETWEEN the natural distribution and uniform."""
    from retail_sales_etl_spark.operators.sampling import q_mix_temperature

    rows = q_mix_temperature(spark, sf_dir).collect()
    assert rows
    per_lang = {}
    for r in rows:
        assert 0.0 < r["keep_rate"] <= 1.0
        assert 0.0 <= r["u"] < r["keep_rate"]
        per_lang.setdefault(r["lang"], r["keep_rate"])
    # recover lang_tokens from any row's rate ordering: bigger language
    # -> strictly smaller keep rate (ties impossible on this corpus)
    from retail_sales_etl_spark.catalog import load_table
    from pyspark.sql import functions as F

    toks = (
        load_table(spark, sf_dir, "documents")
        .select(
            "lang",
            (
                F.length("text")
                - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
                + 1
            ).alias("n"),
        )
        .groupBy("lang")
        .agg(F.sum("n").alias("tot"))
        .collect()
    )
    tokens = {r["lang"]: r["tot"] for r in toks}
    langs = [l for l in per_lang if l in tokens]
    for a in langs:
        for b in langs:
            if tokens[a] < tokens[b]:
                assert per_lang[a] >= per_lang[b]


def test_mix_temperature_deterministic(spark, sf_dir):
    from retail_sales_etl_spark.operators.sampling import q_mix_temperature

    one = sorted(r["doc_id"] for r in q_mix_temperature(spark, sf_dir).collect())
    two = sorted(r["doc_id"] for r in q_mix_temperature(spark, sf_dir).collect())
    assert one == two and one


def test_mix_top_p_keeps_top_share_per_source(spark, sf_dir):
    """Selected docs are the HIGHEST-quality buckets of each source and
    hold at least MIX_TOP_P of its tokens (boundary bucket included
    whole), never the whole source unless the cut demands it."""
    from pyspark.sql import functions as F

    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.sampling import (
        MIX_TOP_P,
        q_mix_top_p_quality,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_tokens = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    )
    totals = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(n_tokens).alias("t"))
        .collect()
    }
    sel = q_mix_top_p_quality(spark, sf_dir).collect()
    by_src: dict = {}
    for r in sel:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == set(totals)
    all_quality = {
        (r["doc_id"], r["source"]): r["q"]
        for r in docs.select(
            "doc_id",
            "source",
            F.round(n_tokens.cast("double") / F.col("n_chars"), 6).alias("q"),
        ).collect()
    }
    for src, rows in by_src.items():
        kept = sum(r["n_tokens"] for r in rows)
        # at least the top-p mass (boundary bucket included whole)...
        assert kept >= MIX_TOP_P * totals[src]
        # ...but a strict subset (the cut actually bites)
        assert kept < totals[src]
        # quality-downward-closed: every dropped doc of this source has
        # quality strictly below the lowest kept bucket
        min_kept_q = min(r["quality"] for r in rows)
        kept_ids = {r["doc_id"] for r in rows}
        for (doc_id, s), q in all_quality.items():
            if s == src and doc_id not in kept_ids:
                assert q < min_kept_q, (src, doc_id, q, min_kept_q)


def test_shard_serpentine_two_phase_rank_and_balance(spark, tmp_path):
    """The bucket-offset + within-bucket-window global rank must equal
    the naive single-window rank, and serpentine assignment must
    balance shard sizes to within one doc and shard char-totals to
    within the largest document."""
    from pyspark.sql import Row, Window
    from pyspark.sql import functions as F

    from retail_sales_etl_spark.operators.sampling import (
        N_SHARDS,
        q_shard_serpentine,
    )

    # Skewed lengths with heavy ties (many docs share a length bucket).
    rows = [
        Row(doc_id=i, text="x", lang="en", source="s", n_chars=(i % 7) ** 3 + 10)
        for i in range(200)
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    got = {r["shard"]: r for r in q_shard_serpentine(spark, d).collect()}
    assert set(got) == set(range(N_SHARDS))

    counts = [got[s]["n_docs"] for s in range(N_SHARDS)]
    assert max(counts) - min(counts) <= 1

    totals = [got[s]["total_chars"] for s in range(N_SHARDS)]
    max_len = max(r.n_chars for r in rows)
    assert max(totals) - min(totals) <= max_len

    # Result-equality vs the naive global-window rank.
    naive = (
        spark.read.parquet(f"{d}/documents.parquet")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
            ),
        )
        .collect()
    )
    exp: dict = {}
    for r in naive:
        pos = (r["rk"] - 1) % (2 * N_SHARDS)
        shard = pos if pos < N_SHARDS else 2 * N_SHARDS - 1 - pos
        e = exp.setdefault(shard, [0, 0])
        e[0] += 1
        e[1] += r["n_chars"]
    for s in range(N_SHARDS):
        assert (got[s]["n_docs"], got[s]["total_chars"]) == tuple(exp[s])


def test_corpus_split_group_same_source_same_split(spark, sf_dir):
    """Every doc of one source must land in ONE split (the leakage-
    safe guarantee), the bands must follow the group hash against the
    shared thresholds, and the assignment must be add-docs-stable
    (each row's split depends only on its own source)."""
    from retail_sales_etl_spark.operators.sampling import (
        q_corpus_split_group,
    )

    rows = q_corpus_split_group(spark, sf_dir).collect()
    assert rows
    per_source = {}
    for r in rows:
        per_source.setdefault(r["source"], set()).add(r["split"])
        assert r["split"] in ("train", "valid", "test")
    assert all(len(v) == 1 for v in per_source.values()), {
        k: v for k, v in per_source.items() if len(v) > 1
    }


def test_mix_source_reliability_downweights_noisy_source(spark, tmp_path):
    """Two sources with identical token mass; one is clean prose, the
    other is word-salad whose mean word length fails the [3,12] gate.
    The noisy source's reliability must be 0 and it must contribute
    ZERO sampled docs, while the clean source keeps a positive rate."""
    from pyspark.sql import Row

    rows = []
    for i in range(40):
        rows.append(
            Row(
                doc_id=i,
                source="clean",
                lang="en",
                text="solid words about retail sales and parts here",
                n_chars=46,
            )
        )
        rows.append(
            Row(
                doc_id=1000 + i,
                source="noisy",
                lang="en",
                # single-char tokens: mean word length 1 < REL_WL_LO
                text="a b c d e f g h i j k l m n o p q r s t u v w x",
                n_chars=47,
            )
        )
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = sampling.q_mix_source_reliability(spark, d).collect()
    assert len(out) > 0
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert "noisy" not in by_src, by_src.keys()
    assert all(r["reliability"] == 1.0 for r in by_src["clean"])
    assert all(0.0 < r["keep_rate"] <= 1.0 for r in by_src["clean"])
    assert all(r["u"] < r["keep_rate"] for r in by_src["clean"])


def test_mix_source_reliability_all_zero_sources_keep_nothing(spark, tmp_path):
    """Every source failing the quality gate => w_sum = 0 => the
    zero-division guard yields keep_rate 0 and an empty sample."""
    from pyspark.sql import Row

    rows = [
        Row(doc_id=i, source="s", lang="en", text="x y", n_chars=3)
        for i in range(10)
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    assert sampling.q_mix_source_reliability(spark, d).collect() == []
