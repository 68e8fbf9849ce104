"""Semantic pins for the repetition-signal and decontamination
operators on crafted documents (the corpus-wide behavior is covered by
the oracle-parity gate; these pin the math on known inputs)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from retail_sales_etl_spark.operators.text import (
    DECON_EVAL_MOD,
    q_decontaminate_ngram,
    q_text_repetition,
)


@pytest.fixture
def docs_dir(spark, tmp_path):
    """Synthetic documents table in the catalog's expected layout."""
    rows = [
        # doc 1: 'ab ab ab ab' -> top 2-gram 'ab ab' x3, all 2/3-grams dup
        Row(doc_id=1, text="ab ab ab ab", lang="en", source="s", n_chars=11),
        # doc 2: all-distinct words -> zero repetition
        Row(doc_id=2, text="one two three four five six", lang="en", source="s",
            n_chars=27),
        # doc 3: single word -> no n-grams at all (guard path)
        Row(doc_id=3, text="solo", lang="en", source="s", n_chars=4),
        # doc 0: eval-set member (0 % DECON_EVAL_MOD == 0) sharing a
        # 5-gram with train doc 4
        Row(doc_id=0, text="alpha beta gamma delta epsilon zeta", lang="en",
            source="s", n_chars=35),
        Row(doc_id=4, text="alpha beta gamma delta epsilon other words here now",
            lang="en", source="s", n_chars=51),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    return d


def test_repetition_math(spark, docs_dir):
    got = {r.doc_id: r for r in q_text_repetition(spark, docs_dir).collect()}
    assert set(got) == {0, 1, 2, 3, 4}

    r1 = got[1]  # 'ab ab ab ab': 3 2-grams all 'ab ab', 2 3-grams dup
    assert r1.n_words == 4
    assert r1.top_2gram_count == 3
    assert r1.top_2gram_frac == 1.0
    assert r1.dup_2gram_frac == 1.0
    assert r1.dup_3gram_frac == 1.0
    assert bool(r1.is_repetitive)

    r2 = got[2]  # all distinct: top count 1, dup fractions 0
    assert r2.top_2gram_count == 1
    assert r2.dup_2gram_frac == 0.0 and r2.dup_3gram_frac == 0.0
    assert not bool(r2.is_repetitive)

    r3 = got[3]  # one word: guard path, everything zero
    assert r3.n_words == 1
    assert r3.top_2gram_count == 0
    assert r3.top_2gram_frac == 0.0
    assert not bool(r3.is_repetitive)


def test_decontamination_flags_shared_5grams(spark, docs_dir):
    got = {r.doc_id: r for r in q_decontaminate_ngram(spark, docs_dir).collect()}
    # eval doc 0 excluded from the output
    assert 0 not in got
    assert set(got) == {1, 2, 3, 4}

    r4 = got[4]  # 9 words -> 5 distinct 5-grams; exactly 1 shared with doc 0
    assert r4.n_grams == 5
    assert r4.n_contaminated == 1
    assert r4.contamination_frac == pytest.approx(0.2)
    assert bool(r4.is_contaminated)

    # clean docs: no overlap
    assert got[2].n_contaminated == 0 and not bool(got[2].is_contaminated)
    # short doc: no 5-grams, not contaminated (guard path)
    assert got[3].n_grams == 0 and not bool(got[3].is_contaminated)


def test_eval_mod_is_stable():
    # the eval split is part of the operator's contract; changing it
    # silently changes which docs are "benchmark" rows
    assert DECON_EVAL_MOD == 37


def test_doc_boilerplate_cross_doc_only(spark, tmp_path):
    """The shared-chunk flag needs ANOTHER doc: within-doc repeats
    alone don't count, and docs under one chunk length report zeros."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import q_doc_boilerplate

    boiler = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows = [
        # docs 1+2 share the SAME leading 10-word chunk, then diverge
        Row(doc_id=1, text=boiler + " a b c d e f g h i j", lang="en",
            source="s", n_chars=0),
        Row(doc_id=2, text=boiler + " k l m n o p q r s t", lang="en",
            source="s", n_chars=0),
        # doc 3 repeats ITS OWN chunk twice: both instances are
        # within-doc only -> not shared
        Row(doc_id=3, text="x1 x2 x3 x4 x5 x6 x7 x8 x9 x10 "
                            "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10", lang="en",
            source="s", n_chars=0),
        # doc 4 is too short for a single chunk
        Row(doc_id=4, text="short doc", lang="en", source="s", n_chars=0),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    got = {r.doc_id: r for r in q_doc_boilerplate(spark, d).collect()}
    assert got[1].n_chunks == 2 and got[1].n_shared_chunks == 1
    assert got[1].shared_frac == 0.5 and bool(got[1].is_boilerplate)
    assert got[2].n_shared_chunks == 1
    # within-doc repetition does NOT count as shared (n_docs == 1)
    assert got[3].n_chunks == 2 and got[3].n_shared_chunks == 0
    assert not bool(got[3].is_boilerplate)
    assert got[4].n_chunks == 0 and got[4].shared_frac == 0.0


def test_dedup_lines_keeps_global_first_occurrence(spark, tmp_path):
    """Line-level dedup: a line shared across docs survives only in
    the lowest (doc_id, line_no) position; within-doc repeats collapse
    to the first; fully-duplicated docs come back empty; short unique
    docs pass through untouched."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import q_dedup_lines

    A = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    B = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    C = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    D = "d1 d2 d3 d4 d5 d6 d7 d8 d9 d10"
    rows = [
        Row(doc_id=1, text=A + " " + B, lang="en", source="s", n_chars=0),
        Row(doc_id=2, text=A + " " + C, lang="en", source="s", n_chars=0),
        Row(doc_id=3, text=A + " " + B, lang="en", source="s", n_chars=0),
        Row(doc_id=4, text="tiny unique doc", lang="en", source="s", n_chars=0),
        Row(doc_id=5, text=D + " " + D, lang="en", source="s", n_chars=0),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    got = {r.doc_id: r for r in q_dedup_lines(spark, d).collect()}
    assert got[1].n_lines == 2 and got[1].n_kept == 2
    assert got[1].clean_text == A + " " + B
    # doc 2: A already seen in doc 1 -> only C survives
    assert got[2].n_kept == 1 and got[2].clean_text == C
    # doc 3: both lines are dups -> empty output
    assert got[3].n_kept == 0 and got[3].clean_text == ""
    # doc 4: sub-line-length doc is one unique line
    assert got[4].n_lines == 1 and got[4].clean_text == "tiny unique doc"
    # doc 5: within-doc repeat keeps the first copy only
    assert got[5].n_lines == 2 and got[5].n_kept == 1
    assert got[5].clean_text == D


def test_dedup_spans_masks_every_duplicated_span_occurrence(spark, tmp_path):
    """Span dedup (Lee et al. 2021 semantics): a 16-token run occurring
    twice anywhere in the corpus is removed from ALL occurrences (not
    keep-first); unaligned offsets are caught (unlike dedup_lines);
    unique docs and sub-K docs pass through untouched; a within-doc
    repeat masks both copies."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import q_dedup_spans

    span = " ".join(f"s{i}" for i in range(1, 17))  # 16 shared tokens
    rows = [
        # doc 1: prefix u1 u2 shifts the span off any line boundary
        Row(doc_id=1, text="u1 u2 " + span + " u3", lang="en",
            source="s", n_chars=0),
        Row(doc_id=2, text=span + " v1 v2 v3", lang="en",
            source="s", n_chars=0),
        Row(doc_id=3, text=" ".join(f"w{i}" for i in range(1, 21)),
            lang="en", source="s", n_chars=0),
        Row(doc_id=4, text="too short to gram", lang="en",
            source="s", n_chars=0),
        # doc 5 repeats its OWN 16-token run back-to-back: every gram
        # of the doubled text occurs twice within the doc, so the
        # whole doc collapses (within-doc repeats count).
        Row(doc_id=5, text=span + " " + span, lang="en",
            source="s", n_chars=0),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    got = {r.doc_id: r for r in q_dedup_spans(spark, d).collect()}
    # the shared span vanishes from BOTH docs, at different offsets
    assert got[1].n_tokens == 19 and got[1].clean_text == "u1 u2 u3"
    assert got[2].n_tokens == 19 and got[2].clean_text == "v1 v2 v3"
    # unique 20-token doc untouched
    assert got[3].n_kept == 20 and got[3].dup_frac == 0.0
    # sub-K doc has no grams -> untouched
    assert got[4].clean_text == "too short to gram"
    # within-doc repeat masks every covered position
    assert got[5].n_kept == 0 and got[5].clean_text == ""
    assert got[5].dup_frac == 1.0


def test_vocab_oov_rate_brute_force(spark, tmp_path):
    """OOV stats must match a Python brute-force recount, including the
    deterministic (count desc, word asc) vocab boundary cut."""
    from collections import Counter

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import (
        OOV_VOCAB_SIZE,
        q_vocab_oov_rate,
    )

    # 120 singleton words spread over two sources + one frequent word:
    # the vocab boundary cuts INSIDE the tied singleton block, so the
    # alphabetical tie-break decides membership.
    texts = {}
    texts["a"] = " ".join(
        ["the"] * 5 + [f"w{i:03d}" for i in range(0, 120, 2)]
    )
    texts["b"] = " ".join(
        ["the"] * 3 + [f"w{i:03d}" for i in range(1, 120, 2)]
    )
    rows = [
        Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t))
        for i, (s, t) in enumerate(sorted(texts.items()))
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )

    counts: Counter = Counter()
    for t in texts.values():
        counts.update(t.split(" "))
    vocab = {
        w
        for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :OOV_VOCAB_SIZE
        ]
    }
    got = {r["source"]: r for r in q_vocab_oov_rate(spark, d).collect()}
    for src, text in texts.items():
        toks = text.split(" ")
        n_oov = sum(1 for w in toks if w not in vocab)
        r = got[src]
        assert r["n_tokens"] == len(toks)
        assert r["n_oov"] == n_oov
        assert r["n_oov_types"] == len({w for w in toks if w not in vocab})
        assert abs(r["oov_rate"] - round(n_oov / len(toks), 6)) < 1e-9
    # the boundary actually bit: some singletons are out, some in
    assert any(got[s]["n_oov"] > 0 for s in texts)
    assert any(got[s]["n_oov"] < sum(1 for w in texts[s].split(" ")) for s in texts)


def test_bpe_merge_rounds_matches_reference_trainer(spark, tmp_path):
    """The learned merge rules must equal a classic Python BPE trainer
    (Sennrich-style, non-overlapping left-to-right merges) run on the
    same word-count dict."""
    from collections import Counter

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import (
        BPE_ROUNDS,
        q_bpe_merge_rounds,
    )

    texts = [
        "banana bandana banana",
        "aaa banana cabana",
        "an ban can banana",
    ]
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in enumerate(texts)
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )

    wc = Counter(w for t in texts for w in t.lower().split(" "))
    seqs = {tuple(w): c for w, c in wc.items()}
    expected = []
    for _ in range(BPE_ROUNDS):
        pc: Counter = Counter()
        for s, c in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expected.append((best[0], best[1], pc[best]))
        new = {}
        for s, c in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        seqs = new

    got = sorted(
        q_bpe_merge_rounds(spark, d).collect(), key=lambda r: r["round"]
    )
    assert [(r["w1"], r["w2"], r["pair_count"]) for r in got] == expected


def test_doc_quality_features_total_and_consistent(spark, sf_dir):
    """One feature row per document; weak labels agree with the member
    signal queries."""
    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.text import (
        q_doc_quality_features,
        q_text_quality,
    )

    n_docs = load_table(spark, sf_dir, "documents").count()
    feats = q_doc_quality_features(spark, sf_dir).collect()
    assert len(feats) == n_docs
    keep = {r["doc_id"]: r["is_kept"] for r in q_text_quality(spark, sf_dir).collect()}
    for r in feats:
        assert r["heur_keep"] == keep[r["doc_id"]]
        assert r["dup_2gram_frac"] is not None  # null-padded, not null


def test_bpe_merge_respects_symbol_boundaries(spark, tmp_path):
    """Regression: a merge rule (w1,w2) must NOT fire when w1 is only
    the suffix of a longer symbol. With counts {xa:10, xab:5, ab:6},
    round 1 merges (x,a); round 2's (a,b) must then leave 'xab'
    (symbols x a b -> xa b after round 1) intact ONLY where 'a' is a
    real symbol — the reference trainer emits ('xa','b') in round 3,
    which a trailing-separator encoding loses entirely."""
    from collections import Counter

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import (
        BPE_ROUNDS,
        q_bpe_merge_rounds,
    )

    words = ["xa"] * 10 + ["xab"] * 5 + ["ab"] * 6
    rows = [
        Row(doc_id=0, text=" ".join(words), lang="en", source="s",
            n_chars=1)
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )

    wc = Counter(words)
    seqs = {tuple(w): c for w, c in wc.items()}
    expected = []
    for _ in range(BPE_ROUNDS):
        pc: Counter = Counter()
        for sq, c in seqs.items():
            for i in range(len(sq) - 1):
                pc[(sq[i], sq[i + 1])] += c
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expected.append((best[0], best[1], pc[best]))
        new = {}
        for sq, c in seqs.items():
            out, i = [], 0
            while i < len(sq):
                if i + 1 < len(sq) and (sq[i], sq[i + 1]) == best:
                    out.append(sq[i] + sq[i + 1])
                    i += 2
                else:
                    out.append(sq[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        seqs = new

    got = sorted(
        q_bpe_merge_rounds(spark, d).collect(), key=lambda r: r["round"]
    )
    assert [(r["w1"], r["w2"], r["pair_count"]) for r in got] == expected
    assert len(got) == BPE_ROUNDS  # round 3 must not vanish
    assert (got[2]["w1"], got[2]["w2"]) == ("xa", "b")


class TestQualityLogisticNewton:
    """Convergence + determinism pins for the Newton-trained quality
    classifier (cross-engine exactness is covered by the parity gate)."""

    def test_converges_and_beats_base_rate(self, spark, sf_dir):
        from retail_sales_etl_spark.operators.text import (
            LOGI_ROUNDS,
            q_quality_logistic_newton,
        )

        rows = {
            r["round"]: r
            for r in q_quality_logistic_newton(spark, sf_dir).collect()
        }
        assert sorted(rows) == list(range(1, LOGI_ROUNDS + 1))
        briers = [rows[i]["brier"] for i in sorted(rows)]
        # Newton on a learnable rule: strictly decreasing train Brier
        assert all(a > b for a, b in zip(briers, briers[1:])), briers
        last = rows[LOGI_ROUNDS]
        base = max(last["n_pos"], last["n_docs"] - last["n_pos"]) / last["n_docs"]
        assert last["accuracy"] >= base
        # coefficients sit on the 9-dp staging grid (engine-portable)
        for i in rows:
            for c in ("b0", "b1"):
                v = rows[i][c]
                import math

                assert v == math.floor(v * 1e9 + 0.5) / 1e9

    def test_no_window_no_collect_plan(self, spark, sf_dir):
        """The trainer must stay a chain of scan->agg->broadcast rounds:
        no WindowExec anywhere, betas enter via broadcast exchange."""
        from retail_sales_etl_spark.operators.text import (
            q_quality_logistic_newton,
        )

        plan = q_quality_logistic_newton(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BroadcastExchange" in plan


def test_source_jsd_shifted_source_ranks_highest(spark, tmp_path):
    """Three sources: two share a distribution, one is disjoint — the
    disjoint source's JSD must be the largest and each JSD must sit in
    [0, ln 2]; a same-distribution source stays near 0."""
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import (
        q_source_jsd_divergence,
    )

    rows = []
    did = 0
    for src in ("a", "b"):
        for _ in range(10):
            rows.append(
                Row(doc_id=did, text="alpha beta gamma delta", lang="en",
                    source=src, n_chars=22)
            )
            did += 1
    for _ in range(10):
        rows.append(
            Row(doc_id=did, text="omega psi chi phi", lang="en",
                source="z", n_chars=17)
        )
        did += 1
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = {r["source"]: r for r in q_source_jsd_divergence(spark, d).collect()}
    assert set(out) == {"a", "b", "z"}
    for r in out.values():
        assert -1e-9 <= r["jsd"] <= math.log(2) + 1e-9
    assert out["z"]["jsd"] > out["a"]["jsd"]
    assert out["z"]["jsd"] > out["b"]["jsd"]
    # a and b have identical word distributions -> identical JSD
    assert out["a"]["jsd"] == out["b"]["jsd"]
    # z is fully disjoint from the rest: JSD well away from zero
    assert out["z"]["jsd"] > 0.3


def test_calibration_report_reconciles(spark, sf_dir):
    """Bin counts cover the corpus, ECE equals the support-weighted
    mean gap, and every rate is a valid probability."""
    from retail_sales_etl_spark.operators.text import (
        q_quality_calibration_report,
    )

    out = q_quality_calibration_report(spark, sf_dir).collect()
    assert out
    n = sum(r["n_docs"] for r in out)
    ece = out[0]["ece"]
    assert all(r["ece"] == ece for r in out)
    expected = sum(r["gap"] * r["n_docs"] for r in out) / n
    assert abs(ece - expected) < 1e-6
    for r in out:
        assert 0 <= r["mean_pred"] <= 1
        assert 0 <= r["obs_rate"] <= 1
        assert 0 <= r["bin"] <= 9
        assert r["n_kept"] <= r["n_docs"]


def test_heaps_fit_pure_growth_and_closed_vocab(spark, tmp_path):
    """The two analytic extremes pin the OLS: a corpus where EVERY
    token is a new type has V(n) = n exactly, so the staged ln points
    satisfy y = x and the fit must be beta = 1, intercept = 0, r2 = 1;
    a one-type corpus has V(n) = 1, so y = 0 everywhere and the
    degenerate-variance guard must emit beta = 0 with r2 = 0."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import q_text_heaps_fit

    grow = [
        Row(doc_id=0, text="a1 a2 a3", lang="en", source="s", n_chars=8),
        Row(doc_id=1, text="b1 b2", lang="en", source="s", n_chars=5),
        Row(doc_id=2, text="c1 c2 c3 c4", lang="en", source="s", n_chars=11),
    ]
    d = str(tmp_path / "grow")
    spark.createDataFrame(grow).write.parquet(f"{d}/documents.parquet")
    r = q_text_heaps_fit(spark, d).collect()[0]
    assert (r.n_docs, r.n_tokens, r.n_types) == (3, 9, 9)
    assert r.heaps_beta == 1.0
    assert r.heaps_intercept == 0.0
    assert r.r2 == 1.0

    flat = [
        Row(doc_id=i, text="w w w", lang="en", source="s", n_chars=5)
        for i in range(4)
    ]
    d2 = str(tmp_path / "flat")
    spark.createDataFrame(flat).write.parquet(f"{d2}/documents.parquet")
    r2 = q_text_heaps_fit(spark, d2).collect()[0]
    assert (r2.n_docs, r2.n_tokens, r2.n_types) == (4, 12, 1)
    assert r2.heaps_beta == 0.0 and r2.r2 == 0.0


def test_heaps_fit_banded_cumsum_matches_single_window(spark, tmp_path):
    """The banded two-phase prefix sum must equal a plain global
    cumulative sum: force multiple bands by doc_ids straddling
    HEAPS_BAND and cross-check the fitted numbers against a pure
    Python OLS over the hand-built curve."""
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import (
        HEAPS_BAND,
        q_text_heaps_fit,
    )

    texts = {
        0: "x y",
        1: "x z q",
        HEAPS_BAND: "x r",
        HEAPS_BAND + 1: "s s t",
        2 * HEAPS_BAND + 5: "u x y",
    }
    rows = [
        Row(doc_id=i, text=t, lang="en", source="s", n_chars=len(t))
        for i, t in texts.items()
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
    got = q_text_heaps_fit(spark, d).collect()[0]

    # hand-built curve in doc_id order
    seen, n, pts = set(), 0, []
    for i in sorted(texts):
        ws = texts[i].split(" ")
        n += len(ws)
        seen |= set(ws)
        pts.append((n, len(seen)))
    st = lambda v, p: math.floor(v * 10**p + 0.5) / 10**p
    xs = [st(math.log(a), 6) for a, _ in pts]
    ys = [st(math.log(b), 6) for _, b in pts]
    k = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(st(x * x, 9) for x in xs)
    sxy = sum(st(x * y, 9) for x, y in zip(xs, ys))
    syy = sum(st(y * y, 9) for y in ys)
    cov, varx, vary = k * sxy - sx * sy, k * sxx - sx * sx, k * syy - sy * sy
    assert got.n_docs == k and got.n_tokens == pts[-1][0]
    assert got.n_types == pts[-1][1]
    assert got.heaps_beta == st(cov / varx, 6)
    assert got.heaps_intercept == st((sy - (cov / varx) * sx) / k, 6)
    assert got.r2 == st(cov * cov / (varx * vary), 6)


def test_rake_keywords_hand_scored(spark, tmp_path):
    """Hand-worked RAKE arithmetic: phrases split at stopwords, word
    score = deg/freq over candidate OCCURRENCES, phrase score = sum of
    member-word scores, multi-word phrases outrank their members."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import q_rake_keywords

    rows = [
        # "deep learning" twice (split by the stopword 'of')
        Row(doc_id=0, text="deep learning of deep learning", lang="en",
            source="s", n_chars=30),
        # bare "learning" once
        Row(doc_id=1, text="learning", lang="en", source="s", n_chars=8),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
    got = {r.phrase: r for r in q_rake_keywords(spark, d).collect()}
    # occurrences: "deep learning" x2, "learning" x1
    # deg(deep) = 2+2 = 4, freq = 2 -> 2.0
    # deg(learning) = 2+2+1 = 5, freq = 3 -> 1.666667 (6-dp floor+0.5)
    assert set(got) == {"deep learning", "learning"}
    dl = got["deep learning"]
    assert (dl.n_words, dl.freq) == (2, 2)
    assert dl.score == 3.666667  # 2.0 + 1.666667
    lo = got["learning"]
    assert (lo.n_words, lo.freq) == (1, 1)
    assert lo.score == 1.666667
    # the multi-word phrase outranks its member word
    assert dl.score > lo.score


def test_rake_keywords_stopword_runs_and_topk_cut(spark, tmp_path):
    """Consecutive stopwords delimit one break (no empty phrases), a
    document of only stopwords contributes nothing, and the top-k cut
    orders by (score desc, phrase)."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import (
        RAKE_TOP_K,
        q_rake_keywords,
    )

    rows = [
        Row(doc_id=0, text="red car and of the red car", lang="en",
            source="s", n_chars=27),
        Row(doc_id=1, text="the of and a", lang="en", source="s", n_chars=12),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
    out = q_rake_keywords(spark, d).collect()
    assert [r.phrase for r in out] == ["red car"]
    assert out[0].freq == 2 and out[0].n_words == 2
    # deg(red)=deg(car)=4, freq=2 -> 2.0 each -> phrase 4.0
    assert out[0].score == 4.0
    assert len(out) <= RAKE_TOP_K


def test_rake_by_source_isolates_vocabularies(spark, tmp_path):
    """Per-source RAKE: deg/freq are computed within each source's own
    candidate occurrences, so the same phrase scores differently in
    sources with different co-occurrence structure; ranks run 1..k
    per source with (score desc, phrase) tie-break."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import (
        q_rake_keywords_by_source,
    )

    rows = [
        Row(doc_id=0, text="deep learning of deep learning", lang="en",
            source="s1", n_chars=30),
        Row(doc_id=1, text="learning", lang="en", source="s1", n_chars=8),
        Row(doc_id=2, text="deep learning", lang="en", source="s2",
            n_chars=13),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
    got = {
        (r.source, r.phrase): r
        for r in q_rake_keywords_by_source(spark, d).collect()
    }
    # s1: deg(deep)=4/freq2 -> 2.0; deg(learning)=5/freq3 -> 1.666667
    assert got[("s1", "deep learning")].score == 3.666667
    assert got[("s1", "learning")].score == 1.666667
    # s2's vocabulary is one occurrence of each word: 2.0 + 2.0
    assert got[("s2", "deep learning")].score == 4.0
    assert got[("s1", "deep learning")].rank == 1
    assert got[("s1", "learning")].rank == 2
    assert got[("s2", "deep learning")].rank == 1
    assert ("s2", "learning") not in got  # never leaks across sources


def test_mattr_hand_worked_windows_and_ttr_fallback(spark, tmp_path):
    """Hand-worked MATTR on a tiny window intuition check via the
    closed-form contribution identity, plus the short-doc TTR
    fallback: a doc below the window length scores n_types/n_tokens,
    a fully repetitive long doc scores 1/W-ish, and a fully distinct
    long doc scores exactly 1."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import (
        MATTR_WINDOW,
        q_text_mattr,
    )

    W = MATTR_WINDOW
    uniq = " ".join(f"w{i}" for i in range(2 * W))  # all-distinct, n=2W
    rep = " ".join("x" for _ in range(2 * W))       # one type, n=2W
    short = "a b a"                                  # n=3 < W -> TTR
    rows = [
        Row(doc_id=0, text=uniq, lang="en", source="s", n_chars=1),
        Row(doc_id=1, text=rep, lang="en", source="s", n_chars=1),
        Row(doc_id=2, text=short, lang="en", source="s", n_chars=1),
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in q_text_mattr(spark, d).collect()}
    assert got[0].n_windows == W + 1 and got[0].mattr == 1.0
    # one repeated type: every window has exactly 1 type -> 1/W
    assert got[1].n_types == 1
    assert got[1].mattr == round(1.0 / W, 6) or abs(
        got[1].mattr - 1.0 / W
    ) < 1e-6
    # short doc: plain TTR = 2 types / 3 tokens
    assert got[2].n_windows == 0 and got[2].mattr == 0.666667


def test_text_mtld_matches_published_setwise_walk_and_pinned_values(
    spark, tmp_path
):
    """The factor walk's first-occurrence trick (new type iff
    prev_occ < factor_start) must equal the PUBLISHED set-based walk
    (McCarthy & Jarvis 2010) on repetitive, alternating, and
    all-distinct docs; pinned by hand: 'x x x x x' closes a factor
    every second token -> 2 full factors, MTLD 2.5; 'a b' * 4 -> 2
    factors, MTLD 4.0; all-distinct text completes nothing -> NULL."""
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import q_text_mtld

    def ref_factors(tokens):  # the literal published algorithm
        full, types, count = 0, set(), 0
        for t in tokens:
            types.add(t)
            count += 1
            if len(types) / count < 0.72:
                full += 1
                types, count = set(), 0
        if count == 0:
            return float(full)
        ttr = len(types) / count
        return full + (1 - ttr) / (1 - 0.72)

    docs = [
        Row(doc_id=1, text="x x x x x"),
        Row(doc_id=2, text="a b a b a b a b"),
        Row(doc_id=3, text="q w e r t y u i"),
        Row(doc_id=4, text="the cat sat on the mat and the dog sat too"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = {r["doc_id"]: r for r in q_text_mtld(spark, d).collect()}

    assert out[1]["factors_fwd"] == 2.0 and out[1]["mtld"] == 2.5
    assert out[2]["factors_fwd"] == 2.0 and out[2]["mtld"] == 4.0
    assert out[3]["mtld"] is None  # all distinct: zero factors
    for row in docs:
        toks = row.text.split(" ")
        ff, fb = ref_factors(toks), ref_factors(toks[::-1])
        got = out[row.doc_id]
        assert got["n_tokens"] == len(toks)
        assert got["factors_fwd"] == math.floor(ff * 1e6 + 0.5) / 1e6
        assert got["factors_bwd"] == math.floor(fb * 1e6 + 0.5) / 1e6
        if ff > 0:
            want = (len(toks) / ff + len(toks) / fb) / 2.0
            assert got["mtld"] == math.floor(want * 1e6 + 0.5) / 1e6


def test_chi2_source_lang_hand_worked_and_zero_cell(spark, tmp_path):
    """Hand-worked 2x2 contingency: the 30/10 vs 10/30 split gives
    chi2 = 20, dof 1, Cramér's V = 0.5; a table with a ZERO-observed
    cell must still count that cell's expected mass (chi2 = 7.5, not
    the sparse-join understatement); a perfectly proportional table
    scores chi2 = 0."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import q_chi2_source_lang

    def run(cells, sub):
        rows = []
        i = 0
        for (src, lang), n in cells.items():
            for _ in range(n):
                i += 1
                rows.append(Row(doc_id=i, source=src, lang=lang))
        d = str(tmp_path / sub)
        spark.createDataFrame(rows).write.mode("overwrite").parquet(
            f"{d}/documents.parquet"
        )
        return q_chi2_source_lang(spark, d).first()

    r = run({("A", "en"): 30, ("A", "es"): 10,
             ("B", "en"): 10, ("B", "es"): 30}, "skew")
    assert (r["n_docs"], r["n_sources"], r["n_langs"], r["dof"]) == (
        80, 2, 2, 1)
    assert r["chi2"] == 20.0 and r["cramers_v"] == 0.5

    r = run({("A", "en"): 10, ("B", "en"): 10, ("B", "es"): 10}, "zero")
    assert r["chi2"] == 7.5  # includes the (A, es) zero cell's E
    assert r["cramers_v"] == 0.5

    r = run({("A", "en"): 6, ("A", "es"): 2,
             ("B", "en"): 12, ("B", "es"): 4}, "prop")
    assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0


def test_doc_novelty_first_occurrence_order_and_short_docs(spark, tmp_path):
    """Hand-worked novelty: doc 1 introduces both its grams (novelty
    1.0); doc 2 repeats doc 1's text verbatim (novelty 0.0); doc 3
    shares one of its three distinct grams with doc 1 (novelty 2/3); a
    doc shorter than the gram width contributes nothing and is absent
    (regression for the descending-sequence slice hazard)."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import q_doc_novelty

    docs = [
        Row(doc_id=1, text="a b c d"),        # grams: "a b c", "b c d"
        Row(doc_id=2, text="a b c d"),        # all seen in doc 1
        Row(doc_id=3, text="a b c x y"),      # "a b c" old, rest new
        Row(doc_id=4, text="zz qq"),          # too short: no grams
    ]
    d = str(tmp_path)
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = {r["doc_id"]: r for r in q_doc_novelty(spark, d).collect()}
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_grams"], out[1]["novelty"]) == (2, 1.0)
    assert (out[2]["n_grams"], out[2]["novelty"]) == (2, 0.0)
    assert out[3]["n_grams"] == 3 and out[3]["n_novel"] == 2
    assert abs(out[3]["novelty"] - 0.666667) < 1e-9


def test_text_readability_hand_worked_and_fragment_clamp(spark, tmp_path):
    """Paper-arithmetic calibration: 'The cat sat.' has 3 words, 9
    alphanumeric chars, 1 sentence -> ARI = 4.71*3 + 0.5*3 - 21.43;
    CLI = 0.0588*300 - 0.296*(100/3) - 15.8. A fragment with no
    terminal punctuation clamps to one sentence instead of dividing
    by zero."""
    import math

    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.text import q_text_readability

    d = str(tmp_path)
    spark.createDataFrame(
        [
            Row(doc_id=1, text="The cat sat."),
            Row(doc_id=2, text="no terminal punctuation here"),
        ]
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in q_text_readability(spark, d).collect()}
    r1 = got[1]
    assert (r1.n_words, r1.n_chars_an, r1.n_sentences) == (3, 9, 1)
    want_ari = 4.71 * (9 / 3) + 0.5 * (3 / 1) - 21.43
    assert r1.ari == math.floor(want_ari * 1e6 + 0.5) / 1e6
    want_cli = 0.0588 * (9 * 100 / 3) - 0.296 * (100 / 3) - 15.8
    assert r1.coleman_liau == math.floor(want_cli * 1e6 + 0.5) / 1e6
    r2 = got[2]
    assert (r2.n_words, r2.n_sentences) == (4, 1)  # clamp, no div-0
