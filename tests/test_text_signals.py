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
