"""Property-based tests (hypothesis) for the cleaning contracts."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from retail_sales_etl_spark.operators import cleaning

SNAKE = re.compile(r"^[a-z0-9]+(?:_[a-z0-9]+)*$|^$")


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_normalize_column_name_always_snake_case(name):
    out = cleaning.normalize_column_name(name)
    assert SNAKE.fullmatch(out) is not None


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_normalize_column_name_idempotent(name):
    once = cleaning.normalize_column_name(name)
    assert cleaning.normalize_column_name(once) == once


@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 5), st.text(max_size=5)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_dedupe_by_key_yields_unique_keys(spark, rows):
    df = spark.createDataFrame(rows, "k INT, a INT, b STRING")
    out = cleaning.dedupe_by_key(df, ["k"])
    collected = out.collect()
    keys = [r["k"] for r in collected]
    assert len(keys) == len(set(keys)) == len({r[0] for r in rows})
    # each surviving row is the minimum of its group under (a, b) order
    by_key = {}
    for k, a, b in rows:
        cand = (a, b)
        if k not in by_key or cand < by_key[k]:
            by_key[k] = cand
    for r in collected:
        assert (r["a"], r["b"]) == by_key[r["k"]]
