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


def _union_find_components(nodes, edges):
    """Reference union-find: node -> min node id in its component."""
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@given(
    st.integers(min_value=1, max_value=24),
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=24),
            st.integers(min_value=1, max_value=24),
        ),
        max_size=30,
    ),
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_equals_union_find(spark, n_nodes, raw_edges):
    from retail_sales_etl_spark.operators.graph import connected_components

    nodes = list(range(1, n_nodes + 1))
    edges = [(a, b) for a, b in raw_edges if a <= n_nodes and b <= n_nodes and a != b]
    want = _union_find_components(nodes, edges)

    nodes_df = spark.createDataFrame([(n,) for n in nodes], ["node_id"])
    if edges:
        edges_df = spark.createDataFrame(edges, ["a", "b"])
    else:
        edges_df = spark.createDataFrame([], "a long, b long")
    got = {
        r["node_id"]: r["component_id"]
        for r in connected_components(nodes_df, edges_df).collect()
    }
    assert got == want


def test_merge_upsert_matches_dict_semantics(spark, tmp_path):
    """merge_upsert == build-a-dict-and-overwrite reference semantics."""
    base = [(i, f"v{i}") for i in range(1, 8)]
    updates = [(3, "V3"), (5, "V5"), (9, "V9"), (12, "V12")]
    want = dict(base)
    want.update(dict(updates))

    from retail_sales_etl_spark.load import writers

    path = str(tmp_path / "merge_prop")
    spark.createDataFrame(base, ["id", "v"]).write.parquet(path)
    writers.merge_upsert(
        spark, path, spark.createDataFrame(updates, ["id", "v"]), ["id"]
    )
    got = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got == want


@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=25), min_size=3, max_size=30),
        min_size=2,
        max_size=14,
    )
)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_setsim_prefix_filter_equals_bruteforce(spark, token_lists):
    """The PPJoin prefix filter must be LOSSLESS: for random small
    corpora, the prefix-filtered join equals brute-force Jaccard over
    the same shingle sets (the lemma's soundness, not just the one
    real corpus where every qualifying pair is a near-exact dup)."""
    from retail_sales_etl_spark.operators.dedup import (
        SETSIM_DEN,
        SETSIM_NUM,
        setsim_pairs,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(token_lists)],
        "doc_id long, text string",
    )
    got = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in setsim_pairs(docs).collect()
    }

    # brute force on word-trigram shingle sets
    def shingles(toks):
        ws = [f"w{t}" for t in toks]
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    sets = {i: shingles(t) for i, t in enumerate(token_lists) if len(t) >= 3}
    want = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            if j >= SETSIM_NUM / SETSIM_DEN:
                want[(a, b)] = j
    assert set(got) == set(want), (
        f"prefix filter dropped/added pairs: got {sorted(got)} want {sorted(want)}"
    )


def test_source_minhash_jaccard_identical_and_disjoint(spark, tmp_path):
    """Two sources with identical shingle sets must estimate 1.0;
    disjoint-vocabulary sources must estimate well below."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.dedup import (
        q_source_minhash_jaccard,
    )

    same = "alpha beta gamma delta epsilon zeta"
    other = "uno dos tres cuatro cinco seis"
    rows = (
        [Row(doc_id=i, text=same, lang="en", source="a", n_chars=1)
         for i in range(3)]
        + [Row(doc_id=10 + i, text=same, lang="en", source="b", n_chars=1)
           for i in range(3)]
        + [Row(doc_id=20 + i, text=other, lang="en", source="c", n_chars=1)
           for i in range(3)]
    )
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    got = {
        (r["source_a"], r["source_b"]): r["jaccard_est"]
        for r in q_source_minhash_jaccard(spark, d).collect()
    }
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] < 0.5 and got[("b", "c")] < 0.5


def test_dedup_recall_report_reconciles_with_members(spark, sf_dir):
    """The report's counts must equal a direct recount from the member
    queries, and the ratios must be consistent."""
    from retail_sales_etl_spark.operators.dedup import (
        q_dedup_minhash_lsh,
        q_dedup_ngram_jaccard,
        q_dedup_recall_report,
        q_setsim_join,
    )

    truth = {
        (r["a_id"], r["b_id"])
        for r in q_dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    members = {
        "minhash_lsh": {
            (r["a_id"], r["b_id"])
            for r in q_dedup_minhash_lsh(spark, sf_dir).collect()
        },
        "setsim_ppjoin": {
            (r["a_id"], r["b_id"])
            for r in q_setsim_join(spark, sf_dir).collect()
        },
    }
    got = {r["method"]: r for r in q_dedup_recall_report(spark, sf_dir).collect()}
    assert set(got) == set(members)
    for name, cand in members.items():
        r = got[name]
        hits = len(cand & truth)
        assert r["n_candidates"] == len(cand)
        assert r["n_true"] == len(truth)
        assert r["n_hits"] == hits
        assert abs(r["precision"] - round(hits / len(cand), 6)) < 1e-9
        assert abs(r["recall"] - round(hits / len(truth), 6)) < 1e-9


# ---------------------------------------------------------------------------
# PassJoin pigeonhole property for the fuzzy-prefix segment filter.


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_fuzzy_segment_filter_pigeonhole(data):
    """For ANY pair of full-length prefixes within FUZZY_MAX_DIST, some
    index segment of one string must equal a probe substring of the
    other at a position the window list covers — the recall guarantee
    the PassJoin candidate join relies on. Exercises alignments that
    shift remainder segments into the block columns (the case a
    block-boundary lower clamp would miss)."""
    from retail_sales_etl_spark.operators.text import (
        FUZZY_MAX_DIST,
        FUZZY_PREFIX_LEN,
        _fuzzy_segments,
        _fuzzy_windows,
    )

    alphabet = "ab"  # tiny alphabet maximizes adversarial alignments
    a = data.draw(
        st.text(alphabet=alphabet, min_size=FUZZY_PREFIX_LEN, max_size=FUZZY_PREFIX_LEN)
    )
    # mutate with length-preserving edit mix: s subs + t (ins, del)
    b = list(a)
    n_sub = data.draw(st.integers(0, FUZZY_MAX_DIST))
    n_shift = data.draw(st.integers(0, (FUZZY_MAX_DIST - n_sub) // 2))
    for _ in range(n_sub):
        p = data.draw(st.integers(0, len(b) - 1))
        b[p] = data.draw(st.sampled_from(alphabet))
    for _ in range(n_shift):
        p = data.draw(st.integers(0, len(b) - 1))
        del b[p]
        q = data.draw(st.integers(0, len(b)))
        b.insert(q, data.draw(st.sampled_from(alphabet)))
    b = "".join(b)
    assert len(b) == FUZZY_PREFIX_LEN
    if _lev(a, b) > FUZZY_MAX_DIST:
        return  # mutation overshot; outside the operator's contract

    windows = _fuzzy_windows()

    def seg_match(probe: str, indexed: str) -> bool:
        for i, s, l in _fuzzy_segments():
            seg = indexed[s - 1 : s - 1 + l]
            for wi, q, wl in windows:
                if wi == i and probe[q - 1 : q - 1 + wl] == seg:
                    return True
        return False

    # the operator probes both orientations; either must witness
    assert seg_match(a, b) or seg_match(b, a), (a, b, _lev(a, b))


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 5000))
def test_ntile4_closed_form_matches_sql_semantics(n):
    """customer_rfm computes quartiles as arithmetic on the banded
    global rank instead of a global ntile window; the closed form must
    reproduce SQL ntile(4) exactly for every (rank, n): the first
    (n mod 4) tiles hold floor(n/4)+1 rows, the rest floor(n/4)."""

    def sql_ntile4(rank, total):
        base, rem = divmod(total, 4)
        hi = rem * (base + 1)
        if rank <= hi:
            return (rank + base) // (base + 1)
        return rem + -(-(rank - hi) // max(base, 1))

    # reference: assign tiles by walking the bucket sizes
    base, rem = divmod(n, 4)
    sizes = [base + 1 if i < rem else base for i in range(4)]
    expect, tile = [], 1
    for size in sizes:
        expect.extend([tile] * size)
        tile += 1
    got = [sql_ntile4(r, n) for r in range(1, n + 1)]
    assert got == expect, (n, got[:10], expect[:10])


def test_ntile4_spark_expression_matches_reference(spark):
    """The actual Spark `_ntile4` column expression (not a Python
    mirror) must reproduce SQL ntile(4) for boundary-rich sizes."""
    from pyspark.sql import functions as F

    from retail_sales_etl_spark.plans.behavioral import _ntile4

    for n in (1, 2, 3, 4, 5, 7, 8, 101):
        df = spark.range(1, n + 1).select(
            F.col("id").alias("rank"), F.lit(n).cast("bigint").alias("n")
        )
        got = [
            r[0]
            for r in df.select(_ntile4(F.col("rank"), F.col("n")))
            .orderBy("rank")
            .collect()
        ]
        base, rem = divmod(n, 4)
        expect = []
        for i in range(4):
            expect.extend([i + 1] * (base + 1 if i < rem else base))
        assert got == expect, (n, got, expect)


@given(st.data())
@settings(max_examples=60, deadline=None)
def test_bmp_encode_decode_roundtrip_property(data):
    """For ANY dims (1..12 x 1..6) and ANY pixel grid, a hand-built
    24-bpp bottom-up BMP decodes to exact dims/stride/sums and the
    TOP-left corner — independent re-implementation of the encoder in
    the test (struct-packed inline) so encoder and decoder cannot
    share a stride/flip/BGR bug."""
    import struct

    from retail_sales_etl_spark.operators import multimodal

    w = data.draw(st.integers(1, 12))
    h = data.draw(st.integers(1, 6))
    flat = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
            ),
            min_size=w * h,
            max_size=w * h,
        )
    )
    pixels = [flat[y * w : (y + 1) * w] for y in range(h)]
    pad = data.draw(st.binary(min_size=1, max_size=1))
    stride = (w * 3 + 3) // 4 * 4
    raster = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = pixels[y][x]
            raster += bytes((b, g, r))
        raster += pad * (stride - 3 * w)
    size = 54 + len(raster)
    payload = (
        struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0
        )
        + bytes(raster)
    )
    d = multimodal.decode_bmp(payload)
    assert (d["width"], d["height"]) == (w, h)
    assert d["row_stride"] == stride
    assert d["pad_bytes"] == stride - 3 * w
    assert d["n_bytes"] == size
    assert d["sum_r"] == sum(p[0] for row in pixels for p in row)
    assert d["sum_g"] == sum(p[1] for row in pixels for p in row)
    assert d["sum_b"] == sum(p[2] for row in pixels for p in row)
    assert d["corner_r"] == pixels[0][0][0]
    assert d["corner_b"] == pixels[0][0][2]
