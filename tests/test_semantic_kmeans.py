"""Numpy-reference checks for the iterative/semantic embedding ops:
dedup_semantic (SemDeDup-style) and kmeans_centroids (Lloyd). The
oracle-parity gate proves Spark==DuckDB; these prove the shared
algorithm is the INTENDED one against an independent numpy
implementation."""

from __future__ import annotations

import numpy as np
import pytest

from retail_sales_etl_spark.operators.dedup import SEMANTIC_EPS, q_dedup_semantic
from retail_sales_etl_spark.operators.similarity import (
    KMEANS_ITERS,
    KMEANS_K,
    q_kmeans_centroids,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def _cos_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    na = np.linalg.norm(a, axis=1)
    nb = np.linalg.norm(b, axis=1)
    return np.round((a @ b.T) / np.outer(na, nb), 6)


def _lloyd(ids: np.ndarray, mat: np.ndarray):
    """Reference Lloyd: same init/rounding/tie-break contract."""
    order = np.argsort(ids)
    cent = mat[order[:KMEANS_K]].copy()
    cells = np.arange(KMEANS_K)
    assign = None
    for _ in range(KMEANS_ITERS):
        cos = _cos_matrix(mat, cent)
        # argmax with lowest-cell tie-break: numpy argmax takes first max
        best = np.argmax(cos, axis=1)
        assign = cells[best]
        new_cells = np.unique(assign)
        # the engine's mean is sum(CAST(val AS DECIMAL(25,6))) / n —
        # each value is rounded to 6 decimals BEFORE the (exact) sum
        cent = np.stack(
            [np.round(mat[assign == c], 6).mean(axis=0) for c in new_cells]
        )
        cells = new_cells
    return assign, cells, cent


def test_kmeans_matches_numpy_lloyd(spark, emb):
    ids, mat = emb
    assign, cells, cent = _lloyd(ids, mat)
    got = q_kmeans_centroids(spark, SF).collect()
    assert {r.cell for r in got} == set(int(c) for c in cells)
    # membership counts match the reference assignment
    counts = {int(c): int((assign == c).sum()) for c in cells}
    got_counts = {r.cell: r.n_members for r in got if r.dim_idx == 0}
    assert got_counts == counts
    assert sum(got_counts.values()) == len(ids)
    # centroid values match to float tolerance
    got_cent = {}
    for r in got:
        got_cent.setdefault(r.cell, {})[r.dim_idx] = r.centroid
    for ci, c in enumerate(cells):
        vec = np.array([got_cent[int(c)][d] for d in range(mat.shape[1])])
        np.testing.assert_allclose(vec, cent[ci], rtol=1e-9, atol=1e-9)


def test_dedup_semantic_matches_numpy(spark, emb):
    ids, mat = emb
    got = {r.vec_id: r for r in q_dedup_semantic(spark, SF).collect()}
    assert set(got) == set(int(i) for i in ids)

    # reference: label-mean centroids -> nearest-cell assignment ->
    # within-cell dominance
    import duckdb

    labels = np.array(
        [
            r[0]
            for r in duckdb.sql(
                f"SELECT label FROM read_parquet('{SF}/embeddings.parquet')"
                f" ORDER BY vec_id"
            ).fetchall()
        ]
    )
    ulabs = np.unique(labels)
    # decimal(25,6) mean semantics: round to 6 decimals before summing
    cent = np.stack([np.round(mat[labels == l], 6).mean(axis=0) for l in ulabs])
    ccos = _cos_matrix(mat, cent)
    best = np.argmax(ccos, axis=1)
    cell = ulabs[best]
    my_ccos = ccos[np.arange(len(ids)), best]

    n_dup = 0
    for i, vid in enumerate(ids):
        r = got[int(vid)]
        assert r.cell == int(cell[i])
        assert r.centroid_cos == pytest.approx(my_ccos[i], abs=1e-9)
        in_cell = np.where(cell == cell[i])[0]
        sims = _cos_matrix(mat[i : i + 1], mat[in_cell])[0]
        near = (sims >= SEMANTIC_EPS) & (in_cell != i)
        assert r.n_neighbors == int(near.sum())
        dom = near & (
            (my_ccos[in_cell] > my_ccos[i])
            | ((my_ccos[in_cell] == my_ccos[i]) & (ids[in_cell] < vid))
        )
        assert bool(r.is_semantic_dup) == bool(dom.any())
        n_dup += int(dom.any())
    # the dup set is non-trivial and survivors exist in every pair
    assert 0 < n_dup < len(ids)


def test_semantic_survivor_is_farthest_from_centroid(spark, emb):
    """Contract pin: within any dup pair, the member closer to the
    centroid is the one marked duplicate (SemDeDup keep rule)."""
    got = list(q_dedup_semantic(spark, SF).collect())
    by_cell: dict[int, list] = {}
    for r in got:
        by_cell.setdefault(r.cell, []).append(r)
    dups = [r for r in got if r.is_semantic_dup]
    assert dups
    for r in dups:
        peers = by_cell[r.cell]
        # someone in the cell survives with centroid_cos <= the dup's
        # (the dominator ordering guarantees the global minimum of each
        # connected near-dup group survives)
        assert any(
            (not p.is_semantic_dup) and p.centroid_cos <= r.centroid_cos
            for p in peers
        ) or any(p.centroid_cos < r.centroid_cos for p in peers)


def test_split_leakage_report_reconciles_with_lsh_pairs(spark, sf_dir):
    """The split-pair census must partition the LSH candidate pair set
    exactly: sum of n_pairs over the report = |minhash_lsh_pairs|,
    is_leak true iff the endpoints' splits differ, and pair labels are
    least/greatest normalized."""
    from retail_sales_etl_spark.operators.dedup import (
        minhash_lsh_pairs,
        q_split_leakage_report,
    )
    from retail_sales_etl_spark.catalog import load_table

    rows = q_split_leakage_report(spark, sf_dir).collect()
    n_total = minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents")
    ).count()
    assert sum(r["n_pairs"] for r in rows) == n_total
    for r in rows:
        assert r["split_lo"] <= r["split_hi"]
        assert r["is_leak"] == (r["split_lo"] != r["split_hi"])
