"""IVF ANN recall: nprobe>1 must find neighbors across cluster
boundaries that a single-probe search silently misses."""

from __future__ import annotations

import pytest

from retail_sales_etl_spark.operators.similarity import ivf_topk


@pytest.fixture(scope="module")
def boundary_emb(spark):
    """Query (vec_id=0) lives in cluster 0, but its TRUE nearest
    neighbor (vec_id=10) sits in cluster 1, whose centroid is farther
    from the query than cluster 0's."""
    rows = [
        # cluster 0: query + two same-cluster vectors
        (0, 0, [1.0, 0.0]),
        (1, 0, [1.0, 0.3]),
        (2, 0, [1.0, -0.4]),
        # cluster 1: mostly orthogonal, but vec 10 hugs the query
        (10, 1, [0.99, 0.05]),
        (11, 1, [0.0, 1.0]),
        (12, 1, [0.4, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, label long, v array<double>")


def test_nprobe2_finds_cross_cluster_neighbor(boundary_emb):
    top = ivf_topk(boundary_emb, query_vec_id=0, nprobe=2, top_k=1).collect()
    assert [r.vec_id for r in top] == [10]


def test_nprobe1_misses_cross_cluster_neighbor(boundary_emb):
    # The single-probe search stays inside cluster 0 — demonstrating
    # the recall hole that nprobe=2 closes.
    top = ivf_topk(boundary_emb, query_vec_id=0, nprobe=1, top_k=1).collect()
    assert [r.vec_id for r in top] == [1]


def test_query_cluster_centroid_is_nearest(boundary_emb):
    # Sanity: the scenario is a genuine boundary case — cluster 0's
    # centroid IS the closer one, so probe #1 alone cannot see vec 10.
    top3 = ivf_topk(boundary_emb, query_vec_id=0, nprobe=2, top_k=3).collect()
    assert {r.vec_id for r in top3} == {10, 1, 2}
