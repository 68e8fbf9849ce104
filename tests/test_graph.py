"""Graph operators: co-purchase edges (oracle-covered by parity suite)
and PageRank invariants (iterative — no SQL oracle)."""

from __future__ import annotations

import math

from retail_sales_etl_spark.operators import graph


def test_copurchase_edges_symmetric_key_order(spark, sf_dir):
    edges = graph.q_part_copurchase(spark, sf_dir).collect()
    assert edges
    for e in edges:
        assert e["a_part"] < e["b_part"]
        assert e["n_orders"] >= graph.MIN_COPURCHASE


def test_pagerank_20_iterations_no_lineage_blowup(spark, sf_dir):
    """20 iterations must stay tractable (localCheckpoint truncates the
    lineage every CHECKPOINT_EVERY rounds) and keep conserving mass."""
    import time

    from retail_sales_etl_spark.catalog import load_table

    edges = graph.copurchase_edges(load_table(spark, sf_dir, "lineitem"))
    t0 = time.time()
    ranks = graph.pagerank(edges, n_iterations=20).collect()
    elapsed = time.time() - t0
    n = len(ranks)
    assert n > 0
    assert math.isclose(sum(r["rank_scaled"] for r in ranks), n, rel_tol=0.02)
    # uncheckpointed, 20 iterations of nested joins send Catalyst
    # analysis superlinear; with the cut this runs in well under this
    assert elapsed < 120, f"20-iteration PageRank took {elapsed:.0f}s"


def test_pagerank_conserves_mass_and_is_positive(spark, sf_dir):
    ranks = graph.q_pagerank_parts(spark, sf_dir).collect()
    n = len(ranks)
    assert n > 0
    total = sum(r["rank_scaled"] for r in ranks)
    # damped PageRank with teleportation conserves total mass ~= n
    assert math.isclose(total, n, rel_tol=0.02)
    assert all(r["rank_scaled"] > 0 for r in ranks)
    # a graph with edges must differentiate ranks
    assert max(r["rank_scaled"] for r in ranks) > min(
        r["rank_scaled"] for r in ranks
    )


def test_connected_components_multi_hop_chain(spark):
    """A 5-node chain (diameter 4) forces multiple propagation rounds;
    a disjoint pair and a singleton pin component isolation."""
    from pyspark.sql import functions as F

    from retail_sales_etl_spark.operators.graph import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], ["node_id"])
    # chain 1-2-3-4-5, pair 6-7, singleton 8
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (7, 6)], ["a", "b"]
    )
    out = {r["node_id"]: r["component_id"] for r in connected_components(nodes, edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 6, 7: 6, 8: 8}


def test_dedup_clusters_covers_every_doc_once(spark, sf_dir):
    from retail_sales_etl_spark.operators.dedup import q_dedup_clusters

    out = q_dedup_clusters(spark, sf_dir)
    rows = out.collect()
    n_docs = len({r["doc_id"] for r in rows})
    assert len(rows) == n_docs  # exactly one cluster per doc
    # every cluster's canonical doc is a member of the cluster
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_connected_components_raises_when_not_converged(spark):
    """A component whose diameter exceeds the iteration budget must be a
    loud error, never silently under-merged labels (the consumer is
    dedup -- wrong labels mean kept duplicates with no oracle to catch
    them)."""
    import pytest

    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["a", "b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(nodes, chain, max_iterations=2)
    # and the same graph with budget >= diameter labels every node 0
    labels = graph.connected_components(nodes, chain, max_iterations=n + 2)
    assert {r["component_id"] for r in labels.collect()} == {0}


def test_kcore_peels_tails_and_keeps_clique(spark):
    """4-clique + pendant chain: the 3-core is exactly the clique (each
    member at degree 3); the chain peels away even though its nodes
    start at degree 2 attached to the clique. A pure path graph has an
    empty 3-core."""
    clique = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    chain = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, ["a_part", "b_part"])
    got = {r.part_id: r.core_degree for r in graph.kcore(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], ["a_part", "b_part"]
    )
    assert graph.kcore(path).count() == 0


def test_kcore_raises_when_budget_exhausted(spark):
    """A long peel sequence (nested chain that unravels one layer per
    round) must hit the loud guard when max_rounds is too small, and
    converge with a bigger budget."""
    import pytest

    # chain of length 8 peels from both ends: needs ~4 rounds at k=2
    chain = [(i, i + 1) for i in range(1, 9)]
    edges = spark.createDataFrame(chain, ["a_part", "b_part"])
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.kcore(edges, k=2, max_rounds=2)
    assert graph.kcore(edges, k=2, max_rounds=10).count() == 0


def test_label_prop_finds_planted_communities(spark, tmp_path):
    """Two cliques joined by one weak bridge must resolve to two
    communities whose modularity terms are positive; the bridge must
    not merge them within the fixed round budget."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.graph import (
        q_label_prop_communities,
    )

    rows = []
    oid = 0
    # two repeats so every in-clique pair passes MIN_COPURCHASE=2
    for _ in range(2):
        for quad in ([1, 2, 3, 4], [11, 12, 13, 14]):
            oid += 1
            for p in quad:
                rows.append(Row(l_orderkey=oid, l_partkey=p))
    # one weak bridge basket (4, 11) x2 — a single edge between cliques
    for _ in range(2):
        oid += 1
        rows.append(Row(l_orderkey=oid, l_partkey=4))
        rows.append(Row(l_orderkey=oid, l_partkey=11))
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    out = q_label_prop_communities(spark, d).collect()
    comm = {r["community"]: r for r in out}
    assert len(comm) == 2
    sizes = sorted(r["n_nodes"] for r in out)
    assert sizes == [4, 4]
    # each clique: 6 internal edges; the bridge edge is external
    for r in out:
        assert r["internal_edges"] == 6
        assert r["modularity_term"] > 0


def test_label_prop_modularity_terms_reconcile(spark, sf_dir):
    """Internal edges never exceed the total, degree mass reconciles
    to 2m, and every modularity term is within its theoretical
    bounds."""
    from retail_sales_etl_spark.operators.graph import (
        copurchase_edges,
        q_label_prop_communities,
    )
    from retail_sales_etl_spark.catalog import load_table

    m = copurchase_edges(load_table(spark, sf_dir, "lineitem")).count()
    out = q_label_prop_communities(spark, sf_dir).collect()
    assert sum(r["internal_edges"] for r in out) <= m
    assert sum(r["degree_sum"] for r in out) == 2 * m
    for r in out:
        assert -0.25 <= r["modularity_term"] <= 1.0


def test_link_prediction_excludes_existing_and_scores_correctly(spark, tmp_path):
    """A path graph A-B-C must predict exactly (A,C) (the only wedge
    pair not already an edge) with Jaccard = 1/1; existing edges must
    never appear."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.graph import (
        q_link_prediction_jaccard,
    )

    rows = []
    oid = 0
    # edges (1,2) and (2,3), each co-purchased twice (MIN_COPURCHASE)
    for pair in ([1, 2], [2, 3]):
        for _ in range(2):
            oid += 1
            for p in pair:
                rows.append(Row(l_orderkey=oid, l_partkey=p))
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    got = q_link_prediction_jaccard(spark, d).collect()
    assert [(r["a_part"], r["b_part"]) for r in got] == [(1, 3)]
    # N(1)={2}, N(3)={2}: intersection 1, union 1
    assert got[0]["n_common"] == 1 and got[0]["jaccard"] == 1.0


def test_ab_test_matches_scipy_style_recompute(spark, sf_dir):
    """Arm assignment, means, and the Welch t statistic must match a
    Python recompute over the same hash split."""
    import hashlib
    import math
    from collections import defaultdict

    from retail_sales_etl_spark.catalog import load_table
    from retail_sales_etl_spark.operators.events import (
        _AB_SALT,
        q_events_ab_test,
    )

    vals = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    ).collect():
        u = int(
            hashlib.md5(f"{_AB_SALT}{r['user_id']}".encode()).hexdigest()[:8],
            16,
        ) / float(0x100000000)
        vals[(r["event_type"], "A" if u < 0.5 else "B")].append(r["value"])

    got = {r["event_type"]: r for r in q_events_ab_test(spark, sf_dir).collect()}
    for t, r in got.items():
        a, b = vals[(t, "A")], vals[(t, "B")]
        assert (r["n_a"], r["n_b"]) == (len(a), len(b))
        ma, mb = sum(a) / len(a), sum(b) / len(b)
        assert abs(r["mean_a"] - ma) < 1e-5 and abs(r["mean_b"] - mb) < 1e-5
        va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
        vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
        texp = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
        assert abs(r["t_stat"] - texp) < 1e-4
        assert r["significant"] == (abs(texp) >= 1.96)


def test_supplier_projection_crafted_graph(spark, tmp_path, monkeypatch):
    """Known bipartite graph: exact weight histogram + hub exclusion."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.graph import (
        q_supplier_projection_stats,
    )

    monkeypatch.setattr(
        "retail_sales_etl_spark.operators.graph.PROJ_PART_CAP", 3
    )
    rows = []
    # part 1 <- {1,2}, part 2 <- {1,2}, part 3 <- {2,3}
    #   pairs: (1,2) shares {1,2} -> w=2; (2,3) shares {3} -> w=1
    # part 9 is a hub: 4 suppliers > cap 3 -> excluded + counted
    for p, supps in ((1, (1, 2)), (2, (1, 2)), (3, (2, 3)), (9, (1, 2, 3, 4))):
        for s in supps:
            # duplicate lineitems must collapse via distinct()
            for _ in range(2):
                rows.append(Row(l_partkey=p, l_suppkey=s))
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    out = {r["shared_parts"]: r for r in q_supplier_projection_stats(spark, d).collect()}
    assert set(out) == {0, 1, 2}  # 0 = the always-present anchor row
    assert out[0]["n_pairs"] == 0
    assert out[2]["n_pairs"] == 1  # (s1,s2)
    assert out[1]["n_pairs"] == 1  # (s2,s3)
    assert all(r["n_hot_parts"] == 1 for r in out.values())


def test_bipartite_butterflies_crafted_graph(spark, tmp_path, monkeypatch):
    """Hand-counted butterfly census: parts 1,2 <- {s1,s2}, part 3 <-
    {s2,s3}, hub part 9 excluded. One butterfly (s1,s2 over p1,p2),
    L3 = 8, cc = 4*1/8 = 0.5."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.graph import (
        q_bipartite_butterflies,
    )

    monkeypatch.setattr(
        "retail_sales_etl_spark.operators.graph.PROJ_PART_CAP", 3
    )
    rows = []
    for p, supps in ((1, (1, 2)), (2, (1, 2)), (3, (2, 3)), (9, (1, 2, 3, 4))):
        for s in supps:
            rows.append(Row(l_partkey=p, l_suppkey=s))
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    (r,) = q_bipartite_butterflies(spark, d).collect()
    assert r["n_edges"] == 6
    assert r["n_butterflies"] == 1
    assert r["n_three_paths"] == 8
    assert r["bipartite_cc"] == 0.5
    assert r["n_hot_parts"] == 1


def test_supplier_projection_all_hub_corpus_still_reports(spark, tmp_path, monkeypatch):
    """Every part over the cap: the histogram is empty but the anchor
    row must still carry the hub count (truncation never silent)."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.graph import (
        q_supplier_projection_stats,
    )

    monkeypatch.setattr(
        "retail_sales_etl_spark.operators.graph.PROJ_PART_CAP", 2
    )
    rows = [
        Row(l_partkey=p, l_suppkey=s)
        for p in (1, 2)
        for s in (1, 2, 3)  # 3 suppliers > cap 2 -> both parts are hubs
    ]
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    out = q_supplier_projection_stats(spark, d).collect()
    assert len(out) == 1
    assert out[0]["shared_parts"] == 0 and out[0]["n_pairs"] == 0
    assert out[0]["n_hot_parts"] == 2


def test_copurchase_rich_club_hand_worked_star_triangle(spark, tmp_path):
    """Triangle 1-2-3 (each pair in 2 orders) + pendant 4 on 1:
    degrees 3/2/2/1 -> phi(0) = 2*4/(4*3) = 0.666667, phi(1) = 1.0
    (the deg>1 club {1,2,3} is fully connected), k=2 excluded
    (N_k < 2)."""
    from pyspark.sql import Row

    from retail_sales_etl_spark.operators.graph import (
        q_copurchase_rich_club,
    )

    rows = []
    for ok_, parts in ((101, (1, 2, 3)), (102, (1, 2, 3)),
                       (103, (1, 4)), (104, (1, 4))):
        for p in parts:
            rows.append(Row(l_orderkey=ok_, l_partkey=p))
    d = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{d}/lineitem.parquet"
    )
    out = {r["k"]: r for r in q_copurchase_rich_club(spark, d).collect()}
    assert set(out) == {0, 1}
    assert (out[0]["n_k"], out[0]["e_k"]) == (4, 4)
    assert out[0]["phi"] == 0.666667
    assert (out[1]["n_k"], out[1]["e_k"]) == (3, 3)
    assert out[1]["phi"] == 1.0
