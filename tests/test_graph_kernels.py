"""North-rule graph kernels vs oracles (nx / vendored pure-python)."""

import networkx as nx
import pytest

from conftest import lpa_majority_oracle, lpa_min_oracle, pagerank_oracle
from graphriccicurvature_spark.operators.components import connected_components
from graphriccicurvature_spark.operators.degrees import degree_table
from graphriccicurvature_spark.operators.labelprop import label_propagation
from graphriccicurvature_spark.operators.pagerank import pagerank
from graphriccicurvature_spark.operators.triangles import (
    edge_embeddedness,
    triangle_count_global,
    triangle_counts,
)
from graphriccicurvature_spark.sources.edges import make_edges


def _unweighted_karate():
    G = nx.karate_club_graph()
    for _, _, d in G.edges(data=True):
        d.clear()
    return G


def test_degrees(spark):
    G = _unweighted_karate()
    deg = {r.node: r.degree for r in degree_table(make_edges(spark, list(G.edges()))).collect()}
    assert deg == dict(G.degree())


def test_pagerank_undirected_karate(spark):
    G = _unweighted_karate()
    got = {r.node: r.pagerank for r in pagerank(make_edges(spark, list(G.edges())), directed=False).collect()}
    want = pagerank_oracle(G)
    assert max(abs(got[n] - want[n]) for n in want) < 1e-6


def test_pagerank_directed_with_dangling(spark):
    G = nx.DiGraph([(0, 1), (1, 2), (2, 0), (2, 3), (4, 0)])  # 3 dangling
    got = {r.node: r.pagerank for r in pagerank(make_edges(spark, list(G.edges())), directed=True).collect()}
    want = pagerank_oracle(G)
    assert max(abs(got[n] - want[n]) for n in want) < 1e-6


def test_pagerank_weighted(spark):
    G = nx.karate_club_graph()  # keeps its native integer weights
    pairs = list(G.edges())
    weights = [float(G[u][v]["weight"]) for u, v in pairs]
    got = {
        r.node: r.pagerank
        for r in pagerank(make_edges(spark, pairs, weights), directed=False).collect()
    }
    want = pagerank_oracle(G)
    assert max(abs(got[n] - want[n]) for n in want) < 1e-6


def test_connected_components_random(spark):
    G = nx.gnp_random_graph(120, 0.02, seed=9)
    got = {r.node: r.component for r in connected_components(
        make_edges(spark, list(G.edges())),
        vertices=spark.createDataFrame([(n,) for n in G.nodes()], "node long"),
    ).collect()}
    want = {n: min(c) for c in nx.connected_components(G) for n in c}
    assert got == want


def test_connected_components_chain_and_isolated(spark):
    pairs = [(i, i + 1) for i in range(0, 30)] + [(100, 101)]
    verts = spark.createDataFrame([(n,) for n in list(range(31)) + [100, 101, 200]], "node long")
    got = {r.node: r.component for r in connected_components(make_edges(spark, pairs), vertices=verts).collect()}
    assert all(got[i] == 0 for i in range(31))
    assert got[100] == got[101] == 100
    assert got[200] == 200


def test_triangles_karate(spark):
    G = _unweighted_karate()
    edges = make_edges(spark, list(G.edges()))
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    want = nx.triangles(G)
    assert all(got.get(n, 0) == want[n] for n in G.nodes())
    assert triangle_count_global(edges).collect()[0][0] == sum(want.values()) // 3


def _embeddedness_oracle(G):
    want = {}
    for u, v in G.edges():
        u, v = min(u, v), max(u, v)
        cn = len(set(G[u]) & set(G[v]) - {u, v})
        union = G.degree(u) + G.degree(v) - 2 - cn
        want[(u, v)] = (cn, cn / union if union > 0 else 0.0)
    return want


def test_edge_embeddedness_karate(spark):
    G = _unweighted_karate()
    got = {
        (r.src, r.dst): (r.common_neighbors, r.jaccard)
        for r in edge_embeddedness(make_edges(spark, list(G.edges()))).collect()
    }
    want = _embeddedness_oracle(G)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1]), k


def test_edge_embeddedness_bridge_and_degenerate(spark):
    # triangle 1-2-3 joined by bridge 3-4 to the pendant edge 4-5;
    # plus the isolated edge 10-11 (two degree-1 endpoints -> jaccard 0)
    G = nx.Graph([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (10, 11)])
    got = {
        (r.src, r.dst): (r.common_neighbors, r.jaccard)
        for r in edge_embeddedness(make_edges(spark, list(G.edges()))).collect()
    }
    want = _embeddedness_oracle(G)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k][0] == v[0] and got[k][1] == pytest.approx(v[1]), k
    assert got[(3, 4)] == (0, 0.0)  # bridge
    assert got[(10, 11)] == (0, 0.0)  # degenerate denominator
    assert got[(1, 2)][0] == 1 and got[(1, 2)][1] == pytest.approx(1.0)


def test_lpa_min_matches_oracle(spark):
    G = nx.gnp_random_graph(60, 0.05, seed=4)
    verts = spark.createDataFrame([(n,) for n in G.nodes()], "node long")
    got = {r.node: r.label for r in label_propagation(
        make_edges(spark, list(G.edges())), mode="min", max_iter=8, vertices=verts
    ).collect()}
    want = lpa_min_oracle(G, max_iter=8)
    assert got == want


def test_lpa_majority_matches_oracle(spark):
    G = nx.karate_club_graph()
    got = {r.node: r.label for r in label_propagation(
        make_edges(spark, list(G.edges())), mode="majority", max_iter=5, check_convergence=False
    ).collect()}
    want = lpa_majority_oracle(G, max_iter=5)
    assert got == want


def test_core_number_matches_networkx(spark):
    from graphriccicurvature_spark.operators.linkgraph import core_number

    for G in [_unweighted_karate(), nx.gnp_random_graph(80, 0.08, seed=7)]:
        G.remove_nodes_from(list(nx.isolates(G)))
        got = {r.node: r.core for r in core_number(make_edges(spark, list(G.edges()))).collect()}
        assert got == nx.core_number(G)


def test_core_number_max_k_caps_values(spark):
    from graphriccicurvature_spark.operators.linkgraph import core_number

    G = _unweighted_karate()  # degeneracy 4
    got = {r.node: r.core for r in core_number(make_edges(spark, list(G.edges())), max_k=2).collect()}
    want = {n: min(c, 2) for n, c in nx.core_number(G).items()}
    assert got == want
