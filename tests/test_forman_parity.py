"""Forman-Ricci parity (goldens from /root/reference/test/test_FormanRicci.py)."""

import networkx as nx

from graphriccicurvature_spark.operators.forman import (
    forman_curvature,
    forman_node_curvature,
)
from graphriccicurvature_spark.sources.edges import make_edges

PAIRS = [(1, 2), (2, 3), (3, 4), (2, 4)]
# keyed by nx enumeration order [(1,2),(2,3),(2,4),(3,4)]
GOLD_1D_EDGES = {(1, 2): 0.0, (2, 3): -1.0, (2, 4): -1.0, (3, 4): 0.0}
GOLD_1D_NODES = {1: 0.0, 2: -2 / 3, 3: -0.5, 4: -0.5, 5: 0.0}
GOLD_AUG_EDGES = {(1, 2): 0.0, (2, 3): 2.0, (2, 4): 2.0, (3, 4): 3.0}
GOLD_AUG_NODES = {1: 0.0, 2: 4 / 3, 3: 2.5, 4: 2.5, 5: 0.0}


def _fixture(spark):
    edges = make_edges(spark, PAIRS)
    verts = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    return edges, verts


def test_forman_1d(spark):
    edges, verts = _fixture(spark)
    k = forman_curvature(edges, "1d")
    got = {(r.src, r.dst): r.forman_curvature for r in k.collect()}
    assert got.keys() == GOLD_1D_EDGES.keys()
    for e, v in GOLD_1D_EDGES.items():
        assert abs(got[e] - v) < 1e-6
    nodes = {r.node: r.forman_curvature for r in forman_node_curvature(edges, k, verts).collect()}
    for n, v in GOLD_1D_NODES.items():
        assert abs(nodes[n] - v) < 1e-6


def test_forman_augmented(spark):
    edges, verts = _fixture(spark)
    k = forman_curvature(edges, "augmented")
    got = {(r.src, r.dst): r.forman_curvature for r in k.collect()}
    for e, v in GOLD_AUG_EDGES.items():
        assert abs(got[e] - v) < 1e-6
    nodes = {r.node: r.forman_curvature for r in forman_node_curvature(edges, k, verts).collect()}
    for n, v in GOLD_AUG_NODES.items():
        assert abs(nodes[n] - v) < 1e-6


def test_forman_karate_weighted_vs_reference_formula(spark):
    """Weighted 1d formula cross-check against a direct python evaluation of
    FormanRicci.py:97-100 on a weighted karate club."""
    import math

    G = nx.karate_club_graph()
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = 0.5 + (i % 7) / 7.0
    pairs = list(G.edges())
    weights = [G[u][v]["weight"] for u, v in pairs]
    edges = make_edges(spark, pairs, weights)
    got = {(r.src, r.dst): r.forman_curvature for r in forman_curvature(edges, "1d").collect()}
    for v1, v2 in pairs:
        w_e = G[v1][v2]["weight"]
        ev1 = sum(1.0 / math.sqrt(w_e * G[v1][v]["weight"]) for v in G.neighbors(v1) if v != v2)
        ev2 = sum(1.0 / math.sqrt(w_e * G[v2][v]["weight"]) for v in G.neighbors(v2) if v != v1)
        want = w_e * (1.0 / w_e + 1.0 / w_e - (ev1 + ev2))
        key = (v1, v2) if (v1, v2) in got else (v2, v1)
        assert abs(got[key] - want) < 1e-6
