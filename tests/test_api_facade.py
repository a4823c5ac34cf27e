"""Reference-shaped facade: the call shapes a GraphRicciCurvature user knows."""

import networkx as nx

from graphriccicurvature_spark.api import FormanRicci, OllivierRicci
from graphriccicurvature_spark.sources.edges import make_edges


def test_ollivier_facade_matches_reference_shapes(spark):
    G = nx.karate_club_graph()
    orc = OllivierRicci(make_edges(spark, list(G.edges())), alpha=0.5, method="OTD")
    out = orc.compute_ricci_curvature()
    got = {(r.src, r.dst): r.ricci_curvature for r in out.collect()}
    assert abs(got[(0, 1)] - 0.111111) < 1e-6  # reference test :14
    nodes = {r.node: r.ricci_curvature for r in orc.node_curvature().collect()}
    assert len(nodes) == 34

    el = spark.createDataFrame([(0, 1)], "src long, dst long")
    single = orc.compute_ricci_curvature_edges(edge_list=el)
    assert single.count() == 1


def test_ollivier_facade_flow(spark):
    G = nx.karate_club_graph()
    orc = OllivierRicci(make_edges(spark, list(G.edges())), alpha=0.5, method="OTD")
    flowed = orc.compute_ricci_flow(iterations=2)
    cols = set(flowed.columns)
    assert {"src", "dst", "weight", "ricci_curvature", "original_rc"} <= cols


def test_forman_facade(spark):
    edges = make_edges(spark, [(1, 2), (2, 3), (3, 4), (2, 4)])
    frc = FormanRicci(edges, method="1d")
    out = {(r.src, r.dst): r.forman_curvature for r in frc.compute_ricci_curvature().collect()}
    assert out == {(1, 2): 0.0, (2, 3): -1.0, (2, 4): -1.0, (3, 4): 0.0}
    verts = spark.createDataFrame([(i,) for i in range(1, 6)], "node long")
    nodes = {r.node: r.forman_curvature for r in frc.node_curvature(verts).collect()}
    assert nodes[5] == 0.0
