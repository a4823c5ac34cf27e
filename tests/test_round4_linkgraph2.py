"""Round-4 link-graph additions, batch 2: k-truss, multi-source BFS
distance, exact neighborhood function, HyperBall.

Pinned against networkx (k-truss, BFS layers, ego balls) on small
graphs; driver-level DuckDB oracles pin the same semantics at sf0.01.
HyperBall has no exact oracle (HLL is approximate) — its twin test here
checks estimate-vs-exact agreement on a fixture, the same twin pattern
as minhash_md5 / embedding_dedup_exact.
"""

from __future__ import annotations

import networkx as nx
import pytest

from graphriccicurvature_spark.operators.linkgraph import (
    bfs_distance,
    harmonic_closeness,
    edge_support,
    hyperball,
    k_truss,
    neighborhood_function,
)
from graphriccicurvature_spark.sources.edges import canonicalize, make_edges


def _karate_und(spark):
    G = nx.karate_club_graph()
    return G, canonicalize(make_edges(spark, list(G.edges())))


def test_edge_support_matches_common_neighbors(spark):
    G, und = _karate_und(spark)
    got = {(r.src, r.dst): r.support for r in edge_support(und).collect()}
    for a, b in G.edges():
        want = len(set(G[a]) & set(G[b]))
        key = (min(a, b), max(a, b))
        assert got.get(key, 0) == want, key


@pytest.mark.parametrize("k", [3, 4, 5])
def test_k_truss_fixpoint_matches_networkx(spark, k):
    G, und = _karate_und(spark)
    got = {(r.src, r.dst) for r in k_truss(und, k).collect()}
    want = {tuple(sorted(e)) for e in nx.k_truss(G, k).edges()}
    assert got == want


def test_k_truss_bounded_rounds_reach_fixpoint_and_support_is_final(spark):
    G, und = _karate_und(spark)
    rows = k_truss(und, 4, rounds=3).collect()
    T = nx.k_truss(G, 4)
    assert {(r.src, r.dst) for r in rows} == {tuple(sorted(e)) for e in T.edges()}
    # reported support is measured in the FINAL induced subgraph
    for r in rows:
        assert r.support == len(set(T[r.src]) & set(T[r.dst]))
        assert r.support >= 2


def test_bfs_distance_undirected_matches_bfs_layers(spark):
    G, und = _karate_und(spark)
    seeds = spark.createDataFrame([(0,), (33,)], "node long")
    got = {
        r.node: r.dist
        for r in bfs_distance(und, seeds, max_hops=2, directed=False).collect()
    }
    want = {}
    for lvl, nodes in enumerate(nx.bfs_layers(G, [0, 33])):
        if lvl > 2:
            break
        for v in nodes:
            want[v] = lvl
    assert got == want


def test_bfs_distance_directed_respects_arc_direction(spark):
    D = nx.DiGraph([(1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (6, 1)])
    e = make_edges(spark, list(D.edges()))
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.dist
        for r in bfs_distance(e, seeds, max_hops=4, directed=True).collect()
    }
    # node 6 reaches 1 but is NOT reachable FROM 1
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_distance_seeds_outside_graph_ignored(spark):
    e = make_edges(spark, [(1, 2), (2, 3)])
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {
        r.node: r.dist
        for r in bfs_distance(e, seeds, max_hops=3, directed=True).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2}


@pytest.mark.parametrize("radius", [1, 2])
def test_neighborhood_function_matches_ego_balls(spark, radius):
    G, und = _karate_und(spark)
    got = {r.node: r.ball for r in neighborhood_function(und, radius).collect()}
    want = {
        v: len(nx.single_source_shortest_path_length(G, v, cutoff=radius))
        for v in G
    }
    assert got == want


def test_hyperball_estimates_exact_balls(spark):
    """Twin for the no-oracle hyperball_2 driver query: HLL estimates at
    lg_k=12 (~1.6% rel. error) must agree with the exact neighborhood
    function within a loose 5%/±2 bound on the fixture."""
    G, und = _karate_und(spark)
    exact = {r.node: r.ball for r in neighborhood_function(und, 2).collect()}
    est = {r.node: r.ball_estimate for r in hyperball(und, 2).collect()}
    assert set(est) == set(exact)
    for v, b in exact.items():
        assert abs(est[v] - b) <= max(2, 0.05 * b), (v, est[v], b)


def _salsa_py(pairs, iters):
    """Pure-python SALSA replica (alternating stochastic walk)."""
    arcs = sorted(set(pairs))
    outd, ind = {}, {}
    for s, d in arcs:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
    a = {v: 1.0 / len(ind) for v in ind}
    h = {u: 1.0 / len(outd) for u in outd}
    for _ in range(iters):
        t = {}
        for s, d in arcs:
            t[s] = t.get(s, 0.0) + a[d] / ind[d]
        a2 = {}
        for s, d in arcs:
            a2[d] = a2.get(d, 0.0) + t[s] / outd[s]
        g = {}
        for s, d in arcs:
            g[d] = g.get(d, 0.0) + h[s] / outd[s]
        h2 = {}
        for s, d in arcs:
            h2[s] = h2.get(s, 0.0) + g[d] / ind[d]
        a, h = a2, h2
    return a, h


def test_salsa_matches_python_replica(spark):
    from graphriccicurvature_spark.operators.linkgraph import salsa

    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 2), (5, 2), (5, 3), (6, 7)]
    got = {
        r.node: (r.salsa_authority, r.salsa_hub)
        for r in salsa(make_edges(spark, pairs), num_iterations=3).collect()
    }
    a, h = _salsa_py(pairs, 3)
    assert set(got) == set(a) | set(h)
    for v in got:
        assert got[v][0] == pytest.approx(a.get(v, 0.0), abs=1e-12)
        assert got[v][1] == pytest.approx(h.get(v, 0.0), abs=1e-12)


def test_salsa_conserves_mass(spark):
    from graphriccicurvature_spark.operators.linkgraph import salsa
    from pyspark.sql import functions as F

    pairs = [(1, 2), (2, 1), (1, 3), (3, 4), (4, 1), (5, 1)]
    out = salsa(make_edges(spark, pairs), num_iterations=5)
    sums = out.agg(
        F.sum("salsa_authority").alias("sa"), F.sum("salsa_hub").alias("sh")
    ).first()
    assert sums.sa == pytest.approx(1.0, abs=1e-9)
    assert sums.sh == pytest.approx(1.0, abs=1e-9)


def test_sssp_bounded_matches_dijkstra_within_hop_budget(spark):
    """Weighted digraph where a 2-arc path (1-1) beats the direct arc (5)."""
    rows = [(1, 2, 5.0), (1, 3, 1.0), (3, 2, 1.0), (2, 4, 1.0), (5, 1, 1.0)]
    from graphriccicurvature_spark.operators.linkgraph import sssp_bounded

    e = spark.createDataFrame(rows, "src long, dst long, weight double")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.dist
        for r in sssp_bounded(e, seeds, rounds=4, directed=True).collect()
    }
    G = nx.DiGraph()
    G.add_weighted_edges_from(rows)
    want = nx.single_source_dijkstra_path_length(G, 1)
    want.pop(5, None)
    assert got == want  # 5 unreachable FROM 1; all paths within 4 arcs


def test_sssp_bounded_respects_round_budget(spark):
    """Chain 1->2->3->4 with rounds=2 must not reach node 4."""
    from graphriccicurvature_spark.operators.linkgraph import sssp_bounded

    e = make_edges(spark, [(1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.dist
        for r in sssp_bounded(e, seeds, rounds=2, directed=True).collect()
    }
    assert got == {1: 0.0, 2: 1.0, 3: 2.0}


def test_harmonic_closeness_matches_networkx_bounded(spark):
    G, und = _karate_und(spark)
    got = {r.node: r.harmonic for r in harmonic_closeness(und, 2).collect()}
    for v in G:
        dists = nx.single_source_shortest_path_length(G, v, cutoff=2)
        want = sum(1.0 / d for d in dists.values() if d > 0)
        assert got[v] == pytest.approx(want, abs=1e-12), v


def test_harmonic_full_radius_matches_networkx_harmonic(spark):
    """At radius >= diameter the bounded form IS nx.harmonic_centrality."""
    G, und = _karate_und(spark)
    R = nx.diameter(G)
    got = {r.node: r.harmonic for r in harmonic_closeness(und, R).collect()}
    want = nx.harmonic_centrality(G)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_hyperball_harmonic_estimates_exact(spark):
    from graphriccicurvature_spark.operators.linkgraph import hyperball_harmonic

    G, und = _karate_und(spark)
    exact = {r.node: r.harmonic for r in harmonic_closeness(und, 2).collect()}
    est = {
        r.node: r.harmonic_estimate
        for r in hyperball_harmonic(und, 2).collect()
    }
    assert set(est) == set(exact)
    for v, hc in exact.items():
        assert abs(est[v] - hc) <= max(1.5, 0.06 * hc), (v, est[v], hc)


def test_distance_distribution_matches_networkx(spark):
    """Exact bounded distance distribution vs a networkx BFS replica on
    karate: ordered-pair counts per distance d = 0..3 must be identical."""
    import networkx as nx
    from graphriccicurvature_spark.operators.linkgraph import distance_distribution

    G, und = _karate_und(spark)
    want = {0: G.number_of_nodes()}
    for v in G.nodes():
        for u, d in nx.single_source_shortest_path_length(G, v, cutoff=3).items():
            if d > 0:
                want[d] = want.get(d, 0) + 1
    got = {r.d: r.pairs for r in distance_distribution(und, 3).collect()}
    assert got == want


def test_effective_diameter_matches_closed_form(spark):
    """effective_diameter = smallest d with cum pairs >= 0.9 * bounded
    total, cross-checked against the same quantile computed in python."""
    import networkx as nx
    from graphriccicurvature_spark.operators.linkgraph import (
        distance_distribution,
        effective_diameter,
    )

    G, und = _karate_und(spark)
    dd = sorted(
        (r.d, r.pairs) for r in distance_distribution(und, 3).collect()
    )
    total = sum(p for _, p in dd)
    cum = 0
    want = None
    for d, p in dd:
        cum += p
        if cum >= 0.9 * total:
            want = d
            break
    got = effective_diameter(und, 3, quantile=0.9).collect()[0].effective_diameter
    assert got == want


def test_hyperball_dd_estimates_exact(spark):
    """Twin for the no-oracle hyperball_dd_3 driver query: per-distance
    HLL pair estimates agree with the exact distribution within 5%/±3 of
    each bucket (lg_k=12 ~1.6% per-ball error, differences amplify)."""
    from graphriccicurvature_spark.operators.linkgraph import (
        distance_distribution,
        hyperball_distance_distribution,
    )

    G, und = _karate_und(spark)
    exact = {r.d: r.pairs for r in distance_distribution(und, 3).collect()}
    est = {
        r.d: r.pairs_estimate
        for r in hyperball_distance_distribution(und, 3).collect()
    }
    assert set(est) == set(exact)
    for d, p in exact.items():
        assert abs(est[d] - p) <= max(3, 0.05 * p), (d, est[d], p)
