"""Round-4 link-graph additions: HITS, k-core, co-citation Jaccard.

Each operator is pinned against a pure-python in-test replica on small
hand graphs; the driver-level DuckDB oracles (``__spark_entry__``) pin the
same semantics at sf0.01 corpus scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.linkgraph import (
    cocitation_jaccard,
    hits,
    k_core,
)


def _edges_df(spark, pairs, weight=1.0):
    return spark.createDataFrame(
        [(int(s), int(d), float(weight)) for s, d in pairs],
        "src long, dst long, weight double",
    )


def _hits_py(pairs, iters):
    nodes = sorted({x for p in pairs for x in p})
    h = {n: 1.0 / len(nodes) for n in nodes}
    a = {}
    for _ in range(iters):
        a = {n: 0.0 for n in nodes}
        for s, d in pairs:
            a[d] += h[s]
        sa = sum(a.values())
        a = {n: v / sa for n, v in a.items()}
        h = {n: 0.0 for n in nodes}
        for s, d in pairs:
            h[s] += a[d]
        sh = sum(h.values())
        h = {n: v / sh for n, v in h.items()}
    return h, a


PAIRS = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 2), (5, 2), (5, 3)]


def test_hits_matches_python_replica(spark):
    got = {
        r["node"]: (r["hub"], r["authority"])
        for r in hits(_edges_df(spark, PAIRS), num_iterations=3).collect()
    }
    h, a = _hits_py(PAIRS, 3)
    assert set(got) == set(h)
    for n in h:
        assert got[n][0] == pytest.approx(h[n], abs=1e-9)
        assert got[n][1] == pytest.approx(a[n], abs=1e-9)


def test_hits_undirected_regular_graph_is_uniform(spark):
    # undirected 4-cycle: the symmetrized adjacency is 2-regular, so the
    # uniform vector is the exact HITS fixpoint — hub == authority == 1/4
    # at every iteration
    rows = hits(
        _edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]), num_iterations=3, directed=False
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert r["hub"] == pytest.approx(0.25, abs=1e-12)
        assert r["authority"] == pytest.approx(0.25, abs=1e-12)


# triangle (1,2,3) + pendant path 3-4-5: 2-core = the triangle, and the
# peel needs TWO rounds (dropping 5 makes 4 degree-1)
KCORE_PAIRS = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]


def test_k_core_fixpoint_peels_cascade(spark):
    und = _edges_df(spark, KCORE_PAIRS)
    got = {r["node"]: r["degree"] for r in k_core(und, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_bounded_rounds_match_fixpoint_when_deep_enough(spark):
    und = _edges_df(spark, KCORE_PAIRS)
    fixp = {(r["node"], r["degree"]) for r in k_core(und, k=2).collect()}
    # 1 round is NOT enough (node 4 survives round 1 with degree 2)
    one = {(r["node"], r["degree"]) for r in k_core(und, k=2, rounds=1).collect()}
    assert (4, 1) in one
    two = {(r["node"], r["degree"]) for r in k_core(und, k=2, rounds=2).collect()}
    assert two == fixp


def test_k_core_empty_when_k_exceeds_degeneracy(spark):
    und = _edges_df(spark, KCORE_PAIRS)
    assert k_core(und, k=3).count() == 0


def test_cocitation_jaccard_hand_values(spark):
    # sources 10,11,12 cite targets: 10->{1,2}, 11->{1,2,3}, 12->{2,3}
    e = _edges_df(spark, [(10, 1), (10, 2), (11, 1), (11, 2), (11, 3), (12, 2), (12, 3)])
    got = {
        (r["a"], r["b"]): (r["shared"], r["jaccard"])
        for r in cocitation_jaccard(e, min_shared=2, max_out_degree=10).collect()
    }
    # indeg: 1->2, 2->3, 3->2 ; shared(1,2)=2, shared(2,3)=2, shared(1,3)=1 (<2, dropped)
    assert set(got) == {(1, 2), (2, 3)}
    assert got[(1, 2)] == (2, pytest.approx(2 / 3))
    assert got[(2, 3)] == (2, pytest.approx(2 / 3))


def test_cocitation_out_degree_cap_excludes_hub_sources(spark):
    # source 11 (out-degree 3) excluded at cap 2: pair counts AND in-degrees
    # are both computed over the capped source set
    e = _edges_df(spark, [(10, 1), (10, 2), (11, 1), (11, 2), (11, 3), (12, 2), (12, 3)])
    got = {
        (r["a"], r["b"]): (r["shared"], r["jaccard"])
        for r in cocitation_jaccard(e, min_shared=1, max_out_degree=2).collect()
    }
    # capped edges: 10->{1,2}, 12->{2,3}; indeg: 1->1, 2->2, 3->1
    assert got == {
        (1, 2): (1, pytest.approx(1 / 2)),
        (2, 3): (1, pytest.approx(1 / 2)),
    }


# ---------------------------------------------------------------------------
# personalized PageRank / Adamic-Adar / clustering coefficient
# ---------------------------------------------------------------------------

from graphriccicurvature_spark.operators.linkgraph import (  # noqa: E402
    adamic_adar,
    clustering_coefficient,
    personalized_pagerank,
)


def _ppr_py(pairs, seeds, d, iters):
    """Pure-python replica of the documented PPR recurrence (uniform start,
    reset + dangling mass to seeds) — independent of both Spark and SQL."""
    nodes = sorted({x for p in pairs for x in p})
    out = {}
    for s, t in pairs:
        out.setdefault(s, []).append(t)
    seeds = [n for n in seeds if n in set(nodes)]
    sv = {n: (1.0 / len(seeds) if n in set(seeds) else 0.0) for n in nodes}
    r = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(iters):
        dangle = sum(r[n] for n in nodes if n not in out)
        c = {n: 0.0 for n in nodes}
        for u, ts in out.items():
            for t in ts:
                c[t] += r[u] / len(ts)
        r = {n: (1 - d) * sv[n] + d * (c[n] + dangle * sv[n]) for n in nodes}
    return r


PPR_PAIRS = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 2), (5, 2), (5, 3), (2, 6)]
# node 6 is dangling (no out-edges); seed set {1, 4}


def test_ppr_matches_python_replica(spark):
    seeds = spark.createDataFrame([(1,), (4,)], "node long")
    got = {
        r["node"]: r["ppr"]
        for r in personalized_pagerank(
            _edges_df(spark, PPR_PAIRS), seeds, damping=0.85, num_iterations=4
        ).collect()
    }
    want = _ppr_py(PPR_PAIRS, [1, 4], 0.85, 4)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)


def test_ppr_mass_conserved_and_concentrated_on_seed_side(spark):
    seeds = spark.createDataFrame([(1,)], "node long")
    rows = personalized_pagerank(
        _edges_df(spark, PPR_PAIRS), seeds, num_iterations=20
    ).collect()
    total = sum(r["ppr"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)
    by = {r["node"]: r["ppr"] for r in rows}
    # the seed holds the reset mass; a node unreachable from the seed's
    # forward cone except via teleport decays toward 0
    assert by[1] > by[5]
    assert by[5] == pytest.approx(0.0, abs=1e-6)


def test_ppr_ignores_seeds_absent_from_graph(spark):
    seeds = spark.createDataFrame([(1,), (999,)], "node long")
    got = {
        r["node"]: r["ppr"]
        for r in personalized_pagerank(
            _edges_df(spark, PPR_PAIRS), seeds, num_iterations=3
        ).collect()
    }
    want = _ppr_py(PPR_PAIRS, [1], 0.85, 3)
    for n in want:
        assert got[n] == pytest.approx(want[n], abs=1e-12)


def test_ppr_raises_on_empty_seed_set(spark):
    seeds = spark.createDataFrame([(999,)], "node long")
    with pytest.raises(ValueError, match="no seed nodes"):
        personalized_pagerank(_edges_df(spark, PPR_PAIRS), seeds, num_iterations=1)


def _karate_und(spark):
    import networkx as nx

    G = nx.karate_club_graph()
    return _edges_df(spark, [(min(u, v), max(u, v)) for u, v in G.edges()]), G


def test_adamic_adar_matches_networkx_on_karate(spark):
    import networkx as nx

    und, G = _karate_und(spark)
    got = {
        (r["a"], r["b"]): (r["common_neighbors"], r["adamic_adar"])
        for r in adamic_adar(und, min_common=1, max_degree=1000).collect()
    }
    nonedges = [(u, v) for u, v in got]
    for u, v, score in nx.adamic_adar_index(G, nonedges):
        assert got[(u, v)][1] == pytest.approx(score, rel=1e-9)
    # every returned pair is a non-edge with >= 1 common neighbor
    for (u, v), (cn, _) in got.items():
        assert not G.has_edge(u, v)
        assert len(list(nx.common_neighbors(G, u, v))) == cn
    # completeness: every non-adjacent pair with >= 1 common neighbor appears
    n_expected = sum(
        1
        for u in G
        for v in G
        if u < v
        and not G.has_edge(u, v)
        and len(list(nx.common_neighbors(G, u, v))) > 0
    )
    assert len(got) == n_expected


def test_adamic_adar_degree_cap_drops_hub_wedges(spark):
    # star center 0 -> {1..5} plus edge (1,2): with the cap below 5 the
    # center is no common neighbor anymore, so only wedge 1-2 via... none.
    e = _edges_df(spark, [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (1, 2)])
    full = adamic_adar(e, min_common=1, max_degree=100).count()
    capped = adamic_adar(e, min_common=1, max_degree=4).count()
    assert full > 0
    assert capped == 0


def test_clustering_matches_networkx_on_karate(spark):
    import networkx as nx

    und, G = _karate_und(spark)
    got = {
        r["node"]: (r["degree"], r["clustering"])
        for r in clustering_coefficient(und).collect()
    }
    want = nx.clustering(G)
    assert set(got) == set(want)
    for n, c in want.items():
        assert got[n][0] == G.degree(n)
        assert got[n][1] == pytest.approx(c, abs=1e-12)


# ---------------------------------------------------------------------------
# assortativity / reciprocity / average neighbor degree
# ---------------------------------------------------------------------------

from graphriccicurvature_spark.operators.linkgraph import (  # noqa: E402
    average_neighbor_degree,
    degree_assortativity,
    reciprocity,
)


def test_assortativity_matches_networkx_on_karate(spark):
    import networkx as nx

    und, G = _karate_und(spark)
    got = degree_assortativity(und).first()["assortativity"]
    assert got == pytest.approx(nx.degree_assortativity_coefficient(G), abs=1e-9)


def test_assortativity_star_is_minus_one(spark):
    # star: every edge joins the hub (deg n-1) to a leaf (deg 1) — perfect
    # disassortativity
    e = _edges_df(spark, [(0, i) for i in range(1, 6)])
    assert degree_assortativity(e).first()["assortativity"] == pytest.approx(-1.0)


def test_reciprocity_hand_graph(spark):
    e = _edges_df(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1)])
    r = reciprocity(e).first()
    # self-loop dropped: arcs {12, 21, 23, 31}; reciprocal: {12, 21}
    assert (r["n_arcs"], r["n_reciprocal"]) == (4, 2)
    assert r["reciprocity"] == pytest.approx(0.5)


def test_reciprocity_matches_networkx(spark):
    import networkx as nx

    pairs = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 3), (4, 5), (5, 1)]
    got = reciprocity(_edges_df(spark, pairs)).first()["reciprocity"]
    assert got == pytest.approx(nx.reciprocity(nx.DiGraph(pairs)), abs=1e-12)


def test_average_neighbor_degree_matches_networkx_on_karate(spark):
    import networkx as nx

    und, G = _karate_und(spark)
    got = {
        r["node"]: (r["degree"], r["avg_neighbor_degree"])
        for r in average_neighbor_degree(und).collect()
    }
    want = nx.average_neighbor_degree(G)
    assert set(got) == set(want)
    for n in want:
        assert got[n][0] == G.degree(n)
        assert got[n][1] == pytest.approx(want[n], abs=1e-9)
