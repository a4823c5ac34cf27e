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
