"""Unit tests for the pure-numpy kernels (no Spark)."""

import networkx as nx
import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from graphriccicurvature_spark.functions.emd import emd_exact
from graphriccicurvature_spark.functions.localgraph import floyd_warshall
from graphriccicurvature_spark.functions.sinkhorn import sinkhorn_batch, sinkhorn_cost


def _emd_network_simplex_oracle(a, b, M, scale=10**7):
    """Integer-scaled exact min-cost-flow oracle via networkx."""
    m, n = M.shape
    ai = np.round(a * scale).astype(int)
    bi = np.round(b * scale).astype(int)
    bi[0] += ai.sum() - bi.sum()
    Ci = np.round(M * scale).astype(int)
    G = nx.DiGraph()
    for i in range(m):
        G.add_node(("s", i), demand=-int(ai[i]))
    for j in range(n):
        G.add_node(("t", j), demand=int(bi[j]))
    for i in range(m):
        for j in range(n):
            G.add_edge(("s", i), ("t", j), weight=int(Ci[i, j]))
    cost, _ = nx.network_simplex(G)
    return cost / scale / scale


def test_emd_vs_network_simplex_random():
    rng = np.random.RandomState(7)
    for _ in range(40):
        m, n = rng.randint(2, 10), rng.randint(2, 10)
        a = rng.rand(m)
        a /= a.sum()
        b = rng.rand(n)
        b /= b.sum()
        M = rng.rand(m, n) * 5
        assert abs(emd_exact(a, b, M) - _emd_network_simplex_oracle(a, b, M)) < 1e-5


def test_emd_degenerate():
    assert emd_exact(np.array([1.0]), np.array([0.5, 0.5]), np.array([[2.0, 4.0]])) == 3.0
    assert emd_exact(np.array([0.5, 0.5]), np.array([1.0]), np.array([[2.0], [4.0]])) == 3.0
    M = np.array([[0.0, 1.0], [1.0, 0.0]])
    assert emd_exact(np.array([0.3, 0.7]), np.array([0.3, 0.7]), M) == 0.0


@settings(max_examples=30, deadline=None)
@given(
    st.integers(2, 6),
    st.integers(2, 6),
    st.integers(0, 10**6),
)
def test_emd_symmetry_property(m, n, seed):
    rng = np.random.RandomState(seed)
    a = rng.rand(m) + 1e-3
    a /= a.sum()
    b = rng.rand(n) + 1e-3
    b /= b.sum()
    M = rng.rand(m, n)
    v1 = emd_exact(a, b, M)
    v2 = emd_exact(b, a, M.T)
    assert abs(v1 - v2) < 1e-9
    assert v1 >= -1e-12


def test_floyd_warshall_vs_networkx():
    rng = np.random.RandomState(3)
    G = nx.gnp_random_graph(25, 0.15, seed=5)
    for u, v in G.edges():
        G[u][v]["weight"] = float(rng.rand() + 0.1)
    n = G.number_of_nodes()
    W = np.full((n, n), np.inf)
    for u, v, d in G.edges(data=True):
        W[u, v] = d["weight"]
        W[v, u] = d["weight"]
    D = floyd_warshall(W)
    sp = dict(nx.all_pairs_dijkstra_path_length(G))
    for u in G.nodes():
        for v, dist in sp[u].items():
            assert abs(D[u, v] - dist) < 1e-9


def test_native_solvers_match_numpy():
    """The C fast path must agree with the (oracle-verified) numpy solvers."""
    from graphriccicurvature_spark.functions import emd_native

    if not emd_native.available():
        pytest.skip("no C compiler available; numpy fallback is in use")
    rng = np.random.RandomState(13)
    for _ in range(60):
        m, n = rng.randint(1, 30), rng.randint(1, 30)
        a = rng.rand(m)
        a /= a.sum()
        b = rng.rand(n)
        b /= b.sum()
        M = rng.randint(0, 4, (m, n)).astype(float) if rng.rand() < 0.5 else rng.rand(m, n) * 5
        assert abs(emd_native.emd_exact_native(a, b, M) - emd_exact(a, b, M)) < 1e-10
    # batched == singles
    xs = [np.array([0.5, 0.5]), np.array([1.0])]
    ys = [np.array([1.0]), np.array([0.25, 0.75])]
    ds = [np.array([[1.0], [3.0]]), np.array([[2.0, 4.0]])]
    out = emd_native.emd_batch_native(xs, ys, ds)
    assert abs(out[0] - 2.0) < 1e-12 and abs(out[1] - 3.5) < 1e-12
    # native Floyd-Warshall == numpy
    W = np.full((20, 20), np.inf)
    for i in range(20):
        for j in rng.choice(20, 4, replace=False):
            if i != j:
                W[i, j] = float(rng.rand() + 0.05)
    assert np.allclose(emd_native.floyd_warshall_native(W), floyd_warshall(W))


def test_sinkhorn_batch_matches_single_and_bounds():
    rng = np.random.RandomState(11)
    a = rng.rand(4)
    a /= a.sum()
    b = rng.rand(3)
    b /= b.sum()
    M = rng.rand(4, 3) * 2
    s = sinkhorn_cost(a, b, M)
    sb = sinkhorn_batch(a[None], b[None], M[None])[0]
    assert abs(s - sb) < 1e-12
    # padded batch identical
    A = np.zeros((1, 6))
    A[0, :4] = a
    B = np.zeros((1, 5))
    B[0, :3] = b
    Mp = np.full((1, 6, 5), 1e3)
    Mp[0, :4, :3] = M
    assert abs(sinkhorn_batch(A, B, Mp)[0] - s) < 1e-9
    # entropic cost approximates exact OT (reg=0.1; POT-identical iteration,
    # may stop at numItermax with slight marginal violation, so no hard bound)
    w = emd_exact(a, b, M)
    assert abs(s - w) / w < 0.2
