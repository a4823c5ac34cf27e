import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from graphriccicurvature_spark.session import get_spark

    os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "4")
    s = get_spark(master=os.environ.get("SPARK_MASTER", "local[8]"))
    yield s
    s.stop()


def canon_clustering(d: dict) -> dict:
    """Relabel cluster ids to min member id (FIXTURES.md F3 comparison rule)."""
    groups: dict = {}
    for n, c in d.items():
        groups.setdefault(c, []).append(n)
    return {n: min(members) for members in groups.values() for n in members}


def pagerank_oracle(G, alpha=0.85, max_iter=100, tol=1.0e-6, weight="weight", num_iterations=None):
    """Pure-python replica of networkx's pagerank power iteration (the
    installed nx delegates to scipy, which this environment lacks)."""
    D = G.to_directed() if not G.is_directed() else G
    N = D.number_of_nodes()
    x = {n: 1.0 / N for n in D}
    outw = {n: sum(d.get(weight, 1) for _, _, d in D.out_edges(n, data=True)) for n in D}
    dangling = [n for n in D if outw[n] == 0.0]
    iters = num_iterations if num_iterations is not None else max_iter
    for _ in range(iters):
        xlast = x
        x = {n: 0.0 for n in D}
        danglesum = alpha * sum(xlast[n] for n in dangling)
        for n in D:
            for _, nbr, d in D.out_edges(n, data=True):
                x[nbr] += alpha * xlast[n] * d.get(weight, 1) / outw[n]
        for n in D:
            x[n] += danglesum / N + (1.0 - alpha) / N
        if num_iterations is None:
            err = sum(abs(x[n] - xlast[n]) for n in D)
            if err < N * tol:
                return x
    return x


def lpa_min_oracle(G, max_iter=10):
    """Synchronous min-label propagation oracle (FIXTURES.md F5)."""
    labels = {n: n for n in G.nodes()}
    for _ in range(max_iter):
        new = {}
        for n in G.nodes():
            nbr_labels = [labels[v] for v in G.neighbors(n)]
            new[n] = min([labels[n]] + nbr_labels)
        if new == labels:
            return new
        labels = new
    return labels


def lpa_majority_oracle(G, max_iter=10):
    """Synchronous majority-label propagation, ties -> smallest label."""
    labels = {n: n for n in G.nodes()}
    for _ in range(max_iter):
        new = {}
        for n in G.nodes():
            counts: dict = {}
            for v in G.neighbors(n):
                counts[labels[v]] = counts.get(labels[v], 0) + 1
            if not counts:
                new[n] = labels[n]
            else:
                best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                new[n] = best
        if new == labels:
            return new
        labels = new
    return labels
