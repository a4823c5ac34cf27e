"""Round-5j operators: SCAN structural clustering (Xu et al., KDD 2007)
and warm-start (incremental-crawl) PageRank.

SCAN is checked against a brute-force pure-python replica of the
published definitions on a fixture exercising every role (core, border,
hub, outlier); warm-start PageRank is pinned by the algebraic identity
cold(k+m) == warm(m, init=cold(k)) — power iteration is a pure function
of the current vector, so continuing from iteration k must reproduce the
cold run exactly. Driver-level DuckDB value oracles: `scan_clustering`,
`pagerank_incremental`.
"""

from __future__ import annotations

import collections
import math

from pyspark.sql import functions as F

from graphriccicurvature_spark.operators.linkgraph import scan_clustering
from graphriccicurvature_spark.operators.pagerank import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double"
    )


def _scan_bruteforce(pairs, eps, mu):
    adj = collections.defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    nodes = sorted(adj)

    def sigma(u, v):
        cu, cv = adj[u] | {u}, adj[v] | {v}
        return len(cu & cv) / math.sqrt(len(cu) * len(cv))

    epsn = {u: {v for v in adj[u] if sigma(u, v) >= eps} for u in nodes}
    cores = {u for u in nodes if len(epsn[u]) + 1 >= mu}
    parent = {u: u for u in cores}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u in cores:
        for v in epsn[u]:
            if v in cores:
                ra, rb = find(u), find(v)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = collections.defaultdict(list)
    for u in cores:
        comp[find(u)].append(u)
    clus = {u: min(comp[find(u)]) for u in cores}
    exp = {u: ("core", clus[u]) for u in cores}
    for u in nodes:
        if u in exp:
            continue
        cand = [clus[v] for v in epsn[u] if v in cores]
        if cand:
            exp[u] = ("border", min(cand))
    for u in nodes:
        if u in exp:
            continue
        ncl = {exp[v][1] for v in adj[u] if v in exp and exp[v][1] is not None}
        exp[u] = ("hub" if len(ncl) >= 2 else "outlier", None)
    return exp


# two 4-cliques bridged by node 20 (a hub at eps=0.7), pendant 4 off the
# first clique (border), isolated dyad 30-31 (outliers)
_FIXTURE = (
    [(a, b) for i, a in enumerate([0, 1, 2, 3]) for b in [0, 1, 2, 3][i + 1 :]]
    + [(a, b) for i, a in enumerate([10, 11, 12, 13]) for b in [10, 11, 12, 13][i + 1 :]]
    + [(0, 20), (1, 20), (10, 20), (11, 20), (0, 4), (1, 4), (30, 31)]
)


def test_scan_matches_bruteforce_all_roles(spark):
    got = {
        r["node"]: (r["role"], r["cluster"])
        for r in scan_clustering(_edges(spark, _FIXTURE), eps=0.7, mu=4).collect()
    }
    exp = _scan_bruteforce(_FIXTURE, 0.7, 4)
    assert got == exp
    roles = {role for role, _ in got.values()}
    assert roles == {"core", "border", "hub", "outlier"}, roles
    # pendant 4 borders the first clique; bridge 20 is a hub between both
    assert got[4] == ("border", 0)
    assert got[20] == ("hub", None)


def test_scan_low_eps_merges_via_bridge(spark):
    """At eps=0.5 the bridge node's σ to both cliques clears the bar, so
    one cluster spans both cliques and the bridge is a core."""
    got = {
        r["node"]: (r["role"], r["cluster"])
        for r in scan_clustering(_edges(spark, _FIXTURE), eps=0.5, mu=3).collect()
    }
    exp = _scan_bruteforce(_FIXTURE, 0.5, 3)
    assert got == exp
    assert got[20][0] == "core"
    assert got[0][1] == got[10][1]


def test_scan_every_node_classified_once(spark, sf_dir=None):
    from graphriccicurvature_spark.sources.edges import (
        canonicalize,
        edges_from_documents,
    )

    e = canonicalize(edges_from_documents(spark, "/root/testdata/sf0.001"))
    out = scan_clustering(e, eps=0.4, mu=3)
    rows = out.collect()
    n_nodes = (
        e.select(F.col("src").alias("n"))
        .union(e.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    assert len(rows) == n_nodes
    assert len({r["node"] for r in rows}) == n_nodes
    for r in rows:
        assert (r["cluster"] is not None) == (r["role"] in ("core", "border"))


def test_pagerank_warm_continuation_identity(spark):
    """cold(5) == warm(2, init=cold(3)) exactly (same plan algebra both
    ways, so tolerances are pure float-reduction noise)."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 0), (1, 4), (5, 0)]
    e = _edges(spark, pairs)
    cold5 = {r["node"]: r["pagerank"] for r in pagerank(e, num_iterations=5).collect()}
    cold3 = pagerank(e, num_iterations=3)
    warm = {
        r["node"]: r["pagerank"]
        for r in pagerank(e, num_iterations=2, init=cold3).collect()
    }
    assert set(warm) == set(cold5)
    for n, v in cold5.items():
        assert abs(warm[n] - v) < 1e-12, (n, warm[n], v)


def test_pagerank_init_missing_nodes_default_uniform(spark):
    """Nodes absent from init start at 1/N of the CURRENT graph: warm-start
    with an EMPTY init equals the cold start."""
    pairs = [(0, 1), (1, 2), (2, 0), (3, 0)]
    e = _edges(spark, pairs)
    empty = spark.createDataFrame([], "node long, pagerank double")
    cold = {r["node"]: r["pagerank"] for r in pagerank(e, num_iterations=3).collect()}
    warm = {
        r["node"]: r["pagerank"]
        for r in pagerank(e, num_iterations=3, init=empty).collect()
    }
    assert warm == cold
