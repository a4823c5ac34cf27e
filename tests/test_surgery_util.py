"""Surgery hook, ARI, verbosity (reference my_surgery.py / util.py parity)."""

import networkx as nx

from graphriccicurvature_spark.operators.flow import ricci_flow
from graphriccicurvature_spark.operators.surgery import (
    adjusted_rand_index,
    default_cut,
    surgery,
)
from graphriccicurvature_spark.sources.edges import make_edges
from graphriccicurvature_spark.util import logger, set_verbose


def test_default_cut_and_surgery(spark):
    pairs = [(0, 1), (1, 2), (2, 3)]
    edges = make_edges(spark, pairs, weights=[1.0, 2.0, 3.0])
    # cut = (3 - 1) * 0.6 + 1 = 2.2 (reference my_surgery.py:76)
    assert abs(default_cut(edges) - 2.2) < 1e-12
    kept = surgery(edges)
    assert {(r.src, r.dst) for r in kept.collect()} == {(0, 1), (1, 2)}


def test_surgery_hook_in_flow(spark):
    G = nx.karate_club_graph()
    edges = make_edges(spark, list(G.edges()))
    calls = []

    def hook(df):
        calls.append(1)
        return surgery(df)

    out = ricci_flow(edges, iterations=4, method="OTD", alpha=0.5,
                     surgery=hook, surgery_every=2)
    # reference fires at i != 0 and i % k == 0 -> round 2 only (of 0..3)
    assert len(calls) == 1
    assert out.count() <= 78


def test_adjusted_rand_index():
    a = {i: i // 5 for i in range(20)}
    assert adjusted_rand_index(a, a) == 1.0
    # relabeled clusters -> still perfect
    b = {k: v + 100 for k, v in a.items()}
    assert adjusted_rand_index(a, b) == 1.0
    # known sklearn value for this pair: ARI([0,0,1,1],[0,0,1,2]) = 0.5714285714...
    t = {0: 0, 1: 0, 2: 1, 3: 1}
    p = {0: 0, 1: 0, 2: 1, 3: 2}
    assert abs(adjusted_rand_index(t, p) - 0.5714285714285714) < 1e-12


def test_set_verbose_levels():
    import logging

    set_verbose("TRACE")
    assert logger.level == logging.DEBUG + 5
    set_verbose("nonsense")
    assert logger.level == logging.ERROR
    set_verbose("ERROR")
