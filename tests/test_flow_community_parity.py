"""Ricci flow + community parity (goldens from reference test_OllivierRicci.py:72-141)."""

import networkx as nx
import numpy as np
import pytest

from conftest import canon_clustering
from graphriccicurvature_spark.operators.community import (
    ricci_community,
    ricci_community_all_possible_clusterings,
)
from graphriccicurvature_spark.operators.flow import ricci_flow
from graphriccicurvature_spark.sources.edges import make_edges

FLOW3_GOLD = [
    0.584642, 1.222957, 0.828566, 1.893597, 2.179315, 2.179315, 0.814135, 1.647656,
    1.893597, 0.906430, 0.916791, 0.798319, 0.760511, 0.829311, 0.760511, 2.477847,
    0.937765, 0.681481, 0.612859, 0.568307, 0.675702, 0.702774, 0.675702, 1.484889,
    0.843498, 0.753397, 1.098413, 0.868616, 0.646627, 2.061065, 1.425968, 1.924123,
    0.292387, 0.487378, 0.446435, 0.509673, 0.101477, 0.108645, 0.509673, 0.246037,
    0.246037, 0.228701, 1.309931, 1.213249, 1.317511, 2.149341, 0.712759, 0.811386,
    0.712759, 0.811386, 0.712759, 0.811386, 2.245314, 0.712759, 0.811386, 0.712759,
    0.811386, 0.947310, 0.518039, 0.857636, 1.525740, 1.429449, 0.180896, 0.692919,
    0.724545, 0.639637, 0.281116, 1.427853, 1.622385, 0.807457, 1.386869, 1.372091,
    1.320579, 1.324087, 1.276729, 1.843012, 1.721982, 0.412472,
]

CUTS_GOLD = [
    1.8364944935528884, 1.6114944935528852, 1.461494493552883, 1.2614944935528802,
    1.1864944935528792, 1.111494493552878, 1.036494493552877,
]

LAST40_CLUSTERING = {
    0: 0, 1: 0, 2: 0, 3: 0, 7: 0, 9: 0, 11: 0, 12: 0, 13: 0, 17: 0, 19: 0, 21: 0,
    4: 1, 5: 1, 6: 1, 10: 1, 16: 1,
    32: 2, 33: 2, 8: 2, 14: 2, 15: 2, 18: 2, 20: 2, 22: 2, 30: 2,
    23: 3, 24: 3, 25: 3, 26: 3, 27: 3, 28: 3, 29: 3, 31: 3,
}

COMMUNITY_CUT = 1.2613588421005884
COMMUNITY_CLUSTERING = {
    0: 0, 1: 0, 2: 0, 3: 0, 7: 0, 9: 0, 11: 0, 12: 0, 13: 0, 17: 0, 19: 0, 21: 0,
    4: 1, 5: 1, 6: 1, 10: 1, 16: 1, 8: 2, 30: 2,
    32: 3, 33: 3, 14: 3, 15: 3, 18: 3, 20: 3, 22: 3,
    23: 4, 24: 4, 25: 4, 26: 4, 27: 4, 28: 4, 29: 4, 31: 4,
}


def _karate_edges(spark):
    G = nx.karate_club_graph()
    return make_edges(spark, list(G.edges())), G


def test_ricci_flow_3_iterations(spark):
    edges, G = _karate_edges(spark)
    out = ricci_flow(edges, iterations=3, method="OTD", alpha=0.5)
    got = {(r.src, r.dst): r.weight for r in out.collect()}
    for e, v in zip(G.edges(), FLOW3_GOLD):
        assert abs(got[e] - v) < 1e-6, e
    # original_rc preserved from the first pass (reference :566-576)
    orig = {(r.src, r.dst): r.original_rc for r in out.collect()}
    assert abs(orig[(0, 1)] - 0.111111) < 1e-6


@pytest.mark.slow
def test_community_all_clusterings_40_iters(spark):
    edges, _ = _karate_edges(spark)
    flowed = ricci_flow(edges, iterations=40, exp_power=1, alpha=0.5)
    cc = ricci_community_all_possible_clusterings(flowed)
    cuts = [c for c, _ in cc]
    assert np.allclose(cuts, CUTS_GOLD, atol=1e-6)
    last = {r.node: r.component for r in cc[-1][1].collect()}
    assert canon_clustering(last) == canon_clustering(LAST40_CLUSTERING)


@pytest.mark.slow
def test_ricci_community_default_flow(spark):
    edges, _ = _karate_edges(spark)
    cut, clustering = ricci_community(edges, flow_kwargs=dict(exp_power=1, alpha=0.5))
    assert abs(cut - COMMUNITY_CUT) < 1e-6
    got = {r.node: r.component for r in clustering.collect()}
    assert canon_clustering(got) == canon_clustering(COMMUNITY_CLUSTERING)


def test_flow_checkpoint_resume(tmp_path, spark):
    """North-rule resumability: a flow interrupted after round 1 resumes from
    the checkpoint and ends bit-identical to an uninterrupted run."""
    edges, _ = _karate_edges(spark)
    full = ricci_flow(edges, iterations=3, method="OTD", alpha=0.5)
    want = {(r.src, r.dst): r.weight for r in full.collect()}

    ckpt = str(tmp_path / "flow_ckpt")
    ricci_flow(edges, iterations=2, method="OTD", alpha=0.5, checkpoint_dir=ckpt)
    resumed = ricci_flow(edges, iterations=3, method="OTD", alpha=0.5, checkpoint_dir=ckpt)
    got = {(r.src, r.dst): r.weight for r in resumed.collect()}
    assert max(abs(got[e] - want[e]) for e in want) < 1e-9

    import json, os
    rounds = sorted(os.listdir(ckpt))
    assert len(rounds) == 3
    with open(os.path.join(ckpt, rounds[0], "_metrics.json")) as fh:
        m = json.load(fh)
    assert {"sum_weight", "kappa_max", "kappa_min", "kappa_diff", "partitions"} <= set(m)
