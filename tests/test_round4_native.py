"""Round-4: native C ego-partition kernel == numpy reference loop.

The ego solve (member LUT, W fill, support-arc injection, Floyd-Warshall,
distributions, exact OT) moved into one C call per cogroup partition
(emd_native.ego_solve_batch, VERDICT r3 next-round #2). These tests run the
SAME ego-mode query with GRC_EGO_NATIVE=1 and =0 and require agreement to
1e-9 on every edge — the two paths share the FW and EMD C code, so the only
FP divergence is libm-vs-numpy pow() ulps in the mass transform.
"""

import random

import pytest

from graphriccicurvature_spark.operators.ollivier import (
    _EGO_NATIVE,
    ricci_curvature_edges,
)

pytestmark = pytest.mark.skipif(not _EGO_NATIVE, reason="no C compiler")


def _random_edges(seed, n_nodes, n_edges, weighted=True):
    rng = random.Random(seed)
    seen = set()
    rows = []
    while len(rows) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        # unique CANONICAL pair: two orientations of one undirected edge
        # with different weights would make canonicalize's dropDuplicates
        # survivor plan-dependent (nondeterministic fixture, not a bug)
        if a == b or (min(a, b), max(a, b)) in seen:
            continue
        seen.add((min(a, b), max(a, b)))
        w = round(rng.uniform(0.2, 3.0), 3) if weighted else 1.0
        rows.append((a, b, w))
    return rows


def _run(spark, rows, *, native, **kw):
    df = spark.createDataFrame(rows, "src long, dst long, weight double")
    out = ricci_curvature_edges(df, mode="ego", ego_native=native, **kw).collect()
    return {(r["src"], r["dst"]): r["ricci_curvature"] for r in out}


@pytest.mark.parametrize("method", ["OTD", "ATD", "Sinkhorn", "OTDSinkhornMix"])
@pytest.mark.parametrize("directed", [False, True])
def test_native_matches_python_random_graph(spark, method, directed):
    rows = _random_edges(seed=hash((method, directed)) & 0xFFFF, n_nodes=40, n_edges=140)
    a = _run(spark, rows, native=True, method=method, directed=directed)
    b = _run(spark, rows, native=False, method=method, directed=directed)
    assert a.keys() == b.keys() and a
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9), (k, a[k], b[k])


def test_native_matches_python_mix_with_low_threshold(spark):
    # force the Mix dispatch to actually route edges to Sinkhorn by
    # lowering the support-size threshold below typical degrees
    rows = _random_edges(seed=7, n_nodes=30, n_edges=220)
    kw = dict(method="OTDSinkhornMix", otd_sinkhorn_threshold=4)
    a = _run(spark, rows, native=True, **kw)
    b = _run(spark, rows, native=False, **kw)
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9), (k, a[k], b[k])


def test_native_matches_python_unweighted_and_params(spark):
    rows = _random_edges(seed=11, n_nodes=25, n_edges=60, weighted=False)
    kw = dict(method="OTD", alpha=0.3, base=2.0, exp_power=1.0, nbr_topk=5)
    a = _run(spark, rows, native=True, **kw)
    b = _run(spark, rows, native=False, **kw)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9), (k, a[k], b[k])


def test_skeleton_reuse_matches_fresh(spark):
    """Flow-loop topology reuse (VERDICT r3 #3): a pre-assigned _blk column
    + a reused skeleton dict (cap-skip, cached demand table) must give the
    same curvatures as a from-scratch gather, including after a weight
    change on the same topology (what flow rounds do)."""
    from graphriccicurvature_spark.operators.ollivier import assign_blocks

    rows = _random_edges(seed=3, n_nodes=30, n_edges=90)
    skel = {"skip_cap": True}  # max degree << nbr_topk on this fixture

    def kappas(rows, skeleton, pre_blk):
        df = spark.createDataFrame(rows, "src long, dst long, weight double")
        if pre_blk:
            df = assign_blocks(df)
        out = ricci_curvature_edges(
            df, mode="ego", method="OTD", skeleton=skeleton
        ).collect()
        return {(r["src"], r["dst"]): r["ricci_curvature"] for r in out}

    a1 = kappas(rows, skel, pre_blk=True)
    b1 = kappas(rows, None, pre_blk=False)
    assert "demand" in skel  # round 1 populated the cache
    for k in b1:
        assert a1[k] == pytest.approx(b1[k], abs=1e-9)
    # round 2: same topology, new weights — skeleton (demand) is reused
    rows2 = [(s, d, round(w * 1.7 + 0.05, 4)) for s, d, w in rows]
    a2 = kappas(rows2, skel, pre_blk=True)
    b2 = kappas(rows2, None, pre_blk=False)
    for k in b2:
        assert a2[k] == pytest.approx(b2[k], abs=1e-9)
    assert any(a2[k] != a1[k] for k in a2)  # weights actually changed
    for df in skel.get("caches", []):
        df.unpersist()


def test_native_zero_weight_edge_is_zero(spark):
    rows = [(0, 1, 0.0), (1, 2, 1.0), (0, 2, 1.0)]
    a = _run(spark, rows, native=True, method="OTD")
    assert a[(0, 1)] == 0.0


def test_clique_chain_flow_converges_via_surgery(spark):
    """VERDICT r3 #7: a planted-community fixture where the flow's OWN
    stopping rule fires. Flow stretches the ring bridges, the reference
    surgery hook cuts them, and the surviving equal cliques have identical
    edge curvature -> kappa_diff hits exactly 0 before the iteration cap."""
    from graphriccicurvature_spark.operators.flow import ricci_flow
    from graphriccicurvature_spark.operators.surgery import surgery
    from graphriccicurvature_spark.sources.edges import clique_chain_edges

    edges = clique_chain_edges(spark, n_cliques=4, clique_size=8)
    # 4 cliques of C(8,2)=28 edges + 4 ring bridges
    assert edges.count() == 4 * 28 + 4
    rs = []
    out = ricci_flow(
        edges, iterations=30, delta=1e-4, mode="ego",
        surgery=surgery, surgery_every=5, round_stats=rs,
    )
    n_left = out.count()
    assert rs[-1]["kappa_diff"] < 1e-4  # converged, not capped
    assert len(rs) < 30
    # surgery actually fired (observed: it amputates the bridge-endpoint
    # vertices — their intra-clique edges stretch hardest — leaving equal
    # K7 cliques whose uniform curvature gives kappa_diff exactly 0)
    assert n_left < 4 * 28 + 4
