"""Round-2 regression tests: ego truncation NaN fix, EMD infeasibility
surfacing, batched Sinkhorn + POT-semantics parity, API weight-rename
collision, edge_list orientation, and dedup skew caps."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.functions.emd import emd_exact
from graphriccicurvature_spark.functions.sinkhorn import (
    sinkhorn_cost,
    sinkhorn_cost_batch,
)
from graphriccicurvature_spark.operators.ollivier import ricci_curvature_edges
from graphriccicurvature_spark.sources.edges import make_edges


# ---------------------------------------------------------------------------
# ADVICE #1: hub truncation must not poison ego curvature with NaN
# ---------------------------------------------------------------------------


def test_ego_truncated_hub_is_finite_and_matches_component(spark):
    # node 3's adjacency capped at nbr_topk=2 keeps its two 0.1-weight arcs
    # and drops the arc back to node 1; before the fix edge (1,2) came out
    # NaN because the local W matrix had inf rows.
    pairs = [(1, 2), (1, 3), (3, 10), (3, 11)]
    weights = [1.0, 1.0, 0.1, 0.1]
    e = make_edges(spark, pairs, weights)
    ego = {
        (r["src"], r["dst"]): r["ricci_curvature"]
        for r in ricci_curvature_edges(
            e, method="OTD", mode="ego", nbr_topk=2
        ).collect()
    }
    comp = {
        (r["src"], r["dst"]): r["ricci_curvature"]
        for r in ricci_curvature_edges(
            e, method="OTD", mode="component", nbr_topk=2
        ).collect()
    }
    assert all(math.isfinite(v) for v in ego.values()), ego
    # the s/t arcs are injected, so for edge (1,2) the whole relevant
    # neighborhood is inside the block and ego == exact
    assert ego[(1, 2)] == pytest.approx(comp[(1, 2)], abs=1e-9)


# ---------------------------------------------------------------------------
# ADVICE #2: infeasible transport must surface, not under-cost
# ---------------------------------------------------------------------------


def test_emd_infeasible_returns_inf():
    a = np.array([0.5, 0.5])
    b = np.array([0.5, 0.5])
    M = np.array([[1.0, np.inf], [np.inf, np.inf]])
    assert emd_exact(a, b, M) == np.inf


def test_emd_native_infeasible_returns_inf():
    from graphriccicurvature_spark.functions import emd_native

    if not emd_native.available():
        pytest.skip("no C compiler")
    a = np.array([0.5, 0.5])
    b = np.array([0.5, 0.5])
    M = np.array([[1.0, np.inf], [np.inf, np.inf]])
    assert emd_native.emd_exact_native(a, b, M) == np.inf


# ---------------------------------------------------------------------------
# Sinkhorn: POT sinkhorn_knopp re-derivation parity + batch == single
# ---------------------------------------------------------------------------


def _pot_sinkhorn2_naive(a, b, M, reg=1e-1, numItermax=1000, stopThr=1e-9):
    """Deliberately-naive scalar transcription of POT's sinkhorn_knopp
    (ot/bregman/_sinkhorn.py): explicit loops, no vectorized shortcuts, so
    agreement with functions/sinkhorn.sinkhorn_cost is a genuine
    independent re-derivation check of the same published algebra."""
    m, n = len(a), len(b)
    K = [[math.exp(-M[i][j] / reg) for j in range(n)] for i in range(m)]
    Kp = [[K[i][j] / a[i] for j in range(n)] for i in range(m)]
    u = [1.0 / m] * m
    v = [1.0 / n] * n
    for ii in range(numItermax):
        uprev, vprev = list(u), list(v)
        KtU = [sum(K[i][j] * u[i] for i in range(m)) for j in range(n)]
        v = [b[j] / KtU[j] if KtU[j] != 0 else float("inf") for j in range(n)]
        u = [1.0 / sum(Kp[i][j] * v[j] for j in range(n)) for i in range(m)]
        if (
            any(x == 0 for x in KtU)
            or any(not math.isfinite(x) for x in u)
            or any(not math.isfinite(x) for x in v)
        ):
            u, v = uprev, vprev
            break
        if ii % 10 == 0:
            tmp2 = [sum(u[i] * K[i][j] * v[j] for i in range(m)) for j in range(n)]
            err = math.sqrt(sum((tmp2[j] - b[j]) ** 2 for j in range(n)))
            if err < stopThr:
                break
    return sum(u[i] * K[i][j] * v[j] * M[i][j] for i in range(m) for j in range(n))


@pytest.mark.parametrize("seed,m,n", [(0, 3, 4), (1, 7, 5), (2, 12, 12), (3, 2, 9)])
def test_sinkhorn_matches_pot_rederivation(seed, m, n):
    rng = np.random.RandomState(seed)
    a = rng.rand(m) + 0.05
    a /= a.sum()
    b = rng.rand(n) + 0.05
    b /= b.sum()
    M = rng.rand(m, n) * 2.0
    got = sinkhorn_cost(a, b, M, reg=1e-1)
    want = _pot_sinkhorn2_naive(a.tolist(), b.tolist(), M.tolist(), reg=1e-1)
    assert got == pytest.approx(want, rel=1e-10, abs=1e-12)


def test_sinkhorn_batch_matches_singles_ragged():
    rng = np.random.RandomState(7)
    xs, ys, ds, singles = [], [], [], []
    for m, n in [(3, 5), (6, 2), (4, 4), (9, 7)]:
        a = rng.rand(m) + 0.05
        a /= a.sum()
        b = rng.rand(n) + 0.05
        b /= b.sum()
        M = rng.rand(m, n) * 2.0
        xs.append(a)
        ys.append(b)
        ds.append(M)
        singles.append(sinkhorn_cost(a, b, M, reg=1e-1))
    batch = sinkhorn_cost_batch(xs, ys, ds, reg=1e-1)
    np.testing.assert_allclose(batch, singles, rtol=1e-8, atol=1e-12)


def test_ego_sinkhorn_batched_path_matches_component(spark):
    # C4 + chords: every per-edge ego block contains the whole graph, so
    # ego Sinkhorn (the batched kernel path) must equal component-mode
    # Sinkhorn (the per-component batched path) exactly.
    pairs = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)]
    e = make_edges(spark, pairs)
    ego = {
        (r["src"], r["dst"]): r["ricci_curvature"]
        for r in ricci_curvature_edges(e, method="Sinkhorn", mode="ego").collect()
    }
    comp = {
        (r["src"], r["dst"]): r["ricci_curvature"]
        for r in ricci_curvature_edges(e, method="Sinkhorn", mode="component").collect()
    }
    assert set(ego) == set(comp)
    for k in ego:
        assert ego[k] == pytest.approx(comp[k], rel=1e-8, abs=1e-10), k


def test_ego_hub_multichunk_blocks_match_component(spark):
    """A 100-leaf star's hub exceeds BLOCK_MAX_EDGES=32, so its eval edges
    span multiple CSR chunks; every ego block still contains the full
    relevant neighborhood, so values must equal component mode."""
    pairs = [(0, i) for i in range(1, 101)]
    e = make_edges(spark, pairs)
    ego = {
        (r["src"], r["dst"]): r["ricci_curvature"]
        for r in ricci_curvature_edges(e, method="OTD", mode="ego").collect()
    }
    comp = {
        (r["src"], r["dst"]): r["ricci_curvature"]
        for r in ricci_curvature_edges(e, method="OTD", mode="component").collect()
    }
    assert len(ego) == 100
    for k in comp:
        assert ego[k] == pytest.approx(comp[k], abs=1e-9), k


# karate Sinkhorn goldens (reg=0.1, POT sinkhorn_knopp semantics): pinned
# from the verified transcription (cross-validated against the independent
# naive re-derivation above); entropic blur of the OTD values
# [0.111111, -0.14375, 0.041667, -0.114583, -0.28125].
_KARATE_SINKHORN_5 = [
    0.110614046, -0.144026855, 0.041480672, -0.114598921, -0.281266598,
]


def test_sinkhorn_curvature_pinned_and_mix_dispatch():
    """Sinkhorn curvature values pinned on karate; OTDSinkhornMix with a
    tiny threshold must route through the batched Sinkhorn path and equal
    method='Sinkhorn' exactly (the above-threshold dispatch branch)."""
    import networkx as nx
    import numpy as np

    from graphriccicurvature_spark.functions.localgraph import component_curvature

    G = nx.karate_club_graph()
    e = np.array(G.edges())
    ones = np.ones(len(e))
    ks = component_curvature(e[:, 0], e[:, 1], ones, e[:5, 0], e[:5, 1], method="Sinkhorn")
    np.testing.assert_allclose(ks, _KARATE_SINKHORN_5, atol=1e-8)
    km = component_curvature(
        e[:, 0], e[:, 1], ones, e[:5, 0], e[:5, 1],
        method="OTDSinkhornMix", otd_sinkhorn_threshold=2,
    )
    np.testing.assert_allclose(km, ks, atol=0)
    # below threshold the Mix stays exact-OT
    ko = component_curvature(e[:, 0], e[:, 1], ones, e[:5, 0], e[:5, 1], method="OTD")
    kmix = component_curvature(
        e[:, 0], e[:, 1], ones, e[:5, 0], e[:5, 1], method="OTDSinkhornMix"
    )
    np.testing.assert_allclose(kmix, ko, atol=0)


def test_mix_threshold_dispatch_spark_end_to_end(spark):
    """otd_sinkhorn_threshold threads through both Spark modes: forcing it
    low makes Mix equal the Sinkhorn method's output."""
    import networkx as nx

    G = nx.karate_club_graph()
    e = make_edges(spark, list(G.edges()))
    for mode in ("component", "ego"):
        mix = {
            (r["src"], r["dst"]): r["ricci_curvature"]
            for r in ricci_curvature_edges(
                # support size = nbrs + self >= 2 for any edge endpoint, so
                # threshold 1 forces every edge through the Sinkhorn branch
                e, method="OTDSinkhornMix", mode=mode, otd_sinkhorn_threshold=1
            ).collect()
        }
        sink = {
            (r["src"], r["dst"]): r["ricci_curvature"]
            for r in ricci_curvature_edges(e, method="Sinkhorn", mode=mode).collect()
        }
        for key in sink:
            assert mix[key] == pytest.approx(sink[key], abs=1e-12), (mode, key)


# ---------------------------------------------------------------------------
# ADVICE #3/#4: API weight collision, edge_list orientation
# ---------------------------------------------------------------------------


def test_api_custom_weight_column_with_existing_weight(spark):
    from graphriccicurvature_spark.api import OllivierRicci

    e = spark.createDataFrame(
        [(0, 1, 99.0, 1.0), (1, 2, 99.0, 1.0)],
        "src long, dst long, weight double, my_w double",
    )
    orc = OllivierRicci(e, weight="my_w", method="OTD")
    out = orc.compute_ricci_curvature_edges().collect()
    assert len(out) == 2
    assert all(math.isfinite(r["ricci_curvature"]) for r in out)


def test_edge_list_reverse_orientation_matches(spark):
    e = make_edges(spark, [(0, 1), (1, 2), (2, 3), (0, 2)])
    fwd = spark.createDataFrame([(0, 1)], "src long, dst long")
    rev = spark.createDataFrame([(1, 0)], "src long, dst long")
    for mode in ("component", "ego"):
        kf = ricci_curvature_edges(e, method="OTD", mode=mode, edge_list=fwd).collect()
        kr = ricci_curvature_edges(e, method="OTD", mode=mode, edge_list=rev).collect()
        assert len(kf) == len(kr) == 1
        assert kf[0]["ricci_curvature"] == pytest.approx(
            kr[0]["ricci_curvature"], abs=1e-12
        )


# ---------------------------------------------------------------------------
# dedup skew caps: no quadratic pair explosion on a 1k-duplicate bucket
# ---------------------------------------------------------------------------


def test_minhash_mega_bucket_star_capped(spark):
    from graphriccicurvature_spark.operators.dedup import (
        minhash_dedup,
        minhash_lsh_candidates,
    )

    n_dup = 1000
    rows = [(i, "the same boilerplate text repeated here again and again") for i in range(n_dup)]
    rows += [(n_dup + i, f"unique document number {i} words alpha beta gamma delta") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = minhash_lsh_candidates(df, bucket_cap=64)
    n_cands = cands.count()
    # star chaining: O(bands * n) candidates, nowhere near n^2/2 = 499500
    assert n_cands <= 16 * n_dup, n_cands
    clusters = minhash_dedup(df, bucket_cap=64)
    dup_clusters = (
        clusters.filter(F.col("doc_id") < n_dup).select("cluster").distinct().count()
    )
    assert dup_clusters == 1  # star pairs keep the bucket connected
    survivors = clusters.filter(F.col("is_survivor")).count()
    assert survivors == 1 + 5


def test_components_sweep_matches_from_scratch(spark):
    """Fused ascending sweep (one CC + driver union-find replay + one
    modularity job) must reproduce per-cutoff from-scratch CC labels and
    modularity exactly."""
    import random

    from graphriccicurvature_spark.operators.community import (
        _components_sweep,
        _modularities_all,
        cut_graph_by_cutoff,
        modularity,
    )
    from graphriccicurvature_spark.operators.components import connected_components

    random.seed(3)
    pairs, ws = [], []
    for _ in range(60):
        a, b = random.sample(range(25), 2)
        pairs.append((min(a, b), max(a, b)))
        ws.append(round(random.uniform(0.5, 3.0), 3))
    e = make_edges(spark, pairs, ws).dropDuplicates(["src", "dst"])
    cutoffs = [1.0, 1.4, 1.8, 2.2, 2.6, 3.0]
    W, cols = _components_sweep(e, cutoffs)
    qs = _modularities_all(e, W, cols, cutoffs)
    wrows = W.collect()
    for i, c in enumerate(cutoffs):
        cut = cut_graph_by_cutoff(e, c)
        ref = {r["node"]: r["component"] for r in connected_components(cut).collect()}
        got = {r["node"]: r[cols[i]] for r in wrows if r["node"] in ref}
        assert got == ref, f"labels differ at cutoff {c}"
        assert qs.get(i, 0.0) == pytest.approx(
            modularity(cut, connected_components(cut)), abs=1e-9
        ), f"modularity differs at cutoff {c}"


def test_ivf_ann_recall_and_lloyd(spark):
    """IVF-flat candidates must beat random-cell recall vs exact brute
    force, and the Lloyd-refined variant must still return valid top-k."""
    import numpy as np

    from graphriccicurvature_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )

    rng = np.random.RandomState(11)
    n, d = 300, 16
    vecs = rng.randn(n, d)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.filter(F.col("vec_id") < 4)
    exact = cosine_topk_bruteforce(emb, qs, k=5).collect()
    got0 = cosine_topk_ivf(emb, qs, k=5, n_centroids=8, nprobe=4, lloyd_iters=0).collect()
    got1 = cosine_topk_ivf(emb, qs, k=5, n_centroids=8, nprobe=4, lloyd_iters=1).collect()
    want = {(r["query_id"], r["vec_id"]) for r in exact}
    for got in (got0, got1):
        hits = {(r["query_id"], r["vec_id"]) for r in got}
        recall = len(want & hits) / len(want)
        assert recall >= 0.5, recall
        # ranks contiguous per query, cosines within [-1, 1]
        assert all(-1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9 for r in got)


def test_shingle_hashes_counts_match_strings(spark):
    """Arithmetic token-hash shingles produce one hash per word k-gram,
    matching the string shingle count (distinctness modulo collisions)."""
    from graphriccicurvature_spark.operators.textstats import (
        shingle_hashes,
        word_shingles,
    )

    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "x y"), (2, ""), (3, "p q r")],
        "doc_id long, text string",
    )
    out = df.select(
        "doc_id",
        F.size(word_shingles(F.col("text"), 3)).alias("ns"),
        F.size(shingle_hashes(F.col("text"), 3)).alias("nh"),
    ).collect()
    for r in out:
        assert r["ns"] == r["nh"], r


def test_bucketed_edges_join_without_exchange(spark):
    """A self-join on src over the bucketed edge table must not shuffle
    either side (bucket co-location replaces the exchange)."""
    from graphriccicurvature_spark.sources.bucketed import (
        load_bucketed_edges,
        save_bucketed_edges,
    )

    e = make_edges(spark, [(i, (i * 7 + 1) % 50) for i in range(200)])
    tbl = "bucketed_edges_test"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    save_bucketed_edges(e, tbl, buckets=8)
    # disable broadcast so the planner actually uses the bucketed layout
    # (tiny test tables would otherwise broadcast and skip bucketing)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        b = load_bucketed_edges(spark, tbl)
        j = b.alias("a").join(
            b.alias("b").withColumnRenamed("dst", "dst2").withColumnRenamed(
                "weight", "w2"
            ),
            "src",
        )
        rows = j.collect()  # executes j's own query -> final AQE plan
        expect = (
            e.alias("a")
            .join(e.alias("b").withColumnRenamed("dst", "dst2"), "src")
            .count()
        )
        assert len(rows) == expect
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_ngram_df_cut_values_exact(spark):
    from graphriccicurvature_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (0, "a b c d e f"),
        (1, "a b c d x y"),
        (2, "p q r s t u"),
        (3, "p q r s t v"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, k=2, threshold=0.1).collect()
    }
    # generous DF cut: identical output
    cut = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, k=2, threshold=0.1, max_shingle_df=100).collect()
    }
    assert base == cut
    assert base[(0, 1)] == pytest.approx(3 / 7)
