"""Regression tests for the round-3 judge/advisor findings (VERDICT.md r2).

1. Sinkhorn size-class bucketing: one hub-size problem in an Arrow batch of
   small ones no longer inflates every padded cost matrix to max_m x max_n.
2. High-dim ANN: model scoring switches from plan-literal expressions to a
   broadcast-numpy pandas UDF above _LITERAL_MODEL_LIMIT (no thousand-
   literal expression trees, no .first() dim probe).
3. embedding_dedup defaults to the LSH-bucketed scale path; the exact path
   is opt-in (bits=0) and the bucketed clusters are recall-checked.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from graphriccicurvature_spark.functions.sinkhorn import (
    pad_problems,
    sinkhorn_cost,
    sinkhorn_cost_batch,
    size_buckets,
)


def _rand_problem(rng, m, n):
    a = rng.rand(m)
    a /= a.sum()
    b = rng.rand(n)
    b /= b.sum()
    M = rng.rand(m, n)
    return a, b, M


class TestSinkhornSizeBuckets:
    def test_values_identical_to_single_solves(self):
        rng = np.random.RandomState(11)
        xs, ys, ds = [], [], []
        for m, n in [(2, 3), (5, 5), (17, 9), (33, 64), (3, 3), (128, 2)]:
            a, b, M = _rand_problem(rng, m, n)
            xs.append(a)
            ys.append(b)
            ds.append(M)
        got = sinkhorn_cost_batch(xs, ys, ds)
        want = np.array([sinkhorn_cost(a, b, M) for a, b, M in zip(xs, ys, ds)])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_hub_problem_does_not_inflate_batch_memory(self):
        # VERDICT r2 done-criterion: one 2048-support problem mixed with 63
        # small ones; peak padded bytes across buckets <= ~2x the sum of
        # per-problem sizes (global-max padding would be ~64x the largest).
        rng = np.random.RandomState(7)
        xs, ys, ds = [], [], []
        a, b, M = _rand_problem(rng, 2048, 2048)
        xs.append(a)
        ys.append(b)
        ds.append(M)
        for _ in range(63):
            a, b, M = _rand_problem(rng, rng.randint(2, 9), rng.randint(2, 9))
            xs.append(a)
            ys.append(b)
            ds.append(M)
        real_bytes = sum(d.size * 8 for d in ds)
        buckets = size_buckets(xs, ys)
        padded_bytes = sum(
            len(idx) * m_cls * n_cls * 8 for (m_cls, n_cls), idx in buckets.items()
        )
        global_max_bytes = len(xs) * 2048 * 2048 * 8
        assert padded_bytes <= 2 * real_bytes
        assert padded_bytes < global_max_bytes / 30
        # indices round-trip: every problem lands in exactly one bucket
        flat = sorted(i for idx in buckets.values() for i in idx)
        assert flat == list(range(len(xs)))
        # and per-bucket padding actually produces the class shape
        for (m_cls, n_cls), idx in buckets.items():
            A, B, Ms = pad_problems(
                [xs[i] for i in idx], [ys[i] for i in idx], [ds[i] for i in idx]
            )
            assert Ms.shape[1] <= m_cls and Ms.shape[2] <= n_cls

    def test_mixed_batch_values_match_singles(self):
        rng = np.random.RandomState(3)
        xs, ys, ds = [], [], []
        sizes = [(2048, 7)] + [(rng.randint(2, 9), rng.randint(2, 9)) for _ in range(15)]
        for m, n in sizes:
            a, b, M = _rand_problem(rng, m, n)
            xs.append(a)
            ys.append(b)
            ds.append(M)
        got = sinkhorn_cost_batch(xs, ys, ds)
        want = np.array([sinkhorn_cost(a, b, M) for a, b, M in zip(xs, ys, ds)])
        np.testing.assert_allclose(got, want, atol=1e-12)


def _emb_df(spark, n, d, seed=5, n_dups=0):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, d)
    for i in range(n_dups):
        # planted near-dups: tiny perturbation of an earlier vector
        vecs[n - 1 - i] = vecs[i] + 0.01 * rng.randn(d)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        vecs,
    )


class TestHighDimANN:
    def test_ivf_highdim_udf_path_recall_and_plan_size(self, spark):
        from graphriccicurvature_spark.operators.similarity import (
            _LITERAL_MODEL_LIMIT,
            cosine_topk_bruteforce,
            cosine_topk_ivf,
        )

        n, d = 120, 768
        assert 16 * d > _LITERAL_MODEL_LIMIT  # this fixture takes the UDF path
        emb, _ = _emb_df(spark, n, d)
        qs = emb.filter(F.col("vec_id") < 3)
        approx = cosine_topk_ivf(emb, qs, k=5, n_centroids=16, nprobe=8)
        plan = approx._jdf.queryExecution().analyzed().toString()
        # the round-2 literal path embedded ~16x768 float literals per row
        assert len(plan) < 100_000, len(plan)
        want = {
            (r.query_id, r.vec_id) for r in cosine_topk_bruteforce(emb, qs, k=5).collect()
        }
        got = {(r.query_id, r.vec_id) for r in approx.collect()}
        assert len(want & got) / len(want) >= 0.5

    def test_ivf_literal_and_udf_paths_agree(self, spark, monkeypatch):
        # same fixture through both paths: identical candidate cells means
        # identical results (ties are measure-zero for gaussian vectors)
        import graphriccicurvature_spark.operators.similarity as sim

        emb, _ = _emb_df(spark, 80, 16, seed=9)
        qs = emb.filter(F.col("vec_id") < 3)
        lit = sim.cosine_topk_ivf(emb, qs, k=5, n_centroids=8, nprobe=4).collect()
        monkeypatch.setattr(sim, "_LITERAL_MODEL_LIMIT", 1)
        udf = sim.cosine_topk_ivf(emb, qs, k=5, n_centroids=8, nprobe=4).collect()
        assert {(r.query_id, r.vec_id, r.rank) for r in lit} == {
            (r.query_id, r.vec_id, r.rank) for r in udf
        }

    def test_ivf_sparse_ids_seed_full_centroid_set(self, spark):
        from graphriccicurvature_spark.operators.similarity import cosine_topk_ivf

        rng = np.random.RandomState(3)
        # offset, sparse id space: round 2 seeded via vec_id < n_centroids
        # and silently got ZERO centroids here
        rows = [(1000 + 7 * i, [float(x) for x in rng.randn(8)]) for i in range(50)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        qs = emb.limit(2)
        got = cosine_topk_ivf(emb, qs, k=3, n_centroids=4, nprobe=4).collect()
        assert len(got) > 0

    def test_ivf_empty_corpus_raises(self, spark):
        from graphriccicurvature_spark.operators.similarity import cosine_topk_ivf

        empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="no centroids"):
            cosine_topk_ivf(empty, empty, k=3)

    def test_lsh_requires_dim(self, spark):
        from graphriccicurvature_spark.operators.similarity import cosine_topk_lsh

        emb, _ = _emb_df(spark, 10, 8)
        with pytest.raises(ValueError, match="dim"):
            cosine_topk_lsh(emb, emb, k=3)

    def test_lsh_highdim_udf_path_matches_literal(self, spark, monkeypatch):
        import graphriccicurvature_spark.operators.similarity as sim

        emb, _ = _emb_df(spark, 60, 24, seed=13)
        qs = emb.filter(F.col("vec_id") < 3)
        lit = sim.cosine_topk_lsh(emb, qs, k=5, bits=4, tables=3, dim=24).collect()
        monkeypatch.setattr(sim, "_LITERAL_MODEL_LIMIT", 1)
        udf = sim.cosine_topk_lsh(emb, qs, k=5, bits=4, tables=3, dim=24).collect()
        # identical planes -> identical buckets -> identical candidates
        assert {(r.query_id, r.vec_id) for r in lit} == {
            (r.query_id, r.vec_id) for r in udf
        }


class TestEmbeddingDedupDefault:
    def test_bucketed_default_requires_dim(self, spark):
        from graphriccicurvature_spark.operators.dedup import embedding_dedup

        emb, _ = _emb_df(spark, 10, 8)
        with pytest.raises(ValueError, match="dim"):
            embedding_dedup(emb)

    def test_bucketed_default_recalls_exact_clusters(self, spark):
        from graphriccicurvature_spark.operators.dedup import embedding_dedup

        emb, _ = _emb_df(spark, 100, 32, seed=21, n_dups=12)
        exact = {
            (r.vec_id, r.cluster)
            for r in embedding_dedup(emb, threshold=0.95, bits=0).collect()
        }
        lsh = {
            (r.vec_id, r.cluster)
            for r in embedding_dedup(emb, threshold=0.95, dim=32).collect()
        }
        # every exact non-singleton pair is a near-identical vector
        # (cos >= 0.95): the 16-bit x 4-table LSH must recover most of them
        exact_clustered = {t for t in exact if t[0] != t[1]}
        lsh_clustered = {t for t in lsh if t[0] != t[1]}
        assert len(exact_clustered) >= 10  # the planted dups actually cluster
        recall = len(exact_clustered & lsh_clustered) / len(exact_clustered)
        assert recall >= 0.5, (recall, len(exact_clustered), len(lsh_clustered))
        # and the LSH path never invents pairs (verify is exact cosine)
        assert lsh_clustered <= exact_clustered


class TestMinhashChaining:
    def _doc_df(self, spark, texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )

    def test_mega_bucket_emits_sig_sorted_chain_pairs(self, spark):
        from graphriccicurvature_spark.operators.dedup import minhash_lsh_candidates

        # 12 identical docs, cap 4: every band bucket is a mega bucket.
        # Star-only (round 2) emitted only (0, j); the chain must now also
        # link consecutive members in signature order — identical texts have
        # identical signatures, so the run 1-2-...-11 stays connected via
        # pairs that pass the Jaccard verify (J=1), not just via doc 0.
        docs = self._doc_df(spark, ["the same boilerplate text again ok"] * 12)
        got = {
            (r.a, r.b)
            for r in minhash_lsh_candidates(docs, bucket_cap=4).collect()
        }
        star = {(0, j) for j in range(1, 12)}
        chain = {(i, i + 1) for i in range(11)}
        assert star <= got
        assert chain <= got
        # O(B) bound holds: star + chain only, no quadratic blowup
        assert len(got) < 3 * 12

    def test_under_cap_bucket_pairs_unchanged(self, spark):
        from graphriccicurvature_spark.operators.dedup import minhash_lsh_candidates

        docs = self._doc_df(spark, ["alpha beta gamma delta words here"] * 5)
        got = {
            (r.a, r.b)
            for r in minhash_lsh_candidates(docs, bucket_cap=64).collect()
        }
        assert got == {(i, j) for i in range(5) for j in range(i + 1, 5)}

    def test_minhash_dedup_clusters_identical_docs(self, spark):
        from graphriccicurvature_spark.operators.dedup import minhash_dedup

        texts = ["one two three four five six seven eight"] * 6 + [
            "totally different content nine ten eleven twelve"
        ] * 3
        got = {
            r.doc_id: r.cluster for r in minhash_dedup(self._doc_df(spark, texts)).collect()
        }
        assert {got[i] for i in range(6)} == {0}
        assert {got[i] for i in range(6, 9)} == {6}


class TestShingleHashQuality:
    def test_order_sensitive_and_distinct(self, spark):
        from graphriccicurvature_spark.operators.textstats import shingle_hashes

        df = spark.createDataFrame(
            [(0, "a b c"), (1, "c b a"), (2, "a b d"), (3, "b a c")],
            "doc_id long, text string",
        )
        rows = df.select("doc_id", shingle_hashes(F.col("text"), 3).alias("h")).collect()
        hashes = {r.doc_id: tuple(r.h) for r in rows}
        assert all(len(v) == 1 for v in hashes.values())
        # 4 distinct shingles -> 4 distinct 64-bit rotation-XOR hashes
        assert len({v[0] for v in hashes.values()}) == 4

    def test_repeated_token_shingles_distinct(self, spark):
        from graphriccicurvature_spark.operators.textstats import shingle_hashes

        df = spark.createDataFrame(
            [(0, "x x y"), (1, "x y x"), (2, "y x x")], "doc_id long, text string"
        )
        rows = df.select(shingle_hashes(F.col("text"), 3).alias("h")).collect()
        assert len({tuple(r.h)[0] for r in rows}) == 3


def _tree_cycle_graph():
    """Fixture where 2-hop ego blocks contain every relevant shortest path
    (tree paths route through s-t; the 12-cycle's far side is never
    shorter), so ego == component EXACTLY — the right graph for flow-loop
    parity (karate has shortcut edges with a known bounded ego gap)."""
    import networkx as nx

    G = nx.balanced_tree(2, 4)
    base = 31
    G.add_edges_from((base + i, base + (i + 1) % 12) for i in range(12))
    G.add_edge(30, base)
    return G


class TestEgoFlowEndToEnd:
    def test_ego_flow_matches_component_flow(self, spark):
        """VERDICT r2 item 2: the flow loop iterating over EGO-mode
        curvature (the actual 100 TB configuration) must reproduce the
        component-mode flow weights on an ego-exact fixture."""
        from graphriccicurvature_spark.operators.flow import ricci_flow
        from graphriccicurvature_spark.sources.edges import make_edges

        G = _tree_cycle_graph()
        edges = make_edges(spark, list(G.edges()))
        comp = ricci_flow(edges, iterations=3, method="OTD", alpha=0.5, mode="component")
        ego = ricci_flow(edges, iterations=3, method="OTD", alpha=0.5, mode="ego")
        wc = {(r.src, r.dst): r.weight for r in comp.collect()}
        we = {(r.src, r.dst): r.weight for r in ego.collect()}
        assert set(wc) == set(we)
        assert all(abs(wc[e] - we[e]) < 1e-6 for e in wc), max(
            abs(wc[e] - we[e]) for e in wc
        )
        kc = {(r.src, r.dst): r.ricci_curvature for r in comp.collect()}
        ke = {(r.src, r.dst): r.ricci_curvature for r in ego.collect()}
        assert all(abs(kc[e] - ke[e]) < 1e-6 for e in kc)

    def test_ego_flow_karate_invariants(self, spark):
        """On karate (ego approximates distances) the ego flow must still
        keep the flow invariants: sum(weight) == |E| after renorm, finite
        weights, original_rc preserved from the first pass."""
        import networkx as nx

        from graphriccicurvature_spark.operators.flow import ricci_flow
        from graphriccicurvature_spark.sources.edges import make_edges

        G = nx.karate_club_graph()
        edges = make_edges(spark, list(G.edges()))
        out = ricci_flow(edges, iterations=2, method="OTD", alpha=0.5, mode="ego").cache()
        rows = out.collect()
        assert len(rows) == G.number_of_edges()
        s = sum(r.weight for r in rows)
        assert all(np.isfinite(r.weight) and r.weight > 0 for r in rows)
        # each round's update renormalizes to sum(w) == |E| in-expression
        assert abs(s - G.number_of_edges()) / G.number_of_edges() < 1e-6
        assert all(np.isfinite(r.original_rc) for r in rows)
        out.unpersist()


def _mix_hub_graph(n_leaves=2050):
    """Two hubs sharing n_leaves leaves, hub-hub edge last. Both endpoints
    of the hub-hub edge have support > 2000 at the DEFAULT nbr_topk, so
    OTDSinkhornMix dispatches that edge to Sinkhorn organically (reference
    OllivierRicci.py:48,334-341) — no threshold override. Leaves get the
    low ids so Floyd-Warshall's dik==inf row-skip keeps the APSP cheap."""
    h1, h2 = n_leaves, n_leaves + 1
    pairs = [(leaf, h1) for leaf in range(n_leaves)]
    pairs += [(leaf, h2) for leaf in range(n_leaves)]
    pairs.append((h1, h2))
    return pairs, h1, h2


class TestOrganicMixDispatch:
    def test_kernel_dispatches_hub_edge_to_sinkhorn(self, monkeypatch):
        """White-box (no Spark): at DEFAULT threshold the hub-hub edge goes
        through the batched Sinkhorn kernel, leaf edges through exact OT."""
        import graphriccicurvature_spark.functions.localgraph as lg

        pairs, h1, h2 = _mix_hub_graph()
        src = np.array([p[0] for p in pairs], dtype=np.int64)
        dst = np.array([p[1] for p in pairs], dtype=np.int64)
        w = np.ones(len(pairs))

        sk_calls = []
        real_sk = lg.sinkhorn_cost_batch

        def spy(xs, ys, ds, **kw):
            sk_calls.append([(len(x), len(y)) for x, y in zip(xs, ys)])
            return real_sk(xs, ys, ds, **kw)

        monkeypatch.setattr(lg, "sinkhorn_cost_batch", spy)
        # evaluate the hub-hub edge plus two leaf edges in one block
        ev_src = np.array([h1, 0, 1], dtype=np.int64)
        ev_dst = np.array([h2, h1, h2], dtype=np.int64)
        k = lg.component_curvature(src, dst, w, ev_src, ev_dst)
        assert len(sk_calls) == 1  # one deferred batched call
        assert sk_calls[0] == [(2052, 2052)]  # ONLY the hub-hub edge
        assert np.isfinite(k).all()
        # leaf edges took the exact-OT path and have hub-star curvature
        assert abs(k[1] - k[2]) < 1e-9

    def test_ego_mode_mix_equals_forced_sinkhorn_end_to_end(self, spark):
        """End-to-end at default settings: Mix == forced-Sinkhorn on the
        hub-hub edge (the >2000-support branch fires in the Arrow kernel;
        had it gone to exact OT the values would differ and the 2051x2051
        network simplex would dominate the wall clock)."""
        from graphriccicurvature_spark.operators.ollivier import ricci_curvature_edges
        from graphriccicurvature_spark.sources.edges import make_edges

        pairs, h1, h2 = _mix_hub_graph()
        edges = make_edges(spark, pairs)
        el = spark.createDataFrame([(h1, h2)], "src long, dst long")
        mix = ricci_curvature_edges(
            edges, method="OTDSinkhornMix", mode="ego", edge_list=el
        ).collect()
        forced = ricci_curvature_edges(
            edges, method="Sinkhorn", mode="ego", edge_list=el
        ).collect()
        assert len(mix) == 1 and len(forced) == 1
        assert np.isfinite(mix[0].ricci_curvature)
        assert abs(mix[0].ricci_curvature - forced[0].ricci_curvature) < 1e-12


class TestCheckAccuracyTable:
    def test_matches_from_scratch_modularity_and_ari(self, spark):
        """SURVEY O19 data semantics (reference my_surgery.py:95-161): the
        fused (cutoff, modularity, ari) sweep table must equal per-cutoff
        from-scratch CC + modularity + pair-counting ARI."""
        import networkx as nx

        from graphriccicurvature_spark.operators.community import (
            check_accuracy_table,
            cut_graph_by_cutoff,
            modularity,
        )
        from graphriccicurvature_spark.operators.components import connected_components
        from graphriccicurvature_spark.operators.flow import ricci_flow
        from graphriccicurvature_spark.operators.surgery import adjusted_rand_index
        from graphriccicurvature_spark.sources.edges import make_edges

        G = nx.karate_club_graph()
        gt_map = {n: G.nodes[n]["club"] for n in G.nodes()}
        gt = spark.createDataFrame(list(gt_map.items()), "node long, label string")
        flowed = ricci_flow(
            make_edges(spark, list(G.edges())), iterations=3, method="OTD", alpha=0.5
        ).cache()
        table = {
            round(r.cutoff, 9): (r.modularity, r.ari)
            for r in check_accuracy_table(flowed, gt).collect()
        }
        assert len(table) > 10
        # spot-check three cutoffs (largest, middle, smallest) from scratch
        cuts = sorted(table)
        all_nodes = gt.select("node")
        for cut in (cuts[0], cuts[len(cuts) // 2], cuts[-1]):
            sub = cut_graph_by_cutoff(flowed, cut)
            part = connected_components(sub, vertices=all_nodes)
            want_q = modularity(sub, part)
            pred = {r.node: r.component for r in part.collect()}
            want_ari = adjusted_rand_index(gt_map, pred)
            got_q, got_ari = table[round(cut, 9)]
            assert abs(got_q - want_q) < 1e-9, cut
            assert abs(got_ari - want_ari) < 1e-9, cut
        flowed.unpersist()
