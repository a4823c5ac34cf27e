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
