"""Regression tests for the round-3 judge/advisor findings (VERDICT.md r2).

1. Sinkhorn size-class bucketing: one hub-size problem in an Arrow batch of
   small ones no longer inflates every padded cost matrix to max_m x max_n.
"""

import numpy as np
import pytest

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
