"""Entropic-regularized optimal transport (Sinkhorn-Knopp) in numpy.

The reference calls ``ot.sinkhorn2(x, y, d, 1e-1, method='sinkhorn')``
(reference/GraphRicciCurvature/OllivierRicci.py:250). POT is not available
in this environment, so ``sinkhorn_cost`` is a literal transcription of
POT's ``sinkhorn_knopp`` (ot/bregman/_sinkhorn.py) algebra:

- ``K = exp(-M / reg)``, ``Kp = (1/a)[:, None] * K``
- iterate ``v = b / (K.T @ u)``; ``u = 1 / (Kp @ v)``
- on non-finite u/v or a zero column of K.T u, fall back to the previous
  iterate and stop (POT's numerical-errors branch)
- every 10 iterations POT checks the violation of the *b* marginal:
  ``err = || einsum('i,ij,j->j', u, K, v) - b ||_2 < stopThr``
- defaults ``numItermax=1000``, ``stopThr=1e-9``
- returns ``sum(u_i K_ij v_j M_ij)`` (what ``sinkhorn2`` returns)

``sinkhorn_batch`` vectorizes the same fixed point across a whole Arrow
record batch of zero-padded problems — the "Sinkhorn solves run batched per
Arrow record batch" requirement of the north star. Agreement between the
two (same iterate trajectory modulo summation order) is pinned in
tests/test_kernels.py.
"""

from __future__ import annotations

import numpy as np


def sinkhorn_cost(
    a: np.ndarray,
    b: np.ndarray,
    M: np.ndarray,
    reg: float = 1e-1,
    num_iter_max: int = 1000,
    stop_thr: float = 1e-9,
) -> float:
    """Sinkhorn transport cost for a single problem (POT ``sinkhorn2``)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    M = np.asarray(M, dtype=np.float64)
    dim_a = len(a)
    dim_b = len(b)
    # POT sinkhorn_knopp: u, v start uniform; Kp = (1/a) * K row-scaled
    u = np.full(dim_a, 1.0 / dim_a)
    v = np.full(dim_b, 1.0 / dim_b)
    K = np.exp(M / (-reg))
    Kp = (1.0 / a).reshape(-1, 1) * K
    err = 1.0
    for ii in range(num_iter_max):
        uprev = u
        vprev = v
        KtransposeU = K.T @ u
        v = b / KtransposeU
        u = 1.0 / (Kp @ v)
        if (
            np.any(KtransposeU == 0)
            or np.any(np.isnan(u))
            or np.any(np.isnan(v))
            or np.any(np.isinf(u))
            or np.any(np.isinf(v))
        ):
            # numerical errors: revert to last stable iterate (POT behavior)
            u = uprev
            v = vprev
            break
        if ii % 10 == 0:
            # violation of the *b* marginal (POT checks tmp2 - b)
            tmp2 = np.einsum("i,ij,j->j", u, K, v)
            err = np.linalg.norm(tmp2 - b)
            if err < stop_thr:
                break
    return float(np.einsum("i,ij,j,ij->", u, K, v, M))


def pad_problems(xs: list, ys: list, ds: list):
    """Stack variable-size OT problems into zero-padded (A, B, Ms) arrays.

    Padded mass entries are 0 and padded cost entries are 0; the batch
    kernel masks K on zero-mass rows/columns so pads never receive or emit
    mass regardless of their cost.
    """
    nb = len(xs)
    m = max(len(x) for x in xs)
    n = max(len(y) for y in ys)
    A = np.zeros((nb, m))
    B = np.zeros((nb, n))
    Ms = np.zeros((nb, m, n))
    for i, (x, y, d) in enumerate(zip(xs, ys, ds)):
        A[i, : len(x)] = x
        B[i, : len(y)] = y
        Ms[i, : len(x), : len(y)] = d
    return A, B, Ms


def _pow2_class(n: int) -> int:
    """Smallest power of two >= n (the padding size class)."""
    return 1 << max(int(n) - 1, 0).bit_length()


def size_buckets(xs: list, ys: list) -> dict:
    """Group problem indices by (pow2(|x|), pow2(|y|)) padding class.

    Padding within a class wastes at most 4x (2x per side) of the real
    problem area, so one giant-support hub problem in an otherwise-small
    Arrow batch no longer inflates every problem's padded cost matrix to
    max_m x max_n (the round-2 global-max padding scale hazard)."""
    buckets: dict[tuple[int, int], list[int]] = {}
    for i, (x, y) in enumerate(zip(xs, ys)):
        buckets.setdefault((_pow2_class(len(x)), _pow2_class(len(y))), []).append(i)
    return buckets


def sinkhorn_cost_batch(
    xs: list, ys: list, ds: list, reg: float = 1e-1,
    num_iter_max: int = 1000, stop_thr: float = 1e-9,
) -> np.ndarray:
    """Solve a list of independent Sinkhorn problems, padded per size class.

    Problems are bucketed by power-of-two support-size class and each bucket
    is padded/solved independently (:func:`size_buckets`): per-problem
    values are identical to a single global-max-padded batch (problems are
    independent in :func:`sinkhorn_batch`), but peak padded memory is
    bounded by ~4x the sum of real problem sizes instead of
    nb x max_m x max_n."""
    if not xs:
        return np.empty(0)
    out = np.empty(len(xs))
    for idx in size_buckets(xs, ys).values():
        A, B, Ms = pad_problems([xs[i] for i in idx], [ys[i] for i in idx], [ds[i] for i in idx])
        out[np.asarray(idx)] = sinkhorn_batch(
            A, B, Ms, reg=reg, num_iter_max=num_iter_max, stop_thr=stop_thr
        )
    return out


def sinkhorn_batch(
    A: np.ndarray,
    B: np.ndarray,
    Ms: np.ndarray,
    reg: float = 1e-1,
    num_iter_max: int = 1000,
    stop_thr: float = 1e-9,
) -> np.ndarray:
    """Batched Sinkhorn over stacked, zero-padded problems.

    Parameters
    ----------
    A : (B, m) masses, zero-padded; B : (B, n); Ms : (B, m, n) costs.

    Same fixed point and stopping semantics as :func:`sinkhorn_cost` (POT's
    ``sinkhorn_knopp``), vectorized across the batch dimension with
    per-problem active flags: each problem freezes independently when its
    b-marginal violation drops under ``stop_thr`` or it hits a numerical
    error (reverting to its previous iterate, as POT does).
    """
    A = np.asarray(A, dtype=np.float64)
    B_ = np.asarray(B, dtype=np.float64)
    Ms = np.asarray(Ms, dtype=np.float64)
    nb, m = A.shape
    n = B_.shape[1]
    K = np.exp(Ms / (-reg))
    maskA = A > 0
    maskB = B_ > 0
    # zero out padded rows/cols of K so pads never receive/emit mass
    K = K * maskA[:, :, None] * maskB[:, None, :]
    # POT init is uniform over the *problem* size: 1/dim_a over real entries
    dim_a = np.maximum(maskA.sum(axis=1, keepdims=True), 1)
    dim_b = np.maximum(maskB.sum(axis=1, keepdims=True), 1)
    u = np.where(maskA, 1.0 / dim_a, 0.0)
    v = np.where(maskB, 1.0 / dim_b, 0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        invA = np.where(maskA, 1.0 / A, 0.0)
    active = np.ones(nb, dtype=bool)
    for ii in range(num_iter_max):
        if not active.any():
            break
        KtU = np.einsum("bij,bi->bj", K, u)
        with np.errstate(divide="ignore", invalid="ignore"):
            v_new = np.where(maskB, B_ / KtU, 0.0)
            # u = 1 / (Kp @ v) with Kp = (1/a) * K  (POT's exact update form)
            Kv = np.einsum("bij,bj->bi", K * invA[:, :, None], v_new)
            u_new = np.where(maskA, 1.0 / Kv, 0.0)
        bad = (
            np.any((KtU == 0) & maskB, axis=1)
            | np.any(~np.isfinite(v_new) & maskB, axis=1)
            | np.any(~np.isfinite(u_new) & maskA, axis=1)
        )
        keep = active & ~bad
        u = np.where(keep[:, None], u_new, u)
        v = np.where(keep[:, None], v_new, v)
        active = keep
        if ii % 10 == 0:
            tmp2 = np.einsum("bi,bij,bj->bj", u, K, v)
            err = np.linalg.norm(tmp2 - B_, axis=1)
            active = active & (err >= stop_thr)
    return np.einsum("bi,bij,bj,bij->b", u, K, v, Ms)
