"""Entropic-regularized optimal transport (Sinkhorn-Knopp) in numpy.

The reference calls ``ot.sinkhorn2(x, y, d, 1e-1, method='sinkhorn')``
(reference/GraphRicciCurvature/OllivierRicci.py:250). This is the classic
Sinkhorn-Knopp fixed point with POT's defaults: ``numItermax=1000``,
``stopThr=1e-9`` on the marginal violation, returning ``<T, M>`` for the
final plan ``T = diag(u) K diag(v)`` with ``K = exp(-M / reg)``.

``sinkhorn_batch`` vectorizes the iteration across a whole Arrow record
batch of (padded) problems — the "Sinkhorn solves run batched per Arrow
record batch" requirement of the north star.
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
    """Sinkhorn transport cost for a single problem (POT-compatible)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    M = np.asarray(M, dtype=np.float64)
    K = np.exp(-M / reg)
    u = np.full(len(a), 1.0 / len(a))
    v = np.full(len(b), 1.0 / len(b))
    for ii in range(num_iter_max):
        uprev, vprev = u, v
        KtU = K.T @ u
        v = b / KtU
        u = a / (K @ v)
        if (
            np.any(KtU == 0)
            or np.any(np.isnan(u))
            or np.any(np.isnan(v))
            or np.any(np.isinf(u))
            or np.any(np.isinf(v))
        ):
            u, v = uprev, vprev
            break
        if ii % 10 == 0:
            tmp = u * (K @ v)
            err = np.linalg.norm(tmp - a)
            if err < stop_thr:
                break
    return float(np.einsum("i,ij,j,ij->", u, K, v, M))


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
    A : (B, m) masses, zero-padded; B : (B, n); Ms : (B, m, n) costs (pad
    entries get a large cost so K ~ 0 there; padded masses are 0 so the
    fixed point ignores them).
    """
    A = np.asarray(A, dtype=np.float64)
    B_ = np.asarray(B, dtype=np.float64)
    Ms = np.asarray(Ms, dtype=np.float64)
    nb, m = A.shape
    n = B_.shape[1]
    K = np.exp(-Ms / reg)
    maskA = A > 0
    maskB = B_ > 0
    # zero out padded rows/cols of K so they never receive/emit mass
    K = K * maskA[:, :, None] * maskB[:, None, :]
    u = np.where(maskA, 1.0 / np.maximum(maskA.sum(axis=1, keepdims=True), 1), 0.0)
    v = np.where(maskB, 1.0 / np.maximum(maskB.sum(axis=1, keepdims=True), 1), 0.0)
    active = np.ones(nb, dtype=bool)
    for ii in range(num_iter_max):
        if not active.any():
            break
        KtU = np.einsum("bij,bi->bj", K, u)
        with np.errstate(divide="ignore", invalid="ignore"):
            v_new = np.where(maskB, B_ / KtU, 0.0)
            Kv = np.einsum("bij,bj->bi", K, v_new)
            u_new = np.where(maskA, A / Kv, 0.0)
        bad = (
            np.any(~np.isfinite(v_new) & maskB, axis=1)
            | np.any(~np.isfinite(u_new) & maskA, axis=1)
        )
        keep = active & ~bad
        u = np.where(keep[:, None], u_new, u)
        v = np.where(keep[:, None], v_new, v)
        active = keep
        if ii % 10 == 0:
            tmp = u * np.einsum("bij,bj->bi", K, v)
            err = np.linalg.norm(tmp - A, axis=1)
            active = active & (err >= stop_thr)
    return np.einsum("bi,bij,bj,bij->b", u, K, v, Ms)
