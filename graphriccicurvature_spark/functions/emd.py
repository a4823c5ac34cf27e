"""Exact optimal-transport (Wasserstein-1 / EMD) solver in pure numpy.

The reference delegates to ``ot.emd2`` (POT network simplex,
reference/GraphRicciCurvature/OllivierRicci.py:224). POT is not available in
this environment, so we solve the transportation LP exactly ourselves with
successive shortest augmenting paths (min-cost flow with potentials). The
optimal *value* of the LP is unique, so results agree with ``ot.emd2`` up to
float rounding — verified against integer-scaled ``networkx.network_simplex``
in tests/test_kernels.py and against the reference's golden curvature values.

Problem sizes here are small by construction: supports are capped at
``nbr_topk`` + 1 per side (reference OllivierRicci.py:89-92), so a dense
O((m+n)^2)-per-phase Dijkstra is plenty. The solver is called per edge inside
Arrow-batched UDFs; all inner loops are numpy-vectorized over the dense
bipartite cost matrix.
"""

from __future__ import annotations

import numpy as np

_TOL = 1e-12


def emd_exact(a: np.ndarray, b: np.ndarray, M: np.ndarray) -> float:
    """Exact optimal transportation cost between histograms ``a`` and ``b``.

    Parameters
    ----------
    a : (m,) float64 — source masses (nonnegative, sum ~ sum(b)).
    b : (n,) float64 — target masses.
    M : (m, n) float64 — nonnegative cost matrix.

    Returns
    -------
    float — minimal total transport cost ``sum(f * M)``.
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    M = np.asarray(M, dtype=np.float64)
    m, n = M.shape
    if m == 0 or n == 0:
        return 0.0
    # Trivial fast paths ------------------------------------------------
    if m == 1:
        return float(np.dot(b, M[0]))
    if n == 1:
        return float(np.dot(a, M[:, 0]))

    sup = a.copy()
    dem = b.copy()
    total = min(sup.sum(), dem.sum())
    f = np.zeros((m, n))
    phi = np.zeros(m)  # left potentials
    psi = np.zeros(n)  # right potentials
    moved = 0.0
    max_phases = 8 * (m + n) + 64

    for _ in range(max_phases):
        if total - moved <= _TOL * max(1.0, total):
            break
        # --- multi-source Dijkstra over the bipartite residual graph ---
        dL = np.where(sup > _TOL, 0.0, np.inf)
        dR = np.full(n, np.inf)
        visL = np.zeros(m, dtype=bool)
        visR = np.zeros(n, dtype=bool)
        parR = np.full(n, -1, dtype=np.int64)  # right node j came from left parR[j]
        parL = np.full(m, -1, dtype=np.int64)  # left node i came from right parL[i]
        # reduced costs (>= 0 by invariant; clamp float noise)
        C = M - phi[:, None] - psi[None, :]
        np.maximum(C, 0.0, out=C)
        jstar = -1
        while True:
            iL = int(np.argmin(np.where(visL, np.inf, dL)))
            vL = dL[iL] if not visL[iL] else np.inf
            jR = int(np.argmin(np.where(visR, np.inf, dR)))
            vR = dR[jR] if not visR[jR] else np.inf
            if vL == np.inf and vR == np.inf:
                break
            if vR <= vL:
                # settle right node jR; stop if it still needs mass
                visR[jR] = True
                if dem[jR] > _TOL:
                    jstar = jR
                    break
                # relax backward arcs j -> i where f[i, j] > 0 (reduced cost 0)
                cand = (f[:, jR] > _TOL) & ~visL
                nd = vR  # + 0 backward reduced cost
                upd = cand & (nd < dL)
                if upd.any():
                    dL[upd] = nd
                    parL[upd] = jR
            else:
                visL[iL] = True
                nd = vL + C[iL]
                upd = ~visR & (nd < dR)
                if upd.any():
                    dR[upd] = nd[upd]
                    parR[upd] = iL
        if jstar < 0:
            break  # disconnected residual (shouldn't happen for finite M)
        D = dR[jstar]
        # --- potential update (Johnson), clamped at D -------------------
        # phi' = phi - min(dL, D); psi' = psi + min(dR, D) keeps reduced
        # costs >= 0 everywhere and == 0 on arcs carrying flow.
        phi -= np.minimum(dL, D)
        psi += np.minimum(dR, D)
        # --- trace augmenting path & find bottleneck --------------------
        path = []  # list of (i, j, forward?)
        j = jstar
        amt = dem[j]
        while True:
            i = int(parR[j])
            path.append((i, j, True))
            prev_j = int(parL[i])
            if prev_j == -1:
                src_i = i
                break
            amt = min(amt, f[i, prev_j])
            path.append((i, prev_j, False))
            j = prev_j
        amt = min(amt, sup[src_i])
        if amt <= _TOL:
            break
        for i, j, fwd in path:
            if fwd:
                f[i, j] += amt
            else:
                f[i, j] -= amt
        sup[src_i] -= amt
        dem[jstar] -= amt
        moved += amt

    if total - moved > 1e-9 * max(1.0, total):
        # Residual disconnected (e.g. inf costs): the transport problem is
        # infeasible. Surface it instead of returning a plausible-looking
        # partial-flow cost — mirrors ot.emd2's infeasibility warning.
        return float("inf")
    return float((f * M).sum())


def emd_batch(xs: list[np.ndarray], ys: list[np.ndarray], ds: list[np.ndarray]) -> np.ndarray:
    """Solve a batch of independent EMD problems (one Arrow record batch)."""
    return np.array([emd_exact(x, y, d) for x, y, d in zip(xs, ys, ds)], dtype=np.float64)
