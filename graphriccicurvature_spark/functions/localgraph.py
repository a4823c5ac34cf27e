"""Dense local-graph numpy kernels used inside Arrow-batched UDFs.

These reproduce the reference's per-edge math exactly (see file:line
citations inline, all into /root/reference/GraphRicciCurvature/), but operate
on *gathered* graph blocks — a whole connected component (parity mode) or a
per-edge 2-hop ego net (scale mode) — instead of a process-global NetworKit
graph (reference OllivierRicci.py:38,429).
"""

from __future__ import annotations

import math

import numpy as np

from .emd import emd_exact
from .sinkhorn import sinkhorn_cost_batch

try:  # C fast path (compiled at import; exact same algorithm — see emd_native)
    from . import emd_native as _native

    _NATIVE = _native.available()
except Exception:  # pragma: no cover
    _native = None
    _NATIVE = False

EPSILON = 1e-7  # matches reference OllivierRicci.py:35
OTD_SINKHORN_THRESHOLD = 2000  # reference OllivierRicci.py:48


def apsp(W: np.ndarray) -> np.ndarray:
    """All-pairs shortest paths (native C when available)."""
    if _NATIVE:
        return _native.floyd_warshall_native(W)
    return floyd_warshall(W)


def solve_emd_batch(xs: list, ys: list, ds: list) -> np.ndarray:
    """Batch of exact EMD solves — one native call per Arrow batch."""
    if not xs:
        return np.empty(0)
    if _NATIVE:
        return _native.emd_batch_native(xs, ys, ds)
    return np.array([emd_exact(x, y, d) for x, y, d in zip(xs, ys, ds)])


def floyd_warshall(W: np.ndarray) -> np.ndarray:
    """All-pairs shortest paths on a dense weight matrix (inf = no edge).

    Replaces NetworKit APSP (reference OllivierRicci.py:198). Vectorized
    row-broadcast updates; O(n^3) but n is a gathered block, never the graph.
    """
    D = W.astype(np.float64, copy=True)
    n = D.shape[0]
    idx = np.arange(n)
    D[idx, idx] = 0.0
    for k in range(n):
        np.minimum(D, D[:, k : k + 1] + D[k : k + 1, :], out=D)
    return D


def _top_k_transformed(nbrs: np.ndarray, w_e: np.ndarray, base: float, exp_power: float, topk: int):
    """Transformed neighbor weights w = base^(-w_e^exp_power), top-k kept.

    Mirrors the bounded heap at reference OllivierRicci.py:85-92: the heap
    retains the k largest (w, nbr) tuples, i.e. ties broken toward larger
    node index.
    """
    t = np.power(base, -np.power(w_e, exp_power))
    if len(t) > topk:
        order = np.lexsort((nbrs, t))[::-1][:topk]  # sort by (t, nbr) desc
        return nbrs[order], t[order]
    return nbrs, t


def node_distribution(
    node: int,
    nbrs: np.ndarray,
    w_e: np.ndarray,
    alpha: float,
    base: float,
    exp_power: float,
    topk: int,
):
    """Neighbor mass distribution of one node (reference OllivierRicci.py:54-109).

    Returns (masses, support) with the alpha self-mass appended last; an
    isolated node keeps all mass on itself (reference :96-98).
    """
    if len(nbrs) == 0:
        return np.array([1.0]), np.array([node], dtype=np.int64)
    nbrs, t = _top_k_transformed(nbrs, w_e, base, exp_power, topk)
    s = t.sum()
    if s > EPSILON:
        dist = (1.0 - alpha) * t / s
    else:  # evenly distribute (reference :103-106)
        dist = np.full(len(t), (1.0 - alpha) / len(t))
    return (
        np.concatenate([dist, [alpha]]),
        np.concatenate([nbrs, [node]]).astype(np.int64),
    )


def component_curvature(
    g_src: np.ndarray,
    g_dst: np.ndarray,
    g_w: np.ndarray,
    eval_src: np.ndarray,
    eval_dst: np.ndarray,
    *,
    directed: bool = False,
    alpha: float = 0.5,
    method: str = "OTDSinkhornMix",
    base: float = math.e,
    exp_power: float = 2.0,
    nbr_topk: int = 3000,
    sinkhorn_reg: float = 1e-1,
    otd_sinkhorn_threshold: int = OTD_SINKHORN_THRESHOLD,
) -> np.ndarray:
    """Ollivier-Ricci curvature for ``eval`` edges within one gathered block.

    ``(g_src, g_dst, g_w)`` is the complete edge set of the block (one row
    per directed arc; undirected graphs must be passed canonically, they are
    symmetrized here). Distances are exact all-pairs within the block, so on
    a full connected component this reproduces the reference's global-APSP
    numbers (OllivierRicci.py:157-158) bit-for-bit.
    """
    assert method in ("OTD", "ATD", "Sinkhorn", "OTDSinkhornMix"), method
    nodes = np.unique(np.concatenate([g_src, g_dst, eval_src, eval_dst]))
    n = len(nodes)
    lut = {int(v): i for i, v in enumerate(nodes)}
    si = np.fromiter((lut[int(v)] for v in g_src), dtype=np.int64, count=len(g_src))
    di = np.fromiter((lut[int(v)] for v in g_dst), dtype=np.int64, count=len(g_dst))
    W = np.full((n, n), np.inf)
    W[si, di] = g_w
    if not directed:
        W[di, si] = g_w
    D = apsp(W)

    finite = np.isfinite(W)
    out_nbrs = [np.nonzero(finite[i])[0] for i in range(n)]
    in_nbrs = out_nbrs if not directed else [np.nonzero(finite[:, i])[0] for i in range(n)]

    dist_cache: dict[tuple[int, str], tuple[np.ndarray, np.ndarray]] = {}

    def dist_of(i: int, direction: str):
        key = (i, direction)
        got = dist_cache.get(key)
        if got is None:
            if direction == "predecessors":
                nb = in_nbrs[i]
                w_e = W[nb, i]  # weight(nbr -> node), reference :85
            else:
                nb = out_nbrs[i]
                w_e = W[i, nb]  # weight(node -> nbr), reference :87
            got = node_distribution(i, nb, w_e, alpha, base, exp_power, nbr_topk)
            dist_cache[key] = got
        return got

    kappas = np.zeros(len(eval_src), dtype=np.float64)
    emd_idx: list[int] = []
    emd_x: list[np.ndarray] = []
    emd_y: list[np.ndarray] = []
    emd_d: list[np.ndarray] = []
    sk_idx: list[int] = []
    sk_x: list[np.ndarray] = []
    sk_y: list[np.ndarray] = []
    sk_d: list[np.ndarray] = []
    for e in range(len(eval_src)):
        s = lut[int(eval_src[e])]
        t = lut[int(eval_dst[e])]
        assert s != t, "Self loop is not allowed."  # reference :314
        w_st = W[s, t]
        if w_st < EPSILON:  # zero-weight edge -> 0 (reference :316-320)
            kappas[e] = 0.0
            continue
        if method == "ATD":
            # reference :257-294 — all neighbors, untransformed, global dists.
            # An empty neighbor set (directed source with no predecessors)
            # raises ZeroDivisionError in the reference (:281); we define it
            # as the node itself, consistent with node_distribution's
            # isolated-node self-mass (:96-98).
            s_nb = in_nbrs[s] if directed else out_nbrs[s]
            t_nb = out_nbrs[t]
            if len(s_nb) == 0:
                s_nb = np.array([s])
            if len(t_nb) == 0:
                t_nb = np.array([t])
            share = (1.0 - alpha) / (len(s_nb) * len(t_nb))
            m = alpha * D[s, t] + share * D[np.ix_(s_nb, t_nb)].sum()
            kappas[e] = 1.0 - m / w_st  # reference :344
        else:
            x, xs = dist_of(s, "predecessors" if directed else "successors")
            y, ys = dist_of(t, "successors")
            d = D[np.ix_(xs, ys)]
            if method == "Sinkhorn" or (
                method == "OTDSinkhornMix"
                and len(x) > otd_sinkhorn_threshold
                and len(y) > otd_sinkhorn_threshold
            ):  # deferred: batched Sinkhorn per record batch (north star)
                sk_idx.append(e)
                sk_x.append(x)
                sk_y.append(y)
                sk_d.append(d)
            else:  # deferred: all exact-OT solves go out in one batched call
                emd_idx.append(e)
                emd_x.append(x)
                emd_y.append(y)
                emd_d.append(d)

    def w_of(idx: np.ndarray) -> np.ndarray:
        return np.array(
            [W[lut[int(eval_src[e])], lut[int(eval_dst[e])]] for e in idx]
        )

    if emd_idx:
        ms = solve_emd_batch(emd_x, emd_y, emd_d)
        idx = np.asarray(emd_idx, dtype=np.int64)
        kappas[idx] = 1.0 - ms / w_of(idx)
    if sk_idx:
        ms = sinkhorn_cost_batch(sk_x, sk_y, sk_d, reg=sinkhorn_reg)
        idx = np.asarray(sk_idx, dtype=np.int64)
        kappas[idx] = 1.0 - ms / w_of(idx)
    return kappas
