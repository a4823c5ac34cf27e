"""Surgery + evaluation utilities (reference my_surgery.py).

Surgery is the user-pluggable hook executed every k Ricci-flow rounds
(reference OllivierRicci.py:542-544,604-608); the canonical implementation
removes edges whose flow metric exceeds a cut (my_surgery.py:54-92, default
cut = (max(w) - 1) * 0.6 + 1). ARI (my_surgery.py:8-51, via sklearn there)
is reimplemented in closed form from the pair-counting contingency table —
sklearn is not available in this environment.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def default_cut(edges: DataFrame, weight_col: str = "weight") -> float:
    """cut = (max(w) - 1) * 0.6 + 1 (reference my_surgery.py:76)."""
    maxw = edges.agg(F.max(weight_col)).collect()[0][0]
    return (maxw - 1.0) * 0.6 + 1.0


def surgery(edges: DataFrame, cut: float | None = None, weight_col: str = "weight") -> DataFrame:
    """Remove edges with weight > cut (reference my_surgery.py:79-84).

    Usable directly as the Ricci-flow ``surgery=`` hook:
    ``ricci_flow(e, surgery=surgery, surgery_every=5)``.
    """
    if cut is None:
        cut = default_cut(edges, weight_col)
    return edges.filter(F.col(weight_col) <= F.lit(float(cut)))


def adjusted_rand_index(labels_true: dict, labels_pred: dict) -> float:
    """ARI from the pair-counting contingency table (sklearn-equivalent).

    Driver-side evaluation utility over collected clusterings (test-harness
    scope, mirroring reference my_surgery.py:8-51).
    """
    keys = sorted(set(labels_true) & set(labels_pred))
    t = [labels_true[k] for k in keys]
    p = [labels_pred[k] for k in keys]
    t_ids = {v: i for i, v in enumerate(sorted(set(t)))}
    p_ids = {v: i for i, v in enumerate(sorted(set(p)))}
    C = np.zeros((len(t_ids), len(p_ids)), dtype=np.int64)
    for a, b in zip(t, p):
        C[t_ids[a], p_ids[b]] += 1

    def comb2(x):
        return x * (x - 1) // 2

    sum_ij = sum(comb2(int(n)) for n in C.ravel())
    a_i = sum(comb2(int(n)) for n in C.sum(axis=1))
    b_j = sum(comb2(int(n)) for n in C.sum(axis=0))
    n_pairs = comb2(len(keys))
    expected = a_i * b_j / n_pairs if n_pairs else 0.0
    max_index = (a_i + b_j) / 2.0
    if max_index == expected:
        return 1.0
    return (sum_ij - expected) / (max_index - expected)
