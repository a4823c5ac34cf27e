"""Ollivier-Ricci curvature over an edge DataFrame.

Spark-first re-expression of reference OllivierRicci.py:355-521. Two
physical strategies, same math (functions/localgraph.py kernels):

- ``mode="component"`` — exact: edges are grouped by connected component and
  each component block is solved in one Arrow batch with exact global
  all-pairs distances. Reproduces the reference's APSP-based numbers
  (OllivierRicci.py:157-158) bit-for-bit; parity/fixture path. Distributed
  across components; bounded by the largest component's size.
- ``mode="ego"`` — web-scale: per-edge 2-hop ego-net gather via self-joins
  on the edge table (salting left to AQE skew handling), distances computed
  inside the induced member subgraph. For any pair (u in N(s), v in N(t))
  the path u-s-t-v lies inside the gathered block, so distances are always
  finite; they can only over-estimate global distances when a shortcut
  routes outside the 1-hop union — the documented scale-mode approximation
  (SURVEY.md §4.3, §7).

Both strategies dispatch OTD (exact EMD) / Sinkhorn by support size exactly
like the reference's OTDSinkhornMix (OllivierRicci.py:334-341).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..functions.localgraph import (
    EPSILON,
    OTD_SINKHORN_THRESHOLD,
    component_curvature,
    floyd_warshall,
    node_distribution,
)
from ..functions.emd import emd_exact
from ..functions.sinkhorn import sinkhorn_cost
from ..sources.edges import canonicalize, prepare_edges, symmetrize
from .components import connected_components
from .degrees import degree_table

_RESULT_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("ricci_curvature", DoubleType()),
    ]
)


def ricci_curvature_edges(
    edges: DataFrame,
    *,
    directed: bool = False,
    alpha: float = 0.5,
    method: str = "OTDSinkhornMix",
    base: float = math.e,
    exp_power: float = 2.0,
    nbr_topk: int = 3000,
    mode: str = "component",
    edge_list: DataFrame | None = None,
    sinkhorn_reg: float = 1e-1,
    components: DataFrame | None = None,
) -> DataFrame:
    """Returns ``(src, dst, ricci_curvature)`` for the requested edges.

    ``edge_list`` (optional ``src``/``dst`` DataFrame) restricts evaluation
    like reference OllivierRicci.py:451-454 while the whole graph still
    defines distributions and distances. ``components`` (node, component)
    may be supplied to skip the CC pass when the caller already has it
    (e.g. the Ricci-flow loop, whose topology is round-invariant).
    """
    assert mode in ("component", "ego")
    edges = prepare_edges(edges)
    if mode == "component":
        return _component_mode(
            edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg,
            components,
        )
    return _ego_mode(
        edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg
    )


# --------------------------------------------------------------------------
# component (exact / parity) mode
# --------------------------------------------------------------------------


def _component_mode(
    edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg,
    components=None,
):
    if components is not None:
        comps = components
    else:
        und = canonicalize(edges.select("src", "dst", "weight"))
        comps = connected_components(und)  # weakly-connected for directed graphs
    e = edges.join(
        comps.withColumnRenamed("node", "src"), "src"
    )
    if edge_list is not None:
        ev = edge_list.select("src", "dst").withColumn("is_eval", F.lit(True))
        e = e.join(ev, ["src", "dst"], "left").withColumn(
            "is_eval", F.coalesce("is_eval", F.lit(False))
        )
    else:
        e = e.withColumn("is_eval", F.lit(True))

    def solve(pdf: pd.DataFrame) -> pd.DataFrame:
        ev = pdf[pdf["is_eval"].values]
        if len(ev) == 0:
            return pd.DataFrame({"src": [], "dst": [], "ricci_curvature": []}).astype(
                {"src": "int64", "dst": "int64", "ricci_curvature": "float64"}
            )
        k = component_curvature(
            pdf["src"].values.astype(np.int64),
            pdf["dst"].values.astype(np.int64),
            pdf["weight"].values.astype(np.float64),
            ev["src"].values.astype(np.int64),
            ev["dst"].values.astype(np.int64),
            directed=directed,
            alpha=alpha,
            method=method,
            base=base,
            exp_power=exp_power,
            nbr_topk=nbr_topk,
            sinkhorn_reg=sinkhorn_reg,
        )
        return pd.DataFrame(
            {"src": ev["src"].values, "dst": ev["dst"].values, "ricci_curvature": k}
        )

    return e.groupBy("component").applyInPandas(solve, _RESULT_SCHEMA)


# --------------------------------------------------------------------------
# ego (scale) mode
# --------------------------------------------------------------------------


def _adjacency(sym_or_directed: DataFrame, key: str, other: str, name: str) -> DataFrame:
    """Adjacency arrays grouped by ``key`` (one shuffle, map-side combine)."""
    return (
        sym_or_directed.groupBy(F.col(key).alias("node"))
        .agg(
            F.collect_list(F.col(other)).alias(f"{name}_nbrs"),
            F.collect_list("weight").alias(f"{name}_ws"),
        )
    )


def _ego_mode(edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg):
    spark = edges.sparkSession
    if directed:
        out_view = edges.select("src", "dst", "weight")
    else:
        out_view = symmetrize(canonicalize(edges))
    out_view = out_view.cache()
    # out-adjacency defines both successor distributions and directed
    # shortest paths; predecessor adjacency only needed for directed graphs.
    adj_out = _adjacency(out_view, "src", "dst", "out").cache()
    adj_in = (
        _adjacency(out_view, "dst", "src", "in").cache() if directed else None
    )

    ev = edges.select("src", "dst", "weight")
    if edge_list is not None:
        ev = ev.join(edge_list.select("src", "dst"), ["src", "dst"], "left_semi")
    ev = ev.withColumn("edge_id", F.monotonically_increasing_id())

    # gather source-side and target-side adjacency rows onto each edge
    src_adj = adj_in if directed else adj_out
    e1 = (
        ev.join(src_adj.withColumnRenamed("node", "src"), "src", "left")
        .withColumnRenamed("in_nbrs" if directed else "out_nbrs", "s_nbrs")
        .withColumnRenamed("in_ws" if directed else "out_ws", "s_ws")
    )
    e2 = (
        e1.join(
            adj_out.select(
                F.col("node").alias("dst"),
                F.col("out_nbrs").alias("t_nbrs"),
                F.col("out_ws").alias("t_ws"),
            ),
            "dst",
            "left",
        )
    )
    # members of the ego block: s, t, and both neighbor sets
    members = e2.select(
        "edge_id",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.coalesce("s_nbrs", F.array()),
                    F.coalesce("t_nbrs", F.array()),
                    F.array("src", "dst"),
                )
            )
        ).alias("member"),
    )
    mem_adj = members.join(
        adj_out.select(
            F.col("node").alias("member"),
            F.col("out_nbrs").alias("m_nbrs"),
            F.col("out_ws").alias("m_ws"),
        ),
        "member",
        "left",
    )
    gathered = mem_adj.groupBy("edge_id").agg(
        F.collect_list("member").alias("members"),
        F.collect_list(F.coalesce("m_nbrs", F.array())).alias("members_nbrs"),
        F.collect_list(F.coalesce("m_ws", F.array())).alias("members_ws"),
    )
    full = e2.join(gathered, "edge_id").select(
        "src", "dst", "weight", "s_nbrs", "s_ws", "t_nbrs", "t_ws",
        "members", "members_nbrs", "members_ws",
    )

    params = dict(
        directed=directed,
        alpha=alpha,
        method=method,
        base=base,
        exp_power=exp_power,
        nbr_topk=nbr_topk,
        sinkhorn_reg=sinkhorn_reg,
    )

    def solve(batches):
        for pdf in batches:
            yield _solve_ego_batch(pdf, **params)

    return full.mapInPandas(solve, _RESULT_SCHEMA)


def _solve_ego_batch(
    pdf: pd.DataFrame,
    *,
    directed: bool,
    alpha: float,
    method: str,
    base: float,
    exp_power: float,
    nbr_topk: int,
    sinkhorn_reg: float,
) -> pd.DataFrame:
    n_rows = len(pdf)
    out = np.empty(n_rows, dtype=np.float64)
    # column-wise extraction: no per-row pandas indexing in the hot loop
    c_src = pdf["src"].values
    c_dst = pdf["dst"].values
    c_w = pdf["weight"].values
    c_members = pdf["members"].values
    c_mnbrs = pdf["members_nbrs"].values
    c_mws = pdf["members_ws"].values
    c_snbrs = pdf["s_nbrs"].values
    c_sws = pdf["s_ws"].values
    c_tnbrs = pdf["t_nbrs"].values
    c_tws = pdf["t_ws"].values
    for r in range(n_rows):
        w_st = float(c_w[r])
        if w_st < EPSILON:
            out[r] = 0.0
            continue
        s, t = int(c_src[r]), int(c_dst[r])
        members = np.asarray(c_members[r], dtype=np.int64)
        lut = {int(v): i for i, v in enumerate(members)}
        n = len(members)
        W = np.full((n, n), np.inf)
        for mi, (nbrs, ws) in enumerate(zip(c_mnbrs[r], c_mws[r])):
            if nbrs is None:
                continue
            nb_idx = np.fromiter(
                (lut.get(int(nb), -1) for nb in nbrs), dtype=np.int64, count=len(nbrs)
            )
            keep = nb_idx >= 0
            W[mi, nb_idx[keep]] = np.minimum(
                W[mi, nb_idx[keep]], np.asarray(ws, dtype=np.float64)[keep]
            )
        D = floyd_warshall(W)
        si, ti = lut[s], lut[t]

        s_nbrs = np.asarray(c_snbrs[r] if c_snbrs[r] is not None else [], dtype=np.int64)
        s_ws = np.asarray(c_sws[r] if c_sws[r] is not None else [], dtype=np.float64)
        t_nbrs = np.asarray(c_tnbrs[r] if c_tnbrs[r] is not None else [], dtype=np.int64)
        t_ws = np.asarray(c_tws[r] if c_tws[r] is not None else [], dtype=np.float64)
        s_idx = np.fromiter((lut[int(v)] for v in s_nbrs), dtype=np.int64, count=len(s_nbrs))
        t_idx = np.fromiter((lut[int(v)] for v in t_nbrs), dtype=np.int64, count=len(t_nbrs))

        if method == "ATD":  # reference :257-294
            share = (1.0 - alpha) / (len(s_idx) * len(t_idx))
            m = alpha * D[si, ti] + share * D[np.ix_(s_idx, t_idx)].sum()
        else:
            x, xs = node_distribution(si, s_idx, s_ws, alpha, base, exp_power, nbr_topk)
            y, ys = node_distribution(ti, t_idx, t_ws, alpha, base, exp_power, nbr_topk)
            d = D[np.ix_(xs, ys)]
            if method == "Sinkhorn" or (
                method == "OTDSinkhornMix"
                and len(x) > OTD_SINKHORN_THRESHOLD
                and len(y) > OTD_SINKHORN_THRESHOLD
            ):
                m = sinkhorn_cost(x, y, d, reg=sinkhorn_reg)
            else:
                m = emd_exact(x, y, d)
        out[r] = 1.0 - m / w_st  # reference :344
    return pd.DataFrame(
        {
            "src": pdf["src"].values.astype(np.int64),
            "dst": pdf["dst"].values.astype(np.int64),
            "ricci_curvature": out,
        }
    )


# --------------------------------------------------------------------------
# node aggregation (reference OllivierRicci.py:510-519)
# --------------------------------------------------------------------------


def node_curvature(
    edges: DataFrame,
    edge_curvature: DataFrame,
    directed: bool = False,
    curv_col: str = "ricci_curvature",
    out_col: str | None = None,
) -> DataFrame:
    """Node curvature = sum of incident computed-edge curvatures / degree.

    Replicates the reference exactly, including the divide-by-full-degree
    semantics on partial edge lists and, for directed graphs, summing only
    out-edge curvatures while dividing by total (in+out) degree
    (``G.neighbors`` = successors but ``G.degree`` = in+out).
    """
    out_col = out_col or curv_col
    edges = prepare_edges(edges)
    deg = degree_table(edges if directed else canonicalize(edges), directed=directed)
    if directed:
        contrib = edge_curvature.select(F.col("src").alias("node"), F.col(curv_col).alias("k"))
    else:
        contrib = edge_curvature.select(F.col("src").alias("node"), F.col(curv_col).alias("k")).union(
            edge_curvature.select(F.col("dst").alias("node"), F.col(curv_col).alias("k"))
        )
    sums = contrib.groupBy("node").agg(F.sum("k").alias("ksum"))
    return (
        deg.join(sums, "node", "left")
        .select(
            "node",
            (F.coalesce("ksum", F.lit(0.0)) / F.col("degree")).alias(out_col),
        )
    )
