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
    apsp,
    component_curvature,
    node_distribution,
    solve_emd_batch,
)
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
    salt: int | None = None,
) -> DataFrame:
    """Returns ``(src, dst, ricci_curvature)`` for the requested edges.

    ``edge_list`` (optional ``src``/``dst`` DataFrame) restricts evaluation
    like reference OllivierRicci.py:451-454 while the whole graph still
    defines distributions and distances. ``components`` (node, component)
    may be supplied to skip the CC pass when the caller already has it
    (e.g. the Ricci-flow loop, whose topology is round-invariant).
    ``salt`` (ego mode) replicates hub adjacency rows across that many salt
    buckets for the member-gather join — explicit skew handling for
    power-law web graphs on top of AQE's runtime skew-join splitting.
    """
    assert mode in ("component", "ego")
    edges = prepare_edges(edges)
    if mode == "component":
        return _component_mode(
            edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg,
            components,
        )
    return _ego_mode(
        edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg,
        salt,
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


def _adjacency(
    sym_or_directed: DataFrame, key: str, other: str, name: str, cap: int | None = None
) -> DataFrame:
    """Adjacency arrays grouped by ``key`` (one shuffle, map-side combine).

    ``cap`` bounds array length for power-law hub vertices: the ``cap``
    *smallest-weight* (= nearest, = highest transformed mass for exp_power>0)
    neighbors are kept, matching the reference's top-k heap tie-break
    (largest node id wins, OllivierRicci.py:89-92). Capping both the support
    and the gathered member adjacency keeps the per-edge ego block O(k^2)
    regardless of hub degree — without it a degree-10^6 vertex would ship
    its whole neighbor list once per incident edge.
    """
    if cap is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(key).orderBy(F.asc("weight"), F.desc(other))
        sym_or_directed = (
            sym_or_directed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn")
        )
    return (
        sym_or_directed.groupBy(F.col(key).alias("node"))
        .agg(
            F.collect_list(F.col(other)).alias(f"{name}_nbrs"),
            F.collect_list("weight").alias(f"{name}_ws"),
        )
    )


def _ego_mode(
    edges, directed, alpha, method, base, exp_power, nbr_topk, edge_list, sinkhorn_reg,
    salt=None,
):
    spark = edges.sparkSession
    if directed:
        out_view = edges.select("src", "dst", "weight")
    else:
        out_view = symmetrize(canonicalize(edges))
    out_view = out_view.cache()
    # out-adjacency defines both successor distributions and directed
    # shortest paths; predecessor adjacency only needed for directed graphs.
    # Arrays capped at nbr_topk: exactly the reference's support truncation
    # (OllivierRicci.py:89-92) for distributions, and the documented
    # ego-distance approximation for hub vertices at scale.
    adj_out = _adjacency(out_view, "src", "dst", "out", cap=nbr_topk).cache()
    adj_in = (
        _adjacency(out_view, "dst", "src", "in", cap=nbr_topk).cache()
        if directed
        else None
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
    adj_member = adj_out.select(
        F.col("node").alias("member"),
        F.col("out_nbrs").alias("m_nbrs"),
        F.col("out_ws").alias("m_ws"),
    )
    if salt and salt > 1:
        # explicit hub-skew salting: replicate each adjacency row across
        # `salt` buckets; each (edge, member) demand lands in one bucket
        adj_member = adj_member.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        members = members.withColumn(
            "_salt", F.pmod(F.xxhash64("edge_id"), F.lit(salt)).cast("int")
        )
        mem_adj = members.join(adj_member, ["member", "_salt"], "left").drop("_salt")
    else:
        mem_adj = members.join(adj_member, "member", "left")
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
        for rb in batches:
            yield _solve_ego_arrow(rb, **params)

    # mapInArrow: nested list columns stay as flat Arrow buffers
    # (values + offsets) — no per-row python object materialization.
    return full.mapInArrow(solve, _RESULT_SCHEMA)


def _flat_list(col):
    """(offsets, values) numpy views of an Arrow list column (absolute offsets)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = col.offsets.to_numpy()
    return off, col.values


def _solve_ego_arrow(
    rb,
    *,
    directed: bool,
    alpha: float,
    method: str,
    base: float,
    exp_power: float,
    nbr_topk: int,
    sinkhorn_reg: float,
):
    """Per-Arrow-batch ego solve on flat list buffers (zero python objects).

    Per edge, the local dense weight matrix is built with vectorized
    searchsorted scatter, distances via native Floyd-Warshall, and all exact
    OT problems of the batch go out in ONE native EMD call.
    """
    import pyarrow as pa

    n_rows = rb.num_rows
    src = rb.column(rb.schema.get_field_index("src")).to_numpy()
    dst = rb.column(rb.schema.get_field_index("dst")).to_numpy()
    wts = rb.column(rb.schema.get_field_index("weight")).to_numpy()

    mem_off, mem_vals_arr = _flat_list(rb.column(rb.schema.get_field_index("members")))
    mem_vals = mem_vals_arr.to_numpy()
    # nested list<list<T>>: outer offsets align with members (one inner list
    # per member); inner offsets/values are the flat adjacency buffers
    nb_outer_off, nb_inner = _flat_list(rb.column(rb.schema.get_field_index("members_nbrs")))
    nb_inner_off, nb_vals_arr = _flat_list(nb_inner)
    nb_vals = nb_vals_arr.to_numpy()
    ws_outer_off, ws_inner = _flat_list(rb.column(rb.schema.get_field_index("members_ws")))
    ws_inner_off, ws_vals_arr = _flat_list(ws_inner)
    ws_vals = ws_vals_arr.to_numpy()

    s_off, s_vals_arr = _flat_list(rb.column(rb.schema.get_field_index("s_nbrs")))
    s_vals = s_vals_arr.to_numpy()
    sw_off, sw_vals_arr = _flat_list(rb.column(rb.schema.get_field_index("s_ws")))
    sw_vals = sw_vals_arr.to_numpy()
    t_off, t_vals_arr = _flat_list(rb.column(rb.schema.get_field_index("t_nbrs")))
    t_vals = t_vals_arr.to_numpy()
    tw_off, tw_vals_arr = _flat_list(rb.column(rb.schema.get_field_index("t_ws")))
    tw_vals = tw_vals_arr.to_numpy()

    out = np.zeros(n_rows, dtype=np.float64)
    emd_idx: list[int] = []
    emd_x: list[np.ndarray] = []
    emd_y: list[np.ndarray] = []
    emd_d: list[np.ndarray] = []

    for r in range(n_rows):
        w_st = float(wts[r])
        if w_st < EPSILON:  # reference :316-320
            out[r] = 0.0
            continue
        members = mem_vals[mem_off[r] : mem_off[r + 1]]
        n = len(members)
        order = np.argsort(members, kind="stable")
        sm = members[order]
        # flat adjacency block of this edge's members
        m0, m1 = nb_outer_off[r], nb_outer_off[r + 1]
        blk0, blk1 = nb_inner_off[m0], nb_inner_off[m1]
        nbr_block = nb_vals[blk0:blk1]
        w_block = ws_vals[ws_inner_off[ws_outer_off[r]] : ws_inner_off[ws_outer_off[r] + (m1 - m0)]]
        row_lens = np.diff(nb_inner_off[m0 : m1 + 1])
        local_rows = np.repeat(np.arange(n), row_lens)
        pos = np.searchsorted(sm, nbr_block)
        pos_c = np.minimum(pos, n - 1)
        valid = sm[pos_c] == nbr_block
        W = np.full((n, n), np.inf)
        np.minimum.at(W, (local_rows[valid], order[pos_c[valid]]), w_block[valid])
        D = apsp(W)

        def loc(ids):
            p = np.searchsorted(sm, ids)
            return order[np.minimum(p, n - 1)]

        si = int(loc(np.array([src[r]]))[0])
        ti = int(loc(np.array([dst[r]]))[0])
        s_idx = loc(s_vals[s_off[r] : s_off[r + 1]])
        t_idx = loc(t_vals[t_off[r] : t_off[r + 1]])
        s_ws = sw_vals[sw_off[r] : sw_off[r + 1]]
        t_ws = tw_vals[tw_off[r] : tw_off[r + 1]]

        if method == "ATD":  # reference :257-294
            share = (1.0 - alpha) / (len(s_idx) * len(t_idx))
            m = alpha * D[si, ti] + share * D[np.ix_(s_idx, t_idx)].sum()
            out[r] = 1.0 - m / w_st  # reference :344
        else:
            x, xs = node_distribution(si, s_idx, s_ws, alpha, base, exp_power, nbr_topk)
            y, ys = node_distribution(ti, t_idx, t_ws, alpha, base, exp_power, nbr_topk)
            d = D[np.ix_(xs, ys)]
            if method == "Sinkhorn" or (
                method == "OTDSinkhornMix"
                and len(x) > OTD_SINKHORN_THRESHOLD
                and len(y) > OTD_SINKHORN_THRESHOLD
            ):
                out[r] = 1.0 - sinkhorn_cost(x, y, d, reg=sinkhorn_reg) / w_st
            else:  # deferred — batched exact OT per Arrow batch (north star)
                emd_idx.append(r)
                emd_x.append(x)
                emd_y.append(y)
                emd_d.append(d)
    if emd_idx:
        ms = solve_emd_batch(emd_x, emd_y, emd_d)
        idx = np.asarray(emd_idx, dtype=np.int64)
        out[idx] = 1.0 - ms / wts[idx].astype(np.float64)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(src.astype(np.int64)),
            pa.array(dst.astype(np.int64)),
            pa.array(out),
        ],
        names=["src", "dst", "ricci_curvature"],
    )


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
    emd_idx: list[int] = []
    emd_x: list[np.ndarray] = []
    emd_y: list[np.ndarray] = []
    emd_d: list[np.ndarray] = []
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
        D = apsp(W)
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
            out[r] = 1.0 - m / w_st  # reference :344
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
                out[r] = 1.0 - m / w_st
            else:  # deferred — batched exact OT per Arrow batch (north star)
                emd_idx.append(r)
                emd_x.append(x)
                emd_y.append(y)
                emd_d.append(d)
    if emd_idx:
        ms = solve_emd_batch(emd_x, emd_y, emd_d)
        idx = np.asarray(emd_idx, dtype=np.int64)
        out[idx] = 1.0 - ms / c_w[idx].astype(np.float64)
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
