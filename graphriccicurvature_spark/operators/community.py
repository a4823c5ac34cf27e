"""Ricci community detection: weight-threshold cuts + modularity-drop search.

Reference: util.py:40-112 (cut + cutoff search) and
OllivierRicci.py:809-894 (community drivers). The Louvain-style modularity
(python-louvain ``community_louvain.modularity``, called at util.py:98) is a
plain DataFrame aggregation here:

    Q = sum_c [ w_in(c)/m  -  (deg(c) / (2m))^2 ]

with m = total edge weight, w_in(c) = intra-community edge weight, deg(c) =
sum of weighted degrees. Components after each cut are the clustering
(util.py:96) via the large-star/small-star operator.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import canonicalize, prepare_edges
from .components import connected_components
from .flow import ricci_flow


def cut_graph_by_cutoff(edges: DataFrame, cutoff: float, weight_col: str = "weight") -> DataFrame:
    """Remove edges with weight > cutoff (reference util.py:40-65)."""
    return edges.filter(F.col(weight_col) <= F.lit(float(cutoff)))


def modularity(edges: DataFrame, partition: DataFrame) -> float:
    """Louvain modularity of ``partition`` (node, component) on ``edges``."""
    e = edges.select("src", "dst", "weight")
    p_src = partition.select(F.col("node").alias("src"), F.col("component").alias("c_src"))
    p_dst = partition.select(F.col("node").alias("dst"), F.col("component").alias("c_dst"))
    j = e.join(p_src, "src").join(p_dst, "dst")
    totals = j.agg(
        F.sum("weight").alias("m"),
        F.sum(F.when(F.col("c_src") == F.col("c_dst"), F.col("weight")).otherwise(0.0)).alias(
            "w_in_total"
        ),
    ).collect()[0]
    m = totals["m"]
    if not m:
        return 0.0
    deg = (
        j.select(F.col("c_src").alias("c"), "weight")
        .union(j.select(F.col("c_dst").alias("c"), "weight"))
        .groupBy("c")
        .agg(F.sum("weight").alias("deg_c"))
    )
    w_in = (
        j.filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("c"))
        .agg(F.sum("weight").alias("w_in"))
    )
    q = (
        deg.join(w_in, "c", "left")
        .select(
            (
                F.coalesce("w_in", F.lit(0.0)) / F.lit(m)
                - F.pow(F.col("deg_c") / F.lit(2.0 * m), 2)
            ).alias("term")
        )
        .agg(F.sum("term"))
        .collect()[0][0]
    )
    return float(q)


def rf_metric_cutoffs(
    edges: DataFrame, cutoff_step: float = 0.025, drop_threshold: float = 0.01
) -> list[float]:
    """Good clustering cutoffs by modularity drop (reference util.py:68-112).

    Sweeps cutoffs from max(weight) down to 1 in ``cutoff_step`` steps; since
    the cutoffs are monotonically decreasing, the reference's cumulative cut
    equals filtering the original table per cutoff.
    """
    edges = edges.select("src", "dst", "weight").cache()
    maxw = edges.agg(F.max("weight")).collect()[0][0]
    cutoff_range = np.arange(maxw, 1, -cutoff_step)
    mods = []
    for cutoff in cutoff_range:
        cut = cut_graph_by_cutoff(edges, float(cutoff))
        comps = connected_components(cut)
        mods.append(modularity(cut, comps))
    good_cuts: list[float] = []
    if not mods:
        return good_cuts
    mod_last = mods[-1]
    # scan from the smallest cutoff upward (reference util.py:104-110)
    for i in range(len(mods) - 1, 0, -1):
        mod_now = mods[i]
        if mod_last > mod_now > 1e-4 and abs(mod_last - mod_now) / mod_last > drop_threshold:
            good_cuts.append(float(cutoff_range[i + 1]))
        mod_last = mod_now
    return good_cuts


def ricci_community_all_possible_clusterings(
    edges: DataFrame,
    cutoff_step: float = 0.025,
    drop_threshold: float = 0.01,
    flow_kwargs: dict | None = None,
) -> list[tuple[float, DataFrame]]:
    """All (cutoff, clustering) guesses, large cut -> small
    (reference OllivierRicci.py:848-894). ``edges`` may be a pre-flowed
    table (has ``original_rc``) or a raw one — then flow runs first with the
    reference's defaults (10 iterations, OllivierRicci.py:769)."""
    if "original_rc" not in edges.columns:
        edges = ricci_flow(
            canonicalize(prepare_edges(edges)), iterations=10, **(flow_kwargs or {})
        )
    cuts = rf_metric_cutoffs(edges, cutoff_step=cutoff_step, drop_threshold=drop_threshold)
    assert cuts, "No cutoff point found!"
    all_nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    out = []
    cur = edges
    for cut in cuts[::-1]:
        cur = cut_graph_by_cutoff(cur, cut)
        comps = connected_components(cur, vertices=all_nodes)
        out.append((cut, comps))
    return out


def ricci_community(
    edges: DataFrame,
    cutoff_step: float = 0.025,
    drop_threshold: float = 0.01,
    flow_kwargs: dict | None = None,
) -> tuple[float, DataFrame]:
    """Best (cutoff, clustering) = the last guess (reference :840-846)."""
    cc = ricci_community_all_possible_clusterings(
        edges, cutoff_step=cutoff_step, drop_threshold=drop_threshold, flow_kwargs=flow_kwargs
    )
    assert cc, "No clustering found!"
    return cc[-1]
