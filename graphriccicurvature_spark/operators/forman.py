"""Forman-Ricci curvature (1d + augmented) as pure DataFrame joins/aggs.

Reference: /root/reference/GraphRicciCurvature/FormanRicci.py.
No UDFs anywhere — everything is whole-stage-codegen column math:

1d (FormanRicci.py:86-103):
    F(e=v1~v2) = w_e * ( w_v1/w_e + w_v2/w_e
                         - sum_{v in N(v1)\\{v2}} w_v1 / sqrt(w_e * w_v1v)
                         - sum_{v in N(v2)\\{v1}} w_v2 / sqrt(w_e * w_v2v) )

augmented (FormanRicci.py:105-134), faces = common neighbors, w_f = 1:
    F(e) = w_e * ( |face| * w_e / w_f + (w_v1 + w_v2)/w_e
                   - | 0 - sum_{v in N(vi)\\face\\{vj}} w_vi/sqrt(w_e*w_viv) | )

Directed inputs are converted to undirected (FormanRicci.py:59-62); node
weights default to 1.0 (FormanRicci.py:55-58).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import canonicalize, prepare_edges, symmetrize
from .degrees import degree_table


def _endpoint_neighbor_rows(und: DataFrame, sym: DataFrame) -> DataFrame:
    """(v1, v2, w_e, me, other, nbr, w_nbr) — one row per edge-endpoint-neighbor."""
    ends = und.select(
        "src",
        "dst",
        "weight",
        F.explode(
            F.array(
                F.struct(F.col("src").alias("me"), F.col("dst").alias("other")),
                F.struct(F.col("dst").alias("me"), F.col("src").alias("other")),
            )
        ).alias("end"),
    ).select(
        F.col("src").alias("v1"),
        F.col("dst").alias("v2"),
        F.col("weight").alias("w_e"),
        F.col("end.me").alias("me"),
        F.col("end.other").alias("other"),
    )
    nbrs = sym.select(
        F.col("src").alias("me"), F.col("dst").alias("nbr"), F.col("weight").alias("w_nbr")
    )
    return ends.join(nbrs, "me").filter(F.col("nbr") != F.col("other"))


def forman_curvature(
    edges: DataFrame,
    method: str = "augmented",
    node_weights: DataFrame | None = None,
) -> DataFrame:
    """Returns ``(src, dst, forman_curvature)`` for each canonical edge.

    ``node_weights`` — optional ``(node, nweight)`` DataFrame; default 1.0.
    """
    assert method in ("1d", "augmented")
    und = canonicalize(prepare_edges(edges)).cache()
    sym = symmetrize(und)
    rows = _endpoint_neighbor_rows(und, sym)
    if node_weights is not None:
        nw = node_weights.select(F.col("node").alias("me"), F.col("nweight").alias("w_me"))
        rows = rows.join(nw, "me", "left").withColumn("w_me", F.coalesce("w_me", F.lit(1.0)))
        und_w = (
            und.join(node_weights.select(F.col("node").alias("src"), F.col("nweight").alias("w_v1")), "src", "left")
            .join(node_weights.select(F.col("node").alias("dst"), F.col("nweight").alias("w_v2")), "dst", "left")
            .withColumn("w_v1", F.coalesce("w_v1", F.lit(1.0)))
            .withColumn("w_v2", F.coalesce("w_v2", F.lit(1.0)))
        )
    else:
        rows = rows.withColumn("w_me", F.lit(1.0))
        und_w = und.withColumn("w_v1", F.lit(1.0)).withColumn("w_v2", F.lit(1.0))

    if method == "1d":
        sums = rows.groupBy("v1", "v2").agg(
            F.sum(F.col("w_me") / F.sqrt(F.col("w_e") * F.col("w_nbr"))).alias("ev_sum")
        )
        out = (
            und_w.join(
                sums,
                (und_w.src == sums.v1) & (und_w.dst == sums.v2),
                "left",
            )
            .select(
                "src",
                "dst",
                (
                    F.col("weight")
                    * (
                        F.col("w_v1") / F.col("weight")
                        + F.col("w_v2") / F.col("weight")
                        - F.coalesce("ev_sum", F.lit(0.0))
                    )
                ).alias("forman_curvature"),
            )
        )
        return out

    # augmented: face membership = neighbor adjacent to BOTH endpoints
    adj = sym.select(F.col("src").alias("other_chk"), F.col("dst").alias("nbr_chk"))
    faced = rows.join(
        adj,
        (rows.other == adj.other_chk) & (rows.nbr == adj.nbr_chk),
        "left",
    ).withColumn("in_face", F.col("other_chk").isNotNull())
    per_edge = faced.groupBy("v1", "v2").agg(
        (F.sum(F.when(F.col("in_face"), 1).otherwise(0)) / 2).alias("n_face"),
        F.sum(
            F.when(
                ~F.col("in_face"),
                F.col("w_me") / F.sqrt(F.col("w_e") * F.col("w_nbr")),
            ).otherwise(0.0)
        ).alias("sum_veeh"),
    )
    out = (
        und_w.join(per_edge, (und_w.src == per_edge.v1) & (und_w.dst == per_edge.v2), "left")
        .select(
            "src",
            "dst",
            (
                F.col("weight")
                * (
                    F.coalesce("n_face", F.lit(0.0)) * F.col("weight") / F.lit(1.0)
                    + (F.col("w_v1") + F.col("w_v2")) / F.col("weight")
                    - F.abs(F.coalesce("sum_veeh", F.lit(0.0)))
                )
            ).alias("forman_curvature"),
        )
    )
    return out


def forman_node_curvature(edges: DataFrame, edge_curvature: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """Node Forman curvature = avg of incident edges; isolated nodes -> 0
    (reference FormanRicci.py:139-152)."""
    und = canonicalize(prepare_edges(edges))
    deg = degree_table(und)
    contrib = edge_curvature.select(F.col("src").alias("node"), F.col("forman_curvature").alias("k")).union(
        edge_curvature.select(F.col("dst").alias("node"), F.col("forman_curvature").alias("k"))
    )
    node_k = (
        deg.join(contrib.groupBy("node").agg(F.sum("k").alias("ksum")), "node", "left")
        .select("node", (F.coalesce("ksum", F.lit(0.0)) / F.col("degree")).alias("forman_curvature"))
    )
    if vertices is not None:
        iso = vertices.select(F.col(vertices.columns[0]).alias("node")).join(
            node_k.select("node"), "node", "left_anti"
        ).withColumn("forman_curvature", F.lit(0.0))
        node_k = node_k.union(iso)
    return node_k
